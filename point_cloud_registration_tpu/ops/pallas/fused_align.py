"""Fused correspondence + linearization + reduction Pallas kernel (K1 + K2).

The align-loop hot path of every solver is: transform the scan, find each
point's nearest map element, form the residual/Jacobian, and reduce to the
6x6 Gauss-Newton normal equations (reference call chains
/root/reference/point_cloud_registration/voxelized_plane_icp.py:23-64,
icp.py:24-57, plane_icp.py:30-69, ndt.py:24-57). In XLA form the search is
gather-row-bound (~60 ns per fetched row); this kernel removes the gathers
entirely:

* the scan is band-sorted ONCE per align (rigid motion preserves spatial
  locality, so the layout stays valid for every iteration);
* each tile of ``tq`` consecutive queries shares one compact spatial
  *region* of the planar block table, fetched HBM->VMEM with a single
  strided DMA;
* per-query candidate rows are pulled from the region with one-hot MXU
  matmuls — an exact-f32 gather at matmul throughput (the planar row layout
  ``[x_0..x_{w-1}, y_0.., z_0..]`` makes component extraction a contiguous
  lane slice);
* the residual family (point / plane / Mahalanobis-whitened) is linearized
  in-register and collapsed to an 8x8 normal-equation block
  ``C = sum_i w_i [J_i, r_i, 1]^T [J_i, r_i, 1]`` per tile: ``H = C[:6,:6]``,
  ``g = C[:6,6]``, ``e2 = C[6,6]``, ``n_inliers = C[7,7]``.

Per iteration the kernel's HBM traffic is the query tiles plus one region
read per tile and a 128-float stats row out — no per-point gather, no
intermediate (N, k) candidate tensors.

Exactness: the probe window statically covers every cell within
``radius`` cells of the query, so for the voxel kinds (radius covers
``max_dist``) a found match is the true gated nearest voxel. Queries whose
window exceeds the tile's clamped region (band-seam stragglers) and — for
the point kinds — queries whose best match is beyond the provable radius
are flagged ``unresolved`` and excluded from the stats; the caller re-solves
them on a compacted XLA path and adds their contribution.

Mahalanobis (NDT) unification: with ``U`` the upper-triangular square root
``U^T U = icov`` (ops/voxelize.sqrt_icov_packed), the whitened residual
``r~ = U (T p - mu)`` and Jacobian ``J~ = U [I | -R skew(p)]`` reproduce the
reference's H/g/e2 exactly (ndt.py:40-56), so all four solvers reduce to
plain weighted least squares inside one kernel.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from point_cloud_registration_tpu.ops.knn import (
    FOUND_MAX,
    padded_row_width,
    padded_z_blocks,
)
from point_cloud_registration_tpu.ops.pallas._gather import (
    onehot_gather as _onehot_gather,
    split_bf16 as _split_bf16,
)

_MISS_D2 = np.float32(1e30)  # finite: feeds min/compare, never matmuls


@dataclasses.dataclass(frozen=True)
class FusedSpec:
    """Static geometry + solver parameters of one fused-align program.

    Built host-side at ``set_target`` time (the table dims are host ints
    there); hashable, so it rides as a jit static argument.
    """

    kind: str  # "plane" | "ndt" | "point" | "plane_pt"
    cell: float  # cell size (voxel_size, or cell_fine for point kinds)
    origin_cell: tuple[int, int, int]  # (x, y, z) min cell coordinate
    block: tuple[int, int, int]  # cells per block (bx, by, bz)
    nb_dims: tuple[int, int, int]  # block-grid dims (nbx, nby, nbz)
    ncand: int  # candidate slots per block row
    radius: int  # window radius in cells (covers max_dist for voxel kinds)
    region: tuple[int, int, int]  # region dims in blocks (RX, RY, RZ)
    tq: int  # queries per tile
    max_dist: float
    huber_delta: float | None = None
    # one-hot gather passes: "highest" reconstructs exact f32 from a
    # lossless 3-way bf16 split of the table (the one-hot operand is exact
    # in bf16, so 3 bf16 MXU passes replace XLA HIGHEST's 6 — same bits,
    # half the time); "default" is a single hi-bf16 pass (~0.4% coordinate
    # truncation, perf experiments only)
    gather_precision: str = "highest"
    # unroll the probe loop (Python loop instead of fori_loop): Mosaic can
    # software-pipeline the unrolled probes, but every probe's buffers are
    # live at once — only safe when TQ * NR one-hots fit the VMEM budget
    unroll: bool = False
    # NOTE on layouts: this kernel implements exactly one table layout, the
    # (nby, nbz8, nbx, row) dense block grid. Raw-point kinds (which would
    # have needed a z-collapsed or sparse layout to stay in memory) are
    # served by the tile-local CSR kernel in ops/pallas/point_align.py
    # instead.

    @property
    def feat_dim(self) -> int:
        return {"plane": 3, "plane_pt": 3, "ndt": 6, "point": 0}[self.kind]

    @property
    def m_rows(self) -> int:
        return 1 if self.kind in ("plane", "plane_pt") else 3

    @property
    def spans(self) -> tuple[int, int, int]:
        return tuple(
            (2 * self.radius + b - 1) // b + 1 for b in self.block
        )

    @property
    def row_width(self) -> int:
        return padded_row_width(3 * self.ncand) + (
            padded_row_width(self.feat_dim * self.ncand) if self.feat_dim else 0
        )

    @property
    def probes(self) -> tuple[tuple[int, int, int], ...]:
        sx, sy, sz = self.spans
        return tuple(
            (dx, dy, dz) for dz in range(sz) for dy in range(sy) for dx in range(sx)
        )

    @property
    def exact_radius(self) -> float:
        """Distance below which a found match is provably the true nearest.

        Voxel kinds probe the full ``max_dist``-covering window, so any
        gated match is exact; point kinds probe a 1-cell window and matches
        beyond ``cell`` escape to the caller's fallback."""
        if self.kind in ("plane", "ndt"):
            return float("inf")
        return self.cell

    @property
    def nbz8(self) -> int:
        """z block count padded to the sublane tiling; the kernel's region
        is always the FULL (padded) z extent — Mosaic's DMA slicing rules
        make x/y the only dynamically-sliced region axes."""
        return padded_z_blocks(self.nb_dims[2])

    def __post_init__(self):
        for s, r in zip(self.spans[:2], self.region[:2]):
            if s > r:
                raise ValueError(
                    f"window span {self.spans} exceeds region {self.region}"
                )
        for r, nb in zip(self.region[:2], self.nb_dims[:2]):
            if r > nb:
                raise ValueError(f"region {self.region} exceeds block grid {self.nb_dims}")


def default_region(nb_dims: tuple[int, int, int], spans: tuple[int, int, int],
                   target: tuple[int, int, int]) -> tuple[int, int, int]:
    """Clamp the preferred region dims to the block grid (and at least the
    window span, so every window can fit)."""
    return tuple(
        max(min(t, nb), min(s, nb)) for t, s, nb in zip(target, spans, nb_dims)
    )


def band_height(spec: FusedSpec) -> int:
    """Window-origin rows per y-band: a band of ``RY - span_y + 1`` rows plus
    its window provably fits the RY-row region anchored at the band start."""
    return spec.region[1] - spec.spans[1] + 1


def n_bands(spec: FusedSpec) -> int:
    # window-origin lo_y ranges over [-1, nby): nby + 1 values
    return -(-(spec.nb_dims[1] + 1) // band_height(spec))


def padded_capacity(spec: FusedSpec, n: int) -> int:
    """Static capacity of the band-padded query layout (see :func:`band_layout`)."""
    return n + n_bands(spec) * spec.tq


def band_layout(spec: FusedSpec, q0: jax.Array):
    """Assign queries to region-aligned tiles (computed once per align).

    Queries are grouped into y-BANDS by their window-origin block row and
    sorted by x (then z) within a band; each band's run is padded to a tile
    multiple so no tile straddles a band. A tile's queries then provably fit
    an (RX, RY)-block region: y exactly (band construction), x whenever the
    tile's sorted x-extent is under RX - span_x (the overwhelmingly common
    case — the kernel flags the rest unresolved). Earlier Morton-run tiling
    left 27% of bench queries region-clamped; this leaves ~0.

    Returns ``(pos (N,) i32, n_pad)``: scatter row for each query in the
    padded layout of static size :func:`padded_capacity`. Positions are
    computed from the *initial* transformed points; rigid motion over the
    align's convergence basin moves points far less than the region slack,
    so the assignment stays valid every iteration.
    """
    tq = spec.tq
    bh = band_height(spec)
    nb_b = n_bands(spec)
    bx, by, bz = spec.block
    ox0, oy0, oz0 = spec.origin_cell
    inv_cell = np.float32(1.0 / spec.cell)
    celly = jnp.floor(q0[:, 1] * inv_cell).astype(jnp.int32)
    cellx = jnp.floor(q0[:, 0] * inv_cell).astype(jnp.int32)
    cellz = jnp.floor(q0[:, 2] * inv_cell).astype(jnp.int32)
    lo_y = jnp.floor_divide(celly - (oy0 + spec.radius), by)
    lo_x = jnp.floor_divide(cellx - (ox0 + spec.radius), bx)
    lo_z = jnp.floor_divide(cellz - (oz0 + spec.radius), bz)
    band = jnp.clip((lo_y + 1) // bh, 0, nb_b - 1)
    # Sort by (band, x, z). Key ranges come from the block grid itself (all
    # host ints -> static choice, no traced branching): lo_x/lo_z of in-bbox
    # queries span [-2, nb+1] after the +2 offset; out-of-bbox stragglers
    # clip to the ends, which only costs those queries x/z locality, never
    # correctness. A fixed 4096/1024 clip here used to alias the key for
    # maps wider than ~16k cells in x (or ~4k in z), silently destroying
    # tile locality — the composite key is now exact for every grid, and
    # the sort falls back to a stable multi-pass radix whenever a combined
    # key would overflow int32.
    kx = spec.nb_dims[0] + 4  # lo_x + 2 in [0, nbx + 3]
    kz = spec.nb_dims[2] + 4
    mx = jnp.clip(lo_x + 2, 0, kx - 1)
    mz = jnp.clip(lo_z + 2, 0, kz - 1)
    if kx * kz < 2**31:
        minor = mx * kz + mz
        if nb_b * (kx * kz) < 2**31:
            order = jnp.argsort(band * (kx * kz) + minor, stable=True).astype(
                jnp.int32
            )
        else:
            o1 = jnp.argsort(minor, stable=True).astype(jnp.int32)
            o2 = jnp.argsort(band[o1], stable=True).astype(jnp.int32)
            order = o1[o2]
    else:
        # astronomically wide grids: three stable passes (z, then x, then band)
        o1 = jnp.argsort(mz, stable=True).astype(jnp.int32)
        o2 = jnp.argsort(mx[o1], stable=True).astype(jnp.int32)
        o12 = o1[o2]
        o3 = jnp.argsort(band[o12], stable=True).astype(jnp.int32)
        order = o12[o3]
    band_s = band[order]
    n = q0.shape[0]
    counts = jnp.zeros((nb_b,), jnp.int32).at[band].add(1)
    padded = -(-counts // tq) * tq
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    first = jnp.searchsorted(band_s, jnp.arange(nb_b, dtype=jnp.int32)).astype(
        jnp.int32
    )
    rank = jnp.arange(n, dtype=jnp.int32) - first[band_s]
    pos_sorted = offsets[band_s] + rank
    pos = jnp.zeros((n,), jnp.int32).at[order].set(pos_sorted)
    return pos


def scatter_banded(spec: FusedSpec, pos, q, p, w):
    """Place queries into the band-padded layout; pad slots carry w = 0."""
    n_cap = padded_capacity(spec, q.shape[0])
    qp = jnp.zeros((n_cap, 3), jnp.float32).at[pos].set(q)
    pp = jnp.zeros((n_cap, 3), jnp.float32).at[pos].set(p)
    wp = jnp.zeros((n_cap,), jnp.float32).at[pos].set(w)
    return qp, pp, wp


def _linearize_and_reduce(spec, q, p, wq, tx, ty, tz, feats, rf, a_buf):
    """(8, 8) C block from per-query correspondences. ``rf`` = R flat.

    Rows of the augmented design matrix ``[J | r | 1]`` are staged
    through the ``a_buf`` VMEM scratch: Mosaic cannot concatenate
    vectors whose producers left them at different sublane offsets, but
    stores normalize layout."""
    ones = jnp.ones_like(wq)
    dx = q[:, 0] - tx
    dy = q[:, 1] - ty
    dz = q[:, 2] - tz
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = rf

    if spec.kind in ("plane", "plane_pt"):
        nx, ny, nz = feats
        rs = nx * dx + ny * dy + nz * dz
        if spec.huber_delta is not None:
            from point_cloud_registration_tpu.core.se3 import huber_weight

            wq = wq * huber_weight(jnp.abs(rs), spec.huber_delta)
        # R^T n
        tnx = r00 * nx + r10 * ny + r20 * nz
        tny = r01 * nx + r11 * ny + r21 * nz
        tnz = r02 * nx + r12 * ny + r22 * nz
        # skew(p) @ (R^T n) = p x (R^T n)  (plane_icp.py:51-54)
        jrx = py * tnz - pz * tny
        jry = pz * tnx - px * tnz
        jrz = px * tny - py * tnx
        for k, v in enumerate((nx, ny, nz, jrx, jry, jrz, rs, ones)):
            a_buf[k, :] = v
        a = a_buf[...]  # (8, TQ)
        aw = a * wq[None, :]
        return jax.lax.dot_general(
            aw, a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    # m = 3 kinds: J = [I | K], K = -R skew(p)  (icp.py:42-51, ndt.py:40)
    k00 = r02 * py - r01 * pz
    k01 = r00 * pz - r02 * px
    k02 = r01 * px - r00 * py
    k10 = r12 * py - r11 * pz
    k11 = r10 * pz - r12 * px
    k12 = r11 * px - r10 * py
    k20 = r22 * py - r21 * pz
    k21 = r20 * pz - r22 * px
    k22 = r21 * px - r20 * py
    zeros = jnp.zeros_like(wq)
    if spec.kind == "ndt":
        u00, u01, u02, u11, u12, u22 = feats  # U^T U = icov (upper tri)
        urows = ((u00, u01, u02), (zeros, u11, u12), (zeros, zeros, u22))
    else:  # point
        u00 = u11 = u22 = ones
        urows = ((ones, zeros, zeros), (zeros, ones, zeros), (zeros, zeros, ones))
    krows = ((k00, k01, k02), (k10, k11, k12), (k20, k21, k22))
    d3 = (dx, dy, dz)
    if spec.huber_delta is not None:
        from point_cloud_registration_tpu.core.se3 import huber_weight

        # residual magnitude in the whitened metric (= |r| for point,
        # Mahalanobis distance for ndt)
        rn2 = zeros
        for ur in urows:
            rr = ur[0] * dx + ur[1] * dy + ur[2] * dz
            rn2 = rn2 + rr * rr
        wq = wq * huber_weight(jnp.sqrt(jnp.maximum(rn2, 0.0)), spec.huber_delta)
    c = jnp.zeros((8, 8), jnp.float32)
    for row in range(3):
        ur = urows[row]
        left = ur  # U[row, :] — the translation Jacobian block
        right = tuple(
            ur[0] * krows[0][j] + ur[1] * krows[1][j] + ur[2] * krows[2][j]
            for j in range(3)
        )
        rres = ur[0] * d3[0] + ur[1] * d3[1] + ur[2] * d3[2]
        # count each query's weight once (row 0 only) in C[7, 7]
        last = ones if row == 0 else zeros
        for k, v in enumerate(tuple(left) + tuple(right) + (rres, last)):
            a_buf[k, :] = v
        a = a_buf[...]
        aw = a * wq[None, :]
        c = c + jax.lax.dot_general(
            aw, a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return c


def _make_kernel(spec: FusedSpec):
    TQ = spec.tq
    RX, RY = spec.region[0], spec.region[1]
    NBZ8 = spec.nbz8
    NR = RY * NBZ8 * RX
    NC = spec.ncand
    WA = padded_row_width(3 * NC)  # coordinate columns of the merged row
    F = spec.feat_dim
    WT = WA + (padded_row_width(F * NC) if F else 0)  # full merged row
    bx, by, bz = spec.block
    nbx, nby, nbz = spec.nb_dims
    ox0, oy0, oz0 = spec.origin_cell
    inv_found = np.float32(FOUND_MAX) ** 2
    n_split = 3 if spec.gather_precision == "highest" else 1

    def split_bf16(a):
        # lossless bf16x3 split + one-hot MXU gather: ops/pallas/_gather.py
        return _split_bf16(a, n_split)

    onehot_gather = _onehot_gather

    def kernel(orig_ref, rflat_ref, q_ref, p_ref, w_ref, tab,
               stats_ref, unres_ref, reg, a_buf, sem):
        # The merged table arrives reshaped (nby, nbz8, nbx * WT): Mosaic
        # region DMA constraints — last dim slices must be 128-aligned (WT
        # is), the second-minor slice must cover a multiple of 8 (nbz8 is,
        # and it is sliced FULLY so its start index is provably 0), and only
        # leading dims may have unconstrained dynamic starts (y).
        #
        # Regions are DOUBLE-BUFFERED across sequential grid steps: tile i
        # computes from slot i%2 while tile i+1's region streams into the
        # other slot, so the strided fetch overlaps compute.
        i = pl.program_id(0)
        nt = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)
        # Per-tile scalars arrive FLATTENED 1-D ((n_tiles*2,) origins,
        # (n_tiles*9,) rotations): SMEM pads the minor dim of a 2-D
        # prefetch operand to 128 lanes, so (n_tiles, 3)/(n_tiles, 9)
        # operands cost n_tiles*512 B EACH — 1.07 MB of the chip's 1 MB
        # SMEM at 1096 tiles (the measured batched B=32 / tq=128 OOM).
        # Flat layout: 44 B/tile total.
        ox = orig_ref[2 * i]
        oy = orig_ref[2 * i + 1]

        def dma(t, sl):
            t = jnp.minimum(t, nt - 1)
            ox_ = orig_ref[2 * t]
            oy_ = orig_ref[2 * t + 1]
            return pltpu.make_async_copy(
                tab.at[pl.ds(oy_, RY), :, pl.ds(pl.multiple_of(ox_ * WT, 128), RX * WT)],
                reg.at[sl],
                sem.at[sl],
            )

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < nt)
        def _():
            dma(i + 1, nslot).start()

        q = q_ref[...]  # (TQ, 3)
        p = p_ref[...]
        w_in = w_ref[...][:, 0]  # (TQ,)
        # Per-component scalar arithmetic throughout: Pallas kernels may not
        # capture array constants, and the per-axis grid parameters are
        # Python ints that fold straight into the IR.
        inv_cell = np.float32(1.0 / spec.cell)
        cellx = jnp.floor(q[:, 0] * inv_cell).astype(jnp.int32)
        celly = jnp.floor(q[:, 1] * inv_cell).astype(jnp.int32)
        cellz = jnp.floor(q[:, 2] * inv_cell).astype(jnp.int32)
        lox = jnp.floor_divide(cellx - (ox0 + spec.radius), bx)
        loy = jnp.floor_divide(celly - (oy0 + spec.radius), by)
        loz = jnp.floor_divide(cellz - (oz0 + spec.radius), bz)

        iota_nr = jax.lax.broadcasted_iota(jnp.int32, (TQ, NR), 1)
        iota_nc = jax.lax.broadcasted_iota(jnp.int32, (TQ, NC), 1)

        dma(i, slot).wait()
        reg_flat = reg[slot].reshape(NR, WT)
        # split ONCE per tile; probes gather from the coordinate slices
        reg_parts = split_bf16(reg_flat)
        coord_parts = tuple(p[:, :WA] for p in reg_parts)
        psx, psy = spec.spans[0], spec.spans[1]
        n_probes = len(spec.probes)

        # fori_loop (not a Python unroll): Mosaic stack-allocates every live
        # buffer, and 12 concurrently-live (TQ, NR) one-hots blow the VMEM
        # scoped limit; the loop body reuses one probe's worth of buffers.
        def probe_body(k, carry):
            best_d2, best_ridx, best_slot, miss = carry
            dx_ = k % psx
            dy_ = (k // psx) % psy
            dz_ = k // (psx * psy)
            gx = lox + dx_
            gy = loy + dy_
            gz = loz + dz_
            glob_ok = (
                (gx >= 0) & (gx < nbx) & (gy >= 0) & (gy < nby) & (gz >= 0) & (gz < nbz)
            )
            rx_ = gx - ox
            ry_ = gy - oy
            reg_ok = (rx_ >= 0) & (rx_ < RX) & (ry_ >= 0) & (ry_ < RY)
            ok = glob_ok & reg_ok
            miss = jnp.maximum(miss, (glob_ok & jnp.logical_not(reg_ok)).astype(jnp.int32))
            # region layout (RY, NBZ8, RX): z is fully resident
            ridx = jnp.where(ok, (ry_ * NBZ8 + gz) * RX + rx_, 0)
            rows = onehot_gather((ridx[:, None] == iota_nr) & ok[:, None], coord_parts)
            cx = rows[:, 0:NC]
            cy = rows[:, NC : 2 * NC]
            cz = rows[:, 2 * NC : 3 * NC]
            ddx = q[:, 0:1] - cx
            ddy = q[:, 1:2] - cy
            ddz = q[:, 2:3] - cz
            d2 = ddx * ddx + ddy * ddy + ddz * ddz  # (TQ, NC)
            d2 = jnp.where(ok[:, None], d2, _MISS_D2)
            dmin = jnp.min(d2, axis=1)
            slot = jnp.argmin(d2, axis=1).astype(jnp.int32)
            # the winner's coordinates/features are fetched ONCE after the
            # loop (from best_ridx/best_slot) — not per probe
            better = dmin < best_d2
            return (
                jnp.where(better, dmin, best_d2),
                jnp.where(better, ridx, best_ridx),
                jnp.where(better, slot, best_slot),
                miss,
            )

        init = (
            jnp.full((TQ,), _MISS_D2, jnp.float32),
            jnp.zeros((TQ,), jnp.int32),
            jnp.zeros((TQ,), jnp.int32),
            jnp.zeros((TQ,), jnp.int32),
        )
        if spec.unroll:
            carry = init
            for k in range(n_probes):
                carry = probe_body(k, carry)
            best_d2, best_ridx, best_slot, miss_i = carry
        else:
            best_d2, best_ridx, best_slot, miss_i = (
                jax.lax.fori_loop(0, n_probes, probe_body, init)
            )
        miss = miss_i > 0

        found = best_d2 < inv_found
        dist = jnp.sqrt(best_d2)
        resolved = dist < np.float32(min(spec.exact_radius, 3e38))
        wq = w_in * found.astype(jnp.float32) * (dist < np.float32(spec.max_dist))
        live = w_in > 0  # band-padding slots carry w = 0: never unresolved
        if spec.kind in ("point", "plane_pt"):
            # miss also zeroes the weight: the query re-resolves in the
            # caller's fallback, so a kernel contribution would double-count
            wq = (wq * resolved.astype(jnp.float32)
                  * jnp.logical_not(miss).astype(jnp.float32))
            unresolved = (miss | jnp.logical_not(resolved)) & live
        else:
            wq = wq * jnp.logical_not(miss).astype(jnp.float32)
            unresolved = miss & live

        # ONE merged-row gather serves the winner's coordinates and features
        rrows = onehot_gather(
            (best_ridx[:, None] == iota_nr) & found[:, None], reg_parts
        )
        selb = best_slot[:, None] == iota_nc

        def pick(col0):
            return jnp.sum(jnp.where(selb, rrows[:, col0 : col0 + NC], 0.0), axis=1)

        best_tx = pick(0)
        best_ty = pick(NC)
        best_tz = pick(2 * NC)
        feats = tuple(pick(WA + f * NC) for f in range(F))

        rf = tuple(rflat_ref[9 * i + k] for k in range(9))  # per-tile rotation
        C = _linearize_and_reduce(
            spec, q, p, wq, best_tx, best_ty, best_tz, feats, rf, a_buf
        )
        # outputs padded to Mosaic-tileable (8, 128) / (8, TQ) blocks
        stats_ref[0, :, :] = jnp.pad(C, ((0, 0), (0, 120)))
        unres_ref[0, :, :] = jnp.broadcast_to(
            unresolved.astype(jnp.int32)[None, :], (8, TQ)
        )

    return kernel


@partial(jax.jit, static_argnames=("spec", "interpret", "per_tile"))
def fused_stats_call(spec: FusedSpec, tab, q, p, w, rflat, *, interpret=False,
                     per_tile: bool = False):
    """Run the fused kernel over band-laid-out queries.

    ``q``/``p``/``w`` must already be in the band layout (see
    :func:`band_layout`); ``rflat`` is the 3x3 rotation row-major flattened —
    either one (9,) rotation for all tiles or per-tile (n_tiles, 9) rows
    (batched multi-scan alignment, where consecutive tile groups belong to
    different problems with different transforms).
    Returns ``(C (8, 8) f32, unresolved (N,) bool)`` where C packs the
    normal equations (see module docstring) — or, with ``per_tile``,
    ``(stats (n_tiles, 8, 128), unresolved)`` so the caller can segment-sum
    tiles per problem.
    """
    n = q.shape[0]
    TQ = spec.tq
    n_tiles = -(-n // TQ)
    n_pad = n_tiles * TQ
    rflat = jnp.asarray(rflat, jnp.float32)
    if rflat.ndim == 1:
        rflat = jnp.broadcast_to(rflat[None, :], (n_tiles, 9))
    elif rflat.shape[0] != n_tiles:
        raise ValueError(
            f"per-tile rflat has {rflat.shape[0]} rows for {n_tiles} tiles"
        )
    if n_pad != n:
        q = jnp.concatenate([q, jnp.broadcast_to(q[-1:], (n_pad - n, 3))])
        p = jnp.concatenate([p, jnp.broadcast_to(p[-1:], (n_pad - n, 3))])
        w = jnp.concatenate([w, jnp.zeros((n_pad - n,), w.dtype)])

    bx, by, bz = spec.block
    nbx, nby, nbz = spec.nb_dims
    RX, RY = spec.region[0], spec.region[1]
    nbz8 = spec.nbz8
    cell = jnp.floor(q * np.float32(1.0 / spec.cell)).astype(jnp.int32)
    relc = cell - jnp.asarray(spec.origin_cell, jnp.int32)
    lo_b = jnp.floor_divide(relc - spec.radius, jnp.asarray([bx, by, bz], jnp.int32))
    # band-padding slots (w = 0) must not drag the per-tile min down
    lo_b = jnp.where((w > 0)[:, None], lo_b, jnp.int32(1 << 30))
    lo_tiles = lo_b.reshape(n_tiles, TQ, 3)
    origins = jnp.clip(
        jnp.min(lo_tiles, axis=1),
        0,
        jnp.asarray([nbx - RX, nby - RY, 0], jnp.int32),
    )  # (n_tiles, 3) x, y, (z unused: region z is the full padded extent)

    F = spec.feat_dim
    WT = padded_row_width(3 * spec.ncand) + (
        padded_row_width(F * spec.ncand) if F else 0
    )
    if tab.shape[-1] != WT:
        raise ValueError(
            f"table row width {tab.shape[-1]} does not match spec (expected {WT})"
        )
    tab = tab.reshape(nby, nbz8, nbx * WT)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TQ, 3), lambda i, *_: (i, 0)),
            pl.BlockSpec((TQ, 3), lambda i, *_: (i, 0)),
            pl.BlockSpec((TQ, 1), lambda i, *_: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 8, TQ), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, RY, nbz8, RX * WT), jnp.float32),
            pltpu.VMEM((8, TQ), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    stats, unres = pl.pallas_call(
        _make_kernel(spec),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, TQ), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        # flattened 1-D per-tile scalars: see the SMEM padding note in the
        # kernel (2-D prefetch operands pad rows to 128 lanes)
    )(origins[:, :2].reshape(-1), rflat.reshape(-1), q, p, w[:, None], tab)
    unresolved = unres[:, 0, :].reshape(n_pad)[:n] > 0
    if per_tile:
        return stats, unresolved
    return jnp.sum(stats, axis=0)[:, :8], unresolved


def voxel_fused_spec(vm, kind: str, max_dist: float, huber_delta: float | None = None,
                     tq: int = 512,
                     region_target: tuple[int, int, int] | None = None,
                     unroll: bool = True) -> FusedSpec | None:
    """Build the static kernel spec for a dense-direct :class:`VoxelMap`.

    Host-side (a few tiny device_get syncs — called once at ``set_target``).
    Returns None when the map has no dense planar table (sparse path) or no
    rich feature table for the requested kind.
    """
    from point_cloud_registration_tpu.ops.knn import DENSE_BLOCK

    if vm.dense_blocks is None:
        return None
    # required row width derived from DENSE_BLOCK (not constants): coord
    # planes plus the kind's feature planes — a narrower table was built
    # without them and must fall back to the XLA path, not crash at align
    w_cells = int(np.prod(DENSE_BLOCK))
    feat_dim = {"plane": 3, "ndt": 6}.get(kind, 0)
    need_w = padded_row_width(3 * w_cells) + (
        padded_row_width(feat_dim * w_cells) if feat_dim else 0
    )
    if vm.dense_blocks.shape[-1] < need_w:
        return None  # table was built without the rich feature columns
    nb = tuple(int(x) for x in np.asarray(jax.device_get(vm.nb_dims)))
    origin = tuple(int(x) for x in np.asarray(jax.device_get(vm.grid.origin_cell)))
    cell = float(jax.device_get(vm.grid.cell_size))
    radius = int(np.ceil(max_dist / cell - 1e-9))
    spans = tuple((2 * radius + b - 1) // b + 1 for b in DENSE_BLOCK)
    if region_target is None:
        # ~32 cells of region slack per xy axis: enough for a 512-query
        # band-sorted tile, small enough that the one-hot row space
        # (RY * nbz8 * RX) stays near the MXU's 128-deep sweet spot
        region_target = tuple(max(s + 1, 32 // b) for s, b in zip(spans, DENSE_BLOCK))
    region = default_region(nb, spans, region_target)
    try:
        return FusedSpec(
            kind=kind,
            cell=cell,
            origin_cell=origin,
            block=DENSE_BLOCK,
            nb_dims=nb,
            ncand=int(np.prod(DENSE_BLOCK)),
            radius=radius,
            region=region,
            tq=tq,
            max_dist=float(max_dist),
            huber_delta=huber_delta,
            unroll=unroll,
        )
    except ValueError:
        return None  # window wider than the whole block grid etc.


def planar_window_query(spec: FusedSpec, tab, q):
    """Exact full-window query via XLA row gathers — the fused kernel's
    fallback for region-clamped stragglers (compacted subsets only; this is
    the gather-bound path the kernel exists to avoid).

    Returns ``(dist, target (M, 3), feats (M, F))`` with the same candidate
    semantics as the kernel's probe loop but no region restriction.
    """
    NC = spec.ncand
    nbx, nby, nbz = spec.nb_dims
    nbz8 = spec.nbz8
    bx, by, bz = spec.block
    ox0, oy0, oz0 = spec.origin_cell
    m = q.shape[0]
    WA = padded_row_width(3 * NC)
    flat = tab.reshape(-1, tab.shape[-1])
    inv_cell = np.float32(1.0 / spec.cell)
    cellx = jnp.floor(q[:, 0] * inv_cell).astype(jnp.int32)
    celly = jnp.floor(q[:, 1] * inv_cell).astype(jnp.int32)
    cellz = jnp.floor(q[:, 2] * inv_cell).astype(jnp.int32)
    lox = jnp.floor_divide(cellx - (ox0 + spec.radius), bx)
    loy = jnp.floor_divide(celly - (oy0 + spec.radius), by)
    loz = jnp.floor_divide(cellz - (oz0 + spec.radius), bz)

    best_d2 = jnp.full((m,), _MISS_D2, jnp.float32)
    best_t = jnp.zeros((m, 3), jnp.float32)
    best_row = jnp.zeros((m,), jnp.int32)
    best_slot = jnp.zeros((m,), jnp.int32)
    iota_nc = jax.lax.broadcasted_iota(jnp.int32, (m, NC), 1)
    for dx_, dy_, dz_ in spec.probes:
        gx = lox + dx_
        gy = loy + dy_
        gz = loz + dz_
        ok = (gx >= 0) & (gx < nbx) & (gy >= 0) & (gy < nby) & (gz >= 0) & (gz < nbz)
        row = jnp.where(ok, (gy * nbz8 + gz) * nbx + gx, 0)
        rows = flat[row]  # (M, row_w)
        cx = rows[:, 0:NC]
        cy = rows[:, NC : 2 * NC]
        cz = rows[:, 2 * NC : 3 * NC]
        d2 = (q[:, 0:1] - cx) ** 2 + (q[:, 1:2] - cy) ** 2 + (q[:, 2:3] - cz) ** 2
        d2 = jnp.where(ok[:, None], d2, _MISS_D2)
        dmin = jnp.min(d2, axis=1)
        slot = jnp.argmin(d2, axis=1).astype(jnp.int32)
        sel = slot[:, None] == iota_nc
        t = jnp.stack(
            [
                jnp.sum(jnp.where(sel, cx, 0.0), axis=1),
                jnp.sum(jnp.where(sel, cy, 0.0), axis=1),
                jnp.sum(jnp.where(sel, cz, 0.0), axis=1),
            ],
            axis=-1,
        )
        better = dmin < best_d2
        best_d2 = jnp.where(better, dmin, best_d2)
        best_t = jnp.where(better[:, None], t, best_t)
        best_row = jnp.where(better, row, best_row)
        best_slot = jnp.where(better, slot, best_slot)

    F = spec.feat_dim
    if F:
        rrows = flat[best_row]
        selb = best_slot[:, None] == iota_nc
        feats = jnp.stack(
            [
                jnp.sum(jnp.where(selb, rrows[:, WA + f * NC : WA + (f + 1) * NC], 0.0), axis=1)
                for f in range(F)
            ],
            axis=-1,
        )
    else:
        feats = jnp.zeros((m, F), jnp.float32)
    return jnp.sqrt(best_d2), best_t, feats
