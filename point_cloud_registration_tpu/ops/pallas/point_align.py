"""Fused raw-point correspondence + linearization kernel (ICP / PlaneICP).

The voxel solvers' fused kernel (ops/pallas/fused_align.py) keys its one-hot
MXU gathers off a *dense* planar block table whose region is DMA'd per tile.
That design cannot serve raw-point correspondence (reference hot paths
/root/reference/point_cloud_registration/icp.py:32-56 and
plane_icp.py:30-69): at ``cell_fine`` resolution a dense table inflates 5-10x
over the occupied blocks and the z-resident region blows the one-hot row
space. This kernel replaces the dense region with a **tile-local CSR table**:

* queries are Morton-sorted once per align and chunked into tiles of ``tq``;
* for each tile, a once-per-align XLA pass collects the distinct *fused
  blocks* (2x2x1 groups of packed blocks = 4x4x2 fine cells) touched by any
  query's probe window — INCLUDING globally-empty blocks, so inside the
  kernel "key not in the list" can only mean "query moved since layout
  time", which is flagged unresolved, never a silent wrong match;
* the tile's candidate rows (concatenations of 4 packed rows from
  ops/pointgrid.py — truncation therefore IDENTICAL to the XLA tier-1 path)
  stream HBM->VMEM through the normal Pallas pipeline;
* per probe, the one-hot operand is built by *key equality* against the
  tile's key list — ``(query_block_key == key_list)`` IS the exact-bf16
  one-hot, gathered from the lossless bf16x3 split of the local table at
  MXU throughput (see fused_align.py's split_bf16 rationale);
* winners are linearized and reduced to the same 8x8 normal-equation block
  as the voxel kernel (shared ``_linearize_and_reduce``): point residual
  for ICP, plane residual against the matched point's packed normal for
  PlaneICP (normals ride in the widened packed rows — ops/pointgrid._pack).

Exactness contract (same as models/_point_corr.match_points tier 1): the
probe window covers every candidate within ``cell_fine`` of the query, so a
match closer than ``cell_fine`` is provably the gated nearest (up to the
shared per-block cap truncation); everything else is ``unresolved`` and the
caller re-solves it on the compacted packed+proxy XLA path.
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
    MISS_COORD,
    padded_row_width,
)
from point_cloud_registration_tpu.ops.pallas._gather import (
    onehot_gather,
    split_bf16 as _split_bf16,
)
from point_cloud_registration_tpu.ops.pallas.fused_align import (
    _MISS_D2,
    _linearize_and_reduce,
)

# packed sub-blocks grouped per fused block along (x, y, z): a fused block
# is 4x4x2 fine cells, so its table row concatenates 4 packed rows
_GROUP = (2, 2, 1)
_FINE = (4, 4, 2)  # fine cells per fused block (= _GROUP * pointgrid._BLOCK)
_KEY_SENT = np.int32(2**30)  # sorts after every valid fused key
_PAD_KEY = np.int32(-9)  # list padding: never equals a probe key (>= -1)


@dataclasses.dataclass(frozen=True)
class PointFusedSpec:
    """Static geometry + solver parameters of one fused point-align program.

    Built host-side at ``set_target`` time from the packed grid's NumPy
    geometry (zero device syncs); hashable -> jit-static.
    """

    kind: str  # "point" | "plane_pt"
    cell: float  # cell_fine — also the provable-exactness radius
    origin_fine: tuple[int, int, int]  # min fine-cell coordinate (even)
    nb_dims: tuple[int, int, int]  # PACKED block-grid dims
    cap: int  # packed per-block candidate cap
    width: int  # floats per packed slot (3, or 6 with normals)
    cb: int  # tile key-list capacity (multiple of 128)
    tq: int  # queries per tile
    max_dist: float
    huber_delta: float | None = None
    gather_precision: str = "highest"  # see fused_align.FusedSpec
    unroll: bool = True  # 8 probes: unrolled buffers fit VMEM comfortably
    # probe-window radius in FINE cells: the window [f - radius, f + radius]
    # is provably covered by the probe set, so a best match within
    # ``radius * cell`` of the query is exact. The align kernels use 1
    # (cell_fine exactness + proxy fallback); the k-NN normals kernel uses
    # 2+ (its cell is sized to the sampled k-th-neighbor radius).
    radius: int = 1

    @property
    def spans(self) -> tuple[int, int, int]:
        return tuple(
            (2 * self.radius + f - 1) // f + 1 for f in _FINE
        )

    @property
    def probes(self) -> tuple[tuple[int, int, int], ...]:
        sx, sy, sz = self.spans
        return tuple(
            (dx, dy, dz) for dz in range(sz) for dy in range(sy) for dx in range(sx)
        )

    @property
    def nb2_dims(self) -> tuple[int, int, int]:
        gx, gy, gz = _GROUP
        return (
            -(-self.nb_dims[0] // gx),
            -(-self.nb_dims[1] // gy),
            -(-self.nb_dims[2] // gz),
        )

    @property
    def feat_dim(self) -> int:
        return 3 if self.kind == "plane_pt" else 0

    @property
    def nc(self) -> int:
        """Candidate slots per fused row (4 packed sub-blocks)."""
        return self.cap * int(np.prod(_GROUP))

    @property
    def cs(self) -> int:
        """Component stride: slots padded to the 128-lane tiling so each
        coordinate/feature group is an aligned lane slice."""
        return padded_row_width(self.nc)

    @property
    def row_width(self) -> int:
        return (3 + self.feat_dim) * self.cs

    def __post_init__(self):
        if self.kind not in ("point", "plane_pt"):
            raise ValueError(f"unknown point-fused kind {self.kind!r}")
        if self.cb % 128:
            raise ValueError("cb must be a multiple of the 128-lane tiling")
        if int(np.prod(self.nb2_dims)) >= int(_KEY_SENT):
            raise ValueError("fused block grid exceeds the key sentinel range")
        if self.width != 3 + self.feat_dim:
            raise ValueError(
                f"packed width {self.width} does not carry kind {self.kind!r}"
                f" (need {3 + self.feat_dim})"
            )


def point_fused_spec(pg, kind: str, max_dist: float,
                     huber_delta: float | None = None,
                     tq: int = 128, cb: int = 512,
                     unroll: bool = True,
                     radius: int = 1) -> PointFusedSpec | None:
    """Spec for a :class:`ops.pointgrid.PackedPointGrid` target.

    Host-side only (the packed grid stores its geometry as NumPy). Returns
    None when the grid cannot support the kind (missing normals columns) or
    exceeds the key space.

    Defaults are the hardware-swept winner on the B-01 protocol (r4 sweep):
    a SUBSAMPLED scan's Morton tiles are spatially huge, so the per-tile
    key lists need cb=512 depth — tq512/cb256 overflowed 98% of tiles and
    flooded the fallback every iteration (the round-3 ICP regression).
    """
    if pg is None:
        return None
    # config-shaped errors propagate (a miswritten caller must hear about
    # it, not silently land on the XLA path); only the data-dependent
    # key-space overflow maps to None below
    if kind not in ("point", "plane_pt"):
        raise ValueError(f"unknown point-fused kind {kind!r}")
    if cb % 128:
        raise ValueError("cb must be a multiple of the 128-lane tiling")
    width = int(pg.pts_packed.shape[1] // pg.idx_packed.shape[1])
    feat = 3 if kind == "plane_pt" else 0
    if width != 3 + feat:
        return None
    try:
        return PointFusedSpec(
            kind=kind,
            cell=float(pg.cell_fine),
            origin_fine=tuple(int(x) for x in np.asarray(pg.origin_fine)),
            nb_dims=tuple(int(x) for x in np.asarray(pg.nb_dims)),
            cap=int(pg.idx_packed.shape[1]),
            width=width,
            cb=cb,
            tq=tq,
            max_dist=float(max_dist),
            huber_delta=huber_delta,
            unroll=unroll,
            radius=radius,
        )
    except ValueError:
        return None


def _spread3(v):
    """Interleave 10 bits of ``v`` with two zero bits (Morton component)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_layout(spec: PointFusedSpec, q0: jax.Array) -> jax.Array:
    """Scatter position of each query in the Morton-sorted tile layout.

    Unlike the voxel kernel's band layout there is NO region constraint to
    satisfy — tiles only need spatial compactness so their distinct-block
    lists stay small. Morton order over fused-block coords (clipped to 10
    bits per axis — beyond ~2 km of 1 m fused blocks locality degrades
    gracefully, correctness is unaffected) gives near-square tile
    footprints. Computed once per align from the initial transform; rigid
    motion over the convergence basin preserves the layout's validity, and
    queries that do drift out of their tile's block list are flagged
    unresolved by the kernel, never mismatched.
    """
    fx, fy, fz = _FINE
    inv_cell = np.float32(1.0 / spec.cell)
    f = jnp.floor(q0 * inv_cell).astype(jnp.int32) - jnp.asarray(
        spec.origin_fine, jnp.int32
    )
    bx = jnp.clip(jnp.floor_divide(f[:, 0], fx), 0, 1023)
    by = jnp.clip(jnp.floor_divide(f[:, 1], fy), 0, 1023)
    bz = jnp.clip(jnp.floor_divide(f[:, 2], fz), 0, 1023)
    key = _spread3(bx) | (_spread3(by) << 1) | (_spread3(bz) << 2)
    order = jnp.argsort(key, stable=True)
    n = q0.shape[0]
    pos = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return pos


def padded_point_capacity(spec: PointFusedSpec, n: int) -> int:
    return -(-n // spec.tq) * spec.tq


def _fused_block(spec: PointFusedSpec, q):
    """Fused-block window origin (lo) per query, from fine-cell coords.

    The radius-r fine window [c-r, c+r] spans at most ``spans`` fused blocks
    per axis starting at lo = (c - r) // fine."""
    fx, fy, fz = _FINE
    r = spec.radius
    inv_cell = np.float32(1.0 / spec.cell)
    cx = jnp.floor(q[:, 0] * inv_cell).astype(jnp.int32) - spec.origin_fine[0]
    cy = jnp.floor(q[:, 1] * inv_cell).astype(jnp.int32) - spec.origin_fine[1]
    cz = jnp.floor(q[:, 2] * inv_cell).astype(jnp.int32) - spec.origin_fine[2]
    return (
        jnp.floor_divide(cx - r, fx),
        jnp.floor_divide(cy - r, fy),
        jnp.floor_divide(cz - r, fz),
    )


def _tile_key_lists(spec: PointFusedSpec, q_s, w_s):
    """Distinct fused-block key list per Morton tile (sorted ascending).

    Tiles whose distinct-key count exceeds ``cb`` drop the highest keys —
    those probes report unresolved and fall back (a performance, never a
    correctness, event)."""
    tq, cb = spec.tq, spec.cb
    n_cap = q_s.shape[0]
    nt = n_cap // tq
    nb2x, nb2y, nb2z = spec.nb2_dims
    gx, gy, gz = _fused_block(spec, q_s)
    live = w_s > 0
    keys_p = []
    for dx, dy, dz in spec.probes:
        bx, by, bz = gx + dx, gy + dy, gz + dz
        ok = (
            (bx >= 0) & (bx < nb2x)
            & (by >= 0) & (by < nb2y)
            & (bz >= 0) & (bz < nb2z)
        )
        k = bx + nb2x * (by + nb2y * bz)
        keys_p.append(jnp.where(ok & live, k, _KEY_SENT))
    n_pr = len(keys_p)
    tile_keys = jnp.stack(keys_p, axis=1).reshape(nt, tq * n_pr)
    sk = jnp.sort(tile_keys, axis=1)
    new = jnp.concatenate(
        [jnp.ones((nt, 1), bool), sk[:, 1:] != sk[:, :-1]], axis=1
    ) & (sk < _KEY_SENT)
    rank = jnp.cumsum(new, axis=1) - 1
    slot = jnp.where(new & (rank < cb), rank, cb)
    lists = (
        jnp.full((nt, cb + 1), _PAD_KEY, jnp.int32)
        .at[jnp.arange(nt)[:, None], slot]
        .set(sk)[:, :cb]
    )
    return lists


@partial(jax.jit, static_argnames=("spec",))
def build_fused_rows(spec: PointFusedSpec, pg):
    """Dense fused-row planar table, indexed DIRECTLY by fused-block key.

    Replaces the per-tile 5-D gather/transpose (which XLA materializes with
    a tiny trailing dim that the (8, 128) HBM tiling pads catastrophically —
    176 GB at normals bench scale). Built scatter-free: TPU scatters that
    update a partial lane slice of a wide row serialize into per-row
    read-modify-writes (measured 13 s for 12 slice-scatters at bench scale
    vs 40 ms for the same bytes as full rows), so each fused row instead
    GATHERS its 4 packed sub-rows via ``pg.block_row`` (pure index math)
    and the planar ``[x(cs) y z (features)]`` layout falls out of static
    lane slices + one concat. The per-tile table then falls out of ONE
    row-aligned gather (:func:`build_tile_tables_dense`).

    Returns ``(tab (NB2 + 1, row_width) f32, over (NB2 + 1,) i32)`` where
    row ``NB2`` is the all-sentinel row for globally-empty blocks. Memory is
    ``NB2 * row_width * 4`` bytes — callers gate on :func:`dense_rows_bytes`.
    """
    nb2x, nb2y, nb2z = spec.nb2_dims
    nbx, nby, _ = spec.nb_dims
    nb2_total = nb2x * nb2y * nb2z
    cap, w, cs = spec.cap, spec.width, spec.cs
    r_rows = pg.pts_packed.shape[0]  # R + 1 (last = padding row)
    r_sent = r_rows - 1  # all-+inf padding row -> MISS after sentinel swap

    # de-interleave packed rows ONCE: [x0 y0 z0 x1 ...] -> [x(cap)|y|z(|f)]
    # (static strided lane slices; swap the +inf packed padding for the
    # finite MISS sentinel here — 0 x inf would poison the MXU one-hot)
    comps = [pg.pts_packed[:, c::w] for c in range(w)]
    comps[:3] = [jnp.where(jnp.isfinite(c), c, MISS_COORD) for c in comps[:3]]
    if w > 3:
        comps[3:] = [jnp.where(jnp.isfinite(c), c, 0.0) for c in comps[3:]]
    planar = jnp.concatenate(comps, axis=1)  # (R+1, w*cap)

    # packed-row index of each fused row's 4 sub-blocks: gather block_row
    # at the sub-block's packed key (includes the sentinel row nb2_total,
    # whose out-of-range coordinates resolve to the MISS row)
    fi = jnp.arange(nb2_total + 1, dtype=jnp.int32)
    fx = fi % nb2x
    rem = fi // nb2x
    fy = rem % nb2y
    fz = rem // nb2y
    rows_s = []
    over = jnp.zeros((nb2_total + 1,), jnp.int32)
    for s in range(4):
        px = 2 * fx + (s % 2)
        py = 2 * fy + (s // 2)
        ok = (px < nbx) & (py < nby) & (fz < spec.nb_dims[2]) & (fi < nb2_total)
        pkey = px + nbx * (py + nby * fz)
        prow = pg.block_row[jnp.where(ok, pkey, 0)]
        prow = jnp.where(ok & (prow >= 0), prow, r_sent)
        over = jnp.maximum(
            over, (pg.row_over[prow] & (prow != r_sent)).astype(jnp.int32)
        )
        rows_s.append(planar[prow])  # (NB2+1, w*cap)
    # lane order [x: s0 s1 s2 s3 | y: ... | z: ...] + cs padding per group
    pad = cs - 4 * cap
    pieces = []
    for c in range(w):
        for s in range(4):
            pieces.append(rows_s[s][:, c * cap : (c + 1) * cap])
        if pad:
            pieces.append(
                jnp.full((nb2_total + 1, pad),
                         MISS_COORD if c < 3 else 0.0, jnp.float32)
            )
    tab = jnp.concatenate(pieces, axis=1)
    return tab, over


def dense_rows_bytes(spec: PointFusedSpec) -> int:
    """HBM bytes of the dense fused-row table for this spec."""
    return (int(np.prod(spec.nb2_dims)) + 1) * spec.row_width * 4


@partial(jax.jit, static_argnames=("spec",))
def build_tile_tables_dense(spec: PointFusedSpec, fused_tab, fused_over,
                            q_s, w_s):
    """Per-tile key lists + candidate tables from the dense fused rows.

    Output-compatible with :func:`build_tile_tables` (same lists / over /
    tab content) but the table build is one aligned gather instead of the
    layout-hostile 5-D transpose. ``q_s``/``w_s`` are already in the Morton
    tile layout (padded to a tile multiple; pad slots carry w = 0). Lists
    include globally-EMPTY in-grid blocks (their rows are all-sentinel), so
    a probe key absent from the list provably means the query left its
    layout-time window union.
    """
    lists = _tile_key_lists(spec, q_s, w_s)
    nb2_total = int(np.prod(spec.nb2_dims))
    safe = jnp.where(lists >= 0, lists, nb2_total)
    tab = fused_tab[safe]
    over = fused_over[safe]
    return lists, over, tab


@partial(jax.jit, static_argnames=("spec",))
def build_tile_tables(spec: PointFusedSpec, pg, q_s, w_s):
    """Per-tile key lists + local candidate tables (once per align).

    ``q_s``/``w_s`` are already in the Morton tile layout (padded to a tile
    multiple; pad slots carry w = 0 and are excluded). Returns
    ``(keys (nt, cb) i32, tab (nt, cb, row_width) f32)``. Lists include
    globally-EMPTY in-grid blocks (their rows are all-sentinel), so a probe
    key absent from the list provably means the query left its layout-time
    window union. Tiles whose distinct-key count exceeds ``cb`` drop the
    highest keys — those probes report unresolved and fall back (a
    performance, never a correctness, event).
    """
    tq, cb = spec.tq, spec.cb
    n_cap = q_s.shape[0]
    nt = n_cap // tq
    nbx, nby, _ = spec.nb_dims
    nb2x, nb2y, nb2z = spec.nb2_dims
    lists = _tile_key_lists(spec, q_s, w_s)

    # local candidate rows: 4 packed sub-rows per fused key, gathered and
    # laid out planar [x(cs) y z (nx ny nz)] with sub-blocks concatenated
    valid = lists >= 0
    lx = lists % nb2x
    rem = lists // nb2x
    ly = rem % nb2y
    lz = rem // nb2y
    r_sent = jnp.int32(pg.pts_packed.shape[0] - 1)
    subrows = []
    over = jnp.zeros(lists.shape, bool)
    for s in range(4):
        sx, sy = s % 2, s // 2
        px = lx * 2 + sx
        py = ly * 2 + sy
        okp = valid & (px < nbx) & (py < nby)
        pkey = px + nbx * (py + nby * lz)
        prow = pg.block_row[jnp.where(okp, pkey, 0)]
        prow = jnp.where(okp & (prow >= 0), prow, r_sent)
        over = over | (pg.row_over[prow] & (prow != r_sent))
        subrows.append(prow)
    rows4 = jnp.stack(subrows, axis=-1)  # (nt, cb, 4)
    cap, w = spec.cap, spec.width
    raw = pg.pts_packed[rows4.reshape(-1)].reshape(nt, cb, 4, cap, w)
    comps = jnp.transpose(raw, (0, 1, 4, 2, 3)).reshape(nt, cb, w, 4 * cap)
    pad = spec.cs - spec.nc
    if pad:
        comps = jnp.pad(comps, ((0, 0), (0, 0), (0, 0), (0, pad)),
                        constant_values=np.inf)
    # packed padding is +inf: finite-sentinel it for the MXU one-hot
    # (0 x inf would poison gathered rows with NaN)
    coords = jnp.where(jnp.isfinite(comps[:, :, :3]), comps[:, :, :3], MISS_COORD)
    if w > 3:
        feats = jnp.where(jnp.isfinite(comps[:, :, 3:]), comps[:, :, 3:], 0.0)
        comps = jnp.concatenate([coords, feats], axis=2)
    else:
        comps = coords
    tab = comps.reshape(nt, cb, spec.row_width)
    return lists, over.astype(jnp.int32), tab


def _make_point_kernel(spec: PointFusedSpec):
    TQ, CB = spec.tq, spec.cb
    NC = spec.cs
    WA = 3 * NC
    F = spec.feat_dim
    nb2x, nb2y, nb2z = spec.nb2_dims
    inv_found = np.float32(FOUND_MAX) ** 2
    n_split = 3 if spec.gather_precision == "highest" else 1

    def split_bf16(a):
        # lossless bf16x3 split + one-hot MXU gather: ops/pallas/_gather.py
        return _split_bf16(a, n_split)

    def kernel(rflat_ref, q_ref, p_ref, w_ref, keys_ref, tab_ref,
               stats_ref, unres_ref, a_buf):
        i = pl.program_id(0)
        q = q_ref[...]  # (TQ, 3)
        p = p_ref[...]
        w_in = w_ref[...][:, 0]
        keys = keys_ref[0, 0, :]  # (CB,) i32 — the tile's fused-block key list
        tab = tab_ref[0]  # (CB, W)
        parts = split_bf16(tab)
        coord_parts = tuple(pp[:, :WA] for pp in parts)

        # window origin from the SAME helper the table builder uses — the
        # key-equality one-hot requires bit-identical binning on both sides
        gx, gy, gz = _fused_block(spec, q)

        iota_nc = jax.lax.broadcasted_iota(jnp.int32, (TQ, NC), 1)

        psx, psy = spec.spans[0], spec.spans[1]
        n_probes = len(spec.probes)

        def probe_body(k, carry):
            best_d2, best_key, best_slot, miss = carry
            dx = k % psx
            dy = (k // psx) % psy
            dz = k // (psx * psy)
            bx = gx + dx
            by = gy + dy
            bz = gz + dz
            ok = (
                (bx >= 0) & (bx < nb2x)
                & (by >= 0) & (by < nb2y)
                & (bz >= 0) & (bz < nb2z)
            )
            pk = jnp.where(ok, bx + nb2x * (by + nb2y * bz), -1)
            # key equality IS the one-hot: list pads (-9) and invalid
            # probes (-1) can never match
            match = pk[:, None] == keys[None, :]  # (TQ, CB)
            matched = jnp.sum(match.astype(jnp.int32), axis=1) > 0
            # in-grid probe whose key left the layout-time list: the query
            # moved (or the list overflowed) — candidates are unknowable
            miss = jnp.maximum(miss, (ok & jnp.logical_not(matched)).astype(jnp.int32))
            rows = onehot_gather(match, coord_parts)
            cx = rows[:, 0:NC]
            cy = rows[:, NC : 2 * NC]
            cz = rows[:, 2 * NC : 3 * NC]
            ddx = q[:, 0:1] - cx
            ddy = q[:, 1:2] - cy
            ddz = q[:, 2:3] - cz
            d2 = ddx * ddx + ddy * ddy + ddz * ddz
            # unmatched probes gathered all-zero rows -> spurious |q|^2
            d2 = jnp.where(matched[:, None], d2, _MISS_D2)
            dmin = jnp.min(d2, axis=1)
            slot = jnp.argmin(d2, axis=1).astype(jnp.int32)
            better = dmin < best_d2
            return (
                jnp.where(better, dmin, best_d2),
                jnp.where(better, pk, best_key),
                jnp.where(better, slot, best_slot),
                miss,
            )

        init = (
            jnp.full((TQ,), _MISS_D2, jnp.float32),
            jnp.full((TQ,), -1, jnp.int32),
            jnp.zeros((TQ,), jnp.int32),
            jnp.zeros((TQ,), jnp.int32),
        )
        if spec.unroll:
            carry = init
            for k in range(n_probes):
                carry = probe_body(k, carry)
            best_d2, best_key, best_slot, miss_i = carry
        else:
            best_d2, best_key, best_slot, miss_i = jax.lax.fori_loop(
                0, n_probes, probe_body, init
            )
        miss = miss_i > 0

        found = best_d2 < inv_found
        dist = jnp.sqrt(best_d2)
        # provable-exactness radius: the probe window covers the closed
        # ball of radius * cell, so a best match inside it is the gated
        # nearest (up to the shared per-block cap truncation)
        resolved = dist < np.float32(spec.radius * spec.cell)
        # miss zeroes the weight: a missed probe means part of the window was
        # never consulted, so the kernel's best is not provably nearest AND
        # the query is re-solved by the driver's fallback — contributing here
        # too would double-count it in H/g/e2 (unresolved queries are
        # EXCLUDED from the stats, same invariant as the voxel kernel)
        wq = (
            w_in
            * found.astype(jnp.float32)
            * (dist < np.float32(spec.max_dist)).astype(jnp.float32)
            * resolved.astype(jnp.float32)
            * jnp.logical_not(miss).astype(jnp.float32)
        )
        live = w_in > 0
        unresolved = (miss | jnp.logical_not(resolved)) & live

        fmatch = (best_key[:, None] == keys[None, :]) & found[:, None]
        rrows = onehot_gather(fmatch, parts)
        selb = best_slot[:, None] == iota_nc

        def pick(col0):
            return jnp.sum(jnp.where(selb, rrows[:, col0 : col0 + NC], 0.0), axis=1)

        best_tx = pick(0)
        best_ty = pick(NC)
        best_tz = pick(2 * NC)
        feats = tuple(pick(WA + f * NC) for f in range(F))

        # flattened 1-D prefetch: a 2-D (n_tiles, 9) SMEM operand pads each
        # row to 128 lanes (n_tiles * 512 B), overflowing the 1 MB SMEM at
        # large batched tile counts; flat costs 36 B/tile
        rf = tuple(rflat_ref[9 * i + k] for k in range(9))
        C = _linearize_and_reduce(
            spec, q, p, wq, best_tx, best_ty, best_tz, feats, rf, a_buf
        )
        stats_ref[0, :, :] = jnp.pad(C, ((0, 0), (0, 120)))
        unres_ref[0, :, :] = jnp.broadcast_to(
            unresolved.astype(jnp.int32)[None, :], (8, TQ)
        )

    return kernel


@partial(jax.jit, static_argnames=("spec", "interpret", "per_tile"))
def point_stats_call(spec: PointFusedSpec, keys, tab, q, p, w, rflat, *,
                     interpret=False, per_tile: bool = False):
    """Run the point kernel over Morton-tiled queries.

    ``keys``/``tab`` from :func:`build_tile_tables`; ``q``/``p``/``w``
    already in the tile layout. ``rflat``: one (9,) rotation or per-tile
    (n_tiles, 9). Returns ``(C (8, 8), unresolved (N,) bool)`` — or per-tile
    stats with ``per_tile`` (batched segmentation, mirrors
    fused_align.fused_stats_call).
    """
    n = q.shape[0]
    TQ, CB = spec.tq, spec.cb
    W = spec.row_width
    n_tiles = -(-n // TQ)
    n_pad = n_tiles * TQ
    if keys.shape != (n_tiles, CB) or tab.shape != (n_tiles, CB, W):
        raise ValueError(
            f"tile tables {keys.shape}/{tab.shape} do not match spec "
            f"({(n_tiles, CB)}/{(n_tiles, CB, W)})"
        )
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TQ, 3), lambda i, *_: (i, 0)),
            pl.BlockSpec((TQ, 3), lambda i, *_: (i, 0)),
            pl.BlockSpec((TQ, 1), lambda i, *_: (i, 0)),
            # Mosaic requires the last two block dims divisible by (8, 128)
            # or equal to the array dims — a (1, CB) block over (n_tiles, CB)
            # fails that check on hardware (interpret mode does not), so the
            # key list rides as (n_tiles, 1, CB) with a full (1, CB) trailing
            # block.
            pl.BlockSpec((1, 1, CB), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, CB, W), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 8, TQ), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((8, TQ), jnp.float32)],
    )
    stats, unres = pl.pallas_call(
        _make_point_kernel(spec),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, TQ), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(rflat.reshape(-1), q, p, w[:, None], keys[:, None, :], tab)
    unresolved = unres[:, 0, :].reshape(n_pad)[:n] > 0
    if per_tile:
        return stats, unresolved
    return jnp.sum(stats, axis=0)[:, :8], unresolved
