"""Voxel-map construction: per-voxel Gaussian statistics on TPU.

Re-designs the reference ``VoxelGrid.set_points`` pipeline
(/root/reference/point_cloud_registration/voxel.py:104-169) — spatial hash,
``np.unique`` + ``np.bincount`` scatter-reductions, min_points filter, LAPACK
``eigh`` normals, analytic 3x3 inverse — as one fixed-shape XLA program:

* grouping via the bounding-box grid index (``ops.hashgrid``), identical
  grouping semantics to the reference hash (voxel.py:12-21);
* per-voxel count/mean/covariance via ``scatter-add`` segment sums computed in
  *cell-local* coordinates, so float32 keeps full precision for maps hundreds
  of meters across (the reference gets this for free from float64 bincount);
* normals from the closed-form symmetric 3x3 eigensolver (``ops.eigh3``),
  replacing ``np.linalg.eigh`` (voxel.py:157-158);
* the min_points filter (voxel.py:56, :151-153) becomes a validity mask —
  no compaction, shapes stay static;
* NDT's inverse covariance replicates the reference's adjugate/determinant
  closed form including its singular guard ``det == 0 -> 1e6``
  (voxel.py:69-102).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from point_cloud_registration_tpu.ops.eigh3 import smallest_eigvec_sym3
from point_cloud_registration_tpu.ops.hashgrid import (
    DENSE_CELL_BUDGET,
    INVALID_KEY,
    Grid,
    _bbox_cells,
    build_grid,
    cell_coords,
    search_offsets,
)
from point_cloud_registration_tpu.ops.knn import (
    DENSE_BLOCK,
    NNResult,
    build_dense_blocks,
    dense_blocks_from_dense,
    nearest_voxel,
    nearest_voxel_blocks,
)


class VoxelMap(NamedTuple):
    """Immutable target-map pytree for VPlaneICP / NDT (capacity-padded).

    The checkpointable artifact of SURVEY §5: persisting these arrays IS the
    map checkpoint; alignment itself holds no mutable state.
    """

    grid: Grid
    means: jax.Array  # (C, 3) f32
    covs: jax.Array  # (C, 6) f32 packed [xx, yy, zz, xy, xz, yz order: diag+triu]
    normals: jax.Array  # (C, 3) f32 — smallest-eigenvector plane normals
    counts: jax.Array  # (C,) i32
    valid: jax.Array  # (C,) bool — counts >= min_points
    icovs: jax.Array | None  # (C, 6) f32 — present after with_icov builds (NDT)
    # planar blocked table (nby, nbz8, nbx, row_w): centroids in the first
    # 128 columns; when built with ``rich=...`` the per-cell features the
    # fused Pallas kernel consumes (normals / sqrt icovs) follow at col 128
    dense_blocks: jax.Array | None
    nb_dims: jax.Array | None  # (3,) i32 — block-grid dims

    @property
    def num_voxels(self) -> jax.Array:
        return jnp.sum(self.valid)


def _slot_corners(grid: Grid) -> jax.Array:
    """Exact per-slot cell corner reconstructed from the grid keys (no
    scatter, no accumulation error): (capacity, 3) f32."""
    keys = grid.keys
    nx, ny = grid.dims[0], grid.dims[1]
    ok = (keys != INVALID_KEY) & (keys >= 0)
    safe = jnp.where(ok, keys, 0)
    cx = safe % nx + grid.origin_cell[0]
    cy = (safe // nx) % ny + grid.origin_cell[1]
    cz = safe // (nx * ny) + grid.origin_cell[2]
    return jnp.stack([cx, cy, cz], axis=-1).astype(jnp.float32) * grid.cell_size


def _segment_stats(points, inverse, capacity, corner, corner_slot,
                   *, with_covs: bool = True):
    """Count/mean/packed-covariance per voxel slot, accumulated cell-locally.

    One-pass moments [1, local, local (x) local] reduced by the sorted-chunk
    MXU segment sum (:func:`_segment_acc`) — scatter-adds are row-bound on
    TPU (~100 ns/row). ``corner`` is each point's cell corner (the local
    frame); ``corner_slot`` the exact per-slot corner (see
    :func:`_slot_corners`). Covariance via
    (sum pp^T - n mu mu^T) / max(n - 1, 1), the reference divisor
    (voxel.py:140-148); cell-local coordinates keep the cancellation
    float32-benign.
    """
    local = points - corner
    parts = [jnp.ones((points.shape[0], 1), jnp.float32), local]
    if with_covs:
        parts += [
            local[:, 0:1] * local,  # xx, xy, xz
            local[:, 1:2] * local[:, 1:3],  # yy, yz
            local[:, 2:3] * local[:, 2:3],  # zz
        ]
    vals = jnp.concatenate(parts, axis=-1)
    acc = _segment_acc(inverse, vals, capacity)
    counts_f = acc[:, 0]
    counts = counts_f.astype(jnp.int32)
    safe_n = jnp.maximum(counts_f, 1.0)
    means_local = acc[:, 1:4] / safe_n[:, None]
    means = means_local + corner_slot
    if not with_covs:
        return counts, means, jnp.zeros((capacity, 6), jnp.float32)
    sq = jnp.stack(
        [acc[:, 4], acc[:, 7], acc[:, 9], acc[:, 5], acc[:, 6], acc[:, 8]],
        axis=-1,
    )
    mu = means_local
    mu_outer = jnp.stack(
        [
            mu[:, 0] * mu[:, 0],
            mu[:, 1] * mu[:, 1],
            mu[:, 2] * mu[:, 2],
            mu[:, 0] * mu[:, 1],
            mu[:, 0] * mu[:, 2],
            mu[:, 1] * mu[:, 2],
        ],
        axis=-1,
    )
    covs = (sq - counts_f[:, None] * mu_outer) / jnp.maximum(
        counts_f - 1.0, 1.0
    )[:, None]
    return counts, means, covs



# Sorted-chunk length for the MXU segment-sum build. 256 halves the
# transient (nchunks, CH, CH) equality-tensor footprint (~1 KB/point vs
# ~2 KB at 512) at measured-equal throughput on v5e.
_SEG_CH = 256


def _segment_acc(key, vals, d_total: int, *, presorted: bool = False):
    """Segment-sum ``vals`` by ``key`` into a dense (d_total, W) table.

    TPU scatter-add is row-bound (~100 ns/row: a (1.2M, 10) scatter costs
    ~125 ms on v5e), so the accumulation is re-expressed as sort + chunked
    segment reduction: keys are sorted (TPU sort: ~1 ms/M), each 512-row
    chunk's per-key sums come from a batched equality one-hot matmul on the
    MXU, a tiny associative scan over chunk summaries carries segments that
    span chunks, and only the ~segment-count rows are scattered (column-wise
    — narrow scatters vectorize, wide ones do not). Falls back to the plain
    scatter-add when the segment count exceeds the compaction capacity
    (pathological: more occupied cells than N/4).

    ``key`` must already route out-of-range points to ``d_total`` (dropped).
    Returns acc identical (to f32 rounding) to
    ``zeros((d_total, W)).at[key].add(vals, mode="drop")``.

    ``presorted=True`` skips the sort (``key``/``vals`` already key-sorted):
    callers with narrow payloads carry them through a multi-operand
    ``lax.sort`` instead, which is ~2x cheaper than this function's
    argsort + (N, W) row gather (row-bound) for W = 10.
    """
    n, width = vals.shape
    if presorted:
        skey, svals = key, vals
    else:
        order = jnp.argsort(key).astype(jnp.int32)
        skey = key[order]
        svals = vals[order]
    nch = -(-n // _SEG_CH)
    npad = nch * _SEG_CH
    cap = min(max(n // 4, 65536), npad)
    skey_p = jnp.concatenate(
        [skey, jnp.full((npad - n,), d_total + 1, jnp.int32)]
    )
    vals_p = jnp.concatenate([svals, jnp.zeros((npad - n, width), jnp.float32)])
    kc = skey_p.reshape(nch, _SEG_CH)
    vc = vals_p.reshape(nch, _SEG_CH, width)
    # every position's full-chunk key-sum, via batched equality matmul (MXU)
    eq = (kc[:, :, None] == kc[:, None, :]).astype(jnp.float32)
    S = jnp.einsum("cij,cjf->cif", eq, vc, precision=jax.lax.Precision.HIGHEST)
    # chunk summaries + associative scan carry segments across chunk borders
    last_key = kc[:, -1]
    first_key = kc[:, 0]
    # the last position's full-chunk key-sum IS the chunk suffix — no
    # second masked pass over (nch, CH, W)
    suffix = S[:, -1, :]
    all_same = first_key == last_key

    def comb(a, b):
        a_first, a_last, a_suf, a_same = a
        b_first, b_last, b_suf, b_same = b
        cont = (a_last == b_first) & b_same
        new_suf = b_suf + jnp.where(cont[..., None], a_suf, 0.0)
        return (a_first, b_last, new_suf, a_same & b_same & (a_last == b_first))

    sc = jax.lax.associative_scan(comb, (first_key, last_key, suffix, all_same))
    prev_last = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sc[1][:-1]])
    prev_suf = jnp.concatenate([jnp.zeros((1, width), jnp.float32), sc[2][:-1]])
    carry = jnp.where((prev_last == first_key)[:, None], prev_suf, 0.0)
    S_flat = S.reshape(npad, width)
    is_end = jnp.concatenate([skey_p[1:] != skey_p[:-1], jnp.ones((1,), bool)])
    real_end = is_end & (skey_p < d_total)
    n_seg = jnp.sum(real_end)

    def compacted(_):
        # A segment's total is its end-position full-chunk sum plus the
        # cross-chunk carry (only when the segment starts the chunk) —
        # gathered at the ~n_seg ends directly, never materializing the
        # (npad, width) per-position totals.
        ends = jnp.nonzero(real_end, size=cap, fill_value=npad - 1)[0]
        live = jnp.arange(cap) < n_seg
        # dead-tail keys ascend past d_total (all dropped) so the whole
        # index vector stays sorted AND duplicate-free for the hints below
        seg_keys = jnp.where(
            live, skey_p[ends], d_total + jnp.arange(cap, dtype=jnp.int32)
        )
        c_idx = ends // _SEG_CH
        seg_vals = S_flat[ends] + jnp.where(
            (skey_p[ends] == first_key[c_idx])[:, None], carry[c_idx], 0.0
        )
        acc = jnp.zeros((d_total, width), jnp.float32)
        # seg_keys ascend (ends of a sorted key array) and are unique:
        # narrow column scatters with both hints vectorize on TPU
        for col in range(width):
            acc = acc.at[seg_keys, col].set(
                seg_vals[:, col], mode="drop",
                indices_are_sorted=True, unique_indices=True,
            )
        return acc

    def overflow(_):
        return jnp.zeros((d_total, width), jnp.float32).at[key].add(
            vals, mode="drop"
        )

    return jax.lax.cond(n_seg <= cap, compacted, overflow, 0)


def invert_cov_packed(covs: jax.Array) -> jax.Array:
    """Analytic symmetric 3x3 inverse, packed->packed, with the reference's
    singular-determinant guard (voxel.py:69-102: ``det == 0 -> 1e6``)."""
    a, b, c = covs[..., 0], covs[..., 1], covs[..., 2]
    d, e, f = covs[..., 3], covs[..., 4], covs[..., 5]
    det = a * b * c + 2 * d * e * f - a * f * f - b * e * e - c * d * d
    det = jnp.where(det == 0, jnp.asarray(1e6, covs.dtype), det)
    c0 = (b * c - f * f) / det
    c1 = -(d * c - e * f) / det
    c2 = (d * f - e * b) / det
    c3 = (a * c - e * e) / det
    c4 = -(a * f - d * e) / det
    c5 = (a * b - d * d) / det
    return jnp.stack([c0, c3, c5, c1, c2, c4], axis=-1)


def build_voxel_map(
    points,
    voxel_size: float,
    *,
    min_points: int = 10,
    with_icov: bool = False,
    with_normals: bool = True,
    capacity: int | None = None,
    rich: str | None = None,
) -> VoxelMap:
    """Build the capacity-padded voxel map (reference ``set_points``).

    ``with_icov`` additionally materializes inverse covariances (NDT's
    ``calc_icov``, ndt.py:21); ``with_normals=False`` skips second moments
    and the eigensolve entirely (centroid-only maps, e.g. the ICP proxy).
    ``rich`` ∈ {None, "normals", "sqrt_icov"} attaches the planar per-cell
    feature table consumed by the fused Pallas align kernel (dense-direct
    maps only). One bounding-box host sync; the rest is a single jitted
    program.
    """
    if rich == "sqrt_icov" and not with_icov:
        raise ValueError("rich='sqrt_icov' requires with_icov=True")
    # bbox on the raw input: NumPy inputs never touch the device for it
    lo_cell, hi_cell = _bbox_cells(points, voxel_size)
    points = jnp.asarray(points, dtype=jnp.float32)
    total_cells = int(np.prod(hi_cell - lo_cell + 1))
    if capacity is None and total_cells <= DENSE_CELL_BUDGET:
        # Dense-direct build: voxel slot == linear cell key, so the
        # sort-based ``unique`` (the costliest part of set_target) disappears
        # entirely — points segment-reduce straight into dense cell rows.
        # The blocked query table (+ rich per-cell features) is fused into
        # the SAME program: stats + blocks in one dispatch.
        dims = tuple(int(x) for x in (hi_cell - lo_cell + 1))
        vm = _build_voxel_map_dense(
            points,
            jnp.asarray(lo_cell, jnp.int32),
            jnp.float32(voxel_size),
            dims_static=dims,
            min_points=min_points,
            with_icov=with_icov,
            with_normals=with_normals or with_icov,
            rich=rich,
            with_blocks=True,
        )
        # Grid geometry is host-known: store it as NumPy so downstream
        # device_gets (fused-spec construction, update_voxel_map) are free.
        nb = tuple(-(-d // b) for d, b in zip(dims, DENSE_BLOCK))
        vm = vm._replace(
            grid=vm.grid._replace(
                origin_cell=np.asarray(lo_cell, np.int32),
                cell_size=np.float32(voxel_size),
                dims=np.asarray(dims, np.int32),
            ),
            nb_dims=np.asarray(nb, np.int32),
        )
        return vm
    else:
        grid, inverse, _ = build_grid(points, voxel_size, capacity=capacity)
        vm = _finish_voxel_map(
            points, grid, inverse, min_points=min_points, with_icov=with_icov
        )
        vm = vm._replace(grid=grid)  # keep build_grid's host-NumPy geometry
        dims = tuple(int(x) for x in np.asarray(grid.dims))
    if grid.dense is not None:
        # blocked table needs static block-grid dims (host ints)
        nb = tuple(-(-d // b) for d, b in zip(dims, DENSE_BLOCK))
        if rich == "normals":
            feats = vm.normals
        elif rich == "sqrt_icov":
            feats = sqrt_icov_u6(vm.icovs)
        elif rich is None:
            feats = None
        else:
            raise ValueError(f"unknown rich kind {rich!r}")
        blocks = _build_blocks_jit(grid, vm.means, vm.valid, nb, feats)
        vm = vm._replace(dense_blocks=blocks, nb_dims=np.asarray(nb, np.int32))
    return vm


# Process-level geometry hints for the deferred (no-bbox-round-trip) build:
# {(voxel_size, min_points, with_icov, rich): (origin tuple, dims tuple)}.
# Purely a performance cache — correctness is enforced by the n_dropped
# check every deferred consumer performs at its next host sync.
_GEOM_HINTS: dict = {}


def build_voxel_map_deferred(points, voxel_size: float, *, min_points: int = 10,
                             with_icov: bool = False, rich: str | None = None,
                             use_hint: bool = True):
    """:func:`build_voxel_map` minus the bounding-box host round trip.

    Returns ``(vm, n_dropped)``. On a geometry-hint hit the build runs with
    the cached (origin, dims) statics and ZERO host syncs; ``n_dropped`` is
    then a device scalar the caller MUST check at its next sync — nonzero
    means the hinted region under-covered the cloud (the map silently lacks
    those points) and the caller must rebuild with ``use_hint=False``,
    which re-seeds the hint from the fresh bbox. On a miss (first build of
    a geometry class) the synchronous path runs and ``n_dropped`` is None.

    The SLAM steady state — set_target of the same map region per scan —
    pays the bbox round trip once per process instead of once per build
    (~35 ms through a remote-attach tunnel).
    """
    key = (float(voxel_size), int(min_points), bool(with_icov), rich)
    hint = _GEOM_HINTS.get(key) if use_hint else None
    if hint is not None and points.shape[0] > 0:
        origin, dims = hint
        pts = jnp.asarray(points, jnp.float32)
        vm, n_dropped = _build_voxel_map_dense(
            pts, jnp.asarray(origin, jnp.int32), jnp.float32(voxel_size),
            dims_static=dims, min_points=min_points, with_icov=with_icov,
            with_normals=True, rich=rich, with_blocks=True,
            count_dropped=True,
        )
        nb = tuple(-(-d // b) for d, b in zip(dims, DENSE_BLOCK))
        vm = vm._replace(
            grid=vm.grid._replace(
                origin_cell=np.asarray(origin, np.int32),
                cell_size=np.float32(voxel_size),
                dims=np.asarray(dims, np.int32),
            ),
            nb_dims=np.asarray(nb, np.int32),
        )
        return vm, n_dropped
    # Miss: seed the hint from the (one-sync) bbox, then run the HINTED
    # build — so every dense build in the process executes the same
    # padded-dims program (the sync path would compile a second,
    # exact-dims program that is thrown away after the first call).
    # Dims pad up to a multiple of 8 per axis: headroom for slightly-grown
    # clouds without a recompile; growth below origin or past the padding
    # triggers the n_dropped rebuild path.
    if points.shape[0] > 0:
        lo_cell, hi_cell = _bbox_cells(points, voxel_size)
        dims = tuple(
            int(-(-int(d) // 8) * 8) for d in (hi_cell - lo_cell + 1)
        )
        if int(np.prod([float(d) for d in dims])) <= DENSE_CELL_BUDGET:
            _GEOM_HINTS[key] = (tuple(int(x) for x in lo_cell), dims)
            vm, n_dropped = build_voxel_map_deferred(
                points, voxel_size, min_points=min_points,
                with_icov=with_icov, rich=rich,
            )
            # the hint covers the bbox exactly, so nothing can drop here —
            # callers still carry the device scalar through their next sync
            return vm, n_dropped
    vm = build_voxel_map(
        points, voxel_size, min_points=min_points, with_icov=with_icov,
        rich=rich,
    )
    return vm, None


_build_blocks_jit = partial(jax.jit, static_argnames=("nb_dims_static",))(build_dense_blocks)
_segment_stats_jit = partial(jax.jit, static_argnames=("capacity", "with_covs"))(_segment_stats)
_dense_blocks_jit = partial(jax.jit, static_argnames=("dims_static", "nb_dims_static"))(
    dense_blocks_from_dense
)


@jax.jit
def sqrt_icov_u6(icovs: jax.Array) -> jax.Array:
    """Upper-triangular square-root components for the fused NDT kernel:
    (..., 6) packed icov -> (..., 6) ``[u00, u01, u02, u11, u12, u22]`` with
    ``U^T U = icov`` (see :func:`sqrt_icov_packed`)."""
    U = sqrt_icov_packed(icovs)
    return jnp.stack(
        [U[..., 0, 0], U[..., 0, 1], U[..., 0, 2], U[..., 1, 1], U[..., 1, 2], U[..., 2, 2]],
        axis=-1,
    )


@partial(jax.jit, static_argnames=(
    "dims_static", "min_points", "with_icov", "with_normals", "rich",
    "with_blocks", "count_dropped"))
def _build_voxel_map_dense(points, origin_cell, cell_size, *, dims_static,
                           min_points, with_icov, with_normals=True,
                           rich=None, with_blocks=False, count_dropped=False):
    nx, ny, nz = dims_static
    d_total = nx * ny * nz
    coords = cell_coords(points, cell_size)
    rel = coords - origin_cell
    # In-range guard: the bbox comes from host float64 division while device
    # keys use float32, which can disagree by one cell when p/cell_size lands
    # within ~1 ULP of an integer. An unguarded out-of-range rel would wrap
    # (negative scatter indices, or rel_x == nx aliasing into the next y-row)
    # and corrupt an unrelated voxel; route such points to the dropped key
    # instead (mirrors _update_voxel_map_dense).
    in_range = jnp.all((rel >= 0) & (rel < jnp.asarray(dims_static, jnp.int32)), axis=-1)
    key = rel[:, 0] + nx * (rel[:, 1] + ny * rel[:, 2])
    key = jnp.where(in_range, key, d_total)

    # Multi-operand sort carries the coordinates WITH the key — ~2x cheaper
    # than argsort + an (N, 10) row gather of precomputed moments (gathers
    # are row-bound). Moments are recomputed from the sorted points; the
    # cells (hence corners) are bit-identical either side of the sort.
    skey, sx, sy, sz = jax.lax.sort(
        (key, points[:, 0], points[:, 1], points[:, 2]),
        dimension=0, num_keys=1, is_stable=True,
    )
    spoints = jnp.stack([sx, sy, sz], axis=-1)
    corner = cell_coords(spoints, cell_size).astype(jnp.float32) * cell_size

    # One-pass moment accumulation: [1, p, p (x) p]. Cell-local coordinates
    # keep every term O(cell_size), so the E[pp^T] - mu mu^T cancellation is
    # float32-benign (unlike the reference's global-coordinate float32
    # moments, estimate_normals.py:50).
    local = spoints - corner
    parts = [jnp.ones((points.shape[0], 1), jnp.float32), local]
    if with_normals:
        parts += [
            local[:, 0:1] * local,  # xx, xy, xz
            local[:, 1:2] * local[:, 1:3],  # yy, yz
            local[:, 2:3] * local[:, 2:3],  # zz
        ]
    vals = jnp.concatenate(parts, axis=-1)  # (N, 4 or 10)
    acc = _segment_acc(skey, vals, d_total, presorted=True)
    counts_f = acc[:, 0]
    counts = counts_f.astype(jnp.int32)
    safe_n = jnp.maximum(counts_f, 1.0)
    mean_local = acc[:, 1:4] / safe_n[:, None]
    if with_normals:
        # packed order [xx, yy, zz, xy, xz, yz] from accumulated [xx,xy,xz,yy,yz,zz]
        sq = jnp.stack(
            [acc[:, 4], acc[:, 7], acc[:, 9], acc[:, 5], acc[:, 6], acc[:, 8]], axis=-1
        )
        mu_outer = jnp.stack(
            [
                mean_local[:, 0] * mean_local[:, 0],
                mean_local[:, 1] * mean_local[:, 1],
                mean_local[:, 2] * mean_local[:, 2],
                mean_local[:, 0] * mean_local[:, 1],
                mean_local[:, 0] * mean_local[:, 2],
                mean_local[:, 1] * mean_local[:, 2],
            ],
            axis=-1,
        )
        # (sum pp^T - n mu mu^T) / max(n - 1, 1)  (reference divisor, voxel.py:140-148)
        covs = (sq - counts_f[:, None] * mu_outer) / jnp.maximum(counts_f - 1.0, 1.0)[:, None]
    else:
        covs = jnp.zeros((d_total, 6), jnp.float32)

    # Per-slot cell corner analytically from the slot index (no scatter).
    slot = jnp.arange(d_total, dtype=jnp.int32)
    scx = slot % nx + origin_cell[0]
    scy = (slot // nx) % ny + origin_cell[1]
    scz = slot // (nx * ny) + origin_cell[2]
    slot_corner = jnp.stack([scx, scy, scz], axis=-1).astype(jnp.float32) * cell_size
    means = mean_local + slot_corner

    valid = counts >= min_points
    if with_normals:
        # Closed-form eigh on EVERY cell beats compacting to the valid
        # subset: the eigensolve is ~50 VPU flops/row, while the
        # nonzero + gather + scatter of a subset pass is ~3 row-bound
        # memory ops/row (~100 ns each) — vectorized-all is 10x cheaper
        # at dense-direct occupancies.
        normals = jnp.where(
            valid[:, None], smallest_eigvec_sym3(covs), 0.0
        )
    else:
        normals = jnp.zeros((d_total, 3), jnp.float32)
    icovs = invert_cov_packed(covs) if with_icov else None
    identity = jnp.arange(d_total, dtype=jnp.int32)
    grid = Grid(
        origin_cell=origin_cell,
        cell_size=cell_size,
        dims=jnp.asarray(dims_static, jnp.int32),
        keys=identity,
        n_cells=jnp.sum(counts > 0).astype(jnp.int32),
        dense=identity,
    )
    # Blocked query table fused into the SAME program (one dispatch, and
    # XLA overlaps the permutation writes with the stats pipeline) — the
    # separate-blocks route cost a full extra program round trip per build.
    dense_blocks = None
    nb = None
    if with_blocks:
        nb = tuple(-(-d // b) for d, b in zip(dims_static, DENSE_BLOCK))
        if rich == "normals":
            feats = normals
        elif rich == "sqrt_icov":
            feats = sqrt_icov_u6(icovs)
        elif rich is None:
            feats = None
        else:
            raise ValueError(f"unknown rich kind {rich!r}")
        dense_blocks = dense_blocks_from_dense(
            means, valid, dims_static, nb, feats
        )
    vm = VoxelMap(
        grid=grid,
        means=means,
        covs=covs,
        normals=normals,
        counts=counts,
        valid=valid,
        icovs=icovs,
        dense_blocks=dense_blocks,
        # nb_dims stays host-NumPy: the caller sets it (jit outputs would
        # land it on device and re-cost a sync per spec construction)
        nb_dims=None,
    )
    if count_dropped:
        # deferred-validity builds (hinted geometry, no bbox round trip):
        # nonzero means the hinted region under-covered the cloud and those
        # points are silently absent — the caller must detect and rebuild
        return vm, jnp.sum(jnp.logical_not(in_range).astype(jnp.int32))
    return vm


@partial(jax.jit, static_argnames=("min_points", "with_icov"))
def _finish_voxel_map(points, grid: Grid, inverse, *, min_points, with_icov):
    capacity = grid.keys.shape[0]
    corner = cell_coords(points, grid.cell_size).astype(jnp.float32) * grid.cell_size
    counts, means, covs = _segment_stats(
        points, inverse, capacity, corner, _slot_corners(grid)
    )
    valid = counts >= min_points
    normals = smallest_eigvec_sym3(covs)
    icovs = invert_cov_packed(covs) if with_icov else None
    return VoxelMap(
        grid=grid,
        means=means,
        covs=covs,
        normals=normals,
        counts=counts,
        valid=valid,
        icovs=icovs,
        dense_blocks=None,
        nb_dims=None,
    )


def query_nearest_voxel(vmap_: VoxelMap, query, *, voxel_size: float, max_dist: float,
                        fixed_tiers: bool = False,
                        full_window: bool = False) -> NNResult:
    """Nearest valid voxel for each query point -> (dist, slot).

    Dispatches to the dense inf-padded table fast path when the map has one
    (``knn.nearest_voxel_dense``: one 12-byte gather per probe, 3^3 near
    window + compacted full-window fallback) and otherwise to the sparse
    per-slot path. ``voxel_size``/``max_dist`` must be static (they shape the
    offset tables).
    """
    if vmap_.dense_blocks is not None:
        radius_full = int(np.ceil(max_dist / voxel_size - 1e-9))
        res = nearest_voxel_blocks(
            vmap_.grid,
            vmap_.dense_blocks,
            vmap_.nb_dims,
            query,
            radius_near=min(1, radius_full),
            radius_full=radius_full,
            fixed_tiers=fixed_tiers,
            full_window=full_window,
        )
        dense = vmap_.grid.dense
        slot = dense[jnp.clip(res.idx, 0, dense.shape[0] - 1)]
        slot = jnp.where(jnp.isfinite(res.dist), slot, jnp.int32(-1))
        return NNResult(dist=res.dist, idx=slot)
    offsets_full = search_offsets(max_dist, voxel_size)
    return nearest_voxel(vmap_.grid, vmap_.means, vmap_.valid, query, offsets_full)


def sqrt_icov_packed(icovs: jax.Array) -> jax.Array:
    """Upper-triangular square roots L^T with icov = L L^T: (..., 6) -> (..., 3, 3).

    Closed-form 3x3 Cholesky (no LAPACK), matching the reference's
    ``calc_sqrt_icov`` contract (voxel.py:61-67: ``cholesky(icov)`` transposed
    — declared there but never called; provided for surface completeness and
    for whitened-residual formulations).
    """
    a, b, c = icovs[..., 0], icovs[..., 1], icovs[..., 2]
    d, e, f = icovs[..., 3], icovs[..., 4], icovs[..., 5]
    eps = jnp.asarray(1e-20, icovs.dtype)
    l11 = jnp.sqrt(jnp.maximum(a, eps))
    l21 = d / l11
    l31 = e / l11
    l22 = jnp.sqrt(jnp.maximum(b - l21 * l21, eps))
    l32 = (f - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(c - l31 * l31 - l32 * l32, eps))
    zero = jnp.zeros_like(a)
    # L^T (upper triangular), as the reference stores it
    return jnp.stack(
        [
            jnp.stack([l11, l21, l31], axis=-1),
            jnp.stack([zero, l22, l32], axis=-1),
            jnp.stack([zero, zero, l33], axis=-1),
        ],
        axis=-2,
    )


def update_voxel_map(vm: VoxelMap, new_points, min_points: int = 10,
                     return_dropped: bool = False):
    """Incrementally merge ``new_points`` into an existing dense-direct map.

    The capability the reference declares but never implements
    (``Registration.update_target`` "update map w/o rebuilding index",
    registration.py:36-43). Per-voxel count/mean/covariance are merged with
    the parallel-axis (Chan) formulas, normals/icovs are re-derived, and the
    blocked query table is rebuilt — no sort, no re-touching of old points.

    Points outside the map's bounding box cannot extend a dense grid and are
    dropped (extend by rebuilding with ``build_voxel_map``). Pass
    ``return_dropped=True`` to get ``(map, n_dropped)`` — a SLAM loop
    feeding a growing scene should watch the count and rebuild when it
    goes non-zero. Requires a dense-direct map (``grid.dense is not None``).
    """
    if vm.grid.dense is None:
        raise NotImplementedError("update_voxel_map requires a dense-direct map")
    dims_t = tuple(int(x) for x in jax.device_get(vm.grid.dims))
    if vm.means.shape[0] != int(np.prod(dims_t)):
        # capacity-built grid with a dense *lookup* table: slots are not
        # linear cell keys, so the dense merge arithmetic does not apply
        raise NotImplementedError("update_voxel_map requires slot == cell key")
    new_points = jnp.asarray(new_points, dtype=jnp.float32)
    with_icov = vm.icovs is not None
    nb_dims = tuple(int(x) for x in jax.device_get(vm.nb_dims)) if vm.nb_dims is not None else None
    vm2, n_dropped = _update_voxel_map_dense(
        vm, new_points, with_icov=with_icov, min_points=min_points)
    # jit tracing turns the host-NumPy grid geometry into device arrays on
    # the way through — restore the host copies so later syncs stay free
    vm2 = vm2._replace(grid=vm2.grid._replace(
        origin_cell=np.asarray(jax.device_get(vm.grid.origin_cell), np.int32),
        cell_size=np.float32(jax.device_get(vm.grid.cell_size)),
        dims=np.asarray(jax.device_get(vm.grid.dims), np.int32),
    ))
    if nb_dims is not None:
        dims = tuple(int(x) for x in jax.device_get(vm.grid.dims))
        nb = tuple(-(-d // b) for d, b in zip(dims, DENSE_BLOCK))
        # regenerate whichever feature planes the old table carried,
        # recognized by row width (derived from DENSE_BLOCK, not constants)
        from point_cloud_registration_tpu.ops.knn import padded_row_width

        w = int(np.prod(DENSE_BLOCK))
        coord_w = padded_row_width(3 * w)
        width = vm.dense_blocks.shape[-1]
        if width >= coord_w + padded_row_width(6 * w):
            feats = sqrt_icov_u6(vm2.icovs)
        elif width >= coord_w + padded_row_width(3 * w):
            feats = vm2.normals
        else:
            feats = None
        blocks = _dense_blocks_jit(vm2.means, vm2.valid, dims, nb, feats)
        vm2 = vm2._replace(dense_blocks=blocks, nb_dims=np.asarray(nb, np.int32))
    if return_dropped:
        return vm2, n_dropped
    return vm2


@partial(jax.jit, static_argnames=("with_icov", "min_points"))
def _update_voxel_map_dense(vm: VoxelMap, new_points, *, with_icov, min_points):
    grid = vm.grid
    d_total = vm.means.shape[0]
    nx, ny = grid.dims[0], grid.dims[1]
    coords = cell_coords(new_points, grid.cell_size)
    rel = coords - grid.origin_cell
    in_range = jnp.all((rel >= 0) & (rel < grid.dims), axis=-1)
    n_dropped = jnp.sum(jnp.logical_not(in_range)).astype(jnp.int32)
    key = rel[:, 0] + nx * (rel[:, 1] + ny * rel[:, 2])
    key = jnp.where(in_range, key, d_total)  # out-of-bounds -> dropped

    corner = coords.astype(jnp.float32) * grid.cell_size
    local = new_points - corner
    vals = jnp.concatenate(
        [
            jnp.ones((new_points.shape[0], 1), jnp.float32),
            local,
            local[:, 0:1] * local,
            local[:, 1:2] * local[:, 1:3],
            local[:, 2:3] * local[:, 2:3],
        ],
        axis=-1,
    )
    acc = jnp.zeros((d_total, 10), jnp.float32).at[key].add(vals, mode="drop")
    m = acc[:, 0]
    m_safe = jnp.maximum(m, 1.0)
    mean_b_local = acc[:, 1:4] / m_safe[:, None]
    sq_b = jnp.stack(
        [acc[:, 4], acc[:, 7], acc[:, 9], acc[:, 5], acc[:, 6], acc[:, 8]], axis=-1
    )
    mu_b = _outer6(mean_b_local)
    # raw (un-normalized) second central moment of the new batch
    M2_b = sq_b - m[:, None] * mu_b

    # existing stats, back in cell-local coordinates
    slot = jnp.arange(d_total, dtype=jnp.int32)
    scx = slot % nx + grid.origin_cell[0]
    scy = (slot // nx) % ny + grid.origin_cell[1]
    scz = slot // (nx * ny) + grid.origin_cell[2]
    slot_corner = jnp.stack([scx, scy, scz], axis=-1).astype(jnp.float32) * grid.cell_size
    n = vm.counts.astype(jnp.float32)
    mean_a_local = vm.means - slot_corner
    M2_a = vm.covs * jnp.maximum(n - 1.0, 1.0)[:, None]

    # Chan parallel merge
    tot = n + m
    tot_safe = jnp.maximum(tot, 1.0)
    delta = mean_b_local - mean_a_local
    mean_local = mean_a_local + delta * (m / tot_safe)[:, None]
    M2 = M2_a + M2_b + _outer6(delta) * (n * m / tot_safe)[:, None]
    covs = M2 / jnp.maximum(tot - 1.0, 1.0)[:, None]
    covs = jnp.where((n[:, None] > 0) | (m[:, None] > 0), covs, 0.0)
    mean_local = jnp.where((tot > 0)[:, None], mean_local, 0.0)

    counts = tot.astype(jnp.int32)
    valid = counts >= min_points
    means = mean_local + slot_corner
    normals = smallest_eigvec_sym3(covs)
    icovs = invert_cov_packed(covs) if with_icov else None
    return vm._replace(
        means=means,
        covs=covs,
        normals=normals,
        counts=counts,
        valid=valid,
        icovs=icovs,
    ), n_dropped


def _outer6(v: jax.Array) -> jax.Array:
    """Packed outer product vv^T: (..., 3) -> (..., 6)."""
    return jnp.stack(
        [
            v[..., 0] * v[..., 0],
            v[..., 1] * v[..., 1],
            v[..., 2] * v[..., 2],
            v[..., 0] * v[..., 1],
            v[..., 0] * v[..., 2],
            v[..., 1] * v[..., 2],
        ],
        axis=-1,
    )


@partial(jax.jit, static_argnames=("dims_static", "capacity", "count_dropped"))
def _voxel_filter_dense(points, origin_cell, cell_size, *, dims_static,
                        capacity, count_dropped=False):
    """Sort-free downsampling: ONE fused (N, 4)-row scatter-add of
    ``[x - corner, ..., 1]`` into dense cell rows, then an on-device
    compaction of the occupied cells. Centroids accumulate cell-relative
    (f32-stable far from the origin, same policy as the map builds)."""
    nx, ny, nz = dims_static
    d_total = nx * ny * nz
    coords = cell_coords(points, cell_size)
    rel = coords - origin_cell
    in_range = jnp.all(
        (rel >= 0) & (rel < jnp.asarray(dims_static, jnp.int32)), axis=-1
    )
    key = rel[:, 0] + nx * (rel[:, 1] + ny * rel[:, 2])
    key = jnp.where(in_range, key, d_total)
    corner = coords.astype(jnp.float32) * cell_size
    src = jnp.concatenate(
        [points - corner, jnp.ones((points.shape[0], 1), jnp.float32)], axis=1
    )
    acc = jnp.zeros((d_total + 1, 4), jnp.float32).at[key].add(src, mode="drop")
    counts = acc[:d_total, 3]
    # corner of each dense cell, reconstructed from its linear key
    ci = jnp.arange(d_total, dtype=jnp.int32)
    cx = ci % nx
    rem = ci // nx
    cell_corner = (
        jnp.stack([cx, rem % ny, rem // ny], axis=-1) + origin_cell
    ).astype(jnp.float32) * cell_size
    means = acc[:d_total, :3] / jnp.maximum(counts, 1.0)[:, None] + cell_corner
    occ = counts > 0
    n_cells = jnp.sum(occ).astype(jnp.int32)
    idx = jnp.nonzero(occ, size=capacity, fill_value=d_total)[0]
    live = jnp.arange(capacity) < n_cells
    out = jnp.where(
        live[:, None], means[jnp.minimum(idx, d_total - 1)], jnp.inf
    )
    if count_dropped:
        n_dropped = jnp.sum(jnp.logical_not(in_range)).astype(jnp.int32)
        return out, n_cells, n_dropped
    return out, n_cells


def voxel_filter_device(points, voxel_size: float):
    """Device-resident voxel downsampling: ``(means (C, 3) f32, n_cells)``.

    Rows past ``n_cells`` are +inf padding; nothing crosses to the host
    (feed the result straight into ``set_target``/coreset pipelines). The
    dense-direct build is sort-free — one fused scatter-add + compaction.
    Exact: pays one bounding-box host sync per call (and seeds the geometry
    hint the deferred variant uses).
    """
    lo_cell, hi_cell = _bbox_cells(points, voxel_size)
    points = jnp.asarray(points, dtype=jnp.float32)
    total_cells = int(np.prod(hi_cell - lo_cell + 1))
    if total_cells <= DENSE_CELL_BUDGET:
        # seed the deferred variant's hint with padded dims (same headroom
        # policy as build_voxel_map_deferred)
        dims = tuple(
            int(-(-int(d) // 8) * 8) for d in (hi_cell - lo_cell + 1)
        )
        if int(np.prod([float(d) for d in dims])) <= DENSE_CELL_BUDGET:
            _GEOM_HINTS[("vfilter", float(voxel_size))] = (
                tuple(int(x) for x in lo_cell), dims
            )
        else:
            dims = tuple(int(x) for x in (hi_cell - lo_cell + 1))
        capacity = 1 << max(0, int(min(points.shape[0], int(np.prod([float(d) for d in dims]))) - 1).bit_length())
        return _voxel_filter_dense(
            points, jnp.asarray(lo_cell, jnp.int32), jnp.float32(voxel_size),
            dims_static=dims, capacity=capacity,
        )
    grid, inverse, _ = build_grid(points, voxel_size)
    corner = cell_coords(points, grid.cell_size).astype(jnp.float32) * grid.cell_size
    capacity = grid.keys.shape[0]
    counts, means, _ = _segment_stats_jit(
        points, inverse, capacity, corner, _slot_corners(grid), with_covs=False
    )
    live = jnp.arange(capacity) < grid.n_cells
    return jnp.where(live[:, None], means, jnp.inf), grid.n_cells


def voxel_filter_device_deferred(points, voxel_size: float):
    """Geometry-hinted :func:`voxel_filter_device`:
    ``(means, n_cells, n_dropped)`` with ZERO host syncs on a hint hit.

    ``n_dropped`` is a device scalar the caller MUST check at its next sync
    — nonzero means the hinted region under-covered the cloud (those points
    are missing from the result) and the call must be redone with
    :func:`voxel_filter_device` (which re-seeds the hint). On a hint miss
    the exact path runs and ``n_dropped`` is a constant 0.
    """
    hint = _GEOM_HINTS.get(("vfilter", float(voxel_size)))
    if hint is not None and points.shape[0] > 0:
        origin, dims = hint
        pts = jnp.asarray(points, jnp.float32)
        capacity = 1 << max(0, int(min(points.shape[0], int(np.prod([float(d) for d in dims]))) - 1).bit_length())
        return _voxel_filter_dense(
            pts, jnp.asarray(origin, jnp.int32), jnp.float32(voxel_size),
            dims_static=dims, capacity=capacity, count_dropped=True,
        )
    means, n_cells = voxel_filter_device(points, voxel_size)
    return means, n_cells, jnp.int32(0)


def voxel_filter(points, voxel_size: float) -> np.ndarray:
    """Voxel downsampling: per-voxel centroid, float32 (voxel.py:209-241).

    Output content matches the reference exactly; ordering differs (reference
    orders by its modular hash, we order by bounding-box key — both are
    implementation details of ``unique``). One combined device_get (count +
    compacted rows + hint-validity) is the only host crossing in the steady
    state; an under-covering hint triggers one exact redo.
    """
    means, n_cells, nd = voxel_filter_device_deferred(points, voxel_size)
    n_cells, nd = jax.device_get((n_cells, nd))
    if int(nd) > 0:
        means, n_cells = voxel_filter_device(points, voxel_size)
        n_cells = jax.device_get(n_cells)
    # Transfer ONLY the live rows, in a second sync: the capacity-padded
    # array is ~5x the compacted result at bench scale (12.6 MB vs 2.4 MB)
    # and host transfer is bandwidth-bound — the count-first round trip
    # costs ~25 ms, the padding it avoids ~300 ms (measured r5).
    means_np = jax.device_get(means[: int(n_cells)])
    return np.asarray(means_np).astype(np.float32)


def color_by_voxel(points, voxel_size: float) -> np.recarray:
    """Random per-voxel RGB coloring for the viewer (voxel.py:183-206).

    Host-side visualization utility; reproduces the reference's packed
    ``[('xyz', '<f4', (3,)), ('irgb', '<u4')]`` record layout and its seeded
    palette (seed 42, voxel.py:191). Voxel enumeration order follows our
    grid key rather than the reference hash, so individual voxel hues may
    differ — the structure and statistics are identical.
    """
    points_np = np.asarray(points, dtype=np.float32)
    grid, inverse, _ = build_grid(points_np, voxel_size)
    inverse = np.asarray(jax.device_get(inverse))
    n_cells = int(jax.device_get(grid.n_cells))
    rng = np.random.RandomState(42)
    colors = rng.randint(0, 256, size=(n_cells, 3)).astype(np.uint8)
    point_colors = colors[inverse]
    rgb = (
        point_colors[:, 0].astype(np.uint32) << 16
        | point_colors[:, 1].astype(np.uint32) << 8
        | point_colors[:, 2].astype(np.uint32)
    )
    data_type = [("xyz", "<f4", (3,)), ("irgb", "<u4")]
    return np.rec.fromarrays([points_np, rgb], dtype=data_type)
