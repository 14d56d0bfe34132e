"""Fixed-shape nearest-neighbor queries over the voxel grid.

These replace every ``KDTree.query`` call site in the reference
(/root/reference/point_cloud_registration/kdtree.py contract:
``query(points, k) -> (dist, idx)``):

* :func:`nearest_voxel` — nearest occupied-voxel centroid (the VPlaneICP/NDT
  correspondence, reference voxel.py:171-179 which kd-trees over centroids);
* :func:`nearest_point` — gated 1-NN over raw points (ICP/PlaneICP,
  icp.py:33 / plane_icp.py:42);
* :func:`knn_points` — k-NN over raw points (normal estimation,
  estimate_normals.py:39);
* :func:`brute_force_nn` / :func:`brute_force_knn` — exact tiled fallbacks
  used as validation oracles (SURVEY §7: exact mode for bit-level parity).

Grid queries are *exact* for any match inside ``max_dist`` as long as the
per-cell candidate cap is not exceeded (the offset table provably covers the
gated radius — see ``hashgrid.search_offsets``); the cap is the one
approximation, and the brute-force paths quantify it in tests.

Everything is branchless ``lax.scan``/``fori_loop`` over static offset tables:
no data-dependent shapes, no host sync, safe under jit/vmap/shard_map.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from point_cloud_registration_tpu.ops.hashgrid import (
    Buckets,
    Grid,
    cell_coords,
    coords_to_key,
    lookup_slots,
)

_BIG = jnp.float32(np.inf)


class NNResult(NamedTuple):
    dist: jax.Array  # (N,) f32 — Euclidean distance (inf when no candidate)
    idx: jax.Array  # (N,) i32 — matched slot/point index (-1 when none)


def _query_cell_keys(grid: Grid, query: jax.Array, offsets: jax.Array) -> jax.Array:
    """Keys of ``query``'s cell shifted by each offset: (K, N) i32."""
    qc = cell_coords(query, grid.cell_size)  # (N, 3)
    keys = jax.vmap(lambda off: coords_to_key(qc + off, grid.origin_cell, grid.dims))(offsets)
    return keys


def nearest_voxel(
    grid: Grid,
    means: jax.Array,
    valid: jax.Array,
    query: jax.Array,
    offsets: np.ndarray | jax.Array,
) -> NNResult:
    """Nearest valid voxel centroid within the offset window.

    Replaces the reference's kd-tree over voxel means (voxel.py:165, :176).
    ``means`` is the (C, 3) capacity-padded centroid table, ``valid`` the
    min_points mask (voxel.py:151-153). One centroid gather per offset; the
    winning slot is returned for a single post-hoc field gather by the caller.
    """
    offsets = jnp.asarray(offsets, jnp.int32)
    keys = _query_cell_keys(grid, query, offsets)  # (K, N)
    n = query.shape[0]

    def step(carry, key_row):
        best_d2, best_slot = carry
        slot = lookup_slots(grid, key_row)  # (N,)
        safe = jnp.clip(slot, 0, means.shape[0] - 1)
        ok = (slot >= 0) & valid[safe]
        diff = query - means[safe]
        d2 = jnp.where(ok, jnp.sum(diff * diff, axis=-1), _BIG)
        better = d2 < best_d2
        return (
            jnp.where(better, d2, best_d2),
            jnp.where(better, slot, best_slot),
        ), None

    # Derive the scan carry from the (possibly sharded) query so its type —
    # including shard_map's varying-manual-axes annotation — matches the body
    # output; a plain jnp.full would be device-invariant and reject under
    # vmap-of-shard_map.
    init = (query[:, 0] * 0 + _BIG, jnp.zeros_like(query[:, 0], jnp.int32) - 1)
    (best_d2, best_slot), _ = jax.lax.scan(step, init, keys)
    return NNResult(dist=jnp.sqrt(best_d2), idx=best_slot)


def nearest_voxel_dense(
    grid: Grid,
    dense_means: jax.Array,
    query: jax.Array,
    offsets_near: np.ndarray | jax.Array,
    offsets_full: np.ndarray | jax.Array,
) -> NNResult:
    """Fast nearest-voxel query against an inf-padded dense centroid table.

    ``dense_means`` is (D + 1, 3): row ``key`` holds the centroid of cell
    ``key`` for *valid* voxels and +inf otherwise; row D is the out-of-range
    sentinel. Folding validity and lookup into one table turns each offset
    probe into a single 12-byte-row gather (the jnp query path is gather-row
    bound on TPU), and the distance math gates invalid cells for free.

    Two-pass exactness: the near window (3^3) is searched first; a query
    whose best squared distance is below ``cell_size^2`` is *provably* exact
    (any centroid outside the 3x3x3 block is > cell_size away). Only when
    some gated query is unresolved does a ``lax.cond`` run the full covering
    window — after the first GN iteration correspondences are sub-cell and
    the expensive pass vanishes.

    Returns the best *cell key* in ``idx`` (callers map key -> slot with one
    ``lookup_slots`` gather).
    """
    offsets_near = jnp.asarray(offsets_near, jnp.int32)
    offsets_full = jnp.asarray(offsets_full, jnp.int32)
    sentinel = jnp.int32(dense_means.shape[0] - 1)
    qc = cell_coords(query, grid.cell_size)
    rel = qc - grid.origin_cell  # (N, 3)
    nx, ny, nz = grid.dims[0], grid.dims[1], grid.dims[2]

    def probe_scan(q, r, offsets, init):
        def probe(carry, off):
            best_d2, best_key = carry
            rr = r + off
            in_range = (
                (rr[:, 0] >= 0) & (rr[:, 0] < nx)
                & (rr[:, 1] >= 0) & (rr[:, 1] < ny)
                & (rr[:, 2] >= 0) & (rr[:, 2] < nz)
            )
            key = rr[:, 0] + nx * (rr[:, 1] + ny * rr[:, 2])
            key = jnp.where(in_range, key, sentinel)
            diff = q - dense_means[key]
            d2 = diff[:, 0] * diff[:, 0] + diff[:, 1] * diff[:, 1] + diff[:, 2] * diff[:, 2]
            better = d2 < best_d2
            return (
                jnp.where(better, d2, best_d2),
                jnp.where(better, key, best_key),
            ), None

        return jax.lax.scan(probe, init, offsets)[0]

    init = (query[:, 0] * 0 + _BIG, jnp.zeros_like(rel[:, 0]) + sentinel)
    best_d2, best_key = probe_scan(query, rel, offsets_near, init)

    if offsets_full.shape[0] > offsets_near.shape[0]:
        cs2 = grid.cell_size * grid.cell_size
        mask = best_d2 >= cs2  # not provably exact from the near window
        n_unres = jnp.sum(mask)
        cap = max(query.shape[0] // 4, 1024)

        def compact_pass(carry):
            d2_all, key_all = carry
            idxs = jnp.nonzero(mask, size=cap, fill_value=0)[0]
            live = jnp.arange(cap) < n_unres
            subq = query[idxs]
            subrel = rel[idxs]
            sub_init = (subq[:, 0] * 0 + _BIG, jnp.zeros_like(subrel[:, 0]) + sentinel)
            sd2, skey = probe_scan(subq, subrel, offsets_full, sub_init)
            d2_new = d2_all.at[idxs].set(jnp.where(live, sd2, d2_all[idxs]))
            key_new = key_all.at[idxs].set(jnp.where(live, skey, key_all[idxs]))
            return d2_new, key_new

        def full_pass(carry):
            return probe_scan(query, rel, offsets_full, carry)

        # Tier 1: everything provably exact -> done. Tier 2: few unresolved ->
        # full window on a compacted subset. Tier 3 (pathological, >cap
        # unresolved, e.g. the very first iteration of a badly-initialized
        # align): full window on everything.
        tier = (n_unres > 0).astype(jnp.int32) + (n_unres > cap).astype(jnp.int32)
        best_d2, best_key = jax.lax.switch(
            tier,
            [lambda c: c, compact_pass, full_pass],
            (best_d2, best_key),
        )
    return NNResult(dist=jnp.sqrt(best_d2), idx=best_key)


def build_dense_means(grid: Grid, means: jax.Array, valid: jax.Array) -> jax.Array | None:
    """(D + 1, 3) inf-padded dense centroid table for :func:`nearest_voxel_dense`.

    Returns None when the grid has no dense table (bounding box too large);
    callers then use the sparse :func:`nearest_voxel` path.
    """
    if grid.dense is None:
        return None
    d = grid.dense.shape[0]
    table = jnp.full((d + 1, 3), jnp.inf, jnp.float32)
    ok = (grid.dense >= 0) & valid[jnp.clip(grid.dense, 0, means.shape[0] - 1)]
    src = jnp.where(
        ok[:, None], means[jnp.clip(grid.dense, 0, means.shape[0] - 1)], jnp.inf
    )
    return table.at[:d].set(src)


def nearest_point(
    grid: Grid,
    buckets: Buckets,
    points: jax.Array,
    query: jax.Array,
    offsets: np.ndarray | jax.Array,
    cap: int,
) -> NNResult:
    """Gated 1-NN over raw points via CSR buckets.

    ``cap`` bounds candidates scanned per cell (fixed shapes); cells holding
    more points contribute only their first ``cap`` entries in insertion
    order — the accuracy/throughput dial quantified in tests against
    :func:`brute_force_nn`.
    """
    offsets = jnp.asarray(offsets, jnp.int32)
    keys = _query_cell_keys(grid, query, offsets)  # (K, N)
    n = query.shape[0]
    n_pts = points.shape[0]

    def step(carry, key_row):
        slot = lookup_slots(grid, key_row)
        safe_slot = jnp.clip(slot, 0, buckets.starts.shape[0] - 1)
        start = buckets.starts[safe_slot]
        count = jnp.where(slot >= 0, buckets.counts[safe_slot], 0)

        def inner(j, c):
            best_d2, best_idx = c
            pos = jnp.clip(start + j, 0, n_pts - 1)
            pidx = buckets.perm[pos]
            ok = j < count
            diff = query - points[pidx]
            d2 = jnp.where(ok, jnp.sum(diff * diff, axis=-1), _BIG)
            better = d2 < best_d2
            return (
                jnp.where(better, d2, best_d2),
                jnp.where(better, pidx, best_idx),
            )

        carry = jax.lax.fori_loop(0, cap, inner, carry)
        return carry, None

    # Carry derived from the query for vma-type stability (see nearest_voxel).
    init = (query[:, 0] * 0 + _BIG, jnp.zeros_like(query[:, 0], jnp.int32) - 1)
    (best_d2, best_idx), _ = jax.lax.scan(step, init, keys)
    return NNResult(dist=jnp.sqrt(best_d2), idx=best_idx)


def knn_points(
    grid: Grid,
    buckets: Buckets,
    points: jax.Array,
    query: jax.Array,
    offsets: np.ndarray | jax.Array,
    cap: int,
    k: int,
    chunk: int = 16384,
) -> tuple[jax.Array, jax.Array]:
    """k-NN over raw points: returns ``(dist (N, k), idx (N, k))`` ascending.

    Candidates from the offset window are materialized per query chunk and
    ranked with ``lax.top_k`` (build-time only: this feeds normal estimation,
    estimate_normals.py:39, which the reference itself amortizes out of the
    align timing — README.md:48). ``chunk`` bounds the (chunk, K*cap)
    candidate buffer to keep HBM pressure flat for million-point clouds.
    """
    offsets = jnp.asarray(offsets, jnp.int32)
    n = query.shape[0]
    n_pad = -(-n // chunk) * chunk
    qpad = jnp.concatenate([query, jnp.zeros((n_pad - n, 3), query.dtype)], axis=0)
    qchunks = qpad.reshape(n_pad // chunk, chunk, 3)

    n_pts = points.shape[0]
    n_off = offsets.shape[0]

    def one_chunk(q):
        keys = _query_cell_keys(grid, q, offsets)  # (K, chunk)
        slot = lookup_slots(grid, keys)  # (K, chunk)
        safe_slot = jnp.clip(slot, 0, buckets.starts.shape[0] - 1)
        start = buckets.starts[safe_slot]
        count = jnp.where(slot >= 0, buckets.counts[safe_slot], 0)
        j = jnp.arange(cap, dtype=jnp.int32)  # (cap,)
        pos = jnp.clip(start[..., None] + j, 0, n_pts - 1)  # (K, chunk, cap)
        ok = j < count[..., None]
        pidx = buckets.perm[pos]
        diff = q[None, :, None, :] - points[pidx]  # (K, chunk, cap, 3)
        d2 = jnp.where(ok, jnp.sum(diff * diff, axis=-1), _BIG)
        # (chunk, K*cap) candidate matrix -> top-k smallest
        d2 = jnp.moveaxis(d2, 1, 0).reshape(chunk, n_off * cap)
        pidx = jnp.moveaxis(pidx, 1, 0).reshape(chunk, n_off * cap)
        neg_top, arg = jax.lax.top_k(-d2, k)
        top_idx = jnp.take_along_axis(pidx, arg, axis=-1)
        top_idx = jnp.where(jnp.isfinite(neg_top), top_idx, -1)
        return jnp.sqrt(-neg_top), top_idx

    dists, idxs = jax.lax.map(one_chunk, qchunks)
    return dists.reshape(n_pad, k)[:n], idxs.reshape(n_pad, k)[:n]


@partial(jax.jit, static_argnames=("tile",))
def brute_force_nn(query: jax.Array, ref: jax.Array, ref_valid: jax.Array | None = None, tile: int = 4096) -> NNResult:
    """Exact 1-NN by tiled exhaustive search (validation oracle / exact mode)."""
    n_ref = ref.shape[0]
    pad = -(-n_ref // tile) * tile - n_ref
    ref_p = jnp.concatenate([ref, jnp.full((pad, 3), 1e30, ref.dtype)], axis=0)
    if ref_valid is None:
        valid_p = jnp.concatenate([jnp.ones((n_ref,), bool), jnp.zeros((pad,), bool)])
    else:
        valid_p = jnp.concatenate([ref_valid, jnp.zeros((pad,), bool)])
    tiles = ref_p.reshape(-1, tile, 3)
    vtiles = valid_p.reshape(-1, tile)
    base = jnp.arange(tile, dtype=jnp.int32)

    def step(carry, xs):
        best_d2, best_idx = carry
        rt, vt, t_i = xs
        diff = query[:, None, :] - rt[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(vt[None, :], d2, _BIG)
        ti = jnp.argmin(d2, axis=1)
        td = jnp.take_along_axis(d2, ti[:, None], axis=1)[:, 0]
        better = td < best_d2
        gidx = t_i * tile + base[ti]
        return (jnp.where(better, td, best_d2), jnp.where(better, gidx, best_idx)), None

    init = (jnp.full((query.shape[0],), _BIG), jnp.full((query.shape[0],), -1, jnp.int32))
    (d2, idx), _ = jax.lax.scan(
        step, init, (tiles, vtiles, jnp.arange(tiles.shape[0], dtype=jnp.int32))
    )
    return NNResult(dist=jnp.sqrt(d2), idx=idx)


@partial(jax.jit, static_argnames=("k", "chunk"))
def brute_force_knn(query: jax.Array, ref: jax.Array, k: int, chunk: int = 2048) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN by chunked exhaustive search (validation oracle)."""
    n = query.shape[0]
    n_pad = -(-n // chunk) * chunk
    qpad = jnp.concatenate([query, jnp.zeros((n_pad - n, 3), query.dtype)], axis=0)

    def one_chunk(q):
        diff = q[:, None, :] - ref[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        neg_top, arg = jax.lax.top_k(-d2, k)
        return jnp.sqrt(-neg_top), arg.astype(jnp.int32)

    d, i = jax.lax.map(one_chunk, qpad.reshape(-1, chunk, 3))
    return d.reshape(n_pad, k)[:n], i.reshape(n_pad, k)[:n]
