"""k-NN PCA normal estimation on TPU.

Re-designs the reference pipeline (/root/reference/point_cloud_registration/
estimate_normals.py:11-87): kd-tree k-NN + per-neighbor accumulation loop +
LAPACK ``eigh`` becomes grid k-NN (``ops.knn.knn_points``) + a gathered,
query-centered covariance + the closed-form 3x3 eigensolver.

Numerical note (deliberate improvement, same algorithm): the reference
accumulates raw second moments ``sum p p^T`` in float32
(estimate_normals.py:50-63) and forms ``cov = E[pp^T] - mu mu^T``, which
catastrophically cancels for clouds far from the origin. We compute the same
covariance from *query-centered* coordinates (p - q), which is exact algebra
and float32-stable at any range. The covariance divisor is k (not k-1),
matching estimate_normals.py:70-72.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from point_cloud_registration_tpu.ops import knn as knn_ops
from point_cloud_registration_tpu.ops.eigh3 import smallest_eigvec_sym3
from point_cloud_registration_tpu.ops.hashgrid import build_grid, search_offsets


def sample_knn_radius(points: jax.Array, k: int, n_sample: int = 256, seed: int = 0) -> float:
    """Median k-th-NN distance of a random sample (host float).

    Used to auto-pick the k-NN grid cell size: a 3^3 window of cells of this
    size almost always contains the true k nearest neighbors.
    """
    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    rng = np.random.RandomState(seed)
    m_sub = 1 << 17
    big = n > 2 * m_sub
    # For big clouds, randint (with replacement): choice(replace=False)
    # permutes all N on the host (~200 ms at 1.2M) just to draw samples.
    if big:
        sel = jnp.asarray(rng.randint(0, n, size=min(n_sample, n)))
    else:
        sel = jnp.asarray(rng.choice(n, size=min(n_sample, n), replace=False))
    queries = points[sel]
    # Big clouds also estimate against a reference SUBSAMPLE: expected
    # neighbor counts within r scale linearly with sample size, so the
    # ceil(k*M/N)-th NN radius in an M-subsample matches (slightly
    # overestimates — the safe direction, it only widens the window) the
    # k-th radius in the full cloud, at a fraction of the distance work.
    if big:
        ref_sel = jnp.asarray(rng.randint(0, n, size=m_sub))
        refs = points[ref_sel]
        k_eff = max(2, int(np.ceil(k * m_sub / n)))
    else:
        refs, k_eff = points, k
    d, _ = _sampled_knn(queries, refs, k_eff)
    return float(jax.device_get(jnp.median(d[:, -1])))


@partial(jax.jit, static_argnames=("k", "tile"))
def _sampled_knn(queries, points, k, tile: int = 65536):
    """Exact k-NN for a few queries against a big cloud, ref-tiled."""
    n_ref = points.shape[0]
    pad = -(-n_ref // tile) * tile - n_ref
    ref_p = jnp.concatenate([points, jnp.full((pad, 3), 1e30, points.dtype)], axis=0)
    tiles = ref_p.reshape(-1, tile, 3)
    nq = queries.shape[0]

    def step(carry, rt):
        best_d2 = carry  # (nq, k)
        diff = queries[:, None, :] - rt[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        cand = jnp.concatenate([best_d2, d2], axis=1)
        neg_top, _ = jax.lax.top_k(-cand, k)
        return -neg_top, None

    init = jnp.full((nq, k), jnp.inf, jnp.float32)
    best_d2, _ = jax.lax.scan(step, init, tiles)
    return jnp.sqrt(best_d2), None  # ascending: top_k(-d2) sorts d2 ascending


def normals_from_neighbors(points: jax.Array, neighbor_idx: jax.Array, query: jax.Array) -> jax.Array:
    """PCA normals given (N, k) neighbor indices (k-divisor covariance).

    Invalid slots (idx < 0, from padded candidate sets) are excluded by
    weighting; the divisor stays k for parity with estimate_normals.py:70-72
    when all k neighbors are present.
    """
    k = neighbor_idx.shape[1]
    safe = jnp.clip(neighbor_idx, 0, points.shape[0] - 1)
    neigh = points[safe]  # (N, k, 3)
    w = (neighbor_idx >= 0).astype(points.dtype)[..., None]  # (N, k, 1)
    centered = (neigh - query[:, None, :]) * w
    denom = jnp.maximum(jnp.sum(w, axis=1), 1.0)  # (N, 1)
    mean = jnp.sum(centered, axis=1) / denom  # (N, 3)
    # E[cc^T] - mean mean^T with k divisor (reference semantics)
    m2 = jnp.einsum("nkd,nke->nde", centered, centered, precision=jax.lax.Precision.HIGHEST) / denom[..., None]
    cov = m2 - jnp.einsum("nd,ne->nde", mean, mean)
    packed = jnp.stack(
        [
            cov[:, 0, 0],
            cov[:, 1, 1],
            cov[:, 2, 2],
            cov[:, 0, 1],
            cov[:, 0, 2],
            cov[:, 1, 2],
        ],
        axis=-1,
    )
    return smallest_eigvec_sym3(packed)


def estimate_normals(
    points,
    k: int = 15,
    *,
    cell_size: float | None = None,
    cell_cap: int | None = None,
    backend: str = "auto",
    exact_tail: bool = True,
    return_info: bool = False,
) -> jax.Array:
    """Estimate unit normals for every point of a cloud (N, 3) -> (N, 3).

    Functional equivalent of the reference ``estimate_normals``
    (estimate_normals.py:11-24): the point's own k-neighborhood (including
    itself) defines the tangent plane.

    ``backend``: "auto" runs the fused Pallas k-NN moments kernel
    (ops/pallas/knn_normals.py) on TPU — one pass over a radius-2 window,
    the same provable-exactness radius (``2 * cell``) as the XLA path's
    exact-tail tier; "xla" forces the gather-based packed-block k-NN
    (ops/pointgrid.knn_packed); "pallas" forces the kernel (interpreted
    off-TPU — tests). With ``exact_tail`` the kernel path re-searches the
    non-exact tail at twice the radius (provable exactness to ``4 * cell``).
    Tail neighborhoods wider than the provable radius are approximate on
    both paths (quantified in tests/benchmarks, harmless for PCA normals).
    ``return_info`` -> ``(normals, {"exact": per-point bool | None})``.
    """
    from point_cloud_registration_tpu.ops.pointgrid import build_packed_grid

    points = jnp.asarray(points, jnp.float32)
    if cell_size is None:
        cell_size = max(sample_knn_radius(points, k), 1e-3)
    use_kernel = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_kernel:
        out = _estimate_normals_fused(
            points, k, cell_size, interpret=jax.default_backend() != "tpu",
            exact_tail=exact_tail, return_info=return_info, cell_cap=cell_cap,
        )
        if out is not None:
            return out
    if cell_cap is None:
        cell_cap = max(32, 3 * k)
    pg = build_packed_grid(points, cell_size, cap=cell_cap)
    # ONE jitted program for the k-NN + PCA chain: executed eagerly these
    # are dozens of sequential dispatches (lax.map chunks, the tail cond),
    # which remote-attached TPUs serialize at tunnel latency — measured 12x
    # slower than the identical jitted program.
    nrm = _knn_normals_jit(pg, points, k)
    if return_info:
        return nrm, {"exact": None}  # the XLA path does not track exactness
    return nrm


# kernel-tier shapes (hardware-swept at the 1.2M bench scale; module-level
# so sweeps can override without editing call sites): base = radius-2 pass
# over every point, wide = radius-4 exactness re-search of the compacted
# non-exact tail
_BASE_SPEC_PARAMS = dict(radius=2, tq=256, cb=256)
_WIDE_SPEC_PARAMS = dict(radius=4, tq=128, cb=384)


def _estimate_normals_fused(points, k, cell_size, interpret,
                            exact_tail=True, return_info=False,
                            cell_cap=None):
    """K4: fused k-NN moments kernel + closed-form eigh.

    Two kernel tiers: a radius-2 base pass over every point, then (with
    ``exact_tail``) a radius-4 pass over the compacted non-exact tail —
    pushing the provable-exactness radius from ``2 * cell`` to ``4 * cell``
    and the exact fraction from ~70% to the high 90s on LiDAR-like scenes
    (the XLA path stops at ``2 * cell``). Queries whose window held fewer
    than k candidates fall back to a compacted wide XLA re-search.
    """
    from point_cloud_registration_tpu.ops.pallas.knn_normals import (
        knn_moments_spec,
    )
    from point_cloud_registration_tpu.ops.pallas.point_align import (
        dense_rows_bytes,
    )
    from point_cloud_registration_tpu.ops.pointgrid import build_packed_grid

    # cap 32 keeps the fused row at one 128-lane group (4 sub-blocks);
    # auto_cap escalates it (64/96) when >1% of points would be truncated
    # (volumetric clouds) — measured inside the build's existing sync —
    # and truncated blocks are flagged so 'exact' is never overclaimed.
    # The dense fused-row build (build_fused_rows) keeps the escalated
    # rows compile-safe (round 3's per-tile 5-D transpose did not).
    # cell_cap overrides (the fused row pads to the next 128-lane multiple).
    pg = build_packed_grid(points, cell_size, cap=cell_cap or 32,
                           auto_cap=cell_cap is None)
    # tq 256 halves the per-tile table gather vs 128 at identical kernel
    # cost; its ~3% tile key-list overflow lands ~4k queries on the
    # compacted fallback (cap 8k) — measured at bench scale
    spec = knn_moments_spec(pg, **_BASE_SPEC_PARAMS)
    if spec is None:
        return None
    if dense_rows_bytes(spec) > (1 << 31):  # dense fused table guard: 2 GB
        return None
    spec_wide = (
        knn_moments_spec(pg, **_WIDE_SPEC_PARAMS) if exact_tail else None
    )
    normals, exact = _fused_normals_jit(pg, points, k, spec, spec_wide, interpret)
    if return_info:
        return normals, {"exact": exact}
    return normals


def _knn_tier(fused_tab, fused_over, points_sub, w_live, k, spec, interpret):
    """One kernel tier over a (possibly compacted) query subset: returns
    (cov6, unresolved, exact) in the SUBSET's order."""
    from point_cloud_registration_tpu.ops.pallas.knn_normals import (
        knn_moments_call,
    )
    from point_cloud_registration_tpu.ops.pallas.point_align import (
        build_tile_tables_dense,
        morton_layout,
        padded_point_capacity,
    )

    m = points_sub.shape[0]
    pos = morton_layout(spec, points_sub)
    m_cap = padded_point_capacity(spec, m)
    q_s = jnp.zeros((m_cap, 3), jnp.float32).at[pos].set(points_sub)
    w_s = jnp.zeros((m_cap,), jnp.float32).at[pos].set(w_live)
    keys, flags, tab = build_tile_tables_dense(spec, fused_tab, fused_over,
                                               q_s, w_s)
    cov6, _, rk2, unres, exact = knn_moments_call(
        spec, k, keys, flags, tab, q_s, w_s, interpret=interpret
    )
    # un-scatter via the inverse permutation (scatter-SET vectorizes;
    # a gather by pos would be row-bound)
    inv = jnp.full((m_cap,), m, jnp.int32).at[pos].set(
        jnp.arange(m, dtype=jnp.int32)
    )
    cov_o = jnp.zeros((m, 6), jnp.float32).at[inv].set(cov6, mode="drop")
    rk2_o = jnp.zeros((m,), jnp.float32).at[inv].set(rk2, mode="drop")
    unres_o = jnp.zeros((m,), bool).at[inv].set(unres, mode="drop")
    exact_o = jnp.zeros((m,), bool).at[inv].set(exact, mode="drop")
    return cov_o, rk2_o, unres_o, exact_o


@partial(jax.jit, static_argnames=("k", "spec", "spec_wide", "interpret"))
def _fused_normals_jit(pg, points, k, spec, spec_wide, interpret):
    from point_cloud_registration_tpu.ops.pallas.point_align import (
        build_fused_rows,
    )
    from point_cloud_registration_tpu.ops.pointgrid import _knn_window_pass

    n = points.shape[0]
    # one dense fused-row table serves both tiers (row layout depends only
    # on cap/width, not the probe radius)
    fused_tab, fused_over = build_fused_rows(spec, pg)
    cov6, rk2_o, unres_o, exact_o = _knn_tier(
        fused_tab, fused_over, points, jnp.ones((n,), jnp.float32), k, spec,
        interpret,
    )

    if spec_wide is not None:
        # exactness tier: re-search the non-exact tail at twice the radius
        # on a compacted subset (overflow beyond the capacity keeps the
        # base-pass approximation — a quality knob, never a correctness one).
        # Certifiability filter: the wide tier certifies only when ITS k-th
        # distance lands below 4 * cell. The base pass's k-th distance upper
        # bounds the true one, but loosely (its window box reaches past the
        # provable ball), so the skip threshold carries margin: a base k-th
        # beyond 6 * cell cannot plausibly come back under 4 * cell, and
        # those isolated-clutter queries skip the 45-probe re-search — at
        # bench scale ~30% of the tail for no measured certified-fraction
        # cost. The filter only gates the CERTIFICATE attempt, never the
        # normal itself (skipped queries keep the base approximation).
        certifiable = rk2_o < np.float32((6.0 * spec.cell) ** 2)
        tail = jnp.logical_not(exact_o) & jnp.logical_not(unres_o) & certifiable
        n_tail = jnp.sum(tail)
        # capacity bounds BOTH the wide tier's HBM (its per-tile table must
        # not co-live with memory pressure from the base pass) and its
        # 45-probe kernel cost — the kernel runs at CAPACITY, so this is
        # the wide tier's price even when the tail is small; overflow keeps
        # the base approximation. At bench scale the tail is ~18% of the
        # cloud and nearly all certifiable (r5 measurement: 212k of 1.2M,
        # 208k below 4 * cell), so n//8 capacity overflowed ~60k queries
        # and cost 5 points of certified fraction — n//4 holds it all.
        cap_t = int(max(min(n // 4, 1 << 18), min(n, 256)))

        def wide(args):
            cov6, exact_o = args
            idxs = jnp.nonzero(tail, size=cap_t, fill_value=0)[0]
            live = jnp.arange(cap_t) < n_tail
            cov_w, _, unres_w, exact_w = _knn_tier(
                fused_tab, fused_over, points[idxs], live.astype(jnp.float32),
                k, spec_wide, interpret,
            )
            # non-update slots (dead fills AND wide-unresolved) scatter out
            # of range with mode=drop: a duplicate-index scatter-set applies
            # an unspecified update, so fill index 0 could clobber point 0 —
            # and cov6/exact_o must update ATOMICALLY together
            upd = live & jnp.logical_not(unres_w)
            scat = jnp.where(upd, idxs, n)
            cov6 = cov6.at[scat].set(cov_w, mode="drop")
            exact_o2 = exact_o.at[scat].set(exact_w, mode="drop")
            return cov6, exact_o2

        cov6, exact_o = jax.lax.cond(
            n_tail > 0, wide, lambda a: a, (cov6, exact_o)
        )

    normals = smallest_eigvec_sym3(cov6)

    # compacted fallback: isolated points whose window held fewer than k
    # candidates (or drifted/overflowed lists) re-search wider on XLA
    n_un = jnp.sum(unres_o)
    cap_q = max(min(n // 16, 8192), min(n, 64))

    def fb(nrm):
        idxs = jnp.nonzero(unres_o, size=cap_q, fill_value=0)[0]
        live = jnp.arange(cap_q) < n_un
        # radius 2x the base tier: unresolved queries are mostly key-list
        # overflows needing only the BASE window re-searched; 3x generated
        # a window-offset unroll so large the remote-compile endpoint
        # rejected the program (HTTP 413) and cost ~2x per chunk
        _, wi = _knn_window_pass(pg, points[idxs], k, radius=2 * spec.radius,
                                 chunk=min(cap_q, 2048))
        sub = normals_from_neighbors(points, wi, points[idxs])
        # dead slots drop out of range (duplicate-index-0 hazard, as above)
        return nrm.at[jnp.where(live, idxs, n)].set(sub, mode="drop")

    normals = jax.lax.cond(n_un > 0, fb, lambda x: x, normals)
    return normals, exact_o


@partial(jax.jit, static_argnames=("k",))
def _knn_normals_jit(pg, points, k):
    from point_cloud_registration_tpu.ops.pointgrid import knn_packed

    _, idx = knn_packed(pg, points, k)
    return normals_from_neighbors(points, idx, points)


def get_norm_lines(points, normals, length: float = 0.1) -> np.ndarray:
    """Interleave points with offset tips for normal visualization
    (estimate_normals.py:91-105): (N, 3) -> (2N, 3)."""
    points = np.asarray(points)
    normals = np.asarray(normals)
    offset_points = points + normals * length
    lines = np.empty((2 * points.shape[0], points.shape[1]), dtype=points.dtype)
    lines[::2] = points
    lines[1::2] = offset_points
    return lines
