"""Fused-kernel align driver for the raw-point solvers (ICP / PlaneICP).

Mirrors models/_fused.fused_voxel_align but runs the tile-local CSR point
kernel (ops/pallas/point_align.py) as the per-iteration stats engine.
Unresolved queries — best match beyond the ``cell_fine`` exactness radius,
or drifted out of their tile's layout-time block list — are re-solved on a
compacted XLA pass with the SAME semantics as the gather path's
models/_point_corr.match_points: packed tier-1 re-query first, coarse
voxel-Gaussian proxy for the rest. Reference solver call chains:
/root/reference/point_cloud_registration/icp.py:24-57, plane_icp.py:30-69.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from point_cloud_registration_tpu.core.gn import GNStats, gauss_newton
from point_cloud_registration_tpu.core.se3 import makeRt, transform_points
from point_cloud_registration_tpu.models._fused import (
    batched_gauss_newton,
    small_fallback_cap as _small_cap_impl,
)
from point_cloud_registration_tpu.ops.pallas.point_align import (
    PointFusedSpec,
    build_fused_rows,
    build_tile_tables,
    build_tile_tables_dense,
    dense_rows_bytes,
    morton_layout,
    padded_point_capacity,
    point_stats_call,
)


def target_fused_rows(spec: PointFusedSpec | None, pg):
    """Once-per-target dense fused-row table for the align drivers, or None
    when the fused spec is unavailable or the dense table would be too big
    (falls back to the per-align gather/transpose build)."""
    if spec is None or pg is None:
        return None
    if dense_rows_bytes(spec) > (1 << 31):  # 2 GB guard
        return None
    return build_fused_rows(spec, pg)


def _tables(spec, pg, frows, q_s, w_s):
    if frows is not None:
        return build_tile_tables_dense(spec, frows[0], frows[1], q_s, w_s)
    return build_tile_tables(spec, pg, q_s, w_s)
from point_cloud_registration_tpu.ops.pointgrid import nearest_point_packed
from point_cloud_registration_tpu.ops.reduce import plane_stats, point_stats
from point_cloud_registration_tpu.ops.voxelize import query_nearest_voxel


def _fallback_caps(spec: PointFusedSpec, n: int) -> tuple[int, float]:
    """(compacted-fallback capacity, proxy voxel size) — shared by the
    single and batched drivers so their divergence bounds stay identical."""
    fb_cap = int(max(min(n // 8, 16384), min(n, 256)))
    proxy_vs = float(2 * spec.cell)  # a packed block IS a proxy voxel
    return fb_cap, proxy_vs


_small_cap = _small_cap_impl  # shared tier sizing (models/_fused.py)


def _fallback_stats(target, normals, spec: PointFusedSpec, proxy_vs, qs, ps,
                    ws, R, *, fixed_tiers: bool = False) -> GNStats:
    """match_points semantics on a compacted subset: packed tier-1 re-query
    first, coarse voxel-Gaussian proxy beyond the exactness radius. The ONE
    definition both drivers share — a gating-semantics fix lands in the
    single and batched paths together."""
    pg = target.packed
    proxy = target.proxy
    t1 = nearest_point_packed(pg, qs)
    pnn = query_nearest_voxel(proxy, qs, voxel_size=proxy_vs,
                              max_dist=spec.max_dist, fixed_tiers=fixed_tiers)
    use_raw = t1.resolved
    dist = jnp.where(use_raw, t1.dist, pnn.dist)
    safe_raw = jnp.clip(t1.idx, 0, target.points.shape[0] - 1)
    safe_p = jnp.clip(pnn.idx, 0, proxy.means.shape[0] - 1)
    tgt = jnp.where(
        use_raw[:, None], target.points[safe_raw], proxy.means[safe_p]
    )
    found = jnp.where(use_raw, t1.idx >= 0, pnn.idx >= 0)
    ws = ws * (dist < spec.max_dist) * found
    if spec.kind == "plane_pt":
        nrm = jnp.where(
            use_raw[:, None], normals[safe_raw], proxy.normals[safe_p]
        )
        return plane_stats(ps, qs, tgt, nrm, ws, R,
                           huber_delta=spec.huber_delta)
    return point_stats(ps, qs, tgt, ws, R, huber_delta=spec.huber_delta)


@partial(jax.jit, static_argnames=("cfg", "spec", "interpret"))
def fused_point_align(target, normals, source, src_weight, init_T, cfg,
                      spec: PointFusedSpec, interpret: bool = False,
                      frows=None):
    """``align`` with the fused point kernel: returns ``(T, GNDiagnostics)``.

    ``target`` is a models/_point_corr.PointCorrTarget with the packed
    backend populated; ``normals`` is the (N, 3) per-point normal field for
    kind "plane_pt" (None for "point"); ``frows`` the once-per-target dense
    fused-row table from :func:`target_fused_rows` (None -> per-align
    build).
    """
    pg = target.packed
    init_T = jnp.asarray(init_T, jnp.float32)
    source = jnp.asarray(source, jnp.float32)
    n = source.shape[0]
    q0 = transform_points(init_T, source)
    pos = morton_layout(spec, q0)
    n_cap = padded_point_capacity(spec, n)
    src_s = jnp.zeros((n_cap, 3), jnp.float32).at[pos].set(source)
    w_s = jnp.zeros((n_cap,), jnp.float32).at[pos].set(src_weight)
    q0_s = transform_points(init_T, src_s)
    keys, _, tab = _tables(spec, pg, frows, q0_s, w_s)
    fb_cap, proxy_vs = _fallback_caps(spec, n)

    def _resolve(qs, ps, ws, s):
        R, _ = makeRt(s["T"])
        sub = _fallback_stats(target, normals, spec, proxy_vs, qs, ps, ws, R)
        base = s["stats"]
        return GNStats(
            H=base.H + sub.H,
            g=base.g + sub.g,
            e2=base.e2 + sub.e2,
            n_inliers=base.n_inliers + sub.n_inliers,
        )

    sm_cap = _small_cap(fb_cap, n)

    def stats_fn(T):
        R, _ = makeRt(T)
        q = transform_points(T, src_s)
        C, unres = point_stats_call(
            spec, keys, tab, q, src_s, w_s, R.reshape(9), interpret=interpret
        )
        base = GNStats(H=C[:6, :6], g=C[:6, 6], e2=C[6, 6], n_inliers=C[7, 7])
        n_un = jnp.sum(unres)
        carry = {"T": T, "stats": base}

        def compact_fallback(cap):
            def run(s):
                idxs = jnp.nonzero(unres, size=cap, fill_value=0)[0]
                live = jnp.arange(cap) < n_un
                return _resolve(q[idxs], src_s[idxs], w_s[idxs] * live, s)

            return run

        def full_fallback(s):
            return _resolve(q, src_s, w_s * unres, s)

        tier = (
            (n_un > 0).astype(jnp.int32)
            + (n_un > sm_cap).astype(jnp.int32)
            + (n_un > fb_cap).astype(jnp.int32)
        )
        return jax.lax.switch(
            tier,
            [lambda s: s["stats"], compact_fallback(sm_cap),
             compact_fallback(fb_cap), full_fallback],
            carry,
        )

    return gauss_newton(stats_fn, init_T, cfg.max_iter, cfg.tol)


@partial(jax.jit, static_argnames=("cfg", "spec", "interpret"))
def fused_point_align_batched(target, normals, sources, src_weights, init_Ts,
                              cfg, spec: PointFusedSpec,
                              interpret: bool = False, frows=None):
    """Batched multi-scan raw-point ``align`` on ONE kernel stream.

    ``sources`` (B, n, 3) against one shared packed target — the point-kind
    twin of models/_fused.fused_voxel_align_batched: every problem's
    Morton-tiled queries (and their per-tile key lists / local tables)
    concatenate into one kernel launch per Gauss-Newton iteration, per-tile
    rotations ride the scalar prefetch, per-problem stats segment-sum back,
    and one batched GN while_loop drives all problems.

    Returns ``(Ts (B, 4, 4), GNDiagnostics with leading dim B)``.
    """
    pg = target.packed
    B, n, _ = sources.shape
    sources = jnp.asarray(sources, jnp.float32)
    init_Ts = jnp.asarray(init_Ts, jnp.float32)
    tq = spec.tq
    n_cap = padded_point_capacity(spec, n)
    tiles_pp = n_cap // tq
    fb_cap, proxy_vs = _fallback_caps(spec, n)
    sm_cap = _small_cap(fb_cap, n)

    q0 = jax.vmap(transform_points)(init_Ts, sources)
    pos = jax.vmap(lambda q: morton_layout(spec, q))(q0)  # (B, n)

    def scat(p1, w1, pos1):
        pp = jnp.zeros((n_cap, 3), jnp.float32).at[pos1].set(p1)
        wp = jnp.zeros((n_cap,), jnp.float32).at[pos1].set(w1)
        return pp, wp

    src_s, w_s = jax.vmap(scat)(sources, src_weights, pos)  # (B, n_cap, .)
    q0_s = jax.vmap(transform_points)(init_Ts, src_s)
    keys_b, _, tab_b = jax.vmap(
        lambda q1, w1: _tables(spec, pg, frows, q1, w1)
    )(q0_s, w_s)
    keys = keys_b.reshape(B * tiles_pp, spec.cb)
    tab = tab_b.reshape(B * tiles_pp, spec.cb, spec.row_width)

    def stats_all(Ts):
        Rs = jax.vmap(lambda T: makeRt(T)[0])(Ts)  # (B, 3, 3)
        rflat_t = jnp.repeat(Rs.reshape(B, 9), tiles_pp, axis=0)
        q = jax.vmap(transform_points)(Ts, src_s)  # (B, n_cap, 3)
        stats, unres = point_stats_call(
            spec, keys, tab, q.reshape(-1, 3), src_s.reshape(-1, 3),
            w_s.reshape(-1), rflat_t, interpret=interpret, per_tile=True,
        )
        C = jnp.sum(stats.reshape(B, tiles_pp, 8, 128), axis=1)[:, :, :8]
        unres_b = unres.reshape(B, n_cap)

        def _sub_stats(qs, ps, ws, R):
            # fixed_tiers: vmapped — a data-dependent switch would run
            # every branch per problem
            return _fallback_stats(target, normals, spec, proxy_vs, qs, ps,
                                   ws, R, fixed_tiers=True)

        def resolve_compact(cap):
            def run(qb, unb, wb, pb, R):
                n_un = jnp.sum(unb)
                idxs = jnp.nonzero(unb, size=cap, fill_value=0)[0]
                live = jnp.arange(cap) < n_un
                return _sub_stats(qb[idxs], pb[idxs], wb[idxs] * live, R)

            return run

        def resolve_full(qb, unb, wb, pb, R):
            return _sub_stats(qb, pb, wb * unb, R)

        def add(Cb, sub):
            return GNStats(
                H=Cb[:, :6, :6] + sub.H,
                g=Cb[:, :6, 6] + sub.g,
                e2=Cb[:, 6, 6] + sub.e2,
                n_inliers=Cb[:, 7, 7] + sub.n_inliers,
            )

        # tier 0 (zero stragglers anywhere) is a true no-op — same fix as
        # the batched voxel driver: without it every iteration paid a
        # B x sm_cap packed+proxy re-query even with nothing unresolved
        max_un = jnp.max(jnp.sum(unres_b, axis=1))
        tier = (
            (max_un > 0).astype(jnp.int32)
            + (max_un > sm_cap).astype(jnp.int32)
            + (max_un > fb_cap).astype(jnp.int32)
        )
        return jax.lax.switch(
            tier,
            [
                lambda: GNStats(
                    H=C[:, :6, :6], g=C[:, :6, 6], e2=C[:, 6, 6],
                    n_inliers=C[:, 7, 7],
                ),
                lambda: add(C, jax.vmap(resolve_compact(sm_cap))(
                    q, unres_b, w_s, src_s, Rs)),
                lambda: add(C, jax.vmap(resolve_compact(fb_cap))(
                    q, unres_b, w_s, src_s, Rs)),
                lambda: add(C, jax.vmap(resolve_full)(
                    q, unres_b.astype(jnp.float32), w_s, src_s, Rs)),
            ],
        )

    return batched_gauss_newton(stats_all, init_Ts, cfg.max_iter, cfg.tol)
