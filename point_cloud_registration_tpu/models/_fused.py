"""Shared fused-kernel align driver for the voxel-map solvers.

Runs the Gauss-Newton loop with the Pallas fused correspondence+linearize
kernel (ops/pallas/fused_align.py) as the per-iteration stats engine,
re-solving the kernel's region-clamped stragglers on a compacted XLA
fallback. One driver serves VPlaneICP (kind="plane") and NDT (kind="ndt");
reference semantics match the solver call chains at
/root/reference/point_cloud_registration/voxelized_plane_icp.py:23-64 and
ndt.py:24-57.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from point_cloud_registration_tpu.core.gn import (
    GNDiagnostics,
    GNStats,
    gauss_newton,
    solve_6x6,
)
from point_cloud_registration_tpu.core.se3 import makeRt, plus, transform_points
from point_cloud_registration_tpu.ops.pallas.fused_align import (
    FusedSpec,
    band_layout,
    fused_stats_call,
    padded_capacity,
    planar_window_query,
    scatter_banded,
)
from point_cloud_registration_tpu.ops.reduce import plane_stats, whitened_stats


def small_fallback_cap(fb_cap: int, n: int) -> int:
    """Capacity of the cheap first fallback tier, shared by the voxel and
    point fused drivers: in the converged regime the kernel leaves only
    ~1e-4..1e-3 of the scan unresolved (hardware sweep, r4), so the
    per-iteration re-query usually touches a few hundred queries —
    compacting to the full ``fb_cap`` (n/8) would make the fallback the
    per-iteration bottleneck for nothing."""
    return int(min(fb_cap, max(min(n, 256), 1024)))


def scan_scaled_spec(spec: FusedSpec | None, n: int) -> FusedSpec | None:
    """Scale the band-tile size to the scan's point count.

    The spec's default tq=512 is anchored on the B-01 protocol's 100k-point
    scan. A SUBSAMPLED scan covers the same map area with fewer points, so
    a fixed-tq tile spans a proportionally larger footprint and overflows
    the spec's static region clamp — every iteration then floods the
    compacted fallback with region-clamped stragglers (measured r5: the
    batched 8x16k stream paid 2.8x per-row vs the single 100k align).
    Scaling tq with n keeps the tile footprint near the anchor's
    (tq/n ~ 512/100k, rounded down to the kernel's 128 minimum). Hardware
    sweep at 8x16k scans: tq=128 -> 96.8 reg/s, 256 -> 66.8, 512 -> 52.
    (tq=128 needs the FLATTENED 1-D scalar-prefetch operands — the earlier
    2-D layout padded each tile's scalars to 128 lanes and blew the 1 MB
    SMEM at 1096 tiles.) Purely a performance choice — stragglers are
    always correct via the fallback tiers.
    """
    if spec is None or spec.tq <= 128:
        return spec
    if n >= 75_000:
        tq = 512
    elif n >= 37_500:
        tq = 256
    else:
        tq = 128
    tq = min(tq, spec.tq)
    if tq == spec.tq:
        return spec
    import dataclasses as _dc

    return _dc.replace(spec, tq=tq)


def use_fused(backend: str, spec: FusedSpec | None) -> bool:
    """Host-side backend resolution: the fused kernel runs compiled on TPU
    by default and only when the target has the planar tables; "pallas"
    forces it (tests run it through the Pallas interpreter off-TPU)."""
    if spec is None or backend == "xla":
        return False
    if backend == "pallas":
        return True
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnames=("cfg", "spec", "interpret"))
def fused_voxel_align(vm, source, src_weight, init_T, cfg, spec: FusedSpec,
                      interpret: bool = False):
    """``align`` with the fused kernel: returns ``(T, GNDiagnostics)``.

    The scan is laid out into region-aligned y-band tiles once (rigid
    motion preserves tile locality, so the layout stays valid across
    iterations); per iteration the kernel returns the 8x8 normal-equation
    block plus an unresolved mask, and the compacted XLA fallback adds the
    stragglers' contribution.
    """
    init_T = jnp.asarray(init_T, jnp.float32)
    source = jnp.asarray(source, jnp.float32)
    q0 = transform_points(init_T, source)
    pos = band_layout(spec, q0)
    _, src_s, w_s = scatter_banded(spec, pos, q0, source, src_weight)
    n = source.shape[0]
    fb_cap = int(max(min(n // 8, 16384), min(n, 256)))

    def stats_fn(T):
        R, _ = makeRt(T)
        rflat = R.reshape(9)
        q = transform_points(T, src_s)
        C, unres = fused_stats_call(
            spec, vm.dense_blocks, q, src_s, w_s, rflat, interpret=interpret,
        )
        base = GNStats(H=C[:6, :6], g=C[:6, 6], e2=C[6, 6], n_inliers=C[7, 7])
        n_un = jnp.sum(unres)

        def _resolve(qs, ps, ws, s):
            d, tgt, feats = planar_window_query(spec, vm.dense_blocks, qs)
            ws = ws * (d < spec.max_dist)
            if spec.kind == "plane":
                sub = plane_stats(ps, qs, tgt, feats, ws, R,
                                  huber_delta=spec.huber_delta)
            else:  # "ndt": whitened Mahalanobis via sqrt icov features
                sub = whitened_stats(ps, qs, tgt, feats, ws, R,
                                     huber_delta=spec.huber_delta)
            return GNStats(
                H=s.H + sub.H,
                g=s.g + sub.g,
                e2=s.e2 + sub.e2,
                n_inliers=s.n_inliers + sub.n_inliers,
            )

        def compact_fallback(cap):
            def run(s):
                idxs = jnp.nonzero(unres, size=cap, fill_value=0)[0]
                live = jnp.arange(cap) < n_un
                return _resolve(q[idxs], src_s[idxs], w_s[idxs] * live, s)

            return run

        def full_fallback(s):
            # pathological: more stragglers than the compaction capacity
            # (e.g. a region smaller than the scan footprint) — re-query
            # every unresolved point so no contribution is dropped
            return _resolve(q, src_s, w_s * unres, s)

        # converged-regime stragglers are a few hundred: the small tier
        # keeps the per-iteration re-query at sm_cap instead of n//8
        sm_cap = small_fallback_cap(fb_cap, n)
        tier = (
            (n_un > 0).astype(jnp.int32)
            + (n_un > sm_cap).astype(jnp.int32)
            + (n_un > fb_cap).astype(jnp.int32)
        )
        return jax.lax.switch(
            tier,
            [lambda s: s, compact_fallback(sm_cap), compact_fallback(fb_cap),
             full_fallback],
            base,
        )

    return gauss_newton(stats_fn, init_T, cfg.max_iter, cfg.tol)


@partial(jax.jit, static_argnames=("cfg", "spec", "interpret"))
def fused_voxel_align_batched(vm, sources, src_weights, init_Ts, cfg,
                              spec: FusedSpec, interpret: bool = False):
    """Batched multi-scan ``align`` on ONE kernel stream.

    ``sources`` (B, n, 3), ``src_weights`` (B, n), ``init_Ts`` (B, 4, 4)
    against one shared map. Rather than vmapping the per-problem aligner
    (which would vmap ``pallas_call``), every problem's band-laid-out tiles
    are concatenated into one kernel launch per Gauss-Newton iteration —
    each tile carries its problem's rotation via scalar prefetch, and the
    per-tile 8x8 stats blocks segment-sum back to problems. One batched GN
    while_loop mirrors :func:`core.gn.gauss_newton`'s per-problem iteration
    semantics exactly (solve -> check -> update; T frozen on the breaking
    step; per-problem iteration counts).

    Returns ``(Ts (B, 4, 4), GNDiagnostics with leading dim B)``.
    """
    B, n, _ = sources.shape
    sources = jnp.asarray(sources, jnp.float32)
    init_Ts = jnp.asarray(init_Ts, jnp.float32)
    tq = spec.tq
    n_cap = padded_capacity(spec, n)
    n_cap_al = -(-n_cap // tq) * tq
    tiles_pp = n_cap_al // tq
    max_iter, tol = cfg.max_iter, cfg.tol
    fb_cap = int(max(min(n // 8, 16384), min(n, 256)))
    sm_cap = small_fallback_cap(fb_cap, n)

    q0 = jax.vmap(transform_points)(init_Ts, sources)
    pos = jax.vmap(lambda q: band_layout(spec, q))(q0)  # (B, n)

    def scat(p1, w1, pos1):
        pp = jnp.zeros((n_cap_al, 3), jnp.float32).at[pos1].set(p1)
        wp = jnp.zeros((n_cap_al,), jnp.float32).at[pos1].set(w1)
        return pp, wp

    src_s, w_s = jax.vmap(scat)(sources, src_weights, pos)  # (B, n_cap_al, .)

    def stats_all(Ts):
        Rs = jax.vmap(lambda T: makeRt(T)[0])(Ts)  # (B, 3, 3)
        rflat_b = Rs.reshape(B, 9)
        rflat_t = jnp.repeat(rflat_b, tiles_pp, axis=0)  # (B*tiles_pp, 9)
        q = jax.vmap(transform_points)(Ts, src_s)  # (B, n_cap_al, 3)
        stats, unres = fused_stats_call(
            spec, vm.dense_blocks, q.reshape(-1, 3), src_s.reshape(-1, 3),
            w_s.reshape(-1), rflat_t, interpret=interpret, per_tile=True,
        )
        C = jnp.sum(stats.reshape(B, tiles_pp, 8, 128), axis=1)[:, :, :8]
        unres_b = unres.reshape(B, n_cap_al)

        def _sub_stats(ps, qs, ws, tgt, feats, R):
            if spec.kind in ("plane", "plane_pt"):
                return plane_stats(ps, qs, tgt, feats, ws, R,
                                   huber_delta=spec.huber_delta)
            return whitened_stats(ps, qs, tgt, feats, ws, R,
                                  huber_delta=spec.huber_delta)

        def resolve_compact(cap):
            def run(qb, unb, wb, pb, R):
                # compacted fallback: re-query only the stragglers
                n_un = jnp.sum(unb)
                idxs = jnp.nonzero(unb, size=cap, fill_value=0)[0]
                live = jnp.arange(cap) < n_un
                qs = qb[idxs]
                d, tgt, feats = planar_window_query(spec, vm.dense_blocks, qs)
                ws = wb[idxs] * live * (d < spec.max_dist)
                return _sub_stats(pb[idxs], qs, ws, tgt, feats, R)

            return run

        def resolve_full(qb, unb, wb, pb, R):
            # escape hatch for straggler counts beyond the compaction
            # capacity (sparse scans / large initial offsets): re-query every
            # point, weighted by the unresolved mask, so no contribution is
            # silently dropped (the single-problem driver's tier-3 twin)
            d, tgt, feats = planar_window_query(spec, vm.dense_blocks, qb)
            ws = wb * unb * (d < spec.max_dist)
            return _sub_stats(pb, qb, ws, tgt, feats, R)

        def add(Cb, sub):
            return GNStats(
                H=Cb[:, :6, :6] + sub.H,
                g=Cb[:, :6, 6] + sub.g,
                e2=Cb[:, 6, 6] + sub.e2,
                n_inliers=Cb[:, 7, 7] + sub.n_inliers,
            )

        # batch-level tier choice: the predicate is a scalar, so lax.switch
        # runs ONE branch — in the converged regime the worst problem's
        # straggler count is tiny, so the cheap small-cap tier carries most
        # iterations; the full re-query costs nothing unless some problem
        # actually overflows its compaction capacity. Tier 0 (zero
        # stragglers anywhere) is a true no-op: without it every iteration
        # paid a B x sm_cap window re-query for nothing (the r3->r4 batched
        # throughput regression, ~2-4 ms/iteration).
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

    return batched_gauss_newton(stats_all, init_Ts, max_iter, tol)


def batched_gauss_newton(stats_all, init_Ts, max_iter: int, tol: float):
    """One batched Gauss-Newton while_loop over B problems.

    Mirrors :func:`core.gn.gauss_newton`'s per-problem iteration semantics
    exactly (solve -> check -> update; T frozen on the breaking step;
    per-problem iteration counts). ``stats_all(Ts (B,4,4)) -> GNStats`` with
    leading dim B. Shared by the batched voxel and batched point fused
    streams.
    """
    B = init_Ts.shape[0]
    arange_b = jnp.arange(B)

    def cond(c):
        return jnp.any(jnp.logical_not(c["done"]))

    def body(c):
        active = jnp.logical_not(c["done"])
        stats = stats_all(c["T"])
        dx = jax.vmap(solve_6x6)(stats.H, stats.g)  # (B, 6)
        dx_norm = jnp.linalg.norm(dx, axis=1)
        bad = jnp.logical_not(jnp.isfinite(dx_norm))
        conv_now = dx_norm < tol
        done_now = conv_now | bad
        T_new = jax.vmap(plus)(c["T"], dx)
        keep = c["done"] | done_now
        T_next = jnp.where(keep[:, None, None], c["T"], T_new)
        it_cl = jnp.clip(c["it"], 0, max_iter - 1)

        def hist(h, v):
            old = h[arange_b, it_cl]
            return h.at[arange_b, it_cl].set(jnp.where(active, v, old))

        it_next = c["it"] + active.astype(jnp.int32)
        done_next = c["done"] | (active & done_now) | (it_next >= max_iter)
        return {
            "T": T_next,
            "it": it_next,
            "done": done_next,
            "failed": c["failed"] | (active & bad),
            "converged": c["converged"] | (active & conv_now),
            "e2_hist": hist(c["e2_hist"], stats.e2),
            "dxn_hist": hist(c["dxn_hist"], dx_norm),
            "inl_hist": hist(c["inl_hist"], stats.n_inliers.astype(jnp.int32)),
            "final_e2": jnp.where(active, stats.e2, c["final_e2"]),
        }

    init = {
        "T": init_Ts,
        "it": jnp.zeros((B,), jnp.int32),
        "done": jnp.zeros((B,), bool),
        "failed": jnp.zeros((B,), bool),
        "converged": jnp.zeros((B,), bool),
        "e2_hist": jnp.zeros((B, max_iter), jnp.float32),
        "dxn_hist": jnp.zeros((B, max_iter), jnp.float32),
        "inl_hist": jnp.zeros((B, max_iter), jnp.int32),
        "final_e2": jnp.zeros((B,), jnp.float32),
    }
    out = jax.lax.while_loop(cond, body, init)
    diag = GNDiagnostics(
        iterations=out["it"],
        converged=out["converged"],
        solver_failed=out["failed"],
        e2_history=out["e2_hist"],
        dx_norm_history=out["dxn_hist"],
        inlier_history=out["inl_hist"],
        final_e2=out["final_e2"],
    )
    return out["T"], diag
