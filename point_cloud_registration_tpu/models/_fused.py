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

from point_cloud_registration_tpu.core.gn import GNDiagnostics, GNStats, gauss_newton
from point_cloud_registration_tpu.core.se3 import makeRt, transform_points
from point_cloud_registration_tpu.ops.pallas.fused_align import (
    FusedSpec,
    band_layout,
    fused_stats_call,
    planar_window_query,
    scatter_banded,
)
from point_cloud_registration_tpu.ops.reduce import plane_stats, whitened_stats


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

        def compact_fallback(s):
            idxs = jnp.nonzero(unres, size=fb_cap, fill_value=0)[0]
            live = jnp.arange(fb_cap) < n_un
            return _resolve(q[idxs], src_s[idxs], w_s[idxs] * live, s)

        def full_fallback(s):
            # pathological: more stragglers than the compaction capacity
            # (e.g. a region smaller than the scan footprint) — re-query
            # every unresolved point so no contribution is dropped
            return _resolve(q, src_s, w_s * unres, s)

        tier = (n_un > 0).astype(jnp.int32) + (n_un > fb_cap).astype(jnp.int32)
        return jax.lax.switch(
            tier, [lambda s: s, compact_fallback, full_fallback], base
        )

    return gauss_newton(stats_fn, init_T, cfg.max_iter, cfg.tol)
