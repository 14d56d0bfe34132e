"""Coreset-accelerated voxelized plane ICP.

A working realization of the reference's *experimental, bit-rotted* intent
(/root/reference/point_cloud_registration/fast_voxelized_plane_icp.py:22-99,
see SURVEY §2 C12): run full-cloud Gauss-Newton until the step shrinks below
a switch threshold, then extract an exact Caratheodory coreset of the current
linearization (<= N_target weighted points reproducing H/g/e^2 exactly at the
switch transform) and finish the iterations on the coreset.

TPU structure: two jitted phases with one host round per iteration in phase
one (to observe the data-dependent switch) and a host-side float64 coreset
extraction in between — the coreset is exact only in double precision, which
is host work by design (see models/coreset.py). Phase two is fixed-shape
(N_target points + weights) and fully fused.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from point_cloud_registration_tpu.core.config import VPlaneICPConfig
from point_cloud_registration_tpu.core.gn import GNStats, gauss_newton, solve_6x6
from point_cloud_registration_tpu.core.se3 import (
    makeRt,
    plus,
    skew_time_vector,
    transform_points,
)
from point_cloud_registration_tpu.models.base import AlignResult, Registration, pad_points
from point_cloud_registration_tpu.models.coreset import create_gn_set, fast_caratheodory
from point_cloud_registration_tpu.models.voxelized_plane_icp import build_vplane_target
from point_cloud_registration_tpu.ops.reduce import reduce_H_g_e2
from point_cloud_registration_tpu.ops.voxelize import VoxelMap, query_nearest_voxel


@partial(jax.jit, static_argnames=("cfg",))
def vplane_linearize(vmap_: VoxelMap, source, src_weight, T, cfg: VPlaneICPConfig):
    """Materialized (J (N,6), r (N,), w (N,)) for the plane residual.

    The explicit-Jacobian form of the fused path
    (fast_voxelized_plane_icp.py:40-54) — needed because the coreset lift
    consumes per-point (J, r).
    """
    R, _ = makeRt(T)
    src_trans = transform_points(T, source)
    nn = query_nearest_voxel(
        vmap_,
        src_trans,
        voxel_size=cfg.voxel_size,
        max_dist=cfg.max_dist,
        fixed_tiers=cfg.fixed_tiers,
    )
    w = src_weight * (nn.dist < cfg.max_dist) * (nn.idx >= 0)
    safe = jnp.clip(nn.idx, 0, vmap_.means.shape[0] - 1)
    means = vmap_.means[safe]
    norms = vmap_.normals[safe]
    diff = src_trans - means
    r = jnp.sum(norms * diff, axis=-1)
    Rt_n = jnp.einsum("nj,ji->ni", norms, R, precision=jax.lax.Precision.HIGHEST)
    Jr = skew_time_vector(source, Rt_n)
    J = jnp.concatenate([norms, Jr], axis=-1)
    return J, r, w


@jax.jit
def _gn_step_from_stats(T, H, g):
    dx = solve_6x6(H, g)
    dx_norm = jnp.linalg.norm(dx)
    return plus(T, dx), dx_norm


@jax.jit
def _weighted_stats(J, r, w):
    H, g, e2 = reduce_H_g_e2(J, r, w)
    return GNStats(H=H, g=g, e2=e2, n_inliers=jnp.sum(w))


class FastVPlaneICP(Registration):
    """Reference-compatible shim (fast_voxelized_plane_icp.py:23-30 signature)."""

    def __init__(
        self,
        voxel_size: float = 1.0,
        max_iter: int = 30,
        max_dist: float = 2,
        tol: float = 1e-3,
        N_target: int = 1024,
        debug: bool = False,
        coreset_switch: float = 1e-2,
        coreset_clusters: int = 64,
    ):
        super().__init__(max_iter=max_iter, tol=tol)
        self.voxel_size = voxel_size
        self.max_dist = max_dist
        self.N_target = N_target
        self.debug = debug
        self.coreset_switch = coreset_switch  # switch heuristic (ref :63, 1e-2)
        self.coreset_clusters = coreset_clusters  # ref :34 (k=64)
        self.cfg = VPlaneICPConfig(
            voxel_size=voxel_size, max_iter=max_iter, max_dist=max_dist, tol=tol
        )

    def set_target(self, target) -> None:
        self._target = build_vplane_target(target, self.cfg)

    def align(self, source, init_T=None, verbose: bool = False) -> np.ndarray:
        if not self.is_target_set():
            raise ValueError("Target is not set.")
        if init_T is None:
            init_T = np.eye(4)
        src, w_src = pad_points(source)
        T = jnp.asarray(init_T, jnp.float32)

        e2_hist = np.zeros(self.max_iter, np.float32)
        dxn_hist = np.zeros(self.max_iter, np.float32)
        inl_hist = np.zeros(self.max_iter, np.int32)
        converged = False
        failed = False
        iterations = 0

        coreset = None  # (J_sub, r_sub?, src_sub, w_sub) once extracted
        for it in range(self.max_iter):
            if coreset is None:
                J, r, w = vplane_linearize(self._target, src, w_src, T, self.cfg)
                stats = _weighted_stats(J, r, w)
            else:
                src_sub, w_sub = coreset
                J, r, w_lin = vplane_linearize(
                    self._target, src_sub, (w_sub > 0).astype(jnp.float32), T, self.cfg
                )
                # coreset weights carry the moment-preserving scale; the
                # linearization gate re-applies max_dist masking
                stats = _weighted_stats(J, r, w_sub * (w_lin > 0))
            T_new, dx_norm = _gn_step_from_stats(T, stats.H, stats.g)
            dx_norm = float(jax.device_get(dx_norm))
            iterations = it + 1
            e2_hist[it] = float(jax.device_get(stats.e2))
            dxn_hist[it] = dx_norm
            inl_hist[it] = int(jax.device_get(stats.n_inliers))
            if self.debug:
                print(f"iter {it}, points {inl_hist[it]}, error {e2_hist[it]}")
            if not np.isfinite(dx_norm):
                failed = True
                break
            if dx_norm < self.tol:
                converged = True
                break
            T = T_new
            if coreset is None and dx_norm < self.coreset_switch:
                J_np, r_np, w_np = jax.device_get((J, r, w))
                live = np.where(w_np > 0)[0]
                P = create_gn_set(J_np[live], r_np[live])
                _, w_core, sel = fast_caratheodory(
                    P, w_np[live].astype(np.float64), self.coreset_clusters, self.N_target
                )
                chosen = live[sel]
                src_np = np.asarray(jax.device_get(src))[chosen]
                pad = self.N_target - len(chosen)
                if pad > 0:
                    src_np = np.vstack([src_np, np.zeros((pad, 3), np.float32)])
                    w_core = np.concatenate([w_core, np.zeros(pad)])
                coreset = (
                    jnp.asarray(src_np, jnp.float32),
                    jnp.asarray(w_core, jnp.float32),
                )
        from point_cloud_registration_tpu.core.gn import GNDiagnostics

        self.last_diagnostics = GNDiagnostics(
            iterations=np.int32(iterations),
            converged=np.bool_(converged),
            solver_failed=np.bool_(failed),
            e2_history=e2_hist,
            dx_norm_history=dxn_hist,
            inlier_history=inl_hist,
            final_e2=e2_hist[max(iterations - 1, 0)],
        )
        return np.asarray(jax.device_get(T), dtype=np.float64)
