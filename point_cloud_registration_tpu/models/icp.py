"""Point-to-point ICP, TPU-native.

Objective ``sum_i || T p_i - q_i ||^2`` with kd-tree-gated nearest-neighbor
correspondences — the reference solver at
/root/reference/point_cloud_registration/icp.py:12-57. TPU re-design:

* the target index is a CSR-bucketed voxel grid (cell = max_dist) instead of
  a kd-tree (icp.py:20-21); the 27-cell window provably covers the
  ``dist < max_dist`` gate (ops/hashgrid.search_offsets);
* mask compaction (icp.py:34-36) becomes 0/1 weights in the closed-form
  block reduction (ops/reduce.point_stats);
* the whole align loop is one jitted ``lax.while_loop`` program
  (core/gn.gauss_newton).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from point_cloud_registration_tpu.core.config import ICPConfig
from point_cloud_registration_tpu.core.gn import GNStats, gauss_newton
from point_cloud_registration_tpu.core.se3 import makeRt, transform_points
from point_cloud_registration_tpu.models.base import AlignResult, Registration, pad_points
from point_cloud_registration_tpu.ops.hashgrid import Buckets, Grid, build_grid, search_offsets
from point_cloud_registration_tpu.ops.knn import nearest_point
from point_cloud_registration_tpu.ops.reduce import point_stats


class ICPTarget(NamedTuple):
    """Immutable point-map pytree: raw points + their bucket grid."""

    points: jax.Array  # (N, 3) f32
    grid: Grid
    buckets: Buckets


def build_icp_target(points, cfg: ICPConfig) -> ICPTarget:
    """Index the target cloud (replaces ``ICP.set_target``, icp.py:17-22)."""
    points = jnp.asarray(points, dtype=jnp.float32)
    cell = cfg.corr.cell_size if cfg.corr.cell_size is not None else cfg.max_dist / 2
    grid, _, buckets = build_grid(points, cell, with_buckets=True)
    return ICPTarget(points=points, grid=grid, buckets=buckets)


def icp_stats(target: ICPTarget, source, src_weight, T, cfg: ICPConfig) -> GNStats:
    """Correspondence + linearization + reduction for one GN iteration
    (fuses icp.py:32-56)."""
    R, _ = makeRt(T)
    src_trans = transform_points(T, source)
    cell = cfg.corr.cell_size if cfg.corr.cell_size is not None else cfg.max_dist / 2
    offsets = search_offsets(cfg.max_dist, cell)
    nn = nearest_point(
        target.grid, target.buckets, target.points, src_trans, offsets, cap=cfg.corr.cell_cap
    )
    w = src_weight * (nn.dist < cfg.max_dist) * (nn.idx >= 0)
    qs = target.points[jnp.clip(nn.idx, 0, target.points.shape[0] - 1)]
    return point_stats(source, src_trans, qs, w, R)


@partial(jax.jit, static_argnames=("cfg",))
def icp_align(target: ICPTarget, source, src_weight, init_T, cfg: ICPConfig) -> AlignResult:
    """Full jitted align (registration.py:71-112 semantics)."""

    def stats_fn(T):
        return icp_stats(target, source, src_weight, T, cfg)

    T, diag = gauss_newton(stats_fn, init_T, cfg.max_iter, cfg.tol)
    return AlignResult(T=T, diagnostics=diag)


class ICP(Registration):
    """Reference-compatible shim (constructor signature of icp.py:13-15)."""

    def __init__(self, max_iter: int = 30, max_dist: float = 2, tol: float = 1e-3):
        super().__init__(max_iter=max_iter, tol=tol)
        self.max_dist = max_dist
        self.cfg = ICPConfig(max_iter=max_iter, max_dist=max_dist, tol=tol)

    def set_target(self, target) -> None:
        self._target = build_icp_target(target, self.cfg)

    def _align_fn(self, target, source, src_weight, init_T) -> AlignResult:
        return icp_align(target, source, src_weight, init_T, self.cfg)

    def _stats_fn(self, target, source, src_weight, T) -> GNStats:
        return _icp_stats_jit(target, source, src_weight, T, self.cfg)


@partial(jax.jit, static_argnames=("cfg",))
def _icp_stats_jit(target, source, src_weight, T, cfg) -> GNStats:
    return icp_stats(target, source, src_weight, T, cfg)
