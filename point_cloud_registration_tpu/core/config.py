"""Frozen, hashable solver configurations.

The reference configures solvers through constructor hyperparameters and a
module-level edit-the-source backend flag (SURVEY §5: registration.py:11,
icp.py:13, kdtree.py:6-16). Here every knob lives in a frozen dataclass:
hashable, therefore usable as a jit static argument, and serializable for
experiment tracking.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class GNConfig:
    """Gauss-Newton loop parameters (registration.py:11-19 defaults)."""

    max_iter: int = 30
    tol: float = 1e-3


@dataclasses.dataclass(frozen=True)
class CorrespondenceConfig:
    """Neighbor-search parameters for the grid engine.

    ``cell_size``: bucket size for raw-point grids; ``None`` derives it
    (= max_dist / 2 for 1-NN — finer cells keep dense-surface cells under
    the candidate cap; density-based for k-NN).
    ``cell_cap``: max candidates examined per cell — the fixed-shape
    approximation dial (see ops/knn.py docstring).
    """

    cell_size: float | None = None
    cell_cap: int = 64


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    """Point-to-point ICP (icp.py:12-15 defaults)."""

    max_iter: int = 30
    max_dist: float = 2.0
    tol: float = 1e-3
    corr: CorrespondenceConfig = CorrespondenceConfig()


@dataclasses.dataclass(frozen=True)
class PlaneICPConfig:
    """Point-to-plane ICP (plane_icp.py:13-17 defaults)."""

    max_iter: int = 30
    max_dist: float = 2.0
    tol: float = 1e-3
    k: int = 15  # neighbors for normal estimation
    corr: CorrespondenceConfig = CorrespondenceConfig()


@dataclasses.dataclass(frozen=True)
class VPlaneICPConfig:
    """Voxelized point-to-plane ICP (voxelized_plane_icp.py:12-16 defaults)."""

    voxel_size: float = 1.0
    max_iter: int = 30
    max_dist: float = 2.0
    tol: float = 1e-3
    min_points: int = 10  # voxel validity threshold (voxel.py:56)


@dataclasses.dataclass(frozen=True)
class NDTConfig:
    """NDT (ndt.py:12-16 defaults)."""

    voxel_size: float = 1.0
    max_iter: int = 30
    max_dist: float = 2.0
    tol: float = 1e-3
    min_points: int = 10
