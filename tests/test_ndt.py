"""NDT parity + convergence (pattern of reference tests/test_ndt.py)."""

import numpy as np
import pytest

from point_cloud_registration_tpu import NDT
from oracles import (
    gn_align_np,
    make_scan,
    make_scene,
    ndt_stats_np,
    voxel_map_np,
)


@pytest.fixture
def scene():
    rng = np.random.RandomState(9)
    return make_scene(rng)


def test_calc_H_g_e2_matches_oracle(scene):
    ndt = NDT(voxel_size=1.0, max_iter=10, max_dist=2.0, tol=1e-3)
    ndt.set_target(scene)
    rng = np.random.RandomState(10)
    scan, _ = make_scan(rng, scene, np.array([0.03, -0.02, 0.05, 0.01, 0.0, -0.01]))
    T0 = np.eye(4)
    H1, g1, e2_1 = ndt.calc_H_g_e2(T0, scan)
    means, _, _, icovs = voxel_map_np(scene, 1.0, min_points=10)
    H2, g2, e2_2, n = ndt_stats_np(means, icovs, scan, T0, 2.0)
    # Mahalanobis stats involve inverse covariances (condition number ~1e4
    # for thin planar voxels), so float32 parity is looser than plane/point
    scale = max(np.abs(H2).max(), 1.0)
    np.testing.assert_allclose(H1 / scale, H2 / scale, atol=5e-3)
    gs = max(np.abs(g2).max(), 1.0)
    np.testing.assert_allclose(g1 / gs, g2 / gs, atol=5e-3)
    assert abs(e2_1 - e2_2) / max(e2_2, 1.0) < 5e-3


def test_align_matches_reference_loop(scene):
    ndt = NDT(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
    ndt.set_target(scene)
    rng = np.random.RandomState(11)
    scan, _ = make_scan(rng, scene, np.array([0.02, -0.02, 0.04, 0.008, -0.01, 0.012]))
    T_ours = ndt.align(scan)
    means, _, _, icovs = voxel_map_np(scene, 1.0, min_points=10)
    T_ref, _ = gn_align_np(
        lambda T: ndt_stats_np(means, icovs, scan, T, 2.0), max_iter=30, tol=1e-3
    )
    np.testing.assert_allclose(T_ours, T_ref, atol=5e-3)


def test_align_recovers_transform(scene):
    rng = np.random.RandomState(12)
    dx = np.array([0.1, -0.08, 0.2, 0.02, -0.02, 0.03])
    scan, T_true = make_scan(rng, scene, dx)
    ndt = NDT(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
    ndt.set_target(scene)
    T_est = ndt.align(scan)
    residual = T_est @ T_true - np.eye(4)
    assert np.abs(residual).max() < 0.02, residual
