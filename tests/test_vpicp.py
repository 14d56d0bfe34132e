"""VPlaneICP parity + convergence (pattern of reference tests/test_vpicp.py)."""

import numpy as np
import pytest

from point_cloud_registration_tpu import VPlaneICP
from oracles import (
    gn_align_np,
    make_scan,
    make_scene,
    plus_np,
    transform_np,
    voxel_map_np,
    vplane_stats_np,
)


@pytest.fixture
def scene():
    rng = np.random.RandomState(5)
    return make_scene(rng)


def test_calc_H_g_e2_matches_oracle(scene):
    vp = VPlaneICP(voxel_size=1.0, max_iter=10, max_dist=2.0, tol=1e-3)
    vp.set_target(scene)
    rng = np.random.RandomState(6)
    scan, _ = make_scan(rng, scene, np.array([0.03, -0.02, 0.05, 0.01, 0.0, -0.01]))
    T0 = np.eye(4)
    H1, g1, e2_1 = vp.calc_H_g_e2(T0, scan)
    means, _, normals, _ = voxel_map_np(scene, 1.0, min_points=10)
    H2, g2, e2_2, n = vplane_stats_np(means, normals, scan, T0, 2.0)
    # per-point normalization: H entries scale with inlier count
    np.testing.assert_allclose(H1 / n, H2 / n, atol=2e-3)
    np.testing.assert_allclose(g1 / n, g2 / n, atol=2e-3)
    assert abs(e2_1 - e2_2) / n < 2e-3


def test_align_matches_reference_loop(scene):
    vp = VPlaneICP(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
    vp.set_target(scene)
    rng = np.random.RandomState(7)
    scan, _ = make_scan(rng, scene, np.array([0.02, -0.02, 0.04, 0.008, -0.01, 0.012]))
    T_ours = vp.align(scan)
    means, _, normals, _ = voxel_map_np(scene, 1.0, min_points=10)
    T_ref, _ = gn_align_np(
        lambda T: vplane_stats_np(means, normals, scan, T, 2.0), max_iter=30, tol=1e-3
    )
    np.testing.assert_allclose(T_ours, T_ref, atol=2e-3)


def test_align_recovers_transform(scene):
    rng = np.random.RandomState(8)
    dx = np.array([0.1, -0.08, 0.2, 0.02, -0.02, 0.03])
    scan, T_true = make_scan(rng, scene, dx)
    vp = VPlaneICP(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
    vp.set_target(scene)
    T_est = vp.align(scan)
    residual = T_est @ T_true - np.eye(4)
    # voxel-resolution accuracy limit: the float64 reference oracle lands at
    # max-residual 0.0373 on this exact problem — we must match that, not
    # beat it (parity asserted in test_align_matches_reference_loop)
    assert np.abs(residual).max() < 0.05, residual
    means, _, normals, _ = voxel_map_np(scene, 1.0, min_points=10)
    T_ref, _ = gn_align_np(
        lambda T: vplane_stats_np(means, normals, scan, T, 2.0), max_iter=30, tol=1e-3
    )
    np.testing.assert_allclose(T_est, T_ref, atol=5e-3)


def test_voxels_attribute(scene):
    vp = VPlaneICP(voxel_size=1.0)
    vp.set_target(scene)
    vm = vp.voxels
    assert int(np.asarray(vm.num_voxels)) > 50
