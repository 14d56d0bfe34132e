"""PlaneICP parity + convergence (pattern of reference tests/test_picp.py)."""

import numpy as np
import pytest

from point_cloud_registration_tpu import PlaneICP
from oracles import (
    gn_align_np,
    make_scan,
    make_scene,
    plane_stats_np,
    plus_np,
    transform_np,
)


@pytest.fixture
def fixture():
    rng = np.random.RandomState(42)
    target = (rng.rand(300, 3) * 2).astype(np.float32)
    # deterministic synthetic normals (injected into both impls so the test
    # isolates the solver math from normal estimation)
    normals = rng.randn(300, 3)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals.astype(np.float32)
    return target, normals


def _exact_cfg(picp):
    picp.cfg = picp.cfg.__class__(
        max_iter=picp.cfg.max_iter,
        max_dist=picp.cfg.max_dist,
        tol=picp.cfg.tol,
        k=picp.cfg.k,
        corr=picp.cfg.corr.__class__(cell_cap=512),
    )


def test_calc_H_g_e2_matches_oracle(fixture):
    target, normals = fixture
    picp = PlaneICP(max_iter=10, max_dist=2.0, tol=1e-3)
    _exact_cfg(picp)
    picp.set_target(target, norm=normals)
    dx = np.array([0.03, -0.02, 0.04, 0.02, 0.01, -0.02])
    src = transform_np(plus_np(np.eye(4), dx), target).astype(np.float32)
    T0 = np.eye(4)
    H1, g1, e2_1 = picp.calc_H_g_e2(T0, src)
    H2, g2, e2_2, _ = plane_stats_np(target, normals, src, T0, 2.0)
    np.testing.assert_allclose(H1, H2, atol=1e-2)
    np.testing.assert_allclose(g1, g2, atol=1e-2)
    assert abs(e2_1 - e2_2) < 1e-2


def test_align_matches_reference_loop(fixture):
    target, normals = fixture
    picp = PlaneICP(max_iter=30, max_dist=2.0, tol=1e-3)
    _exact_cfg(picp)
    picp.set_target(target, norm=normals)
    dx = np.array([0.02, -0.01, 0.02, 0.01, -0.01, 0.01])
    src = transform_np(plus_np(np.eye(4), dx), target).astype(np.float32)
    T_ours = picp.align(src)
    T_ref, _ = gn_align_np(
        lambda T: plane_stats_np(target, normals, src, T, 2.0), max_iter=30, tol=1e-3
    )
    np.testing.assert_allclose(T_ours, T_ref, atol=2e-3)


def test_align_recovers_transform_scene():
    rng = np.random.RandomState(1)
    scene = make_scene(rng)
    dx = np.array([0.08, -0.05, 0.15, 0.015, -0.02, 0.025])
    scan, T_true = make_scan(rng, scene, dx, n_points=3000)
    picp = PlaneICP(max_iter=30, max_dist=2.0, tol=1e-3, k=15)
    picp.set_target(scene)  # estimates normals on device
    T_est = picp.align(scan)
    residual = T_est @ T_true - np.eye(4)
    assert np.abs(residual).max() < 0.02, residual


def test_precomputed_normals_injection(fixture):
    """plane_icp.py:19-28 reuse API: injected normals skip estimation."""
    target, normals = fixture
    picp = PlaneICP()
    picp.set_target(target, kdree="ignored", norm=normals)
    np.testing.assert_allclose(np.asarray(picp.normal), normals, atol=0)
