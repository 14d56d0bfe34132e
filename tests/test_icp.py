"""ICP parity + convergence tests (pattern of reference tests/test_icp.py,
plus the end-to-end align assertions the reference never had)."""

import numpy as np
import jax
import pytest

from point_cloud_registration_tpu import ICP
from oracles import (
    exp_so3_np,
    gn_align_np,
    icp_stats_np,
    make_scan,
    make_scene,
    plus_np,
    transform_np,
)


@pytest.fixture
def reference_fixture():
    """The reference's own test fixture (tests/test_icp.py:7-17): 100 seeded
    random points, R = exp([0.1, 0.2, 0.3]), t = [0.5, -0.3, 0.2]."""
    rng = np.random.RandomState(42)
    target = rng.rand(100, 3)
    R = exp_so3_np(np.array([0.1, 0.2, 0.3]))
    t = np.array([0.5, -0.3, 0.2])
    source = (target @ R.T + t).astype(np.float32)
    return target.astype(np.float32), source


def test_calc_H_g_e2_matches_oracle(reference_fixture):
    target, source = reference_fixture
    icp = ICP(max_iter=10, max_dist=2.0, tol=1e-3)
    # generous cap -> grid 1-NN exact; oracle uses a kd-tree
    icp.cfg = icp.cfg.__class__(
        max_iter=10, max_dist=2.0, tol=1e-3,
        corr=icp.cfg.corr.__class__(cell_cap=256),
    )
    icp.set_target(target)
    H1, g1, e2_1 = icp.calc_H_g_e2(np.eye(4), source)
    H2, g2, e2_2, n = icp_stats_np(target, source, np.eye(4), max_dist=2.0)
    np.testing.assert_allclose(H1, H2, atol=1e-3)
    np.testing.assert_allclose(g1, g2, atol=1e-3)
    assert abs(e2_1 - e2_2) < 1e-3


def test_align_matches_reference_loop(reference_fixture):
    """Iteration-for-iteration parity: same stats -> same GN trajectory."""
    target, source = reference_fixture
    dx = np.array([0.02, -0.03, 0.01, 0.02, -0.01, 0.015])
    src = transform_np(plus_np(np.eye(4), dx), target).astype(np.float32)
    icp = ICP(max_iter=30, max_dist=2.0, tol=1e-3)
    icp.cfg = icp.cfg.__class__(
        max_iter=30, max_dist=2.0, tol=1e-3,
        corr=icp.cfg.corr.__class__(cell_cap=256),
    )
    icp.set_target(target)
    T_ours = icp.align(src)
    T_ref, _ = gn_align_np(
        lambda T: icp_stats_np(target, src, T, 2.0), max_iter=30, tol=1e-3
    )
    np.testing.assert_allclose(T_ours, T_ref, atol=1e-3)


def test_align_recovers_transform_scene():
    """End-to-end convergence on a structured scene (benchmark protocol,
    benchmark/test_data.py:21-44): the estimated transform must undo the
    scan offset."""
    rng = np.random.RandomState(0)
    scene = make_scene(rng)
    dx = np.array([0.05, -0.04, 0.1, 0.01, -0.015, 0.02])
    scan, T_true = make_scan(rng, scene, dx, n_points=3000)
    icp = ICP(max_iter=30, max_dist=2.0, tol=1e-3)
    icp.set_target(scene)
    T_est = icp.align(scan)
    # T_est should inverse-map the scan onto the scene
    residual = T_est @ T_true - np.eye(4)
    assert np.abs(residual).max() < 0.02, residual
    d = icp.last_diagnostics
    assert bool(d.converged)
    assert int(d.inlier_history[0]) > 2500


def test_unset_target_raises():
    icp = ICP()
    with pytest.raises(ValueError):
        icp.align(np.zeros((10, 3), np.float32))


def test_diagnostics_populated(reference_fixture):
    target, _ = reference_fixture
    dx = np.array([0.01, 0.0, 0.0, 0.0, 0.0, 0.0])
    src = transform_np(plus_np(np.eye(4), dx), target).astype(np.float32)
    icp = ICP(max_iter=30, max_dist=2.0, tol=1e-3)
    icp.set_target(target)
    icp.align(src)
    d = icp.last_diagnostics
    it = int(d.iterations)
    assert 1 <= it <= 30
    assert np.all(np.asarray(d.e2_history[:it]) >= 0)


def test_huber_align_beats_plain_on_corrupted_scene():
    """End-to-end robustness (SURVEY M6): with 15% gross outliers injected
    into the scan, the Huber-weighted align must recover the true transform
    more accurately than the unweighted one. Exercises huber_delta through
    the full solver, not just one linearization."""
    rng = np.random.RandomState(77)
    target = make_scene(rng, n_floor=4000, n_wall=2000)
    dx = np.array([0.02, -0.03, 0.01, 0.15, -0.1, 0.08], np.float32)
    scan, T_true = make_scan(rng, target, dx)
    n_out = len(scan) * 15 // 100
    corrupt = scan.copy()
    # DIRECTIONAL gross outliers INSIDE the gate: a common-mode shift biases
    # plain least squares (symmetric corruption would average out), while
    # staying under max_dist so the gate cannot silently reject it
    corrupt[:n_out] += (
        np.float32([0.9, 0.6, 0.4])
        + rng.randn(n_out, 3).astype(np.float32) * 0.1
    )

    def err(huber):
        s = ICP(max_iter=40, max_dist=2.0, tol=1e-6, huber_delta=huber)
        s.set_target(target)
        T = np.asarray(s.align(corrupt))
        # align returns the inverse map: T @ T_true == I when exact
        return np.linalg.norm(T @ T_true - np.eye(4))

    e_plain = err(None)
    e_huber = err(0.1)
    assert e_huber < 0.6 * e_plain, (e_huber, e_plain)
