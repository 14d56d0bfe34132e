import numpy as np
import jax
import jax.numpy as jnp

from point_cloud_registration_tpu.core.gn import GNStats, gauss_newton
from point_cloud_registration_tpu.core.se3 import makeRt, transform_points
from point_cloud_registration_tpu.ops.reduce import point_stats
from oracles import gn_align_np, plus_np, transform_np


def _paired_problem():
    """Known-correspondence point-to-point problem (no NN search): both the
    jax driver and the numpy oracle use identical stats, so iterates must
    match to float32 precision."""
    rng = np.random.RandomState(42)
    target = rng.rand(200, 3).astype(np.float32) * 4
    T_true = plus_np(np.eye(4), np.array([0.3, -0.2, 0.1, 0.1, 0.2, -0.15]))
    source = transform_np(np.linalg.inv(T_true), target).astype(np.float32)
    return target, source, T_true


def test_gauss_newton_matches_numpy_loop():
    target, source, T_true = _paired_problem()
    w = jnp.ones((len(source),), jnp.float32)

    def stats_fn(T):
        R, _ = makeRt(T)
        src_trans = transform_points(T, jnp.asarray(source))
        return point_stats(jnp.asarray(source), src_trans, jnp.asarray(target), w, R)

    T, diag = jax.jit(lambda T0: gauss_newton(stats_fn, T0, 30, 1e-3))(jnp.eye(4))
    T = np.asarray(jax.device_get(T))

    def stats_np(Tn):
        src_trans = transform_np(Tn, source.astype(np.float64))
        H = np.zeros((6, 6))
        g = np.zeros(6)
        e2 = 0.0
        R = Tn[:3, :3]
        for i in range(len(source)):
            p = source[i].astype(np.float64)
            S = np.array([[0, -p[2], p[1]], [p[2], 0, -p[0]], [-p[1], p[0], 0]])
            J = np.hstack([np.eye(3), -R @ S])
            r = src_trans[i] - target[i]
            H += J.T @ J
            g += J.T @ r
            e2 += r @ r
        return H, g, e2

    T_ref, iters_ref = gn_align_np(stats_np, max_iter=30, tol=1e-3)
    np.testing.assert_allclose(T, T_ref, atol=1e-3)
    assert abs(int(jax.device_get(diag.iterations)) - iters_ref) <= 1
    # and it actually solved the problem
    np.testing.assert_allclose(T, T_true, atol=1e-3)
    d = jax.device_get(diag)
    assert bool(d.converged)
    assert not bool(d.solver_failed)
    # error history is decreasing over the recorded iterations
    e2h = np.asarray(d.e2_history)[: int(d.iterations)]
    assert e2h[-1] <= e2h[0]


def test_singular_system_flags_failure_no_nan():
    """A rank-deficient H must terminate cleanly (SURVEY §5: guards must not
    crash a pod step), unlike the reference which lets LAPACK raise."""

    def stats_fn(T):
        H = jnp.zeros((6, 6), jnp.float32)
        g = jnp.ones((6,), jnp.float32)
        return GNStats(H=H, g=g, e2=jnp.float32(1.0), n_inliers=jnp.float32(0.0))

    T, diag = gauss_newton(stats_fn, jnp.eye(4), 10, 1e-3)
    T = np.asarray(jax.device_get(T))
    assert np.all(np.isfinite(T))
    np.testing.assert_allclose(T, np.eye(4))
    assert bool(jax.device_get(diag.solver_failed))
    assert int(jax.device_get(diag.iterations)) == 1


def test_max_iter_respected():
    calls = []

    def stats_fn(T):
        # well-conditioned but never-converging: constant large gradient
        H = jnp.eye(6, dtype=jnp.float32)
        g = jnp.ones((6,), jnp.float32)
        return GNStats(H=H, g=g, e2=jnp.float32(1.0), n_inliers=jnp.float32(1.0))

    T, diag = gauss_newton(stats_fn, jnp.eye(4), 7, 1e-9)
    assert int(jax.device_get(diag.iterations)) == 7
    assert not bool(jax.device_get(diag.converged))


def test_huber_robust_weighting_downweights_outliers():
    """Opt-in Huber IRLS (SURVEY M6): with gross outliers in the scan, the
    robust solver must recover the transform better than plain least squares."""
    import dataclasses
    from point_cloud_registration_tpu import ICP
    from oracles import make_scan, make_scene

    rng = np.random.RandomState(55)
    scene = make_scene(rng)
    scan, T_true = make_scan(rng, scene, np.array([0.03, -0.02, 0.08, 0.008, -0.01, 0.012]))
    # 10% gross outliers within the gate (1.5 m shifts)
    n_out = len(scan) // 10
    scan_out = scan.copy()
    scan_out[:n_out] += (rng.rand(n_out, 3) - 0.5) * 3.0

    def run(huber):
        icp = ICP(max_iter=30, max_dist=2.0, tol=1e-3)
        icp.cfg = dataclasses.replace(icp.cfg, huber_delta=huber)
        icp.set_target(scene)
        T = icp.align(scan_out)
        return np.abs(T @ T_true - np.eye(4)).max()

    err_plain = run(None)
    err_robust = run(0.1)
    assert err_robust < err_plain
    assert err_robust < 0.03, (err_plain, err_robust)
