import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_cloud_registration_tpu.core import se3
from oracles import exp_so3_np, plus_np, transform_np


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_expSO3_matches_oracle(rng):
    for scale in [1e-6, 1e-3, 0.1, 1.0, 3.0]:
        w = rng.randn(3) * scale
        R = np.asarray(se3.expSO3(jnp.asarray(w, jnp.float32)))
        R_ref = exp_so3_np(w)
        np.testing.assert_allclose(R, R_ref, atol=1e-4)


def test_expSO3_batched(rng):
    ws = rng.randn(17, 3).astype(np.float32)
    Rs = np.asarray(se3.expSO3(jnp.asarray(ws)))
    for i in range(17):
        np.testing.assert_allclose(Rs[i], exp_so3_np(ws[i]), atol=1e-4)
        # proper rotations
        np.testing.assert_allclose(Rs[i] @ Rs[i].T, np.eye(3), atol=1e-5)


def test_expSO3_small_angle_branch():
    # theta^2 <= 1e-5 uses I + W (reference math_tools.py:88-91)
    w = np.array([1e-3, 2e-3, -1e-3], np.float32)
    R = np.asarray(se3.expSO3(jnp.asarray(w)))
    W = np.asarray(se3.skew(jnp.asarray(w)))
    np.testing.assert_allclose(R, np.eye(3) + W, atol=1e-7)


def test_log_exp_roundtrip(rng):
    for _ in range(10):
        w = rng.randn(3)
        w = w / np.linalg.norm(w) * rng.uniform(1e-4, 3.0)
        R = se3.expSO3(jnp.asarray(w, jnp.float32))
        w2 = np.asarray(se3.logSO3(R))
        np.testing.assert_allclose(w2, w, atol=1e-4)


def test_plus_matches_oracle(rng):
    T = plus_np(np.eye(4), rng.randn(6) * 0.3)
    dx = rng.randn(6).astype(np.float32) * 0.2
    ours = np.asarray(se3.plus(jnp.asarray(T, jnp.float32), jnp.asarray(dx)))
    ref = plus_np(T, dx.astype(np.float64))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_transform_points(rng):
    T = plus_np(np.eye(4), rng.randn(6))
    pts = rng.randn(50, 3)
    ours = np.asarray(
        se3.transform_points(jnp.asarray(T, jnp.float32), jnp.asarray(pts, jnp.float32))
    )
    np.testing.assert_allclose(ours, transform_np(T, pts), atol=1e-5)


def test_skew_family(rng):
    v = rng.randn(8, 3).astype(np.float32)
    u = rng.randn(8, 3).astype(np.float32)
    S = np.asarray(se3.skew(jnp.asarray(v)))
    # skew(v) @ u == v x u
    fused = np.asarray(se3.skew_time_vector(jnp.asarray(v), jnp.asarray(u)))
    np.testing.assert_allclose(fused, np.cross(v, u), atol=1e-6)
    np.testing.assert_allclose(
        np.einsum("nij,nj->ni", S, u), np.cross(v, u), atol=1e-6
    )
    # skew2 == sum skew^T skew
    s2 = np.asarray(se3.skew2(jnp.asarray(v)))
    ref = sum(S[i].T @ S[i] for i in range(8))
    np.testing.assert_allclose(s2, ref, atol=1e-5)
    # weighted variant
    w = rng.rand(8).astype(np.float32)
    s2w = np.asarray(se3.skew2(jnp.asarray(v), jnp.asarray(w)))
    refw = sum(w[i] * (S[i].T @ S[i]) for i in range(8))
    np.testing.assert_allclose(s2w, refw, atol=1e-5)


def test_huber_weight():
    r = jnp.asarray([0.5, 1.0, 2.0, 4.0], jnp.float32)
    w = np.asarray(se3.huber_weight(r, d=1.0))
    np.testing.assert_allclose(w, [1.0, 1.0, 0.5, 0.25], atol=1e-6)


def test_reference_jacobian_convention(rng):
    """Document + verify the reference's (mixed) Jacobian convention.

    The reference linearizes with J = [I | -R skew(p)] (icp.py:77-81): the
    rotation block is the derivative of the right-multiplicative update
    R <- R exp(w), but the translation block I corresponds to an *additive*
    world-frame translation t <- t + dt — even though its boxplus actually
    applies dt in the body frame (t <- t + R dt, math_tools.py:101-108).
    Both H and g are built from the same J, so Gauss-Newton still converges
    (it is GN under a modified metric); we must reproduce this J exactly for
    per-iteration parity. Verified here with the finite-difference checker
    (math_tools.py:116-127 pattern).
    """
    T = plus_np(np.eye(4), rng.randn(6) * 0.3)
    R = T[:3, :3]
    t = T[:3, 3]
    p = rng.randn(3)

    def resid(dx):
        # update convention implied by the reference J: additive translation,
        # right-multiplied rotation
        Rd = R @ exp_so3_np(dx[3:])
        return Rd @ p + t + dx[:3]

    J_num = se3.numerical_derivative(resid, [np.zeros(6)], 0, delta=1e-6)
    S = np.array([[0, -p[2], p[1]], [p[2], 0, -p[0]], [-p[1], p[0], 0]])
    J_ref = np.hstack([np.eye(3), -R @ S])
    np.testing.assert_allclose(J_num, J_ref, atol=1e-4)


def test_makeT_makeRt_roundtrip(rng):
    R = exp_so3_np(rng.randn(3))
    t = rng.randn(3)
    T = np.asarray(se3.makeT(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)))
    R2, t2 = se3.makeRt(jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-6)
