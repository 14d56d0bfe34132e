"""Caratheodory coreset tests (pattern of reference tests/test_caratheodory.py)."""

import numpy as np

from point_cloud_registration_tpu.models.coreset import (
    caratheodory,
    create_gn_set,
    fast_caratheodory,
)


def test_exact_same_results():
    """Reference contract (tests/test_caratheodory.py:6-42): 30k random
    (J, r) pairs reduced to <= 128 weighted points preserving H/g/e2 to
    1e-10."""
    rng = np.random.RandomState(0)
    N, k, N_target = 30000, 64, 128
    J = rng.randn(N, 6)
    r = rng.randn(N)
    P = create_gn_set(J, r)
    assert P.shape == (28, N)
    assert N_target > P.shape[0] + 1
    u = np.ones(P.shape[1])
    _, w, indices = fast_caratheodory(P, u, k, N_target)

    H = J.T @ J
    g = J.T @ r
    e2 = r.T @ r
    J_sub, r_sub = J[indices], r[indices]
    H_t = J_sub.T @ (w[:, None] * J_sub)
    g_t = J_sub.T @ (w * r_sub)
    e2_t = r_sub.T @ (w * r_sub)
    err = max(np.abs(H - H_t).max(), np.abs(g - g_t).max(), abs(e2 - e2_t))
    assert err <= 1e-10, err


def test_weights_positive_and_bounded():
    rng = np.random.RandomState(1)
    J = rng.randn(30000, 6)
    r = rng.randn(30000)
    P = create_gn_set(J, r)
    u = np.ones(P.shape[1])
    _, w, idx = fast_caratheodory(P, u, 64, 128)
    assert len(w) <= 128
    assert np.all(w > 0)
    assert len(np.unique(idx)) == len(idx)


def test_exact_caratheodory_small():
    rng = np.random.RandomState(2)
    P = rng.randn(5, 40)
    u = np.abs(rng.rand(40)) + 0.1
    P_sub, w, idx = caratheodory(P, u, 10)
    assert P_sub.shape[1] <= 10
    np.testing.assert_allclose(P_sub @ w, P @ u, atol=1e-9)
    np.testing.assert_allclose(w.sum(), u.sum(), atol=1e-9)


def test_passthrough_when_small_enough():
    rng = np.random.RandomState(3)
    P = rng.randn(28, 50)
    u = np.ones(50)
    P2, w, idx = fast_caratheodory(P, u, 64, 128)
    assert P2.shape[1] == 50
    np.testing.assert_array_equal(idx, np.arange(50))
