import numpy as np
import jax.numpy as jnp
import pytest

from point_cloud_registration_tpu.ops import eigh3


def random_sym_batch(rng, n, scale=1.0, spd=True):
    A = rng.randn(n, 3, 3) * scale
    A = A + np.swapaxes(A, -1, -2)
    if spd:
        A = np.einsum("nij,nkj->nik", A, A)  # PSD
    return A.astype(np.float32)


def test_eigvals_match_lapack():
    rng = np.random.RandomState(1)
    A = random_sym_batch(rng, 200)
    packed = eigh3.pack_sym3(jnp.asarray(A))
    ours = np.asarray(eigh3.eigvals_sym3(packed))
    ref = np.linalg.eigvalsh(A.astype(np.float64))
    scale = np.abs(ref).max(axis=-1, keepdims=True) + 1e-9
    np.testing.assert_allclose(ours / scale, ref / scale, atol=2e-5)


def test_eigvals_tiny_covariances():
    # voxel covariances are ~1e-2 magnitude; check scaling keeps precision
    rng = np.random.RandomState(2)
    A = random_sym_batch(rng, 100, scale=0.05)
    packed = eigh3.pack_sym3(jnp.asarray(A))
    ours = np.asarray(eigh3.eigvals_sym3(packed))
    ref = np.linalg.eigvalsh(A.astype(np.float64))
    scale = np.abs(ref).max(axis=-1, keepdims=True) + 1e-12
    # near-degenerate eigenvalues are sqrt(eps)-conditioned in float32
    np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-4)


def test_smallest_eigvec_matches_lapack():
    rng = np.random.RandomState(3)
    A = random_sym_batch(rng, 500)
    packed = eigh3.pack_sym3(jnp.asarray(A))
    ours = np.asarray(eigh3.smallest_eigvec_sym3(packed))
    _, vecs = np.linalg.eigh(A.astype(np.float64))
    ref = vecs[:, :, 0]
    # sign-invariant comparison: |cos(angle)| ~ 1
    cos = np.abs(np.sum(ours * ref, axis=-1))
    assert np.all(np.abs(np.linalg.norm(ours, axis=-1) - 1.0) < 1e-5)
    assert np.quantile(cos, 0.01) > 1.0 - 1e-4, cos.min()


def test_planar_covariance_normal():
    # points on a plane -> smallest eigenvector == plane normal
    rng = np.random.RandomState(4)
    n = np.array([1.0, 2.0, -0.5])
    n /= np.linalg.norm(n)
    basis = np.linalg.svd(np.eye(3) - np.outer(n, n))[0][:, :2]
    pts = rng.randn(100, 2) @ basis.T
    cov = pts.T @ pts / len(pts)
    packed = eigh3.pack_sym3(jnp.asarray(cov[None], jnp.float32))
    v = np.asarray(eigh3.smallest_eigvec_sym3(packed))[0]
    assert abs(abs(v @ n) - 1.0) < 1e-4


def test_degenerate_isotropic_safe():
    # isotropic and zero matrices must not produce NaN
    A = np.stack([np.eye(3), np.zeros((3, 3)), 2.5 * np.eye(3)]).astype(np.float32)
    packed = eigh3.pack_sym3(jnp.asarray(A))
    v = np.asarray(eigh3.smallest_eigvec_sym3(packed))
    assert np.all(np.isfinite(v))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    lam = np.asarray(eigh3.eigvals_sym3(packed))
    np.testing.assert_allclose(lam[0], [1, 1, 1], atol=1e-5)
    np.testing.assert_allclose(lam[2], [2.5, 2.5, 2.5], atol=1e-5)


def test_full_eigh_orthonormal():
    rng = np.random.RandomState(5)
    A = random_sym_batch(rng, 100)
    packed = eigh3.pack_sym3(jnp.asarray(A))
    lams, V = eigh3.eigh_sym3(packed)
    lams, V = np.asarray(lams), np.asarray(V)
    ref = np.linalg.eigvalsh(A.astype(np.float64))
    scale = np.abs(ref).max(axis=-1, keepdims=True) + 1e-9
    np.testing.assert_allclose(lams / scale, ref / scale, atol=2e-5)
    # V columns orthonormal and A V = V diag(lam)
    eye = np.einsum("nij,nik->njk", V, V)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-3)
    AV = np.einsum("nij,njk->nik", A, V)
    VL = V * lams[:, None, :]
    err = np.abs(AV - VL).max() / scale.max()
    assert err < 1e-3, err


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(6)
    A = random_sym_batch(rng, 10)
    packed = eigh3.pack_sym3(jnp.asarray(A))
    back = np.asarray(eigh3.unpack_sym3(packed))
    np.testing.assert_allclose(back, A, atol=0)
