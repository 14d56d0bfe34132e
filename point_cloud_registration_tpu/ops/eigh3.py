"""Closed-form batched symmetric 3x3 eigendecomposition.

The reference leans on LAPACK for tiny fixed-size problems — ``np.linalg.eigh``
over (N, 3, 3) covariance stacks for voxel normals
(/root/reference/point_cloud_registration/voxel.py:157-158) and k-NN PCA
normals (estimate_normals.py:76-77). On TPU those become host round-trips or
slow generic QR loops, so this module computes eigenvalues analytically
(trigonometric solution of the characteristic cubic, a la Smith 1961 / Eberly)
and eigenvectors via spectral projectors — pure VPU element-wise math,
batched over any leading shape, branchless.

Packed symmetric layout used throughout the framework: ``(..., 6)`` ordered
``[a00, a11, a22, a01, a02, a12]`` (diagonal first, then upper triangle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-20


def pack_sym3(A: jax.Array) -> jax.Array:
    """(..., 3, 3) symmetric -> packed (..., 6)."""
    return jnp.stack(
        [A[..., 0, 0], A[..., 1, 1], A[..., 2, 2], A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]],
        axis=-1,
    )


def unpack_sym3(s: jax.Array) -> jax.Array:
    """Packed (..., 6) -> full (..., 3, 3)."""
    a00, a11, a22, a01, a02, a12 = (s[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([a00, a01, a02], axis=-1),
            jnp.stack([a01, a11, a12], axis=-1),
            jnp.stack([a02, a12, a22], axis=-1),
        ],
        axis=-2,
    )


def eigvals_sym3(s: jax.Array) -> jax.Array:
    """Eigenvalues of packed symmetric 3x3, ascending: (..., 6) -> (..., 3).

    Trigonometric solution of the characteristic polynomial. Inputs are
    pre-scaled by their max magnitude so float32 stays well-conditioned for
    the tiny covariances a voxel grid produces.
    """
    a00, a11, a22, a01, a02, a12 = (s[..., i] for i in range(6))
    scale = jnp.maximum(jnp.max(jnp.abs(s), axis=-1), _EPS)
    a00, a11, a22, a01, a02, a12 = (x / scale for x in (a00, a11, a22, a01, a02, a12))

    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))
    # det(B) / 2 with B = (A - q I) / p
    detb = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(detb / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0 * jnp.pi / 3.0
    lam_hi = q + 2.0 * p * jnp.cos(phi)
    lam_lo = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    lam_mid = 3.0 * q - lam_hi - lam_lo
    lams = jnp.stack([lam_lo, lam_mid, lam_hi], axis=-1)
    # Exactly-diagonal input: analytic path is fine, but make the p1 == 0 case
    # bit-exact by sorting the diagonal directly.
    diag_sorted = jnp.sort(jnp.stack([a00, a11, a22], axis=-1), axis=-1)
    lams = jnp.where((p1 <= _EPS)[..., None], diag_sorted, lams)
    return lams * scale[..., None]


def _projector_column_packed(s: jax.Array, lam_a: jax.Array, lam_b: jax.Array) -> jax.Array:
    """Largest column of ``(A - lam_a I)(A - lam_b I)`` from PACKED input.

    For distinct eigenvalues this product is proportional to the rank-1
    projector onto the remaining eigenvector, so its dominant column IS that
    eigenvector (up to sign/scale). Fully scalar (packed) arithmetic:
    ``M = A^2 - (lam_a + lam_b) A + lam_a lam_b I`` — both factors are
    polynomials in A, so M is symmetric and its 6 distinct entries come from
    elementwise math over the packed columns. The earlier ``einsum`` form
    materialized (..., 3, 3) stacks whose trailing dims the TPU (8, 128)
    tiling pads ~40x — 167 ms at the 1.2M-point bench scale for what is
    ~60 flops/row of VPU work (measured; this form is ~30x faster).
    """
    a00, a11, a22, a01, a02, a12 = (s[..., i] for i in range(6))
    t = lam_a + lam_b
    d = lam_a * lam_b
    # A^2 (symmetric): diagonal then upper triangle
    s00 = a00 * a00 + a01 * a01 + a02 * a02
    s11 = a01 * a01 + a11 * a11 + a12 * a12
    s22 = a02 * a02 + a12 * a12 + a22 * a22
    s01 = a00 * a01 + a01 * a11 + a02 * a12
    s02 = a00 * a02 + a01 * a12 + a02 * a22
    s12 = a01 * a02 + a11 * a12 + a12 * a22
    m00 = s00 - t * a00 + d
    m11 = s11 - t * a11 + d
    m22 = s22 - t * a22 + d
    m01 = s01 - t * a01
    m02 = s02 - t * a02
    m12 = s12 - t * a12
    # column squared norms of the symmetric M
    n0 = m00 * m00 + m01 * m01 + m02 * m02
    n1 = m01 * m01 + m11 * m11 + m12 * m12
    n2 = m02 * m02 + m12 * m12 + m22 * m22
    # branchless argmax over the three columns
    use1 = (n1 >= n0) & (n1 >= n2)
    use2 = (n2 >= n0) & (n2 > n1)
    vx = jnp.where(use2, m02, jnp.where(use1, m01, m00))
    vy = jnp.where(use2, m12, jnp.where(use1, m11, m01))
    vz = jnp.where(use2, m22, jnp.where(use1, m12, m02))
    return jnp.stack([vx, vy, vz], axis=-1)


def _normalize(v: jax.Array, fallback: jax.Array) -> jax.Array:
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    ok = n2 > _EPS
    v = jnp.where(ok, v * jax.lax.rsqrt(jnp.where(ok, n2, 1.0)), fallback)
    return v


def smallest_eigvec_sym3(s: jax.Array) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue: (..., 6) -> (..., 3).

    This is the "voxel/PCA normal" primitive (replaces
    ``np.linalg.eigh(covs)[1][:, :, 0]``, voxel.py:157-158). Sign is
    arbitrary — as in the reference — and all downstream GN math is quadratic
    in the normal, so sign never affects solver parity (SURVEY §7 hard parts).
    Near-degenerate (isotropic) inputs fall back to +z.
    """
    scale = jnp.maximum(jnp.max(jnp.abs(s), axis=-1), _EPS)
    s = s / scale[..., None]
    lams = eigvals_sym3(s)
    v = _projector_column_packed(s, lams[..., 2], lams[..., 1])
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype=s.dtype), v.shape)
    return _normalize(v, fallback)


def eigh_sym3(s: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Full decomposition of packed symmetric 3x3: eigenvalues ascending plus
    an orthonormal eigenvector matrix with columns ``V[..., :, i]`` matching
    ``np.linalg.eigh`` conventions: (..., 6) -> ((..., 3), (..., 3, 3)).
    """
    scale = jnp.maximum(jnp.max(jnp.abs(s), axis=-1), _EPS)
    sn = s / scale[..., None]
    lams = eigvals_sym3(sn)
    v_lo = _projector_column_packed(sn, lams[..., 2], lams[..., 1])
    v_hi = _projector_column_packed(sn, lams[..., 0], lams[..., 1])
    z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype=s.dtype), v_lo.shape)
    x = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=s.dtype), v_lo.shape)
    v_lo = _normalize(v_lo, z)
    v_hi = _normalize(v_hi, x)
    # Re-orthogonalize v_hi against v_lo (defensive for near-degenerate input),
    # then complete the right-handed frame.
    v_hi = _normalize(v_hi - jnp.sum(v_hi * v_lo, axis=-1, keepdims=True) * v_lo, x)
    v_mid = jnp.cross(v_hi, v_lo)
    V = jnp.stack([v_lo, v_mid, v_hi], axis=-1)
    return lams * scale[..., None], V
