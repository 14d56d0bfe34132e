"""K4 fused k-NN moments kernel (ops/pallas/knn_normals.py) vs oracles.

Interpret mode on CPU. Contracts:

* where the kernel flags a query ``exact`` (k-th distance inside the
  provable radius), its covariance equals the brute-force k-NN covariance;
* estimate_normals(backend="pallas") matches backend="xla" normals (up to
  sign) except on the approximate tail;
* queries whose window holds fewer than k candidates are flagged
  unresolved and re-solved by the fallback (isolated-point cloud);
* geometric ground truth on plane surfaces.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_cloud_registration_tpu.ops.normals import (
    estimate_normals,
    normals_from_neighbors,
)
from point_cloud_registration_tpu.ops.pallas.knn_normals import (
    knn_moments_call,
    knn_moments_spec,
)
from point_cloud_registration_tpu.ops.pallas.point_align import (
    build_tile_tables,
    morton_layout,
    padded_point_capacity,
)
from point_cloud_registration_tpu.ops.pointgrid import build_packed_grid


@pytest.fixture(scope="module")
def scene():
    rng = np.random.RandomState(9)
    n = 12000
    floor = np.stack(
        [rng.rand(n // 2) * 15, rng.rand(n // 2) * 15, rng.randn(n // 2) * 0.01], 1
    )
    wall = np.stack(
        [
            rng.rand(n // 2) * 15,
            np.full(n // 2, 7.0) + rng.randn(n // 2) * 0.01,
            rng.rand(n // 2) * 4,
        ],
        1,
    )
    return np.vstack([floor, wall]).astype(np.float32)


def _run_kernel(pts, k, cell):
    pg = build_packed_grid(pts, cell, cap=32)
    spec = knn_moments_spec(pg)
    assert spec is not None
    n = len(pts)
    pos = morton_layout(spec, jnp.asarray(pts))
    n_cap = padded_point_capacity(spec, n)
    q_s = jnp.zeros((n_cap, 3), jnp.float32).at[pos].set(pts)
    w_s = jnp.zeros((n_cap,), jnp.float32).at[pos].set(1.0)
    keys, flags, tab = build_tile_tables(spec, pg, q_s, w_s)
    cov6, cnt, rk2, unres, exact = knn_moments_call(
        spec, k, keys, flags, tab, q_s, w_s, interpret=True
    )
    pos = np.asarray(pos)
    return (
        np.asarray(cov6)[pos],
        np.asarray(cnt)[pos],
        np.asarray(rk2)[pos],
        np.asarray(unres)[pos],
        np.asarray(exact)[pos],
    )


def _brute_cov6(pts, queries, k):
    d2 = ((queries[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    covs = []
    for qi, row in enumerate(idx):
        c = pts[row] - queries[qi]
        m = c.mean(0)
        m2 = (c[:, :, None] * c[:, None, :]).mean(0)
        cov = m2 - np.outer(m, m)
        covs.append(
            [cov[0, 0], cov[1, 1], cov[2, 2], cov[0, 1], cov[0, 2], cov[1, 2]]
        )
    return np.array(covs, np.float32), np.sqrt(
        np.sort(d2, axis=1)[:, k - 1]
    )


def test_exact_flag_matches_brute_force(scene):
    k = 10
    sub = scene[:2500]
    cov6, cnt, rk2, unres, exact = _run_kernel(sub, k, cell=0.4)
    ref_cov, ref_rk = _brute_cov6(sub, sub, k)
    assert exact.mean() > 0.9  # the scene is dense enough for the window
    sel = exact & ~unres
    # identical neighbor sets => identical covariances (f32 order tolerance)
    np.testing.assert_allclose(cov6[sel], ref_cov[sel], atol=5e-5)
    np.testing.assert_allclose(np.sqrt(rk2[sel]), ref_rk[sel], rtol=1e-4)
    assert np.all(cnt[sel] >= k)  # == k up to exact-distance ties


def test_backend_parity(scene):
    nx = np.asarray(estimate_normals(scene, k=15, backend="xla"))
    nf = np.asarray(estimate_normals(scene, k=15, backend="pallas"))
    assert np.abs(np.linalg.norm(nf, axis=1) - 1).max() < 1e-5
    dots = np.abs(np.sum(nx * nf, axis=1))
    assert (dots > 0.99).mean() > 0.95
    assert np.median(dots) > 0.999


def test_geometric_truth(scene):
    n2 = len(scene) // 2
    nf = np.asarray(estimate_normals(scene, k=15, backend="pallas"))
    assert np.median(np.abs(nf[:n2, 2])) > 0.99  # floor -> +-z
    assert np.median(np.abs(nf[n2:, 1])) > 0.99  # wall -> +-y


def test_isolated_points_unresolved_fallback():
    """A cloud with far-flung isolated points: their windows hold < k
    candidates -> unresolved -> XLA wide re-search still yields unit
    normals (no NaNs, no zero vectors)."""
    rng = np.random.RandomState(2)
    dense = rng.rand(3000, 3).astype(np.float32) * np.float32([5, 5, 0.02])
    lone = (rng.rand(20, 3).astype(np.float32) * 3 + np.float32([40, 40, 0]))
    pts = np.vstack([dense, lone]).astype(np.float32)
    cov6, cnt, rk2, unres, exact = _run_kernel(pts, 15, cell=0.15)
    assert unres[3000:].any()  # isolated points flagged
    nrm = np.asarray(estimate_normals(pts, k=15, backend="pallas"))
    assert np.isfinite(nrm).all()
    assert np.abs(np.linalg.norm(nrm, axis=1) - 1).max() < 1e-4


def test_count_is_k_without_ties(scene):
    k = 15
    cov6, cnt, rk2, unres, exact = _run_kernel(scene[:3000], k, cell=0.4)
    ok = ~unres
    # random coordinates: exact-distance ties are measure-zero
    assert np.all(cnt[ok] == k)


def test_wide_tail_raises_exact_fraction(scene):
    """The radius-4 tail tier must raise the provably-exact fraction and
    leave already-exact normals untouched."""
    nf_narrow, info_n = estimate_normals(
        scene, k=15, backend="pallas", exact_tail=False, return_info=True
    )
    nf_wide, info_w = estimate_normals(
        scene, k=15, backend="pallas", exact_tail=True, return_info=True
    )
    en = np.asarray(info_n["exact"])
    ew = np.asarray(info_w["exact"])
    assert ew.mean() > en.mean()
    # cap-truncated blocks (the dense wall at this scene's auto cell) are
    # never certified regardless of tier — the bound is honest, not 100%
    assert ew.mean() > 0.7
    # points exact in BOTH passes have identical neighbor sets -> same normal
    both = en & ew
    dots = np.abs(np.sum(np.asarray(nf_narrow) * np.asarray(nf_wide), axis=1))
    assert dots[both].min() > 1 - 1e-5


def test_miss_never_certified_exact(scene):
    """A query whose probe window touches a key dropped by cb overflow has
    only PART of its provable window consulted — it must be unresolved and
    never certified exact, even when the remaining candidates reach k
    within the exactness radius (exact is a lower-bound certificate)."""
    del scene
    # a long dense line: a 2048-query tile covers ~102 m of line, whose
    # window key set (x-blocks x yz neighbors) far exceeds cb=128 -> every
    # tile's key list overflows, while the 0.05 m spacing keeps the k-set
    # within the certification radius (2 * cell = 0.5 m) wherever no key
    # was dropped — exactly the miss & would-certify combination
    rng = np.random.RandomState(11)
    n = 12000
    pts = np.stack(
        [
            np.arange(n, dtype=np.float32) * 0.05,
            rng.randn(n).astype(np.float32) * 0.02,
            rng.randn(n).astype(np.float32) * 0.02,
        ],
        axis=1,
    )
    pg = build_packed_grid(pts, 0.25, cap=32)
    spec = knn_moments_spec(pg, tq=2048, cb=128)  # tiny key list: overflow
    assert spec is not None
    n = len(pts)
    pos = morton_layout(spec, jnp.asarray(pts))
    n_cap = padded_point_capacity(spec, n)
    q_s = jnp.zeros((n_cap, 3), jnp.float32).at[pos].set(pts)
    w_s = jnp.zeros((n_cap,), jnp.float32).at[pos].set(1.0)
    keys, flags, tab = build_tile_tables(spec, pg, q_s, w_s)
    _, _, _, unres, exact = knn_moments_call(
        spec, 15, keys, flags, tab, q_s, w_s, interpret=True
    )
    live = np.asarray(w_s) > 0
    un = np.asarray(unres)[live]
    ex = np.asarray(exact)[live]
    assert un.sum() > 0, "cb=128 did not overflow; shrink cb"
    # the certificate never fires on a partially-consulted window
    assert not (ex & un).any()


def test_cap_truncation_never_certified_exact():
    """A block holding far more than the pack cap: its queries' k-sets are
    silently truncated, so the kernel must NOT flag them provably exact
    (the 'exact' fraction is a public claim — it may under-, never
    over-state)."""
    rng = np.random.RandomState(4)
    # 500 points crammed into one ~0.2m ball: every packed block (cap 32)
    # in that region overflows
    clump = (rng.randn(500, 3) * 0.05).astype(np.float32)
    # dense sheet: k-NN radii well under the provable bound away from the clump
    spread = (rng.rand(4000, 3) * np.float32([8, 8, 0.2])).astype(np.float32)
    pts = np.vstack([clump, spread + np.float32([4, 4, 0])]).astype(np.float32)
    cov6, cnt, rk2, unres, exact = _run_kernel(pts, 10, cell=0.3)
    # the clump's blocks are truncated -> none of its queries certified
    assert not exact[:500].any()
    # but the spread region still certifies normally
    assert exact[500:].mean() > 0.7


def test_dense_build_matches_per_tile_build(scene):
    """build_tile_tables_dense (one aligned gather from the dense fused-row
    table) must reproduce build_tile_tables' lists/over/tab exactly — same
    planar layout, same sub-block order, same sentinels."""
    from point_cloud_registration_tpu.ops.pallas.point_align import (
        build_fused_rows,
        build_tile_tables_dense,
    )

    pts = scene[:5000]
    pg = build_packed_grid(pts, 0.4, cap=32)
    for radius, cb in ((2, 256), (4, 384)):
        spec = knn_moments_spec(pg, radius=radius, tq=128, cb=cb)
        n = len(pts)
        pos = morton_layout(spec, jnp.asarray(pts))
        n_cap = padded_point_capacity(spec, n)
        q_s = jnp.zeros((n_cap, 3), jnp.float32).at[pos].set(pts)
        w_s = jnp.zeros((n_cap,), jnp.float32).at[pos].set(1.0)
        keys_o, over_o, tab_o = build_tile_tables(spec, pg, q_s, w_s)
        ftab, fover = build_fused_rows(spec, pg)
        keys_d, over_d, tab_d = build_tile_tables_dense(
            spec, ftab, fover, q_s, w_s
        )
        np.testing.assert_array_equal(np.asarray(keys_o), np.asarray(keys_d))
        np.testing.assert_array_equal(np.asarray(over_o), np.asarray(over_d))
        np.testing.assert_array_equal(np.asarray(tab_o), np.asarray(tab_d))
