"""Exactness of the compat shims vs scipy's kd-tree (VERDICT round-1 item 7).

The reference's KDTree contract (kdtree.py:18-68) and VoxelGrid.query
(voxel.py:171-179) are *unbounded exact* nearest-neighbor searches; the grid
windows here are fast paths whose escape hatches must restore exactness on
sparse clouds, far queries, and large k.
"""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from point_cloud_registration_tpu.compat import NeighborIndex, VoxelGrid


@pytest.fixture
def sparse_cloud():
    rng = np.random.RandomState(7)
    # two well-separated clusters plus isolated outliers -> plenty of sparse
    # regions where a one-cell window cannot cover the true neighbor
    a = rng.randn(3000, 3) * 0.5
    b = rng.randn(3000, 3) * 0.5 + np.array([25.0, 0.0, 0.0])
    outliers = rng.rand(50, 3) * 60 - 15
    return np.vstack([a, b, outliers]).astype(np.float32)


def test_neighbor_index_1nn_matches_scipy_far_queries(sparse_cloud):
    rng = np.random.RandomState(8)
    # queries both near the data and far away (>2 cells from anything)
    q = np.vstack(
        [
            sparse_cloud[rng.choice(len(sparse_cloud), 200)] + rng.randn(200, 3) * 0.1,
            rng.rand(50, 3) * 100 - 20,
        ]
    ).astype(np.float32)
    idx_tree = NeighborIndex(sparse_cloud)
    d, i = idx_tree.query(q)
    ref_d, ref_i = cKDTree(sparse_cloud.astype(np.float64)).query(q.astype(np.float64))
    np.testing.assert_allclose(d, ref_d, rtol=1e-4, atol=1e-4)
    # indices may differ only at exact ties
    mismatch = i != ref_i
    if mismatch.any():
        np.testing.assert_allclose(
            np.linalg.norm(q[mismatch] - sparse_cloud[i[mismatch]], axis=-1),
            ref_d[mismatch],
            rtol=1e-4,
            atol=1e-4,
        )


def test_neighbor_index_k30_matches_scipy(sparse_cloud):
    rng = np.random.RandomState(9)
    q = sparse_cloud[rng.choice(len(sparse_cloud), 128)].astype(np.float32)
    idx_tree = NeighborIndex(sparse_cloud)
    d, i = idx_tree.query(q, k=30)  # k far beyond the sampled window coverage
    ref_d, _ = cKDTree(sparse_cloud.astype(np.float64)).query(q.astype(np.float64), k=30)
    np.testing.assert_allclose(d, ref_d, rtol=1e-4, atol=1e-4)


def test_voxelgrid_query_far_points_get_true_nearest(sparse_cloud):
    vg = VoxelGrid(1.0, min_points=1)
    vg.set_points(sparse_cloud)
    # far queries: >2 m (the old hardcoded cap) from every voxel
    q = np.array([[60.0, 60.0, 60.0], [-30.0, 5.0, 0.0]], np.float32)
    out = vg.query(q, ["mean"])
    assert np.all(np.isfinite(out["dist"])), "far queries must fall back to exact search"
    # verify against brute force over the compacted valid means
    means = vg.mean
    ref = np.linalg.norm(q[:, None, :] - means[None], axis=-1).min(axis=1)
    np.testing.assert_allclose(out["dist"], ref, rtol=1e-4, atol=1e-4)


def test_voxelgrid_query_caller_max_dist(sparse_cloud):
    vg = VoxelGrid(1.0, min_points=1, query_max_dist=6.0)
    vg.set_points(sparse_cloud)
    rng = np.random.RandomState(10)
    q = (sparse_cloud[rng.choice(len(sparse_cloud), 100)] + rng.randn(100, 3)).astype(
        np.float32
    )
    out = vg.query(q, ["mean", "norm"], max_dist=4.0)
    means = vg.mean
    ref = np.linalg.norm(q[:, None, :] - means[None], axis=-1).min(axis=1)
    np.testing.assert_allclose(out["dist"], ref, rtol=1e-4, atol=1e-4)
