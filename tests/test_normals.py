import numpy as np
import jax
import pytest

from point_cloud_registration_tpu import estimate_normals, estimate_norm_with_tree, get_norm_lines
from oracles import knn_np, make_scene, pca_normal_np


def test_normals_match_knn_pca_oracle():
    rng = np.random.RandomState(21)
    pts = make_scene(rng, n_floor=2000, n_wall=800)
    k = 15
    ours = estimate_normals(pts, k=k)
    _, idx = knn_np(pts, pts, k=k)
    ref = np.stack([pca_normal_np(pts[idx[i]]) for i in range(len(pts))])
    cos = np.abs(np.sum(ours * ref, axis=-1))
    # grid k-NN is approximate in the tail; the overwhelming majority of
    # normals must agree with the exact-kd-tree PCA oracle
    assert np.quantile(cos, 0.05) > 0.99, np.quantile(cos, 0.05)
    assert np.median(cos) > 0.9999


def test_normals_planar_scene_axis_aligned():
    rng = np.random.RandomState(22)
    # pure floor: all normals ~ +-z
    pts = np.stack(
        [rng.rand(3000) * 10, rng.rand(3000) * 10, rng.randn(3000) * 0.01], axis=1
    ).astype(np.float32)
    n = estimate_normals(pts, k=15)
    assert np.quantile(np.abs(n[:, 2]), 0.02) > 0.999


def test_normals_far_from_origin_stable():
    """The reference's raw-moment accumulation cancels catastrophically far
    from the origin (estimate_normals.py:50-63, float32); our centered
    formulation must not (module docstring of ops/normals.py)."""
    rng = np.random.RandomState(23)
    pts = np.stack(
        [rng.rand(3000) * 10 + 5000, rng.rand(3000) * 10 - 8000, rng.randn(3000) * 0.01],
        axis=1,
    ).astype(np.float32)
    n = estimate_normals(pts, k=15)
    assert np.all(np.isfinite(n))
    assert np.quantile(np.abs(n[:, 2]), 0.05) > 0.99


def test_estimate_norm_with_tree_parity_wrapper():
    rng = np.random.RandomState(24)
    pts = make_scene(rng, n_floor=500, n_wall=200)
    a = estimate_normals(pts, k=10)
    b = estimate_norm_with_tree(pts, None, k=10)
    cos = np.abs(np.sum(a * b, axis=-1))
    assert np.median(cos) > 0.9999


def test_get_norm_lines_structure():
    pts = np.zeros((4, 3), np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (4, 1))
    lines = get_norm_lines(pts, nrm, length=0.5)
    assert lines.shape == (8, 3)
    np.testing.assert_allclose(lines[::2], pts)
    np.testing.assert_allclose(lines[1::2], pts + nrm * 0.5)


def test_estimate_norm_with_tree_honors_injected_tree():
    """An injected tree is queried, not ignored (estimate_normals.py:27-40
    contract): with a tree over the same cloud the result matches the exact
    kd-tree PCA oracle; the indices provably come from the TREE because a
    tree over a rigidly shifted copy changes the output."""
    from point_cloud_registration_tpu import KDTree

    rng = np.random.RandomState(25)
    pts = make_scene(rng, n_floor=600, n_wall=300)
    k = 10
    tree = KDTree(pts)
    ours = estimate_norm_with_tree(pts, tree, k=k)
    _, idx = knn_np(pts, pts, k=k)
    ref = np.stack([pca_normal_np(pts[idx[i]]) for i in range(len(pts))])
    cos = np.abs(np.sum(ours * ref, axis=-1))
    assert np.median(cos) > 0.9999

    # a tree over different points must change the neighbor sets
    shifted = pts + np.float32([50.0, 0.0, 0.0])
    other = estimate_norm_with_tree(pts, KDTree(shifted), k=k)
    assert not np.allclose(ours, other)
