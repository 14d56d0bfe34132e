"""Pallas kernel tests (run through the interpreter on the CPU mesh; the
same code path compiles with Mosaic on TPU — validated by the TPU bench)."""

import numpy as np
import jax
import jax.numpy as jnp

from point_cloud_registration_tpu.ops.pallas import exact_nn_pallas
from oracles import knn_np


def test_exact_nn_matches_kdtree():
    rng = np.random.RandomState(0)
    ref = (rng.rand(3000, 3) * 10).astype(np.float32)
    q = (rng.rand(777, 3) * 10).astype(np.float32)
    d, i = exact_nn_pallas(q, ref)
    d_ref, i_ref = knn_np(ref, q, k=1)
    np.testing.assert_allclose(np.asarray(d), d_ref[:, 0], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i), i_ref[:, 0])


def test_exact_nn_ragged_sizes():
    # non-multiples of the tile sizes exercise the padding path
    rng = np.random.RandomState(1)
    ref = (rng.rand(513, 3)).astype(np.float32)
    q = (rng.rand(300, 3)).astype(np.float32)
    d, i = exact_nn_pallas(q, ref)
    d_ref, i_ref = knn_np(ref, q, k=1)
    np.testing.assert_allclose(np.asarray(d), d_ref[:, 0], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), i_ref[:, 0])


def test_exact_nn_single_ref_point():
    q = np.zeros((10, 3), np.float32)
    ref = np.ones((1, 3), np.float32)
    d, i = exact_nn_pallas(q, ref)
    np.testing.assert_allclose(np.asarray(d), np.sqrt(3.0), atol=1e-5)
    assert np.all(np.asarray(i) == 0)
