"""API-surface parity with the reference public exports
(/root/reference/point_cloud_registration/__init__.py:1-10 — SURVEY §2 C13:
"the parity checklist for the new framework's API")."""

import numpy as np
import pytest

import point_cloud_registration_tpu as pcr

REFERENCE_EXPORTS = [
    # registration
    "Registration",
    "ICP",
    "PlaneICP",
    "VPlaneICP",
    "NDT",
    # math_tools
    "makeRt",
    "expSO3",
    "makeT",
    "skews",
    "huber_weight",
    "plus",
    "transform_points",
    "skew_time_vector",
    # indexing / maps
    "KDTree",
    "VoxelGrid",
    "voxel_filter",
    "color_by_voxel",
    # normals
    "estimate_normals",
    "get_norm_lines",
    "estimate_norm_with_tree",
    # coresets
    "fast_caratheodory",
    "create_gn_set",
]


@pytest.mark.parametrize("name", REFERENCE_EXPORTS)
def test_reference_export_present(name):
    assert hasattr(pcr, name), f"missing reference API export: {name}"


def test_solver_constructor_signatures():
    # reference default hyperparameters (icp.py:13, plane_icp.py:14,
    # voxelized_plane_icp.py:13, ndt.py:13, registration.py:11)
    icp = pcr.ICP()
    assert (icp.max_iter, icp.max_dist, icp.tol) == (30, 2, 1e-3)
    picp = pcr.PlaneICP()
    assert (picp.max_iter, picp.max_dist, picp.tol, picp.k) == (30, 2, 1e-3, 15)
    vp = pcr.VPlaneICP()
    assert (vp.voxel_size, vp.max_iter, vp.max_dist, vp.tol) == (1.0, 30, 2, 1e-3)
    ndt = pcr.NDT()
    assert (ndt.voxel_size, ndt.max_iter, ndt.max_dist, ndt.tol) == (1.0, 30, 2, 1e-3)
    fast = pcr.FastVPlaneICP(voxel_size=1.0)
    assert fast.N_target == 1024


def test_update_target_unimplemented():
    # declared-but-unimplemented in the reference too (registration.py:36-43)
    with pytest.raises(NotImplementedError):
        pcr.ICP().update_target(np.zeros((3, 3)))


def test_numpy_in_numpy_out():
    rng = np.random.RandomState(0)
    target = rng.rand(500, 3).astype(np.float32) * 5
    icp = pcr.ICP(max_iter=5)
    icp.set_target(target)
    T = icp.align(target + np.float32(0.01))
    assert isinstance(T, np.ndarray)
    assert T.shape == (4, 4)
    assert T.dtype == np.float64  # reference returns float64 (init_T @ f64 updates)


def test_pcd_io_roundtrip(tmp_path):
    from point_cloud_registration_tpu.utils import read_pcd, write_pcd

    pts = np.random.RandomState(1).rand(100, 3).astype(np.float32)
    p = str(tmp_path / "t.pcd")
    write_pcd(p, pts)
    rec = read_pcd(p)
    np.testing.assert_allclose(rec["xyz"], pts, atol=0)
    p2 = str(tmp_path / "a.pcd")
    write_pcd(p2, pts, binary=False)
    rec2 = read_pcd(p2)
    np.testing.assert_allclose(rec2["xyz"], pts, atol=1e-5)


def test_native_pcd_reader_matches_numpy(tmp_path):
    """The C++ fast path (native/pcd_io.cpp) must agree bit-for-bit with the
    NumPy parser; skips cleanly where no compiler is available."""
    from point_cloud_registration_tpu import native
    from point_cloud_registration_tpu.utils import read_pcd_xyz, write_pcd

    pts = (np.random.RandomState(2).rand(5000, 3) * 50).astype(np.float32)
    p = str(tmp_path / "n.pcd")
    write_pcd(p, pts)
    out = read_pcd_xyz(p)
    np.testing.assert_array_equal(out, pts)
    if native.load() is None:
        pytest.skip("native library unavailable (no compiler)")


def test_empty_cloud_clear_error():
    with pytest.raises(ValueError, match="empty point cloud"):
        pcr.VPlaneICP(1.0).set_target(np.zeros((0, 3), np.float32))


def test_huber_constructor_kwarg():
    icp = pcr.ICP(huber_delta=0.5)
    assert icp.cfg.huber_delta == 0.5
    ndt = pcr.NDT(huber_delta=0.3)
    assert ndt.cfg.huber_delta == 0.3
