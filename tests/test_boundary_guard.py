"""Regression tests for the float32/float64 bbox-boundary hazard.

The grid bounding box is computed with host float64 division while device
keys use float32; near a cell boundary they can disagree by one cell, and an
unguarded linear key then wraps into an unrelated voxel/block (advisor
finding, round 1: point x=30.2553 with cell_size=0.88986 lands in cell 34 on
device vs hi_cell 33 on host and corrupted another voxel's stats).
"""

import numpy as np
import jax
import jax.numpy as jnp

from point_cloud_registration_tpu.ops import voxelize, hashgrid, pointgrid

# The advisor's reproducer: p / cell_size sits within ~1 ULP of an integer.
_CELL = 0.88986
_ADVERSARIAL_X = 30.2553


def _cloud_with_boundary_point():
    rng = np.random.RandomState(3)
    pts = (rng.rand(4000, 3) * 30).astype(np.float32)
    pts[0] = [_ADVERSARIAL_X, 0.94, 0.05]
    # make x=30.2553 the max so the host bbox ends exactly at its cell edge
    pts[1:, 0] = np.minimum(pts[1:, 0], 30.0)
    return pts


def test_dense_voxel_build_no_boundary_corruption():
    pts = _cloud_with_boundary_point()
    vm = voxelize.build_voxel_map(pts, _CELL, min_points=1)
    counts = np.asarray(jax.device_get(vm.counts))
    means = np.asarray(jax.device_get(vm.means))
    # every occupied voxel's mean must lie inside (or within float noise of)
    # its own cell — a wrapped boundary key would plant a far-away mean
    occ = counts > 0
    slots = np.where(occ)[0]
    dims = np.asarray(jax.device_get(vm.grid.dims))
    origin = np.asarray(jax.device_get(vm.grid.origin_cell))
    keys = np.asarray(jax.device_get(vm.grid.keys))[slots]
    cx = keys % dims[0] + origin[0]
    cy = (keys // dims[0]) % dims[1] + origin[1]
    cz = keys // (dims[0] * dims[1]) + origin[2]
    lo = np.stack([cx, cy, cz], axis=-1) * _CELL
    m = means[slots]
    assert np.all(m >= lo - 1e-3), "voxel mean below its cell floor (wrapped key)"
    assert np.all(m <= lo + _CELL + 1e-3), "voxel mean above its cell ceiling"
    # the boundary point is either correctly binned or dropped — total count
    # may lose at most the adversarial point
    assert counts.sum() in (len(pts), len(pts) - 1)


def test_sparse_grid_build_boundary_point_unreachable_not_corrupting():
    pts = _cloud_with_boundary_point()
    # force the sparse (unique/searchsorted) path via a tiny dense budget
    grid, inverse, _ = hashgrid.build_grid(pts, _CELL, dense_budget=1)
    assert grid.dense is None
    keys = np.asarray(jax.device_get(grid.keys))
    n_cells = int(jax.device_get(grid.n_cells))
    # no negative key may have become a real occupied slot
    assert np.all(keys[:n_cells] >= 0)


def test_packed_grid_boundary_point_not_wrapped():
    pts = _cloud_with_boundary_point()
    pg = pointgrid.build_packed_grid(pts, _CELL, cap=32)
    # query every original point: each must find itself (dist 0) or, for the
    # dropped boundary point, at worst a near neighbor — never a wrong match
    nn = pointgrid.nearest_point_packed(pg, jnp.asarray(pts))
    d = np.asarray(jax.device_get(nn.dist))
    assert np.all(d[1:] < 1e-5), "in-range points must find themselves"
    # the adversarial point either found itself or was dropped (inf/far)
    assert d[0] < 1e-5 or not d[0] < _CELL


def test_read_pcd_truncated_header_raises(tmp_path):
    import pytest

    from point_cloud_registration_tpu.utils import io

    bad = tmp_path / "truncated.pcd"
    bad.write_bytes(b"# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\n")  # no DATA line
    with pytest.raises(ValueError, match="DATA"):
        io.read_pcd(str(bad))
