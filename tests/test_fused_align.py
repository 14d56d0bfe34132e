"""Fused Pallas align kernel vs the XLA oracles (interpret mode on CPU).

The kernel (ops/pallas/fused_align.py) replaces the align hot path of the
voxel-map solvers; every stats block it produces must match the existing
gather-based XLA path, and the end-to-end fused align must reproduce the
XLA align's transform. One code path runs everywhere: compiled on TPU,
interpreted here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_cloud_registration_tpu.core.se3 import makeRt, transform_points
from point_cloud_registration_tpu.models._fused import fused_voxel_align
from point_cloud_registration_tpu.ops.pallas.fused_align import (
    FusedSpec,
    fused_stats_call,
    band_layout,
    planar_window_query,
    scatter_banded,
    voxel_fused_spec,
)
from point_cloud_registration_tpu.ops.knn import DENSE_BLOCK, brute_force_nn
from point_cloud_registration_tpu.ops.reduce import ndt_stats, plane_stats
from point_cloud_registration_tpu.ops.voxelize import (
    build_voxel_map,
    query_nearest_voxel,
)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.RandomState(0)
    centers = rng.rand(60, 3) * 18
    pts = (centers[:, None, :] + rng.randn(60, 80, 3) * 0.5).reshape(-1, 3)
    pts = pts.astype(np.float32)
    scan = pts[rng.choice(len(pts), 1500, replace=False)] + np.float32(
        [0.05, -0.03, 0.08]
    )
    return pts, scan


def _sorted_inputs(spec, scan, T):
    q = transform_points(T, jnp.asarray(scan))
    pos = band_layout(spec, q)
    return scatter_banded(
        spec, pos, q, jnp.asarray(scan), jnp.ones((len(scan),), jnp.float32)
    )


def test_fused_plane_stats_match_oracle(scene):
    pts, scan = scene
    vm = build_voxel_map(pts, 1.0, min_points=5, rich="normals")
    spec = voxel_fused_spec(vm, "plane", max_dist=2.0, tq=256)
    assert spec is not None
    T = jnp.eye(4, dtype=jnp.float32)
    q_s, p_s, w_s = _sorted_inputs(spec, scan, T)
    R, _ = makeRt(T)
    C, unres = fused_stats_call(
        spec, vm.dense_blocks, q_s, p_s, w_s, R.reshape(9),
        interpret=True,
    )
    C = np.asarray(C)
    nn = query_nearest_voxel(vm, q_s, voxel_size=1.0, max_dist=2.0)
    w = w_s * (nn.dist < 2.0) * (nn.idx >= 0) * (~np.asarray(unres))
    safe = jnp.clip(nn.idx, 0, vm.means.shape[0] - 1)
    st = plane_stats(p_s, q_s, vm.means[safe], vm.normals[safe], w, R)
    scale = np.abs(np.asarray(st.H)).max()
    np.testing.assert_allclose(C[:6, :6] / scale, np.asarray(st.H) / scale, atol=1e-6)
    np.testing.assert_allclose(C[:6, 6], np.asarray(st.g), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(C[6, 6], float(st.e2), rtol=1e-4)
    assert C[7, 7] == float(st.n_inliers)


def test_fused_ndt_stats_match_oracle(scene):
    pts, scan = scene
    vm = build_voxel_map(pts, 1.0, min_points=5, with_icov=True, rich="sqrt_icov")
    spec = voxel_fused_spec(vm, "ndt", max_dist=2.0, tq=256)
    T = jnp.eye(4, dtype=jnp.float32)
    q_s, p_s, w_s = _sorted_inputs(spec, scan, T)
    R, _ = makeRt(T)
    C, unres = fused_stats_call(
        spec, vm.dense_blocks, q_s, p_s, w_s, R.reshape(9),
        interpret=True,
    )
    C = np.asarray(C)
    nn = query_nearest_voxel(vm, q_s, voxel_size=1.0, max_dist=2.0)
    w = w_s * (nn.dist < 2.0) * (nn.idx >= 0) * (~np.asarray(unres))
    safe = jnp.clip(nn.idx, 0, vm.means.shape[0] - 1)
    st = ndt_stats(p_s, q_s, vm.means[safe], vm.icovs[safe], w, R)
    # whitened (U^T U) vs direct icov: equal up to Cholesky rounding
    scale = np.abs(np.asarray(st.H)).max()
    np.testing.assert_allclose(C[:6, :6] / scale, np.asarray(st.H) / scale, atol=1e-4)
    gs = np.abs(np.asarray(st.g)).max()
    np.testing.assert_allclose(C[:6, 6] / gs, np.asarray(st.g) / gs, atol=1e-4)
    np.testing.assert_allclose(C[6, 6], float(st.e2), rtol=1e-3)
    assert C[7, 7] == float(st.n_inliers)


def test_planar_window_query_exact(scene):
    pts, _ = scene
    vm = build_voxel_map(pts, 1.0, min_points=5, rich="normals")
    spec = voxel_fused_spec(vm, "plane", max_dist=2.0, tq=256)
    rng = np.random.RandomState(3)
    q = (pts[rng.choice(len(pts), 300)] + rng.randn(300, 3) * 0.5).astype(np.float32)
    d, tgt, feats = planar_window_query(spec, vm.dense_blocks, jnp.asarray(q))
    ref = brute_force_nn(jnp.asarray(q), vm.means, vm.valid)
    d_np = np.asarray(d)
    ref_d = np.asarray(ref.dist)
    gated = ref_d < 2.0
    np.testing.assert_allclose(d_np[gated], ref_d[gated], atol=1e-4)
    # matched coordinates = the true nearest valid centroid
    np.testing.assert_allclose(
        np.asarray(tgt)[gated],
        np.asarray(vm.means)[np.asarray(ref.idx)[gated]],
        atol=1e-5,
    )


@pytest.mark.parametrize("kind", ["plane", "ndt"])
def test_fused_align_matches_xla_align(scene, kind):
    from point_cloud_registration_tpu.core.config import NDTConfig, VPlaneICPConfig
    from point_cloud_registration_tpu.models.ndt import ndt_align
    from point_cloud_registration_tpu.models.voxelized_plane_icp import vplane_align

    pts, scan = scene
    if kind == "plane":
        cfg = VPlaneICPConfig(voxel_size=1.0, min_points=5)
        vm = build_voxel_map(pts, 1.0, min_points=5, rich="normals")
        xla = vplane_align
    else:
        cfg = NDTConfig(voxel_size=1.0, min_points=5)
        vm = build_voxel_map(pts, 1.0, min_points=5, with_icov=True, rich="sqrt_icov")
        xla = ndt_align
    spec = voxel_fused_spec(vm, kind, max_dist=cfg.max_dist, tq=256)
    w = jnp.ones((len(scan),), jnp.float32)
    init_T = jnp.eye(4, dtype=jnp.float32)
    T_f, diag_f = fused_voxel_align(vm, scan, w, init_T, cfg, spec, interpret=True)
    res = xla(vm, jnp.asarray(scan), w, init_T, cfg)
    np.testing.assert_allclose(np.asarray(T_f), np.asarray(res.T), atol=2e-4)
    # same convergence behavior and iteration count as the XLA path (this
    # scene oscillates between two voxel assignments near tol — both paths
    # must agree on that trajectory, not hide it)
    assert bool(diag_f.converged) == bool(res.diagnostics.converged)
    assert int(diag_f.iterations) == int(res.diagnostics.iterations)


def test_fused_align_with_region_stragglers(scene):
    """A deliberately tiny region forces Morton-seam misses; the compacted
    fallback must keep the result identical to the XLA align."""
    from point_cloud_registration_tpu.core.config import VPlaneICPConfig
    from point_cloud_registration_tpu.models.voxelized_plane_icp import vplane_align

    pts, scan = scene
    cfg = VPlaneICPConfig(voxel_size=1.0, min_points=5)
    vm = build_voxel_map(pts, 1.0, min_points=5, rich="normals")
    base = voxel_fused_spec(vm, "plane", max_dist=2.0, tq=256)
    spans = base.spans
    tiny = tuple(min(s, nb) for s, nb in zip(spans, base.nb_dims))
    spec = FusedSpec(
        kind="plane", cell=base.cell, origin_cell=base.origin_cell,
        block=DENSE_BLOCK, nb_dims=base.nb_dims, ncand=base.ncand,
        radius=base.radius, region=tiny, tq=256, max_dist=2.0,
    )
    w = jnp.ones((len(scan),), jnp.float32)
    init_T = jnp.eye(4, dtype=jnp.float32)
    # confirm the tiny region actually produces unresolved queries
    q_s, p_s, w_s = _sorted_inputs(spec, scan, init_T)
    R = jnp.eye(3, dtype=jnp.float32)
    _, unres = fused_stats_call(
        spec, vm.dense_blocks, q_s, p_s, w_s, R.reshape(9),
        interpret=True,
    )
    assert int(np.asarray(unres).sum()) > 0
    T_f, diag_f = fused_voxel_align(vm, scan, w, init_T, cfg, spec, interpret=True)
    res = vplane_align(vm, jnp.asarray(scan), w, init_T, cfg)
    np.testing.assert_allclose(np.asarray(T_f), np.asarray(res.T), atol=5e-4)


def test_fused_backend_via_solver_class(scene):
    """backend="pallas" routes the class shim through the fused path off-TPU."""
    from point_cloud_registration_tpu import VPlaneICP

    pts, scan = scene
    vp = VPlaneICP(voxel_size=1.0)
    vp.cfg = vp.cfg.__class__(**{**vp.cfg.__dict__, "backend": "pallas", "min_points": 5})
    vp.set_target(pts)
    assert vp._spec is not None
    T = vp.align(scan)
    ref = VPlaneICP(voxel_size=1.0)
    ref.cfg = ref.cfg.__class__(**{**ref.cfg.__dict__, "backend": "xla", "min_points": 5})
    ref.set_target(pts)
    T_ref = ref.align(scan)
    np.testing.assert_allclose(T, T_ref, atol=2e-4)


def test_fused_batched_matches_per_problem(scene):
    """The batched kernel-stream aligner must reproduce each problem's
    per-problem fused align exactly: same transforms, iteration counts,
    convergence flags."""
    from point_cloud_registration_tpu.core.config import VPlaneICPConfig
    from point_cloud_registration_tpu.models._fused import (
        fused_voxel_align,
        fused_voxel_align_batched,
    )

    pts, scan = scene
    cfg = VPlaneICPConfig(voxel_size=1.0, min_points=5)
    vm = build_voxel_map(pts, 1.0, min_points=5, rich="normals")
    spec = voxel_fused_spec(vm, "plane", max_dist=cfg.max_dist, tq=256)
    rng = np.random.RandomState(7)
    B, n = 3, 500
    sources = np.stack(
        [pts[rng.choice(len(pts), n, replace=False)] + off
         for off in ([0.04, -0.02, 0.06], [-0.03, 0.05, 0.02], [0.0, 0.0, 0.1])]
    ).astype(np.float32)
    weights = jnp.ones((B, n), jnp.float32)
    init_Ts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))

    Ts_b, diag_b = fused_voxel_align_batched(
        vm, jnp.asarray(sources), weights, init_Ts, cfg, spec, interpret=True
    )
    for b in range(B):
        T_1, diag_1 = fused_voxel_align(
            vm, sources[b], weights[b], jnp.eye(4, dtype=jnp.float32), cfg,
            spec, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(Ts_b)[b], np.asarray(T_1), atol=1e-5
        )
        assert int(diag_b.iterations[b]) == int(diag_1.iterations)
        assert bool(diag_b.converged[b]) == bool(diag_1.converged)


def test_fused_batched_ndt(scene):
    """Batched stream parity for the whitened (NDT) kind."""
    from point_cloud_registration_tpu.core.config import NDTConfig
    from point_cloud_registration_tpu.models._fused import (
        fused_voxel_align,
        fused_voxel_align_batched,
    )

    pts, scan = scene
    cfg = NDTConfig(voxel_size=1.0, min_points=5)
    vm = build_voxel_map(pts, 1.0, min_points=5, with_icov=True, rich="sqrt_icov")
    spec = voxel_fused_spec(vm, "ndt", max_dist=cfg.max_dist, tq=256)
    rng = np.random.RandomState(11)
    B, n = 2, 400
    sources = np.stack(
        [pts[rng.choice(len(pts), n, replace=False)] + off
         for off in ([0.03, -0.04, 0.05], [-0.02, 0.02, 0.08])]
    ).astype(np.float32)
    weights = jnp.ones((B, n), jnp.float32)
    init_Ts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    Ts_b, diag_b = fused_voxel_align_batched(
        vm, jnp.asarray(sources), weights, init_Ts, cfg, spec, interpret=True
    )
    for b in range(B):
        T_1, diag_1 = fused_voxel_align(
            vm, sources[b], weights[b], jnp.eye(4, dtype=jnp.float32), cfg,
            spec, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(Ts_b)[b], np.asarray(T_1), atol=1e-5)
        assert int(diag_b.iterations[b]) == int(diag_1.iterations)


def test_bf16x3_split_lossless():
    """The kernel's 3-way bf16 split must reconstruct f32 bit-for-bit
    (the exactness premise of the one-hot gather fast path)."""
    rng = np.random.RandomState(0)
    for scale in (1.0, 1e-3, 300.0, 1e6):
        v = jnp.asarray((rng.randn(20000) * scale).astype(np.float32))
        hi = v.astype(jnp.bfloat16)
        r1 = v - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        rec = (
            hi.astype(jnp.float32)
            + mid.astype(jnp.float32)
            + lo.astype(jnp.float32)
        )
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(v))
