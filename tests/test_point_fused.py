"""Fused point-align kernel (ops/pallas/point_align.py) vs the XLA path.

Interpret mode on CPU; the same program compiles on TPU. Contracts under
test (mirroring the reference's fused-vs-naive pattern, SURVEY §4):

* kernel-resolved queries reproduce the packed tier-1 matches EXACTLY
  (same candidate tables, same truncation — models/_point_corr semantics);
* the unresolved mask equals tier-1's not-provably-exact set at layout time;
* end-to-end fused ICP / PlaneICP aligns match the gather-path transforms;
* straggler-heavy starts (offset > cell_fine) converge identically;
* the solver classes route backend="pallas" through the kernel.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_cloud_registration_tpu.core.config import (
    CorrespondenceConfig,
    ICPConfig,
    PlaneICPConfig,
)
from point_cloud_registration_tpu.core.se3 import makeRt, transform_points
from point_cloud_registration_tpu.models._point_fused import fused_point_align
from point_cloud_registration_tpu.models.icp import build_icp_target, icp_align
from point_cloud_registration_tpu.models.plane_icp import (
    build_plane_icp_target,
    plane_icp_align,
)
from point_cloud_registration_tpu.ops.pallas.point_align import (
    build_tile_tables,
    morton_layout,
    padded_point_capacity,
    point_fused_spec,
    point_stats_call,
)
from point_cloud_registration_tpu.ops.pointgrid import nearest_point_packed
from point_cloud_registration_tpu.ops.reduce import plane_stats, point_stats

PACKED = CorrespondenceConfig(method="packed")


@pytest.fixture(scope="module")
def scene():
    rng = np.random.RandomState(3)
    n = 24000
    floor = np.stack(
        [rng.rand(n // 2) * 30, rng.rand(n // 2) * 30, rng.randn(n // 2) * 0.02], 1
    )
    wall = np.stack(
        [
            rng.rand(n // 2) * 30,
            np.full(n // 2, 15.0) + rng.randn(n // 2) * 0.02,
            rng.rand(n // 2) * 6,
        ],
        1,
    )
    pts = np.vstack([floor, wall]).astype(np.float32)
    idx = rng.choice(n, 4000, replace=False)
    scan = (
        pts[idx]
        + np.float32([0.08, -0.06, 0.1])
        + rng.randn(4000, 3).astype(np.float32) * 0.004
    ).astype(np.float32)
    return pts, scan


def _tiled(spec, target, scan, T):
    q0 = transform_points(T, jnp.asarray(scan))
    pos = morton_layout(spec, q0)
    n_cap = padded_point_capacity(spec, len(scan))
    src_s = jnp.zeros((n_cap, 3), jnp.float32).at[pos].set(jnp.asarray(scan))
    w_s = jnp.zeros((n_cap,), jnp.float32).at[pos].set(1.0)
    q_s = transform_points(T, src_s)
    keys, _, tab = build_tile_tables(spec, target.packed, q_s, w_s)
    return q_s, src_s, w_s, keys, tab


def test_point_stats_match_tier1_oracle(scene):
    """Kernel stats == point_stats over exactly the tier-1-resolved set,
    and the unresolved mask == tier-1's complement (identical candidate
    tables => identical winners)."""
    pts, scan = scene
    cfg = ICPConfig(corr=PACKED)
    target = build_icp_target(pts, cfg)
    spec = point_fused_spec(target.packed, "point", cfg.max_dist)
    assert spec is not None
    T = jnp.eye(4, dtype=jnp.float32)
    q_s, src_s, w_s, keys, tab = _tiled(spec, target, scan, T)
    R, _ = makeRt(T)
    C, unres = point_stats_call(
        spec, keys, tab, q_s, src_s, w_s, R.reshape(9), interpret=True
    )
    nn = nearest_point_packed(target.packed, q_s)
    live = np.asarray(w_s) > 0
    # at layout time no probe key can be missing, so unresolved == !tier-1
    np.testing.assert_array_equal(
        np.asarray(unres)[live], ~np.asarray(nn.resolved)[live]
    )
    w_res = w_s * nn.resolved * (nn.dist < spec.max_dist)
    safe = jnp.clip(nn.idx, 0, target.points.shape[0] - 1)
    oracle = point_stats(src_s, q_s, target.points[safe], w_res, R)
    scale = max(float(jnp.abs(oracle.H).max()), 1.0)
    np.testing.assert_allclose(np.asarray(C[:6, :6]), np.asarray(oracle.H),
                               atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(C[:6, 6]), np.asarray(oracle.g),
                               atol=2e-4 * scale)
    np.testing.assert_allclose(float(C[6, 6]), float(oracle.e2), rtol=1e-4)
    assert float(C[7, 7]) == float(jnp.sum(w_res))


def test_plane_pt_stats_match_tier1_oracle(scene):
    pts, scan = scene
    cfg = PlaneICPConfig(corr=PACKED)
    target = build_plane_icp_target(pts, cfg)
    assert target.corr.packed.width == 6  # normals packed alongside xyz
    spec = point_fused_spec(target.corr.packed, "plane_pt", cfg.max_dist)
    assert spec is not None
    T = jnp.eye(4, dtype=jnp.float32)
    q_s, src_s, w_s, keys, tab = _tiled(spec, target.corr, scan, T)
    R, _ = makeRt(T)
    C, unres = point_stats_call(
        spec, keys, tab, q_s, src_s, w_s, R.reshape(9), interpret=True
    )
    nn = nearest_point_packed(target.corr.packed, q_s)
    w_res = w_s * nn.resolved * (nn.dist < spec.max_dist)
    safe = jnp.clip(nn.idx, 0, target.corr.points.shape[0] - 1)
    oracle = plane_stats(
        src_s, q_s, target.corr.points[safe], target.normals[safe], w_res, R
    )
    scale = max(float(jnp.abs(oracle.H).max()), 1.0)
    np.testing.assert_allclose(np.asarray(C[:6, :6]), np.asarray(oracle.H),
                               atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(C[:6, 6]), np.asarray(oracle.g),
                               atol=2e-4 * scale)


@pytest.mark.parametrize("offset", [(0.08, -0.06, 0.1), (0.6, -0.5, 0.4)])
def test_fused_icp_matches_xla_align(scene, offset):
    """End-to-end parity, small and straggler-heavy (> cell_fine) starts."""
    pts, _ = scene
    rng = np.random.RandomState(11)
    idx = rng.choice(len(pts), 4000, replace=False)
    scan = (
        pts[idx] + np.float32(offset)
        + rng.randn(4000, 3).astype(np.float32) * 0.004
    ).astype(np.float32)
    cfg = ICPConfig(corr=PACKED)
    target = build_icp_target(pts, cfg)
    spec = point_fused_spec(target.packed, "point", cfg.max_dist)
    w = jnp.ones((len(scan),), jnp.float32)
    I = jnp.eye(4, dtype=jnp.float32)
    ref = icp_align(target, scan, w, I, cfg)
    T_f, diag = fused_point_align(target, None, scan, w, I, cfg, spec,
                                  interpret=True)
    assert int(diag.iterations) == int(ref.diagnostics.iterations)
    np.testing.assert_allclose(np.asarray(T_f), np.asarray(ref.T), atol=2e-3)


def test_fused_plane_icp_matches_xla_align(scene):
    pts, scan = scene
    cfg = PlaneICPConfig(corr=PACKED)
    target = build_plane_icp_target(pts, cfg)
    spec = point_fused_spec(target.corr.packed, "plane_pt", cfg.max_dist)
    w = jnp.ones((len(scan),), jnp.float32)
    I = jnp.eye(4, dtype=jnp.float32)
    ref = plane_icp_align(target, scan, w, I, cfg)
    T_f, diag = fused_point_align(target.corr, target.normals, scan, w, I,
                                  cfg, spec, interpret=True)
    assert int(diag.iterations) == int(ref.diagnostics.iterations)
    np.testing.assert_allclose(np.asarray(T_f), np.asarray(ref.T), atol=2e-3)


def test_list_overflow_degrades_to_fallback(scene):
    """A tiny key-list capacity forces overflow: dropped blocks must surface
    as unresolved (handled by the fallback), never as wrong matches."""
    pts, scan = scene
    cfg = ICPConfig(corr=PACKED)
    target = build_icp_target(pts, cfg)
    spec = point_fused_spec(target.packed, "point", cfg.max_dist, cb=128)
    w = jnp.ones((len(scan),), jnp.float32)
    I = jnp.eye(4, dtype=jnp.float32)
    ref = icp_align(target, scan, w, I, cfg)
    T_f, diag = fused_point_align(target, None, scan, w, I, cfg, spec,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(T_f), np.asarray(ref.T), atol=2e-3)


def test_overflow_miss_excluded_from_stats(scene):
    """Key-list overflow (cb too small) drops blocks from some tiles; a
    query whose window touches a dropped block is flagged unresolved AND
    must contribute NOTHING to the kernel stats — the driver's fallback
    re-solves it, so a kernel contribution would double-count it (and with
    a possibly-wrong, not-provably-nearest match)."""
    pts, scan = scene
    cfg = ICPConfig(corr=PACKED)
    target = build_icp_target(pts, cfg)
    # tq=512 pinned: big tiles hold >128 distinct window keys on this scene,
    # which is what forces the cb=128 overflow this test needs (the swept
    # production default tq=128 deliberately avoids it)
    spec = point_fused_spec(target.packed, "point", cfg.max_dist,
                            tq=512, cb=128)
    T = jnp.eye(4, dtype=jnp.float32)
    q_s, src_s, w_s, keys, tab = _tiled(spec, target, scan, T)
    R, _ = makeRt(T)
    C, unres = point_stats_call(
        spec, keys, tab, q_s, src_s, w_s, R.reshape(9), interpret=True
    )
    nn = nearest_point_packed(target.packed, q_s)
    live = np.asarray(w_s) > 0
    un = np.asarray(unres) & live
    res = np.asarray(nn.resolved) & live
    # the scenario is real: overflow produced miss-unresolved queries that
    # tier-1 resolves (these are the double-count candidates)
    assert (un & res).sum() > 0, "cb=128 did not overflow; shrink cb"
    # kernel stats must cover exactly the NOT-unresolved resolved set
    w_eff = w_s * res * np.logical_not(un) * (np.asarray(nn.dist) < spec.max_dist)
    safe = jnp.clip(nn.idx, 0, target.points.shape[0] - 1)
    oracle = point_stats(src_s, q_s, target.points[safe], jnp.asarray(w_eff), R)
    scale = max(float(jnp.abs(oracle.H).max()), 1.0)
    np.testing.assert_allclose(np.asarray(C[:6, :6]), np.asarray(oracle.H),
                               atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(C[:6, 6]), np.asarray(oracle.g),
                               atol=2e-4 * scale)
    assert float(C[7, 7]) == float(jnp.sum(jnp.asarray(w_eff)))


def test_point_backend_via_solver_class(scene):
    """backend='pallas' routes ICP/PlaneICP through the fused kernel."""
    import dataclasses

    from point_cloud_registration_tpu.models.icp import ICP
    from point_cloud_registration_tpu.models.plane_icp import PlaneICP

    pts, scan = scene
    for cls in (ICP, PlaneICP):
        s_ref = cls(max_dist=2.0)
        s_ref.cfg = dataclasses.replace(s_ref.cfg, corr=PACKED, backend="xla")
        s_ref.set_target(pts)
        T_ref = np.asarray(s_ref.align(scan, np.eye(4, dtype=np.float32)))

        s_k = cls(max_dist=2.0)
        s_k.cfg = dataclasses.replace(s_k.cfg, corr=PACKED, backend="pallas")
        s_k.set_target(pts)
        assert s_k._spec is not None
        T_k = np.asarray(s_k.align(scan, np.eye(4, dtype=np.float32)))
        np.testing.assert_allclose(T_k, T_ref, atol=2e-3)


def test_small_cloud_has_no_spec():
    """grid-method targets (small clouds) don't build a fused spec."""
    rng = np.random.RandomState(0)
    pts = rng.rand(500, 3).astype(np.float32) * 5
    cfg = ICPConfig()  # auto -> grid under the 50k threshold
    target = build_icp_target(pts, cfg)
    assert target.packed is None
    assert point_fused_spec(target.packed, "point", cfg.max_dist) is None


def test_width_mismatch_yields_no_spec(scene):
    """plane_pt needs the normals columns; a 3-wide pack can't serve it."""
    pts, _ = scene
    target = build_icp_target(pts, ICPConfig(corr=PACKED))
    assert target.packed.width == 3
    assert point_fused_spec(target.packed, "plane_pt", 2.0) is None


def test_fused_point_batched_matches_per_problem(scene):
    """Batched stream == per-problem fused align for both point kinds."""
    from point_cloud_registration_tpu.models._point_fused import (
        fused_point_align_batched,
    )

    pts, _ = scene
    rng = np.random.RandomState(21)
    B, n = 3, 2500
    offs = [(0.06, -0.04, 0.08), (0.3, 0.2, -0.15), (-0.1, 0.12, 0.05)]
    scans = np.stack(
        [
            pts[rng.choice(len(pts), n, replace=False)] + np.float32(o)
            + rng.randn(n, 3).astype(np.float32) * 0.004
            for o in offs
        ]
    )
    weights = jnp.ones((B, n), jnp.float32)
    init_Ts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))

    cfg = ICPConfig(corr=PACKED, max_iter=10)
    target = build_icp_target(pts, cfg)
    spec = point_fused_spec(target.packed, "point", cfg.max_dist)
    Ts, diag = fused_point_align_batched(
        target, None, scans, weights, init_Ts, cfg, spec, interpret=True
    )
    assert np.isfinite(np.asarray(Ts)).all()
    for b in range(B):
        T1, d1 = fused_point_align(
            target, None, scans[b], weights[b], jnp.eye(4, dtype=jnp.float32),
            cfg, spec, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(Ts[b]), np.asarray(T1), atol=5e-4)
        assert int(diag.iterations[b]) == int(d1.iterations)


def test_fused_plane_pt_batched(scene):
    from point_cloud_registration_tpu.models._point_fused import (
        fused_point_align_batched,
    )

    pts, _ = scene
    rng = np.random.RandomState(22)
    B, n = 2, 2500
    scans = np.stack(
        [
            pts[rng.choice(len(pts), n, replace=False)]
            + np.float32([0.05 * (b + 1), -0.03, 0.07])
            + rng.randn(n, 3).astype(np.float32) * 0.004
            for b in range(B)
        ]
    )
    weights = jnp.ones((B, n), jnp.float32)
    init_Ts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    cfg = PlaneICPConfig(corr=PACKED, max_iter=10)
    target = build_plane_icp_target(pts, cfg)
    spec = point_fused_spec(target.corr.packed, "plane_pt", cfg.max_dist)
    Ts, diag = fused_point_align_batched(
        target.corr, target.normals, scans, weights, init_Ts, cfg, spec,
        interpret=True,
    )
    for b in range(B):
        T1, d1 = fused_point_align(
            target.corr, target.normals, scans[b], weights[b],
            jnp.eye(4, dtype=jnp.float32), cfg, spec, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(Ts[b]), np.asarray(T1), atol=5e-4)
