"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates SURVEY §2.3's parallel design: data-sharded GN must be bitwise-
equivalent in math (psum of partial sums) to the single-chip path, and the
batched form must reproduce per-problem results.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_cloud_registration_tpu.core.config import (
    ICPConfig,
    NDTConfig,
    PlaneICPConfig,
    VPlaneICPConfig,
)
from point_cloud_registration_tpu.models import (
    build_icp_target,
    build_ndt_target,
    build_plane_icp_target,
    build_vplane_target,
    icp_align,
    ndt_align,
    plane_icp_align,
    vplane_align,
)
from point_cloud_registration_tpu.models.base import pad_points
from point_cloud_registration_tpu.parallel import (
    align_batched_sharded,
    align_sharded,
    make_mesh,
)
from oracles import make_scan, make_scene


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(33)
    scene = make_scene(rng)
    scan, T_true = make_scan(rng, scene, np.array([0.05, -0.03, 0.1, 0.01, -0.01, 0.015]))
    return scene, scan, T_true


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_data_sharded_align_matches_single_chip(problem):
    scene, scan, _ = problem
    cfg = VPlaneICPConfig(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
    target = build_vplane_target(scene, cfg)
    src, w = pad_points(scan)  # 8192-multiple => divisible by 8
    T0 = jnp.eye(4, dtype=jnp.float32)

    single = vplane_align(target, src, w, T0, cfg)
    mesh = make_mesh(batch=1, data=8)
    sharded = align_sharded("vplane_icp", target, src, w, T0, cfg, mesh)

    T_single = np.asarray(jax.device_get(single.T))
    T_sharded = np.asarray(jax.device_get(sharded.T))
    np.testing.assert_allclose(T_sharded, T_single, atol=1e-5)
    assert int(jax.device_get(sharded.diagnostics.iterations)) == int(
        jax.device_get(single.diagnostics.iterations)
    )


# every solver family: (kind, config, target builder, single-chip align)
SOLVERS = {
    "icp": (ICPConfig(max_iter=10, max_dist=2.0, tol=1e-3), build_icp_target, icp_align),
    "plane_icp": (
        PlaneICPConfig(max_iter=10, max_dist=2.0, tol=1e-3),
        build_plane_icp_target,
        plane_icp_align,
    ),
    "vplane_icp": (
        VPlaneICPConfig(voxel_size=1.0, max_iter=10, max_dist=2.0, tol=1e-3),
        build_vplane_target,
        vplane_align,
    ),
    "ndt": (
        NDTConfig(voxel_size=1.0, max_iter=10, max_dist=2.0, tol=1e-3),
        build_ndt_target,
        ndt_align,
    ),
}


@pytest.mark.parametrize("kind", list(SOLVERS))
def test_data_sharded_all_solvers(problem, kind):
    scene, scan, _ = problem
    cfg, build, align = SOLVERS[kind]
    target = build(scene, cfg)
    src, w = pad_points(scan)
    T0 = jnp.eye(4, dtype=jnp.float32)
    single = align(target, src, w, T0, cfg)
    mesh = make_mesh(batch=1, data=8)
    sharded = align_sharded(kind, target, src, w, T0, cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(sharded.T)),
        np.asarray(jax.device_get(single.T)),
        atol=1e-5,
    )


@pytest.mark.parametrize("kind", list(SOLVERS))
def test_batched_sharded_all_solvers(problem, kind):
    """Every solver runs batched (vmap over problems, fixed tiers forced) and
    problem 0 reproduces the single-chip result (VERDICT round-1 item 6)."""
    scene, scan, _ = problem
    cfg, build, align = SOLVERS[kind]
    target = build(scene, cfg)
    src, w = pad_points(scan)
    mesh = make_mesh(batch=2, data=4)
    B = 2
    sources = jnp.broadcast_to(src, (B,) + src.shape)
    weights = jnp.broadcast_to(w, (B,) + w.shape)
    init_Ts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    out = align_batched_sharded(kind, target, sources, weights, init_Ts, cfg, mesh)
    single = align(target, src, w, jnp.eye(4, dtype=jnp.float32), cfg)
    # fixed-tier proxy resolution can pick a different (equally gated) far
    # correspondence on early iterations for the raw-point solvers; the
    # converged transform is what the contract guarantees
    tol = 1e-5 if kind in ("vplane_icp", "ndt") else 1e-4
    np.testing.assert_allclose(
        np.asarray(jax.device_get(out.T))[0],
        np.asarray(jax.device_get(single.T)),
        atol=tol,
    )


def test_batched_sharded_align(problem):
    scene, scan, T_true = problem
    cfg = VPlaneICPConfig(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
    target = build_vplane_target(scene, cfg)
    src, w = pad_points(scan)
    B = 4
    # distinct problems: perturb initial transforms
    init_Ts = np.stack([np.eye(4)] * B).astype(np.float32)
    init_Ts[1, :3, 3] += 0.02
    init_Ts[2, :3, 3] -= 0.01
    sources = jnp.broadcast_to(src, (B,) + src.shape)
    weights = jnp.broadcast_to(w, (B,) + w.shape)

    mesh = make_mesh(batch=2, data=4)
    out = align_batched_sharded(
        "vplane_icp", target, sources, weights, jnp.asarray(init_Ts), cfg, mesh
    )
    Ts = np.asarray(jax.device_get(out.T))
    assert Ts.shape == (B, 4, 4)
    # all should converge to the same answer despite different inits
    for b in range(1, B):
        np.testing.assert_allclose(Ts[b], Ts[0], atol=1e-3)
    # and the answer undoes the scan offset
    residual = Ts[0] @ T_true - np.eye(4)
    assert np.abs(residual).max() < 0.05


def test_batched_matches_loop(problem):
    scene, scan, _ = problem
    cfg = VPlaneICPConfig(voxel_size=1.0, max_iter=15, max_dist=2.0, tol=1e-3)
    target = build_vplane_target(scene, cfg)
    src, w = pad_points(scan)
    mesh = make_mesh(batch=2, data=4)
    B = 2
    sources = jnp.broadcast_to(src, (B,) + src.shape)
    weights = jnp.broadcast_to(w, (B,) + w.shape)
    init_Ts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    out = align_batched_sharded("vplane_icp", target, sources, weights, init_Ts, cfg, mesh)
    single = vplane_align(target, src, w, jnp.eye(4, dtype=jnp.float32), cfg)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(out.T))[0],
        np.asarray(jax.device_get(single.T)),
        atol=1e-5,
    )
