"""Batched-stream throughput + iteration-spread diagnosis at bench scale."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
import bench  # noqa: E402

from point_cloud_registration_tpu.core.config import ICPConfig, VPlaneICPConfig  # noqa: E402
from point_cloud_registration_tpu.models import build_vplane_target  # noqa: E402
from point_cloud_registration_tpu.models._fused import (  # noqa: E402
    fused_voxel_align_batched,
    scan_scaled_spec,
)
from point_cloud_registration_tpu.models._point_fused import (  # noqa: E402
    fused_point_align_batched,
    target_fused_rows,
)
from point_cloud_registration_tpu.models.icp import build_icp_target  # noqa: E402
from point_cloud_registration_tpu.ops.pallas.fused_align import voxel_fused_spec  # noqa: E402
from point_cloud_registration_tpu.ops.pallas.point_align import point_fused_spec  # noqa: E402

print("devices:", jax.devices(), flush=True)
rng = np.random.RandomState(42)
map_np = bench.make_city_map(rng)
map_pts = jax.device_put(jnp.asarray(map_np, jnp.float32))

max_iter, tol, max_dist, voxel_size = 30, 1e-3, 2.0, 1.0
cfg = VPlaneICPConfig(voxel_size=voxel_size, max_iter=max_iter,
                      max_dist=max_dist, tol=tol)
target = build_vplane_target(map_pts, cfg)
B, n_b = 8, 16384
spec = scan_scaled_spec(
    voxel_fused_spec(target, "plane", max_dist=cfg.max_dist), n_b)
scans = jax.device_put(jnp.asarray(np.stack(
    [bench.make_scan(np.random.RandomState(100 + b), map_np, n_b)
     for b in range(B)])))
weights = jnp.ones((B, n_b), jnp.float32)
init_Ts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))

Ts, diag = fused_voxel_align_batched(target, scans, weights, init_Ts, cfg, spec)
jax.block_until_ready(Ts)
iters = np.asarray(jax.device_get(diag.iterations))
print("voxel iters per problem:", iters, "max", iters.max(), flush=True)

best = None
for _ in range(4):
    t0 = time.perf_counter()
    Ts, diag = fused_voxel_align_batched(target, scans, weights, init_Ts, cfg, spec)
    jax.block_until_ready(Ts)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(f"batched voxel: {best:.4f}s -> {B/best:.1f} reg/s", flush=True)

icp_cfg = ICPConfig(max_iter=max_iter, max_dist=max_dist, tol=tol,
                    fixed_tiers=True)
icp_tgt = build_icp_target(map_pts, icp_cfg)
pspec = point_fused_spec(icp_tgt.packed, "point", max_dist, tq=128, cb=512,
                         radius=1)
pfrows = target_fused_rows(pspec, icp_tgt.packed)
Ts, diag = fused_point_align_batched(icp_tgt, None, scans, weights, init_Ts,
                                     icp_cfg, pspec, frows=pfrows)
jax.block_until_ready(Ts)
iters = np.asarray(jax.device_get(diag.iterations))
print("point iters per problem:", iters, "max", iters.max(), flush=True)
best = None
for _ in range(4):
    t0 = time.perf_counter()
    Ts, diag = fused_point_align_batched(icp_tgt, None, scans, weights,
                                         init_Ts, icp_cfg, pspec, frows=pfrows)
    jax.block_until_ready(Ts)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(f"batched point: {best:.4f}s -> {B/best:.1f} reg/s", flush=True)
