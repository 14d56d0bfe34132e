"""Round-5 batch C: eigh3 relayout validation + scan-scaled batched row +
wall re-check, on hardware."""
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

print("devices:", jax.devices(), flush=True)


def t(name, fn, reps=3):
    fn()
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best * 1e3:.1f} ms", flush=True)
    return best


rng = np.random.RandomState(42)
map_np = bench.make_city_map(rng)
scan_np = bench.make_scan(rng, map_np)
map_pts = jax.device_put(jnp.asarray(map_np))
scan = jax.device_put(jnp.asarray(scan_np))
jax.block_until_ready((map_pts, scan))

from point_cloud_registration_tpu.ops.eigh3 import (  # noqa: E402
    eigh_sym3,
    smallest_eigvec_sym3,
)

cov_np = np.abs(np.random.randn(1_200_128, 6)).astype(np.float32)
cov_test = jax.device_put(jnp.asarray(cov_np))
t("eigh3 smallest 1.2M (relayout)", lambda: smallest_eigvec_sym3(cov_test))
t("eigh3 full 1.2M (relayout)", lambda: eigh_sym3(cov_test)[0])

from point_cloud_registration_tpu.ops.normals import estimate_normals  # noqa: E402

t("normals e2e default", lambda: estimate_normals(map_pts, k=15))
t("normals e2e exact_tail=False",
  lambda: estimate_normals(map_pts, k=15, exact_tail=False))

# scan-scaled batched row exactly as bench.py will run it
from point_cloud_registration_tpu.core.config import VPlaneICPConfig  # noqa: E402
from point_cloud_registration_tpu.models import build_vplane_target  # noqa: E402
from point_cloud_registration_tpu.models._fused import (  # noqa: E402
    fused_voxel_align_batched,
    scan_scaled_spec,
)
from point_cloud_registration_tpu.ops.pallas.fused_align import voxel_fused_spec  # noqa: E402

cfg = VPlaneICPConfig(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
target = build_vplane_target(map_pts, cfg)
jax.block_until_ready(target.means)
B, n_b = 8, 16384
scans = jax.device_put(jnp.asarray(np.stack(
    [bench.make_scan(np.random.RandomState(100 + b), map_np, n_b)
     for b in range(B)])))
weights = jnp.ones((B, n_b), jnp.float32)
init_Ts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
spec_b = scan_scaled_spec(
    voxel_fused_spec(target, "plane", max_dist=cfg.max_dist), n_b)
print("scan_scaled tq:", spec_b.tq, flush=True)


def run_batch():
    Ts, diag = fused_voxel_align_batched(
        target, scans, weights, init_Ts, cfg, spec_b)
    jax.block_until_ready(Ts)
    return Ts


dt = t("batched B=8 (scan-scaled)", run_batch)
print(f"  -> {B / dt:.1f} reg/s", flush=True)

# batched point stream with the flattened prefetch
from point_cloud_registration_tpu.core.config import ICPConfig  # noqa: E402
from point_cloud_registration_tpu.models.icp import build_icp_target  # noqa: E402
from point_cloud_registration_tpu.models._point_fused import (  # noqa: E402
    fused_point_align_batched,
    target_fused_rows,
)
from point_cloud_registration_tpu.ops.pallas.point_align import (  # noqa: E402
    point_fused_spec,
)

icp_cfg2 = ICPConfig(max_iter=30, max_dist=2.0, tol=1e-3, fixed_tiers=True)
icp_tgt = build_icp_target(map_pts, icp_cfg2)
pspec = point_fused_spec(icp_tgt.packed, "point", 2.0, tq=128, cb=512,
                         radius=1)
pfrows = target_fused_rows(pspec, icp_tgt.packed)


def run_batch_icp():
    Ts, diag = fused_point_align_batched(
        icp_tgt, None, scans, weights, init_Ts, icp_cfg2, pspec, frows=pfrows)
    jax.block_until_ready(Ts)
    return Ts


dt = t("batched ICP B=8", run_batch_icp)
print(f"  -> {B / dt:.1f} reg/s", flush=True)

# wall rows after the eigh3 change (build includes the voxel eigh)
import point_cloud_registration_tpu as pcr  # noqa: E402


def set_then_align():
    s = pcr.VPlaneICP(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
    s.set_target(map_pts)
    return np.asarray(s.align(scan))


t("vplane set_target+align wall", set_then_align)

# parity spot check: recovered transform unchanged by the relayout
s = pcr.VPlaneICP(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
s.set_target(map_pts)
T = np.asarray(s.align(scan))
print("vplane t:", np.round(T[:3, 3], 4), "iters:",
      s.last_diagnostics.iterations, flush=True)
