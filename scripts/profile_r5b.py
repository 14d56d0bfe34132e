"""Round-5 experiment batch B: segment-acc chunk sweep, batched B/tq sweep
with flattened SMEM prefetch, normals re-profile (post-eigh3-fix)."""
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

# ---------------- segment-acc chunk-size sweep ----------------
from point_cloud_registration_tpu.ops import voxelize as vx  # noqa: E402
from point_cloud_registration_tpu.ops.hashgrid import _bbox_cells, cell_coords  # noqa: E402

voxel_size = 1.0
lo, hi = _bbox_cells(map_pts, voxel_size)
dims = tuple(int(x) for x in (hi - lo + 1))
d_total = int(np.prod(dims))
origin = jnp.asarray(lo, jnp.int32)

for CH in (256, 128, 64):
    vx._SEG_CH = CH

    def segacc(pts, _CH=CH):
        coords = cell_coords(pts, jnp.float32(voxel_size))
        rel = coords - origin
        key = rel[:, 0] + dims[0] * (rel[:, 1] + dims[1] * rel[:, 2])
        skey, sx, sy, sz = jax.lax.sort(
            (key, pts[:, 0], pts[:, 1], pts[:, 2]),
            dimension=0, num_keys=1, is_stable=True,
        )
        sp = jnp.stack([sx, sy, sz], axis=-1)
        corner = cell_coords(sp, jnp.float32(voxel_size)).astype(jnp.float32) * voxel_size
        local = sp - corner
        vals = jnp.concatenate(
            [jnp.ones((pts.shape[0], 1), jnp.float32), local,
             local[:, 0:1] * local, local[:, 1:2] * local[:, 1:3],
             local[:, 2:3] * local[:, 2:3]], axis=-1)
        acc = vx._segment_acc(skey, vals, d_total, presorted=True)
        return acc[0, 0]

    f = jax.jit(segacc)
    t(f"sort4+segacc CH={CH}", lambda f=f: f(map_pts))
vx._SEG_CH = 256

# ---------------- batched B/tq sweep (flattened prefetch) ----------------
import dataclasses as _dc  # noqa: E402

from point_cloud_registration_tpu.core.config import VPlaneICPConfig  # noqa: E402
from point_cloud_registration_tpu.models import build_vplane_target  # noqa: E402
from point_cloud_registration_tpu.models._fused import (  # noqa: E402
    fused_voxel_align_batched,
)
from point_cloud_registration_tpu.ops.pallas.fused_align import voxel_fused_spec  # noqa: E402

cfg = VPlaneICPConfig(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
target = build_vplane_target(map_pts, cfg)
jax.block_until_ready(target.means)
spec0 = voxel_fused_spec(target, "plane", max_dist=cfg.max_dist)
n_b = 16384
for B in (8, 32):
    scans = jax.device_put(jnp.asarray(np.stack(
        [bench.make_scan(np.random.RandomState(100 + b), map_np, n_b)
         for b in range(B)])))
    weights = jnp.ones((B, n_b), jnp.float32)
    init_Ts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    for tq in (256, 128):
        spec_b = _dc.replace(spec0, tq=tq)

        def run_batch(spec_b=spec_b, scans=scans, weights=weights,
                      init_Ts=init_Ts):
            Ts, diag = fused_voxel_align_batched(
                target, scans, weights, init_Ts, cfg, spec_b)
            jax.block_until_ready(Ts)
            return Ts

        try:
            dt = t(f"batched B={B} tq={tq}", run_batch)
            print(f"  -> {B / dt:.1f} reg/s", flush=True)
        except Exception as e:
            print(f"batched B={B} tq={tq} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

# single-scan check: flattened prefetch must not regress the 100k path
import point_cloud_registration_tpu as pcr  # noqa: E402


def set_then_align():
    s = pcr.VPlaneICP(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
    s.set_target(map_pts)
    return np.asarray(s.align(scan))


t("vplane set_target+align wall", set_then_align)

# ---------------- normals re-profile ----------------
from point_cloud_registration_tpu.ops.normals import estimate_normals  # noqa: E402
from point_cloud_registration_tpu.ops.eigh3 import smallest_eigvec_sym3  # noqa: E402

t("normals e2e default", lambda: estimate_normals(map_pts, k=15))
t("normals e2e exact_tail=False",
  lambda: estimate_normals(map_pts, k=15, exact_tail=False))

cov_test = jax.device_put(
    jnp.asarray(np.abs(np.random.randn(1_200_128, 6)).astype(np.float32)))
t("eigh3 1.2M", lambda: smallest_eigvec_sym3(cov_test))
