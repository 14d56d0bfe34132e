"""Round-5 TPU experiment batch: build anatomy, batched amortization,
normals phase re-profile (post-eigh3-fix), point-roofline spec validation.

Run as the ONLY TPU client (tunnel discipline). Everything is timed warm;
results print to stdout as they land so a timeout still yields data.
"""
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

# ---------------- E1: voxel build anatomy ----------------
from point_cloud_registration_tpu.ops.hashgrid import _bbox_cells, cell_coords  # noqa: E402
from point_cloud_registration_tpu.ops.voxelize import (  # noqa: E402
    _build_voxel_map_dense,
    _segment_acc,
)

voxel_size = 1.0
lo, hi = _bbox_cells(map_pts, voxel_size)
dims = tuple(int(x) for x in (hi - lo + 1))
d_total = int(np.prod(dims))
origin = jnp.asarray(lo, jnp.int32)
print(f"dims {dims} d_total {d_total}", flush=True)


@jax.jit
def full_build(pts):
    vm = _build_voxel_map_dense(
        pts, origin, jnp.float32(voxel_size), dims_static=dims,
        min_points=10, with_icov=False, with_normals=True,
        rich="normals", with_blocks=True,
    )
    return vm.means[0, 0], vm.dense_blocks[0, 0, 0, 0]


t("full_build(blocks+normals)", lambda: full_build(map_pts))


@jax.jit
def keys_only(pts):
    coords = cell_coords(pts, jnp.float32(voxel_size))
    rel = coords - origin
    key = rel[:, 0] + dims[0] * (rel[:, 1] + dims[1] * rel[:, 2])
    return key


@jax.jit
def sort_only(pts):
    key = keys_only(pts)
    skey, sx, sy, sz = jax.lax.sort(
        (key, pts[:, 0], pts[:, 1], pts[:, 2]),
        dimension=0, num_keys=1, is_stable=True,
    )
    return skey[0] + sx[0] + sy[0] + sz[0]


t("sort4(key+xyz)", lambda: sort_only(map_pts))


@jax.jit
def sort2_gather(pts):
    key = keys_only(pts)
    idx = jnp.arange(pts.shape[0], dtype=jnp.int32)
    skey, sidx = jax.lax.sort((key, idx), dimension=0, num_keys=1,
                              is_stable=True)
    sp = pts[sidx]
    return skey[0] + sp[0, 0]


t("sort2(key+idx)+row_gather", lambda: sort2_gather(map_pts))


@jax.jit
def segacc_from_sorted(pts):
    key = keys_only(pts)
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
    acc = _segment_acc(skey, vals, d_total, presorted=True)
    return acc[0, 0]


t("sort4+segment_acc", lambda: segacc_from_sorted(map_pts))


@jax.jit
def scatter_add_build(pts):
    key = keys_only(pts)
    corner = cell_coords(pts, jnp.float32(voxel_size)).astype(jnp.float32) * voxel_size
    local = pts - corner
    vals = jnp.concatenate(
        [jnp.ones((pts.shape[0], 1), jnp.float32), local,
         local[:, 0:1] * local, local[:, 1:2] * local[:, 1:3],
         local[:, 2:3] * local[:, 2:3]], axis=-1)
    acc = jnp.zeros((d_total + 1, 10), jnp.float32).at[
        jnp.clip(key, 0, d_total)
    ].add(vals, mode="drop")
    return acc[0, 0]


t("scatter_add_direct(10col)", lambda: scatter_add_build(map_pts))


# segment_sum via jax.ops.segment_sum on PRESORTED ids for comparison
@jax.jit
def segment_sum_sorted(pts):
    key = keys_only(pts)
    skey, sx, sy, sz = jax.lax.sort(
        (key, pts[:, 0], pts[:, 1], pts[:, 2]),
        dimension=0, num_keys=1, is_stable=True,
    )
    sp = jnp.stack([sx, sy, sz], axis=-1)
    vals = jnp.concatenate([jnp.ones((pts.shape[0], 1), jnp.float32), sp], axis=-1)
    acc = jax.ops.segment_sum(vals, skey, num_segments=d_total + 1,
                              indices_are_sorted=True)
    return acc[0, 0]


t("sort4+jax.ops.segment_sum(4col)", lambda: segment_sum_sorted(map_pts))

# ---------------- E2: flagship wall anatomy ----------------
import point_cloud_registration_tpu as pcr  # noqa: E402

solver = pcr.VPlaneICP(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)


def set_then_align():
    s = pcr.VPlaneICP(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
    s.set_target(map_pts)
    return np.asarray(s.align(scan))


t("vplane set_target+align wall", set_then_align)


def set_only_noblock():
    s = pcr.VPlaneICP(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
    s.set_target(map_pts)
    return s._target.means  # no block: dispatch cost only


def set_only_block():
    s = pcr.VPlaneICP(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
    s.set_target(map_pts)
    jax.block_until_ready(s._target.means)
    return s._target.means


t0 = time.perf_counter()
set_only_noblock()
print(f"set_target dispatch(no block): {(time.perf_counter()-t0)*1e3:.1f} ms",
      flush=True)
t("set_target blocked", set_only_block)

# ---------------- E3: batched amortization (B=8/32) ----------------
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
for B in (8, 32):
    n_b = 16384
    scans = jax.device_put(jnp.asarray(np.stack(
        [bench.make_scan(np.random.RandomState(100 + b), map_np, n_b)
         for b in range(B)])))
    weights = jnp.ones((B, n_b), jnp.float32)
    init_Ts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    spec_b = scan_scaled_spec(
        voxel_fused_spec(target, "plane", max_dist=cfg.max_dist), n_b)

    def run_batch():
        Ts, diag = fused_voxel_align_batched(
            target, scans, weights, init_Ts, cfg, spec_b)
        jax.block_until_ready(Ts)
        return Ts

    dt = t(f"batched B={B}", run_batch)
    print(f"  -> {B / dt:.1f} reg/s", flush=True)

# ---------------- E4: normals re-profile (post-eigh3 fix) ----------------
from point_cloud_registration_tpu.ops.normals import estimate_normals  # noqa: E402
from point_cloud_registration_tpu.ops.eigh3 import smallest_eigvec_sym3  # noqa: E402

t("normals e2e default", lambda: estimate_normals(map_pts, k=15))
t("normals e2e exact_tail=False",
  lambda: estimate_normals(map_pts, k=15, exact_tail=False))

cov_test = jax.device_put(jnp.abs(np.random.randn(1_200_128, 6)).astype(np.float32))
t("eigh3 1.2M", lambda: smallest_eigvec_sym3(cov_test))
