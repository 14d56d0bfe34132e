"""Phase breakdown of the warm estimate_normals kernel path at bench scale."""
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

from point_cloud_registration_tpu.ops.normals import (  # noqa: E402
    estimate_normals,
    sample_knn_radius,
)
from point_cloud_registration_tpu.ops.eigh3 import smallest_eigvec_sym3  # noqa: E402
from point_cloud_registration_tpu.ops.pallas.knn_normals import (  # noqa: E402
    knn_moments_call,
    knn_moments_spec,
)
from point_cloud_registration_tpu.ops.pallas.point_align import (  # noqa: E402
    build_fused_rows,
    build_tile_tables_dense,
    morton_layout,
    padded_point_capacity,
)
from point_cloud_registration_tpu.ops.pointgrid import build_packed_grid  # noqa: E402

print("devices:", jax.devices(), flush=True)
rng = np.random.RandomState(42)
map_np = bench.make_city_map(rng)
map_pts = jax.device_put(jnp.asarray(map_np, jnp.float32))
jax.block_until_ready(map_pts)
k = 15


def t(name, fn, reps=3):
    fn()  # warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return fn()


# end-to-end warm first (compiles everything)
nrm = estimate_normals(map_pts, k=k)
jax.block_until_ready(nrm)
t("e2e", lambda: estimate_normals(map_pts, k=k), reps=3)

t("sample_knn_radius", lambda: sample_knn_radius(map_pts, k))
cell = max(sample_knn_radius(map_pts, k), 1e-3)
pg = t("build_packed_grid", lambda: build_packed_grid(map_pts, cell, cap=32, auto_cap=True))
spec = knn_moments_spec(pg, radius=2, tq=256, cb=256)
spec_w = knn_moments_spec(pg, radius=4, tq=128, cb=384)
print("spec cap:", spec.cap, "cs:", spec.cs, "W:", spec.row_width, flush=True)

frows = t("build_fused_rows", lambda: build_fused_rows(spec, pg))
n = map_pts.shape[0]
pos = morton_layout(spec, map_pts)
jax.block_until_ready(pos)
t("morton_layout", lambda: morton_layout(spec, map_pts))
m_cap = padded_point_capacity(spec, n)
q_s = jnp.zeros((m_cap, 3), jnp.float32).at[pos].set(map_pts)
w_s = jnp.zeros((m_cap,), jnp.float32).at[pos].set(1.0)
jax.block_until_ready((q_s, w_s))

tabs = t("tile_tables_base", lambda: build_tile_tables_dense(
    spec, frows[0], frows[1], q_s, w_s))
keys, flags, tab = tabs
out = t("kernel_base", lambda: knn_moments_call(
    spec, k, keys, flags, tab, q_s, w_s))
cov6 = out[0]
t("eigh3", lambda: smallest_eigvec_sym3(cov6))
unres, exact = out[3], out[4]
nu = int(jnp.sum(unres))
ne = int(jnp.sum(exact))
print(f"base tier: unresolved {nu} exact {ne} / {m_cap}", flush=True)

# wide tier scale: tail size
tail = int(jnp.sum(jnp.logical_not(exact) & jnp.logical_not(unres)))
print(f"tail for wide tier: {tail}", flush=True)
cap_t = int(max(min(n // 4, 1 << 18), min(n, 256)))
print(f"wide tier capacity: {cap_t}", flush=True)

# wide tier timing at capacity
pts_sub = map_pts[:cap_t]
pos_w = morton_layout(spec_w, pts_sub)
m_cap_w = padded_point_capacity(spec_w, cap_t)
q_w = jnp.zeros((m_cap_w, 3), jnp.float32).at[pos_w].set(pts_sub)
w_w = jnp.zeros((m_cap_w,), jnp.float32).at[pos_w].set(1.0)
jax.block_until_ready((q_w, w_w))
tabs_w = t("tile_tables_wide", lambda: build_tile_tables_dense(
    spec_w, frows[0], frows[1], q_w, w_w))
kw, fw, tw = tabs_w
t("kernel_wide", lambda: knn_moments_call(spec_w, k, kw, fw, tw, q_w, w_w))
