"""Reproduce the r4 BENCH normals failure exactly: seed-42 city map, k=15.

Instrumented: prints the sampled cell, packed-grid cap, both tier specs and
their dense-row bytes before running, then times cold + warm passes.
"""
import sys
import time
import traceback

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
from point_cloud_registration_tpu.ops.pallas.knn_normals import (  # noqa: E402
    knn_moments_spec,
)
from point_cloud_registration_tpu.ops.pallas.point_align import (  # noqa: E402
    dense_rows_bytes,
)
from point_cloud_registration_tpu.ops.pointgrid import build_packed_grid  # noqa: E402

print("devices:", jax.devices(), flush=True)
rng = np.random.RandomState(42)
map_np = bench.make_city_map(rng)
map_pts = jax.device_put(jnp.asarray(map_np, jnp.float32))
jax.block_until_ready(map_pts)

k = 15
t0 = time.time()
cell = max(sample_knn_radius(map_pts, k), 1e-3)
print(f"cell={cell:.4f} ({time.time()-t0:.1f}s)", flush=True)
t0 = time.time()
pg = build_packed_grid(map_pts, cell, cap=32, auto_cap=True)
jax.block_until_ready(pg.pts_packed)
print(f"grid built ({time.time()-t0:.1f}s): cap={pg.idx_packed.shape[1]} "
      f"rows={pg.pts_packed.shape} nb={np.asarray(pg.nb_dims)}", flush=True)
spec = knn_moments_spec(pg, radius=2, tq=256, cb=256)
spec_w = knn_moments_spec(pg, radius=4, tq=128, cb=384)
for name, s in (("base", spec), ("wide", spec_w)):
    if s is None:
        print(name, "spec None", flush=True)
    else:
        print(f"{name}: probes={len(s.probes)} cs={s.cs} W={s.row_width} "
              f"nb2={s.nb2_dims} dense_bytes={dense_rows_bytes(s)/1e9:.2f}GB",
              flush=True)

t0 = time.time()
try:
    nrm, info = estimate_normals(map_pts, k=15, return_info=True)
    jax.block_until_ready(nrm)
    print(f"OK kernel path (cold): {time.time()-t0:.2f}s", flush=True)
    exact = info["exact"]
    if exact is not None:
        print("exact fraction:", float(jnp.mean(exact.astype(jnp.float32))), flush=True)
    for tag in ("warm", "warm2"):
        t0 = time.time()
        nrm2 = estimate_normals(map_pts, k=15)
        jax.block_until_ready(nrm2)
        print(f"{tag}: {time.time()-t0:.2f}s", flush=True)
except Exception:
    print("FAIL:", flush=True)
    traceback.print_exc()
    sys.exit(1)
