"""Reproduce the K4 knn_normals compile failure at bench scale on the chip."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

from point_cloud_registration_tpu.ops.normals import estimate_normals  # noqa: E402

print("devices:", jax.devices(), flush=True)
rng = np.random.RandomState(0)
map_np = bench.make_city_map(rng)
map_pts = jnp.asarray(map_np, jnp.float32)
t0 = time.time()
try:
    nrm, info = estimate_normals(map_pts, k=15, return_info=True)
    jax.block_until_ready(nrm)
    print(f"OK kernel path: {time.time()-t0:.2f}s", flush=True)
    exact = info["exact"]
    if exact is not None:
        print("exact fraction:", float(jnp.mean(exact.astype(jnp.float32))), flush=True)
except Exception as e:
    print(f"FAIL: {type(e).__name__}", flush=True)
    print(str(e)[:8000], flush=True)
