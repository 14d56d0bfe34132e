"""Round-5 batch D: normals kernel-tier spec sweep at bench scale."""
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
map_pts = jax.device_put(jnp.asarray(map_np))
jax.block_until_ready(map_pts)
k = 15

from point_cloud_registration_tpu.ops import normals as nm  # noqa: E402

# baseline
t("normals e2e default (base 2/256/256, wide 4/128/384)",
  lambda: nm.estimate_normals(map_pts, k=k))

for wide in (dict(radius=4, tq=256, cb=384),
             dict(radius=4, tq=256, cb=512),
             dict(radius=4, tq=128, cb=512)):
    nm._WIDE_SPEC_PARAMS = wide
    try:
        label = f"wide {wide['radius']}/{wide['tq']}/{wide['cb']}"
        t(f"normals e2e ({label})", lambda: nm.estimate_normals(map_pts, k=k))
        _, info = nm.estimate_normals(map_pts, k=k, return_info=True)
        frac = float(jnp.mean(info["exact"].astype(jnp.float32)))
        print(f"  exact frac: {frac:.4f}", flush=True)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:150]}", flush=True)
nm._WIDE_SPEC_PARAMS = dict(radius=4, tq=128, cb=384)

for base in (dict(radius=2, tq=512, cb=256),
             dict(radius=2, tq=256, cb=384)):
    nm._BASE_SPEC_PARAMS = base
    try:
        label = f"base {base['radius']}/{base['tq']}/{base['cb']}"
        t(f"normals e2e ({label})", lambda: nm.estimate_normals(map_pts, k=k))
        _, info = nm.estimate_normals(map_pts, k=k, return_info=True)
        frac = float(jnp.mean(info["exact"].astype(jnp.float32)))
        print(f"  exact frac: {frac:.4f}", flush=True)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:150]}", flush=True)
