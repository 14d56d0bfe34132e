#!/usr/bin/env python3
"""Staged on-chip validation of the round-3 kernels (run when the axon
tunnel is live). Small shapes first for fast Mosaic-compile feedback, then
bench-scale spot checks. Prints PASS/FAIL per stage; safe to re-run (all
programs land in the persistent compilation cache).

Usage: python benchmark/tpu_drive_round3.py [--small-only]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small-only", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    log("devices:", jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    log("backend:", jax.default_backend())

    rng = np.random.RandomState(0)
    n = 60000
    floor = np.stack([rng.rand(n // 2) * 40, rng.rand(n // 2) * 40,
                      rng.randn(n // 2) * 0.02], 1)
    wall = np.stack([rng.rand(n // 2) * 40,
                     np.full(n // 2, 20.0) + rng.randn(n // 2) * 0.02,
                     rng.rand(n // 2) * 8], 1)
    pts = np.vstack([floor, wall]).astype(np.float32)
    idx = rng.choice(n, 8000, replace=False)
    scan = (pts[idx] + np.float32([0.12, -0.1, 0.15])
            + rng.randn(8000, 3).astype(np.float32) * 0.004).astype(np.float32)
    w = jnp.ones((len(scan),), jnp.float32)
    I = jnp.eye(4, dtype=jnp.float32)

    from point_cloud_registration_tpu.core.config import (
        ICPConfig,
        PlaneICPConfig,
    )
    from point_cloud_registration_tpu.models._point_fused import (
        fused_point_align,
        fused_point_align_batched,
    )
    from point_cloud_registration_tpu.models.icp import build_icp_target, icp_align
    from point_cloud_registration_tpu.models.plane_icp import (
        build_plane_icp_target,
        plane_icp_align,
    )
    from point_cloud_registration_tpu.ops.normals import estimate_normals
    from point_cloud_registration_tpu.ops.pallas.point_align import point_fused_spec

    # ---- stage 1: point kernel (ICP), small ----
    t0 = time.perf_counter()
    cfg = ICPConfig()
    tgt = build_icp_target(pts, cfg)
    spec = point_fused_spec(tgt.packed, "point", cfg.max_dist)
    T_f, d_f = fused_point_align(tgt, None, scan, w, I, cfg, spec,
                                 interpret=not on_tpu)
    T_f = np.asarray(jax.device_get(T_f))
    ref = icp_align(tgt, scan, w, I, cfg)
    dT = np.abs(T_f - np.asarray(jax.device_get(ref.T))).max()
    ok = dT < 2e-3 and np.isfinite(T_f).all()
    log(f"stage1 point-kernel ICP: {'PASS' if ok else 'FAIL'} dT={dT:.2e} "
        f"iters={int(jax.device_get(d_f.iterations))} "
        f"({time.perf_counter() - t0:.1f}s incl. compile)")

    # ---- stage 2: plane_pt kernel (PlaneICP), small ----
    t0 = time.perf_counter()
    pcfg = PlaneICPConfig()
    ptgt = build_plane_icp_target(pts, pcfg)
    pspec = point_fused_spec(ptgt.corr.packed, "plane_pt", pcfg.max_dist)
    T_p, d_p = fused_point_align(ptgt.corr, ptgt.normals, scan, w, I, pcfg,
                                 pspec, interpret=not on_tpu)
    refp = plane_icp_align(ptgt, scan, w, I, pcfg)
    dT = np.abs(np.asarray(jax.device_get(T_p))
                - np.asarray(jax.device_get(refp.T))).max()
    log(f"stage2 plane_pt kernel: {'PASS' if dT < 2e-3 else 'FAIL'} dT={dT:.2e} "
        f"({time.perf_counter() - t0:.1f}s)")

    # ---- stage 3: K4 normals kernel, small ----
    t0 = time.perf_counter()
    nrm, info = estimate_normals(pts, k=15, backend="pallas" if not on_tpu else "auto",
                                 return_info=True)
    nrm = np.asarray(jax.device_get(nrm))
    nx = np.asarray(jax.device_get(estimate_normals(pts, k=15, backend="xla")))
    dots = np.abs(np.sum(nrm * nx, axis=1))
    frac = float((dots > 0.99).mean())
    exact = info["exact"]
    ef = float(np.asarray(jax.device_get(exact)).mean()) if exact is not None else -1
    ok = frac > 0.95 and np.isfinite(nrm).all()
    log(f"stage3 K4 normals: {'PASS' if ok else 'FAIL'} |dot|>0.99 frac={frac:.4f} "
        f"exact={ef:.4f} ({time.perf_counter() - t0:.1f}s)")

    # ---- stage 4: batched point stream, small ----
    t0 = time.perf_counter()
    B = 2
    scans = np.stack([scan, scan + np.float32([0.02, 0.01, -0.02])])
    Ts, diag = fused_point_align_batched(
        tgt, None, scans, jnp.ones((B, len(scan)), jnp.float32),
        jnp.broadcast_to(I, (B, 4, 4)), cfg, spec, interpret=not on_tpu,
    )
    Ts = np.asarray(jax.device_get(Ts))
    dT = np.abs(Ts[0] - T_f).max()
    log(f"stage4 batched point: {'PASS' if dT < 5e-4 else 'FAIL'} dT={dT:.2e} "
        f"({time.perf_counter() - t0:.1f}s)")

    if args.small_only:
        return

    # ---- stage 5: bench-scale spot timings ----
    import bench

    rng = np.random.RandomState(42)
    map_np = bench.make_city_map(rng)
    scan_np = bench.make_scan(rng, map_np)
    map_dev = jax.device_put(jnp.asarray(map_np))
    scan_dev = jax.device_put(jnp.asarray(scan_np))
    jax.block_until_ready((map_dev, scan_dev))

    import point_cloud_registration_tpu as pcr

    for name, mk in [
        ("ICP", lambda: pcr.ICP(max_iter=30, max_dist=2, tol=1e-3)),
        ("PlaneICP", lambda: pcr.PlaneICP(max_iter=30, max_dist=2, tol=1e-3)),
    ]:
        s = mk()
        if name == "PlaneICP":
            nrm_full = estimate_normals(map_dev, k=15)
            jax.block_until_ready(nrm_full)
            s.set_target(map_dev, kdree="pre", norm=nrm_full)
            s.align(scan_dev)  # warm
            t0 = time.perf_counter()
            s2 = mk()
            s2.set_target(map_dev, kdree="pre", norm=nrm_full)
            s2.align(scan_dev)
            dt = time.perf_counter() - t0
        else:
            s.set_target(map_dev)
            s.align(scan_dev)  # warm
            t0 = time.perf_counter()
            s2 = mk()
            s2.set_target(map_dev)
            s2.align(scan_dev)
            dt = time.perf_counter() - t0
        log(f"stage5 {name} set_target+align warm: {dt:.3f}s")

    t0 = time.perf_counter()
    nrm_full = estimate_normals(map_dev, k=15)
    jax.block_until_ready(nrm_full)
    log(f"stage5 estimate_normals warm-ish: {time.perf_counter() - t0:.3f}s "
        f"(re-run for warm)")
    t0 = time.perf_counter()
    nrm_full = estimate_normals(map_dev, k=15)
    jax.block_until_ready(nrm_full)
    log(f"stage5 estimate_normals warm: {time.perf_counter() - t0:.3f}s")


if __name__ == "__main__":
    main()
