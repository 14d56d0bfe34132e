#!/usr/bin/env python3
"""Scaling-efficiency harness: batched registrations/s across a device mesh.

Measures the BASELINE.json north-star metrics — registrations/s and points/s
at 1 chip and at N devices — for the batched data-parallel aligner
(parallel.align_batched_sharded). On a multi-chip/multi-host slice run this
unmodified after ``parallel.distributed.initialize()``; on this single-chip
container (or the CPU test rig with
``XLA_FLAGS=--xla_force_host_platform_device_count=8``) it exercises the
identical program over however many devices exist, which validates the
protocol and the collective layout rather than real ICI scaling.

    python benchmark/scaling.py [--batch 8] [--scan-points 16384]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scan-points", type=int, default=16384)
    ap.add_argument("--map-points", type=int, default=600_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--fused", action="store_true",
        help="run the zero-collective fused Pallas stream per shard "
        "(parallel.align_batched_fused_sharded) instead of the XLA gather "
        "path; TPU only (the kernel has no CPU compile target)",
    )
    ap.add_argument(
        "--only-devices", type=int, default=None,
        help="measure only the N-device row. Resource-proportional scaling "
        "protocol on a shared-core host: the caller pins this process to N "
        "cores (taskset) and forces N virtual devices, so each device maps "
        "to one physical core — the CPU-rig analogue of each TPU chip "
        "bringing its own compute. Without it, 1-dev and N-dev rows share "
        "every core and compute-bound 'efficiency' is capped at 1/N.",
    )
    ap.add_argument(
        "--force-cpu", action="store_true",
        help="pin the CPU backend from inside the process (this container's "
        "sitecustomize re-asserts jax_platforms=axon, so the env var alone "
        "is not enough; needed when the real TPU is busy, e.g. when bench.py "
        "runs this harness as a subprocess)",
    )
    args = ap.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp

    import bench
    from point_cloud_registration_tpu.core.config import VPlaneICPConfig
    from point_cloud_registration_tpu.models import build_vplane_target
    from point_cloud_registration_tpu.ops.pallas.fused_align import voxel_fused_spec
    from point_cloud_registration_tpu.parallel import (
        align_batched_fused_sharded,
        align_batched_sharded,
        make_mesh,
    )

    devices = jax.devices()
    print(f"devices: {len(devices)} x {devices[0].platform}")

    rng = np.random.RandomState(0)
    map_np = bench.make_city_map(rng, args.map_points)
    cfg = VPlaneICPConfig(voxel_size=1.0, max_iter=30, max_dist=2.0, tol=1e-3)
    target = build_vplane_target(jax.device_put(jnp.asarray(map_np)), cfg)

    B, n = args.batch, args.scan_points
    scans = jnp.stack(
        [jnp.asarray(bench.make_scan(np.random.RandomState(b), map_np, n)) for b in range(B)]
    )
    weights = jnp.ones((B, n), jnp.float32)
    init_Ts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))

    spec = voxel_fused_spec(target, "plane", max_dist=cfg.max_dist) if args.fused else None
    if args.fused and spec is None:
        print("no fused spec for this map (sparse path) — falling back to XLA")

    rows = (
        sorted({1, len(devices)})
        if args.only_devices is None
        else [args.only_devices]
    )
    for n_dev in rows:
        if n_dev > len(devices):
            print(f"skipping {n_dev}-device row: only {len(devices)} devices")
            continue
        data = max(1, n_dev // min(n_dev, B))
        batch_ax = n_dev // data
        if B % batch_ax or n % data:
            continue
        # (the fused path folds the data axis into the problem sharding
        # itself when B divides the whole mesh — see
        # parallel.align_batched_fused_sharded)
        mesh = make_mesh(batch=batch_ax, data=data, devices=devices[:n_dev])

        def run():
            if spec is not None:
                return align_batched_fused_sharded(
                    target, None, scans, weights, init_Ts, cfg, spec, mesh
                )
            return align_batched_sharded(
                "vplane_icp", target, scans, weights, init_Ts, cfg, mesh
            )

        jax.block_until_ready(run().T)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            jax.block_until_ready(run().T)
        dt = (time.perf_counter() - t0) / args.reps
        print(
            f"mesh batch={batch_ax} data={data} ({n_dev} devices): "
            f"{B / dt:8.1f} registrations/s  {B * n / dt / 1e6:7.2f} Mpts/s  "
            f"({dt * 1e3:.1f} ms / batch of {B})"
        )


if __name__ == "__main__":
    main()
