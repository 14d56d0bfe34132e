#!/usr/bin/env python3
"""Measured comparison against the actual reference implementation.

Counterpart of the reference's own competitor harness
(benchmark/speed_test_comparison.py:162-217, which timed it against Open3D /
small_gicp / PCL): here the *competitor* is the reference NumPy library
itself, imported from its read-only mount and executed on this machine's CPU
with a scipy-cKDTree shim standing in for pykdtree (same query contract,
kdtree.py:18-25). This yields

* a measured NumPy baseline on identical data (the reference README's table
  was recorded on unspecified hardware), and
* direct final-transform parity between the TPU solvers and the reference.

Usage:  python benchmark/compare_reference.py [--n-map 1200000] [--n-scan 100000]
        (runs our solvers on whatever JAX backend is active)
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFERENCE_PATH = os.environ.get("PCR_REFERENCE_PATH", "/root/reference")


def import_reference():
    """Import the mounted reference package with scipy standing in for pykdtree."""
    from scipy.spatial import cKDTree

    class _KDTree:
        def __init__(self, data):
            self._t = cKDTree(np.asarray(data, np.float64))

        def query(self, x, k=1):
            d, i = self._t.query(np.asarray(x, np.float64), k=k)
            return np.asarray(d, np.float32), np.asarray(i)

    pyk = types.ModuleType("pykdtree")
    pykk = types.ModuleType("pykdtree.kdtree")
    pykk.KDTree = _KDTree
    pyk.kdtree = pykk
    sys.modules.setdefault("pykdtree", pyk)
    sys.modules.setdefault("pykdtree.kdtree", pykk)
    sys.path.insert(0, REFERENCE_PATH)
    import point_cloud_registration as ref

    return ref


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-map", type=int, default=1_200_000)
    ap.add_argument("--n-scan", type=int, default=100_000)
    ap.add_argument("--scene", choices=["city", "sparse", "lidar", "both", "all"],
                    default="both",
                    help="scene family; 'both' = city+sparse, 'all' adds the "
                    "ray-cast LiDAR family (bench.make_lidar_map)")
    args = ap.parse_args()

    import bench

    ref = import_reference()
    if args.scene == "both":
        scenes = ["city", "sparse"]
    elif args.scene == "all":
        scenes = ["city", "sparse", "lidar"]
    else:
        scenes = [args.scene]
    for scene in scenes:
        print(f"\n=== scene: {scene} ===")
        run_scene(ref, bench.SCENES[scene], args)


def run_scene(ref, make_map, args):
    import bench

    rng = np.random.RandomState(42)
    map_np = make_map(rng, args.n_map)
    scan_np = bench.make_scan(rng, map_np, args.n_scan)
    print(f"map {map_np.shape}, scan {scan_np.shape}")
    import jax
    import jax.numpy as jnp

    import point_cloud_registration_tpu as pcr

    print("our backend:", jax.default_backend())
    map_dev = jax.device_put(jnp.asarray(map_np))
    scan_dev = jax.device_put(jnp.asarray(scan_np))
    jax.block_until_ready((map_dev, scan_dev))

    params = dict(max_iter=30, max_dist=2, tol=1e-3)
    cases = [
        ("ICP", lambda m: m.ICP(**params), {}),
        ("VPlaneICP", lambda m: m.VPlaneICP(voxel_size=1.0, **params), {}),
        ("NDT", lambda m: m.NDT(voxel_size=1.0, **params), {}),
    ]

    # Ground-truth accuracy: the scan is map + t_true + noise
    # (bench.make_scan), so align should recover inv(T_true). When |dT|
    # between the two implementations exceeds the parity budget on a
    # multi-modal scene (near-duplicate LiDAR returns), these columns say
    # whether ours converged somewhere WORSE or merely different.
    T_true = np.eye(4)
    T_true[:3, 3] = [0.0, 0.0, 0.3]

    def gt_err(T):
        return np.abs(np.asarray(T, np.float64) @ T_true - np.eye(4)).max()

    print(f"{'method':12s} {'ref CPU (s)':>12s} {'ours (s)':>10s} {'speedup':>8s} {'|dT|max':>9s} {'gt ref':>8s} {'gt ours':>8s}")
    for name, ctor, _ in cases:
        t0 = time.perf_counter()
        solver_ref = ctor(ref)
        solver_ref.set_target(map_np.astype(np.float32))
        T_ref = solver_ref.align(scan_np)
        t_ref = time.perf_counter() - t0

        ours = ctor(pcr)
        ours.set_target(map_dev)  # warm compile
        ours.align(scan_dev)
        t0 = time.perf_counter()
        ours2 = ctor(pcr)
        ours2.set_target(map_dev)
        T_ours = ours2.align(scan_dev)
        t_ours = time.perf_counter() - t0

        dT = np.abs(np.asarray(T_ours) - np.asarray(T_ref)).max()
        print(f"{name:12s} {t_ref:12.3f} {t_ours:10.3f} {t_ref / t_ours:7.1f}x {dT:9.5f} {gt_err(T_ref):8.5f} {gt_err(T_ours):8.5f}")

    # PlaneICP under the reference's own protocol (speed_test_comparison.py:
    # 25-34): kd-tree + normals precomputed and injected, timing covers
    # set_target + align only.
    from point_cloud_registration_tpu.ops.normals import estimate_normals as est_dev

    jax.block_until_ready(est_dev(map_dev, k=15))  # compile warmup
    t0 = time.perf_counter()
    normals_dev = est_dev(map_dev, k=15)
    jax.block_until_ready(normals_dev)
    t_norm_ours = time.perf_counter() - t0

    import importlib

    kdt_mod = importlib.import_module("point_cloud_registration.kdtree")
    t0 = time.perf_counter()
    tree = kdt_mod.KDTree(map_np.astype(np.float32))
    normals_np = ref.estimate_norm_with_tree(map_np.astype(np.float32), tree, 15)
    t_norm_ref = time.perf_counter() - t0
    print(f"(normal estimation: ref {t_norm_ref:.3f}s, ours {t_norm_ours:.3f}s)")

    t0 = time.perf_counter()
    p_ref = ref.PlaneICP(**params, k=15)
    p_ref.set_target(map_np.astype(np.float32), tree, normals_np)
    T_ref = p_ref.align(scan_np)
    t_ref = time.perf_counter() - t0

    p_ours = pcr.PlaneICP(**params, k=15)
    p_ours.set_target(map_dev, kdree="precomputed", norm=normals_dev)
    p_ours.align(scan_dev)  # warm
    t0 = time.perf_counter()
    p_ours2 = pcr.PlaneICP(**params, k=15)
    p_ours2.set_target(map_dev, kdree="precomputed", norm=normals_dev)
    T_ours = p_ours2.align(scan_dev)
    t_ours = time.perf_counter() - t0
    dT = np.abs(np.asarray(T_ours) - np.asarray(T_ref)).max()
    print(f"{'PlaneICP':12s} {t_ref:12.3f} {t_ours:10.3f} {t_ref / t_ours:7.1f}x {dT:9.5f} {gt_err(T_ref):8.5f} {gt_err(T_ours):8.5f}")

    # PlaneICP with SHARED normals (the reference's own normal field injected
    # into our solver): isolates solver-trajectory parity from normal-field
    # differences at full bench scale.
    p_shared = pcr.PlaneICP(**params, k=15)
    p_shared.set_target(map_dev, kdree="precomputed", norm=np.asarray(normals_np))
    T_shared = p_shared.align(scan_dev)
    dT_shared = np.abs(np.asarray(T_shared) - np.asarray(T_ref)).max()
    print(f"PlaneICP shared-normals |dT|max: {dT_shared:.6f}")

    # k-NN exactness at bench scale: fraction of sampled points whose k-th
    # neighbor distance matches the reference kd-tree's (the one knob where
    # the packed-window search is approximate; normals quality rides on it).
    from point_cloud_registration_tpu.ops.normals import sample_knn_radius
    from point_cloud_registration_tpu.ops.pointgrid import build_packed_grid, knn_packed

    sel = np.random.RandomState(5).randint(0, len(map_np), size=50_000)
    cell = max(sample_knn_radius(map_dev, 15), 1e-3)
    pg = build_packed_grid(map_dev, cell, cap=45)
    d_ours, _ = knn_packed(pg, map_dev[jnp.asarray(sel)], 15)
    d_ref, _ = tree.query(map_np[sel].astype(np.float32), k=15)
    exact = np.abs(np.asarray(d_ours)[:, -1] - d_ref[:, -1]) < 1e-4
    print(f"k-NN (k=15) kth-distance exact fraction @50k sample (XLA path): {exact.mean():.4f}")

    # the fused-kernel pipeline's own provable-exactness flag (radius-2 base
    # + radius-4 tail tier), full map — kernel path only (None on CPU runs,
    # where interpret mode at 1.2M would take hours)
    _, info = est_dev(map_dev, k=15, backend="auto", return_info=True)
    if info["exact"] is not None:
        frac = float(np.asarray(jax.device_get(info["exact"])).mean())
        print(f"k-NN provably-exact fraction, fused kernel + wide tail (full map): {frac:.4f}")


if __name__ == "__main__":
    main()
