#!/usr/bin/env python3
"""Headless voxel-map demo (counterpart of the reference's
demo_visualize_voxels.py:13-55: color points by voxel, show voxel stats).
Prints voxel-map statistics and renders the per-voxel coloring to a PNG.

    python demos/demo_visualize_voxels.py [--pcd cloud.pcd] [--voxel-size 1.0]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import point_cloud_registration_tpu as pcr


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pcd", help="input PCD (default: synthetic scene)")
    ap.add_argument("--voxel-size", type=float, default=1.0, dest="voxel_size")
    ap.add_argument("--out", default="demo_voxels.png")
    args = ap.parse_args()

    if args.pcd:
        from point_cloud_registration_tpu.utils import read_pcd_xyz

        pts = read_pcd_xyz(args.pcd)
    else:
        from demo_matching import make_demo_scene

        pts = make_demo_scene(np.random.RandomState(2), n=80_000)

    t0 = time.time()
    vg = pcr.VoxelGrid(args.voxel_size)
    vg.set_points(pts)
    print(f"voxelized {len(pts)} points in {time.time() - t0:.3f}s")
    print(f"valid voxels (>= {vg.min_points} points): {len(vg.mean)}")
    counts = vg._compacted("count")
    print(f"points per voxel: mean {counts.mean():.1f}, max {counts.max()}")
    filtered = pcr.voxel_filter(pts, args.voxel_size)
    print(f"voxel_filter: {len(pts)} -> {len(filtered)} points")

    rec = pcr.color_by_voxel(pts, args.voxel_size)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        rgb = rec["irgb"]
        colors = (
            np.stack([(rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255], axis=1) / 255.0
        )
        fig, axes = plt.subplots(1, 2, figsize=(13, 6))
        ss = slice(0, len(pts), max(1, len(pts) // 40000))
        axes[0].scatter(pts[ss, 0], pts[ss, 1], s=0.4, c=colors[ss])
        axes[0].set_title("points colored by voxel")
        axes[0].set_aspect("equal")
        axes[1].scatter(filtered[:, 0], filtered[:, 1], s=0.8, c="#336699")
        axes[1].set_title(f"voxel_filter output ({len(filtered)} pts)")
        axes[1].set_aspect("equal")
        fig.tight_layout()
        fig.savefig(args.out, dpi=110)
        print("wrote", args.out)
    except Exception as e:
        print("(skipped plot:", e, ")")


if __name__ == "__main__":
    main()
