#!/usr/bin/env python3
"""Headless normal-estimation demo (counterpart of the reference's
demo_estimate_normals.py:27-56, which rendered k-NN PCA normals as line
segments in the Qt viewer). Renders the cloud colored by |n_z| plus a sparse
quiver of normal segments (via get_norm_lines) to a PNG.

    python demos/demo_estimate_normals.py [--pcd cloud.pcd] [--k 15]
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
    ap.add_argument("--k", type=int, default=15)
    ap.add_argument("--out", default="demo_normals.png")
    args = ap.parse_args()

    if args.pcd:
        from point_cloud_registration_tpu.utils import read_pcd_xyz

        pts = read_pcd_xyz(args.pcd)
    else:
        from demo_matching import make_demo_scene

        pts = make_demo_scene(np.random.RandomState(1), n=60_000)

    t0 = time.time()
    normals = pcr.estimate_normals(pts, k=args.k)
    print(f"estimated {len(pts)} normals in {time.time() - t0:.3f}s")

    lines = pcr.get_norm_lines(pts[:: max(1, len(pts) // 400)], normals[:: max(1, len(pts) // 400)], length=0.5)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(9, 8))
        ss = slice(0, len(pts), max(1, len(pts) // 30000))
        sc = ax.scatter(
            pts[ss, 0], pts[ss, 2], s=0.4, c=np.abs(normals[ss, 2]), cmap="viridis"
        )
        for i in range(0, len(lines), 2):
            ax.plot(lines[i : i + 2, 0], lines[i : i + 2, 2], "r-", lw=0.6)
        fig.colorbar(sc, label="|n_z|")
        ax.set_xlabel("x")
        ax.set_ylabel("z")
        ax.set_title(f"k-NN PCA normals (k={args.k}) — side view")
        fig.tight_layout()
        fig.savefig(args.out, dpi=110)
        print("wrote", args.out)
    except Exception as e:
        print("(skipped plot:", e, ")")


if __name__ == "__main__":
    main()
