#!/usr/bin/env python3
"""Certified k-NN exactness for estimate_normals at bench scale, per scene.

Runs the fused K4 path (interpret mode off-TPU) with and without the
wide-radius exact tail tier and reports the provably-exact fraction — the
evidence behind the README's exactness claims (VERDICT r2 item 6: prove the
bound on two scene families). The ``exact`` flag is a per-point certificate
(the k-th neighbor distance is within the probe window's covering radius,
with no capacity truncation on any touched block), so the fraction is a
lower bound on true exactness, not an estimate.

Usage: python benchmark/certify_normals_exactness.py [--n-map 1200000] [--k 15]
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
    ap.add_argument("--n-map", type=int, default=1_200_000)
    ap.add_argument("--k", type=int, default=15)
    ap.add_argument("--scenes", default="city,sparse")
    args = ap.parse_args()

    import jax

    import bench
    from point_cloud_registration_tpu.ops.normals import estimate_normals

    print(f"backend: {jax.default_backend()}")
    for scene in args.scenes.split(","):
        rng = np.random.RandomState(42)
        pts = bench.SCENES[scene](rng, args.n_map)
        for tail in (False, True):
            t0 = time.perf_counter()
            nrm, info = estimate_normals(
                pts, k=args.k, backend="pallas", exact_tail=tail,
                return_info=True,
            )
            ex = np.asarray(jax.device_get(info["exact"]))
            nrm = np.asarray(jax.device_get(nrm))
            dt = time.perf_counter() - t0
            assert np.isfinite(nrm).all()
            print(
                f"scene={scene} n={len(pts)} k={args.k} exact_tail={tail}: "
                f"certified-exact {ex.mean():.4f} ({dt:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
