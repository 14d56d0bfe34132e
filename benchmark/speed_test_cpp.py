#!/usr/bin/env python3
"""Drive the native C++ CPU baseline (native/cpu_baseline.cpp) on the bench
protocol — the role of the reference's PCL comparison harness
(/root/reference/benchmark/speed_test_comparison.cpp + CMakeLists.txt) in an
environment without PCL. Builds with g++ -O3 -fopenmp, feeds it the same
synthetic scene as bench.py, and prints its per-phase timings next to the
recovered translations (ground truth: t = [0, 0, 0.3] -> solvers recover
~[0, 0, -0.3]).

Usage: python benchmark/speed_test_cpp.py [--n-map N] [--n-scan N] [--scene city|sparse]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "native", "cpu_baseline.cpp")


def build(out_path: str) -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-std=c++17",
        SRC, "-o", out_path,
    ]
    subprocess.run(cmd, check=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-map", type=int, default=1_200_000)
    ap.add_argument("--n-scan", type=int, default=100_000)
    ap.add_argument("--scene", choices=["city", "sparse"], default="city")
    args = ap.parse_args()

    import bench

    rng = np.random.RandomState(42)
    map_np = bench.SCENES[args.scene](rng, args.n_map)
    scan_np = bench.make_scan(rng, map_np, args.n_scan)

    with tempfile.TemporaryDirectory() as td:
        exe = os.path.join(td, "cpu_baseline")
        build(exe)
        mp = os.path.join(td, "map.bin")
        sp = os.path.join(td, "scan.bin")
        map_np.astype("<f4").tofile(mp)
        scan_np.astype("<f4").tofile(sp)
        subprocess.run([exe, mp, sp], check=True)


if __name__ == "__main__":
    main()
