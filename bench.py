#!/usr/bin/env python3
"""Headline benchmark: B-01-protocol registration wall-clock on one TPU chip.

Reproduces the reference benchmark protocol
(/root/reference/benchmark/speed_test_comparison.py:162-217 +
benchmark/test_data.py:21-44): a >1M-point map, a 100k-point scan offset by
t = [0, 0, 0.3] with N(0, 0.005) noise, params max_iter=30, tol=1e-3,
voxel_size=1, max_dist=2. Timings include ``set_target`` + ``align`` (the
reference's timing boundary, speed_test_comparison.py:14-20).

The reference's B-01.pcd (Osaka Kyobashi LiDAR) is git-LFS-stripped in this
checkout and the environment has no egress, so the map is a synthetic urban
scene of the same scale (1M+ points, streets + building facades); the
*baseline* numbers come from the reference README's published table
(README.md:19-23), which also does not state its hardware.

Output: ONE JSON line on stdout —
  {"metric": ..., "value": <flagship VPlaneICP wall-clock s>, "unit": "s",
   "vs_baseline": <reference 0.420 s / ours>}
Detailed per-method numbers go to stderr.

Timing excludes one warmup run per method (XLA compilation is a one-time,
cached cost; the reference pays no compile because it is interpreted NumPy).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_city_map(rng: np.random.RandomState, n_total: int = 1_200_000) -> np.ndarray:
    """Synthetic LiDAR-map stand-in for B-01.pcd: ground plane + building
    facades + scattered structure over a ~200x200 m tile."""
    extent = 200.0
    n_ground = n_total // 2
    ground = np.stack(
        [
            rng.rand(n_ground) * extent,
            rng.rand(n_ground) * extent,
            rng.randn(n_ground) * 0.03,
        ],
        axis=1,
    )
    # building facades: axis-aligned walls on a street grid
    n_walls = n_total // 3
    n_per = n_walls // 40
    walls = []
    for _ in range(40):
        x0, y0 = rng.rand(2) * (extent - 30)
        length = 10 + rng.rand() * 20
        height = 5 + rng.rand() * 15
        if rng.rand() < 0.5:
            w = np.stack(
                [
                    x0 + rng.rand(n_per) * length,
                    np.full(n_per, y0) + rng.randn(n_per) * 0.02,
                    rng.rand(n_per) * height,
                ],
                axis=1,
            )
        else:
            w = np.stack(
                [
                    np.full(n_per, x0) + rng.randn(n_per) * 0.02,
                    y0 + rng.rand(n_per) * length,
                    rng.rand(n_per) * height,
                ],
                axis=1,
            )
        walls.append(w)
    n_rest = n_total - n_ground - n_per * 40
    scatter = np.stack(
        [
            rng.rand(n_rest) * extent,
            rng.rand(n_rest) * extent,
            rng.rand(n_rest) * 6,
        ],
        axis=1,
    )
    pts = np.vstack([ground, *walls, scatter]).astype(np.float32)
    return pts


def make_sparse_scene(rng: np.random.RandomState, n_total: int = 1_200_000) -> np.ndarray:
    """Second scene family (sparse outdoor): undulating terrain + scattered
    vegetation clusters over a ~300x300 m tile. Different density profile
    from the city map — no planar walls, broad smooth ground, clumpy
    volumetric canopies — to show parity/perf bounds are not tuned to one
    geometry."""
    extent = 300.0
    n_ground = int(n_total * 0.55)
    gx = rng.rand(n_ground) * extent
    gy = rng.rand(n_ground) * extent
    gz = (
        1.5 * np.sin(gx * 0.05) * np.cos(gy * 0.04)
        + 0.8 * np.sin(gx * 0.013 + 1.0)
        + rng.randn(n_ground) * 0.04
    )
    ground = np.stack([gx, gy, gz], axis=1)
    n_veg = n_total - n_ground
    n_clusters = 300
    n_per = n_veg // n_clusters
    centers = rng.rand(n_clusters, 2) * extent
    heights = 2.0 + rng.rand(n_clusters) * 10.0
    radii = 0.5 + rng.rand(n_clusters) * 2.5
    veg = []
    for c, h, r in zip(centers, heights, radii):
        base = 1.5 * np.sin(c[0] * 0.05) * np.cos(c[1] * 0.04)
        veg.append(
            np.stack(
                [
                    c[0] + rng.randn(n_per) * r,
                    c[1] + rng.randn(n_per) * r,
                    base + rng.rand(n_per) * h,
                ],
                axis=1,
            )
        )
    rest = n_veg - n_per * n_clusters
    pad = np.stack(
        [rng.rand(rest) * extent, rng.rand(rest) * extent, rng.rand(rest) * 3],
        axis=1,
    )
    return np.vstack([ground, *veg, pad]).astype(np.float32)


def make_lidar_map(rng: np.random.RandomState, n_total: int = 1_200_000) -> np.ndarray:
    """Third scene family: genuine spinning-LiDAR sampling statistics.

    The first two families sample surfaces *uniformly*; real B-01-style maps
    (reference data/README.md:1-24, benchmark/test_data.py:21-44) are unions
    of ring scans — range-dependent density (~1/r^2 per unit area), discrete
    elevation rings, and hard occlusion shadows behind structure. This
    ray-casts 64-ring scans from poses along a trajectory through a walled
    world (first-hit only, so facades shadow everything behind them), then
    concatenates the returns: near-field cells hold hundreds of points while
    far ground thins to <1/m^2, which is exactly the regime that stresses
    per-block candidate caps and window-exactness fractions.
    """
    extent = 200.0
    n_walls = 40
    # world: ground plane z=0 + axis-aligned facades (x0, y0, length,
    # height, axis) — axis 0: wall along x at y=y0; axis 1: along y at x=x0
    walls = []
    for _ in range(n_walls):
        x0, y0 = rng.rand(2) * (extent - 30)
        walls.append((x0, y0, 10 + rng.rand() * 20, 5 + rng.rand() * 15,
                      0 if rng.rand() < 0.5 else 1))
    wx0 = np.array([w[0] for w in walls])
    wy0 = np.array([w[1] for w in walls])
    wlen = np.array([w[2] for w in walls])
    whgt = np.array([w[3] for w in walls])
    waxis = np.array([w[4] for w in walls])

    n_rings = 64
    elev = np.deg2rad(np.linspace(-24.0, 14.0, n_rings))
    n_poses = 10
    path_t = np.linspace(0.15, 0.85, n_poses)
    ox = extent * path_t
    oy = extent * (0.5 + 0.25 * np.sin(path_t * 4.0))
    oz = np.full(n_poses, 1.8)
    n_az = max(256, n_total // (n_poses * n_rings) + 1)
    az = np.linspace(0, 2 * np.pi, n_az, endpoint=False)

    max_range = 120.0
    pts = []
    for p in range(n_poses):
        a = az + rng.rand() * (2 * np.pi / n_az)  # de-correlate pose phases
        ca, sa = np.cos(a), np.sin(a)
        ce, se = np.cos(elev), np.sin(elev)
        # ray dirs (n_rings, n_az, 3)
        dx = ce[:, None] * ca[None, :]
        dy = ce[:, None] * sa[None, :]
        dz = np.broadcast_to(se[:, None], dx.shape)
        t_best = np.full(dx.shape, max_range)
        # ground z=0
        with np.errstate(divide="ignore", invalid="ignore"):
            tg = -oz[p] / dz
        hit = (dz < -1e-6) & (tg < t_best)
        t_best = np.where(hit, tg, t_best)
        # facades (first hit wins -> occlusion shadows)
        for j in range(n_walls):
            if waxis[j] == 0:
                with np.errstate(divide="ignore", invalid="ignore"):
                    tw = (wy0[j] - oy[p]) / dy
                hx = ox[p] + tw * dx
                span_lo, span_hi = wx0[j], wx0[j] + wlen[j]
            else:
                with np.errstate(divide="ignore", invalid="ignore"):
                    tw = (wx0[j] - ox[p]) / dx
                hx = oy[p] + tw * dy
                span_lo, span_hi = wy0[j], wy0[j] + wlen[j]
            hz = oz[p] + tw * dz
            ok = (
                (tw > 0.5) & (tw < t_best)
                & (hx >= span_lo) & (hx <= span_hi)
                & (hz >= 0.0) & (hz <= whgt[j])
            )
            t_best = np.where(ok, tw, t_best)
        ret = t_best < max_range
        r = t_best[ret]
        hits = np.stack(
            [ox[p] + r * dx[ret], oy[p] + r * dy[ret], oz[p] + r * dz[ret]],
            axis=1,
        )
        # range-dependent sensor noise along the ray
        hits += (rng.randn(len(hits), 3) * (0.008 * (1 + r / 60.0))[:, None])
        pts.append(hits)
    pts = np.vstack(pts)
    if len(pts) >= n_total:
        sel = rng.choice(len(pts), n_total, replace=False)
        return pts[sel].astype(np.float32)
    # top up with re-noised duplicates (denser near-field, like repeated
    # passes over the same street)
    extra = rng.choice(len(pts), n_total - len(pts), replace=True)
    dup = pts[extra] + rng.randn(n_total - len(pts), 3) * 0.01
    return np.vstack([pts, dup]).astype(np.float32)


SCENES = {"city": make_city_map, "sparse": make_sparse_scene,
          "lidar": make_lidar_map}


def make_scan(rng, map_points, num_points=100_000):
    """scan = map + t[0,0,0.3], random 100k subsample, N(0, 0.005) noise
    (benchmark/test_data.py:21-44)."""
    t = np.array([0.0, 0.0, 0.3], np.float32)
    idx = rng.choice(len(map_points), num_points, replace=False)
    scan = map_points[idx] + t
    scan = scan + rng.randn(*scan.shape).astype(np.float32) * 0.005
    return scan.astype(np.float32)


def timed(fn, warmup=1, reps=3):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


V5E_HBM_GBS = 819.0  # v5e HBM peak, GB/s
# exact-f32 gathers run as 3 bf16 passes (lossless bf16x3 split of the
# table against an exactly-bf16 one-hot), so the f32-equivalent MXU peak
# for the fused kernel is bf16 peak / 3
V5E_MXU_F32_TFLOPS = 197.0 / 3


def roofline_report(jax, jnp, map_pts, scan, voxel_size, max_dist):
    """Measured wall vs modeled traffic/FLOPs for the two hot phases.

    * ``build``: set_target (voxel stats + blocked table). Traffic model:
      read the points for keying + sorted segment reduction (~4 logical
      passes over the (N, 10) moment rows incl. the sort), write/read the
      per-cell arrays (counts/means/covs/normals ~ 23 f32/cell x 2), write
      the blocked table once.
    * ``align_iter``: one fused-kernel Gauss-Newton iteration (amortized
      over an on-device loop — strips the ~25 ms tunnel dispatch floor).
      Traffic: query tiles + one region DMA per tile + stats rows out.
      FLOPs: per-probe one-hot gather matmuls + the final merged-row gather
      + the 8x8 linearize reduction.
    """
    import time as _time

    from point_cloud_registration_tpu.core.config import VPlaneICPConfig
    from point_cloud_registration_tpu.core.se3 import makeRt, transform_points
    from point_cloud_registration_tpu.ops.pallas.fused_align import (
        band_layout,
        fused_stats_call,
        scatter_banded,
        voxel_fused_spec,
    )
    from point_cloud_registration_tpu.ops.voxelize import build_voxel_map

    def best(f, reps=3):
        f()
        ts = []
        for _ in range(reps):
            t0 = _time.perf_counter()
            jax.block_until_ready(f())
            ts.append(_time.perf_counter() - t0)
        return min(ts)

    n = int(map_pts.shape[0])
    t_build_wall = best(
        lambda: build_voxel_map(map_pts, voxel_size, min_points=10, rich="normals")
    )
    vm = build_voxel_map(map_pts, voxel_size, min_points=10, rich="normals")
    d_total = int(vm.means.shape[0])

    # device-amortized build: the two build programs in an on-device loop
    # (the wall number above additionally carries the tunnel roundtrips)
    from point_cloud_registration_tpu.ops.hashgrid import _bbox_cells
    from point_cloud_registration_tpu.ops.knn import DENSE_BLOCK
    from point_cloud_registration_tpu.ops.voxelize import (
        _build_voxel_map_dense,
        _dense_blocks_jit,
    )

    lo, hi = _bbox_cells(map_pts, voxel_size)
    dims = tuple(int(x) for x in (hi - lo + 1))
    nb = tuple(-(-d // b) for d, b in zip(dims, DENSE_BLOCK))
    origin = jnp.asarray(lo, jnp.int32)
    dev_map = jnp.asarray(map_pts)
    BREP = 6

    @jax.jit
    def build_loop(pts):
        # Chain each iteration's INPUT on the previous iteration's OUTPUT
        # (a +0-magnitude perturbation XLA cannot fold away: 1e-30 is not a
        # literal zero and the carried value is data-dependent), so
        # loop-invariant code motion cannot hoist the build out of the loop
        # — with `pts + acc * 0` it did, and the r5 bench recorded a
        # nonsense build_s=0.0 / 31 TB/s row.
        def body(i, p):
            vm_i = _build_voxel_map_dense(
                p, origin, jnp.float32(voxel_size),
                dims_static=dims, min_points=10, with_icov=False,
                with_normals=True,
            )
            blk = _dense_blocks_jit(vm_i.means, vm_i.valid, dims, nb, vm_i.normals)
            return p + blk[0, 0, 0, 0] * 1e-30
        return jax.lax.fori_loop(0, BREP, body, pts)[0, 0]

    t_build = best(lambda: build_loop(dev_map)) / BREP
    table_bytes = int(np.prod(vm.dense_blocks.shape)) * 4
    build_bytes = n * 40 * 4 + d_total * 23 * 4 * 2 + table_bytes
    out = {
        "build_s": round(t_build, 4),
        "build_wall_s": round(t_build_wall, 4),
        "build_gbs": round(build_bytes / t_build / 1e9, 1),
        "build_hbm_pct": round(100 * build_bytes / t_build / 1e9 / V5E_HBM_GBS, 1),
    }

    spec = voxel_fused_spec(vm, "plane", max_dist=max_dist)
    if spec is None:
        return out
    I4 = jnp.eye(4, dtype=jnp.float32)
    R, _ = makeRt(I4)
    rflat = R.reshape(9)
    q0 = transform_points(I4, scan)
    w = jnp.ones((scan.shape[0],), jnp.float32)
    pos = band_layout(spec, q0)
    q_s, p_s, w_s = scatter_banded(spec, pos, q0, scan, w)
    REP = 20

    @jax.jit
    def loop_kernel():
        def body(i, acc):
            C, _ = fused_stats_call(
                spec, vm.dense_blocks, q_s + acc * 0, p_s, w_s, rflat
            )
            return acc + C[0, 0] * 1e-20
        return jax.lax.fori_loop(0, REP, body, 0.0)

    t_iter = best(lambda: loop_kernel()) / REP
    from point_cloud_registration_tpu.ops.pallas.fused_align import padded_row_width

    n_pad = q_s.shape[0]
    n_tiles = n_pad // spec.tq
    RX, RY = spec.region[0], spec.region[1]
    WT = vm.dense_blocks.shape[-1]
    WA = padded_row_width(3 * spec.ncand)
    NR = RY * spec.nbz8 * RX
    iter_bytes = (
        n_pad * 7 * 4  # q, p, w tiles in
        + n_tiles * RY * spec.nbz8 * RX * WT * 4  # region DMA
        + n_tiles * (8 * 128 + 8 * spec.tq) * 4  # stats + unresolved out
    )
    iter_flops = n_tiles * (
        len(spec.probes) * spec.tq * NR * WA * 2  # probe one-hot gathers
        + spec.tq * NR * WT * 2  # winner merged-row gather
        + spec.m_rows * 8 * spec.tq * 8 * 2  # linearize reduction
    )
    out.update(
        {
            "align_iter_ms": round(t_iter * 1e3, 2),
            "align_iter_gbs": round(iter_bytes / t_iter / 1e9, 1),
            "align_iter_hbm_pct": round(
                100 * iter_bytes / t_iter / 1e9 / V5E_HBM_GBS, 1
            ),
            "align_iter_tflops": round(iter_flops / t_iter / 1e12, 2),
            "align_iter_mxu_pct": round(
                100 * iter_flops / t_iter / 1e12 / V5E_MXU_F32_TFLOPS, 1
            ),
        }
    )

    # raw-point fused path (ICP hot loop): per-iteration cost via the
    # SOLVER'S OWN align program — max_iter=1 vs max_iter=1+REP at tol=0,
    # difference / REP. This includes the fallback tiers (the honest
    # steady-state per-iteration price) and compiles nothing beyond the
    # align program itself: every standalone re-expression of the one-time
    # phase (fori_loop around point_stats_call, standalone tile-table
    # build) exceeded the remote-compile relay's request-size limit
    # (HTTP 413) at bench scale.
    try:
        import dataclasses as _dc

        from point_cloud_registration_tpu.core.config import ICPConfig
        from point_cloud_registration_tpu.models.icp import build_icp_target
        from point_cloud_registration_tpu.models._point_fused import (
            fused_point_align,
            target_fused_rows,
        )
        from point_cloud_registration_tpu.ops.pallas.point_align import (
            padded_point_capacity,
            point_fused_spec,
        )

        icp_cfg = ICPConfig(max_dist=max_dist)
        tgt = build_icp_target(map_pts, icp_cfg)
        # same spec parameters as the solver/batched path (the default swept
        # spec may differ; this one is the configuration measured live)
        pspec = point_fused_spec(tgt.packed, "point", max_dist,
                                 tq=128, cb=512, radius=1)
        pfrows = target_fused_rows(pspec, tgt.packed)
        if pspec is not None and pfrows is not None:
            w1 = jnp.ones((scan.shape[0],), jnp.float32)
            PREP = 12

            def align_iters(max_iter):
                cfg_i = _dc.replace(icp_cfg, max_iter=max_iter, tol=0.0)
                T, _ = fused_point_align(tgt, None, scan, w1, I4, cfg_i,
                                         pspec, frows=pfrows)
                return T

            t1 = best(lambda: align_iters(1))
            tn = best(lambda: align_iters(1 + PREP))
            t_pt = max(tn - t1, 1e-6) / PREP
            n_cap = padded_point_capacity(pspec, scan.shape[0])
            tiles_p = n_cap // pspec.tq
            WAp = 3 * pspec.cs
            Wp = pspec.row_width
            pt_flops = tiles_p * (
                len(pspec.probes) * pspec.tq * pspec.cb * WAp * 2
                + pspec.tq * pspec.cb * Wp * 2
                # linearize reduction, same convention as the voxel row
                # (kind='point' reduces 3 whitened rows of [J | r | 1])
                + 3 * 8 * pspec.tq * 8 * 2
            )
            pt_bytes = tiles_p * (
                pspec.cb * (Wp + 1) * 4 + pspec.tq * 7 * 4
                + (8 * 128 + 8 * pspec.tq) * 4
            )
            out.update(
                {
                    "point_align_iter_ms": round(t_pt * 1e3, 2),
                    "point_align_iter_tflops": round(pt_flops / t_pt / 1e12, 2),
                    "point_align_iter_mxu_pct": round(
                        100 * pt_flops / t_pt / 1e12 / V5E_MXU_F32_TFLOPS, 1
                    ),
                    "point_align_iter_gbs": round(pt_bytes / t_pt / 1e9, 1),
                }
            )
    except Exception as e:  # roofline extras must never kill the bench
        log("point roofline skipped:", repr(e))
    return out


def main():
    import jax

    # Persistent compilation cache: compiles through this container's remote
    # tunnel cost 30-60 s per program, so warm runs must reuse them.
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    import point_cloud_registration_tpu as pcr
    import jax.numpy as jnp

    # Backend probe FIRST, with a structured-error escape: if the accelerator
    # runtime is unreachable (round 2 ended with exactly that — the tunnel
    # relay died and the official bench artifact was a stack trace), emit a
    # diagnosable JSON record instead of crashing, so the driver always
    # captures one JSON line.
    # A half-dead tunnel HANGS jax.devices() (futex wait in PJRT client
    # creation — uninterruptible from Python), so probe in a child process
    # with a hard deadline first; only a live probe lets the parent attach.
    import subprocess

    probe_err = None
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=int(os.environ.get("BENCH_BACKEND_PROBE_S", "180")),
            capture_output=True,
        )
        if r.returncode != 0:
            tail = (r.stderr or b"").decode(errors="replace").strip().splitlines()
            probe_err = f"probe rc={r.returncode}: {tail[-1] if tail else ''}"
    except subprocess.TimeoutExpired:
        probe_err = "backend probe timed out (tunnel hung, not erroring)"
    except Exception as e:  # probe machinery itself must never kill the bench
        probe_err = None
        log("backend probe skipped:", repr(e))
    if probe_err is None:
        try:
            devs = jax.devices()
        except Exception as e:
            probe_err = f"{type(e).__name__}: {e}"
    if probe_err is not None:
        payload = {
            "metric": "vplane_icp_1.2Mmap_100kscan_settarget_align_wall_clock",
            "value": None,
            "unit": "s",
            "vs_baseline": None,
            "error": f"backend init failed: {probe_err}",
        }
        print(json.dumps(payload))
        return

    log("devices:", devs)
    rng = np.random.RandomState(42)
    map_np = make_city_map(rng)
    scan_np = make_scan(rng, map_np)
    # Device-resident inputs: the production steady state keeps clouds on
    # device; this container's relay tunnel makes host->device ~40 MB/s,
    # which is not representative of real PCIe and would swamp the timing.
    map_pts = jax.device_put(jnp.asarray(map_np))
    scan = jax.device_put(jnp.asarray(scan_np))
    jax.block_until_ready((map_pts, scan))
    log(f"map {map_np.shape}, scan {scan_np.shape}")

    max_iter, tol, max_dist, voxel_size = 30, 1e-3, 2.0, 1.0
    results = {}

    import dataclasses as _dc

    def _with_backend(s, backend):
        # the parity wrappers don't expose the backend knob (the reference
        # constructors don't have one); override the frozen config directly
        if backend is not None:
            s.cfg = _dc.replace(s.cfg, backend=backend)
        return s

    def timed_guarded(name, make_runner, reps=3):
        """Time make_runner(None); if the default (fused-kernel) path dies —
        e.g. a Mosaic compile failure on a kernel this round never got to
        compile on real hardware — retry once on the XLA gather path so the
        bench always produces a number, flagged as degraded."""
        try:
            return timed(make_runner(None), reps=reps)
        except Exception as e:
            log(f"{name}: default path failed ({type(e).__name__}: {e}); "
                "retrying with backend='xla'")
            t = timed(make_runner("xla"), reps=reps)
            degraded.append(name)
            return t

    degraded = []

    def run_vplane(backend=None):
        def f():
            s = _with_backend(
                pcr.VPlaneICP(voxel_size=voxel_size, max_iter=max_iter,
                              max_dist=max_dist, tol=tol), backend)
            s.set_target(map_pts)
            T = s.align(scan)
            return np.asarray(T)

        return f

    def run_ndt(backend=None):
        def f():
            s = _with_backend(
                pcr.NDT(voxel_size=voxel_size, max_iter=max_iter,
                        max_dist=max_dist, tol=tol), backend)
            s.set_target(map_pts)
            return s.align(scan)

        return f

    def run_icp(backend=None):
        def f():
            s = _with_backend(
                pcr.ICP(max_iter=max_iter, max_dist=max_dist, tol=tol), backend)
            s.set_target(map_pts)
            return s.align(scan)

        return f

    def run_plane_icp(normals, backend=None):
        def f():
            s = _with_backend(
                pcr.PlaneICP(max_iter=max_iter, max_dist=max_dist, tol=tol),
                backend)
            s.set_target(map_pts, kdree="precomputed", norm=normals)
            return s.align(scan)

        return f

    # flagship first
    t_vplane = timed_guarded("vplane_icp", run_vplane)
    results["vplane_icp"] = (t_vplane, 0.420)
    log(f"VPlaneICP set_target+align: {t_vplane:.3f}s (ref 0.420s)")

    t_ndt = timed_guarded("ndt", run_ndt)
    results["ndt"] = (t_ndt, 0.511)
    log(f"NDT set_target+align: {t_ndt:.3f}s (ref 0.511s)")

    # SLAM steady-state rows: the map is built ONCE and every scan pays only
    # align (the production serving shape — a LiDAR front end re-targets
    # rarely). vs_baseline keeps the reference's full set_target+align row:
    # the reference rebuilds its kd-tree per scan, this framework does not
    # have to.
    try:
        _s = pcr.VPlaneICP(voxel_size=voxel_size, max_iter=max_iter,
                           max_dist=max_dist, tol=tol)
        _s.set_target(map_pts)
        t_vp_am = timed(lambda: np.asarray(_s.align(scan)))
        results["vplane_icp_align_only"] = (t_vp_am, 0.420)
        log(f"VPlaneICP align-only (amortized set_target): {t_vp_am:.3f}s")
        _sn = pcr.NDT(voxel_size=voxel_size, max_iter=max_iter,
                      max_dist=max_dist, tol=tol)
        _sn.set_target(map_pts)
        t_ndt_am = timed(lambda: np.asarray(_sn.align(scan)))
        results["ndt_align_only"] = (t_ndt_am, 0.511)
        log(f"NDT align-only (amortized set_target): {t_ndt_am:.3f}s")
    except Exception as e:
        log("amortized rows failed:", repr(e))

    t_icp = timed_guarded("icp", run_icp, reps=5)
    results["icp"] = (t_icp, 0.502)
    log(f"ICP set_target+align: {t_icp:.3f}s (ref 0.502s)")

    # per-phase ICP breakdown (VERDICT r3 item 2: prove where the wall
    # goes) — blocked wall of the two halves of the row above
    phases = {}
    try:
        from point_cloud_registration_tpu.models.icp import build_icp_target
        from point_cloud_registration_tpu.core.config import ICPConfig as _ICfg

        _icfg = _ICfg(max_iter=max_iter, max_dist=max_dist, tol=tol)

        def _phase_build():
            tgt = build_icp_target(map_pts, _icfg)
            jax.block_until_ready(tgt.packed.pts_packed)
            return tgt

        phases["icp_build_s"] = round(timed(_phase_build), 4)
        _solver = pcr.ICP(max_iter=max_iter, max_dist=max_dist, tol=tol)
        _solver.set_target(map_pts)

        def _phase_align():
            return np.asarray(_solver.align(scan))

        phases["icp_align_s"] = round(timed(_phase_align), 4)
        log(f"  phases: {phases}")
    except Exception as e:
        log("icp phase breakdown failed:", repr(e))

    from point_cloud_registration_tpu.ops.normals import estimate_normals as estimate_normals_dev

    norm_backend = "auto"
    try:
        jax.block_until_ready(estimate_normals_dev(map_pts, k=15))  # warm/compile
    except Exception as e:
        log(f"normals: kernel path failed ({type(e).__name__}: {e}); "
            "falling back to backend='xla'")
        norm_backend = "xla"
        degraded.append("normals")
        jax.block_until_ready(estimate_normals_dev(map_pts, k=15, backend="xla"))
    # min over reps like the solvers (the remote-attach tunnel's sync
    # latency varies by tens of ms between calls)
    t_norm = None
    for _ in range(3):
        t0 = time.perf_counter()
        normals = estimate_normals_dev(map_pts, k=15, backend=norm_backend)
        jax.block_until_ready(normals)  # device-resident output
        dt = time.perf_counter() - t0
        t_norm = dt if t_norm is None else min(t_norm, dt)
    results["normals"] = (t_norm, 2.201)
    log(f"estimate_normals: {t_norm:.3f}s (ref 2.201s)")

    # throughput-mode row: skip the radius-4 exactness tier (the certified
    # fraction drops to the base tier's ~82%; normals themselves stay
    # k-NN-PCA over the base window — quantified, documented approximation)
    try:
        jax.block_until_ready(
            estimate_normals_dev(map_pts, k=15, exact_tail=False)
        )
        t_nf = None
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(
                estimate_normals_dev(map_pts, k=15, exact_tail=False)
            )
            dt = time.perf_counter() - t0
            t_nf = dt if t_nf is None else min(t_nf, dt)
        results["normals_fast"] = (t_nf, 2.201)
        log(f"estimate_normals (no exact tail): {t_nf:.3f}s (ref 2.201s)")
    except Exception as e:
        log("normals_fast failed:", repr(e))

    # certified k-NN exactness on the path the row above actually ran
    # (VERDICT r3 item 5: wire the evidence into the artifact) — the
    # per-point "exact" certificate is a lower bound, not an estimate
    normals_exact_frac = None
    try:
        _, _info = estimate_normals_dev(
            map_pts, k=15, backend=norm_backend, return_info=True
        )
        if _info.get("exact") is not None:
            normals_exact_frac = round(
                float(jnp.mean(_info["exact"].astype(jnp.float32))), 4
            )
            log(f"normals certified-exact fraction: {normals_exact_frac}")
    except Exception as e:
        log("normals exactness cert failed:", repr(e))

    t_picp = timed_guarded(
        "plane_icp", lambda backend=None: run_plane_icp(normals, backend), reps=5
    )
    results["plane_icp"] = (t_picp, 0.334)
    log(f"PlaneICP set_target+align (excl. normals): {t_picp:.3f}s (ref 0.334s)")

    # FastVPlaneICP (coreset two-phase, VERDICT r3 item 7): the reference's
    # own fast variant is bit-rotted (fast_voxelized_plane_icp.py:56-99
    # never ran), so there is no published baseline — the honest comparison
    # is against OUR VPlaneICP row above (fast_vs_vplane in the payload).
    fast_vs_vplane = None
    try:
        def run_fast():
            s = pcr.FastVPlaneICP(voxel_size=voxel_size, max_iter=max_iter,
                                  max_dist=max_dist, tol=tol)
            s.set_target(map_pts)
            return np.asarray(s.align(scan))

        t_fast = timed(run_fast)
        results["fast_vplane_icp"] = (t_fast, float("nan"))
        fast_vs_vplane = round(t_vplane / t_fast, 3)
        log(f"FastVPlaneICP set_target+align: {t_fast:.3f}s "
            f"({fast_vs_vplane:.2f}x our VPlaneICP)")
    except Exception as e:
        log("fast_vplane_icp failed:", repr(e))

    # voxel_filter on the full map (reference speed_test_comparison.py:174-182;
    # the reference does not publish this number, so no vs_baseline)
    def run_vfilter():
        out = pcr.voxel_filter(map_pts, voxel_size)
        jax.block_until_ready(out)
        return out

    t_vf = timed(run_vfilter)
    results["voxel_filter"] = (t_vf, float("nan"))
    log(f"voxel_filter 1.2M pts: {t_vf:.3f}s")

    # device-resident variant (VERDICT r3 item 4): the 201k-row result stays
    # on device (+inf padded, count alongside) for set_target/coreset
    # pipelines — no host crossing, which through this container's tunnel is
    # most of the wall above
    try:
        from point_cloud_registration_tpu.ops.voxelize import (
            voxel_filter_device_deferred,
        )

        _vfd_nd = []

        def run_vfilter_dev():
            means, n_cells, nd = voxel_filter_device_deferred(map_pts, voxel_size)
            jax.block_until_ready((means, n_cells))
            _vfd_nd.append(nd)

        t_vfd = timed(run_vfilter_dev)
        # deferred-hint contract: the validity scalar rides the next sync;
        # a nonzero count would mean the timed rows were clipped
        assert all(int(jax.device_get(nd)) == 0 for nd in _vfd_nd)
        results["voxel_filter_device"] = (t_vfd, float("nan"))
        log(f"voxel_filter_device 1.2M pts: {t_vfd:.3f}s")
    except Exception as e:
        log("voxel_filter_device failed:", repr(e))

    # Batched multi-scan registration throughput (SLAM front-end axis,
    # BASELINE.json configs[4]): B scans aligned against one prebuilt map.
    # On TPU the whole batch rides ONE fused-kernel stream per GN iteration
    # (models._fused.fused_voxel_align_batched); the shard_map/vmap XLA path
    # (parallel.align_batched_sharded) remains the multi-chip route.
    try:
        from point_cloud_registration_tpu.core.config import VPlaneICPConfig
        from point_cloud_registration_tpu.models import build_vplane_target
        from point_cloud_registration_tpu.models._fused import (
            fused_voxel_align_batched,
            scan_scaled_spec,
            use_fused,
        )
        from point_cloud_registration_tpu.ops.pallas.fused_align import voxel_fused_spec
        from point_cloud_registration_tpu.parallel import align_batched_sharded, make_mesh

        cfg = VPlaneICPConfig(voxel_size=voxel_size, max_iter=max_iter, max_dist=max_dist, tol=tol)
        target = build_vplane_target(map_pts, cfg)
        B, n_b = 8, 16384
        scans_np = np.stack(
            [make_scan(np.random.RandomState(100 + b), map_np, n_b) for b in range(B)]
        )
        scans = jax.device_put(jnp.asarray(scans_np))
        weights = jnp.ones((B, n_b), jnp.float32)
        init_Ts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
        # tq scaled to the 16k scans' density: a 512-query band tile of a
        # subsampled scan overflows the region clamp every iteration
        spec = scan_scaled_spec(
            voxel_fused_spec(target, "plane", max_dist=cfg.max_dist), n_b
        )
        mesh = make_mesh(batch=1, data=1)

        if use_fused(cfg.backend, spec):
            def run_batch():
                Ts, diag = fused_voxel_align_batched(
                    target, scans, weights, init_Ts, cfg, spec
                )
                jax.block_until_ready(Ts)
                return Ts
        else:
            def run_batch():
                out = align_batched_sharded("vplane_icp", target, scans, weights, init_Ts, cfg, mesh)
                jax.block_until_ready(out.T)
                return out

        t_batch = timed(run_batch)
        log(
            f"batched VPlaneICP: {B} x {n_b}-pt scans in {t_batch:.3f}s -> "
            f"{B / t_batch:.1f} registrations/s, {B * n_b / t_batch / 1e6:.2f} Mpts/s"
        )
        results["batched_regs_per_s"] = (B / t_batch, float("nan"))
        # BASELINE.json protocol asks for points/s alongside registrations/s
        results["batched_mpts_per_s"] = (B * n_b / t_batch / 1e6, float("nan"))

        # batched raw-point stream (ICP) on the tile-local CSR kernel
        from point_cloud_registration_tpu.core.config import ICPConfig
        from point_cloud_registration_tpu.models.icp import build_icp_target
        from point_cloud_registration_tpu.models._point_fused import (
            fused_point_align_batched,
            target_fused_rows,
        )
        from point_cloud_registration_tpu.ops.pallas.point_align import (
            point_fused_spec,
        )

        icp_cfg2 = ICPConfig(max_iter=max_iter, max_dist=max_dist, tol=tol,
                             fixed_tiers=True)
        icp_tgt = build_icp_target(map_pts, icp_cfg2)
        # hardware-swept spec (same winner as ICP.set_target); the dense
        # fused-row table is mandatory at cb=512 — the per-align
        # gather/transpose fallback materializes a layout-hostile >20 GB
        # intermediate under vmap
        pspec = point_fused_spec(icp_tgt.packed, "point", max_dist,
                                 tq=128, cb=512, radius=1)
        pfrows = target_fused_rows(pspec, icp_tgt.packed)
        if use_fused(icp_cfg2.backend, pspec) and pfrows is not None:
            def run_batch_icp():
                Ts, diag = fused_point_align_batched(
                    icp_tgt, None, scans, weights, init_Ts, icp_cfg2, pspec,
                    frows=pfrows,
                )
                jax.block_until_ready(Ts)
                return Ts

            t_bicp = timed(run_batch_icp)
            log(
                f"batched ICP (fused point stream): {B} x {n_b}-pt scans in "
                f"{t_bicp:.3f}s -> {B / t_bicp:.1f} registrations/s"
            )
            results["batched_icp_regs_per_s"] = (B / t_bicp, float("nan"))
    except Exception as e:  # keep the headline metric robust
        log("batched bench failed:", repr(e))

    # Scaling-efficiency protocol (BASELINE.json: >=0.8 efficiency):
    # RESOURCE-PROPORTIONAL virtual-device scaling on the CPU rig. Real
    # multi-chip scaling adds a full chip's compute per device; virtual CPU
    # devices share this host's cores, so the honest analogue pins each run
    # to as many physical cores as it has devices (taskset): 1 device on 1
    # core vs N devices on N cores. Without the pinning, XLA:CPU already
    # multithreads the 1-device run across every core and compute-bound
    # "efficiency" is capped at 1/N by construction (the r4/r5 runs'
    # 0.18-0.25 rows were exactly that artifact). Runs in CPU subprocesses
    # so it never contends for the TPU this bench holds. Skippable
    # (BENCH_SKIP_SCALING=1) — it compiles the sharded program per device
    # count on the CPU backend.
    scaling = None
    if not os.environ.get("BENCH_SKIP_SCALING"):
        try:
            import re
            import subprocess

            ncores = os.cpu_count() or 1
            n_scale = min(4, ncores)

            def _scaling_row(n_dev, cores):
                env = dict(os.environ)
                env["XLA_FLAGS"] = (
                    env.get("XLA_FLAGS", "")
                    + f" --xla_force_host_platform_device_count={n_dev}"
                ).strip()
                # CRITICAL: the axon sitecustomize hook dials the TPU relay
                # in EVERY python interpreter when this is set — a CPU child
                # claiming the relay while the parent holds the chip wedges
                # the data plane for ~10 minutes (observed repeatedly)
                env["PALLAS_AXON_POOL_IPS"] = ""
                cmd = ["taskset", "-c", cores, sys.executable,
                       os.path.join(os.path.dirname(__file__) or ".",
                                    "benchmark", "scaling.py"),
                       "--force-cpu", "--batch", "8", "--scan-points", "4096",
                       "--map-points", "200000", "--reps", "2",
                       "--only-devices", str(n_dev)]
                r = subprocess.run(cmd, capture_output=True, timeout=900,
                                   env=env, text=True)
                m = re.search(
                    r"\((\d+) devices\):\s+([\d.]+) registrations/s", r.stdout
                )
                if m is None:
                    log(f"scaling {n_dev}-dev row produced no output:",
                        (r.stdout + r.stderr)[-300:])
                    return None
                return float(m.group(2))

            r1 = _scaling_row(1, "0")
            rn = _scaling_row(n_scale, f"0-{n_scale - 1}")
            if r1 and rn:
                scaling = {
                    "protocol": "resource-proportional: N virtual devices "
                                "pinned to N physical cores",
                    "cpu1_regs_per_s_1core": round(r1, 2),
                    f"cpu{n_scale}_regs_per_s_{n_scale}core": round(rn, 2),
                    f"efficiency_{n_scale}dev": round(rn / (n_scale * r1), 3),
                    "host_cores": ncores,
                }
                log(f"scaling (resource-proportional CPU rig): {scaling}")
        except Exception as e:
            log("scaling harness failed:", repr(e))

    # Roofline / utilization (BASELINE north star "kernels at speed-of-light";
    # VERDICT r1 item 5): measured per-phase wall vs modeled HBM bytes and
    # MXU FLOPs, against v5e peaks (819 GB/s HBM; ~197 TFLOP/s bf16 MXU, /3
    # for the lossless three-pass bf16x3 gathers the fused kernel uses).
    roofline = {}
    try:
        roofline = roofline_report(jax, jnp, map_pts, scan, voxel_size, max_dist)
        for k, v in roofline.items():
            log(f"  roofline {k}: {v}")
    except Exception as e:
        log("roofline failed:", repr(e))

    for k, (t, ref) in results.items():
        log(f"  {k:12s} {t:7.3f}s  vs_baseline x{ref / t:.2f}")

    t, ref = results["vplane_icp"]
    payload = {
        "metric": "vplane_icp_1.2Mmap_100kscan_settarget_align_wall_clock",
        "value": round(t, 4),
        "unit": "s",
        "vs_baseline": round(ref / t, 3),
        # every per-method wall-clock in the one driver-captured line:
        # {name: [seconds, x_vs_published_reference]} (reg/s rows: [rate, null])
        "all": {
            k: [round(tv, 4), (round(rv / tv, 3) if np.isfinite(rv) else None)]
            for k, (tv, rv) in results.items()
        },
    }
    if roofline:
        payload["roofline"] = roofline
    if phases:
        payload["phases"] = phases
    if normals_exact_frac is not None:
        payload["normals_exact_frac"] = normals_exact_frac
    if fast_vs_vplane is not None:
        payload["fast_vs_vplane"] = fast_vs_vplane
    if scaling:
        payload["scaling"] = scaling
    if degraded:
        # these rows ran the XLA gather path because the fused-kernel path
        # failed (e.g. Mosaic compile error) — see stderr for the reasons
        payload["degraded"] = degraded
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
