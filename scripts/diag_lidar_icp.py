"""Diagnose the LiDAR-scene ICP accuracy gap (gt 0.0147 vs ref 0.0005).

Checks, on CPU with the XLA packed path (same packed grid the fused kernel
tables inherit):
  1. packed-grid truncation stats on the lidar map (range-skewed density)
  2. correspondence field vs exact NN at the true alignment
  3. H/g bias the mismatches introduce
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402

rng = np.random.RandomState(42)
map_np = bench.make_lidar_map(rng)
scan_np = bench.make_scan(rng, map_np)
print("map", map_np.shape, "scan", scan_np.shape, flush=True)

from point_cloud_registration_tpu.core.config import ICPConfig  # noqa: E402
from point_cloud_registration_tpu.models.icp import build_icp_target  # noqa: E402

cfg = ICPConfig(max_iter=30, max_dist=2.0, tol=1e-3)
tgt = build_icp_target(map_np, cfg)
pg = tgt.packed
print("packed grid: cell_fine", float(pg.cell_fine), "pts_packed",
      pg.pts_packed.shape, flush=True)

# truncation: how many map points never made it into the packed table?
idx_packed = np.asarray(pg.idx_packed)
row_over = np.asarray(pg.row_over)
stored = int((idx_packed >= 0).sum())
n_rows = int((np.asarray(pg.row_key) >= 0).sum())
print(f"rows {n_rows}, cap/block {idx_packed.shape[1]}, stored {stored} of "
      f"{len(map_np)} ({1 - stored / len(map_np):.3%} dropped), truncated "
      f"rows {int(row_over.sum())} ({row_over[:n_rows].mean():.3%})",
      flush=True)

# correspondence check at the TRUE alignment (scan moved back by -0.3 z)
from scipy.spatial import cKDTree  # noqa: E402

T_true_inv = np.eye(4, dtype=np.float32)
T_true_inv[2, 3] = -0.3
q = scan_np + T_true_inv[:3, 3]

from point_cloud_registration_tpu.models._point_corr import match_points  # noqa: E402

sub = np.random.RandomState(0).choice(len(q), 20000, replace=False)
qs = jnp.asarray(q[sub])
nn = match_points(tgt, qs, cfg.corr, cfg.max_dist)
idx_ours = np.asarray(nn.point_idx)
d_ours = np.linalg.norm(q[sub] - np.asarray(nn.target), axis=1).astype(np.float32)

tree = cKDTree(map_np)
d_ref, idx_ref = tree.query(q[sub], k=1)

valid = idx_ours >= 0
mismatch = (idx_ours != idx_ref) & valid
print(f"resolved {valid.mean():.4f}, NN index mismatch {mismatch.mean():.4f}",
      flush=True)
dd = d_ours[valid] - d_ref[valid].astype(np.float32)
print(f"dist excess: mean {dd.mean():.6f} p99 {np.percentile(dd, 99):.6f} "
      f"max {dd.max():.6f}", flush=True)

# residual-vector bias: sum of (q - nn) over the subset, ours vs exact
tgt_pts_ours = map_np[np.clip(idx_ours, 0, len(map_np) - 1)]
tgt_pts_ref = map_np[idx_ref]
r_ours = (q[sub] - tgt_pts_ours)[valid]
r_ref = (q[sub] - tgt_pts_ref)[valid]
print("mean residual ours:", r_ours.mean(axis=0), flush=True)
print("mean residual ref :", r_ref.mean(axis=0), flush=True)
