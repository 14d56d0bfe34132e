"""Device-mesh helpers.

The reference is a single-process NumPy library with no distribution layer
(SURVEY §2.3); the TPU framework's scaling axes are

* ``data`` — scan points sharded across chips; each Gauss-Newton iteration
  all-reduces only the (6x6 H, 6 g, e2, inlier-count) tuple (~40 floats) over
  ICI, so data parallelism is near-embarrassingly parallel;
* ``batch`` — many (scan, init_T) problems against one replicated map, the
  SLAM front-end throughput axis (BASELINE.json configs[4]).

Maps are replicated (voxel maps are tens of MB); map sharding for
beyond-HBM maps routes queries by voxel key and is a planned extension.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    batch: int = 1,
    data: int | None = None,
    *,
    devices=None,
) -> Mesh:
    """Build a (batch, data) mesh over ``devices`` (default: all).

    ``data`` defaults to ``len(devices) // batch``. A 1-chip mesh is valid
    (shard_map degenerates to the single-chip program), so the same align
    code path runs everywhere.
    """
    if devices is None:
        devices = jax.devices()
    if data is None:
        data = len(devices) // batch
    n = batch * data
    if n > len(devices):
        raise ValueError(f"mesh {batch}x{data} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(batch, data)
    return Mesh(dev_array, axis_names=("batch", "data"))
