"""Shared exact-f32 one-hot MXU gather helpers for the Pallas kernels.

The one mechanism every kernel in this package is built on: rows are fetched
from a VMEM-resident table by a boolean one-hot matmul on the MXU, with the
table decomposed into a lossless 3-way bf16 split so the f32 row is
reconstructed bit-for-bit in 3 MXU passes (vs 6 for ``Precision.HIGHEST``).
One definition, used by ``fused_align``, ``point_align`` and
``knn_normals`` — a precision or Mosaic-workaround fix lands everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_bf16(a, n_split: int = 3):
    """Lossless 3-way bf16 decomposition (hi + mid + lo == a exactly):
    a one-hot matmul against each part is an exact bf16 row copy, so their
    f32 sum reconstructs the f32 row bit-for-bit. ``n_split=1`` keeps only
    the hi part (fast approximate mode)."""
    hi = a.astype(jnp.bfloat16)
    r1 = a - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return (hi, mid, lo)[:n_split]


def onehot_gather(oh_mask, parts):
    """(TQ, NR) boolean one-hot x split table parts -> exact f32 rows."""
    oh = oh_mask.astype(jnp.bfloat16)
    out = None
    for part in parts:
        d = jax.lax.dot_general(
            oh, part, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = d if out is None else out + d
    return out
