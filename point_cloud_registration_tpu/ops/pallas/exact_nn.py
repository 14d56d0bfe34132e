"""Exact 1-NN as a Pallas TPU kernel — the bit-exact correspondence engine.

SURVEY §7 mandates an exact-mode fallback ("brute-force tiled distance") for
bit-level validation of the approximate grid engines. The XLA realization
(ops/knn.brute_force_nn) materializes a (tile, N_ref) distance matrix per
scan step through HBM; this kernel keeps everything resident in VMEM: the
query tile and the running (best d2, best index) accumulators stay on-chip
across all reference tiles, so HBM traffic is exactly one read of the
reference cloud per query tile — the streaming lower bound.

Grid: (query_tiles, ref_tiles), ref innermost; the outputs' index_map ignores
the ref axis, so Mosaic keeps their blocks in VMEM as revolving accumulators
(initialized at ref step 0, flushed after the last step).

Distances expand as (qx - rx)^2 + (qy - ry)^2 + (qz - rz)^2 on the VPU —
a K=3 matmul would waste the MXU (3/128 utilization).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TQ = 1024  # query tile (matches XLA 1-D tiling {0:T(1024)} for f32 outputs)
_TR = 512  # reference tile


def _kernel(q_ref, r_ref, dist_ref, idx_ref):
    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _():
        dist_ref[:] = jnp.full((_TQ,), jnp.inf, jnp.float32)
        idx_ref[:] = jnp.full((_TQ,), -1, jnp.int32)

    q = q_ref[:]  # (TQ, 3)
    r = r_ref[:]  # (TR, 3)
    dx = q[:, 0:1] - r[:, 0][None, :]  # (TQ, TR)
    dy = q[:, 1:2] - r[:, 1][None, :]
    dz = q[:, 2:3] - r[:, 2][None, :]
    d2 = dx * dx + dy * dy + dz * dz
    local_min = jnp.min(d2, axis=1)
    local_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + ri * _TR
    better = local_min < dist_ref[:]
    dist_ref[:] = jnp.where(better, local_min, dist_ref[:])
    idx_ref[:] = jnp.where(better, local_arg, idx_ref[:])


@partial(jax.jit, static_argnames=("interpret",))
def _call(qpad, rpad, *, interpret):
    nq, nr = qpad.shape[0], rpad.shape[0]
    grid = (nq // _TQ, nr // _TR)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TQ, 3), lambda qi, ri: (qi, 0)),
            pl.BlockSpec((_TR, 3), lambda qi, ri: (ri, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_TQ,), lambda qi, ri: (qi,)),
            pl.BlockSpec((_TQ,), lambda qi, ri: (qi,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq,), jnp.float32),
            jax.ShapeDtypeStruct((nq,), jnp.int32),
        ],
        interpret=interpret,
    )(qpad, rpad)


def exact_nn_pallas(query, ref, *, interpret: bool | None = None):
    """Exact nearest reference point for every query: -> (dist (N,), idx (N,)).

    ``interpret`` defaults to True off-TPU (tests on the CPU mesh run the
    kernel through the Pallas interpreter, so one code path is validated
    everywhere).
    """
    query = jnp.asarray(query, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nq, nr = query.shape[0], ref.shape[0]
    nq_pad = -(-nq // _TQ) * _TQ
    nr_pad = -(-nr // _TR) * _TR
    qpad = jnp.concatenate([query, jnp.zeros((nq_pad - nq, 3), jnp.float32)], axis=0)
    # padding rows sit far away so they can never win
    rpad = jnp.concatenate([ref, jnp.full((nr_pad - nr, 3), 1e30, jnp.float32)], axis=0)
    d2, idx = _call(qpad, rpad, interpret=bool(interpret))
    return jnp.sqrt(d2[:nq]), idx[:nq]
