"""Fused k-NN PCA moments kernel (K4) — normal estimation's hot path.

The reference pipeline (/root/reference/point_cloud_registration/
estimate_normals.py:27-87) is kd-tree k-NN + per-neighbor accumulation +
LAPACK eigh. The XLA re-design (ops/normals.py) replaced the tree with
packed-block window gathers, but at 1M+ points the row-bound gathers still
dominate (~9.6M gather rows per pass). This kernel removes them with the
same tile-local CSR machinery as the point-align kernel
(ops/pallas/point_align.py): Morton tiles, per-tile fused-block key lists,
key-equality one-hot MXU gathers from the bf16x3-split local table.

Per tile it fuses, entirely in VMEM:

* candidate fetch over the ``radius``-cell probe window (radius 2 by
  default — the same provable-exactness radius as the XLA path's
  exact-tail tier: any k-neighborhood within ``2 * cell`` is exact);
* query-centered distance + delta stash over all window candidates;
* exact k-th-distance extraction (k iterations of next-min threshold —
  ties are consumed together and counted, see ``count`` output);
* masked first/second query-centered moments -> the 6 covariance entries
  (identical algebra to ops/normals.normals_from_neighbors: divisor =
  selected count, query-centered so float32-stable at any range).

Output per query: ``[c00 c11 c22 c01 c02 c12, count, rk2, unresolved]``.
The caller runs the closed-form 3x3 eigensolver (ops/eigh3) on the
covariances and re-solves unresolved queries (window held fewer than k
candidates, or a drifted/overflowed key list) on the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from point_cloud_registration_tpu.ops.knn import FOUND_MAX
from point_cloud_registration_tpu.ops.pallas._gather import (
    onehot_gather,
    split_bf16 as _split_bf16,
)
from point_cloud_registration_tpu.ops.pallas.fused_align import _MISS_D2
from point_cloud_registration_tpu.ops.pallas.point_align import (
    PointFusedSpec,
    _fused_block,
)

_N_OUT = 16  # output stat rows (10 used, padded to the sublane tiling)


def knn_moments_spec(pg, radius: int = 2, tq: int = 256,
                     cb: int = 256) -> PointFusedSpec | None:
    """Spec for the k-NN moments kernel over a packed grid (host-side)."""
    if pg is None:
        return None
    if cb % 128:  # config error: propagate, don't silently disable
        raise ValueError("cb must be a multiple of the 128-lane tiling")
    width = int(pg.pts_packed.shape[1] // pg.idx_packed.shape[1])
    if width != 3:
        return None
    try:
        return PointFusedSpec(
            kind="point",
            cell=float(pg.cell_fine),
            origin_fine=tuple(int(x) for x in np.asarray(pg.origin_fine)),
            nb_dims=tuple(int(x) for x in np.asarray(pg.nb_dims)),
            cap=int(pg.idx_packed.shape[1]),
            width=width,
            cb=cb,
            tq=tq,
            max_dist=float("inf"),
            radius=radius,
        )
    except ValueError:
        return None


def _make_knn_kernel(spec: PointFusedSpec, k: int):
    TQ, CB = spec.tq, spec.cb
    NC = spec.cs
    WA = 3 * NC
    nb2x, nb2y, nb2z = spec.nb2_dims
    inv_found = np.float32(FOUND_MAX) ** 2
    n_split = 3 if spec.gather_precision == "highest" else 1
    probes = spec.probes
    # provable-exactness bound: the probe window covers the closed ball of
    # radius * cell, so rk2 below its square proves the k-set is exact
    exact_d2 = np.float32((spec.radius * spec.cell) ** 2)

    def split_bf16(a):
        # lossless bf16x3 split + one-hot MXU gather: ops/pallas/_gather.py
        return _split_bf16(a, n_split)

    P = len(probes)
    # probes enumerate the spans grid as dx + sx*(dy + sy*dz) — probe_body
    # inverts that ordering arithmetically
    psx, psy = spec.spans[0], spec.spans[1]

    def kernel(q_ref, w_ref, keys_ref, flags_ref, tab_ref, out_ref,
               ddx_ref, ddy_ref, ddz_ref, d2_ref):
        q = q_ref[...]  # (TQ, 3)
        w_in = w_ref[...][:, 0]
        keys = keys_ref[0, 0, :]
        flags = flags_ref[0, 0, :]  # 1 where the entry's block was cap-truncated
        tab = tab_ref[0]
        parts = split_bf16(tab)

        # window origin from the SAME helper the table builder uses — the
        # key-equality one-hot requires bit-identical binning on both sides
        gx, gy, gz = _fused_block(spec, q)

        # candidate stash over all probes: deltas + distances land in 3-D
        # (P, TQ, NC) scratch VMEM, one major-dim page per probe. Two Mosaic
        # facts shape this (both discovered on hardware — interpret mode
        # flags neither): (a) a value-level concat of per-probe pieces keeps
        # TWO copies of the stash live; (b) a python-unrolled probe loop's
        # temporaries are SUMMED into the kernel's static stack frame (45
        # probes × ~1.2 MB of gather temporaries ≈ 56 MB). A fori_loop over
        # probes bounds the frame to one iteration's temporaries. Probe
        # offsets are derived arithmetically from p_i (the probe set is the
        # regular spans grid; same formulation as the align kernel's
        # probe_body) — a captured offset table would be a pallas constant,
        # which pallas_call rejects.

        def probe_body(p_i, carry):
            miss, cap_hit = carry
            bx = gx + p_i % psx
            by = gy + (p_i // psx) % psy
            bz = gz + p_i // (psx * psy)
            ok = (
                (bx >= 0) & (bx < nb2x)
                & (by >= 0) & (by < nb2y)
                & (bz >= 0) & (bz < nb2z)
            )
            pk = jnp.where(ok, bx + nb2x * (by + nb2y * bz), -1)
            match = pk[:, None] == keys[None, :]
            matched = jnp.sum(match.astype(jnp.int32), axis=1) > 0
            miss = jnp.maximum(
                miss, (ok & jnp.logical_not(matched)).astype(jnp.int32)
            )
            # window touches a truncated block: candidates were dropped at
            # pack time, so the k-set here is NOT provably exact
            cap_hit = jnp.maximum(
                cap_hit, jnp.sum(match.astype(jnp.int32) * flags[None, :], axis=1)
            )
            rows = onehot_gather(match, parts)
            ddx = q[:, 0:1] - rows[:, 0:NC]
            ddy = q[:, 1:2] - rows[:, NC : 2 * NC]
            ddz = q[:, 2:3] - rows[:, 2 * NC : 3 * NC]
            d2 = ddx * ddx + ddy * ddy + ddz * ddz
            d2 = jnp.where(matched[:, None], d2, _MISS_D2)
            ddx_ref[p_i, :, :] = ddx
            ddy_ref[p_i, :, :] = ddy
            ddz_ref[p_i, :, :] = ddz
            d2_ref[p_i, :, :] = d2
            return miss, cap_hit

        miss0 = jnp.zeros((TQ,), jnp.int32)
        cap0 = jnp.zeros((TQ,), jnp.int32)
        miss, cap_hit = jax.lax.fori_loop(0, P, probe_body, (miss0, cap0))

        # exact k-th distance: next-min threshold ascent. Each step consumes
        # every candidate tied at the current threshold (ties counted, not
        # re-visited), so k steps suffice for k neighbors. Both reductions
        # stream over (TQ, NC) probe pages of the scratch so no full-width
        # (TQ, P*NC) temporary ever materializes.
        # int32 loop carries (not bool): Mosaic's proven pattern in the
        # align kernels' fori_loops
        def sel_body(_, carry):
            thr, rk, done = carry

            def min_body(p_i, nxt):
                d2c = d2_ref[p_i, :, :]
                return jnp.minimum(
                    nxt,
                    jnp.min(jnp.where(d2c > thr[:, None], d2c, _MISS_D2), axis=1),
                )

            nxt = jax.lax.fori_loop(
                0, P, min_body, jnp.full((TQ,), _MISS_D2, jnp.float32)
            )

            def cnt_body(p_i, cnt):
                d2c = d2_ref[p_i, :, :]
                return cnt + jnp.sum(
                    ((d2c <= nxt[:, None]) & (d2c < inv_found)).astype(jnp.int32),
                    axis=1,
                )

            cnt = jax.lax.fori_loop(0, P, cnt_body, jnp.zeros((TQ,), jnp.int32))
            reached = (cnt >= k).astype(jnp.int32)
            rk = jnp.where((reached > 0) & (done == 0), nxt, rk)
            return nxt, rk, jnp.maximum(done, reached)

        thr0 = jnp.full((TQ,), -1.0, jnp.float32)
        rk0 = jnp.full((TQ,), _MISS_D2, jnp.float32)
        done0 = jnp.zeros((TQ,), jnp.int32)
        _, rk, done_i = jax.lax.fori_loop(0, k, sel_body, (thr0, rk0, done0))
        done = done_i > 0

        # selection mask: the k nearest (all real candidates when the window
        # holds fewer than k — those queries are flagged unresolved).
        # Moments accumulate page-wise for the same VMEM reason as above.
        def mom_body(p_i, acc):
            d2c = d2_ref[p_i, :, :]
            selc = ((d2c < inv_found) & (d2c <= rk[:, None])).astype(jnp.float32)
            dxc = ddx_ref[p_i, :, :]
            dyc = ddy_ref[p_i, :, :]
            dzc = ddz_ref[p_i, :, :]
            return (
                acc[0] + jnp.sum(selc, axis=1),
                acc[1] + jnp.sum(selc * dxc, axis=1),
                acc[2] + jnp.sum(selc * dyc, axis=1),
                acc[3] + jnp.sum(selc * dzc, axis=1),
                acc[4] + jnp.sum(selc * dxc * dxc, axis=1),
                acc[5] + jnp.sum(selc * dyc * dyc, axis=1),
                acc[6] + jnp.sum(selc * dzc * dzc, axis=1),
                acc[7] + jnp.sum(selc * dxc * dyc, axis=1),
                acc[8] + jnp.sum(selc * dxc * dzc, axis=1),
                acc[9] + jnp.sum(selc * dyc * dzc, axis=1),
            )

        zeros_f = jnp.zeros((TQ,), jnp.float32)
        cnt, sx, sy, sz, c00, c11, c22, c01, c02, c12 = jax.lax.fori_loop(
            0, P, mom_body, (zeros_f,) * 10
        )
        denom = jnp.maximum(cnt, 1.0)
        sx = sx / denom
        sy = sy / denom
        sz = sz / denom
        c00 = c00 / denom - sx * sx
        c11 = c11 / denom - sy * sy
        c22 = c22 / denom - sz * sz
        c01 = c01 / denom - sx * sy
        c02 = c02 / denom - sx * sz
        c12 = c12 / denom - sy * sz

        live = w_in > 0
        unresolved = (jnp.logical_not(done) | (miss > 0)) & live
        # a missed probe means part of the provable window was never
        # consulted — rk is then only an upper bound, so the certificate
        # must not fire (exact is a per-point lower-bound guarantee)
        exact = done & (rk < exact_d2) & (cap_hit == 0) & (miss == 0)

        zeros = jnp.zeros_like(cnt)
        rows_out = (
            c00, c11, c22, c01, c02, c12,
            cnt, rk,
            unresolved.astype(jnp.float32),
            exact.astype(jnp.float32),
        )
        for i, v in enumerate(rows_out):
            out_ref[0, i, :] = v
        for i in range(len(rows_out), _N_OUT):
            out_ref[0, i, :] = zeros

    return kernel


@partial(jax.jit, static_argnames=("spec", "k", "interpret"))
def knn_moments_call(spec: PointFusedSpec, k: int, keys, flags, tab, q, w, *,
                     interpret=False):
    """Run the k-NN moments kernel over Morton-tiled queries.

    Returns ``(cov6 (N, 6), count (N,), rk2 (N,), unresolved (N,) bool,
    exact (N,) bool)`` in the tile layout (caller un-scatters by its
    ``pos`` map).
    """
    n = q.shape[0]
    TQ, CB = spec.tq, spec.cb
    W = spec.row_width
    n_tiles = -(-n // TQ)
    n_pad = n_tiles * TQ
    if keys.shape != (n_tiles, CB) or tab.shape != (n_tiles, CB, W):
        raise ValueError(
            f"tile tables {keys.shape}/{tab.shape} do not match spec "
            f"({(n_tiles, CB)}/{(n_tiles, CB, W)})"
        )
    if n_pad != n:
        q = jnp.concatenate([q, jnp.broadcast_to(q[-1:], (n_pad - n, 3))])
        w = jnp.concatenate([w, jnp.zeros((n_pad - n,), w.dtype)])

    out = pl.pallas_call(
        _make_knn_kernel(spec, k),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TQ, 3), lambda i: (i, 0)),
            pl.BlockSpec((TQ, 1), lambda i: (i, 0)),
            # (n_tiles, 1, CB) so the trailing block dims equal the array
            # dims — Mosaic rejects a (1, CB) block over (n_tiles, CB); see
            # point_align.point_stats_call for the same constraint.
            pl.BlockSpec((1, 1, CB), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, CB), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, CB, W), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _N_OUT, TQ), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, _N_OUT, TQ), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((len(spec.probes), TQ, spec.cs), jnp.float32)
            for _ in range(4)
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(q, w[:, None], keys[:, None, :], flags[:, None, :], tab)
    flat = jnp.transpose(out, (0, 2, 1)).reshape(n_pad, _N_OUT)[:n]
    cov6 = flat[:, 0:6]
    count = flat[:, 6]
    rk2 = flat[:, 7]
    unresolved = flat[:, 8] > 0
    exact = flat[:, 9] > 0
    return cov6, count, rk2, unresolved, exact
