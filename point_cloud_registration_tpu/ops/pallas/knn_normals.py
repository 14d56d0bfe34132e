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


def _p_pad(p: int) -> int:
    """Probe count padded to a multiple of the MXU batch group (12)."""
    g = min(p, 12)
    return -(-p // g) * g


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

    G = min(P, 12)  # probes per MXU batch
    n_groups = -(-P // G)
    P_pad = n_groups * G

    def kernel(q_ref, w_ref, keys_ref, flags_ref, tab_ref, out_ref,
               ddx_ref, ddy_ref, ddz_ref, d2_ref, m_ref, br_ref):
        q = q_ref[...]  # (TQ, 3)
        w_in = w_ref[...][:, 0]
        keys = keys_ref[0, 0, :]
        flags = flags_ref[0, 0, :]  # 1 where the entry's block was cap-truncated
        tab = tab_ref[0]
        parts = split_bf16(tab)

        # window origin from the SAME helper the table builder uses — the
        # key-equality one-hot requires bit-identical binning on both sides
        gx, gy, gz = _fused_block(spec, q)

        # candidate stash over all probes: deltas + distances land in FLAT
        # (TQ, P_pad * NC) scratch VMEM — one dynamic 128-aligned lane slice
        # per probe — so every later sweep (selection, moments) is a single
        # full-width vector op instead of a fori_loop over probe pages
        # (measured: the paged sweeps made selection ~2x slower from loop
        # overhead alone). Probes are gathered in groups of ``G``: the G
        # one-hot masks stack into one (G*TQ, CB) operand so the MXU runs
        # one deep matmul per group instead of G shallow ones. The group
        # loop is a fori_loop and per-probe delta extraction re-reads
        # ``br_ref`` through dynamic sublane slices: a python-unrolled
        # loop's temporaries are SUMMED into the kernel's static stack
        # frame (45 probes x ~1.2 MB ~= 56 MB, a hardware-only failure that
        # interpret mode does not flag). Probe offsets are derived
        # arithmetically from the probe index (the probe set is the regular
        # spans grid) — a captured offset table would be a pallas constant,
        # which pallas_call rejects.

        def probe_key(p_i):
            bx = gx + p_i % psx
            by = gy + (p_i // psx) % psy
            bz = gz + p_i // (psx * psy)
            ok = (
                (bx >= 0) & (bx < nb2x)
                & (by >= 0) & (by < nb2y)
                & (bz >= 0) & (bz < nb2z)
            )
            if P_pad != P:
                ok = ok & (p_i < P)  # padding probes in the last group
            return jnp.where(ok, bx + nb2x * (by + nb2y * bz), -1), ok

        def group_body(g, carry):
            miss, cap_hit = carry
            for j in range(G):
                p_i = g * G + j
                pk, ok = probe_key(p_i)
                match = pk[:, None] == keys[None, :]
                matched = jnp.sum(match.astype(jnp.int32), axis=1) > 0
                miss = jnp.maximum(
                    miss, (ok & jnp.logical_not(matched)).astype(jnp.int32)
                )
                # window touches a truncated block: candidates were dropped
                # at pack time, so the k-set here is NOT provably exact
                cap_hit = jnp.maximum(
                    cap_hit,
                    jnp.sum(match.astype(jnp.int32) * flags[None, :], axis=1),
                )
                m_ref[j * TQ : (j + 1) * TQ, :] = match.astype(jnp.bfloat16)
            br_ref[...] = onehot_gather(m_ref[...], parts)

            def delta_body(j, carry_in):
                p_i = g * G + j
                rows = br_ref[pl.ds(j * TQ, TQ), :]
                ddx = q[:, 0:1] - rows[:, 0:NC]
                ddy = q[:, 1:2] - rows[:, NC : 2 * NC]
                ddz = q[:, 2:3] - rows[:, 2 * NC : 3 * NC]
                d2 = ddx * ddx + ddy * ddy + ddz * ddz
                # unmatched probes gathered all-zero rows: their fake
                # distances |q|^2 are swept out by re-deriving the match
                # bit from the one-hot stash itself
                mm = m_ref[pl.ds(j * TQ, TQ), :].astype(jnp.float32)
                live = jnp.sum(mm, axis=1) > 0
                d2 = jnp.where(live[:, None], d2, _MISS_D2)
                off = pl.multiple_of(p_i * NC, 128)
                ddx_ref[:, pl.ds(off, NC)] = ddx
                ddy_ref[:, pl.ds(off, NC)] = ddy
                ddz_ref[:, pl.ds(off, NC)] = ddz
                d2_ref[:, pl.ds(off, NC)] = d2
                return carry_in

            jax.lax.fori_loop(0, G, delta_body, 0)
            return miss, cap_hit

        miss0 = jnp.zeros((TQ,), jnp.int32)
        cap0 = jnp.zeros((TQ,), jnp.int32)
        miss, cap_hit = jax.lax.fori_loop(0, n_groups, group_body, (miss0, cap0))

        # exact k-th distance: next-min threshold ascent. Each step consumes
        # every candidate tied at the current threshold (ties counted, not
        # re-visited), so k steps suffice for k neighbors. One fused
        # full-width sweep per step: the count for step i shares the load
        # with nothing else (cnt needs nxt_i), so cnt is accumulated
        # INCREMENTALLY — count(thr < d2 <= nxt) — in the same sweep that
        # would otherwise only find nxt.
        # (r5 note: a bisection pre-bracket was tried and reverted — the
        # fori_loop trip count is static, so the extra count sweeps ADD to
        # the k ascent sweeps instead of replacing them; measured +0.1 s at
        # bench scale.)
        # int32 loop carries (not bool): Mosaic's proven pattern in the
        # align kernels' fori_loops
        def sel_body(_, carry):
            thr, rk, cnt, done = carry
            d2a = d2_ref[...]
            above = d2a > thr[:, None]
            nxt = jnp.min(jnp.where(above, d2a, _MISS_D2), axis=1)
            cnt = cnt + jnp.sum(
                (above & (d2a <= nxt[:, None]) & (d2a < inv_found)).astype(
                    jnp.int32
                ),
                axis=1,
            )
            reached = (cnt >= k).astype(jnp.int32)
            rk = jnp.where((reached > 0) & (done == 0), nxt, rk)
            return nxt, rk, cnt, jnp.maximum(done, reached)

        thr0 = jnp.full((TQ,), -1.0, jnp.float32)
        rk0 = jnp.full((TQ,), _MISS_D2, jnp.float32)
        cnt0 = jnp.zeros((TQ,), jnp.int32)
        done0 = jnp.zeros((TQ,), jnp.int32)
        _, rk, _, done_i = jax.lax.fori_loop(
            0, k, sel_body, (thr0, rk0, cnt0, done0)
        )
        done = done_i > 0

        # selection mask: the k nearest (all real candidates when the window
        # holds fewer than k — those queries are flagged unresolved).
        # Single full-width sweep; ten lane reductions share the four loads.
        d2a = d2_ref[...]
        selc = ((d2a < inv_found) & (d2a <= rk[:, None])).astype(jnp.float32)
        dxc = ddx_ref[...]
        dyc = ddy_ref[...]
        dzc = ddz_ref[...]
        cnt = jnp.sum(selc, axis=1)
        sdx = selc * dxc
        sdy = selc * dyc
        sdz = selc * dzc
        sx = jnp.sum(sdx, axis=1)
        sy = jnp.sum(sdy, axis=1)
        sz = jnp.sum(sdz, axis=1)
        c00 = jnp.sum(sdx * dxc, axis=1)
        c11 = jnp.sum(sdy * dyc, axis=1)
        c22 = jnp.sum(sdz * dzc, axis=1)
        c01 = jnp.sum(sdx * dyc, axis=1)
        c02 = jnp.sum(sdx * dzc, axis=1)
        c12 = jnp.sum(sdy * dzc, axis=1)
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
            pltpu.VMEM((TQ, _p_pad(len(spec.probes)) * spec.cs), jnp.float32)
            for _ in range(4)
        ] + [
            pltpu.VMEM(
                (min(len(spec.probes), 12) * TQ, CB), jnp.bfloat16
            ),
            pltpu.VMEM(
                (min(len(spec.probes), 12) * TQ, W), jnp.float32
            ),
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
