"""Training-mode fused Conv-TasNet TCN trunk: Pallas forward AND backward.

The serving kernel (ops/tcn_pallas.py) keeps the whole 21-block trunk in
VMEM but is forward-only. Training pays the trunk's HBM bill twice more:
XLA's backward re-reads every materialized intermediate. This module makes
the trunk a ``jax.custom_vjp`` with both passes as Pallas programs:

- **forward** (grid over batch): same VMEM-resident block chain as serving,
  plus it saves the only residuals backward needs — each block's *input*
  ``h`` (bottleneck-width, DMA'd to an HBM-resident output while compute
  continues) and the four gLN statistics per block. Hidden-width
  intermediates (expand/depthwise tensors) are never written.
- **backward** (grid over batch): walks blocks in reverse; per block it
  *recomputes* the hidden-width tensors from the saved ``h`` in VMEM
  (phase-A matmul + the same halo'd dilated-tap pass as forward, using the
  saved statistics so recomputation is bit-consistent), then computes all
  parameter gradients and the carried ``dh``. Weight gradients are written
  per (item, block) and summed over the batch by XLA outside — cheap, and
  it keeps every grid step write-disjoint.

gLN backward over a normalization group of N = K·ch elements:
    dx = s · (dxhat − mean(dxhat) − xhat · mean(dxhat·xhat))
with ``dxhat = dn · gamma``; the two means are streamed as scalar
accumulators over chunks (one pass to accumulate, one to apply), mirroring
the forward's two-phase stats structure. SAME zero-padding of the
*normalized* tensor is honored exactly as in forward (edge-chunk
corrections); the conv transpose in backward needs no corrections because
the cotangent slab is zero outside the valid region.

The custom_vjp is exposed through :func:`tcn_trunk_train` over *canonical*
stacked parameter arrays built by :func:`stack_canonical` (pure
differentiable jnp), so ``jax.grad`` maps kernel gradients back onto the
``ConvTasNet`` param pytree automatically.

Numerics: matmuls bf16 with fp32 accumulation, statistics/epilogues fp32,
stored slabs bf16, gradient accumulators fp32 — the same contract as
``ConvTasNet(dtype=jnp.bfloat16)`` training. Reference lineage: same
compute as ``models/tasnet.py`` (beyond-parity model; the reference stops
at a conv-frontend + BLSTM precursor, `Raw_with_Convlayer.ipynb cell 13`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stack_canonical", "tcn_trunk_train", "trunk_reference"]

_HALO = 64  # >= max dilation; pad rows each side of hidden-width slabs
_EPS = 1e-8
# storage dtype for VMEM slabs and matmul operands; tests may set to float32
# to verify the backward math independently of bf16 accumulation
_SLAB = jnp.bfloat16


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


# ---------------------------------------------------------------------------
# canonical parameter stacking (differentiable host-side prep)
# ---------------------------------------------------------------------------


def stack_canonical(params, *, blocks: int, repeats: int):
    """Stack per-block ConvTasNet params into canonical kernel arrays.

    Returns ``(we, wdw, wcat, vecs)``:
      we   [N, cb, ch]   expand 1x1 kernels
      wdw  [N, taps, ch] depthwise kernels
      wcat [N, ch, 2cb]  concat(res, skip) 1x1 kernels
      vecs [N, 10, vdim] per-block vectors (vdim = max(ch, 2cb)):
        0: expand bias   1: norm1 gamma  2: norm1 beta   3: depthwise bias
        4: norm2 gamma   5: norm2 beta   6: bcat (padded) 7: spare (zeros)
        8: prelu1 alpha (broadcast)      9: prelu2 alpha (broadcast)

    All arrays fp32; kernels cast internally. Pure jnp stacking — jax.grad
    through this maps kernel gradients back to the param pytree.
    """
    we, wdw, wcat, vecs = [], [], [], []
    for r in range(repeats):
        for x in range(blocks):
            p = params[f"tcn_{r}_{x}"]
            w_cat = jnp.concatenate(
                [p["res_out"]["kernel"][0], p["skip_out"]["kernel"][0]], axis=1
            )  # [ch, 2cb]
            b_cat = jnp.concatenate([p["res_out"]["bias"], p["skip_out"]["bias"]])
            ch, out2 = w_cat.shape
            vdim = max(ch, out2)
            ones = jnp.ones((vdim,), jnp.float32)

            def _row(v, vdim=vdim):
                v = v.astype(jnp.float32)
                return jnp.pad(v, (0, vdim - v.shape[0]))

            we.append(p["expand"]["kernel"][0])
            wdw.append(p["depthwise"]["kernel"][:, 0, :])
            wcat.append(w_cat)
            vecs.append(
                jnp.stack(
                    [
                        _row(p["expand"]["bias"]),
                        _row(p["norm1"]["gamma"]),
                        _row(p["norm1"]["beta"]),
                        _row(p["depthwise"]["bias"]),
                        _row(p["norm2"]["gamma"]),
                        _row(p["norm2"]["beta"]),
                        _row(b_cat),
                        jnp.zeros((vdim,), jnp.float32),
                        p["prelu1"]["alpha"][0] * ones,
                        p["prelu2"]["alpha"][0] * ones,
                    ]
                )
            )
    return (
        jnp.stack(we).astype(jnp.float32),
        jnp.stack(wdw).astype(jnp.float32),
        jnp.stack(wcat).astype(jnp.float32),
        jnp.stack(vecs),
    )


# ---------------------------------------------------------------------------
# plain-jnp reference of the exact kernel math (oracle for tests)
# ---------------------------------------------------------------------------


def trunk_reference(h0, we, wdw, wcat, vecs, *, dils, taps: int = 3):
    """fp32 reference of the trunk over canonical arrays (differentiable)."""
    n = len(dils)
    k = h0.shape[1]
    cb = h0.shape[2]
    h = h0.astype(jnp.float32)
    skip = jnp.zeros_like(h)
    for j in range(n):
        d = int(dils[j])
        ch = we.shape[2]
        be, g1, b1, bdw = (vecs[j, i, :ch] for i in range(4))
        g2, b2 = vecs[j, 4, :ch], vecs[j, 5, :ch]
        bcat = vecs[j, 6, : 2 * cb]
        a1, a2 = vecs[j, 8, 0], vecs[j, 9, 0]

        t1p = h @ we[j] + be
        t1 = jnp.where(t1p >= 0, t1p, a1 * t1p)
        mu1 = jnp.mean(t1, axis=(1, 2), keepdims=True)  # per-item gLN
        s1 = jax.lax.rsqrt(
            jnp.maximum(jnp.mean(t1 * t1, axis=(1, 2), keepdims=True) - mu1 * mu1, 0.0)
            + _EPS
        )
        n1 = g1 * (t1 - mu1) * s1 + b1
        pad = (taps - 1) * d // 2
        n1p = jnp.pad(n1, ((0, 0), (pad, pad), (0, 0)))
        dconv = sum(wdw[j, t] * n1p[:, t * d : t * d + k, :] for t in range(taps)) + bdw
        t2 = jnp.where(dconv >= 0, dconv, a2 * dconv)
        mu2 = jnp.mean(t2, axis=(1, 2), keepdims=True)
        s2 = jax.lax.rsqrt(
            jnp.maximum(jnp.mean(t2 * t2, axis=(1, 2), keepdims=True) - mu2 * mu2, 0.0)
            + _EPS
        )
        n2 = g2 * (t2 - mu2) * s2 + b2
        rs = n2 @ wcat[j] + bcat
        h = h + rs[..., :cb]
        skip = skip + rs[..., cb:]
    return skip


# ---------------------------------------------------------------------------
# forward kernel (train mode: saves per-block h + stats)
# ---------------------------------------------------------------------------


def _make_fwd_kernel(*, dils, taps, k_valid, k_pad, ck, cb, ch, vdim):
    n_blocks = len(dils)
    n_chunks = k_pad // ck
    inv_n = 1.0 / float(k_valid * ch)
    lo = min(n_chunks, -(-_HALO // ck))
    hi_first = (k_valid - _HALO) // ck if k_valid > _HALO else 0
    hi = max(lo, min(n_chunks - 1, hi_first))

    def _al(idx):
        return idx * ck if isinstance(idx, int) else pl.multiple_of(idx * ck, 16)

    def kernel(
        h0_ref, we_ref, wdw_ref, wcat_ref, vec_ref,
        out_ref, hb_ref, st_ref,
        h_scr, t1_scr, t2_scr, sem,
    ):
        i = pl.program_id(0)
        h_scr[:] = h0_ref[0]
        t1_scr[:] = jnp.zeros_like(t1_scr)
        out_ref[:] = jnp.zeros_like(out_ref)

        for j in range(n_blocks):
            d = dils[j]
            we = we_ref[j]          # [cb, ch] bf16
            wcat = wcat_ref[j]      # [ch, 2cb] bf16
            be = vec_ref[j, 0, :ch]
            g1 = vec_ref[j, 1, :ch]
            b1 = vec_ref[j, 2, :ch]
            bdw = vec_ref[j, 3, :ch]
            g2 = vec_ref[j, 4, :ch]
            b2 = vec_ref[j, 5, :ch]
            bcat = vec_ref[j, 6, : 2 * cb]
            a1 = vec_ref[j, 8, :ch]
            a2 = vec_ref[j, 9, :ch]
            wdw = [wdw_ref[j, t] for t in range(taps)]  # each [ch] fp32

            # save this block's input h (backward residual) while computing
            dma = pltpu.make_async_copy(h_scr, hb_ref.at[i, j], sem)
            dma.start()

            # ---- phase A: t1 = prelu(h @ We + be), store + stats1 ----
            def t1_chunk(idx, *, mask):
                hc = h_scr[pl.ds(_al(idx), ck), :]
                y = jnp.dot(hc, we, preferred_element_type=jnp.float32) + be[None, :]
                t1 = jnp.where(y >= 0, y, a1[None, :] * y)
                if mask:
                    rows = idx * ck + jax.lax.broadcasted_iota(jnp.int32, (ck, 1), 0)
                    t1 = jnp.where(rows < k_valid, t1, 0.0)
                t1_scr[pl.ds(_HALO + _al(idx), ck), :] = t1.astype(_SLAB)
                return jnp.sum(t1), jnp.sum(t1 * t1)

            def phase_a(idx, carry):
                s, sq = carry
                ds_, dsq = t1_chunk(idx, mask=False)
                return s + ds_, sq + dsq

            s1s, s1q = jax.lax.fori_loop(
                0, n_chunks - 1, phase_a, (jnp.float32(0), jnp.float32(0))
            )
            ds_, dsq = t1_chunk(n_chunks - 1, mask=True)
            s1s, s1q = s1s + ds_, s1q + dsq
            mu1 = s1s * inv_n
            st1 = jax.lax.rsqrt(jnp.maximum(s1q * inv_n - mu1 * mu1, 0.0) + _EPS)
            av1 = g1 * st1
            bv1 = b1 - mu1 * av1
            aw = [av1 * wdw[t] for t in range(taps)]
            b_eff = bv1 * sum(wdw) + bdw

            # ---- phase B: t2 = prelu(dwconv(n1)+bdw), store + stats2 ----
            def t2_chunk(idx, *, edge, mask):
                base = _al(idx)
                big = t1_scr[pl.ds(base, ck + 2 * _HALO), :].astype(jnp.float32)
                pre = b_eff[None, :]
                for t in range(taps):
                    off = _HALO + t * d - (taps - 1) * d // 2
                    pre = pre + aw[t][None, :] * big[off : off + ck, :]
                if edge:
                    rows = idx * ck + jax.lax.broadcasted_iota(jnp.int32, (ck, 1), 0)
                    for t in range(taps):
                        off = t * d - (taps - 1) * d // 2
                        if off == 0:
                            continue
                        invalid = (rows + off < 0) | (rows + off >= k_valid)
                        pre = pre - (bv1 * wdw[t])[None, :] * invalid
                t2 = jnp.where(pre >= 0, pre, a2[None, :] * pre)
                if mask:
                    rows = idx * ck + jax.lax.broadcasted_iota(jnp.int32, (ck, 1), 0)
                    t2 = jnp.where(rows < k_valid, t2, 0.0)
                t2_scr[pl.ds(base, ck), :] = t2.astype(_SLAB)
                return jnp.sum(t2), jnp.sum(t2 * t2)

            def phase_b(idx, carry):
                s, sq = carry
                ds2, dsq2 = t2_chunk(idx, edge=False, mask=False)
                return s + ds2, sq + dsq2

            s2s, s2q = jax.lax.fori_loop(
                lo, hi, phase_b, (jnp.float32(0), jnp.float32(0))
            )
            for e in [*range(lo), *range(hi, n_chunks)]:
                ds2, dsq2 = t2_chunk(e, edge=True, mask=e == n_chunks - 1)
                s2s, s2q = s2s + ds2, s2q + dsq2
            mu2 = s2s * inv_n
            st2 = jax.lax.rsqrt(jnp.maximum(s2q * inv_n - mu2 * mu2, 0.0) + _EPS)

            st_ref[0, j, 0] = mu1
            st_ref[0, j, 1] = st1
            st_ref[0, j, 2] = mu2
            st_ref[0, j, 3] = st2

            # ---- phase C: folded combined res|skip matmul + updates ----
            wgf = ((g2 * st2)[:, None] * wcat.astype(jnp.float32)).astype(_SLAB)
            biasc = (
                jnp.dot(
                    (b2 - mu2 * st2 * g2)[None, :].astype(_SLAB),
                    wcat,
                    preferred_element_type=jnp.float32,
                )[0]
                + bcat
            )  # [2cb]

            dma.wait()  # h_scr about to be overwritten; saved copy must land

            def phase_c(idx, carry):
                t2c = t2_scr[pl.ds(_al(idx), ck), :]
                rs = (
                    jnp.dot(t2c, wgf, preferred_element_type=jnp.float32)
                    + biasc[None, :]
                )
                rows = idx * ck + jax.lax.broadcasted_iota(jnp.int32, (ck, 1), 0)
                valid = rows < k_valid
                sl = pl.ds(_al(idx), ck)
                h_scr[sl, :] = jnp.where(
                    valid,
                    h_scr[sl, :].astype(jnp.float32) + rs[:, :cb],
                    0.0,
                ).astype(_SLAB)
                out_ref[0, sl, :] = jnp.where(
                    valid,
                    out_ref[0, sl, :].astype(jnp.float32) + rs[:, cb:],
                    0.0,
                ).astype(_SLAB)
                return carry

            jax.lax.fori_loop(0, n_chunks, phase_c, jnp.float32(0))

    return kernel


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _make_bwd_kernel(*, dils, taps, k_valid, k_pad, ck, cb, ch, vdim):
    n_blocks = len(dils)
    n_chunks = k_pad // ck
    inv_n = 1.0 / float(k_valid * ch)
    lo = min(n_chunks, -(-_HALO // ck))
    hi_first = (k_valid - _HALO) // ck if k_valid > _HALO else 0
    hi = max(lo, min(n_chunks - 1, hi_first))

    def _al(idx):
        return idx * ck if isinstance(idx, int) else pl.multiple_of(idx * ck, 16)

    def _rows(idx):
        return idx * ck + jax.lax.broadcasted_iota(jnp.int32, (ck, 1), 0)

    def kernel(
        we_ref, wdw_ref, wcat_ref, vec_ref, st_ref, hb_ref, dskip_ref,
        dh0_ref, dwe_ref, dwdw_ref, dwcat_ref, dvec_ref,
        dh_scr, hbuf, t1_scr, sA, sB, dd_scr,
        acc_we, acc_wcat, acc_dw, acc_vec, sem,
    ):
        i = pl.program_id(0)
        dh_scr[:] = jnp.zeros_like(dh_scr)  # d/d h_out of the LAST block = 0

        for j in reversed(range(n_blocks)):
            d = dils[j]
            we = we_ref[j]
            wcat = wcat_ref[j]
            be = vec_ref[j, 0, :ch]
            g1 = vec_ref[j, 1, :ch]
            b1 = vec_ref[j, 2, :ch]
            g2 = vec_ref[j, 4, :ch]
            b2 = vec_ref[j, 5, :ch]
            a1 = vec_ref[j, 8, :ch]
            a2 = vec_ref[j, 9, :ch]
            wdw = [wdw_ref[j, t] for t in range(taps)]
            mu1 = st_ref[0, j, 0]
            st1 = st_ref[0, j, 1]
            mu2 = st_ref[0, j, 2]
            st2 = st_ref[0, j, 3]
            av1 = g1 * st1
            bv1 = b1 - mu1 * av1
            aw = [av1 * wdw[t] for t in range(taps)]
            b_eff = bv1 * sum(wdw) + vec_ref[j, 3, :ch]

            dma = pltpu.make_async_copy(hb_ref.at[i, j], hbuf, sem)
            dma.start()

            t1_scr[:] = jnp.zeros_like(t1_scr)
            dd_scr[:] = jnp.zeros_like(dd_scr)
            acc_we[:] = jnp.zeros_like(acc_we)
            acc_wcat[:] = jnp.zeros_like(acc_wcat)
            acc_dw[:] = jnp.zeros_like(acc_dw)
            acc_vec[:] = jnp.zeros_like(acc_vec)

            dma.wait()

            # ---- P1: recompute t1 into the halo'd slab ----
            def p1(idx, *, mask):
                hc = hbuf[pl.ds(_al(idx), ck), :]
                y = jnp.dot(hc, we, preferred_element_type=jnp.float32) + be[None, :]
                t1 = jnp.where(y >= 0, y, a1[None, :] * y)
                if mask:
                    t1 = jnp.where(_rows(idx) < k_valid, t1, 0.0)
                t1_scr[pl.ds(_HALO + _al(idx), ck), :] = t1.astype(_SLAB)
                return 0.0

            jax.lax.fori_loop(0, n_chunks - 1, lambda ix, c: (p1(ix, mask=False), c)[1], 0.0)
            p1(n_chunks - 1, mask=True)

            # ---- P2: recompute d (pre-prelu2) into sA ----
            def p2(idx, *, edge, mask):
                base = _al(idx)
                big = t1_scr[pl.ds(base, ck + 2 * _HALO), :].astype(jnp.float32)
                pre = b_eff[None, :]
                for t in range(taps):
                    off = _HALO + t * d - (taps - 1) * d // 2
                    pre = pre + aw[t][None, :] * big[off : off + ck, :]
                if edge:
                    rows = _rows(idx)
                    for t in range(taps):
                        off = t * d - (taps - 1) * d // 2
                        if off == 0:
                            continue
                        invalid = (rows + off < 0) | (rows + off >= k_valid)
                        pre = pre - (bv1 * wdw[t])[None, :] * invalid
                if mask:
                    pre = jnp.where(_rows(idx) < k_valid, pre, 0.0)
                sA[pl.ds(base, ck), :] = pre.astype(_SLAB)
                return 0.0

            jax.lax.fori_loop(lo, hi, lambda ix, c: (p2(ix, edge=False, mask=False), c)[1], 0.0)
            for e in [*range(lo), *range(hi, n_chunks)]:
                p2(e, edge=True, mask=e == n_chunks - 1)

            # ---- P3: phase-C backward + gLN2 stats accumulation ----
            def p3(idx, carry):
                sa, sb = carry
                base = _al(idx)
                dc = sA[pl.ds(base, ck), :].astype(jnp.float32)
                t2c = jnp.where(dc >= 0, dc, a2[None, :] * dc)
                xh2 = (t2c - mu2) * st2
                n2c = (g2[None, :] * xh2 + b2[None, :]).astype(_SLAB)
                drs = jnp.concatenate(
                    [
                        dh_scr[pl.ds(base, ck), :],
                        dskip_ref[0, pl.ds(base, ck), :],
                    ],
                    axis=1,
                ).astype(_SLAB)  # [ck, 2cb]
                dn2 = jax.lax.dot_general(
                    drs, wcat, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [ck, ch]
                acc_wcat[:, :] = acc_wcat[:, :] + jax.lax.dot_general(
                    n2c, drs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_vec[6, : 2 * cb] = acc_vec[6, : 2 * cb] + jnp.sum(
                    drs.astype(jnp.float32), axis=0
                )
                acc_vec[4, :ch] = acc_vec[4, :ch] + jnp.sum(dn2 * xh2, axis=0)
                acc_vec[5, :ch] = acc_vec[5, :ch] + jnp.sum(dn2, axis=0)
                dxh2 = dn2 * g2[None, :]
                sB[pl.ds(base, ck), :] = dxh2.astype(_SLAB)
                return sa + jnp.sum(dxh2), sb + jnp.sum(dxh2 * xh2)

            sa2, sb2 = jax.lax.fori_loop(
                0, n_chunks, p3, (jnp.float32(0), jnp.float32(0))
            )
            ma2 = sa2 * inv_n
            mb2 = sb2 * inv_n

            # ---- P4: dt2 -> dd (store in dd slab), prelu2 grads ----
            def p4(idx, carry):
                base = _al(idx)
                dc = sA[pl.ds(base, ck), :].astype(jnp.float32)
                t2c = jnp.where(dc >= 0, dc, a2[None, :] * dc)
                xh2 = (t2c - mu2) * st2
                dxh2 = sB[pl.ds(base, ck), :].astype(jnp.float32)
                dt2 = st2 * (dxh2 - ma2 - xh2 * mb2)
                dt2 = jnp.where(_rows(idx) < k_valid, dt2, 0.0)
                ddc = jnp.where(dc >= 0, dt2, a2[None, :] * dt2)
                acc_vec[9, :ch] = acc_vec[9, :ch] + jnp.sum(
                    dt2 * jnp.minimum(dc, 0.0), axis=0
                )
                acc_vec[3, :ch] = acc_vec[3, :ch] + jnp.sum(ddc, axis=0)
                dd_scr[pl.ds(_HALO + base, ck), :] = ddc.astype(_SLAB)
                return carry

            jax.lax.fori_loop(0, n_chunks, p4, jnp.float32(0))

            # ---- P5: conv backward (dn1, dwdw) + gLN1 stats accumulation ----
            def p5(idx, *, edge, mask):
                base = _al(idx)
                bigdd = dd_scr[pl.ds(base, ck + 2 * _HALO), :].astype(jnp.float32)
                bigt1 = t1_scr[pl.ds(base, ck + 2 * _HALO), :].astype(jnp.float32)
                ddc = bigdd[_HALO : _HALO + ck, :]
                dn1 = jnp.zeros((ck, ch), jnp.float32)
                rows = _rows(idx) if edge or mask else None
                for t in range(taps):
                    rel = t * d - (taps - 1) * d // 2
                    # dn1[u] += w_t * dd[u - rel]   (conv transpose; dd slab is
                    # zero outside the valid region, so no edge correction)
                    off = _HALO - rel
                    dn1 = dn1 + wdw[t][None, :] * bigdd[off : off + ck, :]
                    # dwdw[t] += sum_u dd[u] * n1[u + rel]; n1 = av1*t1 + bv1
                    # inside [0, K), 0 outside (zero-padded *normalized* input)
                    offn = _HALO + rel
                    n1s = av1[None, :] * bigt1[offn : offn + ck, :] + bv1[None, :]
                    if edge and rel != 0:
                        inval = (rows + rel < 0) | (rows + rel >= k_valid)
                        n1s = jnp.where(inval, 0.0, n1s)
                    acc_dw[t, :] = acc_dw[t, :] + jnp.sum(ddc * n1s, axis=0)
                if mask:
                    # taps reach back into the valid region from padded tail
                    # rows, so dn1 there is nonzero — but those rows are not
                    # part of the normalization group; zero them before any
                    # gLN1 accumulation (the gLN2 path needs no such mask
                    # because its cotangent is already zero at the tail)
                    dn1 = jnp.where(rows < k_valid, dn1, 0.0)
                t1c = bigt1[_HALO : _HALO + ck, :]
                xh1 = (t1c - mu1) * st1
                acc_vec[1, :ch] = acc_vec[1, :ch] + jnp.sum(dn1 * xh1, axis=0)
                acc_vec[2, :ch] = acc_vec[2, :ch] + jnp.sum(dn1, axis=0)
                dxh1 = dn1 * g1[None, :]
                sA[pl.ds(base, ck), :] = dxh1.astype(_SLAB)
                return jnp.sum(dxh1), jnp.sum(dxh1 * xh1)

            sa1 = jnp.float32(0)
            sb1 = jnp.float32(0)

            def p5_loop(idx, carry):
                s, q = carry
                ds5, dq5 = p5(idx, edge=False, mask=False)
                return s + ds5, q + dq5

            sa1, sb1 = jax.lax.fori_loop(lo, hi, p5_loop, (sa1, sb1))
            for e in [*range(lo), *range(hi, n_chunks)]:
                ds5, dq5 = p5(e, edge=True, mask=e == n_chunks - 1)
                sa1, sb1 = sa1 + ds5, sb1 + dq5
            ma1 = sa1 * inv_n
            mb1 = sb1 * inv_n

            # ---- P6: dt1 -> dWe, dbe, da1, dh update ----
            def p6(idx, carry):
                base = _al(idx)
                hc = hbuf[pl.ds(base, ck), :]
                y = (
                    jnp.dot(hc, we, preferred_element_type=jnp.float32)
                    + be[None, :]
                )  # t1_pre
                t1c = t1_scr[pl.ds(_HALO + base, ck), :].astype(jnp.float32)
                xh1 = (t1c - mu1) * st1
                dxh1 = sA[pl.ds(base, ck), :].astype(jnp.float32)
                dt1 = st1 * (dxh1 - ma1 - xh1 * mb1)
                dt1 = jnp.where(_rows(idx) < k_valid, dt1, 0.0)
                dt1p = jnp.where(y >= 0, dt1, a1[None, :] * dt1)
                acc_vec[8, :ch] = acc_vec[8, :ch] + jnp.sum(
                    dt1 * jnp.minimum(y, 0.0), axis=0
                )
                acc_vec[0, :ch] = acc_vec[0, :ch] + jnp.sum(dt1p, axis=0)
                dt1pb = dt1p.astype(_SLAB)
                acc_we[:, :] = acc_we[:, :] + jax.lax.dot_general(
                    hc, dt1pb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dh_scr[pl.ds(base, ck), :] = dh_scr[pl.ds(base, ck), :] + jax.lax.dot_general(
                    dt1pb, we, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return carry

            jax.lax.fori_loop(0, n_chunks, p6, jnp.float32(0))

            dwe_ref[0, j] = acc_we[:, :]
            dwdw_ref[0, j] = acc_dw[:, :]
            dwcat_ref[0, j] = acc_wcat[:, :]
            dvec_ref[0, j] = acc_vec[:, :]

        dh0_ref[0] = dh_scr[:, :]

    return kernel


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _fwd_call(h0, we, wdw, wcat, vecs, *, dils, taps, chunk, interpret):
    b, k, cb = h0.shape
    n, _, ch = we.shape
    vdim = vecs.shape[2]
    ck = min(_round_up(chunk, 16), _round_up(k, 16))  # ck % 16 == 0 keeps the pl.multiple_of slab-row hint sound
    k_pad = _round_up(k, ck)
    h0p = h0.astype(_SLAB)
    if k_pad != k:
        h0p = jnp.pad(h0p, ((0, 0), (0, k_pad - k), (0, 0)))

    kernel = _make_fwd_kernel(
        dils=dils, taps=taps, k_valid=k, k_pad=k_pad, ck=ck, cb=cb, ch=ch, vdim=vdim
    )
    out, hb, st = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, k_pad, cb), _SLAB),
            jax.ShapeDtypeStruct((b, n, k_pad, cb), _SLAB),
            jax.ShapeDtypeStruct((b, n, 8), jnp.float32),
        ],
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k_pad, cb), lambda i: (i, 0, 0)),
            pl.BlockSpec((n, cb, ch), lambda i: (0, 0, 0)),
            pl.BlockSpec((n, taps, ch), lambda i: (0, 0, 0)),
            pl.BlockSpec((n, ch, 2 * cb), lambda i: (0, 0, 0)),
            pl.BlockSpec((n, 10, vdim), lambda i: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, k_pad, cb), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, n, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_pad, cb), _SLAB),
            pltpu.VMEM((k_pad + 2 * _HALO, ch), _SLAB),
            pltpu.VMEM((k_pad, ch), _SLAB),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        h0p,
        we.astype(_SLAB),
        wdw.astype(jnp.float32),
        wcat.astype(_SLAB),
        vecs.astype(jnp.float32),
    )
    return out[:, :k], (hb, st, k, k_pad)


def _bwd_call(h0_shape, we, wdw, wcat, vecs, hb, st, dskip, *, dils, taps, chunk, interpret):
    b, k, cb = h0_shape
    n, _, ch = we.shape
    vdim = vecs.shape[2]
    ck = min(_round_up(chunk, 16), _round_up(k, 16))  # ck % 16 == 0 keeps the pl.multiple_of slab-row hint sound
    k_pad = _round_up(k, ck)
    ds32 = dskip.astype(jnp.float32)
    if k_pad != k:
        ds32 = jnp.pad(ds32, ((0, 0), (0, k_pad - k), (0, 0)))

    kernel = _make_bwd_kernel(
        dils=dils, taps=taps, k_valid=k, k_pad=k_pad, ck=ck, cb=cb, ch=ch, vdim=vdim
    )
    dh0, dwe, dwdw, dwcat, dvec = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, k_pad, cb), jnp.float32),
            jax.ShapeDtypeStruct((b, n, cb, ch), jnp.float32),
            jax.ShapeDtypeStruct((b, n, taps, ch), jnp.float32),
            jax.ShapeDtypeStruct((b, n, ch, 2 * cb), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 10, vdim), jnp.float32),
        ],
        grid=(b,),
        in_specs=[
            pl.BlockSpec((n, cb, ch), lambda i: (0, 0, 0)),
            pl.BlockSpec((n, taps, ch), lambda i: (0, 0, 0)),
            pl.BlockSpec((n, ch, 2 * cb), lambda i: (0, 0, 0)),
            pl.BlockSpec((n, 10, vdim), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, n, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k_pad, cb), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, k_pad, cb), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, cb, ch), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, n, taps, ch), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, n, ch, 2 * cb), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, n, 10, vdim), lambda i: (i, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_pad, cb), jnp.float32),       # dh carry
            pltpu.VMEM((k_pad, cb), _SLAB),      # h_in buffer
            pltpu.VMEM((k_pad + 2 * _HALO, ch), _SLAB),  # t1 slab
            pltpu.VMEM((k_pad, ch), _SLAB),      # sA: d / dxhat1
            pltpu.VMEM((k_pad, ch), _SLAB),      # sB: dxhat2
            pltpu.VMEM((k_pad + 2 * _HALO, ch), _SLAB),  # dd slab
            pltpu.VMEM((cb, ch), jnp.float32),          # acc dWe
            pltpu.VMEM((ch, 2 * cb), jnp.float32),      # acc dWcat
            pltpu.VMEM((taps, ch), jnp.float32),        # acc dwdw
            pltpu.VMEM((10, vdim), jnp.float32),        # acc vec rows
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        we.astype(_SLAB),
        wdw.astype(jnp.float32),
        wcat.astype(_SLAB),
        vecs.astype(jnp.float32),
        st,
        hb,
        ds32,
    )
    return (
        dh0[:, :k].astype(jnp.float32),
        jnp.sum(dwe, axis=0),
        jnp.sum(dwdw, axis=0),
        jnp.sum(dwcat, axis=0),
        jnp.sum(dvec, axis=0),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def tcn_trunk_train(h0, we, wdw, wcat, vecs, dils, taps=3, chunk=512, interpret=False):
    """Differentiable fused TCN trunk: skip_sum [B, K, cb] in bf16.

    ``h0`` [B, K, cb]; canonical arrays from :func:`stack_canonical`;
    ``dils`` per-block dilation tuple (max 64). Both passes are Pallas
    kernels; gradients flow to every canonical array and back through
    ``stack_canonical`` to the param pytree.
    """
    out, _ = _fwd_call(
        h0, we, wdw, wcat, vecs, dils=dils, taps=taps, chunk=chunk, interpret=interpret
    )
    return out


def _vjp_fwd(h0, we, wdw, wcat, vecs, dils, taps, chunk, interpret):
    out, (hb, st, k, _) = _fwd_call(
        h0, we, wdw, wcat, vecs, dils=dils, taps=taps, chunk=chunk, interpret=interpret
    )
    # dtype carried as a zero-size sentinel (residuals must be JAX types)
    return out, (h0.shape, jnp.zeros((0,), h0.dtype), we, wdw, wcat, vecs, hb, st)


def _vjp_bwd(dils, taps, chunk, interpret, res, dskip):
    h0_shape, h0_sentinel, we, wdw, wcat, vecs, hb, st = res
    dh0, dwe, dwdw, dwcat, dvec = _bwd_call(
        h0_shape, we, wdw, wcat, vecs, hb, st, dskip,
        dils=dils, taps=taps, chunk=chunk, interpret=interpret,
    )
    # cotangent dtypes must match the primal inputs (h0 may be bf16)
    return dh0.astype(h0_sentinel.dtype), dwe, dwdw, dwcat, dvec


tcn_trunk_train.defvjp(_vjp_fwd, _vjp_bwd)
