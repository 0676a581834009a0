"""Fused Conv-TasNet TCN trunk as one Pallas TPU kernel.

The XLA serving path for the TCN stack is HBM-bandwidth-bound at its fusion
floor: every block materializes its expand/depthwise intermediates to HBM
(~34 MB per block per 8 s item even with optimal fusion), and the global
layer norms' two-pass structure (stats reduce, then consume) forces those
materialization boundaries. Measured: 78 ms for batch 64 x 8 s at win=16,
of which ~80% is the 21 TCN blocks.

This kernel runs the ENTIRE trunk - all ``repeats x blocks`` dilated blocks
- inside one Pallas program with a grid over batch items only:

- the residual state ``h`` and the skip accumulator never leave VMEM;
- each block's expand output ``t1`` is stored to a VMEM slab (with a halo
  for the dilated taps) and never touches HBM;
- gLN is folded: phase A produces ``t1`` while accumulating its stats;
  phase B re-reads it through the depthwise taps (three shifted VMEM
  reads - a depthwise conv never mixes channels) accumulating the second
  norm's stats; phase C applies the folded combined res|skip matmul
  (``dot(n2, W) = s2 * dot(t2, gamma2*W) + bias2(mu2, s2)``, with
  ``gamma2*W`` and the static bias pieces precomputed on the host side);
- SAME zero-padding of the *normalized* tensor is honored through the edge
  correction ``m[t,c] = sum_k w[k,c] * inside(t + k*d - d)`` built from an
  iota comparison (no extra conv);
- per-item HBM traffic collapses from ~21 x 34 MB to 4 MB (read h0, write
  the skip sum): the trunk becomes MXU/VPU-bound.

Everything is static at trace time (blocks are unrolled in Python, so each
dilation is a literal), which keeps Mosaic happy. Forward-only - training
keeps the differentiable flax path.

Numerics: matmuls in bf16 with fp32 accumulation, norm statistics and
epilogues in fp32, intermediates stored bf16 - the same precision contract
as ``ConvTasNet(dtype=jnp.bfloat16)`` (models/tasnet.py). Parity is pinned
by ``tests/test_tasnet_serving.py``.

Reference lineage: same compute as ``models/tasnet.py`` (beyond-parity
model; the reference stops at a conv-frontend + BLSTM precursor,
`Raw_with_Convlayer.ipynb cell 13`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tcn_trunk_pallas", "stack_tcn_weights"]

_HALO = 64  # >= max dilation (2^6); pad rows each side of the t1 slab


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def stack_tcn_weights(params, *, blocks: int, repeats: int):
    """Stack per-block ConvTasNet params into the kernel's input arrays.

    Returns (we, wdw, wg, vecs):
      we   [N, bottleneck, hidden]  bf16 - expand 1x1 kernels
      wdw  [N, taps, hidden]        fp32 - depthwise kernels
      wg   [N, hidden, 2*bottleneck] bf16 - gamma2-folded concat(res, skip)
      vecs [N, 8, hidden]           fp32 - per-block vectors:
        0: expand bias   1: norm1 gamma  2: norm1 beta  3: depthwise bias
        4: beta2 @ W_cat + bias_cat     5: colsum(gamma2 * W_cat)
        6: prelu1 alpha (broadcast)     7: prelu2 alpha (broadcast)
    """
    # single source of truth for the param-pytree -> stacked-array layout:
    # derive the serving kernel's folded arrays from the canonical training
    # stack so a flax param rename breaks exactly one stacker
    from .tcn_train_pallas import stack_canonical

    we, wdw, wcat, cvecs = stack_canonical(params, blocks=blocks, repeats=repeats)
    n, ch, out2 = wcat.shape
    vdim = cvecs.shape[2]
    g2 = cvecs[:, 4, :ch]  # norm2 gamma
    b2 = cvecs[:, 5, :ch]  # norm2 beta
    bcat = cvecs[:, 6, :out2]
    wgf = g2[:, :, None] * wcat  # gamma2 folded into concat(res, skip)

    def _pad(v):  # [n, out2] -> [n, vdim]
        return jnp.pad(v, ((0, 0), (0, vdim - v.shape[1])))

    vecs = jnp.stack(
        [
            cvecs[:, 0],  # expand bias
            cvecs[:, 1],  # norm1 gamma
            cvecs[:, 2],  # norm1 beta
            cvecs[:, 3],  # depthwise bias
            _pad(jnp.einsum("nc,nco->no", b2, wcat) + bcat),
            _pad(jnp.sum(wgf, axis=1)),
            cvecs[:, 8],  # prelu1 alpha (broadcast)
            cvecs[:, 9],  # prelu2 alpha (broadcast)
        ],
        axis=1,
    )
    return (
        we.astype(jnp.bfloat16),
        wdw.astype(jnp.float32),
        wgf.astype(jnp.bfloat16),
        vecs,
    )


def _make_kernel(*, dils, taps, k_valid, k_pad, ck, cb, ch):
    n_blocks = len(dils)
    n_chunks = k_pad // ck
    inv_n = 1.0 / float(k_valid * ch)
    # chunks whose dilated taps can cross an end of the valid region (the
    # edge-correction / masking code only runs in these, statically):
    lo = min(n_chunks, -(-_HALO // ck))  # [0, lo) can read below row 0
    hi_first = (k_valid - _HALO) // ck if k_valid > _HALO else 0
    hi = max(lo, min(n_chunks - 1, hi_first))  # [hi, n_chunks) can cross k_valid

    def _aligned(idx):
        return idx * ck if isinstance(idx, int) else pl.multiple_of(idx * ck, 16)

    def kernel(h0_ref, we_ref, wdw_ref, wg_ref, vec_ref, out_ref, h_scr, t1_scr, t2_scr):
        h_scr[:] = h0_ref[0]
        t1_scr[:] = jnp.zeros_like(t1_scr)
        out_ref[:] = jnp.zeros_like(out_ref)

        for j in range(n_blocks):
            d = dils[j]
            we = we_ref[j]  # [cb, ch] bf16
            wg = wg_ref[j]  # [ch, 2*cb] bf16
            b_e = vec_ref[j, 0, :ch]
            g1 = vec_ref[j, 1, :ch]
            be1 = vec_ref[j, 2, :ch]
            b_dw = vec_ref[j, 3, :ch]
            biasc = vec_ref[j, 4, : 2 * cb]
            csum = vec_ref[j, 5, : 2 * cb]
            a1 = vec_ref[j, 6, :ch]
            a2 = vec_ref[j, 7, :ch]
            wdw = [wdw_ref[j, t] for t in range(taps)]  # each [ch] fp32

            # Pad rows (>= k_valid) exist only in the LAST chunk (k_pad is
            # k_valid rounded up to one chunk), and the SAME-padding edge
            # corrections only touch rows within max-dilation (64 < ck) of
            # either end - so only the statically-known first and last chunks
            # need masks / edge math. Interior chunks run a lean body.

            # ---- phase A: t1 = prelu(h @ We + b), store + stats1 ----
            def t1_chunk(idx, *, mask):
                hc = h_scr[pl.ds(_aligned(idx), ck), :]
                y = (
                    jnp.dot(hc, we, preferred_element_type=jnp.float32)
                    + b_e[None, :]
                )
                t1 = jnp.where(y >= 0, y, a1[None, :] * y)
                if mask:
                    rows = idx * ck + jax.lax.broadcasted_iota(jnp.int32, (ck, 1), 0)
                    t1 = jnp.where(rows < k_valid, t1, 0.0)
                t1_scr[pl.ds(_HALO + _aligned(idx), ck), :] = t1.astype(jnp.bfloat16)
                return jnp.sum(t1), jnp.sum(t1 * t1)

            def phase_a(idx, carry):
                s, sq = carry
                ds, dsq = t1_chunk(idx, mask=False)
                return s + ds, sq + dsq

            s1, s1q = jax.lax.fori_loop(
                0, n_chunks - 1, phase_a, (jnp.float32(0), jnp.float32(0))
            )
            ds, dsq = t1_chunk(n_chunks - 1, mask=True)
            s1, s1q = s1 + ds, s1q + dsq
            mu1 = s1 * inv_n
            st1 = jax.lax.rsqrt(jnp.maximum(s1q * inv_n - mu1 * mu1, 0.0) + 1e-8)
            av1 = g1 * st1  # [ch]
            bv1 = be1 - mu1 * av1
            # fold A1 into the tap weights; fold B1*wsum into the bias
            aw = [av1 * wdw[t] for t in range(taps)]  # [ch] fp32 each
            b_eff = bv1 * sum(wdw) + b_dw  # [ch]

            # shared: t2 chunk = prelu(sum_t (A1*w_t)*t1[.+off_t] + b_eff)
            # Mosaic requires sublane-aligned vector loads, and the tap
            # offsets (+-d, d down to 1) are unaligned - so load ONE aligned
            # halo'd slab per chunk and take the taps as *static* value
            # slices (in-register sublane rotates). ``edge`` chunks subtract
            # B1*w_t for taps that fall outside [0, k_valid) (zero-padding of
            # the *normalized* tensor, honored via this correction).
            def t2_chunk(idx, *, edge, mask):
                base = _aligned(idx)  # slab row of this chunk's valid row 0
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
                t2_scr[pl.ds(base, ck), :] = t2.astype(jnp.bfloat16)
                return jnp.sum(t2), jnp.sum(t2 * t2)

            # ---- phase B: t2 store + stats2 (lean interior, edge ends) ----
            def phase_b(idx, carry):
                s, sq = carry
                ds, dsq = t2_chunk(idx, edge=False, mask=False)
                return s + ds, sq + dsq

            s2, s2q = jax.lax.fori_loop(
                lo, hi, phase_b, (jnp.float32(0), jnp.float32(0))
            )
            for e in [*range(lo), *range(hi, n_chunks)]:
                ds, dsq = t2_chunk(e, edge=True, mask=e == n_chunks - 1)
                s2, s2q = s2 + ds, s2q + dsq
            mu2 = s2 * inv_n
            st2 = jax.lax.rsqrt(jnp.maximum(s2q * inv_n - mu2 * mu2, 0.0) + 1e-8)
            bias2 = biasc - (mu2 * st2) * csum  # [2*cb]

            # ---- phase C: folded combined res|skip matmul + updates ----
            def phase_c(idx, carry):
                t2 = t2_scr[pl.ds(_aligned(idx), ck), :]
                rs = (
                    jnp.dot(t2, wg, preferred_element_type=jnp.float32) * st2
                    + bias2[None, :]
                )
                sl = pl.ds(_aligned(idx), ck)
                h_scr[sl, :] = (
                    h_scr[sl, :].astype(jnp.float32) + rs[:, :cb]
                ).astype(jnp.bfloat16)
                out_ref[0, sl, :] = (
                    out_ref[0, sl, :].astype(jnp.float32) + rs[:, cb:]
                ).astype(jnp.bfloat16)
                return carry

            jax.lax.fori_loop(0, n_chunks, phase_c, jnp.float32(0))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("dils", "taps", "chunk", "interpret"),
)
def tcn_trunk_pallas(
    h0: jnp.ndarray,
    we: jnp.ndarray,
    wdw: jnp.ndarray,
    wg: jnp.ndarray,
    vecs: jnp.ndarray,
    *,
    dils: tuple[int, ...],
    taps: int = 3,
    chunk: int = 1024,  # 1024 measured +5% over 512 at win=16 (58.2 vs 61.2 ms)
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused TCN trunk. ``h0``: [B, K, bottleneck] (any float dtype).

    Returns the skip-connection sum [B, K, bottleneck] in bf16. Weight
    arrays come from :func:`stack_tcn_weights`. ``dils`` is the per-block
    dilation tuple (e.g. ``(1,2,...,64) * repeats``); max 64 (the slab halo).
    """
    assert max(dils) <= _HALO, "dilation exceeds slab halo"
    b, k, cb = h0.shape
    n, _, ch = we.shape
    assert len(dils) == n
    ck = min(_round_up(chunk, 16), _round_up(k, 16))  # ck % 16 == 0 keeps the pl.multiple_of slab-row hint sound
    k_pad = _round_up(k, ck)
    h0p = h0.astype(jnp.bfloat16)
    if k_pad != k:
        h0p = jnp.pad(h0p, ((0, 0), (0, k_pad - k), (0, 0)))

    kernel = _make_kernel(
        dils=dils, taps=taps, k_valid=k, k_pad=k_pad, ck=ck, cb=cb, ch=ch
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, k_pad, cb), jnp.bfloat16),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k_pad, cb), lambda i: (i, 0, 0)),
            pl.BlockSpec((n, cb, ch), lambda i: (0, 0, 0)),
            pl.BlockSpec((n, taps, ch), lambda i: (0, 0, 0)),
            pl.BlockSpec((n, ch, 2 * cb), lambda i: (0, 0, 0)),
            pl.BlockSpec((n, 8, vecs.shape[2]), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k_pad, cb), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((k_pad, cb), jnp.bfloat16),
            pltpu.VMEM((k_pad + 2 * _HALO, ch), jnp.bfloat16),
            pltpu.VMEM((k_pad, ch), jnp.bfloat16),
        ],
        # slabs + double-buffered in/out blocks + resident weights exceed the
        # default 16 MB scoped-vmem limit slightly; v5e has 128 MB physical
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(h0p, we, wdw, wg, vecs)
    return out[:, :k]
