"""Fused BiLSTM forward+backward recurrence as Pallas TPU kernels (training).

Why: the flagship uPIT BLSTM trains at ~14% of the chip's bf16 peak on the
XLA path. Profiling the serving attempt (``ops/lstm_pallas.py``) showed the
``lax.scan`` spends only ~1/3 of each timestep on the recurrent matmul — the
rest is per-step loop bookkeeping — and the training step pays that overhead
in SIX scans (3 layers × forward pass + backward-through-time). The round-1
serving kernel still lost to XLA because at batch 128+ the xw tiles forced
batch tiling (4× smaller matmuls). Training runs at much smaller batch
(16–64 utterances), where the full doubled-direction batch row block fits in
one MXU matmul — exactly the regime where the scan overhead dominates and a
fused kernel wins.

Design (per BiLSTM layer, both directions batched as rows, the same
doubled-batch trick as ``models/blstm.BiLSTM``):

- forward kernel: grid tiles time; carries (h, c) live in fp32 VMEM scratch
  and persist across grid steps; each step is ONE per-direction MXU matmul
  ``[Bp, GP] @ [GP, 4·GP]`` plus VPU gate math; post-activation gates
  (i, f, g, o) and cell states stream to HBM as training residuals
  (cuDNN-style: storing gates beats recomputing them — recompute would
  double the backward matmuls);
- backward kernel: iterates the grid in reverse time order (reversed
  ``index_map``), carries (dh, dc) in VMEM scratch, one matmul per step
  (``dgates @ Uᵀ``), emits pre-activation ``dgates``; all weight/input
  gradients are then single large XLA matmuls outside the kernel
  (``dWh = Σ h_{t-1}ᵀ dgates`` etc.) — MXU-friendly, no accumulation
  inside the kernel;
- gate blocks are padded to ``GP = round_up(H, 128)`` lanes so every gate
  slice is lane-tile aligned (H = 496 would force lane rotations); padded
  columns provably stay zero through both recurrences (f·0 + i·g with
  g = tanh(0) = 0 forward; dc = 0 ⇒ dg = 0 backward);
- the whole layer is a ``jax.custom_vjp``, so ``jax.grad`` through the
  standard PIT loss just works and checkpoints/param trees are unchanged.

Numerics: matmuls in the slab dtype (bf16 production, fp32 for the
exact-gradient tests) with fp32 accumulation; carries and cell-state
residuals fp32. Gradient parity vs ``jax.grad`` of the ``lax.scan`` path is
pinned in ``tests/test_lstm_train_pallas.py``.

Reference lineage: trains the same Keras-semantics BLSTM as
`uPIT_baseline.ipynb cell 29` (see ``models/blstm.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bilstm_train_pallas", "bilstm_train_pallas_packed"]

# storage dtype for slabs/matmul operands; tests may override to float32 to
# verify the backward math independently of bf16 rounding
_SLAB = jnp.bfloat16


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _make_fwd_kernel(tile_t: int, bp: int, gp: int, packed: bool = False):
    def kernel(xw_ref, u_ref, *rest):
        if packed:
            k_ref, h_ref, g_ref, c_ref, h_s, c_s = rest
        else:
            h_ref, g_ref, c_ref, h_s, c_s = rest

        @pl.when(pl.program_id(0) == 0)
        def _():
            h_s[:] = jnp.zeros_like(h_s)
            c_s[:] = jnp.zeros_like(c_s)

        for tt in range(tile_t):
            hs, cs = h_s[:], c_s[:]
            if packed:
                # packed rows: the carry is gated off at segment starts so
                # utterances sharing a row never see each other's state
                kt = k_ref[tt]  # [R, 1], broadcasts over lanes
                hs = hs * kt
                cs = cs * kt
            hb = hs.astype(u_ref.dtype)
            z0 = jnp.dot(hb[:bp], u_ref[0], preferred_element_type=jnp.float32)
            z1 = jnp.dot(hb[bp:], u_ref[1], preferred_element_type=jnp.float32)
            z = xw_ref[tt].astype(jnp.float32) + jnp.concatenate([z0, z1], axis=0)
            i = jax.nn.sigmoid(z[:, 0 * gp : 1 * gp])
            f = jax.nn.sigmoid(z[:, 1 * gp : 2 * gp])
            g = jnp.tanh(z[:, 2 * gp : 3 * gp])
            o = jax.nn.sigmoid(z[:, 3 * gp : 4 * gp])
            c = f * cs + i * g
            h = o * jnp.tanh(c)
            h_s[:] = h
            c_s[:] = c
            h_ref[tt] = h.astype(h_ref.dtype)
            g_ref[tt] = jnp.concatenate([i, f, g, o], axis=1).astype(g_ref.dtype)
            c_ref[tt] = c

    return kernel


def _make_bwd_kernel(tile_t: int, bp: int, gp: int, packed: bool = False):
    def kernel(g_ref, c_ref, cp_ref, dh_ref, ut_ref, *rest):
        if packed:
            k_ref, dg_ref, dh_s, dc_s = rest
        else:
            dg_ref, dh_s, dc_s = rest

        @pl.when(pl.program_id(0) == 0)
        def _():
            dh_s[:] = jnp.zeros_like(dh_s)
            dc_s[:] = jnp.zeros_like(dc_s)

        for tt in reversed(range(tile_t)):
            g4 = g_ref[tt].astype(jnp.float32)
            i = g4[:, 0 * gp : 1 * gp]
            f = g4[:, 1 * gp : 2 * gp]
            g = g4[:, 2 * gp : 3 * gp]
            o = g4[:, 3 * gp : 4 * gp]
            th = jnp.tanh(c_ref[tt])
            dh_tot = dh_ref[tt] + dh_s[:]
            do = dh_tot * th * o * (1.0 - o)
            dc = dc_s[:] + dh_tot * o * (1.0 - th * th)
            # cp_ref is pre-masked by the caller in packed mode (the forward
            # consumed keep[t]·c_{t-1}), so df needs no extra gating here
            di = dc * g * i * (1.0 - i)
            df = dc * cp_ref[tt] * f * (1.0 - f)
            dg = dc * i * (1.0 - g * g)
            dgt = jnp.concatenate([di, df, dg, do], axis=1)
            dg_ref[tt] = dgt.astype(dg_ref.dtype)
            dgb = dgt.astype(ut_ref.dtype)
            r0 = jnp.dot(dgb[:bp], ut_ref[0], preferred_element_type=jnp.float32)
            r1 = jnp.dot(dgb[bp:], ut_ref[1], preferred_element_type=jnp.float32)
            r_cat = jnp.concatenate([r0, r1], axis=0)
            dcf = dc * f
            if packed:
                # the forward used keep[t]·(h,c)_{t-1}: the carry gradients
                # flowing past a segment boundary are gated off the same way
                kt = k_ref[tt]
                r_cat = r_cat * kt
                dcf = dcf * kt
            dh_s[:] = r_cat
            dc_s[:] = dcf

    return kernel


def _pad_gates(a, h, gp):
    """[..., 4H] → [..., 4·GP] with each gate block lane-aligned."""
    lead = a.shape[:-1]
    a = a.reshape(*lead, 4, h)
    a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, gp - h)])
    return a.reshape(*lead, 4 * gp)


def _fwd_call(xw_p, u_p, *, bp, gp, tile_t, interpret, slab, keep_p=None):
    t_pad, r, _ = xw_p.shape
    kernel = _make_fwd_kernel(tile_t, bp, gp, packed=keep_p is not None)
    in_specs = [
        pl.BlockSpec((tile_t, r, 4 * gp), lambda i: (i, 0, 0)),
        pl.BlockSpec((2, gp, 4 * gp), lambda i: (0, 0, 0)),
    ]
    operands = [xw_p, u_p]
    if keep_p is not None:
        in_specs.append(pl.BlockSpec((tile_t, r, 1), lambda i: (i, 0, 0)))
        operands.append(keep_p)
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, r, gp), slab),  # h_all
            jax.ShapeDtypeStruct((t_pad, r, 4 * gp), slab),  # gates
            jax.ShapeDtypeStruct((t_pad, r, gp), jnp.float32),  # c_all
        ],
        grid=(t_pad // tile_t,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile_t, r, gp), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile_t, r, 4 * gp), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile_t, r, gp), lambda i: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, gp), jnp.float32),
            pltpu.VMEM((r, gp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


def _bwd_call(gates, c_all, dh_p, ut_p, *, bp, gp, tile_t, interpret, slab, keep_p=None):
    t_pad, r, _ = dh_p.shape
    n_blocks = t_pad // tile_t
    c_prev = jnp.concatenate([jnp.zeros_like(c_all[:1]), c_all[:-1]], axis=0)
    if keep_p is not None:
        c_prev = c_prev * keep_p  # forward consumed keep[t]·c_{t-1}
    rev = lambda i: (n_blocks - 1 - i, 0, 0)
    kernel = _make_bwd_kernel(tile_t, bp, gp, packed=keep_p is not None)
    in_specs = [
        pl.BlockSpec((tile_t, r, 4 * gp), rev),
        pl.BlockSpec((tile_t, r, gp), rev),
        pl.BlockSpec((tile_t, r, gp), rev),
        pl.BlockSpec((tile_t, r, gp), rev),
        pl.BlockSpec((2, 4 * gp, gp), lambda i: (0, 0, 0)),
    ]
    operands = [gates, c_all, c_prev, dh_p, ut_p]
    if keep_p is not None:
        in_specs.append(pl.BlockSpec((tile_t, r, 1), rev))
        operands.append(keep_p)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, r, 4 * gp), slab),  # dgates
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_t, r, 4 * gp), rev),
        scratch_shapes=[
            pltpu.VMEM((r, gp), jnp.float32),
            pltpu.VMEM((r, gp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def bilstm_train_pallas(
    x, kernel, recurrent, bias, tile_t: int = 16, interpret: bool = False, slab=None
):
    """Differentiable BiLSTM layer over stacked-direction params.

    ``x``: [B, T, F]; ``kernel``: [2, F, 4H]; ``recurrent``: [2, H, 4H];
    ``bias``: [2, 4H] — the exact param layout of ``models/blstm.BiLSTM``
    (direction 0 forward-time, direction 1 reversed). Returns
    ``[B, T, 2H]`` in the slab dtype. Input projections, weight gradients
    and input gradients are large XLA matmuls; only the two recurrences run
    as Pallas kernels.
    """
    y, _ = _vjp_fwd(x, kernel, recurrent, bias, tile_t, interpret, slab)
    return y


def _prep(x, kernel, recurrent, bias, tile_t, slab):
    b, t, f = x.shape
    h = recurrent.shape[1]
    gp = _round_up(h, 128)
    bp = _round_up(b, 8)
    t_pad = _round_up(t, tile_t)

    xs = jnp.stack([x, x[:, ::-1, :]], axis=0)  # [2, B, T, F]
    xw = jnp.einsum("dbtf,dfg->dbtg", xs.astype(slab), kernel.astype(slab))
    xw = xw.astype(jnp.float32) + bias[:, None, None, :]
    xw_p = _pad_gates(xw, h, gp)  # [2, B, T, 4GP]
    xw_p = jnp.pad(xw_p, ((0, 0), (0, bp - b), (0, t_pad - t), (0, 0)))
    xw_p = xw_p.transpose(2, 0, 1, 3).reshape(t_pad, 2 * bp, 4 * gp).astype(slab)

    u_p = _pad_gates(recurrent, h, gp)  # [2, H, 4GP]
    u_p = jnp.pad(u_p, ((0, 0), (0, gp - h), (0, 0))).astype(slab)
    return xs, xw_p, u_p, (b, t, f, h, gp, bp, t_pad)


def _prep_keep(keep, b, t, bp, t_pad):
    """[2, B, T] per-direction carry gates → [T_pad, 2Bp, 1] time-major rows
    (padding keeps carry = 1: zeros propagate unchanged there)."""
    k = jnp.pad(
        keep.astype(jnp.float32),
        ((0, 0), (0, bp - b), (0, t_pad - t)),
        constant_values=1.0,
    )
    return k.transpose(2, 0, 1).reshape(t_pad, 2 * bp, 1)


def _vjp_fwd(x, kernel, recurrent, bias, tile_t, interpret, slab):
    slab = slab or _SLAB
    xs, xw_p, u_p, geom = _prep(x, kernel, recurrent, bias, tile_t, slab)
    b, t, f, h, gp, bp, t_pad = geom
    h_all, gates, c_all = _fwd_call(
        xw_p, u_p, bp=bp, gp=gp, tile_t=tile_t, interpret=interpret, slab=slab
    )
    hr = h_all.reshape(t_pad, 2, bp, gp)
    y0 = hr[:t, 0, :b, :h].transpose(1, 0, 2)  # [B, T, H]
    y1 = hr[:t, 1, :b, :h].transpose(1, 0, 2)[:, ::-1, :]
    y = jnp.concatenate([y0, y1], axis=-1)
    return y, (x, kernel, recurrent, h_all, gates, c_all)


def _vjp_bwd_impl(tile_t, interpret, slab, res, dy, keep_p=None):
    slab = slab or _SLAB
    x, kernel, recurrent, h_all, gates, c_all = res
    b, t, f = x.shape
    h = recurrent.shape[1]
    gp = _round_up(h, 128)
    bp = _round_up(b, 8)
    t_pad = h_all.shape[0]

    # upstream dy [B, T, 2H] → padded time-major rows [T_pad, 2Bp, GP] fp32
    d0 = dy[..., :h]
    d1 = dy[..., h:][:, ::-1, :]
    dh = jnp.stack([d0, d1], axis=0).astype(jnp.float32)  # [2, B, T, H]
    dh = jnp.pad(dh, ((0, 0), (0, bp - b), (0, t_pad - t), (0, gp - h)))
    dh_p = dh.transpose(2, 0, 1, 3).reshape(t_pad, 2 * bp, gp)

    ut_p = jnp.swapaxes(
        jnp.pad(
            _pad_gates(recurrent, h, gp), ((0, 0), (0, gp - h), (0, 0))
        ).astype(slab),
        1,
        2,
    )  # [2, 4GP, GP]

    dgates = _bwd_call(
        gates, c_all, dh_p, ut_p, bp=bp, gp=gp, tile_t=tile_t,
        interpret=interpret, slab=slab, keep_p=keep_p,
    )
    # [T_pad, 2Bp, 4GP] → unpadded per-direction [2, B, T, 4H]
    dgr = dgates.reshape(t_pad, 2, bp, 4, gp)[:t, :, :b, :, :h]
    dxw = dgr.reshape(t, 2, b, 4 * h).transpose(1, 2, 0, 3).astype(jnp.float32)

    xs = jnp.stack([x, x[:, ::-1, :]], axis=0)
    dkernel = jnp.einsum("dbtf,dbtg->dfg", xs, dxw)
    dbias = dxw.sum(axis=(1, 2))
    dx_s = jnp.einsum("dbtg,dfg->dbtf", dxw, kernel.astype(jnp.float32))
    dx = dx_s[0] + dx_s[1][:, ::-1, :]

    # h_{t-1} (zero-initial): shift the stored states by one step; in packed
    # mode the forward consumed keep[t]·h_{t-1}, so dRec sees the gated state
    hp = jnp.concatenate([jnp.zeros_like(h_all[:1]), h_all[:-1]], axis=0)
    if keep_p is not None:
        hp = hp.astype(jnp.float32) * keep_p
    hpr = hp.reshape(t_pad, 2, bp, gp)[:t, :, :b, :h].astype(jnp.float32)
    drec = jnp.einsum("tdbh,dbtg->dhg", hpr, dxw)

    return dx.astype(x.dtype), dkernel.astype(kernel.dtype), drec.astype(
        recurrent.dtype
    ), dbias.astype(jnp.float32)


def _vjp_bwd(tile_t, interpret, slab, res, dy):
    return _vjp_bwd_impl(tile_t, interpret, slab, res, dy)


bilstm_train_pallas.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def bilstm_train_pallas_packed(
    x, kernel, recurrent, bias, keep, tile_t: int = 16, interpret: bool = False,
    slab=None,
):
    """:func:`bilstm_train_pallas` for sequence-packed rows.

    ``keep [2, B, T]``: per-direction carry gates in each direction's own
    scan order (build from segment ids with ``models.blstm.segment_keep`` —
    direction 0 on ``segment_ids``, direction 1 on ``segment_ids[:, ::-1]``).
    A 0 gates the (h, c) carry — and, in backward, the (dh, dc) carry — to
    zero at that step, isolating packed utterances exactly. A separate
    kernel variant so the unpacked hot path compiles byte-identically to
    before; ``keep`` is data (0/1 masks), its returned gradient is zero.
    """
    y, _ = _vjp_fwd_packed(x, kernel, recurrent, bias, keep, tile_t, interpret, slab)
    return y


def _vjp_fwd_packed(x, kernel, recurrent, bias, keep, tile_t, interpret, slab):
    slab = slab or _SLAB
    xs, xw_p, u_p, geom = _prep(x, kernel, recurrent, bias, tile_t, slab)
    b, t, f, h, gp, bp, t_pad = geom
    keep_p = _prep_keep(keep, b, t, bp, t_pad)
    h_all, gates, c_all = _fwd_call(
        xw_p, u_p, bp=bp, gp=gp, tile_t=tile_t, interpret=interpret, slab=slab,
        keep_p=keep_p,
    )
    hr = h_all.reshape(t_pad, 2, bp, gp)
    y0 = hr[:t, 0, :b, :h].transpose(1, 0, 2)
    y1 = hr[:t, 1, :b, :h].transpose(1, 0, 2)[:, ::-1, :]
    y = jnp.concatenate([y0, y1], axis=-1)
    return y, (x, kernel, recurrent, h_all, gates, c_all, keep, keep_p)


def _vjp_bwd_packed(tile_t, interpret, slab, res, dy):
    *core, keep, keep_p = res
    dx, dkernel, drec, dbias = _vjp_bwd_impl(
        tile_t, interpret, slab, tuple(core), dy, keep_p=keep_p
    )
    return dx, dkernel, drec, dbias, jnp.zeros_like(keep)


bilstm_train_pallas_packed.defvjp(_vjp_fwd_packed, _vjp_bwd_packed)
