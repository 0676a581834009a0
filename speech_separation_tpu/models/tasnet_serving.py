"""HBM-traffic-optimal Conv-TasNet serving path.

``ConvTasNet.apply`` (models/tasnet.py) is ~100% HBM-bandwidth-bound on TPU:
at batch 64 x 8 s the measured wall time equals the activation-byte model at
~0.8-1 TB/s, i.e. every byte read or written is on the critical path. The 42
global layer norms are the biggest offender - each one reads its input twice
(stats + normalize) and writes a same-sized normalized tensor that is then
read again by the next conv.

``fused_apply`` computes the *same function over the same param pytree*
(checkpoints are interchangeable) while never materializing a normalized
tensor. gLN is an affine map with per-batch scalars:

    n(x)[b,t,c] = A[b,c] * x[b,t,c] + B[b,c]
    A[b,c] = gamma[c] / sqrt(var[b] + eps),  B[b,c] = beta[c] - mean[b]*A[b,c]

so it folds exactly into its consumers:

- a following 1x1 conv ``W``:  dot(n, W) = s[b] * dot(x, gamma*W) + (B[b] @ W)
  (``gamma*W`` is a static reweighting; the per-batch scale and [B,O] bias
  are a fused dot epilogue);
- a following depthwise conv (channels never mix): dw(n) = A * dw(x) + B * m
  where ``m[t,c] = dw_SAME(ones)[t,c]`` corrects the SAME zero-padding edges
  (zero-padding n is *not* zero-padding x); ``m`` costs one batch-1 conv;
- ``res_out`` and ``skip_out`` read the same input, so they run as ONE dot
  with concatenated output channels (halves that read).

This drops per-block activation traffic from ~58 MB to ~34 MB per item
(bf16, 8 s). Measured honestly (data-dependency-chained harness, fixed
dtype): XLA's own fusion already buys most of that on the standard path, so
``fused_apply`` lands at ~0.95x the standard module (6,287x vs 6,615x real
time at win=16, batch 64) - the fold is kept because it is the host-side
weight preparation for the *Pallas* trunk (``pallas_apply``), which holds
the whole TCN in VMEM and DOES beat the XLA path: 8,794x real time (+33%,
chunk=1024; 8,367x at chunk=512).
Numerics differ from the reference path only by fp rounding (scales applied
after the matmul instead of before); parity is pinned by
``tests/test_tasnet_serving.py``.

Reference lineage: same compute as ``models/tasnet.py`` (see its docstring
for the reference citation, `Raw_with_Convlayer.ipynb cell 13` being the
precursor the reference stops at).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["fused_apply", "pallas_apply"]


def _gln_affine(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray):
    """Per-batch affine coefficients of gLN over (time, channels).

    Statistics in fp32, one pass (matches _GlobalLayerNorm's one-pass form).
    Returns (s, a, b): s = 1/sigma [batch], a = gamma*s [batch, channels],
    b = beta - mean*a [batch, channels], all fp32.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2))
    mean_sq = jnp.mean(jnp.square(x32), axis=(1, 2))
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    s = jax.lax.rsqrt(var + 1e-8)  # [B]
    a = gamma[None, :] * s[:, None]
    b = beta[None, :] - mean[:, None] * a
    return s, a, b


def _prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


def _folded_dot(x, sab, w, gamma, bias, dt):
    """dot(gLN_affine(x), w) + bias with the normalize folded into the dot.

    x: [B, T, C] (compute dtype); sab = (s, a, b) from ``_gln_affine``;
    w: [C, O] fp32 param; gamma: the gLN's per-channel scale (static fold);
    bias: [O]. Returns [B, T, O] in ``dt``.
    """
    s, _, b = sab
    wg = (gamma[:, None] * w).astype(dt)  # [C, O] static reweighting
    out = jnp.einsum("btc,co->bto", x, wg)  # bf16 MXU, fp32 accum
    bias2 = b @ w + bias[None, :]  # [B, O] fp32, tiny
    return (out.astype(jnp.float32) * s[:, None, None] + bias2[:, None, :]).astype(dt)


def _encode_and_project(params, mix, stride, dt):
    """Encoder filterbank + input gLN folded into the 1x1 bottleneck proj.

    Returns (feats [B,K,N], h [B,K,bottleneck]).
    """
    dn = ("NWC", "WIO", "NWC")
    feats = jax.nn.relu(
        jax.lax.conv_general_dilated(
            mix[..., None].astype(dt),
            params["encoder"]["kernel"].astype(dt),
            window_strides=(stride,),
            padding="SAME",
            dimension_numbers=dn,
        )
        + params["encoder"]["bias"].astype(dt)
    )  # [B, K, N]
    a_b = _gln_affine(feats, params["input_norm"]["gamma"], params["input_norm"]["beta"])
    h = _folded_dot(
        feats,
        a_b,
        params["input_proj"]["kernel"][0],
        params["input_norm"]["gamma"],
        params["input_proj"]["bias"],
        dt,
    )
    return feats, h


def _mask_and_decode(params, feats, skip_sum, num_speakers, enc_dim, stride, samples, dt):
    """PReLU -> mask projection -> mask x feats -> shared transposed decoder."""
    b, k = feats.shape[:2]
    mpre = _prelu(skip_sum.astype(dt), params["mask_prelu"]["alpha"])
    masks = jax.nn.sigmoid(
        jnp.einsum("btc,co->bto", mpre, params["mask_proj"]["kernel"][0].astype(dt))
        + params["mask_proj"]["bias"].astype(dt)
    )  # [B, K, S*N]
    masks = masks.reshape(b, k, num_speakers, enc_dim)
    masked = masks * feats[:, :, None, :]  # [B, K, S, N]
    masked = masked.transpose(0, 2, 1, 3).reshape(b * num_speakers, k, enc_dim)
    wav = jax.lax.conv_transpose(
        masked,
        params["decoder"]["kernel"].astype(dt),
        strides=(stride,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + params["decoder"]["bias"].astype(dt)
    wav = wav[..., 0].reshape(b, num_speakers, -1).astype(jnp.float32)
    return wav[:, :, :samples]


def fused_apply(
    params,
    mix: jnp.ndarray,
    *,
    num_speakers: int = 2,
    enc_dim: int = 256,
    win: int = 16,
    bottleneck: int = 128,
    hidden: int = 256,
    kernel: int = 3,
    blocks: int = 7,
    repeats: int = 3,
    dtype: Any = jnp.bfloat16,
) -> jnp.ndarray:
    """Serving-optimized ConvTasNet forward; same params/config as the module.

    ``mix``: [B, samples] (multiple of win//2) -> [B, S, samples] fp32.
    """
    dt = dtype or mix.dtype
    stride = win // 2
    samples = mix.shape[1]
    assert samples % stride == 0, "pad waveforms to a multiple of win//2"

    feats, h = _encode_and_project(params, mix, stride, dt)
    k = feats.shape[1]
    dn = ("NWC", "WIO", "NWC")

    skip_sum = jnp.zeros_like(h)
    for r in range(repeats):
        for x in range(blocks):
            p = params[f"tcn_{r}_{x}"]
            dil = 2**x

            # expand 1x1 + PReLU epilogue
            w_e = p["expand"]["kernel"][0].astype(dt)
            t1 = _prelu(
                jnp.einsum("btc,co->bto", h, w_e) + p["expand"]["bias"].astype(dt),
                p["prelu1"]["alpha"],
            )  # [B, K, hidden]

            # norm1 folded into the depthwise conv (channels never mix):
            # dw(n1) = A1 * dw(t1) + B1 * m + bias
            _, a1, b1 = _gln_affine(t1, p["norm1"]["gamma"], p["norm1"]["beta"])
            w_dw = p["depthwise"]["kernel"]
            dwy = jax.lax.conv_general_dilated(
                t1,
                w_dw.astype(dt),
                window_strides=(1,),
                padding="SAME",
                rhs_dilation=(dil,),
                dimension_numbers=dn,
                feature_group_count=hidden,
            )  # [B, K, hidden]
            # SAME-padding edge correction m[t,c] = sum_k w[k,c]*inside(t),
            # inside(t) = 0 <= t + k*dil - pad_left < K. Closed form via iota
            # comparisons - fuses into the epilogue, no extra conv.
            pad_left = (kernel - 1) * dil // 2
            t_idx = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
            m = sum(
                w_dw[j, 0][None, :]
                * ((t_idx + (j * dil - pad_left) >= 0) & (t_idx + (j * dil - pad_left) < k))
                for j in range(kernel)
            )  # [K, hidden] fp32
            t2 = _prelu(
                (
                    dwy.astype(jnp.float32) * a1[:, None, :]
                    + b1[:, None, :] * m[None, :, :]
                    + p["depthwise"]["bias"][None, None, :]
                ).astype(dt),
                p["prelu2"]["alpha"],
            )

            # norm2 folded into ONE combined res|skip 1x1 dot
            a2b2 = _gln_affine(t2, p["norm2"]["gamma"], p["norm2"]["beta"])
            w_cat = jnp.concatenate(
                [p["res_out"]["kernel"][0], p["skip_out"]["kernel"][0]], axis=1
            )  # [hidden, 2*bottleneck]
            bias_cat = jnp.concatenate([p["res_out"]["bias"], p["skip_out"]["bias"]])
            rs = _folded_dot(t2, a2b2, w_cat, p["norm2"]["gamma"], bias_cat, dt)
            h = h + rs[..., :bottleneck]
            skip_sum = skip_sum + rs[..., bottleneck:]

    return _mask_and_decode(
        params, feats, skip_sum, num_speakers, enc_dim, stride, samples, dt
    )


def pallas_apply(
    params,
    mix: jnp.ndarray,
    *,
    num_speakers: int = 2,
    enc_dim: int = 256,
    win: int = 16,
    bottleneck: int = 128,
    hidden: int = 256,
    kernel: int = 3,
    blocks: int = 7,
    repeats: int = 3,
    chunk: int = 1024,  # 1024 measured +5% over 512 at win=16 (58.2 vs 61.2 ms)
    interpret: bool | None = None,
) -> jnp.ndarray:
    """ConvTasNet forward with the TCN trunk as one fused Pallas kernel.

    bf16 serving only (the kernel's precision contract matches
    ``ConvTasNet(dtype=jnp.bfloat16)``); encoder/mask/decoder stay XLA.
    Same params/config as the flax module; see ops/tcn_pallas.py.
    ``interpret=None`` auto-selects interpret mode off-TPU (CPU test mesh).
    """
    from ..ops.tcn_pallas import stack_tcn_weights, tcn_trunk_pallas

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    dt = jnp.bfloat16
    stride = win // 2
    b, samples = mix.shape
    assert samples % stride == 0, "pad waveforms to a multiple of win//2"

    feats, h = _encode_and_project(params, mix, stride, dt)
    we, wdw, wg, vecs = stack_tcn_weights(params, blocks=blocks, repeats=repeats)
    dils = tuple(2**x for _ in range(repeats) for x in range(blocks))
    skip_sum = tcn_trunk_pallas(
        h, we, wdw, wg, vecs, dils=dils, taps=kernel, chunk=chunk, interpret=interpret
    )
    return _mask_and_decode(
        params, feats, skip_sum, num_speakers, enc_dim, stride, samples, dt
    )
