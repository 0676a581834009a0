"""Conv-TasNet-style fully-convolutional separator (beyond-parity model).

The reference stops at a TasNet *precursor* — conv front-end + BLSTM masks
(`Raw_with_Convlayer.ipynb cell 13`). This module adds the full
convolutional time-domain separation network in the style of Luo &
Mesgarani's Conv-TasNet (arXiv:1809.07454): learned encoder/decoder
filterbanks and a dilated temporal convolutional mask network. Everything is
convolutions and 1×1 matmuls — an ideal MXU workload with no recurrence, so
it both separates better and runs faster than the BLSTM on TPU.

Structure:

- encoder: Conv1D(``enc_dim``, kernel ``win``, stride ``win/2``, ReLU);
- separator: channel LayerNorm → 1×1 bottleneck → ``repeats`` × ``blocks``
  dilated depthwise-separable conv blocks (1×1 expand → PReLU+norm →
  depthwise dilated conv → PReLU+norm → 1×1 back, residual + skip);
- masks: PReLU over summed skips → 1×1 to ``num_speakers × enc_dim`` →
  sigmoid → mask × encoder features;
- decoder: ConvTranspose back to waveform, one per masked copy.

Trained with negative SI-SDR under permutation-invariant assignment
(``losses.pit_si_sdr_loss``).

Serving precision: ``dtype=jnp.bfloat16`` runs every conv/matmul in bf16 on
the MXU and halves HBM traffic, while the gLN statistics (mean/variance —
the numerically fragile part) always accumulate in fp32. Parameters stay
fp32 (``param_dtype``); casting happens inside the ops.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["ConvTasNet"]


class _GlobalLayerNorm(nn.Module):
    """gLN: normalise over (time, channels) with learned per-channel affine.

    Statistics are always computed in fp32 — bf16 variance accumulation over
    ``T × C ≈ 2M`` elements loses enough mantissa to visibly shift masks —
    and in ONE pass (``var = E[x²] − E[x]²``): the 42 gLNs in the default
    stack are the network's HBM-bandwidth hot spot, and the one-pass form
    measures +18% end-to-end serving throughput at bf16 (fp32 accumulation
    keeps the cancellation benign for O(1)-scale activations).
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        mean_sq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        out = gamma * (x32 - mean) / jnp.sqrt(var + 1e-8) + beta
        return out.astype(self.dtype or x.dtype)


class _CumulativeLayerNorm(nn.Module):
    """cLN: per-step normalisation over channels × the PAST time steps only
    (Luo & Mesgarani §2.3, the causal-configuration norm). At step t the
    statistics cover ``x[:, :t+1, :]`` — realisable online with two running
    sums, so a causally-trained model scores the same hop-by-hop as offline
    (the gLN variant loses ~3 dB when streamed; RESULTS.md round 3).
    Stats in fp32 via cumulative sums (exact under XLA's fp32 cumsum)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        csum = jnp.cumsum(jnp.sum(x32, axis=2), axis=1)  # [B, T]
        csum_sq = jnp.cumsum(jnp.sum(jnp.square(x32), axis=2), axis=1)
        count = c * jnp.arange(1, x.shape[1] + 1, dtype=jnp.float32)  # [T]
        mean = csum / count
        var = jnp.maximum(csum_sq / count - jnp.square(mean), 0.0)
        out = (
            gamma * (x32 - mean[..., None]) / jnp.sqrt(var + 1e-8)[..., None] + beta
        )
        return out.astype(self.dtype or x.dtype)


class _PReLU(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class _TCNBlock(nn.Module):
    hidden: int
    bottleneck: int
    kernel: int
    dilation: int
    dtype: Any = None
    causal: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        norm_cls = _CumulativeLayerNorm if self.causal else _GlobalLayerNorm
        y = nn.Conv(self.hidden, (1,), dtype=self.dtype, name="expand")(x)
        y = _PReLU(name="prelu1")(y)
        y = norm_cls(dtype=self.dtype, name="norm1")(y)
        y = nn.Conv(
            self.hidden,
            (self.kernel,),
            kernel_dilation=(self.dilation,),
            feature_group_count=self.hidden,
            # causal: all taps from the past — pad (kernel−1)·dilation left
            padding=[((self.kernel - 1) * self.dilation, 0)]
            if self.causal
            else "SAME",
            dtype=self.dtype,
            name="depthwise",
        )(y)
        y = _PReLU(name="prelu2")(y)
        y = norm_cls(dtype=self.dtype, name="norm2")(y)
        residual = nn.Conv(self.bottleneck, (1,), dtype=self.dtype, name="res_out")(y)
        skip = nn.Conv(self.bottleneck, (1,), dtype=self.dtype, name="skip_out")(y)
        return x + residual, skip


class ConvTasNet(nn.Module):
    num_speakers: int = 2
    enc_dim: int = 256
    win: int = 16  # encoder kernel (samples); stride = win // 2
    bottleneck: int = 128
    hidden: int = 256
    kernel: int = 3
    blocks: int = 7  # dilations 1, 2, 4, ... 2^(blocks-1)
    repeats: int = 3
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16 for serving)
    remat: bool = False  # rematerialize each TCN block in the backward pass
    # causal configuration (Luo & Mesgarani §2.3): cumulative layer norm +
    # left-padded depthwise convs, so no mask depends on future frames and
    # hop-by-hop streaming matches the same model's offline output (modulo
    # the encoder/decoder windows' win//2-sample lookahead). Trained via the
    # XLA step path (the fused Pallas trunks implement the gLN topology).
    causal: bool = False

    @nn.compact
    def __call__(self, mix: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        """``mix``: [B, samples] (padded to a multiple of win//2) → [B, S, samples]."""
        del deterministic
        stride = self.win // 2
        b, samples = mix.shape
        assert samples % stride == 0, "pad waveforms to a multiple of win//2"

        feats = nn.relu(
            nn.Conv(
                self.enc_dim,
                (self.win,),
                strides=(stride,),
                padding="SAME",
                dtype=self.dtype,
                name="encoder",
            )(mix[..., None].astype(self.dtype or mix.dtype))
        )  # [B, K, N]

        norm_cls = _CumulativeLayerNorm if self.causal else _GlobalLayerNorm
        h = norm_cls(dtype=self.dtype, name="input_norm")(feats)
        h = nn.Conv(self.bottleneck, (1,), dtype=self.dtype, name="input_proj")(h)
        skip_sum = jnp.zeros_like(h)
        # remat trades ~1/3 more FLOPs in backward for not storing each
        # block's hidden-width intermediates — shrinks the training working
        # set by ~hidden/bottleneck per block (see RESULTS.md measurement)
        block_cls = nn.remat(_TCNBlock) if self.remat else _TCNBlock
        for r in range(self.repeats):
            for x in range(self.blocks):
                h, skip = block_cls(
                    self.hidden,
                    self.bottleneck,
                    self.kernel,
                    2**x,
                    dtype=self.dtype,
                    causal=self.causal,
                    name=f"tcn_{r}_{x}",
                )(h)
                skip_sum = skip_sum + skip

        m = _PReLU(name="mask_prelu")(skip_sum)
        masks = nn.sigmoid(
            nn.Conv(self.num_speakers * self.enc_dim, (1,), dtype=self.dtype, name="mask_proj")(m)
        )  # [B, K, S*N]
        k = feats.shape[1]
        masks = masks.reshape(b, k, self.num_speakers, self.enc_dim)
        masked = masks * feats[:, :, None, :]  # [B, K, S, N]

        # decode each speaker with a shared transposed filterbank
        masked = masked.transpose(0, 2, 1, 3).reshape(b * self.num_speakers, k, self.enc_dim)
        wav = nn.ConvTranspose(
            1, (self.win,), strides=(stride,), padding="SAME", dtype=self.dtype, name="decoder"
        )(masked)[..., 0]
        wav = wav.reshape(b, self.num_speakers, -1).astype(jnp.float32)
        return wav[:, :, :samples]
