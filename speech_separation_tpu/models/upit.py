"""uPIT mask-estimation separators.

Two variants, mirroring the reference's capability surface:

- :class:`UPitBlstm` — the spectral-domain baseline
  (`uPIT_baseline.ipynb cell 29`): magnitude in, ``Dense(496, tanh)``,
  3 × (BiLSTM(496) + Dropout 0.8), one ReLU mask head per speaker, each mask
  multiplied with the input magnitude, heads concatenated on the feature axis.
- :class:`UPitConv` — the raw-waveform learned-filterbank variant
  (`Raw_with_Convlayer.ipynb cell 13`): non-overlapping 40-sample frames in,
  ``Conv1D(129, kernel 2, sigmoid, same)`` front-end, 3 × (BiLSTM(129) +
  Dropout 0.8), ReLU mask heads over the 40-dim frames, masks × input frames,
  concat. Parameter count is identical to the reference's recorded 1,099,289.

Both output ``[B, T, num_speakers * output_size]`` so the shared PIT loss and
the separation pipeline treat them uniformly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .blstm import BiLSTM

__all__ = ["UPitBlstm", "UPitConv"]


class _MaskHeads(nn.Module):
    """Per-speaker ReLU mask heads applied to the shared trunk output."""

    output_size: int
    num_speakers: int

    @nn.compact
    def __call__(self, trunk: jnp.ndarray, mix: jnp.ndarray) -> jnp.ndarray:
        outs = []
        for s in range(self.num_speakers):
            mask = nn.Dense(self.output_size, name=f"mask_head_{s}")(trunk)
            outs.append(nn.relu(mask) * mix)
        return jnp.concatenate(outs, axis=-1)


class UPitBlstm(nn.Module):
    """Spectral-magnitude uPIT BLSTM separator."""

    input_size: int = 129
    output_size: int = 129
    hidden: int = 496
    num_layers: int = 3
    num_speakers: int = 2
    dropout_rate: float = 0.8
    unroll: int = 16
    remat: bool = False  # rematerialise BiLSTM layers: trade FLOPs for HBM

    @nn.compact
    def __call__(self, magnitude: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        h = nn.tanh(nn.Dense(self.hidden, name="input_proj")(magnitude))
        layer_cls = nn.remat(BiLSTM) if self.remat else BiLSTM
        for i in range(self.num_layers):
            h = layer_cls(self.hidden, unroll=self.unroll, name=f"bilstm_{i}")(h)
            h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return _MaskHeads(self.output_size, self.num_speakers, name="heads")(h, magnitude)


class UPitConv(nn.Module):
    """Raw-waveform uPIT separator with a learned conv front-end."""

    frame_size: int = 40
    conv_features: int = 129
    hidden: int = 129
    num_layers: int = 3
    num_speakers: int = 2
    dropout_rate: float = 0.8
    unroll: int = 16

    @nn.compact
    def __call__(self, frames: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        h = nn.sigmoid(
            nn.Conv(self.conv_features, kernel_size=(2,), padding="SAME", name="frontend")(frames)
        )
        for i in range(self.num_layers):
            h = BiLSTM(self.hidden, unroll=self.unroll, name=f"bilstm_{i}")(h)
            h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return _MaskHeads(self.frame_size, self.num_speakers, name="heads")(h, frames)
