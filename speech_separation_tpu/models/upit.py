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
import jax
import jax.numpy as jnp

from .blstm import BiLSTM

__all__ = [
    "UPitBlstm",
    "UPitConv",
    "upit_blstm_pallas_forward",
    "upit_blstm_train_forward",
]


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
    def __call__(
        self,
        magnitude: jnp.ndarray,
        *,
        deterministic: bool = True,
        segment_ids: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        h = nn.tanh(nn.Dense(self.hidden, name="input_proj")(magnitude))
        layer_cls = nn.remat(BiLSTM) if self.remat else BiLSTM
        for i in range(self.num_layers):
            h = layer_cls(self.hidden, unroll=self.unroll, name=f"bilstm_{i}")(
                h, segment_ids
            )
            h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return _MaskHeads(self.output_size, self.num_speakers, name="heads")(h, magnitude)


def upit_blstm_pallas_forward(
    params,
    magnitude: jnp.ndarray,
    num_layers: int = 3,
    num_speakers: int = 2,
    compute_dtype=jnp.bfloat16,
    tile_t: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Serving-only :class:`UPitBlstm` forward over the same parameter tree,
    with each LSTM recurrence as one fused Pallas program
    (``ops/lstm_pallas.py``) instead of a ``lax.scan``.

    Equivalent to ``model.apply({"params": params}, magnitude,
    deterministic=True)`` up to the compute dtype (pass
    ``compute_dtype=jnp.float32`` for numerical-parity checks). Directions
    run as two kernel launches per layer (each direction has its own
    weights); dense layers stay XLA matmuls.
    """
    from ..ops.lstm_pallas import lstm_pallas

    def _dense(p, x):
        return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)

    x = magnitude.astype(compute_dtype)
    h = jnp.tanh(_dense(params["input_proj"], x))
    for layer in range(num_layers):
        cells = params[f"bilstm_{layer}"]["cells"]
        outs = []
        for d in range(2):
            seq = h if d == 0 else h[:, ::-1]
            xw = (
                seq @ cells["kernel"][d].astype(seq.dtype)
                + cells["bias"][d].astype(seq.dtype)
            )
            ys = lstm_pallas(
                xw,
                cells["recurrent_kernel"][d],
                tile_t=tile_t,
                compute_dtype=compute_dtype,
                interpret=interpret,
            )
            outs.append(ys if d == 0 else ys[:, ::-1])
        h = jnp.concatenate(outs, axis=-1).astype(compute_dtype)
    heads = params["heads"]
    outs = []
    for s in range(num_speakers):
        mask = nn.relu(_dense(heads[f"mask_head_{s}"], h))
        outs.append(mask * x)
    return jnp.concatenate(outs, axis=-1).astype(jnp.float32)


def upit_blstm_train_forward(
    params,
    magnitude: jnp.ndarray,
    *,
    num_layers: int = 3,
    num_speakers: int = 2,
    dropout_rate: float = 0.8,
    dropout_rng=None,
    compute_dtype=jnp.bfloat16,
    tile_t: int = 16,
    interpret: bool = False,
    segment_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Differentiable :class:`UPitBlstm` forward over the same parameter
    tree, with each BiLSTM recurrence (forward AND backward-through-time) as
    fused Pallas kernels (``ops/lstm_train_pallas.py``; a ``custom_vjp``, so
    this composes with ``jax.grad``). Dense projections, mask heads and
    dropout stay XLA.

    ``dropout_rng=None`` disables dropout (eval); otherwise inter-layer
    dropout matches the flax path's rate/scaling semantics (the random bits
    come from a different stream derivation, so individual step losses
    diverge statistically-equivalently from the ``lax.scan`` path —
    deterministic-mode parity is exact and pinned in tests).

    ``segment_ids [B, T]`` (sequence packing, ``data/packing.py``) routes
    the recurrences through the packed kernel variant with carry resets at
    segment changes — same semantics as the flax path's ``segment_ids``.
    """
    from ..ops.lstm_train_pallas import (
        bilstm_train_pallas,
        bilstm_train_pallas_packed,
    )

    def _dense(p, x):
        return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)

    keep2 = None
    if segment_ids is not None:
        from .blstm import segment_keep

        keep2 = jnp.stack(
            [segment_keep(segment_ids), segment_keep(segment_ids[:, ::-1])], axis=0
        )  # [2, B, T], each in its direction's scan order

    x = magnitude.astype(compute_dtype)
    h = jnp.tanh(_dense(params["input_proj"], x))
    for layer in range(num_layers):
        cells = params[f"bilstm_{layer}"]["cells"]
        if keep2 is None:
            h = bilstm_train_pallas(
                h,
                cells["kernel"],
                cells["recurrent_kernel"],
                cells["bias"],
                tile_t,
                interpret,
                compute_dtype,
            ).astype(compute_dtype)
        else:
            h = bilstm_train_pallas_packed(
                h,
                cells["kernel"],
                cells["recurrent_kernel"],
                cells["bias"],
                keep2,
                tile_t,
                interpret,
                compute_dtype,
            ).astype(compute_dtype)
        if dropout_rng is not None and dropout_rate > 0.0:
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, layer), 1.0 - dropout_rate, h.shape
            )
            h = jnp.where(keep, h / (1.0 - dropout_rate), 0.0).astype(h.dtype)
    heads = params["heads"]
    outs = []
    for s in range(num_speakers):
        mask = nn.relu(_dense(heads[f"mask_head_{s}"], h))
        outs.append(mask * x)
    return jnp.concatenate(outs, axis=-1).astype(jnp.float32)


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
