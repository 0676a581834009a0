"""The VQ-VAE audio-codec family: four topologies over raw 1-D audio.

One module per reference generation, all returning ``(reconstruction,
aux_losses)`` so the shared VAE train step applies
``loss + sum(aux_losses)`` uniformly:

- :class:`VqVaeGumbel`   — v1 (`vq-vae_for_1d_data.ipynb cells 12, 15`):
  sample-level input ``[B, T, 1]``, 5 × stride-2 conv encoder
  (32→128→128→256→512) + 1×1 conv to ``latent_dim`` logits (32× downsample),
  Gumbel-Softmax sample, dense codebook lookup, mirrored transposed-conv
  decoder, KL-to-uniform aux loss × 0.2. 5,148,897 params at
  ``latent_dim=1024`` (pinned in tests against the notebook's summary).
- :class:`VqVaeCodebook` — v2 (`vq-vae_for_1d_data_2.ipynb cell 18`):
  frame-stacked input ``[B, K, 40]``, two-level codebook VQ with a U-style
  concat, stride-1 convs.
- :class:`VqVaeT2`       — t2 (`_t2 cell 19`): stride-2 U-skip, tanh convs,
  single VQ.
- :class:`VqVaeT3`       — t3 (`_t3 cell 22`): three stride-2 encoders into
  one VQ bottleneck, decoder with long skip from encoder1. 193,000 params
  (pinned against `_t3 cell 34`).

``codes`` / ``decode_codes`` expose each model as a tokenizer: discrete code
indices out, waveform back in — the interface the reference sketches for a
transformer prior (`vq-vae_for_1d_data.ipynb cell 24`, `Untitled.ipynb`).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .vq import (
    GumbelSoftmax,
    ResidualVectorQuantizer,
    VectorQuantizer,
    nearest_code_indices,
)

__all__ = ["VqVaeGumbel", "VqVaeCodebook", "VqVaeT2", "VqVaeT3", "VqVaeT3Tok"]


class _ConvStack(nn.Module):
    features: Sequence[int]
    kernel: int = 4
    stride: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation)
        for i, f in enumerate(self.features):
            x = act(
                nn.Conv(f, (self.kernel,), strides=(self.stride,), padding="SAME", name=f"conv_{i}")(x)
            )
        return x


class _DeconvStack(nn.Module):
    features: Sequence[int]
    kernel: int = 4
    stride: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation)
        for i, f in enumerate(self.features):
            x = act(
                nn.ConvTranspose(
                    f, (self.kernel,), strides=(self.stride,), padding="SAME", name=f"deconv_{i}"
                )(x)
            )
        return x


class VqVaeGumbel(nn.Module):
    """v1: Gumbel-Softmax categorical VAE over raw samples ``[B, T, 1]``."""

    latent_dim: int = 1024
    kl_weight: float = 0.2
    temperature: float = 0.5
    gumbel_hard: bool = False

    def setup(self):
        self.encoder = _ConvStack([32, 128, 128, 256, 512], name="encoder")
        self.logit = nn.Conv(self.latent_dim, (1,), padding="VALID", name="logit")
        self.gumbel = GumbelSoftmax(self.temperature, self.gumbel_hard)
        self.sampled = nn.Dense(self.latent_dim, name="sampled")  # codebook lookup
        self.decoder = _DeconvStack([512, 256, 128, 128, 32], name="decoder")
        self.out = nn.ConvTranspose(1, (1,), padding="VALID", name="out")

    def encode_logits(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.logit(self.encoder(x))  # [B, T/32, latent_dim]

    def __call__(
        self,
        x: jnp.ndarray,
        *,
        deterministic: bool = False,
        temperature: jnp.ndarray | float | None = None,
        kl_scale: jnp.ndarray | float = 1.0,
    ):
        """``temperature``/``kl_scale`` accept traced scalars so training can
        anneal tau and warm up the KL weight per step without recompiling.
        From-scratch training needs both: the reference's fixed tau=0.5 +
        full-strength KL(q‖uniform) recipe only converges because it
        fine-tunes checkpoints for ~600 epochs (`vq-vae_for_1d_data.ipynb`
        cells 17/22); from random init the KL term's uniform pull dominates
        the weak pathwise gradient and the codes collapse to uniform
        (measured: loss frozen at target power for 4000 steps)."""
        logits = self.encode_logits(x)
        sample = self.gumbel(logits, deterministic=deterministic, temperature=temperature)
        decoded = self.out(self.decoder(self.sampled(sample)))

        # KL to uniform prior: Σ q (log q − log 1/K), summed over time+codes
        qy = jax.nn.softmax(logits, axis=-1)
        log_qy = jnp.log(qy + 1e-10)
        kl = jnp.sum(qy * (log_qy - jnp.log(1.0 / self.latent_dim)), axis=(1, 2))
        aux = jnp.mean(kl) * self.kl_weight * kl_scale
        return decoded, [aux]

    def codes(self, x: jnp.ndarray) -> jnp.ndarray:
        """Discrete code indices ``[B, T/32]`` (argmax over logits)."""
        return jnp.argmax(self.encode_logits(x), axis=-1)

    def decode_codes(self, indices: jnp.ndarray) -> jnp.ndarray:
        one_hot = jax.nn.one_hot(indices, self.latent_dim)
        return self.out(self.decoder(self.sampled(one_hot)))


class VqVaeCodebook(nn.Module):
    """v2: two-level codebook VQ over frame-stacked input ``[B, K, 40]``."""

    embedding_dim: int = 64
    num_embeddings: int = 256
    frame_size: int = 40

    def setup(self):
        self.encoder1 = nn.Conv(32, (4,), padding="SAME", name="encoder1")
        self.encoder2 = nn.Conv(self.embedding_dim, (4,), padding="SAME", name="encoder2")
        self.quantize1 = VectorQuantizer(self.num_embeddings, self.embedding_dim, name="vq1")
        self.decoder1 = nn.ConvTranspose(self.embedding_dim, (4,), padding="SAME", name="decoder1")
        self.encoder3 = nn.Conv(self.embedding_dim, (1,), padding="SAME", name="encoder3")
        self.quantize2 = VectorQuantizer(self.num_embeddings, self.embedding_dim, name="vq2")
        self.decoder2 = nn.ConvTranspose(self.embedding_dim, (4,), padding="SAME", name="decoder2")
        self.decoder3 = nn.ConvTranspose(self.frame_size, (4,), padding="SAME", name="decoder3")

    def __call__(self, x: jnp.ndarray, *, deterministic: bool = False):
        del deterministic
        e1 = nn.relu(self.encoder1(x))
        e2 = nn.relu(self.encoder2(e1))
        q1, aux1 = self.quantize1(e2)
        d1 = nn.relu(self.decoder1(q1))
        e3 = nn.relu(self.encoder3(jnp.concatenate([e1, d1], axis=-1)))
        q2, aux2 = self.quantize2(e3)
        d2 = nn.relu(self.decoder2(q1))
        out = self.decoder3(jnp.concatenate([d2, q2], axis=-1))
        return out, [aux1, aux2]


class VqVaeT2(nn.Module):
    """t2: stride-2 U-skip codec, tanh conv front, single VQ bottleneck."""

    embedding_dim: int = 64
    num_embeddings: int = 512
    frame_size: int = 40

    def setup(self):
        self.encoder1 = nn.Conv(128, (4,), strides=(2,), padding="SAME", name="encoder1")
        self.encoder2 = nn.Conv(self.embedding_dim, (4,), strides=(2,), padding="SAME", name="encoder2")
        self.quantize1 = VectorQuantizer(self.num_embeddings, self.embedding_dim, name="vq1")
        self.decoder1 = nn.ConvTranspose(128, (4,), strides=(2,), padding="SAME", name="decoder1")
        self.decoder3 = nn.ConvTranspose(self.frame_size, (4,), strides=(2,), padding="SAME", name="decoder3")

    def __call__(self, x: jnp.ndarray, *, deterministic: bool = False):
        del deterministic
        e1 = nn.tanh(self.encoder1(x))  # [B, K/2, 128]
        e2 = nn.tanh(self.encoder2(e1))  # [B, K/4, 64]
        q1, aux = self.quantize1(e2)
        d1 = nn.relu(self.decoder1(q1))  # [B, K/2, 128]
        out = self.decoder3(jnp.concatenate([e1, d1], axis=-1))  # [B, K, 40]
        return out, [aux]

    def codes(self, x: jnp.ndarray) -> jnp.ndarray:
        e2 = nn.tanh(self.encoder2(nn.tanh(self.encoder1(x))))
        cb = self.quantize1.variables["params"]["embeddings"]
        return nearest_code_indices(e2.reshape(-1, self.embedding_dim), cb).reshape(e2.shape[:-1])


class VqVaeT3(nn.Module):
    """t3: 3-level stride-2 bottleneck (8× frame downsample), long skip."""

    embedding_dim: int = 64
    num_embeddings: int = 512
    frame_size: int = 40

    def setup(self):
        self.encoder1 = nn.Conv(128, (4,), strides=(2,), padding="SAME", name="encoder1")
        self.encoder2 = nn.Conv(self.embedding_dim, (4,), strides=(2,), padding="SAME", name="encoder2")
        self.encoder3 = nn.Conv(self.embedding_dim, (4,), strides=(2,), padding="SAME", name="encoder3")
        self.quantize1 = VectorQuantizer(self.num_embeddings, self.embedding_dim, name="vq1")
        self.decoder1 = nn.ConvTranspose(self.embedding_dim, (4,), strides=(2,), padding="SAME", name="decoder1")
        self.decoder2 = nn.ConvTranspose(128, (4,), strides=(2,), padding="SAME", name="decoder2")
        self.decoder3 = nn.ConvTranspose(self.frame_size, (4,), strides=(2,), padding="SAME", name="decoder3")

    def _encode(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        e1 = nn.tanh(self.encoder1(x))  # [B, K/2, 128]
        e2 = nn.tanh(self.encoder2(e1))  # [B, K/4, 64]
        e3 = nn.tanh(self.encoder3(e2))  # [B, K/8, 64]
        return e1, e3

    def __call__(self, x: jnp.ndarray, *, deterministic: bool = False):
        del deterministic
        e1, e3 = self._encode(x)
        q1, aux = self.quantize1(e3)
        d1 = nn.relu(self.decoder1(q1))  # [B, K/4, 64]
        d2 = nn.relu(self.decoder2(d1))  # [B, K/2, 128]
        out = self.decoder3(jnp.concatenate([e1, d2], axis=-1))  # [B, K, 40]
        return out, [aux]

    def codes(self, x: jnp.ndarray) -> jnp.ndarray:
        """Tokenise: code indices ``[B, K/8]``."""
        _, e3 = self._encode(x)
        cb = self.quantize1.variables["params"]["embeddings"]
        return nearest_code_indices(e3.reshape(-1, self.embedding_dim), cb).reshape(e3.shape[:-1])

    def decode_codes(self, indices: jnp.ndarray, e1: jnp.ndarray) -> jnp.ndarray:
        cb = self.quantize1.variables["params"]["embeddings"]
        q1 = VectorQuantizer.lookup(cb, indices)
        d2 = nn.relu(self.decoder2(nn.relu(self.decoder1(q1))))
        return self.decoder3(jnp.concatenate([e1, d2], axis=-1))


class VqVaeT3Tok(nn.Module):
    """Tokenizer-grade t3: the e1 U-skip is itself quantized, so the code
    streams *fully determine* the reconstruction — the property the
    reference's transformer-prior sketch needs from its codec
    (`vq-vae_for_1d_data.ipynb cell 24` "transformer input",
    `Untitled.ipynb cells 1-4`) but its t3 topology lacks (the `_t3 cell 22`
    skip feeds raw encoder activations to the decoder).

    Both levels use residual VQ cascades (:class:`ResidualVectorQuantizer`)
    — quantizing the skip with a single codebook caps it at ~9 bits/position,
    which measured out at ~15 dB reconstruction; stacking stages recovers the
    bits the skip needs. Streams: ``codes_deep [B, K/8, deep_depth]`` from
    the 3-level bottleneck and ``codes_skip [B, K/2, skip_depth]`` from the
    quantized skip (the two-level-VQ move of `vq-vae_for_1d_data_2.ipynb
    cell 18`, applied per residual stage). ``decode_codes(*codes(x))``
    reproduces ``__call__``'s reconstruction (to XLA fusion precision)
    because the decoder consumes only quantized latents.
    """

    embedding_dim: int = 64
    num_embeddings: int = 512
    skip_embeddings: int = 512
    deep_depth: int = 2
    skip_depth: int = 2
    skip_pq: int = 2  # product-quantization sub-vectors per skip stage
    frame_size: int = 40
    vq_init_scale: float = 0.5  # tanh-range encoders; ±0.05 collapses usage

    def setup(self):
        self.encoder1 = nn.Conv(128, (4,), strides=(2,), padding="SAME", name="encoder1")
        self.encoder2 = nn.Conv(self.embedding_dim, (4,), strides=(2,), padding="SAME", name="encoder2")
        self.encoder3 = nn.Conv(self.embedding_dim, (4,), strides=(2,), padding="SAME", name="encoder3")
        self.quantize1 = ResidualVectorQuantizer(
            self.num_embeddings,
            self.embedding_dim,
            depth=self.deep_depth,
            init_scale=self.vq_init_scale,
            name="vq1",
        )
        self.skip_proj = nn.Conv(self.embedding_dim, (1,), padding="SAME", name="skip_proj")
        self.quantize2 = ResidualVectorQuantizer(
            self.skip_embeddings,
            self.embedding_dim,
            depth=self.skip_depth,
            pq=self.skip_pq,
            init_scale=self.vq_init_scale,
            name="vq2",
        )
        self.skip_expand = nn.Conv(128, (1,), padding="SAME", name="skip_expand")
        self.decoder1 = nn.ConvTranspose(self.embedding_dim, (4,), strides=(2,), padding="SAME", name="decoder1")
        self.decoder2 = nn.ConvTranspose(128, (4,), strides=(2,), padding="SAME", name="decoder2")
        self.decoder3 = nn.ConvTranspose(self.frame_size, (4,), strides=(2,), padding="SAME", name="decoder3")

    def _encode(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        e1 = nn.tanh(self.encoder1(x))  # [B, K/2, 128]
        e2 = nn.tanh(self.encoder2(e1))  # [B, K/4, 64]
        e3 = nn.tanh(self.encoder3(e2))  # [B, K/8, 64]
        skip = nn.tanh(self.skip_proj(e1))  # [B, K/2, 64]
        return skip, e3

    def _decode(self, q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
        d1 = nn.relu(self.decoder1(q1))  # [B, K/4, 64]
        d2 = nn.relu(self.decoder2(d1))  # [B, K/2, 128]
        s = nn.relu(self.skip_expand(q2))  # [B, K/2, 128]
        return self.decoder3(jnp.concatenate([s, d2], axis=-1))  # [B, K, 40]

    def __call__(self, x: jnp.ndarray, *, deterministic: bool = False):
        del deterministic
        skip, e3 = self._encode(x)
        q1, aux1 = self.quantize1(e3)
        q2, aux2 = self.quantize2(skip)
        return self._decode(q1, q2), [aux1, aux2]

    def codes(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Tokenise: ``(codes_deep [B, K/8, d1], codes_skip [B, K/2, d2·pq])``."""
        skip, e3 = self._encode(x)
        return self.quantize1.codes(e3), self.quantize2.codes(skip)

    def decode_codes(self, codes_deep: jnp.ndarray, codes_skip: jnp.ndarray) -> jnp.ndarray:
        """Waveform frames from the two code streams alone (no encoder)."""
        q1 = ResidualVectorQuantizer.lookup(self.quantize1.embeddings, codes_deep)
        q2 = ResidualVectorQuantizer.lookup(self.quantize2.embeddings, codes_skip)
        return self._decode(q1, q2)
