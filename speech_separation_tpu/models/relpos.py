"""Shaw-style relative-position attention and a VQ-code prior transformer.

The reference keeps a scratchpad (`Untitled.ipynb cells 1-4`) with the
relative-position machinery — clipped distance lookup table, gathered
embeddings, and the transpose/matmul dance for query·relative-key scores —
intended for a transformer prior over VQ-VAE codes
(`vq-vae_for_1d_data.ipynb cell 24` calls the encoder output "transformer
input"). This module turns that sketch into working components:

- :func:`relative_position_index` — the ``clip(j − i, ±k) + k`` table;
- :class:`RelativeSelfAttention` — multi-head self-attention with relative
  key embeddings added to the content logits (Shaw et al. 2018); the
  reference's ``x_tz_matmul`` reshuffle becomes one einsum that XLA maps
  straight onto the MXU;
- :class:`CodePrior` — a small causal transformer over discrete code indices,
  usable as an autoregressive prior for the VQ codecs (next-code
  cross-entropy; sampling via the returned logits).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["relative_position_index", "RelativeSelfAttention", "CodePrior"]


def relative_position_index(seq_len: int, max_distance: int) -> jnp.ndarray:
    """``[seq_len, seq_len]`` table of ``clip(j − i, ±k) + k`` (reference
    `Untitled.ipynb cell 1`, with the same sign convention)."""
    pos = jnp.arange(seq_len)
    dist = pos[None, :] - pos[:, None]
    return jnp.clip(dist, -max_distance, max_distance) + max_distance


class RelativeSelfAttention(nn.Module):
    num_heads: int
    head_dim: int
    max_distance: int = 16
    causal: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        h, d = self.num_heads, self.head_dim
        qkv = nn.Dense(3 * h * d, name="qkv")(x).reshape(b, t, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, T, H, D]

        rel_table = self.param(
            "rel_embeddings",
            nn.initializers.normal(0.02),
            (2 * self.max_distance + 1, d),
        )
        rel = rel_table[relative_position_index(t, self.max_distance)]  # [T, T, D]

        scale = d ** -0.5
        content = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        # the reference's x_tz_matmul transpose dance, as one einsum:
        positional = jnp.einsum("bqhd,qkd->bhqk", q, rel)
        logits = (content + positional) * scale
        if self.causal:
            mask = jnp.tril(jnp.ones((t, t), bool))
            logits = jnp.where(mask[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, h * d)
        return nn.Dense(x.shape[-1], name="proj")(out)


class _Block(nn.Module):
    num_heads: int
    head_dim: int
    max_distance: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        y = RelativeSelfAttention(
            self.num_heads, self.head_dim, self.max_distance, name="attn"
        )(nn.LayerNorm(name="ln1")(x))
        x = x + y
        z = nn.LayerNorm(name="ln2")(x)
        z = nn.Dense(self.mlp_ratio * x.shape[-1], name="mlp_in")(z)
        z = nn.gelu(z)
        z = nn.Dense(x.shape[-1], name="mlp_out")(z)
        return x + z


class CodePrior(nn.Module):
    """Autoregressive prior over VQ code sequences.

    Input: int32 code indices ``[B, T]``; output: next-code logits
    ``[B, T, num_codes]`` (position t predicts code t — inputs are shifted
    right internally with a BOS embedding).
    """

    num_codes: int
    dim: int = 128
    depth: int = 2
    num_heads: int = 4
    max_distance: int = 16

    @nn.compact
    def __call__(self, codes: jnp.ndarray) -> jnp.ndarray:
        b, t = codes.shape
        embed = nn.Embed(self.num_codes + 1, self.dim, name="code_embed")
        bos = jnp.full((b, 1), self.num_codes, codes.dtype)
        x = embed(jnp.concatenate([bos, codes[:, :-1]], axis=1))
        for i in range(self.depth):
            x = _Block(
                self.num_heads,
                self.dim // self.num_heads,
                self.max_distance,
                name=f"block_{i}",
            )(x)
        x = nn.LayerNorm(name="ln_f")(x)
        return nn.Dense(self.num_codes, name="head")(x)

    @staticmethod
    def loss(logits: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
        """Mean next-code cross-entropy."""
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, codes[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)
