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
    decode_length: int | None = None  # KV-cache capacity for incremental decode

    @nn.compact
    def __call__(self, x: jnp.ndarray, index: jnp.ndarray | None = None) -> jnp.ndarray:
        h, d = self.num_heads, self.head_dim
        if index is not None:
            return self._decode(x, index)
        b, t, _ = x.shape
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

    def _decode(self, x: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
        """One incremental step: ``x [B, 1, dim]`` at position ``index``,
        attending over a KV cache of capacity ``decode_length``. Same params
        (and numerics) as the full causal path — only the positional term is
        gathered for the single query row instead of the full [T, T] table."""
        assert self.decode_length is not None, "clone(decode_length=T) to decode"
        b = x.shape[0]
        h, d, t_max = self.num_heads, self.head_dim, self.decode_length
        qkv = nn.Dense(3 * h * d, name="qkv")(x).reshape(b, 1, 3, h, d)
        q, k_new, v_new = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, 1, H, D]

        ck = self.variable("cache", "key", jnp.zeros, (b, t_max, h, d), x.dtype)
        cv = self.variable("cache", "value", jnp.zeros, (b, t_max, h, d), x.dtype)
        ck.value = jax.lax.dynamic_update_slice(ck.value, k_new, (0, index, 0, 0))
        cv.value = jax.lax.dynamic_update_slice(cv.value, v_new, (0, index, 0, 0))

        rel_table = self.param(
            "rel_embeddings",
            nn.initializers.normal(0.02),
            (2 * self.max_distance + 1, d),
        )
        dist = jnp.clip(jnp.arange(t_max) - index, -self.max_distance, self.max_distance)
        rel = rel_table[dist + self.max_distance]  # [T, D]

        scale = d ** -0.5
        content = jnp.einsum("bhd,bjhd->bhj", q[:, 0], ck.value)
        positional = jnp.einsum("bhd,jd->bhj", q[:, 0], rel)
        logits = (content + positional) * scale
        logits = jnp.where(jnp.arange(t_max)[None, None] <= index, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhj,bjhd->bhd", probs, cv.value).reshape(b, 1, h * d)
        return nn.Dense(x.shape[-1], name="proj")(out)


class _Block(nn.Module):
    num_heads: int
    head_dim: int
    max_distance: int
    mlp_ratio: int = 4
    decode_length: int | None = None

    @nn.compact
    def __call__(self, x, index=None):
        y = RelativeSelfAttention(
            self.num_heads, self.head_dim, self.max_distance,
            decode_length=self.decode_length, name="attn",
        )(nn.LayerNorm(name="ln1")(x), index)
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
    decode_length: int | None = None  # KV-cache capacity; set via clone()

    def setup(self):
        # setup-style (not @compact) so __call__ and decode share one set of
        # submodules; attribute names keep the original param-tree layout
        self.code_embed = nn.Embed(self.num_codes + 1, self.dim)
        for i in range(self.depth):
            setattr(
                self,
                f"block_{i}",
                _Block(
                    self.num_heads,
                    self.dim // self.num_heads,
                    self.max_distance,
                    decode_length=self.decode_length,
                ),
            )
        self.ln_f = nn.LayerNorm()
        self.head = nn.Dense(self.num_codes)

    def __call__(self, codes: jnp.ndarray) -> jnp.ndarray:
        b, t = codes.shape
        bos = jnp.full((b, 1), self.num_codes, codes.dtype)
        x = self.code_embed(jnp.concatenate([bos, codes[:, :-1]], axis=1))
        for i in range(self.depth):
            x = getattr(self, f"block_{i}")(x)
        return self.head(self.ln_f(x))

    def decode(self, prev: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
        """One KV-cached decoding step (linear in T instead of the full
        re-run's quadratic cost): ``prev [B]`` is the token at ``index - 1``
        (ignored at index 0, where the BOS embedding is used) and the return
        is next-code logits ``[B, num_codes]`` for position ``index``. Apply
        with ``mutable=["cache"]`` on a ``clone(decode_length=T)`` module;
        parity with the full forward is pinned in tests/test_relpos.py."""
        assert self.decode_length is not None, "clone(decode_length=T) to decode"
        tok = jnp.where(index == 0, jnp.full_like(prev, self.num_codes), prev)
        x = self.code_embed(tok[:, None])
        for i in range(self.depth):
            x = getattr(self, f"block_{i}")(x, index)
        return self.head(self.ln_f(x))[:, 0]

    @staticmethod
    def loss(logits: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
        """Mean next-code cross-entropy."""
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, codes[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)
