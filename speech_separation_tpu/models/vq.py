"""Discrete-latent layers: Gumbel-Softmax sampling and codebook VQ.

Reference semantics (`vq-vae_for_1d_data.ipynb cell 12`,
`vq-vae_for_1d_data_2.ipynb cell 13`):

- Gumbel-Softmax: logits + ``-log(-log U)`` noise, softmax at temperature 0.5;
  optional hard one-hot with straight-through ``y = sg(y_hard − y) + y``;
- VectorQuantizer: trainable codebook ``[embedding_dim, num_embeddings]``
  (uniform ±0.05 init), nearest code by expanded L2 distance
  ``‖x‖² + ‖e‖² − 2·x·e`` → argmin, lookup, auxiliary loss
  ``0.5 · (β·commitment + codebook)`` with β = 0.25, straight-through
  estimator on the output.

The distance computation is a single MXU matmul ``[N, D] @ [D, K]`` plus
row/column norms; a fused Pallas kernel (``ops/vq_pallas.py``) keeps the
``[N, K]`` distance matrix in VMEM for large codebooks.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["gumbel_softmax", "GumbelSoftmax", "VectorQuantizer", "nearest_code_indices"]


def gumbel_softmax(
    logits: jnp.ndarray,
    rng: jax.Array,
    temperature: float = 0.5,
    hard: bool = False,
    eps: float = 1e-20,
) -> jnp.ndarray:
    u = jax.random.uniform(rng, logits.shape)
    gumbel = -jnp.log(-jnp.log(u + eps) + eps)
    y = jax.nn.softmax((logits + gumbel) / temperature, axis=-1)
    if hard:
        y_hard = (y == jnp.max(y, axis=-1, keepdims=True)).astype(y.dtype)
        y = jax.lax.stop_gradient(y_hard - y) + y
    return y


class GumbelSoftmax(nn.Module):
    temperature: float = 0.5
    hard: bool = False

    @nn.compact
    def __call__(self, logits: jnp.ndarray, *, deterministic: bool = False) -> jnp.ndarray:
        if deterministic:
            # predict mode: hard argmax one-hot (reference `for_predict` path)
            one_hot = (logits == jnp.max(logits, axis=-1, keepdims=True)).astype(logits.dtype)
            return one_hot
        rng = self.make_rng("gumbel")
        return gumbel_softmax(logits, rng, self.temperature, self.hard)


def nearest_code_indices(
    flat: jnp.ndarray, codebook: jnp.ndarray, use_pallas: bool = False
) -> jnp.ndarray:
    """argmin_k ‖flat_n − codebook[:, k]‖² for ``flat [N, D]``, ``codebook [D, K]``."""
    if use_pallas:
        from ..ops.vq_pallas import nearest_code_pallas

        return nearest_code_pallas(flat, codebook)
    similarity = jnp.matmul(flat, codebook, precision=jax.lax.Precision.HIGHEST)
    distances = (
        jnp.sum(jnp.square(flat), axis=1, keepdims=True)
        + jnp.sum(jnp.square(codebook), axis=0)
        - 2.0 * similarity
    )
    return jnp.argmin(distances, axis=1)


class VectorQuantizer(nn.Module):
    """Codebook VQ with straight-through estimator.

    ``__call__`` returns ``(quantized, aux_loss)``.
    """

    num_embeddings: int
    embedding_dim: int
    beta: float = 0.25
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        def _uniform_pm05(key, shape, dtype=jnp.float32):
            # TF random_uniform_initializer default: U(−0.05, 0.05)
            return jax.random.uniform(key, shape, dtype, -0.05, 0.05)

        codebook = self.param(
            "embeddings", _uniform_pm05, (self.embedding_dim, self.num_embeddings)
        )

        flat = x.reshape(-1, self.embedding_dim)
        indices = nearest_code_indices(flat, codebook, self.use_pallas)
        quantized = codebook.T[indices].reshape(x.shape)

        commitment = self.beta * jnp.mean(jnp.square(jax.lax.stop_gradient(quantized) - x))
        codebook_loss = jnp.mean(jnp.square(quantized - jax.lax.stop_gradient(x)))
        aux = 0.5 * (commitment + codebook_loss)

        quantized = x + jax.lax.stop_gradient(quantized - x)
        return quantized, aux

    @staticmethod
    def lookup(codebook: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
        """Decode code indices ``[...]`` → embeddings ``[..., D]``."""
        return codebook.T[indices]
