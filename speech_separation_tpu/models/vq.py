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

__all__ = [
    "gumbel_softmax",
    "GumbelSoftmax",
    "VectorQuantizer",
    "ResidualVectorQuantizer",
    "nearest_code_indices",
]


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
    def __call__(
        self,
        logits: jnp.ndarray,
        *,
        deterministic: bool = False,
        temperature: jnp.ndarray | float | None = None,
    ) -> jnp.ndarray:
        if deterministic:
            # predict mode: hard argmax one-hot (reference `for_predict` path)
            one_hot = (logits == jnp.max(logits, axis=-1, keepdims=True)).astype(logits.dtype)
            return one_hot
        rng = self.make_rng("gumbel")
        # `temperature` may be a traced scalar (annealing schedules change it
        # every step without recompiling); falls back to the static attr.
        tau = self.temperature if temperature is None else temperature
        return gumbel_softmax(logits, rng, tau, self.hard)


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
    init_scale: float = 0.05  # reference: TF random_uniform_initializer default

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        def _uniform_init(key, shape, dtype=jnp.float32):
            # U(−init_scale, init_scale); the reference's ±0.05 default is
            # kept for parity models, but encoders with tanh-range (±1)
            # outputs need a matched spread or most codes never win a
            # nearest-neighbour assignment and the codebook collapses
            return jax.random.uniform(key, shape, dtype, -self.init_scale, self.init_scale)

        codebook = self.param(
            "embeddings", _uniform_init, (self.embedding_dim, self.num_embeddings)
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


class ResidualVectorQuantizer(nn.Module):
    """Multi-stage residual VQ with optional product quantization.

    Stage ``d`` quantizes the residual left by stages ``< d`` (SoundStream/
    EnCodec-style cascade); within each stage the ``embedding_dim`` vector is
    split into ``pq`` sub-vectors, each with its own codebook (product
    quantization). The decoder consumes ``Σ_d q_d``. A position therefore
    carries ``depth · pq · log2(num_embeddings)`` bits — a single codebook's
    ~9 bits is what limits reconstruction when the latent (e.g. a U-skip)
    holds most of the signal. Gradients: the encoder receives the
    straight-through gradient of the *summed* quantization plus a commitment
    pull at every stage; each codebook trains toward its own stage's
    residuals (reference VQ loss structure, `vq-vae_for_1d_data_2.ipynb
    cell 13`, applied per stage/sub-vector).

    ``__call__`` returns ``(quantized, aux_loss)``; ``codes``/``lookup``
    expose the index streams ``[..., depth · pq]`` (stage-major).
    """

    num_embeddings: int
    embedding_dim: int
    depth: int = 2
    pq: int = 1
    beta: float = 0.25
    init_scale: float = 0.5

    @property
    def num_streams(self) -> int:
        return self.depth * self.pq

    def setup(self):
        if self.embedding_dim % self.pq:
            raise ValueError(f"embedding_dim {self.embedding_dim} % pq {self.pq} != 0")

        def _uniform_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -self.init_scale, self.init_scale)

        self.embeddings = self.param(
            "embeddings",
            _uniform_init,
            (self.depth, self.pq, self.embedding_dim // self.pq, self.num_embeddings),
        )

    def _quantize_stage(self, residual: jnp.ndarray, d: int):
        """Nearest codes per PQ sub-vector: ``[N, D]`` → (q ``[N, D]``,
        indices ``[N, pq]``)."""
        sub = self.embedding_dim // self.pq
        parts, idxs = [], []
        for g in range(self.pq):
            chunk = residual[:, g * sub : (g + 1) * sub]
            indices = nearest_code_indices(chunk, self.embeddings[d, g])
            parts.append(self.embeddings[d, g].T[indices])
            idxs.append(indices)
        return jnp.concatenate(parts, axis=1), jnp.stack(idxs, axis=-1)

    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        flat = x.reshape(-1, self.embedding_dim)
        residual = flat
        q_sum = jnp.zeros_like(flat)
        aux = jnp.zeros(())
        for d in range(self.depth):
            q_d, _ = self._quantize_stage(jax.lax.stop_gradient(residual), d)
            commitment = self.beta * jnp.mean(
                jnp.square(jax.lax.stop_gradient(q_d) - residual)
            )
            codebook_loss = jnp.mean(jnp.square(q_d - jax.lax.stop_gradient(residual)))
            aux = aux + 0.5 * (commitment + codebook_loss)
            residual = residual - jax.lax.stop_gradient(q_d)
            q_sum = q_sum + jax.lax.stop_gradient(q_d)
        out = flat + jax.lax.stop_gradient(q_sum - flat)  # straight-through
        return out.reshape(x.shape), aux

    def codes(self, x: jnp.ndarray) -> jnp.ndarray:
        """Indices ``[..., depth · pq]`` (stage-major) for latents ``[..., D]``."""
        flat = x.reshape(-1, self.embedding_dim)
        residual = flat
        out = []
        for d in range(self.depth):
            q_d, idx = self._quantize_stage(residual, d)
            out.append(idx)  # [N, pq]
            residual = residual - q_d
        stacked = jnp.concatenate(out, axis=-1)  # [N, depth*pq]
        return stacked.reshape(*x.shape[:-1], self.num_streams)

    @staticmethod
    def lookup(codebooks: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
        """``codebooks [depth, pq, D/pq, K]``, ``indices [..., depth·pq]``
        (stage-major) → ``[..., D]``."""
        depth, pq = codebooks.shape[0], codebooks.shape[1]
        total = 0
        for d in range(depth):
            parts = [
                codebooks[d, g].T[indices[..., d * pq + g]] for g in range(pq)
            ]
            total = total + jnp.concatenate(parts, axis=-1)
        return total
