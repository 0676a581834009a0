"""Audio tokenizer workflow: VQ codes ↔ token streams ↔ transformer prior.

Completes the pipeline the reference sketches but never finishes: a VQ codec
whose codes are "transformer input" (`vq-vae_for_1d_data.ipynb cell 24`) and
the relative-position machinery for a prior over those codes
(`Untitled.ipynb cells 1-4`). Pieces:

- :class:`TokenLayout` — flattens the tokenizer codec's two residual-VQ
  streams (deep ``[B, G, d1]`` + skip ``[B, ratio·G, d2]``, see
  :class:`~speech_separation_tpu.models.VqVaeT3Tok`) into one causal token
  sequence. Group-major layout per deep step ``g``:
  ``[deep_g stage 0..d1-1, skip_{rg} stage 0..d2-1, …, skip_{rg+r-1} …]``;
  every (stream, stage) pair owns a disjoint vocabulary segment so the prior
  sees one flat vocabulary and positions imply their segment;
- :func:`make_prior_steps` — jitted next-token cross-entropy train/eval
  steps for :class:`~speech_separation_tpu.models.relpos.CodePrior`;
- :func:`sample_codes` — autoregressive sampling with logits masked to the
  position's vocabulary segment (the stream grammar);
- :func:`code_metrics` — codebook perplexity / usage diagnostics;
- :func:`encode_split` — tokenise a dataset split with a trained codec into
  fixed-length prior training windows.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Iterable

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "TokenLayout",
    "make_prior_steps",
    "sample_codes",
    "code_metrics",
    "empirical_token_entropy",
    "distinct_n",
    "encode_split",
    "TokenWindowLoader",
]


@dataclass(frozen=True)
class TokenLayout:
    """Token-stream geometry for a two-level residual-VQ codec."""

    deep_vocab: int
    skip_vocab: int
    deep_depth: int = 1
    skip_depth: int = 1
    ratio: int = 4  # skip positions per deep position (K/2 vs K/8)

    @property
    def group(self) -> int:
        """Tokens per deep step."""
        return self.deep_depth + self.ratio * self.skip_depth

    @property
    def vocab(self) -> int:
        return self.deep_depth * self.deep_vocab + self.skip_depth * self.skip_vocab

    def segment(self, position: int) -> tuple[int, int]:
        """``(offset, size)`` of the vocabulary segment at ``position % group``."""
        p = position % self.group
        if p < self.deep_depth:
            return p * self.deep_vocab, self.deep_vocab
        stage = (p - self.deep_depth) % self.skip_depth
        return self.deep_depth * self.deep_vocab + stage * self.skip_vocab, self.skip_vocab

    def segment_table(self) -> np.ndarray:
        """``[group, 2]`` of (offset, size) per position-in-group."""
        return np.asarray([self.segment(p) for p in range(self.group)], np.int32)

    def interleave(self, deep: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        """``deep [B, G, d1]`` + ``skip [B, ratio·G, d2]`` → ``[B, G·group]``."""
        deep = jnp.asarray(deep)
        skip = jnp.asarray(skip)
        if deep.ndim == 2:
            deep = deep[..., None]
        if skip.ndim == 2:
            skip = skip[..., None]
        b, g, d1 = deep.shape
        if d1 != self.deep_depth:
            raise ValueError(f"deep depth {d1} != layout {self.deep_depth}")
        if skip.shape != (b, self.ratio * g, self.skip_depth):
            raise ValueError(
                f"skip shape {skip.shape} != {(b, self.ratio * g, self.skip_depth)}"
            )
        deep_off = jnp.arange(self.deep_depth) * self.deep_vocab
        skip_off = self.deep_depth * self.deep_vocab + jnp.arange(self.skip_depth) * self.skip_vocab
        deep_tok = deep + deep_off  # [B, G, d1]
        skip_tok = (skip + skip_off).reshape(b, g, self.ratio * self.skip_depth)
        return jnp.concatenate([deep_tok, skip_tok], axis=2).reshape(b, g * self.group)

    def deinterleave(self, tokens: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Inverse of :meth:`interleave`; out-of-segment tokens are clipped."""
        tokens = jnp.asarray(tokens)
        b, t = tokens.shape
        if t % self.group:
            raise ValueError(f"token length {t} not a multiple of group {self.group}")
        g = t // self.group
        groups = tokens.reshape(b, g, self.group)
        deep_off = jnp.arange(self.deep_depth) * self.deep_vocab
        deep = jnp.clip(groups[:, :, : self.deep_depth] - deep_off, 0, self.deep_vocab - 1)
        skip_off = self.deep_depth * self.deep_vocab + jnp.arange(self.skip_depth) * self.skip_vocab
        skip = groups[:, :, self.deep_depth :].reshape(b, g * self.ratio, self.skip_depth)
        skip = jnp.clip(skip - skip_off, 0, self.skip_vocab - 1)
        return deep, skip

    @staticmethod
    def for_codec(codec) -> "TokenLayout":
        """Layout for a ``VqVaeT3Tok``-like codec module. PQ sub-vector
        streams count as extra stages (the code array is stage-major, so
        the segment cycle matches ``ResidualVectorQuantizer.codes``)."""
        return TokenLayout(
            deep_vocab=codec.num_embeddings,
            skip_vocab=codec.skip_embeddings,
            deep_depth=getattr(codec, "deep_depth", 1) * getattr(codec, "deep_pq", 1),
            skip_depth=getattr(codec, "skip_depth", 1) * getattr(codec, "skip_pq", 1),
        )


def make_prior_steps(model, donate_state: bool = True):
    """Jitted (train_step, eval_step) for a ``CodePrior`` over token batches."""

    def _loss(params, tokens):
        logits = model.apply({"params": params}, tokens)
        return type(model).loss(logits, tokens)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate_state else ())
    def train_step(state, tokens):
        loss, grads = jax.value_and_grad(_loss)(state.params, tokens)
        return state.apply_gradients(grads), loss

    @jax.jit
    def eval_step(state, tokens):
        return _loss(state.params, tokens)

    return train_step, eval_step


def sample_codes(
    model,
    params,
    num_groups: int,
    rng: jax.Array,
    layout: TokenLayout,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Autoregressively sample ``[1, num_groups · layout.group]`` tokens.

    KV-cached incremental decoding (``CodePrior.decode``) inside one jitted
    ``lax.scan`` — cost linear in sequence length (the round-2 version
    re-ran the full transformer per token: O(T²), unusable beyond demo
    lengths). Each position's logits are masked to its vocabulary segment
    (stream grammar); numerics match the full forward (tests/test_relpos.py).
    """
    total = num_groups * layout.group
    vocab = layout.vocab
    table = jnp.asarray(layout.segment_table())  # [group, 2]
    arange = jnp.arange(vocab)
    dmodel = model.clone(decode_length=total)
    inv_temp = 1.0 / max(temperature, 1e-6)

    # create the (zeroed) KV cache without running a step
    cache0 = jax.eval_shape(
        lambda: dmodel.apply(
            {"params": params},
            jnp.zeros((1,), jnp.int32),
            jnp.int32(0),
            method=type(model).decode,
            mutable=["cache"],
        )[1]["cache"]
    )
    cache0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), cache0)

    @jax.jit
    def run(cache, keys):
        def body(carry, inp):
            cache, prev = carry
            t, key = inp
            logits, mut = dmodel.apply(
                {"params": params, "cache": cache},
                prev,
                t,
                method=type(model).decode,
                mutable=["cache"],
            )
            offset, size = table[t % layout.group, 0], table[t % layout.group, 1]
            mask = (arange >= offset) & (arange < offset + size)
            tok = jax.random.categorical(
                key, jnp.where(mask, logits[0] * inv_temp, -jnp.inf)
            )
            tok1 = jnp.full((1,), tok, jnp.int32)
            return (mut["cache"], tok1), tok
        (_, _), toks = jax.lax.scan(
            body, (cache, jnp.zeros((1,), jnp.int32)), (jnp.arange(total), keys)
        )
        return toks

    return run(cache0, jax.random.split(rng, total))[None, :]


def empirical_token_entropy(windows: np.ndarray, layout: TokenLayout) -> dict[str, float]:
    """Entropy baselines for prior calibration (nats/token).

    A next-token loss means nothing in isolation: a near-deterministic code
    stream makes tiny losses trivially achievable (memorization), while a
    high-entropy stream makes them impossible. This reports the two unigram
    ceilings any *context-free* predictor is bound by:

    - ``marginal_nats``: H of the pooled token distribution;
    - ``positional_nats``: mean over position-in-group of H(token | p) —
      the tighter ceiling, since each position owns a vocab segment.

    A prior's nats/token below ``positional_nats`` measures real context
    modeling; the gap to zero measures how predictable the stream is."""
    windows = np.asarray(windows)
    flat = windows.reshape(-1)

    def _h(counts: np.ndarray) -> float:
        p = counts / max(counts.sum(), 1)
        nz = p[p > 0]
        return float(-np.sum(nz * np.log(nz)))

    marginal = _h(np.bincount(flat, minlength=layout.vocab))
    g = layout.group
    pos_h = []
    for p in range(g):
        toks = windows[:, p::g].reshape(-1)
        pos_h.append(_h(np.bincount(toks, minlength=layout.vocab)))
    return {
        "marginal_nats": round(marginal, 4),
        "positional_nats": round(float(np.mean(pos_h)), 4),
        "positional_bits": round(float(np.mean(pos_h) / np.log(2.0)), 4),
    }


def distinct_n(tokens: np.ndarray, n: int = 3) -> float:
    """Sample-diversity: fraction of distinct n-grams across token streams
    (1.0 = every n-gram unique; near 0 = the sampler loops/collapses)."""
    tokens = np.asarray(tokens)
    if tokens.ndim == 1:
        tokens = tokens[None]
    grams = set()
    total = 0
    for row in tokens:
        for i in range(len(row) - n + 1):
            grams.add(tuple(int(x) for x in row[i : i + n]))
            total += 1
    return round(len(grams) / max(total, 1), 4)


def code_metrics(indices: np.ndarray, num_codes: int) -> dict[str, float]:
    """Codebook health: perplexity ``exp(H(p))`` of the empirical code
    distribution and the fraction of codes used at least once."""
    counts = np.bincount(np.asarray(indices).reshape(-1), minlength=num_codes)
    total = counts.sum()
    if total == 0:
        return {"perplexity": 0.0, "usage": 0.0, "codes": 0}
    p = counts / total
    nz = p[p > 0]
    perplexity = float(np.exp(-np.sum(nz * np.log(nz))))
    return {
        "perplexity": round(perplexity, 2),
        "usage": round(float((counts > 0).mean()), 4),
        "codes": int(total),
    }


def encode_split(
    codec_model,
    codec_params,
    loader: Iterable,
    seq_len: int,
    layout: TokenLayout | None = None,
) -> np.ndarray:
    """Tokenise every utterance in a ``VaeLoader`` split into fixed
    ``seq_len`` windows for prior training.

    ``seq_len`` must be a multiple of ``layout.group``; utterances are
    chopped into as many whole windows as fit (the ragged tail is dropped —
    windows are plentiful at 25 groups/s of audio).
    """
    if layout is None:
        layout = TokenLayout.for_codec(codec_model)
    if seq_len % layout.group:
        raise ValueError(f"seq_len {seq_len} must be a multiple of {layout.group}")

    @jax.jit
    def _codes(frames):
        return codec_model.apply(
            {"params": codec_params}, frames, method=type(codec_model).codes
        )

    # Pad every batch's frame axis up to a multiple of PAD_QUANT so ``_codes``
    # compiles a handful of shapes instead of one per distinct padded batch
    # length. A 1,200-utterance corpus split yields ~300 batches with ~100
    # distinct padded lengths — per-shape recompiles made corpus-scale
    # tokenisation take hours on the single-CPU host (the round-4 prior run
    # died mid-tokenisation with an empty metrics.jsonl because of this).
    PAD_QUANT = 512

    windows: list[np.ndarray] = []
    for batch in loader:
        x = np.asarray(batch.inputs)
        k_true = x.shape[1]
        k_pad = -(-k_true // PAD_QUANT) * PAD_QUANT
        if k_pad != k_true:
            pad = np.zeros((x.shape[0], k_pad - k_true) + x.shape[2:], x.dtype)
            x = np.concatenate([x, pad], axis=1)
        deep, skip = _codes(jnp.asarray(x))
        tokens = np.asarray(layout.interleave(deep, skip))  # [B, tokens(k_pad)]
        rate = tokens.shape[1] / k_pad  # tokens per frame (layout-derived)
        frame_elems = x.shape[2] if x.ndim == 3 else 1
        lengths = getattr(batch, "lengths", None)
        for i in range(tokens.shape[0]):
            # trim each row to ITS OWN true token length: quantisation padding
            # and intra-batch padding both encode to silence tokens that would
            # otherwise pollute the prior's training stream
            if lengths is not None:
                t_i = int(int(lengths[i]) // frame_elems * rate)
            else:
                t_i = int(k_true * rate)
            t_i = t_i // layout.group * layout.group
            row = tokens[i, :t_i]
            n = row.shape[0] // seq_len
            if n:
                windows.append(row[: n * seq_len].reshape(n, seq_len))
    if not windows:
        raise ValueError("no windows produced — utterances shorter than seq_len?")
    return np.concatenate(windows, axis=0)


class TokenWindowLoader:
    """Shuffled fixed-shape batches over pre-tokenised ``[N, seq_len]`` windows.

    Ragged final batches are dropped when at least one full batch exists
    (stable shapes → one XLA compile); with fewer windows than ``batch_size``
    the single short batch is yielded as-is.
    """

    def __init__(self, windows: np.ndarray, batch_size: int, shuffle: bool = False, seed: int = 0):
        self.windows = np.asarray(windows)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0

    def __len__(self) -> int:
        return max(1, self.windows.shape[0] // self.batch_size)

    def __iter__(self):
        n = self.windows.shape[0]
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self._epoch).permutation(order)
            self._epoch += 1
        if n < self.batch_size:
            yield self.windows[order]
            return
        for start in range(0, n - self.batch_size + 1, self.batch_size):
            yield self.windows[order[start : start + self.batch_size]]
