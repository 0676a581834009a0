"""SI-SDR metrics: per-utterance, permutation-best, and streaming mean.

Numpy/JAX re-implementation of the reference's scoring conventions:

- ``si_sdr`` — projection formula (`metrics/evaluate_metrics.py:22-26`);
- ``permute_si_sdr`` — the best over the two speaker assignments of the
  *pair-mean* SI-SDR (`metrics/evaluate_metrics.py:28-34`), generalised to N
  speakers;
- ``MeanSiSdr`` — a functional streaming mean, replacing the Keras ``SiSdr``
  metric (`vq-vae_for_1d_data.ipynb cell 13`): a pure pytree state so it can
  live inside jitted/pmapped steps.
"""

from __future__ import annotations

import itertools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..losses.sisdr import si_sdr

__all__ = ["si_sdr_np", "permute_si_sdr", "MeanSiSdr"]


def si_sdr_np(reference: np.ndarray, estimate: np.ndarray) -> float:
    """Host-side SI-SDR of one utterance (float64 numpy)."""
    reference = np.asarray(reference, dtype=np.float64)
    estimate = np.asarray(estimate, dtype=np.float64)
    target = np.sum(estimate * reference) * reference / np.sum(np.square(reference))
    noise = estimate - target
    return float(10.0 * np.log10(np.sum(np.square(target)) / np.sum(np.square(noise))))


def permute_si_sdr(references, estimates) -> float:
    """Best-over-assignments mean SI-SDR for one utterance.

    ``references`` / ``estimates``: sequences of 1-D waveforms (equal count).
    For two speakers this is exactly the reference's ``permute_si_sdr``.
    """
    n = len(references)
    assert len(estimates) == n
    scores = np.array(
        [[si_sdr_np(r, e) for e in estimates] for r in references]
    )  # [ref, est]
    best = -np.inf
    for perm in itertools.permutations(range(n)):
        best = max(best, float(np.mean(scores[np.arange(n), perm])))
    return best


class MeanSiSdr(NamedTuple):
    """Streaming mean SI-SDR as an immutable pytree (jit-friendly)."""

    total: jnp.ndarray
    count: jnp.ndarray

    @classmethod
    def init(cls) -> "MeanSiSdr":
        return cls(total=jnp.zeros(()), count=jnp.zeros(()))

    def update(self, targets: jnp.ndarray, preds: jnp.ndarray) -> "MeanSiSdr":
        values = si_sdr(preds, targets)
        return MeanSiSdr(
            total=self.total + jnp.sum(values),
            count=self.count + values.shape[0],
        )

    def result(self) -> jnp.ndarray:
        return self.total / jnp.maximum(self.count, 1.0)
