"""Permutation-invariant training loss (masked, length-normalised).

Semantics follow the reference's 2-speaker ``pit_loss``
(`uPIT_baseline.ipynb cell 28`, identical copy in `Raw_with_Convlayer.ipynb
cell 12`), generalised to any speaker count via a static permutation table:

- a ``sequence_mask`` over valid frames is applied to the *predictions only*
  (labels are zero beyond the valid region by construction of the data
  pipeline, so masking them would be redundant);
- per permutation: squared error summed over time, then over features, then
  divided by the per-utterance valid length;
- the minimum over permutations is taken per utterance and **summed** over the
  batch (the reference's reduction; pass ``reduction="mean"`` for a
  batch-size-independent variant).

Unlike the reference, lengths are an explicit argument instead of a row
smuggled into the label tensor. All permutations are evaluated inside one
jitted graph — for S speakers that is S! static branches of fused
elementwise+reduce work, which XLA handles without data-dependent control
flow.
"""

from __future__ import annotations

import itertools
import math

import jax.numpy as jnp

__all__ = ["pit_loss", "pit_loss_packed", "pairwise_pit_costs", "pit_si_sdr_loss"]


def _split_speakers(x: jnp.ndarray, num_speakers: int) -> jnp.ndarray:
    """[B, T, S*F] → [B, T, S, F] (no-op copy if already 4-D)."""
    if x.ndim == 4:
        return x
    b, t, sf = x.shape
    if sf % num_speakers:
        raise ValueError(f"feature dim {sf} not divisible by {num_speakers} speakers")
    return x.reshape(b, t, num_speakers, sf // num_speakers)


def pairwise_pit_costs(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    lengths: jnp.ndarray,
    num_speakers: int = 2,
) -> jnp.ndarray:
    """Per-utterance cost of assigning prediction i to label j: ``[B, S, S]``.

    ``preds`` / ``labels``: ``[B, T, S, F]`` or ``[B, T, S*F]``;
    ``lengths``: ``[B]`` valid frame counts.
    """
    preds = _split_speakers(preds, num_speakers)
    labels = _split_speakers(labels, num_speakers)
    t = preds.shape[1]
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(preds.dtype)  # [B, T]
    masked = preds * mask[:, :, None, None]
    diff = masked[:, :, :, None, :] - labels[:, :, None, :, :]  # [B, T, S_pred, S_label, F]
    return jnp.sum(jnp.square(diff), axis=(1, 4))  # [B, S, S]


def pit_loss(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    lengths: jnp.ndarray,
    num_speakers: int = 2,
    reduction: str = "sum",
) -> jnp.ndarray:
    """Masked, length-normalised PIT squared-error loss.

    Matches the reference exactly for ``num_speakers=2`` and
    ``reduction="sum"``.
    """
    costs = pairwise_pit_costs(preds, labels, lengths, num_speakers)
    perms = list(itertools.permutations(range(num_speakers)))
    idx = jnp.arange(num_speakers)
    per_perm = jnp.stack(
        [costs[:, idx, jnp.asarray(p)].sum(axis=-1) for p in perms], axis=1
    )  # [B, S!]
    per_utt = jnp.min(per_perm, axis=1) / lengths.astype(preds.dtype)
    if reduction == "sum":
        return jnp.sum(per_utt)
    if reduction == "mean":
        return jnp.mean(per_utt)
    if reduction == "none":
        return per_utt
    raise ValueError(f"unknown reduction {reduction!r}")


def pit_loss_packed(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    frame_seg: jnp.ndarray,
    num_speakers: int = 2,
    num_segments: int = 8,
    reduction: str = "sum",
) -> jnp.ndarray:
    """:func:`pit_loss` for sequence-packed batches.

    Each batch row holds several utterances packed end-to-end (see
    ``data/packing.py``); ``frame_seg [B, T]`` assigns every frame its
    within-row segment id in ``[0, num_segments)``, with ``-1`` for guard
    and tail frames that belong to no utterance. The permutation search,
    length normalisation and batch reduction run **per segment**, so the
    value equals the sum (or mean) of :func:`pit_loss` evaluated on each
    utterance individually — packing changes the batching, not the
    objective (parity pinned in ``tests/test_packed.py``).

    Guard/tail frames are excluded by the segment one-hot (``-1`` matches
    no segment), so neither predictions nor labels there contribute.
    """
    preds = _split_speakers(preds, num_speakers)
    labels = _split_speakers(labels, num_speakers)
    diff = preds[:, :, :, None, :] - labels[:, :, None, :, :]  # [B,T,Se,Sl,F]
    pair_frame = jnp.sum(jnp.square(diff), axis=-1)  # [B, T, Se, Sl]
    onehot = (frame_seg[..., None] == jnp.arange(num_segments)).astype(preds.dtype)
    seg_pair = jnp.einsum("btij,btg->bgij", pair_frame, onehot)  # [B, G, Se, Sl]
    seg_len = jnp.sum(onehot, axis=1)  # [B, G] frames per segment

    perms = list(itertools.permutations(range(num_speakers)))
    idx = jnp.arange(num_speakers)
    per_perm = jnp.stack(
        [seg_pair[:, :, idx, jnp.asarray(p)].sum(axis=-1) for p in perms], axis=-1
    )  # [B, G, S!]
    best = jnp.min(per_perm, axis=-1)  # [B, G]
    per_seg = jnp.where(seg_len > 0, best / jnp.maximum(seg_len, 1.0), 0.0)
    if reduction == "sum":
        return jnp.sum(per_seg)
    if reduction == "mean":
        return jnp.sum(per_seg) / jnp.maximum(jnp.sum(seg_len > 0), 1)
    if reduction == "none":
        return per_seg
    raise ValueError(f"unknown reduction {reduction!r}")


def num_permutations(num_speakers: int) -> int:
    return math.factorial(num_speakers)


def pit_si_sdr_loss(
    est: jnp.ndarray,
    refs: jnp.ndarray,
    sample_lengths: jnp.ndarray,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Negative permutation-best mean SI-SDR over waveforms (time-domain PIT).

    ``est`` / ``refs``: ``[B, S, samples]``; ``sample_lengths``: ``[B]``.
    Samples beyond the valid length are masked out of the projection. This is
    the modern time-domain separation objective (e.g. Conv-TasNet) — the
    reference's uPIT uses squared error; this shares its permutation-search
    machinery but scores in dB.
    """
    b, s, t = est.shape
    mask = (jnp.arange(t)[None, None, :] < sample_lengths[:, None, None]).astype(est.dtype)
    est = est * mask
    refs = refs * mask
    # pairwise SI-SDR [B, S_est, S_ref]; the noise term is computed by
    # explicit subtraction — the algebraic ‖e‖² − 2α·<e,r> + ‖αr‖² shortcut
    # cancels catastrophically in fp32 when est ≈ ref
    dot = jnp.einsum("bet,brt->ber", est, refs)
    ref_energy = jnp.sum(jnp.square(refs), axis=-1)[:, None, :]  # [B, 1, S_ref]
    scale = dot / (ref_energy + eps)
    target_energy = jnp.square(scale) * ref_energy  # ‖α·r‖²
    noise = est[:, :, None, :] - scale[..., None] * refs[:, None, :, :]
    noise_energy = jnp.sum(jnp.square(noise), axis=-1)  # [B, S_est, S_ref]
    ratio = target_energy / (noise_energy + eps)
    pair_si_sdr = 10.0 * jnp.log10(ratio + eps)  # [B, S_est, S_ref]

    perms = list(itertools.permutations(range(s)))
    idx = jnp.arange(s)
    per_perm = jnp.stack(
        [pair_si_sdr[:, idx, jnp.asarray(p)].mean(axis=-1) for p in perms], axis=1
    )
    return -jnp.mean(jnp.max(per_perm, axis=1))
