"""Device-resident packed corpus: upload once, train from HBM.

At small step times, corpus training on a slow host↔device link is wire
bound (RESULTS.md: 0.7 s of compute inside a 10–17 s epoch). A packed
corpus is small — the 1,700-utterance hard corpus is ~330 MB as int16
rows — so the TPU-idiomatic fix is to place ALL rows in device memory
once and feed each step only a row-index array (a few dozen bytes):
epochs become compute-bound regardless of link speed. This is also the
right shape for real pods, where host input pipelines are a classic
bottleneck (the reference streams every batch from host TFRecords each
step — `uPIT_baseline.ipynb cell 31`; no reference counterpart for this).

Shuffling note: rows are packed ONCE with the deterministic plan, and
epochs shuffle the ROW order (utterance-to-row assignment is fixed, like
pre-sharded corpora). Per-utterance loss semantics are unchanged — only
which utterances share a batch varies less than with per-epoch repacking.

Use with :func:`train.make_upit_packed_resident_steps`, which gathers rows
on device and runs the exact packed loss.
"""

from __future__ import annotations

import math
import pathlib
from typing import Iterator

import numpy as np

import jax

from .packing import PackedWaveformLoader

__all__ = ["ResidentPackedCorpus"]


class ResidentPackedCorpus:
    """Packs a split into rows once and places the arrays on device.

    Attributes ``mix [R, row_samples]``, ``sources [R, S, row_samples]``
    (int16 when ``transfer_int16``, the default — half the upload and HBM),
    ``frame_seg [R, row_frames]`` are committed ``jax.Array``s. Iterating
    yields per-batch row-index arrays (``rows_per_batch`` each); with
    ``shuffle=True`` the order is re-drawn per epoch and the ragged tail is
    dropped, otherwise rows are padded up to a batch multiple with empty
    (all-guard) rows, which contribute exactly zero to the packed loss.
    """

    def __init__(
        self,
        split_dir,
        rows_per_batch: int = 16,
        shuffle: bool = False,
        seed: int = 0,
        transfer_int16: bool = True,
        device=None,
        **packed_kwargs,
    ) -> None:
        self.split_dir = pathlib.Path(split_dir)
        self.rows_per_batch = rows_per_batch
        self.shuffle = shuffle
        self.seed = seed
        loader = PackedWaveformLoader(
            self.split_dir,
            rows_per_batch=1 << 30,  # everything in one host batch
            transfer_int16=transfer_int16,
            **packed_kwargs,
        )
        self.num_segments = loader.num_segments
        batch = next(iter(loader))
        mix, sources, frame_seg = batch.mix, batch.sources, batch.frame_seg
        self.names = batch.names
        self.audio_seconds = batch.audio_seconds
        self.num_rows = mix.shape[0]
        if not shuffle:
            # pad to a whole number of batches with empty rows (seg = -1):
            # they add exactly 0 to pit_loss_packed's sum reduction
            pad = (-self.num_rows) % rows_per_batch
            if pad:
                mix = np.concatenate([mix, np.zeros((pad, *mix.shape[1:]), mix.dtype)])
                sources = np.concatenate(
                    [sources, np.zeros((pad, *sources.shape[1:]), sources.dtype)]
                )
                frame_seg = np.concatenate(
                    [frame_seg, np.full((pad, frame_seg.shape[1]), -1, np.int32)]
                )
        self.padded_rows = mix.shape[0]
        put = (lambda a: jax.device_put(a, device)) if device else jax.device_put
        self.mix = put(mix)
        self.sources = put(sources)
        self.frame_seg = put(frame_seg)
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle epoch (resume support): the per-epoch RNG is
        seeded with ``seed + epoch``, so a resumed run continues the
        shuffle stream instead of replaying epoch 0 (advisor round 3)."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        if self.shuffle:
            return self.num_rows // self.rows_per_batch
        return math.ceil(self.num_rows / self.rows_per_batch)

    def __iter__(self) -> Iterator[np.ndarray]:
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            self._epoch += 1
            order = rng.permutation(self.num_rows).astype(np.int32)
            usable = len(self) * self.rows_per_batch
            order = order[:usable]
        else:
            order = np.arange(self.padded_rows, dtype=np.int32)
        for start in range(0, len(order), self.rows_per_batch):
            yield order[start : start + self.rows_per_batch]
