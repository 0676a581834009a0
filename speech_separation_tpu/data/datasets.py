"""Batching and host→device data loading.

Replaces the reference's tf.data pipeline and Keras ``Sequence`` generators
(`uPIT_baseline.ipynb cells 12-22`, `Raw_with_Convlayer.ipynb cell 2`,
`vq-vae*.ipynb cell 2`) with explicit, testable loaders:

- lengths are first-class ``lengths`` arrays (the reference tiled the scalar
  length into an extra label row — the "length-smuggling protocol" of
  `uPIT cell 17` — which every loss had to unpack; here nothing is smuggled);
- batches are padded to *buckets* (next multiple of a pad quantum) instead of
  a global split maximum, bounding XLA recompilations while wasting far less
  padding than the reference's pad-to-global-max;
- a double-buffered device prefetcher overlaps host prep with device compute.

Three product families:

- :class:`WaveformLoader` — mix + sources as raw waveforms; the TPU train
  step computes STFT/PSM features on device (see ``ops/features.py``);
- :func:`load_tfrecord_spectrograms` — reads the reference's pre-built
  spectrogram TFRecords (bundled fixture included) for bit-parity work;
- :class:`VaeLoader` — single-source batches for the VQ-VAE codecs, in
  sample-level ``[B, T, 1]`` or frame-stacked ``[B, K, L]`` layout with the
  reference's peak-normalised read and stride-alignment rounding.
"""

from __future__ import annotations

import math
import pathlib
from dataclasses import dataclass, field
from typing import Iterator, NamedTuple, Sequence

import numpy as np

import jax

from ..ops.stft import stft_frame_count
from .audio_io import audioread, quantize_i16, read_normalized
from .features import resolve_mix_dirname, utterance_names
from .tfrecord import parse_sequence_example, read_tfrecord_file

__all__ = [
    "WaveformBatch",
    "SpectrogramBatch",
    "VaeBatch",
    "WaveformLoader",
    "VaeLoader",
    "load_tfrecord_spectrograms",
    "background_iterator",
    "prefetch_to_device",
]


class WaveformBatch(NamedTuple):
    mix: np.ndarray  # [B, samples]
    sources: np.ndarray  # [B, num_speakers, samples]
    sample_lengths: np.ndarray  # [B] true waveform lengths
    frame_lengths: np.ndarray  # [B] true STFT frame counts
    names: tuple[str, ...]


class SpectrogramBatch(NamedTuple):
    magnitude: np.ndarray  # [B, T, F]
    cos_angle: np.ndarray  # [B, T, F]
    sin_angle: np.ndarray  # [B, T, F]
    labels: np.ndarray  # [B, T, S * F]
    lengths: np.ndarray  # [B] valid frames
    names: tuple[str, ...]


class VaeBatch(NamedTuple):
    inputs: np.ndarray  # [B, T, 1] or [B, K, L]
    targets: np.ndarray  # [B, T, 1] waveform targets
    lengths: np.ndarray  # [B] valid target samples (or frames for stacked)
    names: tuple[str, ...]


def _round_up(value: int, quantum: int) -> int:
    return ((value + quantum - 1) // quantum) * quantum


def load_utterance_batch(split_dir, names, num_speakers: int, sample_rate: int):
    """Decode ``(mix, [s1..sN])`` for every name, using the native C++
    thread-pool decoder when available and no resampling is needed."""
    split_dir = pathlib.Path(split_dir)
    mixdir = resolve_mix_dirname(split_dir)
    try:
        from .. import native
    except ImportError:
        native = None
    if native is not None and native.available():
        paths = [split_dir / mixdir / n for n in names]
        for i in range(num_speakers):
            paths += [split_dir / f"s{i + 1}" / n for n in names]
        decoded = native.wav_read_batch(paths)
        if all(sr == sample_rate for _, sr in decoded):
            b = len(names)
            mixes = [d for d, _ in decoded[:b]]
            sources = [
                [decoded[(s + 1) * b + i][0] for s in range(num_speakers)]
                for i in range(b)
            ]
            return list(zip(mixes, sources))
    out = []
    for n in names:
        mix = audioread(split_dir / mixdir / n, sample_rate)
        srcs = [
            audioread(split_dir / f"s{i + 1}" / n, sample_rate)
            for i in range(num_speakers)
        ]
        out.append((mix, srcs))
    return out


def load_source_files(split_dir, names, slot: int, sample_rate: int):
    """Decode one source slot (``s{slot+1}/name`` for every name) to float32,
    via the native thread-pool decoder when available (dynamic-mixing path:
    slots are re-paired across utterances, so rows are loaded per slot)."""
    split_dir = pathlib.Path(split_dir)
    paths = [split_dir / f"s{slot + 1}" / n for n in names]
    try:
        from .. import native
    except ImportError:
        native = None
    if native is not None and native.available():
        decoded = native.wav_read_batch(paths)
        if all(sr == sample_rate for _, sr in decoded):
            return [d for d, _ in decoded]
    return [audioread(p, sample_rate) for p in paths]


def load_utterance_batch_i16(split_dir, names, num_speakers: int, sample_rate: int):
    """int16 variant of :func:`load_utterance_batch` for the link-transfer
    hot path: mono-PCM16 files at the target rate are memcpy'd straight to
    int16 counts by the native decoder — no float round-trip, half the host
    bytes. Files outside that fast path (resampling, multichannel, library
    absent) decode float and quantize (``audio_io.quantize_i16``) — the same
    values either way, since quantize∘decode is the identity on 16-bit PCM."""
    split_dir = pathlib.Path(split_dir)
    paths = [split_dir / resolve_mix_dirname(split_dir) / n for n in names]
    for i in range(num_speakers):
        paths += [split_dir / f"s{i + 1}" / n for n in names]
    try:
        from .. import native

        decoded = (
            native.wav_read_batch_i16(paths)
            if native.available()
            else [None] * len(paths)
        )
    except ImportError:
        decoded = [None] * len(paths)
    flat = []
    for p, d in zip(paths, decoded):
        if d is not None and d[1] == sample_rate:
            flat.append(d[0])
        else:
            flat.append(quantize_i16(audioread(p, sample_rate)))
    b = len(names)
    mixes = flat[:b]
    sources = [
        [flat[(s + 1) * b + i] for s in range(num_speakers)] for i in range(b)
    ]
    return list(zip(mixes, sources))


@dataclass
class WaveformLoader:
    """Batches of (mix, s1..sN) waveforms from a wsj0-2mix style split dir."""

    split_dir: str | pathlib.Path
    batch_size: int = 2
    sample_rate: int = 8000
    stft_size: int = 256
    stft_shift: int = 128
    num_speakers: int = 2
    pad_quantum_seconds: float = 1.0
    pad_quantum_samples: int | None = None  # overrides pad_quantum_seconds
    shuffle: bool = False
    seed: int = 0
    drop_remainder: bool = False
    sort_by_length: bool = False
    # ship int16 PCM counts over the host↔device link (half the bytes of
    # fp32 — the relay link is the corpus-training bottleneck); the jitted
    # steps dequantize on device, bit-exactly for 16-bit sources
    # (audio_io.quantize_i16)
    transfer_int16: bool = False
    # dynamic mixing (the standard wsj0-2mix augmentation; no reference
    # counterpart — its mixtures are fixed on disk): every epoch re-pairs
    # source slots ACROSS utterances (fresh speaker combinations, ~N^2
    # distinct mixtures from N utterances), applies fresh zero-mean gain
    # offsets within ±dynamic_gain_db, random-crops the longer sources,
    # and remixes mix = Σ gained sources on the host. Targets are the
    # gained sources, so loss semantics are unchanged.
    dynamic_mix: bool = False
    dynamic_gain_db: float = 2.5
    # re-pair only within windows of this many adjacent batches in the
    # length-sorted order, bounding truncation loss from length mismatch
    dynamic_window_batches: int = 4
    names: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        self.split_dir = pathlib.Path(self.split_dir)
        if not self.names:
            self.names = utterance_names(self.split_dir)
        if self.sort_by_length:
            # order utterances by duration (wav headers only — no decode) so
            # batches group similar lengths: far less padding waste than the
            # reference's pad-to-split-max, fewer distinct bucket shapes
            from .audio_io import wav_duration_samples

            mixdir = resolve_mix_dirname(self.split_dir)
            durations = [
                wav_duration_samples(self.split_dir / mixdir / n)[0] for n in self.names
            ]
            self.names = [n for _, n in sorted(zip(durations, self.names))]
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle epoch (resume support): the per-epoch RNG is
        seeded with ``seed + epoch``, so a resumed run continues the
        shuffle stream instead of replaying epoch 0 (advisor round 3)."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        n = len(self.names)
        return n // self.batch_size if self.drop_remainder else math.ceil(n / self.batch_size)

    def _load_batch(self, names):
        loader = load_utterance_batch_i16 if self.transfer_int16 else load_utterance_batch
        return loader(self.split_dir, names, self.num_speakers, self.sample_rate)

    def __iter__(self) -> Iterator[WaveformBatch]:
        epoch = self._epoch
        n = len(self.names)
        pos = np.arange(n)
        slot_idx = None
        dm_rng = None
        if self.dynamic_mix:
            # per-epoch re-pairing: slot 0 keeps its utterance; slots 1..S-1
            # draw their source from a permutation WITHIN adjacent-length
            # windows (names are length-sorted under sort_by_length)
            dm_rng = np.random.default_rng((self.seed, 7919, epoch))
            w = max(1, self.dynamic_window_batches * self.batch_size)
            slot_idx = np.tile(pos, (self.num_speakers, 1))
            for s in range(1, self.num_speakers):
                for ws in range(0, n, w):
                    seg = slot_idx[s, ws : ws + w]
                    dm_rng.shuffle(seg)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            self._epoch += 1
            if self.sort_by_length:
                # preserve the length grouping: shuffle whole batches, not rows
                groups = [
                    pos[s : s + self.batch_size]
                    for s in range(0, n, self.batch_size)
                ]
                rng.shuffle(groups)
                pos = np.concatenate(groups) if groups else pos
            else:
                pos = rng.permutation(pos)
        elif self.dynamic_mix:
            self._epoch += 1  # fresh pairings/gains even without shuffling
        order = pos
        if slot_idx is not None:
            slot_idx = slot_idx[:, pos]
        quantum = self.pad_quantum_samples or max(
            1, int(self.pad_quantum_seconds * self.sample_rate)
        )
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_remainder and len(idx) < self.batch_size:
                return
            names = tuple(self.names[i] for i in idx)
            if self.dynamic_mix:
                yield self._dynamic_batch(
                    slot_idx[:, start : start + len(idx)], names, quantum, dm_rng
                )
                continue
            loaded = self._load_batch(names)
            lengths = np.asarray([len(m) for m, _ in loaded], dtype=np.int32)
            padded = _round_up(int(lengths.max()), quantum)
            b = len(loaded)
            dtype = np.int16 if self.transfer_int16 else np.float32
            mix = np.zeros((b, padded), dtype=dtype)
            sources = np.zeros((b, self.num_speakers, padded), dtype=dtype)
            for i, (m, srcs) in enumerate(loaded):
                mix[i, : len(m)] = m
                for s, src in enumerate(srcs):
                    sources[i, s, : len(src)] = src
            frame_lengths = np.asarray(
                [
                    stft_frame_count(int(n), self.stft_size, self.stft_shift)
                    for n in lengths
                ],
                dtype=np.int32,
            )
            yield WaveformBatch(mix, sources, lengths, frame_lengths, names)

    def _dynamic_batch(self, batch_slots, names, quantum, dm_rng) -> WaveformBatch:
        """Assemble one dynamically-mixed batch: decode each slot's (possibly
        re-paired) source files, random-crop every source to the row's
        shortest, apply fresh zero-mean per-source gains, remix on host."""
        S, b = batch_slots.shape
        decoded = [
            load_source_files(
                self.split_dir,
                [self.names[i] for i in batch_slots[s]],
                s,
                self.sample_rate,
            )
            for s in range(S)
        ]
        lengths = np.asarray(
            [min(len(decoded[s][i]) for s in range(S)) for i in range(b)],
            dtype=np.int32,
        )
        padded = _round_up(int(lengths.max()), quantum)
        gains_db = dm_rng.uniform(-self.dynamic_gain_db, self.dynamic_gain_db, (b, S))
        gains_db -= gains_db.mean(axis=1, keepdims=True)
        gains = 10.0 ** (gains_db / 20.0)
        out_dtype = np.int16 if self.transfer_int16 else np.float32
        sources = np.zeros((b, S, padded), dtype=out_dtype)
        for i in range(b):
            ln = int(lengths[i])
            cuts = []
            for s in range(S):
                src = decoded[s][i]
                off = int(dm_rng.integers(0, len(src) - ln + 1))
                cuts.append(src[off : off + ln] * gains[i, s])
            # ±gain_db can push a near-full-scale source past ±1, where
            # quantize_i16 would clip and the int16 path would diverge from
            # float DM; attenuate the whole item (all sources equally, so the
            # remix stays mix ≡ Σ sources and relative gains are preserved —
            # SI-SDR targets are scale-invariant to a common item gain).
            # Applied on BOTH transfer paths to keep them bit-comparable.
            peak = max(float(np.abs(c).max(initial=0.0)) for c in cuts)
            if peak > 1.0:
                # target 32767/32768, not 1.0: +1.0 quantizes asymmetrically
                # (round→32768→clip→32767, a 1-LSB divergence from the float
                # path) while every |x| ≤ 32767/32768 round-trips cleanly
                cuts = [c * (32767.0 / 32768.0 / peak) for c in cuts]
            for s in range(S):
                if self.transfer_int16:
                    sources[i, s, :ln] = quantize_i16(cuts[s])
                else:
                    sources[i, s, :ln] = cuts[s]
        if self.transfer_int16:
            # mix ships as the UNCLIPPED int32 sum of the quantized sources
            # (±2.5 dB gains can push two near-full-scale sources past
            # ±32767; clipping here would break mix ≡ Σ sources on device
            # and diverge from the float DM path). ops/quant.dequant_i16
            # applies the same 1/32768 scale to int16 and int32 lanes.
            mix = sources.astype(np.int32).sum(axis=1, dtype=np.int32)
        else:
            mix = sources.sum(axis=1)
        frame_lengths = np.asarray(
            [stft_frame_count(int(x), self.stft_size, self.stft_shift) for x in lengths],
            dtype=np.int32,
        )
        return WaveformBatch(mix, sources, lengths, frame_lengths, names)


def load_tfrecord_spectrograms(
    record_dir: str | pathlib.Path,
    batch_size: int = 2,
    input_size: int = 129,
) -> list[SpectrogramBatch]:
    """Read a directory of reference-format spectrogram TFRecords into batches.

    Records hold per-frame ``inputs`` ``[2F]`` (magnitude ‖ angle), ``labels``
    ``[2F]``, a scalar ``length`` and a ``name`` — the layout written by
    `uPIT_baseline.ipynb cell 10` (and by ``data/features.py``).
    """
    record_dir = pathlib.Path(record_dir)
    utterances = []
    for path in sorted(record_dir.glob("*.tfrecords")):
        for payload in read_tfrecord_file(path):
            feats = parse_sequence_example(payload)
            inputs = np.stack(feats["inputs"])  # [T, 2F]
            labels = np.stack(feats["labels"])
            length = int(feats["length"][0][0]) if "length" in feats else inputs.shape[0]
            raw_name = feats.get("name", [path.stem])[0]
            name = raw_name.decode("utf-8") if isinstance(raw_name, bytes) else str(raw_name)
            utterances.append((inputs, labels, length, name))

    batches = []
    for start in range(0, len(utterances), batch_size):
        chunk = utterances[start : start + batch_size]
        t = max(u[0].shape[0] for u in chunk)
        f2 = chunk[0][0].shape[1]
        b = len(chunk)
        inputs = np.zeros((b, t, f2), dtype=np.float32)
        labels = np.zeros((b, t, chunk[0][1].shape[1]), dtype=np.float32)
        lengths = np.zeros((b,), dtype=np.int32)
        names = []
        for i, (inp, lab, ln, nm) in enumerate(chunk):
            inputs[i, : inp.shape[0]] = inp
            labels[i, : lab.shape[0]] = lab
            lengths[i] = ln
            names.append(nm)
        magnitude = inputs[..., :input_size]
        angle = inputs[..., input_size:]
        batches.append(
            SpectrogramBatch(
                magnitude=magnitude,
                cos_angle=np.cos(angle).astype(np.float32),
                sin_angle=np.sin(angle).astype(np.float32),
                labels=labels,
                lengths=lengths,
                names=tuple(names),
            )
        )
    return batches


@dataclass
class VaeLoader:
    """Single-source batches for the VQ-VAE codec family.

    ``stacked=False`` → sample-level ``[B, T, 1]`` (RawForVAEGenerator,
    `vq-vae_for_1d_data.ipynb cell 2`): batch padded up to whole seconds.
    ``stacked=True`` → frame-stacked ``[B, K, L]`` (RawStackForVAEGenerator,
    `_t2/_t3 cell 3`): per-utterance K rounded up to a multiple of
    ``stride_alignment`` so strided encoder/decoder pairs invert cleanly.
    The batch K additionally rounds up to ``pad_quantum_seconds`` buckets —
    without it every batch is a fresh XLA shape at corpus scale (the
    4-utterance fixture never shows this; a 1,700-utterance epoch measured
    ~1.9 s/step of recompiles vs ~5 ms of compute).
    """

    split_dir: str | pathlib.Path
    source: str = "s1"
    batch_size: int = 2
    sample_rate: int = 8000
    stacked: bool = False
    frame_size: int = 40
    stride_alignment: int = 4
    pad_quantum_seconds: float = 1.0
    shuffle: bool = False
    seed: int = 0
    names: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        self.split_dir = pathlib.Path(self.split_dir)
        if not self.names:
            self.names = utterance_names(self.split_dir)
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle epoch (resume support): the per-epoch RNG is
        seeded with ``seed + epoch``, so a resumed run continues the
        shuffle stream instead of replaying epoch 0 (advisor round 3)."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        return math.ceil(len(self.names) / self.batch_size)

    def __iter__(self) -> Iterator[VaeBatch]:
        order = np.arange(len(self.names))
        if self.shuffle:
            order = np.random.default_rng(self.seed + self._epoch).permutation(order)
            self._epoch += 1
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            names = tuple(self.names[i] for i in idx)
            wavs = [
                read_normalized(self.split_dir / self.source / n, self.sample_rate)
                for n in names
            ]
            lengths = np.asarray([len(w) for w in wavs], dtype=np.int32)
            if not self.stacked:
                padded = _round_up(int(lengths.max()), self.sample_rate)
                batch = np.zeros((len(wavs), padded, 1), dtype=np.float32)
                for i, w in enumerate(wavs):
                    batch[i, : len(w), 0] = w
                yield VaeBatch(batch, batch, lengths, names)
                continue

            l = self.frame_size
            ks = []
            for w in wavs:
                k = math.ceil(len(w) / l)
                k = _round_up(k, self.stride_alignment)
                ks.append(k)
            # bucket the batch shape: quantum in frames, kept divisible by
            # the stride alignment so the codec's stride-2 levels still invert
            quantum_k = _round_up(
                max(1, int(self.pad_quantum_seconds * self.sample_rate / l)),
                self.stride_alignment,
            )
            k_max = _round_up(max(ks), quantum_k)
            inputs = np.zeros((len(wavs), k_max, l), dtype=np.float32)
            targets = np.zeros((len(wavs), k_max * l, 1), dtype=np.float32)
            for i, (w, k) in enumerate(zip(wavs, ks)):
                padded = np.zeros(k * l, dtype=np.float32)
                padded[: len(w)] = w
                inputs[i, :k] = padded.reshape(k, l)
                targets[i, : k * l, 0] = padded
            yield VaeBatch(inputs, targets, lengths, names)


def background_iterator(iterator, depth: int = 2):
    """Run ``iterator`` in a daemon worker thread, buffering up to ``depth``
    items: host-side work (wav decode, pad, stack) for batch N+1 proceeds
    while batch N trains. Order is preserved; worker exceptions re-raise at
    the consumer."""
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=max(1, depth))
    sentinel = object()
    error: list[BaseException] = []

    def _worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as exc:  # surfaced on the consumer side
            error.append(exc)
        finally:
            q.put(sentinel)

    threading.Thread(target=_worker, daemon=True, name="decode-prefetch").start()
    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item


def prefetch_to_device(iterator, size: int = 2, decode_ahead: bool = True):
    """Overlapped host→device feeding: decode ahead in a worker thread
    (``decode_ahead``) and keep ``size`` transferred batches in flight on
    device (double buffering). The reference only overlapped the *transfer*
    (`uPIT cells 19-21` prefetch(AUTOTUNE)) — here decode overlaps compute
    too, which is what matters once the corpus outgrows the page cache."""
    import collections

    queue = collections.deque()

    def _put(batch):
        return jax.tree.map(
            lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x, batch
        )

    if decode_ahead:
        iterator = background_iterator(iterator, depth=size)
    for batch in iterator:
        queue.append(_put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
