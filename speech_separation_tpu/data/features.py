"""Offline feature generation → TFRecord files (reference-compatible).

Re-implements the three feature modes of the reference writer
(`uPIT_baseline.ipynb cell 10`, `parallel_stft.py:232-286`) on top of the
framework's own DSP and TFRecord codec — TensorFlow-free:

- ``mixed``  : per utterance one record with ``inputs = concat(|mix|, ∠mix)``
               and phase-sensitive-mask labels
               ``concat(|s1|·cos(∠mix−∠s1), |s2|·cos(∠mix−∠s2))``;
- ``signal`` : one record per source with ``inputs = |s_i|`` and
               ``labels = ∠s_i`` (magnitude/phase pairs for codec work);
- ``raw``    : raw waveform inputs ``[T, 1]`` and stacked source labels
               ``[T, 2]``.

All wavs in a split are zero-padded to the split's max length rounded up to
whole seconds (the reference's ``max_length``), and each record carries the
utterance's true length and name. Note the TPU training path does *not* need
these files — features are computed on device (see ``ops/features.py``); the
writer exists for parity and for interop with the reference's records.
"""

from __future__ import annotations

import concurrent.futures
import math
import pathlib
from dataclasses import dataclass
from typing import Literal, Sequence

import numpy as np

from .audio_io import audioread
from .tfrecord import build_sequence_example, write_tfrecord_file

__all__ = [
    "FeatureConfig",
    "generate_split",
    "generate_librimix",
    "utterance_names",
    "max_length",
]

Mode = Literal["mixed", "signal", "raw"]


@dataclass(frozen=True)
class FeatureConfig:
    sample_rate: int = 8000
    window_size: int = 256
    window_shift: int = 128
    mode: Mode = "mixed"
    mix_dirname: str = "mix"  # LibriMix trees use "mix_clean"


def _stft_np(x: np.ndarray, size: int, shift: int) -> np.ndarray:
    """Host float64 STFT with the framework's exact analysis semantics."""
    from ..ops.windows import analysis_window

    x = np.asarray(x, dtype=np.float64)
    pad = size - shift
    x = np.concatenate([np.zeros(pad), x, np.zeros(pad)])
    frames = math.ceil((len(x) - size + shift) / shift)
    total = frames * shift + size - shift
    x = np.concatenate([x, np.zeros(total - len(x))])
    win = analysis_window(size)
    idx = shift * np.arange(frames)[:, None] + np.arange(size)[None, :]
    return np.fft.rfft(x[idx] * win, axis=-1)


def utterance_names(split_dir: pathlib.Path, mix_dirname: str = "mix") -> list[str]:
    """Wav names in a split (from ``lists/*.lst`` if present, else listdir).

    When the default ``mix`` directory is absent the LibriMix condition
    names are tried (``mix_clean``/``mix_both``/``mix_single``) — generated
    trees carry only the condition dir, and a missing alias used to make
    loaders silently yield zero batches (an empty "epoch" training nothing)."""
    split_dir = pathlib.Path(split_dir)
    lst = split_dir.parent / "lists" / f"{split_dir.name}_wav.lst"
    if lst.exists():
        return [line.strip() for line in lst.read_text().splitlines() if line.strip()]
    candidates = [mix_dirname]
    if mix_dirname == "mix":
        candidates += ["mix_clean", "mix_both", "mix_single"]
    for name in candidates:
        if (split_dir / name).is_dir():
            return sorted(p.name for p in (split_dir / name).glob("*.wav"))
    return []


def resolve_mix_dirname(split_dir: pathlib.Path, mix_dirname: str = "mix") -> str:
    """First existing mixture dir: ``mix``, else the LibriMix condition names.

    Mirrors :func:`utterance_names`'s fallback for every *decode* path —
    name listing alone is not enough: loaders, duration scans and evaluators
    all open ``split/mix/<name>`` and must follow the same resolution on
    generated LibriMix trees that carry only the condition dir (round-4
    review of commit "Loaders fall back to LibriMix condition dirs")."""
    split_dir = pathlib.Path(split_dir)
    candidates = [mix_dirname]
    if mix_dirname == "mix":
        candidates += ["mix_clean", "mix_both", "mix_single"]
    for name in candidates:
        if (split_dir / name).is_dir():
            return name
    return mix_dirname


def max_length(
    split_dir: pathlib.Path,
    names: Sequence[str],
    sample_rate: int,
    mix_dirname: str = "mix",
) -> int:
    """Split max mixture length in samples, rounded up to whole seconds."""
    longest = 0
    for name in names:
        wav = audioread(split_dir / mix_dirname / name, sample_rate)
        longest = max(longest, len(wav))
    return math.ceil(longest / sample_rate) * sample_rate


def _encode_utterance(
    split_dir: pathlib.Path, name: str, cfg: FeatureConfig, max_len: int
) -> list[tuple[str, bytes]]:
    """→ [(record_stem, serialized SequenceExample)] for one utterance."""
    mix = audioread(split_dir / cfg.mix_dirname / name, cfg.sample_rate)
    s1 = audioread(split_dir / "s1" / name, cfg.sample_rate)
    s2 = audioread(split_dir / "s2" / name, cfg.sample_rate)
    stem = pathlib.Path(name).stem

    if cfg.mode == "raw":
        pad = max_len - len(mix)
        inputs = np.pad(mix, (0, pad))[:, None].astype(np.float32)
        labels = np.stack([np.pad(s1, (0, pad)), np.pad(s2, (0, pad))], axis=1).astype(np.float32)
        example = build_sequence_example(
            {
                "inputs": list(inputs),
                "labels": list(labels),
                "length": [np.asarray([float(len(mix))])],
                "name": [stem],
            }
        )
        return [(stem, example)]

    size, shift = cfg.window_size, cfg.window_shift
    true_frames = _stft_np(mix, size, shift).shape[0]
    pad = max_len - len(mix)
    mix_spec = _stft_np(np.pad(mix, (0, pad)), size, shift)
    s1_spec = _stft_np(np.pad(s1, (0, max_len - len(s1))), size, shift)
    s2_spec = _stft_np(np.pad(s2, (0, max_len - len(s2))), size, shift)

    mix_abs, mix_ang = np.abs(mix_spec), np.angle(mix_spec)

    if cfg.mode == "mixed":
        inputs = np.concatenate([mix_abs, mix_ang], axis=1).astype(np.float32)
        psm1 = np.abs(s1_spec) * np.cos(mix_ang - np.angle(s1_spec))
        psm2 = np.abs(s2_spec) * np.cos(mix_ang - np.angle(s2_spec))
        labels = np.concatenate([psm1, psm2], axis=1).astype(np.float32)
        example = build_sequence_example(
            {
                "inputs": list(inputs),
                "labels": list(labels),
                "length": [np.asarray([float(true_frames)])],
                "name": [stem],
            }
        )
        return [(stem, example)]

    # mode == "signal": one record per source — inputs |s|, labels ∠s, length
    # = the unpadded source's frame count (reference `uPIT cell 10` signal branch)
    out = []
    for tag, spec, wav in (("s1", s1_spec, s1), ("s2", s2_spec, s2)):
        src_frames = _stft_np(wav, size, shift).shape[0]
        example = build_sequence_example(
            {
                "inputs": list(np.abs(spec).astype(np.float32)),
                "labels": list(np.angle(spec).astype(np.float32)),
                "length": [np.asarray([float(src_frames)])],
                "name": [f"{stem}_{tag}"],
            }
        )
        out.append((f"{stem}_{tag}", example))
    return out


def generate_split(
    split_dir: str | pathlib.Path,
    out_dir: str | pathlib.Path,
    cfg: FeatureConfig = FeatureConfig(),
    max_workers: int = 8,
    max_len: int | None = None,
    progress_every: int = 0,
) -> list[pathlib.Path]:
    """Write one TFRecord per utterance (per source in ``signal`` mode).

    ``progress_every=N`` prints a progress line every N utterances (the
    reference's ``_single`` converter used tqdm — `parallel_stft_single.py`).
    """
    split_dir = pathlib.Path(split_dir)
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    names = utterance_names(split_dir, cfg.mix_dirname)
    if max_len is None:
        max_len = max_length(split_dir, names, cfg.sample_rate, cfg.mix_dirname)

    written: list[pathlib.Path] = []
    with concurrent.futures.ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = [
            pool.submit(_encode_utterance, split_dir, name, cfg, max_len) for name in names
        ]
        for i, future in enumerate(futures, 1):
            for stem, example in future.result():
                path = out_dir / f"{stem}.tfrecords"
                write_tfrecord_file(path, [example])
                written.append(path)
            if progress_every and (i % progress_every == 0 or i == len(futures)):
                print(f"{split_dir}: {i}/{len(futures)} utterances", flush=True)
    return written


def generate_librimix(
    root: str | pathlib.Path,
    out_root: str | pathlib.Path | None = None,
    bands: Sequence[str] = ("wav8k",),
    conditions: Sequence[str] = ("max", "min"),
    splits: Sequence[str] = ("dev",),
    cfg: FeatureConfig = FeatureConfig(mix_dirname="mix_clean"),
    max_workers: int = 8,
    max_lens: dict[str, int] | None = None,
    progress_every: int = 0,
) -> dict[str, int]:
    """Bulk conversion of a Libri2Mix directory tree.

    Walks ``{root}/{band}/{condition}/{split}/`` (the layout the reference's
    converters sweep: `parallel_stft.py:288-320`,
    `parallel_stft_single.py:219-415`) and writes
    ``{split}_tfrecord`` directories next to each split. Splits are converted
    concurrently (one worker per split, each with its own encode pool).
    ``max_lens`` optionally pins per-condition pad lengths in samples (the
    ``_single`` variant hardcodes these for known trees); otherwise each split
    is pre-scanned.

    Returns ``{split_path: record_count}``.
    """
    root = pathlib.Path(root)
    out_root = pathlib.Path(out_root) if out_root is not None else root
    jobs = []
    for band in bands:
        for condition in conditions:
            for split in splits:
                split_dir = root / band / condition / split
                if not split_dir.exists():
                    continue
                out_dir = out_root / band / condition / split / f"{split}_tfrecord"
                max_len = (max_lens or {}).get(condition)
                jobs.append((split_dir, out_dir, max_len))

    results: dict[str, int] = {}
    with concurrent.futures.ThreadPoolExecutor(max_workers=max(1, len(jobs))) as pool:
        futures = {
            pool.submit(
                generate_split, split_dir, out_dir, cfg, max_workers, max_len,
                progress_every,
            ): split_dir
            for split_dir, out_dir, max_len in jobs
        }
        for future, split_dir in futures.items():
            results[str(split_dir)] = len(future.result())
    return results
