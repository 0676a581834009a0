"""Synthetic mini-fixture generation (wsj0-2mix directory layout).

The reference bundles a 4-utterance wsj0-2mix subset as its de-facto test
fixture (SURVEY C28). This module *generates* an equivalent fixture — same
directory layout (``{tr,cv,tt}/{mix,s1,s2}/*.wav`` plus ``lists/*.lst``),
synthetic speech-like sources (sums of drifting harmonics with noise), true
``mix = s1 + s2`` — so the framework's integration tests and demos run with
no external data and no copied reference assets.
"""

from __future__ import annotations

import pathlib

import numpy as np

from .audio_io import audiowrite

__all__ = ["make_synthetic_fixture", "make_synthetic_librimix"]


def _voice_like(rng: np.random.Generator, samples: int, f0: float, sr: int) -> np.ndarray:
    """A crude voiced signal: drifting f0 with harmonics, amplitude envelope."""
    t = np.arange(samples) / sr
    drift = 1.0 + 0.05 * np.sin(2 * np.pi * rng.uniform(0.5, 2.0) * t)
    phase = 2 * np.pi * f0 * np.cumsum(drift) / sr
    sig = np.zeros(samples)
    for h, a in enumerate([1.0, 0.5, 0.3, 0.2], start=1):
        sig += a * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    envelope = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * rng.uniform(1.0, 3.0) * t))
    sig = sig * envelope + 0.02 * rng.standard_normal(samples)
    return (0.3 * sig / np.abs(sig).max()).astype(np.float32)


def make_synthetic_fixture(
    root: str | pathlib.Path,
    utterances_per_split: int = 4,
    sample_rate: int = 8000,
    min_seconds: float = 2.0,
    max_seconds: float = 5.0,
    seed: int = 0,
) -> pathlib.Path:
    """Create the fixture tree under ``root``; returns ``root``."""
    root = pathlib.Path(root)
    rng = np.random.default_rng(seed)
    (root / "lists").mkdir(parents=True, exist_ok=True)
    for split in ("tr", "cv", "tt"):
        names = []
        for sub in ("mix", "s1", "s2"):
            (root / split / sub).mkdir(parents=True, exist_ok=True)
        for i in range(utterances_per_split):
            seconds = rng.uniform(min_seconds, max_seconds)
            samples = int(seconds * sample_rate)
            s1 = _voice_like(rng, samples, rng.uniform(90, 150), sample_rate)
            s2 = _voice_like(rng, samples, rng.uniform(180, 260), sample_rate)
            mix = s1 + s2
            name = f"synth_{split}_{i:02d}.wav"
            names.append(name)
            audiowrite(s1, root / split / "s1" / name, sample_rate)
            audiowrite(s2, root / split / "s2" / name, sample_rate)
            audiowrite(mix, root / split / "mix" / name, sample_rate)
        (root / "lists" / f"{split}_wav.lst").write_text("\n".join(names) + "\n")
    return root


def make_synthetic_librimix(
    root: str | pathlib.Path,
    utterances: dict[str, int] | None = None,
    bands: tuple[str, ...] = ("wav8k", "wav16k"),
    conditions: tuple[str, ...] = ("max", "min"),
    min_seconds: float = 2.0,
    max_seconds: float = 6.0,
    seed: int = 0,
) -> pathlib.Path:
    """Create a Libri2Mix-shaped corpus tree with synthetic audio.

    Layout: ``{root}/{band}/{condition}/{split}/{mix_clean,s1,s2}/*.wav`` —
    the tree the reference's bulk converters sweep
    (`parallel_stft_single.py:219-415`). ``utterances`` maps split name →
    count (default: the LibriMix split names at a scaled-down size). In the
    ``min`` condition sources are truncated to the shorter one (LibriMix
    semantics); in ``max`` the shorter is zero-padded.
    """
    root = pathlib.Path(root)
    if utterances is None:
        utterances = {"dev": 8, "test": 8, "train-100": 16, "train-360": 32}
    rng = np.random.default_rng(seed)
    for split, count in utterances.items():
        for i in range(count):
            sec1 = rng.uniform(min_seconds, max_seconds)
            sec2 = rng.uniform(min_seconds, max_seconds)
            name = f"{split.replace('-', '')}_{i:05d}.wav"
            base = {}
            for band in bands:
                sr = 8000 if band == "wav8k" else 16000
                n1, n2 = int(sec1 * sr), int(sec2 * sr)
                s1 = _voice_like(np.random.default_rng(seed + i), n1, 90 + (i % 60), sr)
                s2 = _voice_like(np.random.default_rng(seed + i + 1), n2, 180 + (i % 80), sr)
                base[band] = (s1, s2, sr)
            for band in bands:
                s1, s2, sr = base[band]
                for condition in conditions:
                    if condition == "min":
                        n = min(len(s1), len(s2))
                        a, b = s1[:n], s2[:n]
                    else:
                        n = max(len(s1), len(s2))
                        a = np.pad(s1, (0, n - len(s1)))
                        b = np.pad(s2, (0, n - len(s2)))
                    split_dir = root / band / condition / split
                    for sub in ("mix_clean", "s1", "s2"):
                        (split_dir / sub).mkdir(parents=True, exist_ok=True)
                    audiowrite(a, split_dir / "s1" / name, sr)
                    audiowrite(b, split_dir / "s2" / name, sr)
                    audiowrite(a + b, split_dir / "mix_clean" / name, sr)
    return root
