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

__all__ = ["make_synthetic_fixture"]


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
