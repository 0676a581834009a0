"""Data path at scale: LibriMix-tree sweep, background decode overlap.

CI-sized versions of the at-scale proof in ``scripts/data_scale_run.py``
(the full 2,000-utterance measurement lives in RESULTS.md).
"""

import time

import numpy as np
import pytest

from speech_separation_tpu.data import (
    FeatureConfig,
    WaveformLoader,
    background_iterator,
    generate_librimix,
    make_synthetic_librimix,
    prefetch_to_device,
)


def test_generate_librimix_full_sweep(tmp_path):
    """The full band × condition × split sweep the reference's converters
    cover (`parallel_stft_single.py:219-415`), on a synthetic tree."""
    root = make_synthetic_librimix(
        tmp_path / "corpus",
        utterances={"dev": 2, "test": 2, "train-100": 3, "train-360": 5},
        min_seconds=1.0,
        max_seconds=2.0,
    )
    for band, sr in (("wav8k", 8000), ("wav16k", 16000)):
        results = generate_librimix(
            root,
            bands=(band,),
            conditions=("max", "min"),
            splits=("dev", "test", "train-100", "train-360"),
            cfg=FeatureConfig(sample_rate=sr, mix_dirname="mix_clean"),
            max_workers=4,
        )
        assert len(results) == 8  # 2 conditions × 4 splits
        for split_dir, count in results.items():
            expect = {"dev": 2, "test": 2, "train-100": 3, "train-360": 5}[
                split_dir.rsplit("/", 1)[-1]
            ]
            assert count == expect, split_dir
    # record dirs exist next to each split
    assert (root / "wav8k" / "min" / "train-360" / "train-360_tfrecord").is_dir()
    assert (
        len(list((root / "wav16k" / "max" / "dev" / "dev_tfrecord").glob("*.tfrecords")))
        == 2
    )


def test_min_condition_truncates_max_pads(tmp_path):
    root = make_synthetic_librimix(
        tmp_path / "c2",
        utterances={"dev": 1},
        bands=("wav8k",),
        min_seconds=1.0,
        max_seconds=3.0,
        seed=7,
    )
    from speech_separation_tpu.data.audio_io import read_wav

    name = next((root / "wav8k" / "min" / "dev" / "s1").glob("*.wav")).name
    s1_min, _ = read_wav(root / "wav8k" / "min" / "dev" / "s1" / name)
    s1_max, _ = read_wav(root / "wav8k" / "max" / "dev" / "s1" / name)
    s2_max, _ = read_wav(root / "wav8k" / "max" / "dev" / "s2" / name)
    assert len(s1_max) == len(s2_max) >= len(s1_min)
    # mixtures are true sums in both conditions
    mix, _ = read_wav(root / "wav8k" / "max" / "dev" / "mix_clean" / name)
    np.testing.assert_allclose(mix, s1_max + s2_max, atol=2.5 / 32768)


class TestBackgroundIterator:
    def test_order_and_completeness(self):
        items = list(range(57))
        assert list(background_iterator(iter(items), depth=4)) == items

    def test_exception_propagates(self):
        def gen():
            yield 1
            raise RuntimeError("decode failed")

        it = background_iterator(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="decode failed"):
            list(it)

    def test_decode_overlaps_consumption(self):
        """With decode-ahead, a slow producer and slow consumer overlap: the
        wall time is ~max(p, c) per item, not p + c."""
        n, delay = 8, 0.03

        def slow_producer():
            for i in range(n):
                time.sleep(delay)
                yield i

        t0 = time.perf_counter()
        for _ in background_iterator(slow_producer(), depth=2):
            time.sleep(delay)  # consumer work
        overlapped = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in slow_producer():
            time.sleep(delay)
        serial = time.perf_counter() - t0
        # generous threshold: overlap saves ≥25% on a fully balanced pipeline
        assert overlapped < serial * 0.85, (overlapped, serial)


def test_prefetch_to_device_with_decode_ahead(tmp_path):
    from speech_separation_tpu.data import make_synthetic_fixture

    root = make_synthetic_fixture(tmp_path / "fx", utterances_per_split=3)
    loader = WaveformLoader(root / "tr", batch_size=2)
    direct = [b.names for b in loader]
    prefetched = [b.names for b in prefetch_to_device(iter(loader), 2)]
    assert prefetched == direct


def test_fixture_dict_splits(tmp_path):
    """utterances_per_split accepts per-split counts (corpus-shaped trees)."""
    from speech_separation_tpu.data import make_synthetic_fixture

    root = make_synthetic_fixture(
        tmp_path / "fx",
        utterances_per_split={"tr": 4, "cv": 2, "tt": 1},
        num_speakers=3,
        profile="hard",
        min_seconds=1.0,
        max_seconds=1.5,
    )
    for split, n in {"tr": 4, "cv": 2, "tt": 1}.items():
        assert len(list((root / split / "mix").glob("*.wav"))) == n
        assert {p.name for p in (root / split).iterdir()} == {"mix", "s1", "s2", "s3"}


def test_prepare_data_librimix_cli(tmp_path, capsys):
    from speech_separation_tpu import cli

    root = make_synthetic_librimix(
        tmp_path / "c3",
        utterances={"dev": 2},
        bands=("wav8k",),
        min_seconds=1.0,
        max_seconds=1.5,
    )
    cli.main([
        "prepare-data", "--librimix", "--data-root", str(root),
        "--bands", "wav8k", "--librimix-splits", "dev",
    ])
    out = capsys.readouterr().out
    assert out.count("wrote 2 records") == 2  # max + min conditions
    assert (root / "wav8k" / "min" / "dev" / "dev_tfrecord").is_dir()


def test_hard_profile_corpus(tmp_path):
    """The "hard" corpus regime (VERDICT r2 #1): overlapping pitch bands,
    per-source gain offsets encoded in the filename (the wsj0-2mix
    convention), silence gaps / AM noise, mix == sum of gained sources,
    and cross-process determinism."""
    import re

    from speech_separation_tpu.data.audio_io import read_wav

    root = make_synthetic_librimix(
        tmp_path / "hard", utterances={"dev": 4}, bands=("wav8k",),
        conditions=("min",), profile="hard", min_seconds=1.5, max_seconds=2.5,
    )
    split = root / "wav8k" / "min" / "dev"
    names = sorted(p.name for p in (split / "mix_clean").glob("*.wav"))
    assert len(names) == 4
    for name in names:
        # filename carries the symmetric +g/-g offsets
        m = re.match(r"dev_\d{5}_(-?\d+\.\d{5})_(-?\d+\.\d{5})\.wav", name)
        assert m, name
        g1, g2 = float(m.group(1)), float(m.group(2))
        assert abs(g1 + g2) < 1e-4 and 0.0 <= g1 <= 2.5
        mix, _ = read_wav(split / "mix_clean" / name)
        s1, _ = read_wav(split / "s1" / name)
        s2, _ = read_wav(split / "s2" / name)
        assert np.abs(mix - (s1 + s2)).max() < 1e-3

    # regeneration is deterministic (per-utterance seeded RNG, no PYTHONHASHSEED)
    root2 = make_synthetic_librimix(
        tmp_path / "hard2", utterances={"dev": 4}, bands=("wav8k",),
        conditions=("min",), profile="hard", min_seconds=1.5, max_seconds=2.5,
    )
    m1, _ = read_wav(split / "mix_clean" / names[0])
    m2, _ = read_wav(root2 / "wav8k" / "min" / "dev" / "mix_clean" / names[0])
    assert np.array_equal(m1, m2)


def test_three_speaker_fixture_and_evaluate(tmp_path):
    """n-speaker beyond-parity loop: a 3-speaker fixture evaluates with the
    n-ary permutation machinery — perfect estimates score high even when
    written in scrambled channel order."""
    from speech_separation_tpu.data.audio_io import audiowrite, read_wav
    from speech_separation_tpu.data.fixture import make_synthetic_fixture
    from speech_separation_tpu.evaluate import eval_si_sdr, eval_si_sdri

    root = make_synthetic_fixture(
        tmp_path / "fx3", utterances_per_split=2, num_speakers=3,
        profile="hard", min_seconds=1.0, max_seconds=1.5,
    )
    est_dir = tmp_path / "est3"
    est_dir.mkdir()
    # estimates = true sources, cyclically scrambled per utterance
    for i, p in enumerate(sorted((root / "tt" / "mix").glob("*.wav"))):
        srcs = [read_wav(root / "tt" / f"s{k + 1}" / p.name)[0] for k in range(3)]
        for k in range(3):
            audiowrite(srcs[(k + i) % 3], est_dir / f"{p.stem}_s{k + 1}.wav", 8000)
    si = eval_si_sdr(root, est_dir)
    assert si > 35.0, si  # int16 roundtrip bounds perfection
    sii = eval_si_sdri(root, est_dir)
    assert sii > si - 10.0  # mixture baseline is near/below 0 dB
