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
