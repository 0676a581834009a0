"""Separation pipeline semantics: truncation parity, record-based path,
multi-speaker generality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu import data, ops, train
from speech_separation_tpu.models import UPitBlstm
from speech_separation_tpu.separate import (
    make_separate_fn,
    separate_from_records,
    separated_length,
)

RNG = np.random.default_rng(0)


def test_frame_masked_istft_equals_truncated_istft():
    """Zeroing frames ≥ T before OLA == running iSTFT on spec[:T], on the
    first `separated_length(T)` samples — the reference's truncate-then-istft
    semantics (`uPIT_baseline.ipynb cell 41`) under static shapes."""
    size, shift = 256, 128
    x = RNG.standard_normal(6000).astype(np.float32)
    spec = np.asarray(ops.stft(jnp.asarray(x), size, shift))
    t_true = 30
    masked = spec.copy()
    masked[t_true:] = 0.0
    full = np.asarray(ops.istft(jnp.asarray(masked), size, shift))
    trunc = np.asarray(ops.istft(jnp.asarray(spec[:t_true]), size, shift))
    n = separated_length(t_true, size, shift)
    assert trunc.shape[0] == n
    np.testing.assert_allclose(full[:n], trunc, atol=1e-5)


def test_separate_fn_output_lengths(fixture_root):
    model = UPitBlstm(hidden=8, num_layers=1)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 129)))["params"]
    loader = data.WaveformLoader(fixture_root / "tt", batch_size=2)
    batch = next(iter(loader))
    separate = make_separate_fn(model)
    wavs = np.asarray(
        separate(params, jnp.asarray(batch.mix), jnp.asarray(batch.frame_lengths))
    )
    assert wavs.shape[:2] == (2, 2)
    # masked region beyond the true frames reconstructs to (near) silence
    n0 = separated_length(int(batch.frame_lengths[0]), 256, 128)
    tail = wavs[0, :, n0 + 256 :]
    assert np.abs(tail).max() < 1e-5


def test_separate_from_records_matches_waveform_path(reference_root, tmp_path):
    """The record-based (reference-input) path and the waveform path produce
    the same separated audio for the same params."""
    from speech_separation_tpu.data.audio_io import read_wav

    model = UPitBlstm(hidden=8, num_layers=1)
    params = model.init(jax.random.key(1), jnp.zeros((1, 4, 129)))["params"]
    rec_dir = reference_root / "mycode" / "tfrecords" / "tt_tfrecord"
    out_rec = tmp_path / "rec"
    written = separate_from_records(model, params, rec_dir, out_rec)
    assert len(written) == 8

    from speech_separation_tpu.separate import separate_directory

    out_wav = tmp_path / "wav"
    separate_directory(
        model,
        params,
        reference_root / "mycode" / "wsj0_2mix" / "use_this" / "tt",
        out_wav,
        threaded_writes=False,
    )
    for path in sorted(out_rec.glob("*.wav")):
        a, _ = read_wav(path)
        b, _ = read_wav(out_wav / path.name)
        n = min(len(a), len(b))
        # both paths are peak-normalised int16; spectra match to fp32 noise
        np.testing.assert_allclose(a[:n], b[:n], atol=2e-3)


@pytest.mark.slow
def test_three_speaker_end_to_end(tmp_path):
    """Generality beyond the reference: 3-speaker PIT training + separation."""
    n_spk, sr, samples = 3, 8000, 16000
    gen = np.random.default_rng(3)
    sources = gen.standard_normal((2, n_spk, samples)).astype(np.float32) * 0.1
    mix = sources.sum(axis=1)
    frame_lengths = np.full((2,), ops.stft_frame_count(samples, 256, 128), np.int32)

    model = UPitBlstm(hidden=8, num_layers=1, num_speakers=n_spk, dropout_rate=0.1)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 4, 129)))["params"]
    state = train.TrainState.create(
        model.apply, params, train.exponential_decay_adam(), rng
    )
    train_step, eval_step = train.make_upit_waveform_steps(model, num_speakers=n_spk)
    args = (jnp.asarray(mix), jnp.asarray(sources), jnp.asarray(frame_lengths))
    first = float(eval_step(state, *args))
    for _ in range(30):
        state, _ = train_step(state, *args)
    assert float(eval_step(state, *args)) < first

    separate = make_separate_fn(model, num_speakers=n_spk)
    wavs = separate(state.params, args[0], args[2])
    assert wavs.shape[1] == n_spk
