"""End-to-end slice: train on the bundled fixture → separate → score.

The 4-utterance wsj0-2mix fixture bundled with the reference is its de-facto
integration fixture (SURVEY §4); these tests use it the same way, with a
scaled-down model so the suite stays fast on the CPU test mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu import data, train
from speech_separation_tpu.evaluate import eval_sdr, eval_si_sdr
from speech_separation_tpu.models import UPitBlstm
from speech_separation_tpu.separate import separate_directory


SMALL = dict(input_size=129, output_size=129, hidden=32, num_layers=1)


def test_reference_artifacts_scored_by_our_evaluator(reference_root):
    """Pin our evaluator's scores on the reference's committed separated wavs.

    The notebook records SI-SDR −5.2219 / SDR −2.3519 for *its* run
    (`uPIT_baseline.ipynb cell 45`); the committed ``test_wav/`` artifacts
    evidently come from a different (better) run — the SI-SDR formula is
    deterministic and unit-tested, and on the committed files it yields the
    values pinned here.
    """
    wav_dir = reference_root / "mycode" / "wsj0_2mix" / "use_this"
    est_dir = reference_root / "test_wav"
    si = eval_si_sdr(wav_dir, est_dir)
    np.testing.assert_allclose(si, -4.2168, atol=0.01)
    # default = museval-images semantics (the variant the reference's call
    # actually computed); both variants are oracle-corroborated in
    # tests/test_losses_metrics.py::TestBssEvalOracle
    sdr_images = eval_sdr(wav_dir, est_dir)
    np.testing.assert_allclose(sdr_images, 2.7263, atol=0.05)
    sdr_sources = eval_sdr(wav_dir, est_dir, version="sources")
    np.testing.assert_allclose(sdr_sources, -1.7252, atol=0.05)


@pytest.mark.slow
def test_train_step_reduces_loss(fixture_root):
    loader = data.WaveformLoader(fixture_root / "tr", batch_size=2)
    batch = next(iter(loader))
    model = UPitBlstm(**SMALL)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 8, 129)))["params"]
    state = train.TrainState.create(model.apply, params, train.exponential_decay_adam(), rng)
    train_step, eval_step = train.make_upit_waveform_steps(model)

    args = (
        jnp.asarray(batch.mix),
        jnp.asarray(batch.sources),
        jnp.asarray(batch.frame_lengths),
    )
    first = float(eval_step(state, *args))
    for _ in range(12):
        state, loss = train_step(state, *args)
    last = float(eval_step(state, *args))
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.9


@pytest.mark.slow
def test_fit_separate_evaluate(fixture_root, tmp_path):
    model = UPitBlstm(**SMALL)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 8, 129)))["params"]
    state = train.TrainState.create(model.apply, params, train.exponential_decay_adam(), rng)
    train_step, eval_step = train.make_upit_waveform_steps(model)

    def batch_arrays(b):
        return (
            jnp.asarray(b.mix),
            jnp.asarray(b.sources),
            jnp.asarray(b.frame_lengths),
        )

    ckpt = train.CheckpointManager(tmp_path / "ckpt")
    result = train.fit(
        state,
        train_step,
        eval_step,
        data.WaveformLoader(fixture_root / "tr", batch_size=2, shuffle=True),
        data.WaveformLoader(fixture_root / "cv", batch_size=2),
        batch_arrays,
        epochs=3,
        checkpoints=ckpt,
        log_fn=lambda s: None,
    )
    assert result.best_epoch >= 1
    assert len(result.history["loss"]) == 3
    assert np.isfinite(result.best_val_loss)

    # full-state resume round-trip
    restored = ckpt.restore(state)
    assert int(restored.step) > 0
    ckpt.close()

    out_dir = tmp_path / "separated"
    written = separate_directory(model, result.state.params, fixture_root / "tt", out_dir)
    assert len(written) == 8
    si = eval_si_sdr(fixture_root, out_dir)
    assert np.isfinite(si)
    # 3 epochs of a tiny model on 4 utterances: just assert sane range
    assert -30 < si < 30


def test_committed_artifacts_beat_reference(reference_root):
    """Regression pin: the separated wavs committed under artifacts/ (produced
    by scripts/fixture_quality_run.py on TPU) score far above the reference's
    committed artifacts on the same evaluator."""
    import pathlib

    art = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / "fixture_separated"
    if not art.exists():
        pytest.skip("artifacts not present")
    wav_dir = reference_root / "mycode" / "wsj0_2mix" / "use_this"
    si = eval_si_sdr(wav_dir, art)
    assert si > 12.5  # measured 13.16 dB; reference artifacts: −4.22 dB


def test_committed_tasnet_artifacts(reference_root):
    import pathlib

    art = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / "tasnet_separated"
    if not art.exists():
        pytest.skip("artifacts not present")
    si = eval_si_sdr(reference_root / "mycode" / "wsj0_2mix" / "use_this", art)
    assert si > 33.0  # measured 35.41 dB


def test_committed_tasnet_win32_artifacts(reference_root):
    """Pin the win=32 serving-config TasNet run (2.4× the win=16 serving
    throughput; see RESULTS.md): quality stays in the same band."""
    import pathlib

    art = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / "tasnet_win32_separated"
    if not art.exists():
        pytest.skip("artifacts not present")
    si = eval_si_sdr(reference_root / "mycode" / "wsj0_2mix" / "use_this", art)
    assert si > 30.0  # measured 32.65 dB


def test_committed_tokenizer_artifacts(reference_root):
    """Pins the committed tokenizer workflow outputs (produced on TPU by
    scripts/tokenizer_quality_run.py + the prior CLI): the decoded wav came
    from codes ALONE (t3tok has no raw skip) and must score ≥24 dB against
    the original; the prior sample must be speech-like audio, not noise or
    silence."""
    import pathlib

    from speech_separation_tpu.data.audio_io import read_normalized, read_wav
    from speech_separation_tpu.metrics import si_sdr_np

    art = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / "tokenizer"
    if not art.exists():
        pytest.skip("artifacts not present")
    orig = read_normalized(
        reference_root
        / "mycode/wsj0_2mix/use_this/tt/s1/447o0302_0.62948_441c0212_-0.62948.wav",
        8000,
    )
    dec, sr = read_wav(art / "decoded.wav")
    n = min(orig.size, dec.size)
    assert sr == 8000
    assert si_sdr_np(orig[:n], dec[:n]) > 24.0  # measured 25.92

    sample, sr = read_wav(art / "prior_sample.wav")
    assert sr == 8000 and sample.size == 16000
    rms = float(np.sqrt(np.mean(sample**2)))
    assert rms > 0.01  # not silence
    zc_per_s = float(((sample[1:] * sample[:-1]) < 0).sum()) / 2.0
    # speech-like, not white noise: white noise at 8 kHz crosses ~4,000×/s;
    # voiced+fricative speech-band audio sits well below (round-3 diverse
    # sample measured 2,071/s)
    assert 100 < zc_per_s < 3200


def test_si_sdri_on_artifacts(reference_root):
    import pathlib

    from speech_separation_tpu.evaluate import eval_si_sdri

    art = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / "fixture_separated"
    if not art.exists():
        pytest.skip("artifacts not present")
    wav_dir = reference_root / "mycode" / "wsj0_2mix" / "use_this"
    improvement = eval_si_sdri(wav_dir, art)
    assert improvement > 12.5  # measured 13.12 dB SI-SDRi
    # the reference's committed artifacts degrade the mixture
    assert eval_si_sdri(wav_dir, reference_root / "test_wav") < 0
