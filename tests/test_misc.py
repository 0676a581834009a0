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


def test_fit_raises_on_empty_train_loader():
    """A misconfigured split dir must not silently log a nan 'epoch' and
    checkpoint an untrained model as best (failure-detection, SURVEY §5)."""
    from speech_separation_tpu import train

    state = train.TrainState.create(
        lambda v, x: x, {"w": jnp.zeros((1,))}, train.adam(1e-3), jax.random.key(0)
    )
    step = lambda s, x: (s, jnp.asarray(0.5))
    with pytest.raises(ValueError, match="no batches"):
        train.fit(state, step, lambda s, x: jnp.asarray(0.5), [], [],
                  lambda b: (jnp.asarray(b),), epochs=1)


def test_utterance_names_librimix_condition_fallback(tmp_path):
    """Generated LibriMix trees carry only condition dirs (mix_clean); the
    default 'mix' lookup falls back to them instead of yielding zero names."""
    from speech_separation_tpu.data.features import utterance_names

    split = tmp_path / "train-100"
    (split / "mix_clean").mkdir(parents=True)
    (split / "s1").mkdir()
    for n in ("b.wav", "a.wav"):
        (split / "mix_clean" / n).write_bytes(b"")
    assert utterance_names(split) == ["a.wav", "b.wav"]
    # explicit alias still wins when present
    (split / "mix").mkdir()
    (split / "mix" / "c.wav").write_bytes(b"")
    assert utterance_names(split) == ["c.wav"]
    # explicit non-default dirname does NOT fall back
    assert utterance_names(split, mix_dirname="mix_both") == []


def test_loader_and_evaluate_follow_condition_dir_fallback(tmp_path):
    """Name listing was not enough (round-4 review): the DECODE paths —
    WaveformLoader batches, sort_by_length duration scan, evaluate's
    mixture reads — must all resolve mix_clean on alias-less trees."""
    import numpy as np

    from speech_separation_tpu.data.audio_io import audiowrite
    from speech_separation_tpu.data.datasets import WaveformLoader
    from speech_separation_tpu.evaluate import eval_si_sdri

    sr, n = 8000, 4000
    split = tmp_path / "tt"
    for d in ("mix_clean", "s1", "s2"):
        (split / d).mkdir(parents=True)
    rng = np.random.default_rng(0)
    est_dir = tmp_path / "est"
    est_dir.mkdir()
    for name in ("a.wav", "b.wav"):
        s1 = rng.standard_normal(n).astype(np.float32) * 0.1
        s2 = rng.standard_normal(n).astype(np.float32) * 0.1
        audiowrite(s1, split / "s1" / name, sr)
        audiowrite(s2, split / "s2" / name, sr)
        audiowrite(s1 + s2, split / "mix_clean" / name, sr)
        stem = name[:-4]
        audiowrite(s1, est_dir / f"{stem}_s1.wav", sr)
        audiowrite(s2, est_dir / f"{stem}_s2.wav", sr)

    loader = WaveformLoader(split, batch_size=2, sort_by_length=True)
    batches = list(loader)
    assert len(batches) == 1 and batches[0].mix.shape[0] == 2
    np.testing.assert_allclose(
        batches[0].mix, batches[0].sources.sum(axis=1), atol=1e-4
    )
    # evaluate reads the mixture through the same fallback
    assert eval_si_sdri(tmp_path, est_dir, split="tt") > 10.0


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


def test_clip_state_structure_independent_of_clip_value():
    """advisor r3: resuming a checkpoint with a different CLIP value must
    restore cleanly — opt_state structure is clip-independent."""
    import jax.numpy as jnp

    import jax
    from speech_separation_tpu import train

    params = {"w": jnp.ones((4,))}
    assert jax.tree_util.tree_structure(
        train.adam(1e-3, grad_clip_norm=5.0).init(params)
    ) == jax.tree_util.tree_structure(train.adam(1e-3, grad_clip_norm=0.0).init(params))


def test_restore_params_survives_opt_state_structure_drift(tmp_path):
    """Serving restores only params: a checkpoint saved under one optimizer
    structure (e.g. pre-round-3 unchained adam) must load into a state built
    with a different one (round-3 chained clip wrapper)."""
    import optax

    from speech_separation_tpu import train

    apply = lambda v, x: x
    params = {"w": jnp.full((4,), 7.0)}
    # legacy writer: bare adam, NO chain wrapper
    legacy = train.TrainState.create(apply, params, optax.adam(1e-3), jax.random.key(0))
    ckpt = train.CheckpointManager(tmp_path / "ck")
    ckpt.save_if_best(1, legacy, val_loss=1.0)
    ckpt.close()

    # current reader: chained optimizer → different opt_state pytree
    fresh = train.TrainState.create(
        apply, {"w": jnp.zeros((4,))}, train.adam(1e-3, grad_clip_norm=5.0),
        jax.random.key(1),
    )
    ckpt2 = train.CheckpointManager(tmp_path / "ck")
    with pytest.raises(ValueError):
        ckpt2.restore(fresh)  # full-state template restore rightly rejects
    restored = ckpt2.restore_params(fresh)
    ckpt2.close()
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), 7.0)


def test_cosine_adam_schedule_shape():
    """warmup ramps from 0 to peak; decay ends at end_scale × peak."""
    import numpy as np

    import jax.numpy as jnp

    from speech_separation_tpu import train

    tx = train.cosine_adam(1e-2, total_steps=100, warmup_steps=10, end_scale=0.1)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    # drive constant unit grads; |update| tracks the lr schedule under adam
    mags = []
    for _ in range(120):
        upd, state = tx.update({"w": jnp.ones((4,))}, state, params)
        mags.append(float(jnp.abs(upd["w"]).max()))
    assert mags[0] < mags[9] <= 1.05 * 1e-2  # warmup ramps up
    assert abs(mags[9] - 1e-2) < 2e-3  # near peak after warmup
    assert abs(mags[-1] - 1e-3) < 3e-4  # cosine tail ≈ end_scale × peak


def test_sched_epochs_pins_cosine_horizon():
    """`sched_epochs` decouples the cosine horizon from the per-invocation
    epoch count so chunked RESUME=1 queues (scripts/r4_chip_queue.sh) keep
    decaying across chunks instead of sitting at the end_value floor."""
    from speech_separation_tpu.utils.config import UPitTrainConfig

    cfg = UPitTrainConfig(lr_schedule="cosine", epochs=20, sched_epochs=80)
    assert (cfg.sched_epochs or cfg.epochs) == 80
    # default (0) falls back to the invocation's epoch count
    cfg = UPitTrainConfig(lr_schedule="cosine", epochs=20)
    assert (cfg.sched_epochs or cfg.epochs) == 20


def test_fit_resume_advances_loader_epoch(tmp_path):
    """After a resume, fit must continue the shuffle stream, not replay
    epoch 0 (advisor r3 on ResidentPackedCorpus._epoch)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from speech_separation_tpu import train

    class Loader:
        def __init__(self):
            self._epoch = 0
            self.seen = []

        def set_epoch(self, e):
            self._epoch = int(e)

        def __iter__(self):
            self.seen.append(self._epoch)
            self._epoch += 1
            yield np.zeros((1,), np.float32)

    model_apply = lambda v, x: x
    params = {"w": jnp.zeros((1,))}
    state = train.TrainState.create(model_apply, params, train.adam(1e-3), jax.random.key(0))
    step = lambda s, x: (s, jnp.asarray(0.5))
    eval_step = lambda s, x: jnp.asarray(0.5)
    arrays = lambda b: (jnp.asarray(b),)

    ckpt = train.CheckpointManager(tmp_path / "ck")
    tr = Loader()
    train.fit(state, step, eval_step, tr, Loader(), arrays, epochs=3, checkpoints=ckpt)
    assert tr.seen == [0, 1, 2]
    # resume: restored checkpoint is epoch 1 (first best); loader continues
    tr2 = Loader()
    train.fit(state, step, eval_step, tr2, Loader(), arrays, epochs=2,
              checkpoints=ckpt, resume=True)
    ckpt.close()
    assert tr2.seen[0] >= 1  # NOT a replay of epoch 0
    assert tr2.seen == sorted(tr2.seen)


def test_fit_resumed_chunk_saves_at_cumulative_steps(tmp_path):
    """A resumed chunk must checkpoint at epoch_offset + epoch: orbax
    silently SKIPS a save at an already-existing step, so run-local epoch
    numbering loses the resumed chunk's improved model (round-4 review)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from speech_separation_tpu import train

    class Loader:
        def set_epoch(self, e):
            pass

        def __iter__(self):
            yield np.zeros((1,), np.float32)

    model_apply = lambda v, x: x
    params = {"w": jnp.zeros((1,))}
    state = train.TrainState.create(model_apply, params, train.adam(1e-3), jax.random.key(0))
    step = lambda s, x: (s, jnp.asarray(0.5))
    arrays = lambda b: (jnp.asarray(b),)

    # chunk 1: two epochs, val 1.0 then 0.9 → saves at steps 1, 2
    vals1 = iter([1.0, 0.9])
    ckpt = train.CheckpointManager(tmp_path / "ck")
    train.fit(state, step, lambda s, x: jnp.asarray(next(vals1)), Loader(),
              Loader(), arrays, epochs=2, checkpoints=ckpt)
    assert ckpt.latest_step == 2
    # chunk 2 (resumed): val 0.1 at its local epoch 1 — without cumulative
    # numbering this would collide with step 1 and be silently dropped
    vals2 = iter([0.1])
    train.fit(state, step, lambda s, x: jnp.asarray(next(vals2)), Loader(),
              Loader(), arrays, epochs=1, checkpoints=ckpt, resume=True)
    assert ckpt.latest_step == 3  # cumulative, chronological
    assert ckpt.best_step == 3  # the whole-run best model survived
    ckpt.close()


def test_train_step_mfu_matches_bench_convention():
    """The shared helper (utils/profiling.py) must agree with bench.py's
    analytic model: 6·P·frames·items / dt, MFU against the v5e bf16 peak."""
    from speech_separation_tpu.utils import train_step_mfu

    out = train_step_mfu(n_params=10**7, items_per_step=32, frames_per_item=500, step_seconds=0.05)
    # 6e7 × 500 × 32 / 0.05 = 19.2 TFLOP/s
    assert out["tflops"] == 19.2
    assert out["mfu_pct"] == round(100 * 19.2 / 197.0, 1)


def test_bench_emit_includes_mfu_fields():
    import contextlib
    import io
    import json

    import bench

    saved_emitted, saved_info = bench._EMITTED, dict(bench._FLOP_INFO)
    bench._EMITTED = None
    bench._FLOP_INFO.clear()
    bench._FLOP_INFO["tasnet_train_bf16_audio_s_per_s"] = {
        "flops_per_step": 1e12, "step_audio_s": 64,
    }
    try:
        samples = {k: [] for k in bench.FLOORS}
        samples["tasnet_train_bf16_audio_s_per_s"] = [2000.0]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench._emit(samples, None, None)
    finally:
        bench._EMITTED = saved_emitted
        bench._FLOP_INFO.clear()
        bench._FLOP_INFO.update(saved_info)
    parsed = json.loads(buf.getvalue().strip())
    # 1e12 flops/step × (2000/64 steps/s) = 31.25 TFLOP/s
    assert parsed["extra"]["tasnet_train_bf16_audio_s_per_s_tflops"] == 31.2
    assert parsed["extra"]["tasnet_train_bf16_audio_s_per_s_mfu_pct"] == 15.9  # 31.25/197


def test_fit_params_only_resume_fast_forwards_schedule(tmp_path):
    """When full-state restore fails on opt-state structure drift, fit must
    fast-forward state.step AND optax's schedule count — a warmup+cosine LR
    must not replay warmup for the resumed chunk (round-4 advisor)."""
    import optax
    import optax.tree_utils as otu

    from speech_separation_tpu import train

    apply = lambda v, x: x
    params = {"w": jnp.full((4,), 7.0)}
    # legacy writer: bare adam (different opt_state pytree than the reader)
    legacy = train.TrainState.create(apply, params, optax.adam(1e-3), jax.random.key(0))
    ckpt = train.CheckpointManager(tmp_path / "ck")
    ckpt.save_if_best(3, legacy, val_loss=1.0)  # checkpoint step = epoch 3
    ckpt.close()

    fresh = train.TrainState.create(
        apply, {"w": jnp.zeros((4,))},
        train.cosine_adam(1e-3, total_steps=100, warmup_steps=10,
                          grad_clip_norm=5.0),
        jax.random.key(1),
    )

    seen = {}

    def train_step(state, x):
        seen.setdefault("first_step", int(np.asarray(state.step)))
        return state.apply_gradients({"w": jnp.ones((4,))}), jnp.float32(0.5)

    def eval_step(state, x):
        return jnp.float32(0.5)

    loader = [np.zeros((1,), np.float32)] * 5  # len() == 5 steps/epoch
    ckpt2 = train.CheckpointManager(tmp_path / "ck")
    res = train.fit(
        fresh, train_step, eval_step, loader, loader, lambda b: (jnp.asarray(b),),
        epochs=1, checkpoints=ckpt2, resume=True, log_fn=lambda s: None,
    )
    ckpt2.close()
    # params restored, step fast-forwarded to epoch 3 × 5 steps
    np.testing.assert_array_equal(np.asarray(res.state.params["w"]) != 0.0, True)
    assert seen["first_step"] == 15
    # the optax schedule count advanced too (not just TrainState.step):
    # 15 fast-forwarded + 5 live steps, in EVERY count-bearing sub-state
    counts = [int(np.asarray(v))
              for _, v in otu.tree_get_all_with_path(res.state.opt_state, "count")]
    assert counts and all(c == 20 for c in counts)
