"""At-scale data-path proof (VERDICT round-1 item 4).

1. Generates a ~2,000-utterance Libri2Mix-shaped synthetic corpus
   (``wav8k|wav16k × max|min × dev/test/train-100/train-360`` — the tree the
   reference's converters sweep, `parallel_stft_single.py:219-415`).
2. Runs the full ``generate_librimix`` conversion sweep with timing.
3. Runs one uPIT BLSTM training epoch over the 1,700-utterance
   ``wav8k/min/train-360`` split, measuring loader-only throughput vs
   device step consumption, with and without background decode.

Usage: python scripts/data_scale_run.py [WORK_DIR] [skip-convert]
Writes WORK_DIR/data_scale_summary.json and prints it. ``skip-convert``
reuses a previous run's conversion timing (records already on disk).
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from speech_separation_tpu import data, train
from speech_separation_tpu.data import FeatureConfig, generate_librimix, make_synthetic_librimix
from speech_separation_tpu.models import UPitBlstm

WORK = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else pathlib.Path("/tmp/data_scale")
UTTERANCES = {"dev": 50, "test": 50, "train-100": 200, "train-360": 1700}
BATCH = 8


def main():
    summary = {"utterances_per_split": UTTERANCES}
    corpus = WORK / "corpus"

    t0 = time.time()
    if not corpus.exists():
        make_synthetic_librimix(corpus, utterances=UTTERANCES, min_seconds=2.0, max_seconds=6.0)
        summary["corpus_gen_s"] = round(time.time() - t0, 1)
    print(json.dumps({"stage": "corpus", "wall_s": round(time.time() - t0, 1)}), flush=True)

    # full conversion sweep, per band (matching that band's sample rate)
    prev_path = WORK / "data_scale_summary.json"
    if "skip-convert" in sys.argv and prev_path.exists():
        summary["convert"] = json.loads(prev_path.read_text())["convert"]
        print(json.dumps({"stage": "convert (cached)", **summary["convert"]}), flush=True)
        counts = None
    t0 = time.time()
    counts = {} if "skip-convert" not in sys.argv or not prev_path.exists() else None
    for band, sr in (("wav8k", 8000), ("wav16k", 16000)) if counts is not None else ():
        results = generate_librimix(
            corpus,
            bands=(band,),
            conditions=("max", "min"),
            splits=("dev", "test", "train-100", "train-360"),
            cfg=FeatureConfig(sample_rate=sr, mix_dirname="mix_clean"),
            max_workers=8,
            progress_every=500,
        )
        counts.update({k: v for k, v in results.items()})
    if counts is not None:
        convert_s = time.time() - t0
        total_records = sum(counts.values())
        summary["convert"] = {
            "records": total_records,
            "wall_s": round(convert_s, 1),
            "records_per_s": round(total_records / convert_s, 1),
        }
        print(json.dumps({"stage": "convert", **summary["convert"]}), flush=True)

    # training-epoch measurement on the big split
    split = corpus / "wav8k" / "min" / "train-360"
    make_loader = lambda: data.WaveformLoader(
        split,
        batch_size=BATCH,
        sort_by_length=True,
        shuffle=True,
        seed=0,
        drop_remainder=True,
    )
    # patch: WaveformLoader expects mix/ dir name "mix"; LibriMix uses mix_clean
    # → create a simple alias via names on a LibriMix-shaped split
    import os

    mix_alias = split / "mix"
    if not mix_alias.exists():
        os.symlink("mix_clean", mix_alias)

    loader = make_loader()
    n_utts = len(loader.names)

    # (a) loader-only pass (decode + pad throughput)
    t0 = time.time()
    audio_seconds = 0.0
    n_batches = 0
    for batch in loader:
        audio_seconds += float(batch.sample_lengths.sum()) / 8000.0
        n_batches += 1
    loader_s = time.time() - t0
    summary["loader_only"] = {
        "utterances": n_utts,
        "batches": n_batches,
        "wall_s": round(loader_s, 1),
        "audio_s_per_s": round(audio_seconds / loader_s, 1),
    }
    print(json.dumps({"stage": "loader_only", **summary["loader_only"]}), flush=True)

    # (b) step-only: repeat one mid-sized device batch
    model = UPitBlstm()
    rng = jax.random.key(0)
    # host copy: train_step donates state buffers, so later stages must
    # rebuild from a buffer donation can't delete
    params = jax.device_get(model.init(rng, jnp.zeros((1, 8, 129)))["params"])
    # fresh key per state: train_step donates the whole state incl. the rng
    state = train.TrainState.create(
        model.apply, params, train.exponential_decay_adam(), jax.random.key(1)
    )
    train_step, _ = train.make_upit_waveform_steps(model)
    batch = next(iter(make_loader()))
    args = (jnp.asarray(batch.mix), jnp.asarray(batch.sources), jnp.asarray(batch.frame_lengths))
    state, loss = train_step(state, *args)  # compile
    float(loss)
    t0 = time.time()
    for _ in range(20):
        state, loss = train_step(state, *args)
    float(loss)
    step_s = (time.time() - t0) / 20
    summary["step_only"] = {"step_s": round(step_s, 4), "batch": BATCH}
    print(json.dumps({"stage": "step_only", **summary["step_only"]}), flush=True)

    # (c) full epoch: decode-ahead on vs off. The length-bucketed loader
    # produces a handful of padded shapes, each costing one XLA compile —
    # warm every bucket first, then time a steady-state epoch.
    def run_epoch(decode_ahead, seed):
        state_e = train.TrainState.create(
            model.apply, params, train.exponential_decay_adam(), jax.random.key(seed)
        )
        t0 = time.time()
        steps = 0
        audio = 0.0
        for b in data.prefetch_to_device(iter(make_loader()), 2, decode_ahead=decode_ahead):
            state_e, loss = train_step(
                state_e, jnp.asarray(b.mix), jnp.asarray(b.sources), jnp.asarray(b.frame_lengths)
            )
            steps += 1
            audio += float(b.sample_lengths.sum()) / 8000.0
        float(loss)
        return steps, audio, time.time() - t0

    warm_steps, _, warm_s = run_epoch(True, 2)  # compiles every bucket shape
    summary["epoch_warmup"] = {"steps": warm_steps, "wall_s": round(warm_s, 1)}
    print(json.dumps({"stage": "epoch_warmup", **summary["epoch_warmup"]}), flush=True)
    for decode_ahead in (True, False):
        steps, audio, epoch_s = run_epoch(decode_ahead, 3 + int(decode_ahead))
        key = "epoch_decode_ahead" if decode_ahead else "epoch_inline_decode"
        summary[key] = {
            "steps": steps,
            "wall_s": round(epoch_s, 1),
            "s_per_step": round(epoch_s / steps, 4),
            "audio_s_per_s": round(audio / epoch_s, 1),
        }
        print(json.dumps({"stage": key, **summary[key]}), flush=True)

    WORK.mkdir(parents=True, exist_ok=True)
    (WORK / "data_scale_summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
