"""Generalization training at corpus scale (not the 4-utterance fixture).

Trains the uPIT BLSTM with `fit` (bf16 compute, decode-ahead loaders,
metrics streaming) on the 1,700-utterance synthetic Libri2Mix-shaped
``wav8k/min/train-360`` split produced by `scripts/data_scale_run.py`,
validates on `dev`, then separates the held-out `test` split and scores it —
the full production workflow at a scale the fixture can't exercise.

Usage: python scripts/corpus_train_run.py [CORPUS_ROOT] [EPOCHS]
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from speech_separation_tpu import data, train
from speech_separation_tpu.evaluate import eval_si_sdr, eval_si_sdri
from speech_separation_tpu.models import UPitBlstm
from speech_separation_tpu.separate import separate_directory
from speech_separation_tpu.utils import MetricsLogger

PROFILE = os.environ.get("PROFILE", "easy")  # corpus difficulty regime
_default_root = "/tmp/data_scale/corpus" + ("" if PROFILE == "easy" else f"_{PROFILE}")
ROOT = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else pathlib.Path(_default_root)
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
BAND = ROOT / "wav8k" / "min"
OUT = pathlib.Path("/tmp/corpus_train" + ("" if PROFILE == "easy" else f"_{PROFILE}"))


def _alias_mix(split_dir: pathlib.Path) -> None:
    mix = split_dir / "mix"
    if not mix.exists():
        os.symlink("mix_clean", mix)


def main():
    if not ROOT.exists():
        import time as _time

        from speech_separation_tpu.data import make_synthetic_librimix

        t_gen = _time.time()
        make_synthetic_librimix(
            ROOT,
            utterances={"dev": 50, "test": 50, "train-100": 200, "train-360": 1700},
            min_seconds=2.0,
            max_seconds=6.0,
            profile=PROFILE,
        )
        print(json.dumps({"stage": "corpus_gen", "profile": PROFILE,
                          "wall_s": round(_time.time() - t_gen, 1)}), flush=True)
    for split in ("train-360", "dev", "test"):
        _alias_mix(BAND / split)

    model = UPitBlstm()
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 8, 129)))["params"]
    state = train.TrainState.create(
        model.apply,
        params,
        # CLIP>0: global-norm gradient clipping (bounds the transient loss
        # spikes seen in long runs — RESULTS.md, epochs 56-60 of the 100-epoch run)
        train.exponential_decay_adam(
            decay_steps=2000,
            grad_clip_norm=float(os.environ.get("CLIP", "0")),
        ),
        rng,
    )
    pallas = bool(int(os.environ.get("PALLAS", "0")))
    packed = bool(int(os.environ.get("PACK", "0")))
    # INT16=1: ship int16 PCM over the relay link (half the bytes,
    # bit-exact for the 16-bit corpus wavs; steps dequantize on device)
    int16 = bool(int(os.environ.get("INT16", "0")))
    # RESIDENT=1 (implies PACK): upload the whole packed corpus to HBM once;
    # steps take only row indices — epochs go compute-bound on any link
    resident = bool(int(os.environ.get("RESIDENT", "0")))
    if resident:
        # RESIDENT=1: whole packed corpus in HBM; per-step wire = row idx
        tr = data.ResidentPackedCorpus(
            BAND / "train-360", rows_per_batch=16, shuffle=True, seed=0,
            transfer_int16=True,  # resident upload is one-time; int16 halves HBM
        )
        dv = data.ResidentPackedCorpus(
            BAND / "dev", rows_per_batch=16, transfer_int16=True,
        )
        num_segments = max(tr.num_segments, dv.num_segments)
        train_step, _ = train.make_upit_packed_resident_steps(
            model, tr.mix, tr.sources, tr.frame_seg,
            compute_dtype=jnp.bfloat16, pallas_scan=pallas,
            num_segments=num_segments,
        )
        _, eval_step = train.make_upit_packed_resident_steps(
            model, dv.mix, dv.sources, dv.frame_seg,
            compute_dtype=jnp.bfloat16, pallas_scan=pallas,
            num_segments=num_segments,
        )

        def batch_arrays(idx):
            return (jnp.asarray(idx),)

        _loaders = {"train-360": tr, "dev": dv}
        make_loader = lambda split, shuffle: _loaders[split]
    elif packed:
        # PACK=1: sequence-packed rows (one static shape, zero padding
        # waste, exact per-utterance semantics — data/packing.py)
        # num_segments must bound BOTH splits: a dev row packing more
        # segments than the bound would silently drop those utterances from
        # the val loss (pit_loss_packed one-hot never matches their ids)
        num_segments = max(
            data.PackedWaveformLoader(BAND / s, rows_per_batch=16).num_segments
            for s in ("train-360", "dev")
        )
        train_step, eval_step = train.make_upit_packed_steps(
            model, compute_dtype=jnp.bfloat16, pallas_scan=pallas,
            num_segments=num_segments,
        )

        def batch_arrays(b):
            return (jnp.asarray(b.mix), jnp.asarray(b.sources), jnp.asarray(b.frame_seg))

        make_loader = lambda split, shuffle: data.PackedWaveformLoader(
            BAND / split,
            rows_per_batch=16,
            shuffle=shuffle,
            drop_remainder=shuffle,
            seed=0,
            transfer_int16=int16,
        )
    else:
        train_step, eval_step = train.make_upit_waveform_steps(
            model,
            compute_dtype=jnp.bfloat16,
            # PALLAS=1: fused Pallas fwd+bwd BiLSTM recurrences (+84% step
            # throughput at batch 32 x 8 s; see RESULTS.md)
            pallas_scan=pallas,
        )

        def batch_arrays(b):
            return (jnp.asarray(b.mix), jnp.asarray(b.sources), jnp.asarray(b.frame_lengths))

        make_loader = lambda split, shuffle: data.WaveformLoader(
            BAND / split,
            batch_size=8,
            shuffle=shuffle,
            sort_by_length=True,
            drop_remainder=shuffle,
            seed=0,
            transfer_int16=int16,
            # under the Pallas recurrence kernels, bound the number of distinct
            # padded shapes (each fresh shape remote-compiles 2 kernels in ~min)
            pad_quantum_seconds=2.0 if pallas else 1.0,
        )
    OUT.mkdir(parents=True, exist_ok=True)
    logger = MetricsLogger(OUT / "metrics.jsonl")
    # checkpoint best-val state and resume from it if present: long runs
    # must survive relay outages (a multi-hour one killed a 150-epoch run)
    ckpt = train.CheckpointManager(OUT / "ckpt")
    t0 = time.time()
    result = train.fit(
        state,
        train_step,
        eval_step,
        make_loader("train-360", True),
        make_loader("dev", False),
        batch_arrays,
        epochs=EPOCHS,
        metrics=logger,
        checkpoints=ckpt,
        resume=bool(int(os.environ.get("RESUME", "1"))),
    )
    ckpt.close()
    logger.close()
    train_s = time.time() - t0

    sep_dir = OUT / "test_separated"
    separate_directory(
        model, result.state.params, BAND / "test", sep_dir, batch_size=8,
        compute_dtype=jnp.bfloat16,
    )
    si = eval_si_sdr(BAND, sep_dir, split="test")
    si_i = eval_si_sdri(BAND, sep_dir, split="test")
    summary = {
        "corpus_profile": PROFILE,
        "pallas_scan": bool(int(os.environ.get("PALLAS", "0"))),
        "packed": bool(int(os.environ.get("PACK", "0"))),
        "transfer_int16": int16,
        "resident": resident,
        "epochs": EPOCHS,
        "train_utterances": 1700,
        "history_loss": [round(x, 3) for x in result.history["loss"]],
        "history_val_loss": [round(x, 3) for x in result.history["val_loss"]],
        "train_wall_s": round(train_s, 1),
        "heldout_test_si_sdr_db": round(si, 3),
        "heldout_test_si_sdri_db": round(si_i, 3),
    }
    (OUT / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
