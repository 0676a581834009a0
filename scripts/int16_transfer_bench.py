"""Measure the int16 host→device transfer path at corpus scale.

The axon relay link is the corpus-training bottleneck at small step times:
a packed batch of 16 × 16 s rows is 16·2·3 MB fp32 of mix+sources per step.
``transfer_int16=True`` (data/packing.py, data/datasets.py) ships the same
samples as int16 PCM — half the bytes, dequantized on device bit-exactly
for 16-bit sources (train/steps.py::_dequant).

Interleaved A/B epochs over the SAME loader order (alternating fp32/int16
per trial pair) through the packed + Pallas-recurrence bf16 training step —
the round-3 flagship BLSTM configuration. Prints one JSON line with median
epoch wall times and the implied link-byte saving.

Usage: [TRIALS=3] python scripts/int16_transfer_bench.py [CORPUS_ROOT]
"""

import json
import os
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from speech_separation_tpu import data, train
from speech_separation_tpu.models import UPitBlstm

ROOT = (
    pathlib.Path(sys.argv[1])
    if len(sys.argv) > 1
    else pathlib.Path("/tmp/data_scale/corpus_hard")
)
TRIALS = int(os.environ.get("TRIALS", "3"))
SPLIT = ROOT / "wav8k" / "min" / "train-360"


def make_loader(int16: bool) -> data.PackedWaveformLoader:
    return data.PackedWaveformLoader(
        SPLIT, rows_per_batch=16, seed=0, transfer_int16=int16
    )


def main() -> None:
    model = UPitBlstm()
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 8, 129)))["params"]
    probe = make_loader(False)
    train_step, _ = train.make_upit_packed_steps(
        model,
        compute_dtype=jnp.bfloat16,
        pallas_scan=True,
        num_segments=probe.num_segments,
        donate_state=False,
    )

    def one_epoch(int16: bool, state) -> tuple[float, float]:
        loader = make_loader(int16)
        t0 = time.time()
        audio = 0.0
        loss = None
        for b in loader:
            state, loss = train_step(
                state,
                jnp.asarray(b.mix),
                jnp.asarray(b.sources),
                jnp.asarray(b.frame_seg),
            )
            audio += b.audio_seconds
        if loss is None:
            raise SystemExit(f"no batches found under {SPLIT} — generate the corpus first")
        loss = float(loss)  # host sync: the epoch is truly done
        return time.time() - t0, audio

    state = train.TrainState.create(
        model.apply, params, train.exponential_decay_adam(decay_steps=2000), rng
    )

    # third variant: device-resident corpus (data/device_dataset.py) — one
    # upload, per-step wire = a 16-int row-index array
    resident = data.ResidentPackedCorpus(
        SPLIT, rows_per_batch=16, shuffle=True, seed=0
    )
    res_step, _ = train.make_upit_packed_resident_steps(
        model,
        resident.mix,
        resident.sources,
        resident.frame_seg,
        compute_dtype=jnp.bfloat16,
        pallas_scan=True,
        num_segments=resident.num_segments,
        donate_state=False,
    )

    def one_resident_epoch(state) -> float:
        t0 = time.time()
        loss = None
        for idx in resident:
            state, loss = res_step(state, jnp.asarray(idx))
        float(loss)
        return time.time() - t0

    variants = {
        "fp32": lambda: one_epoch(False, state)[0],
        "int16": lambda: one_epoch(True, state)[0],
        "resident": lambda: one_resident_epoch(state),
    }
    for name, run in variants.items():  # compile all programs once
        print(
            json.dumps({"stage": "warmup", "variant": name, "wall_s": round(run(), 2)}),
            flush=True,
        )

    walls: dict[str, list[float]] = {k: [] for k in variants}
    audio_s = resident.audio_seconds
    for _ in range(TRIALS):
        for name, run in variants.items():
            wall = run()
            walls[name].append(wall)
            print(
                json.dumps({"stage": "trial", "variant": name, "wall_s": round(wall, 2)}),
                flush=True,
            )
    med = {k: statistics.median(v) for k, v in walls.items()}
    print(
        json.dumps(
            {
                "corpus": str(ROOT),
                "trials": TRIALS,
                "epoch_audio_s": round(audio_s, 1),
                **{f"{k}_epoch_s": round(v, 2) for k, v in med.items()},
                "bands_s": {
                    k: [round(min(v), 2), round(max(v), 2)] for k, v in walls.items()
                },
                "int16_speedup": round(med["fp32"] / med["int16"], 3),
                "resident_speedup": round(med["fp32"] / med["resident"], 3),
                **{
                    f"{k}_audio_s_per_s": round(
                        # shuffled resident epochs drop the ragged row tail
                        (
                            audio_s
                            * (len(resident) * resident.rows_per_batch)
                            / resident.num_rows
                            if k == "resident"
                            else audio_s
                        )
                        / v,
                        1,
                    )
                    for k, v in med.items()
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
