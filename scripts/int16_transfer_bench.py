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
    # warm-up: compile both dtype programs once (fp32 + int16 inputs)
    for int16 in (False, True):
        wall, _ = one_epoch(int16, state)
        print(
            json.dumps({"stage": "warmup", "int16": int16, "wall_s": round(wall, 2)}),
            flush=True,
        )

    walls: dict[bool, list[float]] = {False: [], True: []}
    audio_s = 0.0
    for _ in range(TRIALS):
        for int16 in (False, True):
            wall, audio_s = one_epoch(int16, state)
            walls[int16].append(wall)
            print(
                json.dumps({"stage": "trial", "int16": int16, "wall_s": round(wall, 2)}),
                flush=True,
            )
    med_f32 = statistics.median(walls[False])
    med_i16 = statistics.median(walls[True])
    print(
        json.dumps(
            {
                "corpus": str(ROOT),
                "trials": TRIALS,
                "epoch_audio_s": round(audio_s, 1),
                "fp32_epoch_s": round(med_f32, 2),
                "int16_epoch_s": round(med_i16, 2),
                "fp32_band_s": [round(min(walls[False]), 2), round(max(walls[False]), 2)],
                "int16_band_s": [round(min(walls[True]), 2), round(max(walls[True]), 2)],
                "speedup": round(med_f32 / med_i16, 3),
                "fp32_audio_s_per_s": round(audio_s / med_f32, 1),
                "int16_audio_s_per_s": round(audio_s / med_i16, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
