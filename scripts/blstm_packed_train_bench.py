"""Sequence-packed vs bucketed BLSTM corpus training throughput (on chip).

Trains the flagship uPIT BLSTM (bf16, fused Pallas recurrence kernels) over
the same 1,700-utterance corpus split two ways:

- ``bucketed``: the round-2 path — length-sorted batches padded to 2 s
  quanta (5 distinct shapes, ~80% frame occupancy on the 2-6 s corpus);
- ``packed``: ``PackedWaveformLoader`` rows (ONE shape, ≥93% occupancy,
  exact per-utterance semantics via carry resets + segment-aware PIT).

Reports audio-seconds-trained per wall second for one warm epoch of each
(first epoch of each variant absorbs compiles and is discarded).

Usage: [ROOT=/tmp/data_scale/corpus] [ROWS=16] [BATCH=32] \
    python scripts/blstm_packed_train_bench.py
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from speech_separation_tpu import train
from speech_separation_tpu.data import PackedWaveformLoader, WaveformLoader
from speech_separation_tpu.data.datasets import background_iterator
from speech_separation_tpu.models import UPitBlstm

ROOT = pathlib.Path(os.environ.get("ROOT", "/tmp/data_scale/corpus"))
SPLIT = ROOT / "wav8k" / "min" / "train-360"
ROWS = int(os.environ.get("ROWS", "16"))
ROW_SECONDS = float(os.environ.get("ROW_SECONDS", "16"))
BATCH = int(os.environ.get("BATCH", "32"))


def _epoch(loader, step_fn, state, arrays_fn, audio_fn):
    audio = 0.0
    t0 = time.time()
    loss = None
    for b in background_iterator(iter(loader), depth=2):
        state, loss = step_fn(state, *arrays_fn(b))
        audio += audio_fn(b)
    loss.block_until_ready()
    _ = float(loss)  # host fetch: the axon relay's block_until_ready is lazy
    return state, time.time() - t0, audio


def main():
    if not SPLIT.exists():
        raise SystemExit(f"corpus not found at {SPLIT} — run scripts/data_scale_run.py")
    model = UPitBlstm()
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 16, 129)))["params"]

    results = {}
    fresh = lambda: jax.tree.map(jnp.copy, params)  # steps donate the state

    # -- bucketed (round-2 production path) --
    state = train.TrainState.create(model.apply, fresh(), train.adam(1e-3), jax.random.key(1))
    step, _ = train.make_upit_waveform_steps(
        model, compute_dtype=jnp.bfloat16, pallas_scan=True
    )
    mk = lambda: WaveformLoader(
        SPLIT, batch_size=BATCH, shuffle=True, sort_by_length=True,
        drop_remainder=True, pad_quantum_seconds=2.0, seed=0,
    )
    arrays = lambda b: (jnp.asarray(b.mix), jnp.asarray(b.sources),
                        jnp.asarray(b.frame_lengths))
    audio = lambda b: float(np.sum(b.sample_lengths)) / 8000.0
    state, warm_s, _ = _epoch(mk(), step, state, arrays, audio)
    state, wall, audio_s = _epoch(mk(), step, state, arrays, audio)
    results["bucketed"] = {
        "warm_epoch_s": round(warm_s, 1),
        "epoch_s": round(wall, 1),
        "audio_s_per_s": round(audio_s / wall, 1),
    }
    print(json.dumps({"bucketed": results["bucketed"]}), flush=True)

    # -- packed (this round) --
    state = train.TrainState.create(model.apply, fresh(), train.adam(1e-3), jax.random.key(1))
    mkp = lambda: PackedWaveformLoader(
        SPLIT, rows_per_batch=ROWS, row_seconds=ROW_SECONDS, shuffle=True,
        drop_remainder=True, seed=0,
    )
    lp = mkp()
    stepp, _ = train.make_upit_packed_steps(
        model, compute_dtype=jnp.bfloat16, pallas_scan=True,
        num_segments=lp.num_segments,
    )
    arraysp = lambda b: (jnp.asarray(b.mix), jnp.asarray(b.sources),
                         jnp.asarray(b.frame_seg))
    audiop = lambda b: b.audio_seconds
    state, warm_s, _ = _epoch(lp, stepp, state, arraysp, audiop)
    state, wall, audio_s = _epoch(mkp(), stepp, state, arraysp, audiop)
    results["packed"] = {
        "warm_epoch_s": round(warm_s, 1),
        "epoch_s": round(wall, 1),
        "audio_s_per_s": round(audio_s / wall, 1),
        "frame_occupancy": round(lp.frame_occupancy(), 4),
        "rows_per_batch": ROWS,
        "row_seconds": ROW_SECONDS,
    }
    results["packed_vs_bucketed"] = round(
        results["packed"]["audio_s_per_s"] / results["bucketed"]["audio_s_per_s"], 3
    )
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
