"""BLSTM training throughput sweep: compute dtype × scan unroll.

VERDICT round-1 item 9: chase training MFU. Measures the full fused uPIT
train step (on-device STFT+PSM → BLSTM fwd+bwd → Adam) at a production-ish
batch, reporting audio-seconds/s per chip and effective TFLOP/s
(params × 2 FLOPs × 3 passes ≈ 6·P FLOPs per frame per step).

Usage: python scripts/train_mfu_sweep.py [BATCH] [SECONDS]
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from speech_separation_tpu import train
from speech_separation_tpu.models import UPitBlstm
from speech_separation_tpu.ops import stft_frame_count

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SECONDS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
SAMPLE_RATE = 8000


def measure(unroll: int, compute_dtype, iters: int = 8) -> dict:
    samples = SECONDS * SAMPLE_RATE
    model = UPitBlstm(unroll=unroll)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 8, 129)))["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    state = train.TrainState.create(model.apply, params, train.exponential_decay_adam(), rng)
    train_step, _ = train.make_upit_waveform_steps(
        model, donate_state=False, compute_dtype=compute_dtype
    )

    gen = np.random.default_rng(0)
    sources = jnp.asarray(gen.standard_normal((BATCH, 2, samples)).astype(np.float32) * 0.1)
    mix = sources.sum(axis=1)
    fl = jnp.full((BATCH,), stft_frame_count(samples, 256, 128), jnp.int32)

    state, loss = train_step(state, mix, sources, fl)  # compile
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = train_step(state, mix, sources, fl)
    float(loss)  # chain on the final loss forces completion of the sequence
    dt = (time.perf_counter() - t0) / iters

    frames = int(stft_frame_count(samples, 256, 128))
    # fwd+bwd ≈ 3 × fwd; fwd ≈ 2·P FLOPs per frame per utterance
    tflops = 6.0 * n_params * frames * BATCH / dt / 1e12
    return {
        "unroll": unroll,
        "dtype": "bf16" if compute_dtype is not None else "fp32",
        "step_ms": round(dt * 1e3, 2),
        "audio_s_per_s": round(BATCH * SECONDS / dt, 1),
        "approx_tflops": round(tflops, 2),
    }


def main():
    results = []
    for dtype in (None, jnp.bfloat16):
        for unroll in (8, 16, 32, 64):
            r = measure(unroll, dtype)
            results.append(r)
            print(json.dumps(r), flush=True)
    best = max(results, key=lambda r: r["audio_s_per_s"])
    print(json.dumps({"best": best, "batch": BATCH, "seconds": SECONDS}), flush=True)


if __name__ == "__main__":
    main()
