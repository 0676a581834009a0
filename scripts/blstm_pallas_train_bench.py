"""uPIT BLSTM training: XLA lax.scan vs fused Pallas fwd+bwd recurrence.

VERDICT round-2 item 2: attack the flagship model's training throughput
(~14% of bf16 peak on the XLA path). Interleaved trials in one process
(chip warm-up variance is ±30% on the axon relay — see agent memory).

Usage: B=32 SECS=8 python scripts/blstm_pallas_train_bench.py
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
from speech_separation_tpu.models import UPitBlstm
from speech_separation_tpu.ops import stft_frame_count

B = int(os.environ.get("B", 32))
SECS = int(os.environ.get("SECS", 8))
ITERS = int(os.environ.get("ITERS", 10))
TRIALS = int(os.environ.get("TRIALS", 4))


def main():
    samples = 8000 * SECS
    model = UPitBlstm()
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 8, 129)))["params"]

    gen = np.random.default_rng(0)
    sources = jnp.asarray(gen.standard_normal((B, 2, samples)).astype(np.float32) * 0.1)
    mix = sources.sum(axis=1)
    fl = jnp.full((B,), stft_frame_count(samples, 256, 128), jnp.int32)

    variants = {}
    for name, kw in [
        ("xla_bf16", dict(compute_dtype=jnp.bfloat16)),
        ("pallas_bf16", dict(compute_dtype=jnp.bfloat16, pallas_scan=True)),
    ]:
        state = train.TrainState.create(
            model.apply, params, train.exponential_decay_adam(), rng
        )
        step, _ = train.make_upit_waveform_steps(model, donate_state=False, **kw)
        t0 = time.time()
        state, loss = step(state, mix, sources, fl)
        print(json.dumps({"variant": name, "compile_s": round(time.time() - t0, 1),
                          "first_loss": float(loss)}), flush=True)
        variants[name] = (step, [state])

    results = {k: [] for k in variants}
    for _ in range(TRIALS):
        for name, (step, box) in variants.items():
            t0 = time.perf_counter()
            loss = None
            for _ in range(ITERS):
                box[0], loss = step(box[0], mix, sources, fl)
            float(loss)  # dependency-chained host fetch
            dt = (time.perf_counter() - t0) / ITERS
            results[name].append(dt)

    from speech_separation_tpu.utils import train_step_mfu

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    frames = int(stft_frame_count(samples, 256, 128))
    out = {"batch": B, "seconds": SECS, "iters": ITERS, "trials": TRIALS}
    for name, times in results.items():
        med = float(np.median(times))
        out[name] = {
            "step_ms": round(med * 1e3, 2),
            "audio_s_per_s": round(B * SECS / med, 1),
            "band_ms": [round(min(times) * 1e3, 2), round(max(times) * 1e3, 2)],
            **train_step_mfu(n_params, B, frames, med),
        }
    out["speedup"] = round(
        out["xla_bf16"]["step_ms"] / out["pallas_bf16"]["step_ms"], 3
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
