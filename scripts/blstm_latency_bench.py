"""uPIT BLSTM wave-to-wave serving latency: lax.scan vs Pallas recurrence.

The round-1 serving kernel lost to XLA at batch 128+ (batch tiling); the
round-3 *training* kernel keeps the whole batch in one matmul and wins at
training batches. This bench asks the latency question: at batch 1–16,
does the fused recurrence beat the scan for the full separation pipeline
(STFT → BLSTM masks → phase reapply → iSTFT)? Interleaved trials.

Usage: SECS=8 python scripts/blstm_latency_bench.py
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

from speech_separation_tpu.models import UPitBlstm
from speech_separation_tpu.models.upit import upit_blstm_train_forward
from speech_separation_tpu.ops.features import magnitude_angle
from speech_separation_tpu.ops.stft import istft, stft

SECS = int(os.environ.get("SECS", 8))
TRIALS = int(os.environ.get("TRIALS", 5))
ITERS = int(os.environ.get("ITERS", 20))


def main():
    model = UPitBlstm()
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 129)))["params"]
    p_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    size, shift = 256, 128

    def pipeline(mask_fn, mix):
        spec = stft(mix, size, shift)
        mag, cos, sin = magnitude_angle(spec)
        preds = mask_fn(mag.astype(jnp.bfloat16)).astype(jnp.float32)
        f = mag.shape[-1]
        wavs = []
        for s in range(2):
            est = preds[..., s * f : (s + 1) * f]
            wavs.append(istft(jax.lax.complex(est * cos, est * sin), size, shift))
        return jnp.stack(wavs, axis=1)

    rows = []
    for batch in (1, 4, 16):
        mix = jnp.asarray(
            np.random.default_rng(0).standard_normal((batch, SECS * 8000)).astype(np.float32) * 0.1
        )
        variants = {
            "scan": jax.jit(lambda m: pipeline(
                lambda x: model.apply({"params": p_bf16}, x, deterministic=True), m
            )),
            "pallas": jax.jit(lambda m: pipeline(
                lambda x: upit_blstm_train_forward(
                    p_bf16, x, compute_dtype=jnp.bfloat16
                ), m
            )),
        }
        for fn in variants.values():
            np.asarray(fn(mix)[:, 0, :8])  # compile + warm

        times = {k: [] for k in variants}
        for _ in range(TRIALS):
            for name, fn in variants.items():
                cur = mix
                t0 = time.perf_counter()
                for _ in range(ITERS):
                    cur = fn(cur)[:, 0, :]
                np.asarray(cur[0, :8])
                times[name].append((time.perf_counter() - t0) / ITERS)
        row = {"batch": batch, "seconds": SECS}
        for name, ts in times.items():
            row[name + "_ms"] = round(float(np.median(ts)) * 1e3, 2)
        row["speedup"] = round(row["scan_ms"] / row["pallas_ms"], 2)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"rows": rows}), flush=True)


if __name__ == "__main__":
    main()
