"""Streaming separation latency on the real chip.

Reports per-hop compute latency (median/p90 over a simulated stream) for
the online Conv-TasNet pipeline at several hop sizes, alongside the
end-to-end algorithmic delay (= one hop; the window has no lookahead).
Real-time operation requires compute latency < hop duration.

Usage: python scripts/streaming_latency_bench.py [WIN] [KERNEL]
  WIN: encoder window (16 default) — KERNEL: standard | pallas
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from speech_separation_tpu.models import ConvTasNet
from speech_separation_tpu.separate.streaming import stream_separate

WIN = int(sys.argv[1]) if len(sys.argv) > 1 else 16
KERNEL = sys.argv[2] if len(sys.argv) > 2 else "standard"
SR = 8000


def main():
    model = ConvTasNet(dtype=jnp.bfloat16, win=WIN)
    params = model.init(jax.random.key(0), jnp.zeros((1, SR)))["params"]

    gen = np.random.default_rng(0)
    mix = (gen.standard_normal(20 * SR) * 0.1).astype(np.float32)

    rows = []
    for hop_s, ctx_s in [(0.25, 1.75), (0.5, 1.5), (1.0, 3.0)]:
        window = int((hop_s + ctx_s) * SR)
        if KERNEL == "pallas":
            from speech_separation_tpu.models.tasnet_serving import pallas_apply

            apply_fn = jax.jit(lambda m: pallas_apply(params, m, win=WIN))
        else:
            apply_fn = jax.jit(lambda m: model.apply({"params": params}, m))
        # compile + warm the single window shape
        t0 = time.time()
        np.asarray(apply_fn(jnp.zeros((1, window))))
        compile_s = time.time() - t0

        _, lat = stream_separate(
            apply_fn, mix, sample_rate=SR, hop_seconds=hop_s, context_seconds=ctx_s
        )
        lat_ms = np.asarray(lat[2:]) * 1e3  # skip warm-up hops
        rows.append(
            {
                "hop_s": hop_s,
                "context_s": ctx_s,
                "kernel": KERNEL,
                "compile_s": round(compile_s, 1),
                "median_ms": round(float(np.median(lat_ms)), 2),
                "p90_ms": round(float(np.percentile(lat_ms, 90)), 2),
                "algorithmic_delay_ms": round(hop_s * 1e3, 1),
                "realtime_factor": round(hop_s * 1e3 / float(np.median(lat_ms)), 1),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"rows": rows}), flush=True)


if __name__ == "__main__":
    main()
