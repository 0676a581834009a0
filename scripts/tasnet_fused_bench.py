"""Measure Conv-TasNet serving variants on the real chip.

Usage: python scripts/tasnet_fused_bench.py [batch] [win] [variant ...]
Variants: standard fused pallas pallas-ck1024 trunk (default: all).
Uses the persistent JAX compilation cache so repeat runs skip the ~1-4 min
remote Pallas compiles.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _chained(fn, first, iters, extract=lambda o: o[:, 0, :]):
    cur = first
    t0 = time.perf_counter()
    for _ in range(iters):
        cur = extract(fn(cur))
    np.asarray(cur.reshape(-1)[:8])  # tiny device-side slice forces completion
    return time.perf_counter() - t0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from speech_separation_tpu.models import ConvTasNet
    from speech_separation_tpu.models.tasnet_serving import fused_apply, pallas_apply
    from speech_separation_tpu.ops.tcn_pallas import (
        stack_tcn_weights,
        tcn_trunk_pallas,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    win = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    variants = sys.argv[3:] or ["standard", "fused", "pallas", "pallas-ck1024", "trunk"]
    seconds, sr, iters = 8, 8000, 5
    samples = sr * seconds

    mix = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, samples)).astype(np.float32) * 0.1
    )
    model = ConvTasNet(dtype=jnp.bfloat16, win=win)
    params = model.init(jax.random.key(0), jnp.zeros((1, samples)))["params"]

    fns = {
        "standard": jax.jit(lambda m: model.apply({"params": params}, m)),
        "fused": jax.jit(lambda m: fused_apply(params, m, win=win, dtype=jnp.bfloat16)),
        "pallas": jax.jit(lambda m: pallas_apply(params, m, win=win)),
        "pallas-ck1024": jax.jit(lambda m: pallas_apply(params, m, win=win, chunk=1024)),
    }

    ref = None
    for name in variants:
        if name == "trunk":
            we, wdw, wg, vecs = stack_tcn_weights(params, blocks=7, repeats=3)
            dils = tuple(2**x for _ in range(3) for x in range(7))
            k = samples // (win // 2)
            h0 = jnp.zeros((batch, k, 128), jnp.bfloat16)
            fn = lambda h: tcn_trunk_pallas(h, we, wdw, wg, vecs, dils=dils)
            _chained(fn, h0, 2, extract=lambda o: o)
            dt = _chained(fn, h0, iters, extract=lambda o: o)
            print(f"win={win} trunk-only pallas : {dt/iters*1e3:6.1f} ms/iter", flush=True)
            continue
        fn = fns[name]
        _chained(fn, mix, 2)
        dt = _chained(fn, mix, iters)
        xrt = batch * seconds * iters / dt
        print(
            f"win={win} {name:14s}: {xrt:9.0f} x realtime  ({dt/iters*1e3:6.1f} ms/iter)",
            flush=True,
        )
        out = np.asarray(fn(mix)[:2])
        if ref is None:
            ref = (name, out)
        else:
            print(
                f"win={win} max|{ref[0]}-{name}| = {np.abs(ref[1] - out).max():.3e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
