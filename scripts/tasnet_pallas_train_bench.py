"""Conv-TasNet training: XLA bf16 step vs the fused Pallas fwd+bwd TCN trunk.

Measured (batch x 4 s, interleaved trials): batch 16: 24.6 -> 24.2 ms/step
(+2%); batch 32: 66.0 -> 49.0 ms/step (+35%) - the Pallas trunk keeps
per-item step time flat where the XLA backward leaves its fast regime.
Loss trajectories match to 3 decimals.

Usage: B=32 python scripts/tasnet_pallas_train_bench.py
"""
import pathlib
import sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from speech_separation_tpu.models import ConvTasNet
from speech_separation_tpu import train

import os
seconds, sr, iters, batch = int(os.environ.get("SECS","4")), 8000, 10, int(os.environ.get("B","32"))
samples = sr * seconds
gen = np.random.default_rng(0)
sources = jnp.asarray(gen.standard_normal((batch, 2, samples)).astype(np.float32) * 0.1)
mix = sources.sum(axis=1)
lengths = jnp.full((batch,), samples, jnp.int32)
model = ConvTasNet()
params_host = jax.tree.map(np.asarray, model.init(jax.random.key(0), mix[:1])["params"])

steps, states = {}, {}
variants = [("xla-bf16", dict(compute_dtype=jnp.bfloat16)),
            ("pallas-trunk", dict(compute_dtype=jnp.bfloat16, pallas_trunk=True))]
for name, kw in variants:
    st = train.TrainState.create(model.apply, jax.tree.map(jnp.asarray, params_host), train.adam(1e-3), jax.random.key(0))
    ts, _ = train.make_time_domain_steps(model, donate_state=True, **kw)
    st, loss = ts(st, mix, sources, lengths)
    print(f"{name}: compiled, loss1={float(loss):.4f}", flush=True)
    steps[name], states[name] = ts, st

for trial in range(3):
    for name, _ in variants:
        ts, st = steps[name], states[name]
        st, loss = ts(st, mix, sources, lengths); float(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            st, loss = ts(st, mix, sources, lengths)
        ll = float(loss)
        dt = time.perf_counter() - t0
        states[name] = st
        from speech_separation_tpu.utils import train_step_mfu
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params_host))
        mfu = train_step_mfu(n_params, batch, samples // (model.win // 2), dt / iters)
        print(f"trial {trial} {name:12s}: {dt/iters*1e3:7.1f} ms/step  {batch*seconds*iters/dt:8.1f} audio-s/s  "
              f"{mfu['tflops']:.1f} TFLOP/s ({mfu['mfu_pct']:.1f}% MFU)  loss={ll:.4f}", flush=True)
