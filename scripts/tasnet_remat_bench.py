"""remat-vs-standard Conv-TasNet bf16 train-step timing (interleaved trials).

Measured: perf-neutral at batch 16 (24.6 vs 24.7 ms/step); remat=True is
memory headroom, not a speedup. Usage: python scripts/tasnet_remat_bench.py
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

seconds, sr, iters, batch = 4, 8000, 20, 16
samples = sr * seconds
gen = np.random.default_rng(0)
sources = jnp.asarray(gen.standard_normal((batch, 2, samples)).astype(np.float32) * 0.1)
mix = sources.sum(axis=1)
lengths = jnp.full((batch,), samples, jnp.int32)

steps = {}
states = {}
for remat in [False, True]:
    model = ConvTasNet(remat=remat)
    params = model.init(jax.random.key(0), mix[:1])["params"]
    states[remat] = train.TrainState.create(model.apply, params, train.adam(1e-3), jax.random.key(0))
    steps[remat], _ = train.make_time_domain_steps(model, donate_state=True, compute_dtype=jnp.bfloat16)
    states[remat], loss = steps[remat](states[remat], mix, sources, lengths)
    float(loss)

for trial in range(3):
    for remat in [False, True]:
        ts, st = steps[remat], states[remat]
        st, loss = ts(st, mix, sources, lengths); float(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            st, loss = ts(st, mix, sources, lengths)
        float(loss)
        dt = time.perf_counter() - t0
        states[remat] = st
        print(f"trial {trial} remat={remat!s:5s}: {dt/iters*1e3:7.1f} ms/step  {batch*seconds*iters/dt:8.1f} audio-s/s", flush=True)
