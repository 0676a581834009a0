"""Conv-TasNet training throughput on the real chip: fp32 vs bf16 mixed
precision (fp32 master weights, bf16 fwd/bwd via make_time_domain_steps
compute_dtype). Measured: 57.7 -> 27.2 ms/step at batch 16 x 4 s (2.12x).

Usage: python scripts/tasnet_train_bench.py
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from speech_separation_tpu.models import ConvTasNet
from speech_separation_tpu import train

batch, seconds, sr, iters = 16, 4, 8000, 10
samples = sr * seconds
gen = np.random.default_rng(0)
sources = jnp.asarray(gen.standard_normal((batch, 2, samples)).astype(np.float32) * 0.1)
mix = sources.sum(axis=1)
lengths = jnp.full((batch,), samples, jnp.int32)

model = ConvTasNet()
params_host = jax.tree.map(np.asarray, model.init(jax.random.key(0), mix)["params"])

for name, dt in [("fp32", None), ("bf16", jnp.bfloat16)]:
    state = train.TrainState.create(model.apply, jax.tree.map(jnp.asarray, params_host), train.adam(1e-3), jax.random.key(0))
    ts, _ = train.make_time_domain_steps(model, donate_state=True, compute_dtype=dt)
    state, loss = ts(state, mix, sources, lengths)  # compile
    state, loss = ts(state, mix, sources, lengths)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = ts(state, mix, sources, lengths)
    ll = float(loss)  # host fetch forces the chain
    dt_s = time.perf_counter() - t0
    from speech_separation_tpu.utils import train_step_mfu
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params_host))
    mfu = train_step_mfu(n_params, batch, samples // (model.win // 2), dt_s / iters)
    print(f"{name}: {dt_s/iters*1e3:7.1f} ms/step  {batch*seconds*iters/dt_s:8.1f} audio-s/s  "
          f"{mfu['tflops']:.1f} TFLOP/s ({mfu['mfu_pct']:.1f}% MFU)  loss={ll:.3f}", flush=True)
