"""Single-utterance serving latency: XLA vs the fused Pallas TCN trunk.

Measured (8 s utterance, win=16, dependency-chained): batch 1 10.51 ->
4.30 ms (2.4x lower latency); batch 4 20.43 -> 14.72 ms. The whole-trunk
VMEM kernel removes XLA's per-op launch/fusion overhead that dominates at
small batch. Usage: python scripts/tasnet_latency_bench.py
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from speech_separation_tpu.models import ConvTasNet
from speech_separation_tpu.models.tasnet_serving import pallas_apply

seconds, sr, iters = 8, 8000, 20
samples = sr * seconds
model = ConvTasNet(dtype=jnp.bfloat16)
params = model.init(jax.random.key(0), jnp.zeros((1, samples)))["params"]
fns = {
    "xla   ": jax.jit(lambda m: model.apply({"params": params}, m)),
    "pallas": jax.jit(lambda m: pallas_apply(params, m)),
}
for batch in [1, 4]:
    mix = jnp.asarray(np.random.default_rng(0).standard_normal((batch, samples)).astype(np.float32) * 0.1)
    for name, fn in fns.items():
        cur = mix
        for _ in range(2):
            cur = fn(cur)[:, 0, :]
        np.asarray(cur[0, :8])
        cur = mix
        t0 = time.perf_counter()
        for _ in range(iters):
            cur = fn(cur)[:, 0, :]
        np.asarray(cur[0, :8])
        dt = (time.perf_counter() - t0) / iters
        print(f"batch {batch} {name}: {dt*1e3:6.2f} ms for {seconds}s audio  ({batch*seconds/dt:7.0f}x RT)", flush=True)
