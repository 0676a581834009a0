"""Empirical per-op cost model for Conv-TasNet serving on the real chip.

Times each candidate primitive at serving shapes (batch 64 x 8 s, win 16:
K=8000 frames). Each op is timed inside ONE jitted lax.fori_loop that chains
iterations through a scalar data dependency scaled by a runtime epsilon
(opaque to the compiler, so the op cannot be DCE'd or reordered), keeping
dtypes intact and dispatch overhead out of the measurement.

Usage: python scripts/tasnet_microbench.py [batch] [iters]
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

BASELINE_MS = None


def timeit(name, op, arg, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, eps):
        def body(_, c):
            o = op(c)
            o = o[0] if isinstance(o, tuple) else o
            s = o.reshape(-1)[0].astype(jnp.float32)
            return c + (eps * s).astype(c.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    eps = jnp.float32(1e-12)
    np.asarray(run(arg, eps).reshape(-1)[:4])  # compile + warm
    t0 = time.perf_counter()
    out = run(arg, eps)
    np.asarray(out.reshape(-1)[:4])
    dt = (time.perf_counter() - t0) / iters * 1e3
    note = ""
    if BASELINE_MS is not None:
        note = f"  (net {dt - BASELINE_MS:7.3f} ms)"
    print(f"{name:44s}: {dt:8.3f} ms{note}", flush=True)
    return dt


def main():
    global BASELINE_MS
    import jax
    import jax.numpy as jnp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k, cb, ch = 8000, 128, 256  # frames, bottleneck, hidden
    key = jax.random.key(0)
    h = jax.random.normal(key, (batch, k, cb), jnp.bfloat16)
    y = jax.random.normal(key, (batch, k, ch), jnp.bfloat16)
    w_e = jax.random.normal(key, (1, cb, ch), jnp.float32) * 0.1
    w_r = jax.random.normal(key, (1, ch, cb), jnp.float32) * 0.1
    w_cat = jax.random.normal(key, (1, ch, 2 * cb), jnp.float32) * 0.1
    w_dw = jax.random.normal(key, (3, 1, ch), jnp.float32) * 0.1
    gamma = jnp.ones((ch,))
    beta = jnp.zeros((ch,))
    dn = ("NWC", "WIO", "NWC")

    def conv1x1(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1,), "SAME", dimension_numbers=dn
        )

    def einsum1x1(x, w):
        return jnp.einsum("btc,co->bto", x, w[0].astype(x.dtype))

    def dw(x, dil):
        return jax.lax.conv_general_dilated(
            x, w_dw.astype(x.dtype), (1,), "SAME",
            rhs_dilation=(dil,), dimension_numbers=dn, feature_group_count=ch,
        )

    def gln(x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        msq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(msq - jnp.square(mean), 0.0)
        return ((gamma * (x32 - mean) / jnp.sqrt(var + 1e-8) + beta)).astype(x.dtype)

    def gln_stats(x):
        x32 = x.astype(jnp.float32)
        return jnp.mean(x32, axis=(1, 2)) + jnp.mean(jnp.square(x32), axis=(1, 2))

    BASELINE_MS = timeit("chain baseline (no op)", lambda x: x, y, iters)
    timeit("expand conv1x1 128->256", lambda x: conv1x1(x, w_e), h, iters)
    timeit("expand einsum 128->256", lambda x: einsum1x1(x, w_e), h, iters)
    timeit("res conv1x1 256->128", lambda x: conv1x1(x, w_r), y, iters)
    timeit("res einsum 256->128", lambda x: einsum1x1(x, w_r), y, iters)
    timeit("combined conv1x1 256->256", lambda x: conv1x1(x, w_cat), y, iters)
    timeit("combined einsum 256->256", lambda x: einsum1x1(x, w_cat), y, iters)
    timeit("depthwise dil=1", lambda x: dw(x, 1), y, iters)
    timeit("depthwise dil=64", lambda x: dw(x, 64), y, iters)
    timeit("gLN full (stats+normalize)", gln, y, iters)
    timeit("gLN stats only", gln_stats, y, iters)
    timeit("prelu", lambda x: jnp.where(x >= 0, x, 0.25 * x), y, iters)
    timeit("copy (read+write)", lambda x: x * 1.0001, y, iters)
    timeit("m-conv batch-1 fp32 dil=64",
           lambda x: dw(x[:1].astype(jnp.float32), 64), y, iters)
    timeit("conv1x1 + prelu epilogue",
           lambda x: jnp.where(conv1x1(x, w_e) >= 0, conv1x1(x, w_e), 0.25), h, iters)
    timeit("gLN -> combined conv (standard)",
           lambda x: conv1x1(gln(x), w_cat), y, iters)

    def folded_norm_conv(x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2))
        msq = jnp.mean(jnp.square(x32), axis=(1, 2))
        var = jnp.maximum(msq - jnp.square(mean), 0.0)
        s = jax.lax.rsqrt(var + 1e-8)
        b = beta[None, :] - mean[:, None] * (gamma[None, :] * s[:, None])
        out = einsum1x1(x, w_cat * gamma[None, :, None])
        bias2 = b @ w_cat[0]
        return (out.astype(jnp.float32) * s[:, None, None] + bias2[:, None, :]).astype(x.dtype)

    timeit("gLN -> combined conv (folded)", folded_norm_conv, y, iters)

    # fused whole-block comparison: standard vs folded, one TCN block
    def std_block(x):
        t1 = jnp.where(conv1x1(x, w_e) >= 0, conv1x1(x, w_e), 0.25 * conv1x1(x, w_e))
        n1 = gln(t1)
        t2 = gln(jnp.where(dw(n1, 8) >= 0, dw(n1, 8), 0.25 * dw(n1, 8)))
        return conv1x1(t2, w_r) + x, conv1x1(t2, w_r)

    timeit("full TCN block (standard-ish)", lambda x: std_block(x)[0], h, iters)


if __name__ == "__main__":
    main()
