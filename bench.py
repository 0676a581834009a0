"""Headline benchmark: wave-to-wave separation throughput per chip.

Runs the full fused pipeline (STFT → uPIT BLSTM (496×3) masks → phase
reapply → iSTFT) on batches of 8 s utterances and reports separated audio
seconds per wall-clock second per chip, i.e. the ×-real-time factor.

The reference publishes no throughput numbers (its notebooks are toy runs);
``BASELINE.json``'s north star is ≥100× real time per chip, so
``vs_baseline = value / 100``.

Prints exactly one JSON line. The headline metric is the bf16 BLSTM
pipeline; the ``extra`` field carries the fp32 BLSTM number (precision
context) and the Conv-TasNet serving number (the best-quality model).
"""

import json
import time

import numpy as np


def _chained_timer(fn, first_arg, iters, extract):
    """Serialize iterations via a data dependency (feed output back as
    input) so async runtimes can't overlap or lazily defer the work, and
    finish with a host fetch. Returns elapsed seconds."""
    cur = first_arg
    t0 = time.perf_counter()
    for _ in range(iters):
        cur = extract(fn(cur))
    np.asarray(cur[0, :8])  # tiny fetch forces completion
    return time.perf_counter() - t0


def bench_blstm(compute_dtype=None, batch=256, seconds=8, iters=10):
    # batch sweep (bf16): 128 → 26,263×, 256 → 27,221×, 512 → 27,369×;
    # 256 takes the +4% without doubling latency/memory again
    import jax
    import jax.numpy as jnp

    from speech_separation_tpu.models import UPitBlstm
    from speech_separation_tpu.ops.features import magnitude_angle
    from speech_separation_tpu.ops.stft import istft, stft

    sample_rate = 8000
    samples = sample_rate * seconds
    size, shift, num_speakers = 256, 128, 2

    model = UPitBlstm()
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 129)))["params"]

    @jax.jit
    def separate(mix):
        spec = stft(mix, size, shift)
        mag, cos, sin = magnitude_angle(spec)
        p = params
        net_in = mag
        if compute_dtype is not None:
            p = jax.tree.map(lambda x: x.astype(compute_dtype), params)
            net_in = mag.astype(compute_dtype)
        preds = model.apply({"params": p}, net_in, deterministic=True).astype(jnp.float32)
        f = mag.shape[-1]
        wavs = []
        for s in range(num_speakers):
            est = preds[..., s * f : (s + 1) * f]
            wavs.append(istft(jax.lax.complex(est * cos, est * sin), size, shift))
        return jnp.stack(wavs, axis=1)

    mix = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, samples)).astype(np.float32) * 0.1
    )
    extract = lambda out: out[:, 0, :]
    _chained_timer(separate, mix, 2, extract)  # warmup / compile
    elapsed = _chained_timer(separate, mix, iters, extract)
    return batch * seconds * iters / elapsed


def bench_tasnet(batch=64, seconds=8, iters=5, win=16, kernel="standard"):
    """Conv-TasNet serving: bf16 convs (one-pass fp32 gLN stats).

    kernel="pallas" runs the TCN trunk as one fused Pallas program
    (ops/tcn_pallas.py): all 21 dilated blocks inside VMEM, ~26% faster
    than the XLA path at win=16.
    """
    import jax
    import jax.numpy as jnp

    from speech_separation_tpu.models import ConvTasNet

    sample_rate = 8000
    samples = sample_rate * seconds

    model = ConvTasNet(dtype=jnp.bfloat16, win=win)
    mix0 = jnp.zeros((batch, samples))
    params = model.init(jax.random.key(0), mix0)["params"]

    if kernel == "pallas":
        from speech_separation_tpu.models.tasnet_serving import pallas_apply

        @jax.jit
        def separate(mix):
            return pallas_apply(params, mix, win=win)

    else:

        @jax.jit
        def separate(mix):
            return model.apply({"params": params}, mix)

    mix = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, samples)).astype(np.float32) * 0.1
    )
    extract = lambda out: out[:, 0, :]
    _chained_timer(separate, mix, 2, extract)
    elapsed = _chained_timer(separate, mix, iters, extract)
    return batch * seconds * iters / elapsed


def bench_tasnet_train(batch=16, seconds=4, iters=10):
    """Conv-TasNet bf16 mixed-precision train step: audio-seconds trained
    per wall second per chip (fp32 master weights, bf16 fwd/bwd)."""
    import jax
    import jax.numpy as jnp

    from speech_separation_tpu import train
    from speech_separation_tpu.models import ConvTasNet

    samples = 8000 * seconds
    gen = np.random.default_rng(0)
    sources = jnp.asarray(gen.standard_normal((batch, 2, samples)).astype(np.float32) * 0.1)
    mix = sources.sum(axis=1)
    lengths = jnp.full((batch,), samples, jnp.int32)
    model = ConvTasNet()
    params = model.init(jax.random.key(0), mix[:1])["params"]
    state = train.TrainState.create(model.apply, params, train.adam(1e-3), jax.random.key(0))
    step, _ = train.make_time_domain_steps(
        model, donate_state=True, compute_dtype=jnp.bfloat16
    )
    state, loss = step(state, mix, sources, lengths)
    state, loss = step(state, mix, sources, lengths)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, mix, sources, lengths)
    float(loss)  # host fetch forces the chain
    return batch * seconds * iters / (time.perf_counter() - t0)


def main() -> None:
    import jax.numpy as jnp

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    blstm_bf16 = bench_blstm(compute_dtype=jnp.bfloat16)
    blstm_fp32 = bench_blstm(compute_dtype=None)
    tasnet_w16 = bench_tasnet(win=16)
    tasnet_w32 = bench_tasnet(win=32)
    tasnet_w16_pallas = bench_tasnet(win=16, kernel="pallas")
    tasnet_w32_pallas = bench_tasnet(win=32, kernel="pallas")
    tasnet_train = bench_tasnet_train()

    print(
        json.dumps(
            {
                "metric": "separation_throughput",
                "value": round(blstm_bf16, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(blstm_bf16 / 100.0, 4),
                "extra": {
                    "blstm_fp32_x_realtime": round(blstm_fp32, 2),
                    "tasnet_bf16_win16_x_realtime": round(tasnet_w16, 2),
                    "tasnet_bf16_win32_x_realtime": round(tasnet_w32, 2),
                    "tasnet_pallas_win16_x_realtime": round(tasnet_w16_pallas, 2),
                    "tasnet_pallas_win32_x_realtime": round(tasnet_w32_pallas, 2),
                    "tasnet_train_bf16_audio_s_per_s": round(tasnet_train, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
