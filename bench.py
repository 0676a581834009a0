"""Headline benchmark: wave-to-wave separation throughput per chip.

Runs the full fused pipeline (STFT → uPIT BLSTM (496×3) masks → phase
reapply → iSTFT) on batches of 8 s utterances and reports separated audio
seconds per wall-clock second per chip, i.e. the ×-real-time factor.

The reference publishes no throughput numbers (its notebooks are toy runs);
``BASELINE.json``'s north star is ≥100× real time per chip, so
``vs_baseline = value / 100``.

Measurement protocol (round 3): every variant is compiled+warmed first,
then ``TRIALS`` timing rounds run INTERLEAVED across all variants in this
one process — chip warm-up drift on the axon relay is ±30% in the first
minutes, so medians over interleaved rounds are reported (with a min-max
band in ``extra.bands``), never a single lucky pass. ``floor_ok`` compares
every median against a pinned regression floor (~60% of the round-2
captures) so the driver run doubles as a perf regression gate.

Prints exactly one JSON line. The headline metric is the bf16 BLSTM
pipeline; the ``extra`` field carries the fp32 BLSTM number (precision
context) and the Conv-TasNet serving/training numbers (best-quality model).
"""

import json
import statistics
import time

import numpy as np

TRIALS = 5

# regression floors: ~60% of the BENCH_r02 driver captures — loose enough
# for the documented ±30% chip variance, tight enough to catch a real cliff
FLOORS = {
    "blstm_bf16_x_realtime": 16000,
    "blstm_fp32_x_realtime": 12000,
    "tasnet_bf16_win16_x_realtime": 4000,
    "tasnet_bf16_win32_x_realtime": 7500,
    "tasnet_pallas_win16_x_realtime": 5300,
    "tasnet_pallas_win32_x_realtime": 9200,
    "tasnet_train_bf16_audio_s_per_s": 1200,
    "blstm_train_pallas_audio_s_per_s": 5000,
}


def _chained_run(fn, first_arg, iters, extract):
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
    """Returns a measure() closure: audio-seconds separated per wall second.

    batch sweep (bf16): 128 → 26,263×, 256 → 27,221×, 512 → 27,369×;
    256 takes the +4% without doubling latency/memory again.
    """
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
    _chained_run(separate, mix, 2, extract)  # warmup / compile

    def measure():
        return batch * seconds * iters / _chained_run(separate, mix, iters, extract)

    return measure


def bench_tasnet(batch=64, seconds=8, iters=5, win=16, kernel="standard"):
    """Conv-TasNet serving: bf16 convs (one-pass fp32 gLN stats).

    kernel="pallas" runs the TCN trunk as one fused Pallas program
    (ops/tcn_pallas.py): all 21 dilated blocks inside VMEM, ~26% faster
    than the XLA path at win=16. Returns a measure() closure.
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
    _chained_run(separate, mix, 2, extract)

    def measure():
        return batch * seconds * iters / _chained_run(separate, mix, iters, extract)

    return measure


def bench_tasnet_train(batch=16, seconds=4, iters=10):
    """Conv-TasNet bf16 mixed-precision train step: audio-seconds trained
    per wall second per chip (fp32 master weights, bf16 fwd/bwd).
    Returns a measure() closure (state is carried across trials)."""
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
    box = [state]
    box[0], loss = step(box[0], mix, sources, lengths)
    box[0], loss = step(box[0], mix, sources, lengths)
    float(loss)

    def measure():
        t0 = time.perf_counter()
        loss = None
        for _ in range(iters):
            box[0], loss = step(box[0], mix, sources, lengths)
        float(loss)  # host fetch forces the chain
        return batch * seconds * iters / (time.perf_counter() - t0)

    return measure


def bench_blstm_train(batch=32, seconds=8, iters=8, pallas=True):
    """Flagship uPIT BLSTM bf16 train step (STFT+PSM+fwd+PIT+bwd+Adam);
    pallas=True runs both recurrences as fused Pallas kernels
    (ops/lstm_train_pallas.py — +84% over the lax.scan path on chip).
    Returns a measure() closure."""
    import jax
    import jax.numpy as jnp

    from speech_separation_tpu import train
    from speech_separation_tpu.models import UPitBlstm
    from speech_separation_tpu.ops import stft_frame_count

    samples = 8000 * seconds
    model = UPitBlstm()
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 8, 129)))["params"]
    state = train.TrainState.create(
        model.apply, params, train.exponential_decay_adam(), rng
    )
    step, _ = train.make_upit_waveform_steps(
        model, donate_state=False, compute_dtype=jnp.bfloat16, pallas_scan=pallas
    )
    gen = np.random.default_rng(0)
    sources = jnp.asarray(gen.standard_normal((batch, 2, samples)).astype(np.float32) * 0.1)
    mix = sources.sum(axis=1)
    fl = jnp.full((batch,), stft_frame_count(samples, 256, 128), jnp.int32)
    box = [state]
    box[0], loss = step(box[0], mix, sources, fl)
    box[0], loss = step(box[0], mix, sources, fl)
    float(loss)

    def measure():
        t0 = time.perf_counter()
        loss = None
        for _ in range(iters):
            box[0], loss = step(box[0], mix, sources, fl)
        float(loss)
        return batch * seconds * iters / (time.perf_counter() - t0)

    return measure


def _device_watchdog(timeout_s: float = 600.0) -> None:
    """Fail fast with one parseable JSON line if the TPU backend never
    answers (the axon relay has shown multi-hour outages): a daemon thread
    hard-exits unless device init completes within ``timeout_s``. JAX's
    backend init is not interruptible in-process, hence os._exit."""
    import os
    import threading

    ready = threading.Event()

    def _watch() -> None:
        if not ready.wait(timeout_s):
            print(
                json.dumps(
                    {
                        "metric": "separation_throughput",
                        "value": 0.0,
                        "unit": "x_realtime_per_chip",
                        "vs_baseline": 0.0,
                        "floor_ok": False,
                        "extra": {"error": f"TPU backend unreachable after {timeout_s:.0f}s"},
                    }
                ),
                flush=True,
            )
            os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()
    import jax

    jax.devices()  # blocks until the backend answers (or the watchdog fires)
    ready.set()


def main() -> None:
    _device_watchdog()

    import jax.numpy as jnp

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    measures = {
        "blstm_bf16_x_realtime": bench_blstm(compute_dtype=jnp.bfloat16),
        "blstm_fp32_x_realtime": bench_blstm(compute_dtype=None),
        "tasnet_bf16_win16_x_realtime": bench_tasnet(win=16),
        "tasnet_bf16_win32_x_realtime": bench_tasnet(win=32),
        "tasnet_pallas_win16_x_realtime": bench_tasnet(win=16, kernel="pallas"),
        "tasnet_pallas_win32_x_realtime": bench_tasnet(win=32, kernel="pallas"),
        "tasnet_train_bf16_audio_s_per_s": bench_tasnet_train(),
        "blstm_train_pallas_audio_s_per_s": bench_blstm_train(pallas=True),
    }

    samples: dict[str, list[float]] = {k: [] for k in measures}
    for _ in range(TRIALS):  # interleaved rounds: variance hits all variants
        for name, measure in measures.items():
            samples[name].append(measure())

    med = {k: statistics.median(v) for k, v in samples.items()}
    bands = {k: [round(min(v), 2), round(max(v), 2)] for k, v in samples.items()}
    floor_ok = all(med[k] >= FLOORS[k] for k in FLOORS)
    headline = med["blstm_bf16_x_realtime"]

    print(
        json.dumps(
            {
                "metric": "separation_throughput",
                "value": round(headline, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(headline / 100.0, 4),
                "floor_ok": floor_ok,
                "extra": {
                    **{k: round(v, 2) for k, v in med.items() if k != "blstm_bf16_x_realtime"},
                    "trials": TRIALS,
                    "aggregation": "median_interleaved",
                    "bands": bands,
                    "floors": FLOORS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
