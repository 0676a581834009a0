"""Headline benchmark: wave-to-wave separation throughput per chip.

Runs the full fused pipeline (STFT → uPIT BLSTM (496×3) masks → phase
reapply → iSTFT) on batches of 8 s utterances and reports separated audio
seconds per wall-clock second per chip, i.e. the ×-real-time factor.

The reference publishes no throughput numbers (its notebooks are toy runs);
``BASELINE.json``'s north star is ≥100× real time per chip, so
``vs_baseline = value / 100``.

Prints exactly one JSON line.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from speech_separation_tpu.models import UPitBlstm
    from speech_separation_tpu.ops.features import magnitude_angle
    from speech_separation_tpu.ops.stft import istft, stft

    sample_rate = 8000
    batch, seconds = 128, 8
    samples = sample_rate * seconds
    size, shift, num_speakers = 256, 128, 2

    model = UPitBlstm()
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 129)))["params"]

    @jax.jit
    def separate(params, mix):
        spec = stft(mix, size, shift)
        mag, cos, sin = magnitude_angle(spec)
        # bf16 mask network (serving precision; DSP stays fp32 — see
        # RESULTS.md for the ≤0.5% output delta measurement)
        bf16_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        preds = model.apply(
            {"params": bf16_params}, mag.astype(jnp.bfloat16), deterministic=True
        ).astype(jnp.float32)
        f = mag.shape[-1]
        wavs = []
        for s in range(num_speakers):
            est = preds[..., s * f : (s + 1) * f]
            wavs.append(istft(jax.lax.complex(est * cos, est * sin), size, shift))
        return jnp.stack(wavs, axis=1)

    mix = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, samples)).astype(np.float32) * 0.1
    )

    def run_chained(iters: int) -> float:
        """Serialize iterations via a data dependency (feed output back as
        input) so async runtimes can't overlap or lazily defer the work, and
        finish with a host fetch. Returns elapsed seconds."""
        cur = mix
        t0 = time.perf_counter()
        for _ in range(iters):
            cur = separate(params, cur)[:, 0, :]
        np.asarray(cur[0, :8])  # tiny fetch forces completion
        return time.perf_counter() - t0

    run_chained(2)  # warmup / compile
    iters = 10
    elapsed = run_chained(iters)

    audio_seconds = batch * seconds * iters
    x_realtime = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "separation_throughput",
                "value": round(x_realtime, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(x_realtime / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
