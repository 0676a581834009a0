"""One-command smoke test on real TPU hardware.

Runs the pieces the CPU test mesh cannot exercise natively: the full fused
separation pipeline, the Pallas kernels (compiled, not interpreted), and a
train step — printing one OK/FAIL line per stage. Useful after environment
or dependency changes; the CI-style suite (`pytest tests/`) intentionally
runs everything on the virtual CPU mesh instead.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def stage(name):
    def wrap(fn):
        t0 = time.time()
        try:
            fn()
            print(f"OK   {name} ({time.time() - t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001 — smoke test reports and continues
            print(f"FAIL {name}: {type(exc).__name__}: {exc}")

    return wrap


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    @stage("entry() forward (STFT→BLSTM→iSTFT)")
    def _():
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(np.asarray(out)).all()

    @stage("pallas fused STFT == XLA matmul path")
    def _():
        from speech_separation_tpu.ops import stft
        from speech_separation_tpu.ops.stft_pallas import stft_pallas

        x = jnp.asarray(rng.standard_normal((2, 20000)).astype(np.float32))
        a = np.asarray(jnp.real(stft_pallas(x)))
        b = np.asarray(jnp.real(stft(x, 256, 128, method="matmul")))
        assert np.abs(a - b).max() < 1e-4

    @stage("pallas VQ nearest-code == brute force")
    def _():
        from speech_separation_tpu.ops.vq_pallas import nearest_code_pallas

        flat = rng.standard_normal((512, 64)).astype(np.float32)
        cb = rng.standard_normal((64, 256)).astype(np.float32)
        got = np.asarray(nearest_code_pallas(jnp.asarray(flat), jnp.asarray(cb)))
        want = np.argmin(((flat[:, :, None] - cb[None]) ** 2).sum(1), axis=1)
        assert (got == want).all()

    @stage("fused train step reduces loss")
    def _():
        from speech_separation_tpu import train
        from speech_separation_tpu.models import UPitBlstm
        from speech_separation_tpu.ops import stft_frame_count

        model = UPitBlstm(hidden=64, num_layers=1, dropout_rate=0.1)
        key = jax.random.key(0)
        params = model.init(key, jnp.zeros((1, 8, 129)))["params"]
        state = train.TrainState.create(
            model.apply, params, train.exponential_decay_adam(), key
        )
        step, evl = train.make_upit_waveform_steps(model)
        sources = jnp.asarray(rng.standard_normal((2, 2, 16000)).astype(np.float32) * 0.1)
        mix = sources.sum(axis=1)
        fl = jnp.full((2,), stft_frame_count(16000, 256, 128), jnp.int32)
        first = float(evl(state, mix, sources, fl))
        for _ in range(25):
            state, loss = step(state, mix, sources, fl)
        last = float(evl(state, mix, sources, fl))
        assert np.isfinite(last) and last < first, (first, last)

    @stage("pallas BiLSTM train recurrence == scan (eval loss)")
    def _():
        from speech_separation_tpu import train
        from speech_separation_tpu.models import UPitBlstm
        from speech_separation_tpu.ops import stft_frame_count

        model = UPitBlstm(hidden=32, num_layers=2)
        key = jax.random.key(1)
        params = model.init(key, jnp.zeros((1, 8, 129)))["params"]
        state = train.TrainState.create(model.apply, params, train.adam(1e-3), key)
        _, ev_ref = train.make_upit_waveform_steps(model, donate_state=False)
        _, ev_pal = train.make_upit_waveform_steps(
            model, donate_state=False, pallas_scan=True
        )
        sources = jnp.asarray(rng.standard_normal((2, 2, 16000)).astype(np.float32) * 0.1)
        mix = sources.sum(axis=1)
        fl = jnp.full((2,), stft_frame_count(16000, 256, 128), jnp.int32)
        a = float(ev_ref(state, mix, sources, fl))
        b = float(ev_pal(state, mix, sources, fl))
        assert abs(a - b) / abs(a) < 2e-3, (a, b)


if __name__ == "__main__":
    main()
