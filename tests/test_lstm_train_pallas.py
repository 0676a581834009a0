"""Fused Pallas BiLSTM training kernel: gradient parity with lax.scan.

``bilstm_train_pallas`` (ops/lstm_train_pallas.py) must compute the same
function AND the same gradients as ``models/blstm.BiLSTM`` (the lax.scan
path) over the identical stacked-direction param layout — forward kernel,
reverse-time backward kernel, and the XLA-side weight-gradient matmuls all
pinned here in fp32 interpret mode (bf16 is the production dtype; fp32
isolates the math from storage rounding).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.models.blstm import BiLSTM
from speech_separation_tpu.ops.lstm_train_pallas import bilstm_train_pallas


def _snr_db(ref, est):
    ref = np.asarray(ref, np.float64)
    est = np.asarray(est, np.float64)
    return 10 * np.log10(np.square(ref).sum() / max(np.square(ref - est).sum(), 1e-30))


@pytest.mark.parametrize(
    "b,t,f,h,tile_t",
    [
        (3, 37, 12, 20, 8),   # ragged time + non-multiple-of-8 batch
        (2, 16, 8, 16, 16),   # exactly one time block
        (4, 50, 129, 24, 16), # production-ish feature width
    ],
)
@pytest.mark.slow
def test_bilstm_train_grads_match_scan(b, t, f, h, tile_t):
    model = BiLSTM(h)
    x = jax.random.normal(jax.random.key(0), (b, t, f), jnp.float32) * 0.5
    params = model.init(jax.random.key(1), x)["params"]
    k = params["cells"]["kernel"]
    u = params["cells"]["recurrent_kernel"]
    bz = params["cells"]["bias"]

    ref = model.apply({"params": params}, x)
    y = bilstm_train_pallas(x, k, u, bz, tile_t, True, jnp.float32)
    assert y.shape == ref.shape
    assert _snr_db(ref, y) > 120.0

    w = jnp.asarray(
        np.random.default_rng(2).standard_normal(ref.shape).astype(np.float32)
    )

    def loss_ref(x, k, u, bz):
        pr = {"cells": {"kernel": k, "recurrent_kernel": u, "bias": bz}}
        return jnp.sum(model.apply({"params": pr}, x) * w)

    def loss_pal(x, k, u, bz):
        out = bilstm_train_pallas(x, k, u, bz, tile_t, True, jnp.float32)
        return jnp.sum(out.astype(jnp.float32) * w)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, k, u, bz)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(x, k, u, bz)
    for name, a, b_ in zip(["dx", "dkernel", "drecurrent", "dbias"], gr, gp):
        assert _snr_db(a, b_) > 110.0, (name, _snr_db(a, b_))


@pytest.mark.slow
def test_upit_pallas_scan_step_matches_xla():
    """Full train-step integration: eval losses identical (no dropout), and
    a short deterministic-free training run stays on the same trajectory
    scale as the XLA path. Param pytree / checkpoints unchanged."""
    from speech_separation_tpu import train
    from speech_separation_tpu.models import UPitBlstm
    from speech_separation_tpu.ops import stft_frame_count

    model = UPitBlstm(hidden=24, num_layers=2)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 4, 129)))["params"]
    state = train.TrainState.create(model.apply, params, train.adam(1e-3), rng)

    gen = np.random.default_rng(0)
    b, samples = 2, 4000
    sources = jnp.asarray(gen.standard_normal((b, 2, samples)).astype(np.float32) * 0.1)
    mix = sources.sum(axis=1)
    fl = jnp.full((b,), stft_frame_count(samples, 256, 128), jnp.int32)

    _, ev_ref = train.make_upit_waveform_steps(model, donate_state=False)
    _, ev_pal = train.make_upit_waveform_steps(
        model, donate_state=False, pallas_scan=True
    )
    a = float(ev_ref(state, mix, sources, fl))
    c = float(ev_pal(state, mix, sources, fl))
    assert abs(a - c) / abs(a) < 1e-5, (a, c)

    ts, _ = train.make_upit_waveform_steps(
        model, donate_state=False, pallas_scan=True
    )
    s, first = state, None
    for _ in range(8):
        s, loss = ts(s, mix, sources, fl)
        first = float(loss) if first is None else first
    assert float(loss) < first, (first, float(loss))
