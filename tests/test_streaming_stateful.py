"""Exact stateful streaming (causal Conv-TasNet) vs the offline forward.

The whole point of ``separate/streaming_stateful.py`` is EXACTNESS: carried
conv/cLN/OLA state must make the hop-by-hop emissions equal ``model.apply``
on the full (hop-padded) waveform to float tolerance — not "within a dB".
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.models import ConvTasNet
from speech_separation_tpu.separate.streaming_stateful import (
    CausalStreamingSeparator,
    stateful_stream_separate,
)

TINY = dict(num_speakers=2, enc_dim=32, win=16, bottleneck=16, hidden=32,
            kernel=3, blocks=3, repeats=2, causal=True)


def _offline(model, params, mix_padded):
    return np.asarray(model.apply({"params": params}, jnp.asarray(mix_padded)))


@pytest.mark.parametrize("samples,hop", [(4000, 400), (3300, 512), (2048, 16)])
@pytest.mark.slow
def test_stateful_stream_matches_offline(samples, hop):
    model = ConvTasNet(**TINY)
    rng = np.random.default_rng(1)
    mix = (rng.standard_normal((1, samples)) * 0.1).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(mix[:, :1024]))["params"]

    est, lat = stateful_stream_separate(model, params, mix[0], hop)
    n_hops = -(-samples // hop)
    padded = np.zeros((1, n_hops * hop), np.float32)
    padded[:, :samples] = mix
    want = _offline(model, params, padded)[0][:, :samples]
    assert est.shape == want.shape
    np.testing.assert_allclose(est, want, rtol=1e-4, atol=1e-5)
    assert len(lat) == n_hops


@pytest.mark.slow
def test_stateful_stream_batched_and_incremental():
    """Batched pushes, state on device between hops, flush tail exact."""
    model = ConvTasNet(**TINY)
    rng = np.random.default_rng(2)
    b, samples, hop = 3, 1600, 160
    mix = (rng.standard_normal((b, samples)) * 0.1).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(mix[:, :512]))["params"]

    sep = CausalStreamingSeparator(model, params, hop)
    outs = [sep.push(mix[:, i * hop : (i + 1) * hop]) for i in range(samples // hop)]
    outs.append(sep.flush())
    est = np.concatenate(outs, axis=2)[:, :, :samples]
    want = _offline(model, params, mix)
    np.testing.assert_allclose(est, want, rtol=1e-4, atol=1e-5)


def test_stateful_requires_causal():
    model = ConvTasNet(**{**TINY, "causal": False})
    with pytest.raises(ValueError):
        CausalStreamingSeparator(model, {}, 160)


def test_stateful_rejects_bf16_module():
    """The exactness contract is fp32; a bf16 module's offline forward would
    differ from this engine's fp32 compute — reject instead of drifting."""
    model = ConvTasNet(**TINY, dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="fp32"):
        CausalStreamingSeparator(model, {}, 160)


def test_stateful_lifecycle_guards():
    """flush-before-push, double-flush, and push-after-flush raise clearly
    instead of crashing mid-jnp or silently corrupting the stream."""
    model = ConvTasNet(**TINY)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.key(0), jnp.zeros((1, 320)))["params"]
    sep = CausalStreamingSeparator(model, params, 160)
    with pytest.raises(RuntimeError, match="before any push"):
        sep.flush()
    sep.push(rng.standard_normal(160).astype(np.float32))
    sep.flush()
    with pytest.raises(RuntimeError, match="twice"):
        sep.flush()
    with pytest.raises(RuntimeError, match="after flush"):
        sep.push(rng.standard_normal(160).astype(np.float32))
