"""Conv-TasNet separator and time-domain SI-SDR PIT loss tests."""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu import train
from speech_separation_tpu.losses import pit_si_sdr_loss
from speech_separation_tpu.metrics import si_sdr_np
from speech_separation_tpu.models import ConvTasNet

RNG = np.random.default_rng(0)

TINY = dict(enc_dim=32, bottleneck=16, hidden=32, blocks=3, repeats=1)


def test_pit_si_sdr_matches_scalar_formula():
    b, s, t = 2, 2, 2000
    refs = RNG.standard_normal((b, s, t)).astype(np.float32)
    est = refs + 0.1 * RNG.standard_normal((b, s, t)).astype(np.float32)
    lengths = np.array([2000, 1500], np.int32)
    got = float(
        pit_si_sdr_loss(jnp.asarray(est), jnp.asarray(refs), jnp.asarray(lengths))
    )
    # brute force with the host formula
    total = 0.0
    for i in range(b):
        n = lengths[i]
        best = -np.inf
        for perm in itertools.permutations(range(s)):
            score = np.mean(
                [si_sdr_np(refs[i, p, :n], est[i, j, :n]) for j, p in enumerate(perm)]
            )
            best = max(best, score)
        total += best
    np.testing.assert_allclose(got, -total / b, rtol=1e-3)


def test_pit_si_sdr_permutation_invariance():
    refs = RNG.standard_normal((1, 2, 1000)).astype(np.float32)
    est = refs[:, ::-1].copy()  # swapped but perfect
    lengths = jnp.asarray([1000])
    loss = float(pit_si_sdr_loss(jnp.asarray(est), jnp.asarray(refs), lengths))
    assert loss < -60  # ≈ perfect reconstruction in dB


def test_conv_tasnet_shapes():
    model = ConvTasNet(**TINY)
    mix = jnp.zeros((2, 4000))
    params = model.init(jax.random.key(0), mix)
    out = model.apply(params, mix)
    assert out.shape == (2, 2, 4000)


def test_conv_tasnet_trains():
    model = ConvTasNet(**TINY)
    gen = np.random.default_rng(1)
    # two separable synthetic sources: disjoint frequency bands
    t = np.arange(4000) / 8000.0
    s1 = np.sin(2 * np.pi * 200 * t)[None] * 0.3
    s2 = np.sin(2 * np.pi * 1500 * t)[None] * 0.3
    sources = jnp.asarray(np.stack([s1, s2], axis=1), jnp.float32)  # [1, 2, T]
    mix = sources.sum(axis=1)
    lengths = jnp.asarray([4000])

    rng = jax.random.key(0)
    params = model.init(rng, mix)["params"]
    state = train.TrainState.create(model.apply, params, train.adam(1e-3), rng)
    train_step, eval_step = train.make_time_domain_steps(model)
    first = float(eval_step(state, mix, sources, lengths))
    for _ in range(40):
        state, loss = train_step(state, mix, sources, lengths)
    last = float(eval_step(state, mix, sources, lengths))
    # loss is negative SI-SDR (dB): must improve markedly on separable tones
    assert last < first - 3.0


def test_conv_tasnet_bf16_serving_close_to_fp32():
    """bf16 compute dtype (serving precision) must track fp32 outputs:
    the gLN statistics stay fp32, so masks shift only at bf16 rounding."""
    model = ConvTasNet(**TINY)
    gen = np.random.default_rng(2)
    mix = jnp.asarray(gen.standard_normal((2, 4000)).astype(np.float32) * 0.1)
    params = model.init(jax.random.key(0), mix)["params"]
    fp32 = model.apply({"params": params}, mix)
    bf16 = model.clone(dtype=jnp.bfloat16).apply({"params": params}, mix)
    assert bf16.dtype == jnp.float32  # output cast back
    # relative output error small vs signal scale
    denom = float(jnp.sqrt(jnp.mean(fp32**2))) + 1e-12
    rel = float(jnp.sqrt(jnp.mean((bf16 - fp32) ** 2))) / denom
    assert rel < 0.1, rel


def test_time_domain_bf16_training_step_tracks_fp32():
    """compute_dtype=bf16 training (fp32 master weights, bf16 fwd/bwd): the
    first-step loss matches fp32 closely and the step still learns."""
    model = ConvTasNet(**TINY)
    t = np.arange(4000) / 8000.0
    s1 = np.sin(2 * np.pi * 200 * t)[None] * 0.3
    s2 = np.sin(2 * np.pi * 1500 * t)[None] * 0.3
    sources = jnp.asarray(np.stack([s1, s2], axis=1), jnp.float32)
    mix = sources.sum(axis=1)
    lengths = jnp.asarray([4000])

    rng = jax.random.key(0)
    params = model.init(rng, mix)["params"]

    def run(compute_dtype, steps=15):
        state = train.TrainState.create(model.apply, params, train.adam(1e-3), rng)
        train_step, eval_step = train.make_time_domain_steps(
            model, donate_state=False, compute_dtype=compute_dtype
        )
        first = float(eval_step(state, mix, sources, lengths))
        for _ in range(steps):
            state, _ = train_step(state, mix, sources, lengths)
        return first, float(eval_step(state, mix, sources, lengths))

    f32_first, f32_last = run(None)
    bf_first, bf_last = run(jnp.bfloat16)
    assert abs(bf_first - f32_first) < 0.5  # same starting objective
    assert bf_last < bf_first - 1.0  # still learns
    # master weights stay fp32 throughout
    state = train.TrainState.create(model.apply, params, train.adam(1e-3), rng)
    ts, _ = train.make_time_domain_steps(
        model, donate_state=False, compute_dtype=jnp.bfloat16
    )
    new_state, _ = ts(state, mix, sources, lengths)
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(new_state.params))


def test_remat_blocks_same_params_and_outputs():
    """remat=True (backward rematerialization) must not change the param
    tree or the forward function — checkpoints are interchangeable."""
    base = ConvTasNet(**TINY)
    rem = ConvTasNet(**TINY, remat=True)
    mix = jnp.asarray(np.random.default_rng(3).standard_normal((2, 4000)).astype(np.float32) * 0.1)
    params = base.init(jax.random.key(0), mix)["params"]
    p2 = rem.init(jax.random.key(0), mix)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(p2)
    a = base.apply({"params": params}, mix)
    b = rem.apply({"params": params}, mix)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # gradients agree too (remat only changes the schedule)
    def loss(m, p):
        return jnp.sum(m.apply({"params": p}, mix) ** 2)
    ga = jax.grad(lambda p: loss(base, p))(params)
    gb = jax.grad(lambda p: loss(rem, p))(params)
    for x, y in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_causal_tasnet_is_causal():
    """causal=True: no output sample before a future perturbation changes
    (up to the encoder/decoder window lookahead); the gLN model, whose
    global norms couple all timesteps, must bleed backwards (control)."""
    m = ConvTasNet(num_speakers=2, win=16, kernel=3, causal=True, **TINY)
    x = jnp.asarray(RNG.standard_normal((1, 2048)).astype(np.float32) * 0.1)
    params = m.init(jax.random.key(0), x)["params"]
    y1 = m.apply({"params": params}, x)
    x2 = x.at[:, 1200:].add(1.0)
    y2 = m.apply({"params": params}, x2)
    diff = np.abs(np.asarray(y1 - y2))
    t_safe = 1200 - 16  # one encoder window of lookahead allowed
    assert float(diff[:, :, :t_safe].max()) == 0.0
    assert float(diff[:, :, 1200:].max()) > 1e-3  # future did change

    g = ConvTasNet(num_speakers=2, win=16, kernel=3, causal=False, **TINY)
    pg = g.init(jax.random.key(0), x)["params"]
    gd = np.abs(np.asarray(g.apply({"params": pg}, x) - g.apply({"params": pg}, x2)))
    assert float(gd[:, :, :t_safe].max()) > 1e-4  # gLN is non-causal


def test_cumulative_layer_norm_matches_prefix_gln():
    """cLN at step t ≡ gLN computed over the prefix x[:, :t+1, :]."""
    from speech_separation_tpu.models.tasnet import (
        _CumulativeLayerNorm,
        _GlobalLayerNorm,
    )

    x = jnp.asarray(RNG.standard_normal((2, 7, 5)).astype(np.float32))
    cln = _CumulativeLayerNorm()
    params = cln.init(jax.random.key(1), x)["params"]
    got = np.asarray(cln.apply({"params": params}, x))
    gln = _GlobalLayerNorm()
    gparams = gln.init(jax.random.key(1), x[:, :1])["params"]
    for t in range(x.shape[1]):
        want_t = np.asarray(gln.apply({"params": gparams}, x[:, : t + 1]))[:, -1]
        np.testing.assert_allclose(got[:, t], want_t, rtol=1e-4, atol=1e-5)


def test_causal_tasnet_trains():
    m = ConvTasNet(num_speakers=2, win=16, kernel=3, causal=True, **TINY)
    t = 1600
    sources = jnp.asarray(RNG.standard_normal((2, 2, t)).astype(np.float32) * 0.1)
    mix = sources.sum(axis=1)
    lengths = jnp.asarray([t, t - 200], jnp.int32)
    params = m.init(jax.random.key(0), mix)["params"]
    state = train.TrainState.create(m.apply, params, train.adam(1e-3), jax.random.key(0))
    step, _ = train.make_time_domain_steps(m, donate_state=False)
    losses = []
    for _ in range(5):
        state, loss = step(state, mix, sources, lengths)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_causal_tasnet_bf16_step_tracks_fp32():
    """The corpus causal stage trains compute_dtype=bf16 (CAUSAL=1 in
    scripts/tasnet_corpus_run.py); the mixed-precision step on the causal
    topology (cLN stats stay fp32) must track the fp32 step closely."""
    m = ConvTasNet(num_speakers=2, win=16, kernel=3, causal=True, **TINY)
    t = 1600
    sources = jnp.asarray(RNG.standard_normal((2, 2, t)).astype(np.float32) * 0.1)
    mix = sources.sum(axis=1)
    lengths = jnp.asarray([t, t - 200], jnp.int32)
    params_host = jax.tree.map(np.asarray, m.init(jax.random.key(0), mix)["params"])

    def run(compute_dtype):
        state = train.TrainState.create(
            m.apply, jax.tree.map(jnp.asarray, params_host),
            train.adam(1e-3), jax.random.key(0),
        )
        step, _ = train.make_time_domain_steps(
            m, donate_state=False, compute_dtype=compute_dtype
        )
        losses = []
        for _ in range(4):
            state, loss = step(state, mix, sources, lengths)
            losses.append(float(loss))
        return losses

    fp32 = run(None)
    bf16 = run(jnp.bfloat16)
    assert np.isfinite(bf16).all()
    assert bf16[-1] < bf16[0]
    # same trajectory within mixed-precision tolerance
    np.testing.assert_allclose(bf16, fp32, rtol=0.05)
