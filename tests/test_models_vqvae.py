"""VQ layer semantics and VQ-VAE topology tests (param counts pinned)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.models import (
    VectorQuantizer,
    VqVaeCodebook,
    VqVaeGumbel,
    VqVaeT2,
    VqVaeT3,
    gumbel_softmax,
    nearest_code_indices,
)


def n_params(tree) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


class TestVectorQuantizer:
    def _init(self, d=4, k=8):
        vq = VectorQuantizer(num_embeddings=k, embedding_dim=d)
        x = jnp.zeros((2, 3, d))
        params = vq.init(jax.random.key(0), x)
        return vq, params

    def test_picks_nearest_code(self):
        vq, params = self._init()
        codebook = params["params"]["embeddings"]  # [D, K]
        # inputs exactly equal to codes 2 and 5 → quantized output equals input
        x = jnp.stack([codebook[:, 2], codebook[:, 5]])[None]  # [1, 2, D]
        q, aux = vq.apply(params, x)
        np.testing.assert_allclose(np.asarray(q), np.asarray(x), atol=1e-6)
        assert float(aux) < 1e-10

    def test_nearest_code_indices_brute_force(self):
        rng = np.random.default_rng(0)
        flat = rng.standard_normal((10, 4)).astype(np.float32)
        cb = rng.standard_normal((4, 16)).astype(np.float32)
        got = np.asarray(nearest_code_indices(jnp.asarray(flat), jnp.asarray(cb)))
        want = np.argmin(
            ((flat[:, :, None] - cb[None, :, :]) ** 2).sum(axis=1), axis=1
        )
        np.testing.assert_array_equal(got, want)

    def test_straight_through_gradient(self):
        vq, params = self._init()
        x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 2, 4)), jnp.float32)

        def f(x):
            q, _ = vq.apply(params, x)
            return jnp.sum(q * 2.0)

        grads = jax.grad(f)(x)
        # straight-through: dq/dx == identity ⇒ grad is exactly 2 everywhere
        np.testing.assert_allclose(np.asarray(grads), 2.0, atol=1e-6)

    def test_codebook_gets_gradient_through_aux_loss(self):
        vq, params = self._init()
        x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 5, 4)), jnp.float32)

        def f(params):
            _, aux = vq.apply(params, x)
            return aux

        g = jax.grad(f)(params)["params"]["embeddings"]
        assert np.abs(np.asarray(g)).max() > 0


def test_gumbel_softmax_statistics():
    logits = jnp.asarray([[0.0, 2.0, 0.0, 0.0]])
    samples = [
        np.asarray(gumbel_softmax(logits, jax.random.key(i), hard=True))
        for i in range(200)
    ]
    counts = np.stack(samples).sum(axis=0)[0]
    assert counts.sum() == 200
    assert counts[1] > 100  # the high-logit class dominates


def test_gumbel_hard_straight_through_grad():
    logits = jnp.asarray([[0.5, -0.2, 1.0]])

    def f(logits):
        return jnp.sum(gumbel_softmax(logits, jax.random.key(0), hard=True) * jnp.asarray([1.0, 2.0, 3.0]))

    g = jax.grad(f)(logits)
    assert np.all(np.isfinite(np.asarray(g))) and np.abs(np.asarray(g)).max() > 0


class TestTopologies:
    def test_gumbel_vae_param_count_matches_reference(self):
        # `vq-vae_for_1d_data.ipynb cell 22` records 5,148,897 params
        model = VqVaeGumbel(latent_dim=1024)
        params = model.init(
            {"params": jax.random.key(0), "gumbel": jax.random.key(1)},
            jnp.zeros((1, 64, 1)),
        )
        assert n_params(params) == 5_148_897

    def test_t3_param_count_matches_reference(self):
        # `_t3 cell 34` records 193,000 params
        model = VqVaeT3()
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 40)))
        assert n_params(params) == 193_000

    @pytest.mark.slow
    def test_gumbel_vae_shapes_and_determinism(self):
        model = VqVaeGumbel(latent_dim=32)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 1)), jnp.float32)
        params = model.init({"params": jax.random.key(0), "gumbel": jax.random.key(1)}, x)
        y, aux = model.apply(params, x, rngs={"gumbel": jax.random.key(2)})
        assert y.shape == (2, 64, 1)
        assert len(aux) == 1 and float(aux[0]) >= 0
        # predict mode needs no rng and is deterministic
        y1, _ = model.apply(params, x, deterministic=True)
        y2, _ = model.apply(params, x, deterministic=True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))

    @pytest.mark.slow
    def test_codebook_v2_shapes(self):
        model = VqVaeCodebook()
        x = jnp.zeros((2, 12, 40))
        params = model.init(jax.random.key(0), x)
        y, aux = model.apply(params, x)
        assert y.shape == (2, 12, 40)
        assert len(aux) == 2

    def test_t2_shapes_stride_roundtrip(self):
        model = VqVaeT2()
        x = jnp.zeros((2, 16, 40))  # K multiple of 4
        params = model.init(jax.random.key(0), x)
        y, aux = model.apply(params, x)
        assert y.shape == (2, 16, 40)

    def test_t3_tokenizer_interface(self):
        model = VqVaeT3()
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 40)), jnp.float32)
        params = model.init(jax.random.key(0), x)
        codes = model.apply(params, x, method=VqVaeT3.codes)
        assert codes.shape == (2, 2)  # K/8
        assert codes.dtype in (jnp.int32, jnp.int64)

    @pytest.mark.slow
    def test_t3_training_reduces_loss(self):
        from speech_separation_tpu import train

        model = VqVaeT3(embedding_dim=8, num_embeddings=16)
        rng = jax.random.key(0)
        gen = np.random.default_rng(0)
        x = jnp.asarray(gen.standard_normal((2, 16, 40)), jnp.float32) * 0.1
        targets = x.reshape(2, -1, 1)

        params = model.init(rng, x)["params"]
        state = train.TrainState.create(model.apply, params, train.nadam(1e-3), rng)

        def loss_flat(preds, t):
            from speech_separation_tpu.losses import summed_squared_error

            return summed_squared_error(preds.reshape(preds.shape[0], -1, 1), t)

        train_step, eval_step = train.make_vae_steps(model, loss_flat)
        first = float(eval_step(state, x, targets)[0])
        for _ in range(30):
            state, loss, recon = train_step(state, x, targets)
        last = float(eval_step(state, x, targets)[0])
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.8


def test_gumbel_vae_schedule_kwargs():
    """tau / kl_scale accept traced scalars; kl_scale=0 zeroes the KL aux;
    a higher temperature flattens the sample distribution. Plumbed through
    ``make_vae_steps(schedule=...)`` so one compiled program anneals the
    whole run (the from-scratch recipe; see codec_quality_run.py)."""
    from speech_separation_tpu import train
    from speech_separation_tpu.losses import summed_squared_error

    model = VqVaeGumbel(latent_dim=16)
    rng = jax.random.key(0)
    gen = np.random.default_rng(0)
    x = jnp.asarray(gen.standard_normal((2, 128, 1)), jnp.float32) * 0.1
    params = model.init({"params": rng, "gumbel": jax.random.key(1)}, x)

    # kl_scale=0 removes the aux term exactly
    _, aux0 = model.apply(params, x, rngs={"gumbel": jax.random.key(2)}, kl_scale=jnp.asarray(0.0))
    _, aux1 = model.apply(params, x, rngs={"gumbel": jax.random.key(2)}, kl_scale=jnp.asarray(1.0))
    assert float(aux0[0]) == 0.0 and float(aux1[0]) > 0.0

    # hot tau -> flatter samples than cold tau (same rng)
    def peak(tau):
        sample = model.apply(
            params, x, rngs={"gumbel": jax.random.key(3)},
            temperature=jnp.asarray(tau), method=lambda m, v, **kw: m.gumbel(
                m.encode_logits(v), **kw),
        )
        return float(jnp.mean(jnp.max(sample, axis=-1)))
    assert peak(5.0) < peak(0.1)

    # schedule plumbs traced step -> kwargs inside the jitted train step
    def sched(step):
        s = step.astype(jnp.float32)
        return {"temperature": 0.5 + 1.5 * jnp.clip(1.0 - s / 10.0, 0.0, 1.0),
                "kl_scale": jnp.clip(s / 10.0, 0.0, 1.0)}

    state = train.TrainState.create(model.apply, params["params"], train.adam(1e-3, grad_clip_norm=5.0), rng)
    train_step, eval_step = train.make_vae_steps(model, summed_squared_error, schedule=sched)
    for _ in range(3):
        state, loss, _ = train_step(state, x, x)
    assert np.isfinite(float(loss))
    # eval stays schedule-free/deterministic
    assert np.isfinite(float(eval_step(state, x, x)[0]))


@pytest.mark.slow
def test_gumbel_vae_training_reduces_loss():
    from speech_separation_tpu import train
    from speech_separation_tpu.losses import summed_squared_error

    model = VqVaeGumbel(latent_dim=16)
    rng = jax.random.key(0)
    gen = np.random.default_rng(0)
    x = jnp.asarray(gen.standard_normal((2, 128, 1)), jnp.float32) * 0.1

    params = model.init({"params": rng, "gumbel": jax.random.key(1)}, x)["params"]
    state = train.TrainState.create(model.apply, params, train.adam(1e-3), rng)
    train_step, eval_step = train.make_vae_steps(model, summed_squared_error)
    first = float(eval_step(state, x, x)[0])
    for _ in range(25):
        state, loss, recon = train_step(state, x, x)
    last = float(eval_step(state, x, x)[0])
    assert np.isfinite(first) and last < first
