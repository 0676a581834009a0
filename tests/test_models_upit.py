"""Model structure tests: shapes, parameter-count parity with the reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.models import BiLSTM, LSTM, UPitBlstm, UPitConv


def n_params(tree) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


def test_lstm_shapes_and_param_count():
    model = LSTM(features=7)
    x = jnp.zeros((2, 5, 3))
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 5, 7)
    # Keras LSTM count: 4 * H * (in + H + 1)
    assert n_params(params) == 4 * 7 * (3 + 7 + 1)


def test_bilstm_shapes_and_param_count():
    model = BiLSTM(features=6)
    x = jnp.zeros((2, 5, 4))
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 5, 12)
    assert n_params(params) == 2 * 4 * 6 * (4 + 6 + 1)


def test_bilstm_backward_direction_sees_future():
    # An impulse at the last timestep must influence the first output frame
    # through the backward direction only.
    model = BiLSTM(features=4)
    x = jnp.zeros((1, 6, 2)).at[0, -1, 0].set(1.0)
    params = model.init(jax.random.key(1), x)
    y = np.asarray(model.apply(params, x))
    fwd_first, bwd_first = y[0, 0, :4], y[0, 0, 4:]
    assert np.allclose(fwd_first, model.apply(params, jnp.zeros((1, 6, 2)))[0, 0, :4])
    assert not np.allclose(bwd_first, model.apply(params, jnp.zeros((1, 6, 2)))[0, 0, 4:])


@pytest.mark.slow
def test_upit_conv_param_count_matches_reference():
    # Reference `Raw_with_Convlayer.ipynb cell 15` records 1,099,289 params.
    model = UPitConv()
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 40)))
    assert n_params(params) == 1_099_289


def test_upit_blstm_param_count_matches_keras_formula():
    model = UPitBlstm()
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 129)))
    dense_in = 129 * 496 + 496
    bilstm1 = 2 * 4 * 496 * (496 + 496 + 1)
    bilstm23 = 2 * (2 * 4 * 496 * (992 + 496 + 1))
    heads = 2 * (992 * 129 + 129)
    assert n_params(params) == dense_in + bilstm1 + bilstm23 + heads


@pytest.mark.slow
def test_upit_blstm_output_shape_and_mask_semantics():
    model = UPitBlstm(input_size=9, output_size=9, hidden=8, num_layers=1)
    x = jnp.ones((2, 6, 9))
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 6, 18)
    # relu masks × magnitude: zero magnitude in → zero out
    y0 = model.apply(params, jnp.zeros((2, 6, 9)))
    assert np.allclose(np.asarray(y0), 0.0)


def test_upit_dropout_active_in_training_mode():
    model = UPitBlstm(input_size=5, output_size=5, hidden=8, num_layers=1)
    x = jnp.ones((1, 4, 5))
    params = model.init(jax.random.key(0), x)
    a = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.key(1)})
    b = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_bf16_train_step_tracks_fp32():
    """Mixed-precision train step (bf16 network compute, fp32 master weights)
    must keep fp32 parameters/optimizer state and track the fp32 loss."""
    from speech_separation_tpu import train
    from speech_separation_tpu.ops import stft_frame_count

    model = UPitBlstm(input_size=129, output_size=129, hidden=8, num_layers=1)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 4, 129)))["params"]
    gen = np.random.default_rng(0)
    sources = jnp.asarray(gen.standard_normal((2, 2, 4000)).astype(np.float32) * 0.1)
    mix = sources.sum(axis=1)
    fl = jnp.full((2,), stft_frame_count(4000, 256, 128), jnp.int32)

    losses = {}
    for name, dtype in (("fp32", None), ("bf16", jnp.bfloat16)):
        state = train.TrainState.create(
            model.apply, params, train.exponential_decay_adam(), rng
        )
        step, eval_step = train.make_upit_waveform_steps(
            model, donate_state=False, compute_dtype=dtype
        )
        for _ in range(5):
            state, loss = step(state, mix, sources, fl)
        # params stay fp32 master weights
        assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))
        losses[name] = float(eval_step(state, mix, sources, fl))
    assert np.isfinite(losses["bf16"])
    # same trajectory to within mixed-precision noise
    assert abs(losses["bf16"] - losses["fp32"]) / abs(losses["fp32"]) < 0.05
