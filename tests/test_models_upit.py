"""Model structure tests: shapes, parameter-count parity with the reference."""

import numpy as np

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
