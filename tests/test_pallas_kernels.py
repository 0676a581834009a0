"""Pallas kernel tests (interpreter mode on the CPU test mesh)."""

import numpy as np

import jax
import jax.numpy as jnp

from speech_separation_tpu.models import VectorQuantizer
from speech_separation_tpu.ops.vq_pallas import nearest_code_pallas

RNG = np.random.default_rng(0)


def test_nearest_code_pallas_matches_brute_force():
    flat = RNG.standard_normal((300, 48)).astype(np.float32)
    cb = RNG.standard_normal((48, 200)).astype(np.float32)
    got = np.asarray(nearest_code_pallas(jnp.asarray(flat), jnp.asarray(cb)))
    want = np.argmin(((flat[:, :, None] - cb[None]) ** 2).sum(axis=1), axis=1)
    np.testing.assert_array_equal(got, want)


def test_nearest_code_pallas_unaligned_shapes():
    # N, D, K all deliberately off the tile sizes
    flat = RNG.standard_normal((37, 13)).astype(np.float32)
    cb = RNG.standard_normal((13, 65)).astype(np.float32)
    got = np.asarray(nearest_code_pallas(jnp.asarray(flat), jnp.asarray(cb)))
    want = np.argmin(((flat[:, :, None] - cb[None]) ** 2).sum(axis=1), axis=1)
    np.testing.assert_array_equal(got, want)


def test_stft_pallas_matches_matmul_path():
    import jax.numpy as jnp

    from speech_separation_tpu.ops import stft
    from speech_separation_tpu.ops.stft_pallas import stft_pallas

    x = RNG.standard_normal((2, 20000)).astype(np.float32)
    want = np.asarray(stft(jnp.asarray(x), 256, 128, method="matmul"))
    for double_buffer in (False, True):
        got = np.asarray(stft_pallas(jnp.asarray(x), double_buffer=double_buffer))
        assert got.shape == want.shape
        np.testing.assert_allclose(got.real, want.real, atol=1e-4)
        np.testing.assert_allclose(got.imag, want.imag, atol=1e-4)


def test_stft_pallas_single_sequence_and_odd_length():
    import jax.numpy as jnp

    from speech_separation_tpu.ops import stft
    from speech_separation_tpu.ops.stft_pallas import stft_pallas

    x = RNG.standard_normal(12345).astype(np.float32)
    got = np.asarray(stft_pallas(jnp.asarray(x), tile_frames=32))
    want = np.asarray(stft(jnp.asarray(x), 256, 128, method="matmul"))
    np.testing.assert_allclose(np.abs(got), np.abs(want), atol=1e-4)


def test_vector_quantizer_pallas_path_matches_xla():
    import jax

    vq_x = VectorQuantizer(num_embeddings=32, embedding_dim=16, use_pallas=False)
    vq_p = VectorQuantizer(num_embeddings=32, embedding_dim=16, use_pallas=True)
    x = jnp.asarray(RNG.standard_normal((2, 10, 16)), jnp.float32)
    params = vq_x.init(jax.random.key(0), x)
    qx, ax = vq_x.apply(params, x)
    qp, ap = vq_p.apply(params, x)
    np.testing.assert_allclose(np.asarray(qx), np.asarray(qp), atol=1e-6)
    np.testing.assert_allclose(float(ax), float(ap), rtol=1e-6)


class TestLstmPallas:
    def test_matches_scan_lstm(self):
        from speech_separation_tpu.models.blstm import LSTM
        from speech_separation_tpu.ops.lstm_pallas import lstm_pallas

        model = LSTM(features=12)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((3, 37, 7)), jnp.float32
        )
        params = model.init(jax.random.key(0), x)["params"]
        want = model.apply({"params": params}, x)
        xw = jnp.einsum("btf,fg->btg", x, params["kernel"]) + params["bias"]
        got = lstm_pallas(
            xw, params["recurrent_kernel"], tile_t=8, interpret=True,
            compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_upit_forward_matches_module(self):
        from speech_separation_tpu.models import UPitBlstm
        from speech_separation_tpu.models.upit import upit_blstm_pallas_forward

        model = UPitBlstm(input_size=9, output_size=9, hidden=8, num_layers=2)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 21, 9)), jnp.float32
        )
        params = model.init(jax.random.key(0), x)["params"]
        want = model.apply({"params": params}, x, deterministic=True)
        got = upit_blstm_pallas_forward(
            params, x, num_layers=2, compute_dtype=jnp.float32, tile_t=8,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
