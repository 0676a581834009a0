"""DSP op parity tests: JAX STFT/iSTFT vs the numpy golden oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from speech_separation_tpu import ops

from golden_dsp import golden_istft, golden_stft, golden_synthesis_window

RNG = np.random.default_rng(0)


def test_blackman_matches_numpy():
    for m in (16, 256, 257, 400):
        np.testing.assert_allclose(ops.blackman(m), np.blackman(m), atol=1e-12)


@pytest.mark.parametrize("size,shift", [(256, 128), (512, 128), (1024, 256)])
def test_synthesis_window_matches_golden(size, shift):
    np.testing.assert_allclose(
        ops.biorthogonal_synthesis_window(size, shift),
        golden_synthesis_window(size, shift),
        rtol=1e-12,
    )


def test_frame_overlap_add_adjoint_shapes():
    x = RNG.standard_normal((3, 2, 1024)).astype(np.float32)
    frames = ops.frame_signal(jnp.asarray(x), 256, 128)
    assert frames.shape == (3, 2, ops.num_frames(1024, 256, 128), 256)
    back = ops.overlap_add(frames, 128)
    assert back.shape[-1] == 1024


def test_frame_signal_values():
    x = np.arange(10.0)
    frames = np.asarray(ops.frame_signal(jnp.asarray(x), 4, 2))
    expected = np.stack([x[i : i + 4] for i in range(0, 7, 2)])
    np.testing.assert_array_equal(frames, expected)


@pytest.mark.parametrize("samples", [1000, 8000, 12345])
@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_stft_matches_golden(samples, method):
    x = RNG.standard_normal(samples).astype(np.float32)
    got = np.asarray(ops.stft(jnp.asarray(x), 256, 128, method=method))
    want = golden_stft(x, 256, 128)
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got.real, want.real, atol=2e-4 * scale)
    np.testing.assert_allclose(got.imag, want.imag, atol=2e-4 * scale)


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_istft_matches_golden(method):
    x = RNG.standard_normal(4000)
    spec = golden_stft(x, 256, 128)
    got = np.asarray(ops.istft(jnp.asarray(spec.astype(np.complex64)), 256, 128, method=method))
    want = golden_istft(spec, 256, 128)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4 * np.abs(x).max())


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_roundtrip_perfect_reconstruction(method):
    samples = 8 * 1024
    x = RNG.standard_normal(samples).astype(np.float32)
    spec = ops.stft(jnp.asarray(x), 256, 128, method=method)
    back = np.asarray(ops.istft(spec, 256, 128, method=method))
    # reconstruction covers the original samples (plus trailing frame pad)
    np.testing.assert_allclose(back[:samples], x, atol=5e-4)


def test_stft_batched_matches_single():
    xs = RNG.standard_normal((4, 3000)).astype(np.float32)
    batched = np.asarray(ops.stft(jnp.asarray(xs), 256, 128))
    for i, x in enumerate(xs):
        single = np.asarray(ops.stft(jnp.asarray(x), 256, 128))
        np.testing.assert_allclose(batched[i], single, atol=1e-4)


def test_stft_frame_count_matches_reference_formula():
    # reference: frames = ceil((samples_with_fading - size + shift) / shift)
    for samples in (100, 8000, 74388):
        n = ops.stft_frame_count(samples, 256, 128, fading=True)
        assert n == int(np.ceil((samples + 2 * 128 - 256 + 128) / 128))
