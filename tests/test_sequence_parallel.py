"""Time-sharded STFT/iSTFT vs the unsharded ops (8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu import ops, parallel
from speech_separation_tpu.parallel.sequence import sharded_istft, sharded_stft

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU test mesh"
)

RNG = np.random.default_rng(0)
SIZE, SHIFT = 256, 128
K = SIZE // SHIFT


def _mesh(n_model=8):
    return parallel.make_mesh(data=8 // n_model, model=n_model)


def test_sharded_stft_matches_fading_frames():
    mesh = _mesh()
    samples = 8 * SHIFT * 16
    x = RNG.standard_normal((2, samples)).astype(np.float32)
    got = np.asarray(sharded_stft(mesh, jnp.asarray(x), SIZE, SHIFT))
    bins = SIZE // 2 + 1
    got_c = got[..., :bins] + 1j * got[..., bins:]
    want = np.asarray(ops.stft(jnp.asarray(x), SIZE, SHIFT, method="matmul"))
    # sharded frames == fading frames with the k-1 leading fade frames dropped
    np.testing.assert_allclose(got_c, want[:, K - 1 : K - 1 + got_c.shape[1]], atol=1e-4)


def test_sharded_roundtrip_reconstructs_interior():
    mesh = _mesh()
    samples = 8 * SHIFT * 8
    x = RNG.standard_normal((1, samples)).astype(np.float32)
    spec = sharded_stft(mesh, jnp.asarray(x), SIZE, SHIFT)
    back = np.asarray(sharded_istft(mesh, spec, SIZE, SHIFT))
    assert back.shape == (1, samples)
    halo = SIZE - SHIFT
    np.testing.assert_allclose(back[0, halo:], x[0, halo:], atol=5e-4)


def test_sharded_stft_on_data_axis():
    # the same ops work over the `data` axis of a (4, 2) mesh
    mesh = parallel.make_mesh(data=4, model=2)
    samples = 4 * SHIFT * 8
    x = RNG.standard_normal((2, samples)).astype(np.float32)
    spec = sharded_stft(mesh, jnp.asarray(x), SIZE, SHIFT, axis="data")
    back = np.asarray(sharded_istft(mesh, spec, SIZE, SHIFT, axis="data"))
    halo = SIZE - SHIFT
    np.testing.assert_allclose(back[:, halo:], x[:, halo:], atol=5e-4)


def test_rejects_non_divisible_lengths():
    mesh = _mesh()
    with pytest.raises(ValueError):
        sharded_stft(mesh, jnp.zeros((1, 1000)), SIZE, SHIFT)
