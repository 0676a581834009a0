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


class TestLongSeparate:
    """The sequence-parallel product path (VERDICT round-1 item 5):
    `separate --long-utterance` / separate.make_long_separate_fn."""

    def _mix(self, samples):
        gen = np.random.default_rng(3)
        s = gen.standard_normal((1, 2, samples)).astype(np.float32) * 0.1
        return jnp.asarray(s.sum(axis=1))

    def test_full_mask_output_identical_across_device_counts(self):
        """chunked_mask=False: the mask net sees the full frame sequence, so
        8-way sharded output ≡ the same program on a 1-device mesh."""
        import jax as _jax

        from speech_separation_tpu.models import UPitBlstm
        from speech_separation_tpu.separate import make_long_separate_fn

        model = UPitBlstm(input_size=129, output_size=129, hidden=8, num_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 4, 129)))["params"]
        samples = 8 * SHIFT * 8
        mix = self._mix(samples)

        mesh8 = _mesh()
        one = parallel.make_mesh(data=1, model=1, devices=_jax.devices()[:1])
        out8 = np.asarray(make_long_separate_fn(model, mesh8, SIZE, SHIFT)(params, mix))
        out1 = np.asarray(make_long_separate_fn(model, one, SIZE, SHIFT)(params, mix))
        assert out8.shape == (1, 2, samples)
        np.testing.assert_allclose(out8, out1, atol=1e-5)

    def test_chunked_mask_exact_for_framewise_model(self):
        """chunked_mask=True is exact when the mask net has no cross-frame
        state — validates the shard_map wiring incl. phase reapply seams."""
        import flax.linen as nn

        import jax as _jax

        from speech_separation_tpu.separate import make_long_separate_fn

        class FramewiseMask(nn.Module):
            @nn.compact
            def __call__(self, mag, deterministic=True):
                m = nn.sigmoid(nn.Dense(2 * mag.shape[-1], name="mask")(mag))
                tiled = jnp.concatenate([mag, mag], axis=-1)
                return m * tiled

        model = FramewiseMask()
        params = model.init(jax.random.key(0), jnp.zeros((1, 4, 129)))["params"]
        samples = 8 * SHIFT * 8
        mix = self._mix(samples)

        mesh8 = _mesh()
        one = parallel.make_mesh(data=1, model=1, devices=_jax.devices()[:1])
        out8 = np.asarray(
            make_long_separate_fn(model, mesh8, SIZE, SHIFT, chunked_mask=True)(params, mix)
        )
        out1 = np.asarray(
            make_long_separate_fn(model, one, SIZE, SHIFT, chunked_mask=True)(params, mix)
        )
        np.testing.assert_allclose(out8, out1, atol=1e-5)

    @pytest.mark.slow
    def test_separate_long_directory_writes_wavs(self, fixture_root, tmp_path):
        from speech_separation_tpu.models import UPitBlstm
        from speech_separation_tpu.separate import separate_long_directory

        model = UPitBlstm(input_size=129, output_size=129, hidden=8, num_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 4, 129)))["params"]
        written = separate_long_directory(
            model, params, _mesh(), fixture_root / "tt", tmp_path / "sep"
        )
        assert len(written) == 8
        from speech_separation_tpu.data.audio_io import read_wav

        wav, sr = read_wav(written[0])
        assert sr == 8000 and np.isfinite(wav).all() and wav.size > 0
