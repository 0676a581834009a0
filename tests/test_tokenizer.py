"""Tokenizer workflow: skip-free RVQ codec, token layout, prior, sampling.

Covers the pipeline the reference sketches but never finishes
(`vq-vae_for_1d_data.ipynb cell 24` + `Untitled.ipynb cells 1-4`):
codes that fully determine reconstruction, a transformer prior over them,
and audio sampled from the prior.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu import train
from speech_separation_tpu.models import CodePrior, VqVaeT3Tok
from speech_separation_tpu.models.vq import ResidualVectorQuantizer
from speech_separation_tpu.tokenizer import (
    TokenLayout,
    TokenWindowLoader,
    code_metrics,
    encode_split,
    make_prior_steps,
    sample_codes,
)

SMALL = dict(embedding_dim=8, num_embeddings=16, skip_embeddings=16,
             deep_depth=2, skip_depth=2, skip_pq=2)


def _init_codec(rng=0, **kw):
    model = VqVaeT3Tok(**{**SMALL, **kw})
    params = model.init(jax.random.key(rng), jnp.zeros((1, 16, 40)))["params"]
    return model, params


class TestResidualVQ:
    def test_roundtrip_and_stagewise_refinement(self):
        model = ResidualVectorQuantizer(num_embeddings=32, embedding_dim=8, depth=3)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 8)), jnp.float32)
        params = model.init(jax.random.key(0), x)["params"]
        q, aux = model.apply({"params": params}, x)
        assert q.shape == x.shape and np.isfinite(float(aux))
        codes = model.apply({"params": params}, x, method=ResidualVectorQuantizer.codes)
        assert codes.shape == (64, 3)
        # lookup from codes reproduces the quantized output exactly
        looked = ResidualVectorQuantizer.lookup(params["embeddings"], codes)
        np.testing.assert_allclose(np.asarray(looked), np.asarray(q), atol=1e-6)
        # each extra stage reduces quantization error (on average)
        errs = []
        for d in (1, 2, 3):
            partial = ResidualVectorQuantizer.lookup(
                params["embeddings"][:d], codes[:, :d]
            )
            errs.append(float(jnp.mean((partial - x) ** 2)))
        assert errs[2] <= errs[1] <= errs[0]

    def test_product_quantization_streams(self):
        model = ResidualVectorQuantizer(num_embeddings=16, embedding_dim=8, depth=2, pq=2)
        x = jnp.asarray(np.random.default_rng(2).standard_normal((32, 8)), jnp.float32)
        params = model.init(jax.random.key(0), x)["params"]
        assert params["embeddings"].shape == (2, 2, 4, 16)  # [depth, pq, D/pq, K]
        q, aux = model.apply({"params": params}, x)
        codes = model.apply({"params": params}, x, method=ResidualVectorQuantizer.codes)
        assert codes.shape == (32, 4)  # depth·pq streams, stage-major
        looked = ResidualVectorQuantizer.lookup(params["embeddings"], codes)
        np.testing.assert_allclose(np.asarray(looked), np.asarray(q), atol=1e-6)

    def test_straight_through_gradient(self):
        model = ResidualVectorQuantizer(num_embeddings=8, embedding_dim=4, depth=2)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((16, 4)), jnp.float32)
        params = model.init(jax.random.key(0), x)["params"]

        def f(x):
            q, aux = model.apply({"params": params}, x)
            return jnp.sum(q)

        g = jax.grad(f)(x)
        np.testing.assert_allclose(np.asarray(g), 1.0)  # identity pass-through


class TestT3TokCodec:
    def test_codes_fully_determine_reconstruction(self):
        """decode_codes(*codes(x)) must equal the forward reconstruction —
        the decoder sees only quantized latents (tolerance covers XLA fusion
        reassociation between the two compiled graphs, ~1e-8)."""
        model, params = _init_codec()
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 40)), jnp.float32)
        recon, aux = model.apply({"params": params}, x)
        deep, skip = model.apply({"params": params}, x, method=VqVaeT3Tok.codes)
        assert deep.shape == (2, 2, 2) and skip.shape == (2, 8, 4)  # K/8, K/2 × streams
        from_codes = model.apply(
            {"params": params}, deep, skip, method=VqVaeT3Tok.decode_codes
        )
        np.testing.assert_allclose(np.asarray(recon), np.asarray(from_codes), atol=1e-6)
        assert len(aux) == 2  # two RVQ aux losses

    def test_trains_on_fixture_batch(self, fixture_root):
        from speech_separation_tpu.data import VaeLoader
        from speech_separation_tpu.losses import summed_squared_error

        loader = VaeLoader(
            fixture_root / "tr", batch_size=2, stacked=True, stride_alignment=8
        )
        batch = next(iter(loader))
        model, params = _init_codec()
        state = train.TrainState.create(model.apply, params, train.nadam(1e-3), jax.random.key(0))
        loss_fn = lambda preds, t: summed_squared_error(
            preds.reshape(preds.shape[0], -1, 1), t
        )
        train_step, eval_step = train.make_vae_steps(model, loss_fn)
        args = (jnp.asarray(batch.inputs), jnp.asarray(batch.targets))
        first = float(eval_step(state, *args)[0])
        for _ in range(10):
            state, loss, recon = train_step(state, *args)
        last = float(eval_step(state, *args)[0])
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first


class TestTokenLayout:
    LAYOUT = TokenLayout(deep_vocab=16, skip_vocab=16, deep_depth=2, skip_depth=2)

    def test_geometry(self):
        assert self.LAYOUT.group == 2 + 4 * 2
        assert self.LAYOUT.vocab == 2 * 16 + 2 * 16
        # segments: positions 0,1 deep stages; then alternating skip stages
        assert self.LAYOUT.segment(0) == (0, 16)
        assert self.LAYOUT.segment(1) == (16, 16)
        assert self.LAYOUT.segment(2) == (32, 16)
        assert self.LAYOUT.segment(3) == (48, 16)
        assert self.LAYOUT.segment(4) == (32, 16)
        assert self.LAYOUT.segment(self.LAYOUT.group) == (0, 16)  # wraps

    def test_roundtrip(self):
        gen = np.random.default_rng(1)
        deep = jnp.asarray(gen.integers(0, 16, (3, 6, 2)), jnp.int32)
        skip = jnp.asarray(gen.integers(0, 16, (3, 24, 2)), jnp.int32)
        tokens = self.LAYOUT.interleave(deep, skip)
        assert tokens.shape == (3, 6 * 10)
        d2, s2 = self.LAYOUT.deinterleave(tokens)
        np.testing.assert_array_equal(np.asarray(d2), np.asarray(deep))
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(skip))
        # every token sits inside its position's segment
        table = self.LAYOUT.segment_table()
        arr = np.asarray(tokens)
        for p in range(self.LAYOUT.group):
            off, size = table[p]
            col = arr[:, p :: self.LAYOUT.group]
            assert (col >= off).all() and (col < off + size).all()

    def test_depth1_layout(self):
        layout = TokenLayout(deep_vocab=16, skip_vocab=16)
        deep = jnp.asarray(np.arange(6).reshape(1, 6) % 16, jnp.int32)
        skip = jnp.asarray(np.arange(24).reshape(1, 24) % 16, jnp.int32)
        tokens = layout.interleave(deep, skip)
        assert tokens.shape == (1, 30)
        d, s = layout.deinterleave(tokens)
        np.testing.assert_array_equal(np.asarray(d)[..., 0], np.asarray(deep))
        np.testing.assert_array_equal(np.asarray(s)[..., 0], np.asarray(skip))

    def test_shape_validation(self):
        with pytest.raises(ValueError, match="skip shape"):
            self.LAYOUT.interleave(
                jnp.zeros((1, 4, 2), jnp.int32), jnp.zeros((1, 15, 2), jnp.int32)
            )
        with pytest.raises(ValueError, match="not a multiple"):
            self.LAYOUT.deinterleave(jnp.zeros((1, 7), jnp.int32))


def test_code_metrics():
    m = code_metrics(np.zeros(100, np.int32), 16)
    assert m["perplexity"] == 1.0 and m["usage"] == 1 / 16
    m = code_metrics(np.arange(16), 16)
    assert abs(m["perplexity"] - 16.0) < 0.01 and m["usage"] == 1.0


def test_token_window_loader_batching():
    windows = np.arange(50).reshape(10, 5)
    loader = TokenWindowLoader(windows, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2 and all(b.shape == (4, 5) for b in batches)
    # short input: single ragged batch
    short = TokenWindowLoader(windows[:2], batch_size=4)
    assert next(iter(short)).shape == (2, 5)


def test_encode_split_produces_valid_windows(fixture_root):
    from speech_separation_tpu.data import VaeLoader

    model, params = _init_codec()
    layout = TokenLayout.for_codec(model)
    loader = VaeLoader(fixture_root / "tr", batch_size=2, stacked=True, stride_alignment=8)
    windows = encode_split(model, params, loader, seq_len=2 * layout.group)
    assert windows.ndim == 2 and windows.shape[1] == 2 * layout.group
    assert windows.shape[0] >= 4
    table = layout.segment_table()
    for p in range(layout.group):
        off, size = table[p]
        col = windows[:, p :: layout.group]
        assert (col >= off).all() and (col < off + size).all()


class TestPrior:
    @pytest.mark.slow
    def test_learns_pattern_and_samples_grammar(self):
        """A tiny prior memorises a repeating token pattern; sampling at low
        temperature reproduces it and always respects the stream grammar."""
        layout = TokenLayout(deep_vocab=8, skip_vocab=8)
        group = np.asarray([3, 8 + 1, 8 + 5, 8 + 2, 8 + 7])  # 1 deep + 4 skip
        tokens = jnp.asarray(np.tile(group, (4, 6)), jnp.int32)  # [4, 30]

        model = CodePrior(num_codes=layout.vocab, dim=32, depth=1, num_heads=2, max_distance=4)
        params = model.init(jax.random.key(0), tokens)["params"]
        state = train.TrainState.create(model.apply, params, train.adam(3e-3), jax.random.key(0))
        train_step, eval_step = make_prior_steps(model, donate_state=False)
        first = float(eval_step(state, tokens))
        for _ in range(150):
            state, loss = train_step(state, tokens)
        last = float(eval_step(state, tokens))
        assert last < first * 0.2, (first, last)

        sampled = sample_codes(
            model, state.params, num_groups=4, rng=jax.random.key(1),
            layout=layout, temperature=0.1,
        )
        arr = np.asarray(sampled)[0]
        assert arr.shape == (20,)
        table = layout.segment_table()
        for p in range(layout.group):
            off, size = table[p]
            col = arr[p :: layout.group]
            assert (col >= off).all() and (col < off + size).all()
        # memorised pattern dominates at low temperature
        assert (arr == np.tile(group, 4)).mean() > 0.8

    def test_sampled_codes_decode_to_audio(self):
        model, params = _init_codec()
        layout = TokenLayout.for_codec(model)
        prior = CodePrior(num_codes=layout.vocab, dim=16, depth=1, num_heads=2, max_distance=4)
        pp = prior.init(jax.random.key(0), jnp.zeros((1, layout.group), jnp.int32))["params"]
        tokens = sample_codes(
            prior, pp, num_groups=2, rng=jax.random.key(0), layout=layout
        )
        deep, skip = layout.deinterleave(tokens)
        frames = model.apply({"params": params}, deep, skip, method=VqVaeT3Tok.decode_codes)
        wav = np.asarray(frames).reshape(-1)
        assert wav.shape == (2 * 8 * 40,)  # groups × frames/group × frame
        assert np.isfinite(wav).all()


@pytest.mark.slow
def test_prior_cli_workflow(fixture_root, tmp_path, capsys):
    """train t3tok codec → codec-encode/decode from codes alone →
    prior-train → prior-sample, all through the CLI."""
    from speech_separation_tpu import cli

    def run(argv):
        cli.main(argv)
        return capsys.readouterr().out.strip().splitlines()

    codec_dir = tmp_path / "codec"
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"embedding_dim": 8, "num_embeddings": 16,
                               "skip_embeddings": 16, "seed": 0}))
    run(["train", "--config", str(cfg), "--workload", "vqvae", "--variant", "t3tok",
         "--data-root", str(fixture_root), "--epochs", "1",
         "--checkpoint-dir", str(codec_dir)])

    wav_in = next((fixture_root / "tt" / "s1").glob("*.wav"))
    codes_path = tmp_path / "codes.npz"
    out = run(["codec-encode", "--checkpoint-dir", str(codec_dir),
               "--wav", str(wav_in), "--out", str(codes_path)])
    enc = json.loads(out[-1])
    assert enc["deep"]["perplexity"] > 0 and enc["skip"]["usage"] > 0
    assert len(enc["deep_shape"]) == 3  # [B, G, depth]

    wav_out = tmp_path / "decoded.wav"
    out = run(["codec-decode", "--checkpoint-dir", str(codec_dir),
               "--codes", str(codes_path), "--out", str(wav_out)])
    assert wav_out.exists() and json.loads(out[-1])["samples"] > 0

    prior_dir = tmp_path / "prior"
    pcfg = tmp_path / "pcfg.json"
    pcfg.write_text(json.dumps({"dim": 16, "depth": 1, "num_heads": 2,
                                "seq_len": 36, "batch_size": 4, "seed": 0}))
    out = run(["prior-train", "--config", str(pcfg), "--codec-dir", str(codec_dir),
               "--data-root", str(fixture_root), "--epochs", "1",
               "--checkpoint-dir", str(prior_dir)])
    summary = json.loads(out[-1])
    assert np.isfinite(summary["best_val_loss"])
    assert summary["deep_codebook"]["perplexity"] > 0
    assert summary["vocab"] == 2 * 16 + 4 * 16

    sample_path = tmp_path / "sample.wav"
    out = run(["prior-sample", "--prior-dir", str(prior_dir),
               "--out", str(sample_path), "--seconds", "0.2", "--seed", "1"])
    info = json.loads(out[-1])
    layout_group = 2 + 4 * 4  # deep streams + ratio × skip streams (depth·pq)
    assert sample_path.exists()
    assert info["samples"] == info["tokens"] // layout_group * 8 * 40
