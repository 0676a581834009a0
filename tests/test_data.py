"""Data layer tests: TFRecord codec interop, loaders, feature parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu import data, ops
from speech_separation_tpu.ops.features import psm_features


def test_crc32c_known_vectors():
    # Catalogued crc32c test vectors (rfc 3720 appendix B.4 style)
    from speech_separation_tpu.data.tfrecord import crc32c

    assert crc32c(b"") == 0
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_tfrecord_roundtrip(tmp_path):
    records = [b"hello", b"", b"x" * 1000]
    path = tmp_path / "t.tfrecords"
    data.write_tfrecord_file(path, records)
    back = list(data.read_tfrecord_file(path, verify_crc=True))
    assert back == records


def test_sequence_example_roundtrip():
    feats = {
        "inputs": [np.arange(4, dtype=np.float32), np.ones(4, dtype=np.float32)],
        "length": [np.asarray([2.0], dtype=np.float32)],
        "name": ["utt_0"],
    }
    payload = data.build_sequence_example(feats)
    parsed = data.parse_sequence_example(payload)
    np.testing.assert_array_equal(parsed["inputs"][0], feats["inputs"][0])
    np.testing.assert_array_equal(parsed["inputs"][1], feats["inputs"][1])
    assert parsed["length"][0][0] == 2.0
    assert parsed["name"][0] == b"utt_0"


def test_reads_reference_tfrecords(reference_root):
    record_dir = reference_root / "mycode" / "tfrecords" / "tt_tfrecord"
    paths = sorted(record_dir.glob("*.tfrecords"))
    assert len(paths) == 4
    payloads = list(data.read_tfrecord_file(paths[0], verify_crc=True))
    assert len(payloads) == 1
    feats = data.parse_sequence_example(payloads[0])
    inputs = np.stack(feats["inputs"])
    labels = np.stack(feats["labels"])
    assert inputs.shape[1] == 258 and labels.shape[1] == 258
    assert feats["length"][0][0] > 0
    assert paths[0].stem.encode() in feats["name"][0]


def test_tf_can_parse_our_records(tmp_path):
    tf = pytest.importorskip("tensorflow")
    feats = {
        "inputs": [np.asarray([1.5, -2.0], np.float32)],
        "name": ["abc"],
    }
    path = tmp_path / "interop.tfrecords"
    data.write_tfrecord_file(path, [data.build_sequence_example(feats)])
    raw = next(iter(tf.data.TFRecordDataset(str(path))))
    _, parsed = tf.io.parse_single_sequence_example(
        raw,
        sequence_features={
            "inputs": tf.io.FixedLenSequenceFeature([2], tf.float32),
            "name": tf.io.FixedLenSequenceFeature([], tf.string),
        },
    )
    np.testing.assert_allclose(parsed["inputs"].numpy(), [[1.5, -2.0]])
    assert parsed["name"].numpy()[0] == b"abc"


def test_waveform_loader_fixture(fixture_root):
    loader = data.WaveformLoader(fixture_root / "tt", batch_size=2)
    batches = list(loader)
    assert len(batches) == 2
    batch = batches[0]
    assert batch.mix.shape[0] == 2
    assert batch.sources.shape[1] == 2
    assert batch.mix.shape[1] % 8000 == 0
    # mixture ≈ s1 + s2 for wsj0-2mix
    mix_sum = batch.sources.sum(axis=1)
    corr = np.corrcoef(batch.mix.ravel(), mix_sum.ravel())[0, 1]
    assert corr > 0.95
    assert batch.frame_lengths[0] == ops.stft_frame_count(int(batch.sample_lengths[0]), 256, 128)


def test_device_psm_matches_reference_records(fixture_root, reference_root):
    """On-device features == the reference's pre-built TFRecord features."""
    batches = data.load_tfrecord_spectrograms(
        reference_root / "mycode" / "tfrecords" / "tt_tfrecord", batch_size=4
    )
    assert len(batches) == 1
    ref = batches[0]

    loader = data.WaveformLoader(fixture_root / "tt", batch_size=4)
    wav_batch = next(iter(loader))
    # order by name to align
    order = [wav_batch.names.index(n + ".wav") for n in ref.names]
    mix = jnp.asarray(wav_batch.mix[order])
    sources = jnp.asarray(wav_batch.sources[order])
    # reference records were padded to the split max (rounded to seconds) —
    # same quantum as WaveformLoader, so shapes line up
    feats = psm_features(mix, sources)
    t = min(feats.magnitude.shape[1], ref.magnitude.shape[1])
    scale = np.abs(ref.magnitude[:, :t]).max()
    np.testing.assert_allclose(
        np.asarray(feats.magnitude)[:, :t], ref.magnitude[:, :t], atol=2e-3 * scale
    )
    np.testing.assert_allclose(
        np.asarray(feats.labels)[:, :t], ref.labels[:, :t], atol=5e-3 * scale
    )
    ref_cos = ref.cos_angle[:, :t]
    got_cos = np.asarray(feats.cos_angle)[:, :t]
    # phase only well-defined where magnitude is non-negligible
    significant = ref.magnitude[:, :t] > 1e-3 * scale
    np.testing.assert_allclose(got_cos[significant], ref_cos[significant], atol=2e-2)


def test_vae_loader_sample_level(fixture_root):
    loader = data.VaeLoader(fixture_root / "tr", batch_size=2)
    batch = next(iter(loader))
    assert batch.inputs.ndim == 3 and batch.inputs.shape[2] == 1
    assert batch.inputs.shape[1] % 8000 == 0
    peak = np.abs(batch.inputs[0, : batch.lengths[0], 0]).max()
    np.testing.assert_allclose(peak, 1.0, rtol=1e-5)


def test_vae_loader_stacked(fixture_root):
    loader = data.VaeLoader(fixture_root / "tr", batch_size=2, stacked=True)
    batch = next(iter(loader))
    b, k, l = batch.inputs.shape
    assert l == 40 and k % 4 == 0
    # frames flatten back to the target waveform
    flat = batch.inputs.reshape(b, k * l)
    np.testing.assert_allclose(flat, batch.targets[..., 0])


def test_feature_writer_roundtrips_with_reader(fixture_root, tmp_path):
    written = data.generate_split(
        fixture_root / "tt", tmp_path, data.FeatureConfig(mode="mixed")
    )
    assert len(written) == 4
    batches = data.load_tfrecord_spectrograms(tmp_path, batch_size=4)
    assert batches[0].magnitude.shape[0] == 4
    assert batches[0].labels.shape[-1] == 258


def test_feature_writer_matches_reference_records(fixture_root, reference_root, tmp_path):
    """Our offline writer reproduces the bundled records numerically."""
    data.generate_split(fixture_root / "tt", tmp_path, data.FeatureConfig(mode="mixed"))
    ours = data.load_tfrecord_spectrograms(tmp_path, batch_size=4)[0]
    ref = data.load_tfrecord_spectrograms(
        reference_root / "mycode" / "tfrecords" / "tt_tfrecord", batch_size=4
    )[0]
    order = [ours.names.index(n) for n in ref.names]
    assert ours.magnitude.shape == ref.magnitude.shape
    np.testing.assert_allclose(ours.lengths[order], ref.lengths)
    scale = np.abs(ref.magnitude).max()
    np.testing.assert_allclose(ours.magnitude[order], ref.magnitude, atol=1e-3 * scale)
    np.testing.assert_allclose(ours.labels[order], ref.labels, atol=2e-3 * scale)


def test_reads_reference_one_source_records(reference_root, fixture_root, tmp_path):
    """'signal' mode records: inputs |s| [T,129], labels ∠s [T,129]."""
    batches = data.load_tfrecord_spectrograms(
        reference_root / "mycode" / "tfrecords" / "tt_one_source_tfrecord", batch_size=8
    )
    ref = batches[0]
    assert ref.magnitude.shape[0] == 8  # 4 utts × 2 sources
    assert ref.magnitude.shape[-1] == 129
    assert ref.magnitude.min() >= 0  # magnitudes
    assert -3.2 < ref.labels.min() < -3.0  # angles in (−π, π]

    # our signal-mode writer reproduces the reference records numerically
    data.generate_split(
        fixture_root / "tt", tmp_path, data.FeatureConfig(mode="signal")
    )
    ours = data.load_tfrecord_spectrograms(tmp_path, batch_size=8)[0]
    order = [ours.names.index(n) for n in ref.names]
    scale = np.abs(ref.magnitude).max()
    np.testing.assert_allclose(ours.magnitude[order], ref.magnitude, atol=1e-3 * scale)
    np.testing.assert_allclose(ours.lengths[order], ref.lengths)


def test_reads_reference_raw_records(reference_root):
    from speech_separation_tpu.data.tfrecord import parse_sequence_example, read_tfrecord_file

    path = next(
        (reference_root / "mycode" / "tfrecords" / "tt_raw_tfrecord").glob("*.tfrecords")
    )
    feats = parse_sequence_example(next(iter(read_tfrecord_file(path))))
    inputs = np.stack(feats["inputs"])  # [T, 1] raw waveform
    labels = np.stack(feats["labels"])  # [T, 2] stacked sources
    assert inputs.shape[1] == 1 and labels.shape[1] == 2
    # mixture ≈ s1 + s2
    corr = np.corrcoef(inputs[:, 0], labels.sum(axis=1))[0, 1]
    assert corr > 0.9


def test_waveform_loader_sort_by_length(fixture_root):
    loader = data.WaveformLoader(fixture_root / "tt", batch_size=2, sort_by_length=True)
    lengths = []
    for b in loader:
        lengths.extend(b.sample_lengths.tolist())
    assert lengths == sorted(lengths)
    # shuffled variant keeps batches length-homogeneous (batch max == batch min bucket)
    sh = data.WaveformLoader(
        fixture_root / "tt", batch_size=2, sort_by_length=True, shuffle=True, seed=1
    )
    all_names = [n for b in sh for n in b.names]
    assert sorted(all_names) == sorted(loader.names)


def test_tfrecord_codec_fuzz_roundtrip():
    """Random feature dicts survive encode→decode byte-exactly."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        feats = {}
        for k in range(rng.integers(1, 4)):
            name = f"f{k}"
            if rng.random() < 0.3:
                feats[name] = [bytes(rng.integers(0, 256, rng.integers(0, 50), dtype=np.uint8))]
            else:
                feats[name] = [
                    rng.standard_normal(rng.integers(1, 40)).astype(np.float32)
                    for _ in range(rng.integers(1, 5))
                ]
        payload = data.build_sequence_example(feats)
        parsed = data.parse_sequence_example(payload)
        assert set(parsed) == set(feats)
        for name, steps in feats.items():
            for a, b in zip(steps, parsed[name]):
                if isinstance(a, bytes):
                    assert a == b
                else:
                    np.testing.assert_array_equal(a, b)


def test_transfer_int16_bit_exact_loader(fixture_root):
    """transfer_int16=True ships int16 PCM whose on-device dequantization
    (i / 32768) reproduces the fp32 loader's floats BIT-exactly — the fixture
    wavs are 16-bit PCM at the loader rate, so quantize∘decode is identity."""
    kw = dict(batch_size=2)
    for bf, bi in zip(
        data.WaveformLoader(fixture_root / "tt", **kw),
        data.WaveformLoader(fixture_root / "tt", transfer_int16=True, **kw),
    ):
        assert bi.mix.dtype == np.int16 and bi.sources.dtype == np.int16
        np.testing.assert_array_equal(bf.mix, bi.mix.astype(np.float32) / 32768.0)
        np.testing.assert_array_equal(
            bf.sources, bi.sources.astype(np.float32) / 32768.0
        )
        assert bi.mix.nbytes * 2 == bf.mix.nbytes


def test_transfer_int16_step_parity(fixture_root):
    """The jitted steps accept int16 batches transparently (trace-time dtype
    branch) and produce the same loss as the fp32 transfer path."""
    from speech_separation_tpu import train
    from speech_separation_tpu.data.packing import PackedWaveformLoader
    from speech_separation_tpu.models import UPitBlstm

    size, shift = 64, 32
    model = UPitBlstm(input_size=size // 2 + 1, output_size=size // 2 + 1,
                      hidden=16, num_layers=1)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 8, size // 2 + 1)))["params"]
    state = train.TrainState.create(model.apply, params, train.adam(1e-3), rng)
    _, eval_step = train.make_upit_waveform_steps(
        model, size=size, shift=shift, donate_state=False
    )
    kw = dict(batch_size=2, stft_size=size, stft_shift=shift)
    for bf, bi in zip(
        data.WaveformLoader(fixture_root / "tt", **kw),
        data.WaveformLoader(fixture_root / "tt", transfer_int16=True, **kw),
    ):
        lf = eval_step(state, jnp.asarray(bf.mix), jnp.asarray(bf.sources),
                       jnp.asarray(bf.frame_lengths))
        li = eval_step(state, jnp.asarray(bi.mix), jnp.asarray(bi.sources),
                       jnp.asarray(bi.frame_lengths))
        np.testing.assert_allclose(float(lf), float(li), rtol=1e-6)

    # packed loader variant: int16 rows match fp32 rows after dequantization
    pk = dict(rows_per_batch=2, row_seconds=12.0, stft_size=size, stft_shift=shift)
    for bf, bi in zip(
        PackedWaveformLoader(fixture_root / "tt", **pk),
        PackedWaveformLoader(fixture_root / "tt", transfer_int16=True, **pk),
    ):
        assert bi.mix.dtype == np.int16
        np.testing.assert_array_equal(bf.mix, bi.mix.astype(np.float32) / 32768.0)


def test_load_utterance_batch_i16_resample_fallback(fixture_root):
    """When the int16 fast path can't serve (resampling needed), the loader
    falls back to float decode + quantize — same values as quantizing the
    float batch."""
    from speech_separation_tpu.data.audio_io import quantize_i16
    from speech_separation_tpu.data.datasets import (
        load_utterance_batch,
        load_utterance_batch_i16,
    )

    names = sorted(
        p.name for p in (fixture_root / "tt" / "mix").glob("*.wav")
    )[:2]
    # 4 kHz target != the fixture's 8 kHz files → every file resamples
    f32 = load_utterance_batch(fixture_root / "tt", names, 2, 4000)
    i16 = load_utterance_batch_i16(fixture_root / "tt", names, 2, 4000)
    for (mf, sf), (mi, si) in zip(f32, i16):
        assert mi.dtype == np.int16
        np.testing.assert_array_equal(mi, quantize_i16(mf))
        for a, b in zip(sf, si):
            np.testing.assert_array_equal(b, quantize_i16(a))


def test_quantize_estimates_no_clipping():
    """Estimates above full scale survive the int16 fetch within 15-bit
    relative precision (no flat-topping — the per-signal scale absorbs the
    overshoot); in-range signals stay within ~0.5 LSB."""
    from speech_separation_tpu.ops.quant import (
        dequantize_estimates_i16,
        quantize_estimates_i16,
    )

    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, 3, 500)).astype(np.float32)
    wave[0, 0] *= 1.7  # loud estimate: would clip under round(x*32768)
    codes, scale = quantize_estimates_i16(jnp.asarray(wave))
    codes, scale = np.asarray(codes), np.asarray(scale)
    assert codes.dtype == np.int16
    assert scale.shape == (2, 3)
    back = dequantize_estimates_i16(codes, scale)
    err = np.abs(back - wave)
    tol = np.maximum(np.abs(wave).max(axis=-1, keepdims=True), 1.0) / 65534 * 1.01
    assert (err <= tol).all()
    # the loud channel really exceeded full scale and was not clipped flat
    assert np.abs(wave[0, 0]).max() > 1.0
    assert np.abs(back[0, 0]).max() == pytest.approx(np.abs(wave[0, 0]).max(), rel=1e-4)


def test_dynamic_mix_loader(fixture_root):
    """dynamic_mix: mix ≡ Σ sources exactly, fresh pairings/gains per epoch,
    epochs reproducible via set_epoch (resume support)."""
    from speech_separation_tpu.data.datasets import WaveformLoader

    loader = WaveformLoader(
        fixture_root / "tr", batch_size=2, shuffle=True, sort_by_length=True,
        dynamic_mix=True, seed=0,
    )
    b1 = list(iter(loader))
    b2 = list(iter(loader))  # epoch advanced -> new gains/pairings
    for b in b1:
        np.testing.assert_allclose(b.mix, b.sources.sum(axis=1), rtol=0, atol=1e-6)
        # every row zero-padded past its true length
        for i, n in enumerate(b.sample_lengths):
            assert np.all(b.sources[i, :, n:] == 0)
    assert any(
        a.mix.shape != b.mix.shape or not np.allclose(a.mix, b.mix)
        for a, b in zip(b1, b2)
    ), "dynamic mixing must change the mixtures across epochs"
    loader.set_epoch(0)
    b1_again = list(iter(loader))
    for a, b in zip(b1, b1_again):
        np.testing.assert_array_equal(a.mix, b.mix)


def test_dynamic_mix_loader_int16(fixture_root):
    """int16 transfer under dynamic mixing: the device-side dequantized mix
    must equal the dequantized sources' sum exactly (mix built as the int32
    sum of the quantized sources)."""
    from speech_separation_tpu.data.datasets import WaveformLoader

    loader = WaveformLoader(
        fixture_root / "tr", batch_size=2, shuffle=True, dynamic_mix=True,
        transfer_int16=True, seed=1,
    )
    for b in iter(loader):
        # mix lane is int32: the sum of two gained near-full-scale int16
        # sources can exceed ±32767 and must NOT be clipped (round-4 review)
        assert b.mix.dtype == np.int32 and b.sources.dtype == np.int16
        np.testing.assert_array_equal(b.mix, b.sources.astype(np.int32).sum(axis=1))


def test_dynamic_mix_int16_mix_survives_overflow(tmp_path):
    """Loud sources whose quantized sum exceeds int16 range: the shipped mix
    must still equal the sources' sum exactly, and the device-side dequant
    must reproduce the float DM semantics (no flat-topping)."""
    from speech_separation_tpu.data.audio_io import audiowrite
    from speech_separation_tpu.data.datasets import WaveformLoader
    from speech_separation_tpu.ops.quant import dequant_i16

    sr, n = 8000, 4000
    root = tmp_path / "tr"
    for d in ("mix", "s1", "s2"):
        (root / d).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for name in ("a.wav", "b.wav"):
        # near-full-scale square-ish sources → gained sums overflow int16
        s1 = np.sign(rng.standard_normal(n)).astype(np.float32) * 0.98
        s2 = np.sign(rng.standard_normal(n)).astype(np.float32) * 0.98
        audiowrite(s1, root / "s1" / name, sr)
        audiowrite(s2, root / "s2" / name, sr)
        audiowrite(np.clip(s1 + s2, -1, 1), root / "mix" / name, sr)

    loader = WaveformLoader(
        root, batch_size=2, shuffle=True, dynamic_mix=True,
        transfer_int16=True, seed=3,
    )
    saw_overflow = False
    for b in iter(loader):
        i32sum = b.sources.astype(np.int32).sum(axis=1)
        np.testing.assert_array_equal(b.mix, i32sum)
        saw_overflow |= bool(np.abs(i32sum).max() > 32767)
        # device-side equality: dequant(mix) ≡ Σ dequant(sources)
        import jax.numpy as jnp

        mix_dev = np.asarray(dequant_i16(jnp.asarray(b.mix)))
        src_dev = np.asarray(dequant_i16(jnp.asarray(b.sources))).sum(axis=1)
        np.testing.assert_allclose(mix_dev, src_dev, atol=1e-6)
    assert saw_overflow  # the regression regime was actually exercised


def test_time_domain_step_accepts_int32_mix_lane():
    """The jitted train step must dequantize the DM int32 mix with the same
    1/32768 scale as the int16 sources — loss ≡ the float-path loss."""
    import jax
    import jax.numpy as jnp

    from speech_separation_tpu import train
    from speech_separation_tpu.models import ConvTasNet

    model = ConvTasNet(enc_dim=16, bottleneck=8, hidden=16, blocks=2, repeats=1)
    rng = jax.random.key(0)
    params_host = jax.tree.map(
        np.asarray, model.init(rng, jnp.zeros((1, 8000)))["params"]
    )
    ts, _ = train.make_time_domain_steps(model)
    src16 = np.round(
        np.random.default_rng(0).standard_normal((2, 2, 8000)) * 3000
    ).astype(np.int16)
    mix32 = src16.astype(np.int32).sum(axis=1, dtype=np.int32)
    fl = jnp.full((2,), 8000, jnp.int32)

    def fresh():
        return train.TrainState.create(
            model.apply,
            jax.tree.map(jnp.asarray, params_host),
            train.adam(1e-3),
            jax.random.key(0),
        )

    _, loss_i = ts(fresh(), jnp.asarray(mix32), jnp.asarray(src16), fl)
    _, loss_f = ts(
        fresh(),
        jnp.asarray(mix32.astype(np.float32) / 32768.0),
        jnp.asarray(src16.astype(np.float32) / 32768.0),
        fl,
    )
    assert abs(float(loss_i) - float(loss_f)) < 1e-4


def test_dynamic_mix_int16_gained_sources_never_clip(tmp_path):
    """±gain_db on a near-full-scale source would push it past ±1 where
    quantize_i16 flat-tops; the loader must attenuate the whole item (both
    transfer paths identically) so int16 targets stay ≡ float DM targets
    (round-4 advisor)."""
    from speech_separation_tpu.data.audio_io import audiowrite
    from speech_separation_tpu.data.datasets import WaveformLoader

    sr, n = 8000, 4000
    root = tmp_path / "tr"
    for d in ("mix", "s1", "s2"):
        (root / d).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for name in ("a.wav", "b.wav"):
        # square-ish full-scale sources: any positive dB gain would clip
        s1 = np.sign(rng.standard_normal(n)).astype(np.float32) * 0.995
        s2 = np.sign(rng.standard_normal(n)).astype(np.float32) * 0.995
        audiowrite(s1, root / "s1" / name, sr)
        audiowrite(s2, root / "s2" / name, sr)
        audiowrite(np.clip(s1 + s2, -1, 1), root / "mix" / name, sr)

    kw = dict(batch_size=2, shuffle=True, dynamic_mix=True, seed=5)
    li = WaveformLoader(root, transfer_int16=True, **kw)
    lf = WaveformLoader(root, transfer_int16=False, **kw)
    saw_would_clip = False
    for bi, bf in zip(iter(li), iter(lf)):
        # same rng stream -> same pairings/gains/crops on both paths
        assert bi.sources.dtype == np.int16
        # no source may sit at the clip rails beyond what true full scale
        # (1.0 -> 32767) produces; a clipped path would pile mass at ±32767
        # while the float path keeps the waveform shape
        deq = bi.sources.astype(np.float32) / 32768.0
        np.testing.assert_allclose(deq, bf.sources, atol=1.01 / 65536.0)
        saw_would_clip |= bool(np.abs(bf.sources).max() > 0.99)
    assert saw_would_clip  # the loud regime was actually exercised


def test_causal_pallas_trunk_rejected():
    """pallas_trunk trains the gLN/SAME trunk; silently training a
    causal-configured model through it would poison streaming checkpoints
    (round-4 advisor, medium)."""
    from speech_separation_tpu import train
    from speech_separation_tpu.models import ConvTasNet

    model = ConvTasNet(causal=True, enc_dim=16, bottleneck=8, hidden=16,
                       blocks=2, repeats=1)
    with pytest.raises(ValueError, match="causal"):
        train.make_time_domain_steps(model, pallas_trunk=True)
