"""Sequence packing: exactness of the packed training path.

The claim under test (``data/packing.py``): packing utterances into fixed
rows with guard frames + segment-id carry resets + the segment-aware PIT
loss is EQUIVALENT to processing each utterance alone — not an
approximation. Every test here compares the packed path against the
per-utterance path it replaces.
"""

import numpy as np
import pytest

import jax
import jax.flatten_util
import jax.numpy as jnp

from speech_separation_tpu.data.packing import PackedWaveformLoader, plan_rows
from speech_separation_tpu.losses.pit import pit_loss, pit_loss_packed
from speech_separation_tpu.models import UPitBlstm
from speech_separation_tpu.models.blstm import segment_keep
from speech_separation_tpu.models.upit import upit_blstm_train_forward
from speech_separation_tpu.ops.features import psm_features
from speech_separation_tpu.ops.framing import num_frames, num_samples


def test_segment_keep():
    seg = jnp.asarray([[0, 0, 1, 1, 1, -1, 2, 2]])
    keep = segment_keep(seg)
    np.testing.assert_array_equal(
        np.asarray(keep[0]), [1, 1, 0, 1, 1, 0, 0, 1]
    )


def test_plan_rows_covers_every_item_once():
    rng = np.random.default_rng(0)
    frames = [int(x) for x in rng.integers(40, 200, size=97)]
    rows = plan_rows(frames, 512, 1, rng.permutation(len(frames)))
    seen = sorted(i for r in rows for i in r)
    assert seen == list(range(len(frames)))
    for r in rows:
        used = sum(frames[i] for i in r) + len(r)  # + guards
        assert used <= 512 + 1  # trailing guard may overhang the row end


def _pack_rows(utts, row_t, feat):
    """Manually pack per-utterance feature arrays [1, K_u, F] into one row
    with 1 guard frame between; returns (row [1, T, F], seg [1, T], spans)."""
    f = utts[0].shape[-1]
    row = np.zeros((1, row_t, f), np.float32)
    seg = np.full((1, row_t), -1, np.int32)
    spans = []
    q = 0
    for si, u in enumerate(utts):
        k = u.shape[1]
        row[0, q : q + k] = u[0]
        seg[0, q : q + k] = si
        spans.append((q, q + k))
        q += k + 1
    return jnp.asarray(row), jnp.asarray(seg), spans


def test_pit_loss_packed_matches_per_utterance():
    rng = np.random.default_rng(1)
    s, f = 2, 5
    ks = [17, 9, 23]
    preds = [rng.normal(size=(1, k, s * f)).astype(np.float32) for k in ks]
    labels = [rng.normal(size=(1, k, s * f)).astype(np.float32) for k in ks]
    row_t = sum(ks) + len(ks) + 4
    prow, seg, _ = _pack_rows(preds, row_t, f)
    lrow, _, _ = _pack_rows(labels, row_t, f)
    # guard/tail frames carry garbage in real batches — fill with noise to
    # prove they are excluded from the loss
    noise = jnp.asarray(rng.normal(size=prow.shape).astype(np.float32))
    prow = jnp.where(seg[..., None] < 0, noise, prow)
    packed = pit_loss_packed(prow, lrow, seg, num_speakers=s, num_segments=4)
    singles = sum(
        float(pit_loss(jnp.asarray(p), jnp.asarray(l), jnp.asarray([k]), s))
        for p, l, k in zip(preds, labels, ks)
    )
    np.testing.assert_allclose(float(packed), singles, rtol=1e-5)


@pytest.fixture(scope="module")
def small_model():
    model = UPitBlstm(input_size=33, output_size=33, hidden=24, num_layers=2)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 16, 33)))["params"]
    return model, params


@pytest.mark.slow
def test_packed_blstm_forward_isolates_segments(small_model):
    """The packed forward restricted to one segment equals running that
    segment alone — carry resets isolate utterances in BOTH directions."""
    model, params = small_model
    rng = np.random.default_rng(2)
    utts = [rng.normal(size=(1, k, 33)).astype(np.float32) for k in (19, 7, 31)]
    row, seg, spans = _pack_rows(utts, 64, 33)
    packed = model.apply({"params": params}, row, segment_ids=seg)
    for u, (a, b) in zip(utts, spans):
        alone = model.apply({"params": params}, jnp.asarray(u))
        np.testing.assert_allclose(
            np.asarray(packed[:, a:b]), np.asarray(alone), atol=1e-5, rtol=1e-4
        )


def test_packed_forward_no_segments_unchanged(small_model):
    """segment_ids=None is the original path (same params, same output)."""
    model, params = small_model
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 16, 33)), jnp.float32)
    a = model.apply({"params": params}, x)
    b = model.apply({"params": params}, x, segment_ids=None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_packed_pallas_matches_flax(small_model):
    """Packed Pallas fwd+bwd kernels ≡ packed flax scan (fp32, interpret):
    forward outputs and parameter gradients."""
    model, params = small_model
    rng = np.random.default_rng(4)
    utts = [rng.normal(size=(1, k, 33)).astype(np.float32) for k in (13, 21)]
    row, seg, _ = _pack_rows(utts, 48, 33)

    def flax_loss(p):
        out = model.apply({"params": p}, row, segment_ids=seg)
        return jnp.sum(out * out)

    def pallas_loss(p):
        out = upit_blstm_train_forward(
            p, row, num_layers=model.num_layers, num_speakers=model.num_speakers,
            dropout_rng=None, compute_dtype=jnp.float32, interpret=True,
            segment_ids=seg,
        )
        return jnp.sum(out * out)

    lf, gf = jax.value_and_grad(flax_loss)(params)
    lp, gp = jax.value_and_grad(pallas_loss)(params)
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
    flat_f, _ = jax.flatten_util.ravel_pytree(gf)
    flat_p, _ = jax.flatten_util.ravel_pytree(gp)
    err = np.linalg.norm(flat_f - flat_p) / (np.linalg.norm(flat_f) + 1e-12)
    assert err < 1e-5, f"relative grad error {err}"


@pytest.mark.slow
def test_packed_loader_and_step_parity(tmp_path):
    """End to end: PackedWaveformLoader batches through the packed eval step
    equal the sum of per-utterance unpacked losses — identical STFT frames,
    identical PSM labels, identical BiLSTM outputs, identical PIT values."""
    from speech_separation_tpu import train
    from speech_separation_tpu.data import WaveformLoader, make_synthetic_fixture

    root = make_synthetic_fixture(tmp_path / "fx", utterances_per_split=5,
                                  min_seconds=0.6, max_seconds=1.4)
    split = root / "tt"
    size, shift = 64, 32
    loader = PackedWaveformLoader(
        split, rows_per_batch=2, row_seconds=2.2, stft_size=size, stft_shift=shift
    )
    assert loader.frame_occupancy() > 0.7
    batches = list(loader)
    names = [n for b in batches for row in b.names for n in row]
    assert sorted(names) == sorted(loader.names)

    model = UPitBlstm(input_size=size // 2 + 1, output_size=size // 2 + 1,
                      hidden=16, num_layers=1)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 8, size // 2 + 1)))["params"]
    state = train.TrainState.create(model.apply, params, train.adam(1e-3), rng)

    _, eval_packed = train.make_upit_packed_steps(
        model, size=size, shift=shift, num_segments=loader.num_segments,
        donate_state=False,
    )
    _, eval_single = train.make_upit_waveform_steps(
        model, size=size, shift=shift, donate_state=False
    )

    single = WaveformLoader(split, batch_size=1, stft_size=size, stft_shift=shift)
    singles = {}
    for b in single:
        loss = eval_single(
            state, jnp.asarray(b.mix), jnp.asarray(b.sources),
            jnp.asarray(b.frame_lengths),
        )
        singles[b.names[0]] = float(loss)

    for b in batches:
        packed = float(
            eval_packed(
                state, jnp.asarray(b.mix), jnp.asarray(b.sources),
                jnp.asarray(b.frame_seg),
            )
        )
        expect = sum(singles[n] for row in b.names for n in row)
        np.testing.assert_allclose(packed, expect, rtol=2e-4)

    # a train step runs and produces finite loss
    train_packed, _ = train.make_upit_packed_steps(
        model, size=size, shift=shift, num_segments=loader.num_segments,
        donate_state=False,
    )
    b = batches[0]
    new_state, loss = train_packed(
        state, jnp.asarray(b.mix), jnp.asarray(b.sources), jnp.asarray(b.frame_seg)
    )
    assert np.isfinite(float(loss))


def test_packed_loader_plans_with_decoded_lengths(tmp_path):
    """A split at a different native rate must be planned with the DECODED
    (resampled) lengths — header lengths would overlap neighbouring
    utterances in the packed rows (review regression)."""
    from speech_separation_tpu.data import make_synthetic_fixture

    root = make_synthetic_fixture(
        tmp_path / "fx16", utterances_per_split=4, sample_rate=16000,
        min_seconds=0.6, max_seconds=1.2,
    )
    loader = PackedWaveformLoader(
        root / "tt", rows_per_batch=2, row_seconds=4.0, sample_rate=8000,
        stft_size=64, stft_shift=32,
    )
    batches = list(loader)
    names = [n for b in batches for row in b.names for n in row]
    assert sorted(names) == sorted(loader.names)
    # planned lengths equal the decoded (8 kHz) lengths, half the header's
    from speech_separation_tpu.data.audio_io import audioread, wav_duration_samples

    for n, planned in zip(loader.names, loader._lengths):
        decoded = audioread(root / "tt" / "mix" / n, 8000)
        header = wav_duration_samples(root / "tt" / "mix" / n)[0]
        assert planned == len(decoded)
        assert abs(header - 2 * planned) <= 1


@pytest.mark.slow
def test_resident_corpus_matches_loader_steps(tmp_path):
    """Device-resident packed training is EXACT: gathering rows from the
    HBM-resident arrays and running the packed loss equals feeding the same
    rows from the host loader; empty padding rows add exactly zero."""
    from speech_separation_tpu import train
    from speech_separation_tpu.data import (
        PackedWaveformLoader,
        ResidentPackedCorpus,
        make_synthetic_fixture,
    )

    root = make_synthetic_fixture(tmp_path / "fx", utterances_per_split=5,
                                  min_seconds=0.6, max_seconds=1.4)
    split = root / "tt"
    size, shift = 64, 32
    kw = dict(row_seconds=2.2, stft_size=size, stft_shift=shift)
    corpus = ResidentPackedCorpus(split, rows_per_batch=2, **kw)
    loader = PackedWaveformLoader(
        split, rows_per_batch=2, transfer_int16=True, **kw
    )

    model = UPitBlstm(input_size=size // 2 + 1, output_size=size // 2 + 1,
                      hidden=16, num_layers=1)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 8, size // 2 + 1)))["params"]
    state = train.TrainState.create(model.apply, params, train.adam(1e-3), rng)

    _, eval_res = train.make_upit_packed_resident_steps(
        model, corpus.mix, corpus.sources, corpus.frame_seg,
        size=size, shift=shift, num_segments=corpus.num_segments,
        donate_state=False,
    )
    _, eval_loader = train.make_upit_packed_steps(
        model, size=size, shift=shift, num_segments=corpus.num_segments,
        donate_state=False,
    )

    idx_batches = list(corpus)
    loader_batches = list(loader)
    assert len(idx_batches) == len(corpus)
    # unshuffled: resident batches = loader rows in order (+ padding rows)
    row = 0
    for idx, b in zip(idx_batches, loader_batches):
        res = float(eval_res(state, jnp.asarray(idx)))
        ld = float(
            eval_loader(state, jnp.asarray(b.mix), jnp.asarray(b.sources),
                        jnp.asarray(b.frame_seg))
        )
        np.testing.assert_allclose(res, ld, rtol=1e-6)
        row += b.mix.shape[0]

    # shuffled epochs cover every row exactly once (up to the dropped tail)
    sh = ResidentPackedCorpus(split, rows_per_batch=2, shuffle=True, **kw)
    seen = np.concatenate(list(sh))
    assert len(np.unique(seen)) == len(seen)
    assert len(seen) == len(sh) * 2
    # a resident train step runs and is finite
    train_res, _ = train.make_upit_packed_resident_steps(
        model, sh.mix, sh.sources, sh.frame_seg,
        size=size, shift=shift, num_segments=sh.num_segments,
        donate_state=False,
    )
    _, loss = train_res(state, jnp.asarray(next(iter(sh))))
    assert np.isfinite(float(loss))
