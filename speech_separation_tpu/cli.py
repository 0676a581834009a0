"""Command-line entry points.

The reference has no CLI — every workflow is "run the notebook top to bottom"
(SURVEY §1). This exposes each workflow as a subcommand:

    python -m speech_separation_tpu.cli prepare-data --data-root ... --mode mixed
    python -m speech_separation_tpu.cli train --workload upit --variant blstm
    python -m speech_separation_tpu.cli train --workload vqvae --variant t3
    python -m speech_separation_tpu.cli separate --checkpoint-dir CKPT --out-dir out
    python -m speech_separation_tpu.cli evaluate --est-dir out
    python -m speech_separation_tpu.cli codec-encode --wav in.wav --out codes.npy
    python -m speech_separation_tpu.cli codec-decode --codes codes.npy --out out.wav
"""

from __future__ import annotations

import argparse
import json
import pathlib

import numpy as np


def _build_upit_model_from_cfg(cfg):
    from .models import ConvTasNet, UPitBlstm, UPitConv

    if cfg.variant == "blstm":
        return UPitBlstm(
            hidden=cfg.hidden, num_layers=cfg.num_layers, num_speakers=cfg.num_speakers
        )
    if cfg.variant == "conv":
        return UPitConv(
            hidden=cfg.hidden, num_layers=cfg.num_layers, num_speakers=cfg.num_speakers
        )
    if cfg.variant == "tasnet":
        return ConvTasNet(
            num_speakers=cfg.num_speakers,
            enc_dim=cfg.tasnet_enc_dim,
            bottleneck=cfg.tasnet_bottleneck,
            hidden=cfg.tasnet_hidden,
            blocks=cfg.tasnet_blocks,
            repeats=cfg.tasnet_repeats,
        )
    raise SystemExit(f"unknown separator variant {cfg.variant!r}")


def _build_vae_model(variant: str, cfg):
    from .models import VqVaeCodebook, VqVaeGumbel, VqVaeT2, VqVaeT3

    if variant == "gumbel":
        return VqVaeGumbel(latent_dim=cfg.latent_dim)
    if variant == "v2":
        return VqVaeCodebook(embedding_dim=cfg.embedding_dim, num_embeddings=cfg.num_embeddings)
    if variant == "t2":
        return VqVaeT2(embedding_dim=cfg.embedding_dim, num_embeddings=cfg.num_embeddings)
    if variant == "t3":
        return VqVaeT3(embedding_dim=cfg.embedding_dim, num_embeddings=cfg.num_embeddings)
    raise SystemExit(f"unknown VQ-VAE variant {variant!r}")


def cmd_prepare_data(args) -> None:
    from .data import FeatureConfig, generate_split
    from .utils import PrepareDataConfig, load_config

    cfg = load_config(
        PrepareDataConfig,
        args.config,
        dict(data_root=args.data_root, out_root=args.out_root, mode=args.mode),
    )
    feature_cfg = FeatureConfig(
        sample_rate=cfg.stft.sample_rate,
        window_size=cfg.stft.size,
        window_shift=cfg.stft.shift,
        mode=cfg.mode,
    )
    suffix = {"mixed": "", "signal": "_one_source", "raw": "_raw"}[cfg.mode]
    for split in cfg.splits:
        out_dir = pathlib.Path(cfg.out_root) / f"{split}{suffix}_tfrecord"
        written = generate_split(
            pathlib.Path(cfg.data_root) / split, out_dir, feature_cfg, cfg.max_workers
        )
        print(f"{split}: wrote {len(written)} records to {out_dir}")


def cmd_train(args) -> None:
    import jax
    import jax.numpy as jnp

    from . import data, parallel, train
    from .utils import MetricsLogger, UPitTrainConfig, VaeTrainConfig, load_config, save_config

    if args.workload == "upit":
        cfg = load_config(
            UPitTrainConfig,
            args.config,
            dict(
                data_root=args.data_root,
                variant=args.variant,
                batch_size=args.batch_size,
                epochs=args.epochs,
                checkpoint_dir=args.checkpoint_dir,
            ),
        )
        rng = jax.random.key(cfg.seed)
        model = _build_upit_model_from_cfg(cfg)
        params = model.init(rng, _example_input(cfg))["params"]
        tx = (
            train.adam(cfg.learning_rate)
            if cfg.variant == "tasnet"
            else train.exponential_decay_adam(
                cfg.learning_rate, cfg.lr_decay_steps, cfg.lr_decay_rate
            )
        )
        state = train.TrainState.create(model.apply, params, tx, rng)

        if cfg.mesh.model > 1 or cfg.mesh.data not in (None, 1):
            mesh = parallel.make_mesh(cfg.mesh.data, cfg.mesh.model)
            state = parallel.shard_state(state, mesh, cfg.mesh.tensor_parallel)

        if cfg.variant == "blstm":
            train_step, eval_step = train.make_upit_waveform_steps(
                model, cfg.stft.size, cfg.stft.shift, cfg.num_speakers
            )

            def batch_arrays(b):
                return (
                    jnp.asarray(b.mix),
                    jnp.asarray(b.sources),
                    jnp.asarray(b.frame_lengths),
                )

        elif cfg.variant == "tasnet":
            train_step, eval_step = train.make_time_domain_steps(model)

            def batch_arrays(b):
                return (
                    jnp.asarray(b.mix),
                    jnp.asarray(b.sources),
                    jnp.asarray(b.sample_lengths),
                )

        else:
            train_step, eval_step = train.make_upit_raw_steps(
                model, cfg.frame_size, cfg.num_speakers
            )

            def batch_arrays(b):
                raw_frames = np.ceil(b.sample_lengths / cfg.frame_size).astype(np.int32)
                return (
                    jnp.asarray(b.mix),
                    jnp.asarray(b.sources),
                    jnp.asarray(raw_frames),
                )

        root = pathlib.Path(cfg.data_root)
        make_loader = lambda split, shuffle: data.WaveformLoader(
            root / split,
            batch_size=cfg.batch_size,
            sample_rate=cfg.stft.sample_rate,
            stft_size=cfg.stft.size,
            stft_shift=cfg.stft.shift,
            num_speakers=cfg.num_speakers,
            shuffle=shuffle,
            seed=cfg.seed,
        )
        ckpt = train.CheckpointManager(cfg.checkpoint_dir)
        save_config(cfg, pathlib.Path(cfg.checkpoint_dir) / "train_config.json")
        logger = MetricsLogger(pathlib.Path(cfg.checkpoint_dir) / "metrics.jsonl", echo=False)
        result = train.fit(
            state,
            train_step,
            eval_step,
            make_loader(cfg.train_split, True),
            make_loader(cfg.val_split, False),
            batch_arrays,
            epochs=cfg.epochs,
            patience=cfg.patience,
            checkpoints=ckpt,
            resume=args.resume,
            metrics=logger,
        )
        logger.close()
        ckpt.close()
        print(
            json.dumps(
                {
                    "best_val_loss": result.best_val_loss,
                    "best_epoch": result.best_epoch,
                    "stopped_early": result.stopped_early,
                }
            )
        )
        return

    if args.workload == "vqvae":
        cfg = load_config(
            VaeTrainConfig,
            args.config,
            dict(
                data_root=args.data_root,
                variant=args.variant,
                batch_size=args.batch_size,
                epochs=args.epochs,
                checkpoint_dir=args.checkpoint_dir,
            ),
        )
        rng = jax.random.key(cfg.seed)
        model = _build_vae_model(cfg.variant, cfg)
        stacked = cfg.variant != "gumbel"
        example = jnp.zeros((1, 16, 40)) if stacked else jnp.zeros((1, 64, 1))
        init_rngs = {"params": rng} if stacked else {"params": rng, "gumbel": rng}
        params = model.init(init_rngs, example)["params"]
        tx = train.nadam(cfg.learning_rate) if cfg.variant in ("t2", "t3") else train.adam(
            cfg.learning_rate if cfg.variant != "gumbel" else 1e-4
        )
        state = train.TrainState.create(model.apply, params, tx, rng)

        from .losses import summed_squared_error

        if stacked:
            loss_fn = lambda preds, t: summed_squared_error(
                preds.reshape(preds.shape[0], -1, 1), t
            )
        else:
            loss_fn = summed_squared_error
        train_step, eval_step = train.make_vae_steps(model, loss_fn)

        def batch_arrays(b):
            return (jnp.asarray(b.inputs), jnp.asarray(b.targets))

        root = pathlib.Path(cfg.data_root)
        # t3 downsamples 8× (three stride-2 levels) → K must align to 8
        # (reference `_t3 cell 3`); t2/v2 align to 4 (`_t2 cell 3`)
        alignment = 8 if cfg.variant == "t3" else 4
        make_loader = lambda split, shuffle: data.VaeLoader(
            root / split,
            source=cfg.source,
            batch_size=cfg.batch_size,
            sample_rate=cfg.sample_rate,
            stacked=stacked,
            stride_alignment=alignment,
            shuffle=shuffle,
            seed=cfg.seed,
        )
        ckpt = train.CheckpointManager(cfg.checkpoint_dir)
        save_config(cfg, pathlib.Path(cfg.checkpoint_dir) / "train_config.json")
        logger = MetricsLogger(pathlib.Path(cfg.checkpoint_dir) / "metrics.jsonl", echo=False)
        result = train.fit(
            state,
            train_step,
            eval_step,
            make_loader(cfg.train_split, True),
            make_loader(cfg.val_split, False),
            batch_arrays,
            epochs=cfg.epochs,
            patience=cfg.patience,
            checkpoints=ckpt,
            resume=args.resume,
            metrics=logger,
        )
        logger.close()
        ckpt.close()
        print(
            json.dumps(
                {"best_val_loss": result.best_val_loss, "best_epoch": result.best_epoch}
            )
        )
        return

    raise SystemExit(f"unknown workload {args.workload!r}")


def _example_input(cfg):
    import jax.numpy as jnp

    if cfg.variant == "blstm":
        return jnp.zeros((1, 8, 129))
    if cfg.variant == "tasnet":
        return jnp.zeros((1, 1024))
    return jnp.zeros((1, 8, cfg.frame_size))


def _load_train_config(cls, checkpoint_dir: str, kind: str):
    from .utils import load_config

    path = pathlib.Path(checkpoint_dir) / "train_config.json"
    if not path.exists():
        raise SystemExit(
            f"error: no {kind} checkpoint at {checkpoint_dir} "
            f"(missing {path.name}; train one first)"
        )
    try:
        return load_config(cls, path)
    except ValueError as exc:
        raise SystemExit(
            f"error: checkpoint at {checkpoint_dir} is not a {kind} checkpoint "
            f"({exc})"
        ) from exc


def _restore_upit(checkpoint_dir: str):
    import jax

    from . import train
    from .utils import UPitTrainConfig

    cfg = _load_train_config(UPitTrainConfig, checkpoint_dir, "separator")
    model = _build_upit_model_from_cfg(cfg)
    rng = jax.random.key(cfg.seed)
    params = model.init(rng, _example_input(cfg))["params"]
    tx = (
        train.adam(cfg.learning_rate)
        if cfg.variant == "tasnet"
        else train.exponential_decay_adam(
            cfg.learning_rate, cfg.lr_decay_steps, cfg.lr_decay_rate
        )
    )
    state = train.TrainState.create(model.apply, params, tx, rng)
    ckpt = train.CheckpointManager(checkpoint_dir)
    state = ckpt.restore(state)
    ckpt.close()
    return cfg, model, state


def cmd_separate(args) -> None:
    from .separate import separate_directory

    cfg, model, state = _restore_upit(args.checkpoint_dir)
    if cfg.variant == "tasnet":
        _separate_time_domain(cfg, model, state, args)
        return
    import jax.numpy as jnp

    written = separate_directory(
        model,
        state.params,
        pathlib.Path(args.data_root or cfg.data_root) / args.split,
        args.out_dir,
        size=cfg.stft.size,
        shift=cfg.stft.shift,
        num_speakers=cfg.num_speakers,
        batch_size=args.batch_size or cfg.batch_size,
        sample_rate=cfg.stft.sample_rate,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    print(json.dumps({"written": len(written), "out_dir": str(args.out_dir)}))


def _separate_time_domain(cfg, model, state, args) -> None:
    import jax
    import jax.numpy as jnp

    from .data import WaveformLoader, audiowrite, wait_for_pending_writes

    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    loader = WaveformLoader(
        pathlib.Path(args.data_root or cfg.data_root) / args.split,
        batch_size=args.batch_size or cfg.batch_size,
        sample_rate=cfg.stft.sample_rate,
        num_speakers=cfg.num_speakers,
    )
    separate = jax.jit(lambda p, m: model.apply({"params": p}, m))
    written = 0
    for b in loader:
        import numpy as _np

        est = _np.asarray(separate(state.params, jnp.asarray(b.mix)))
        for i, name in enumerate(b.names):
            stem = pathlib.Path(name).stem
            n = int(b.sample_lengths[i])
            for s in range(cfg.num_speakers):
                audiowrite(
                    est[i, s, :n],
                    out_dir / f"{stem}_s{s + 1}.wav",
                    cfg.stft.sample_rate,
                    normalize=True,
                    threaded=True,
                )
                written += 1
    wait_for_pending_writes()
    print(json.dumps({"written": written, "out_dir": str(out_dir)}))


def cmd_evaluate(args) -> None:
    from .evaluate import evaluate_directory

    est_dir = pathlib.Path(args.est_dir)
    if not est_dir.is_dir():
        raise SystemExit(f"error: estimate directory not found: {est_dir}")
    if not any(est_dir.glob("*.wav")):
        raise SystemExit(f"error: no .wav estimates in {est_dir} (run `separate` first)")
    per_utt, agg = evaluate_directory(args.data_root, args.est_dir, args.split)
    if args.per_utterance:
        out = pathlib.Path(args.per_utterance)
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, "w") as fh:
            for record in per_utt:
                fh.write(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                                     for k, v in record.items()}) + "\n")
    print(
        json.dumps(
            {
                "si_sdr_db": round(agg["si_sdr"], 4),
                "si_sdri_db": round(agg["si_sdri"], 4),
                "sdr_db": round(agg["sdr"], 4),
                "isr_db": round(agg["isr"], 4),
                "sir_db": round(agg["sir"], 4),
                "sar_db": round(agg["sar"], 4),
                "utterances": agg["utterances"],
            }
        )
    )


def cmd_codec_encode(args) -> None:
    import jax.numpy as jnp

    from .data import read_normalized
    from .models import VqVaeT3

    cfg, model, state = _restore_vae(args.checkpoint_dir)
    wav = read_normalized(args.wav, cfg.sample_rate)
    frames = _stack_frames(wav, cfg.variant)
    codes = model.apply({"params": state.params}, jnp.asarray(frames), method=type(model).codes)
    np.save(args.out, np.asarray(codes))
    print(json.dumps({"codes": str(args.out), "shape": list(codes.shape), "samples": len(wav)}))


def _stack_frames(wav: np.ndarray, variant: str, frame_size: int = 40) -> np.ndarray:
    """Shape a waveform for the codec's input layout.

    gumbel (sample-level): ``[1, T, 1]`` with T padded to a multiple of 32
    (five stride-2 encoder levels); stacked variants: ``[1, K, L]`` with K
    aligned to the variant's stride depth.
    """
    if variant == "gumbel":
        t = ((len(wav) + 31) // 32) * 32
        out = np.zeros((1, t, 1), np.float32)
        out[0, : len(wav), 0] = wav
        return out
    alignment = 8 if variant == "t3" else 4
    k = -(-len(wav) // frame_size)
    k = ((k + alignment - 1) // alignment) * alignment
    frames = np.zeros((1, k, frame_size), np.float32)
    frames[0].reshape(-1)[: len(wav)] = wav
    return frames


def _restore_vae(checkpoint_dir: str):
    import jax
    import jax.numpy as jnp

    from . import train

    from .utils import VaeTrainConfig

    cfg = _load_train_config(VaeTrainConfig, checkpoint_dir, "codec")
    model = _build_vae_model(cfg.variant, cfg)
    stacked = cfg.variant != "gumbel"
    example = jnp.zeros((1, 16, 40)) if stacked else jnp.zeros((1, 64, 1))
    rng = jax.random.key(cfg.seed)
    init_rngs = {"params": rng} if stacked else {"params": rng, "gumbel": rng}
    params = model.init(init_rngs, example)["params"]
    # optimizer template must match the one used in training or the restored
    # opt-state tree won't line up
    tx = train.nadam(cfg.learning_rate) if cfg.variant in ("t2", "t3") else train.adam(
        cfg.learning_rate if cfg.variant != "gumbel" else 1e-4
    )
    state = train.TrainState.create(model.apply, params, tx, rng)
    ckpt = train.CheckpointManager(checkpoint_dir)
    state = ckpt.restore(state)
    ckpt.close()
    return cfg, model, state


def cmd_codec_decode(args) -> None:
    """Decode a saved code array back to a waveform (self-contained codecs).

    Only the Gumbel codec's codes are self-contained; the t2/t3 hierarchies
    carry a U-skip from the encoder (as in the reference topologies), so
    their codes alone cannot reconstruct — use ``codec-roundtrip`` there.
    """
    import jax.numpy as jnp

    from .data import audiowrite
    from .models import VqVaeGumbel

    cfg, model, state = _restore_vae(args.checkpoint_dir)
    if not isinstance(model, VqVaeGumbel):
        raise SystemExit(
            f"codec-decode requires the self-contained 'gumbel' codec; the "
            f"{cfg.variant!r} hierarchy has a U-skip and needs codec-roundtrip"
        )
    codes = jnp.asarray(np.load(args.codes))
    wav = model.apply(
        {"params": state.params}, codes, method=VqVaeGumbel.decode_codes
    )
    out = np.asarray(wav).reshape(-1)
    audiowrite(out, args.out, cfg.sample_rate, normalize=True)
    print(json.dumps({"out": str(args.out), "samples": int(out.size)}))


def cmd_codec_roundtrip(args) -> None:
    """Encode + decode a wav through the codec, write the reconstruction."""
    import jax.numpy as jnp

    from .data import audiowrite, read_normalized

    cfg, model, state = _restore_vae(args.checkpoint_dir)
    wav = read_normalized(args.wav, cfg.sample_rate)
    frames = _stack_frames(wav, cfg.variant)
    recon, _ = model.apply({"params": state.params}, jnp.asarray(frames), deterministic=True)
    out = np.asarray(recon).reshape(-1)[: len(wav)]
    audiowrite(out, args.out, cfg.sample_rate, normalize=True)
    print(json.dumps({"out": str(args.out), "samples": int(len(wav))}))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="speech_separation_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("prepare-data", help="offline TFRecord feature generation")
    p.add_argument("--config")
    p.add_argument("--data-root")
    p.add_argument("--out-root")
    p.add_argument("--mode", default="mixed", choices=["mixed", "signal", "raw"])
    p.set_defaults(func=cmd_prepare_data)

    p = sub.add_parser("train", help="train a separator or codec")
    p.add_argument("--config")
    p.add_argument("--workload", default="upit", choices=["upit", "vqvae"])
    p.add_argument("--variant", default=None)
    p.add_argument("--data-root")
    p.add_argument("--batch-size", type=int)
    p.add_argument("--epochs", type=int)
    p.add_argument("--checkpoint-dir", default="./CKPT")
    p.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    p.set_defaults(func=cmd_train)

    p = sub.add_parser("separate", help="separate a split with a trained model")
    p.add_argument("--checkpoint-dir", default="./CKPT")
    p.add_argument("--data-root")
    p.add_argument("--split", default="tt")
    p.add_argument("--out-dir", default="./test_wav")
    p.add_argument("--batch-size", type=int)
    p.add_argument("--bf16", action="store_true", help="bf16 mask network (serving precision)")
    p.set_defaults(func=cmd_separate)

    p = sub.add_parser(
        "evaluate", help="score separated wavs (SI-SDR, SI-SDRi, BSS SDR/SIR/SAR)"
    )
    p.add_argument("--data-root", required=True)
    p.add_argument("--est-dir", required=True)
    p.add_argument("--split", default="tt")
    p.add_argument(
        "--per-utterance", default=None, help="write per-utterance scores to this JSONL"
    )
    p.set_defaults(func=cmd_evaluate)

    p = sub.add_parser("codec-encode", help="tokenise a wav with a trained VQ codec")
    p.add_argument("--checkpoint-dir", default="./CKPT")
    p.add_argument("--wav", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(func=cmd_codec_encode)

    p = sub.add_parser("codec-decode", help="codes.npy → wav (gumbel codec)")
    p.add_argument("--checkpoint-dir", default="./CKPT")
    p.add_argument("--codes", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(func=cmd_codec_decode)

    p = sub.add_parser("codec-roundtrip", help="wav → codec → wav reconstruction")
    p.add_argument("--checkpoint-dir", default="./CKPT")
    p.add_argument("--wav", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(func=cmd_codec_roundtrip)

    args = parser.parse_args(argv)
    if args.command == "train" and args.variant is None:
        args.variant = "blstm" if args.workload == "upit" else "t3"
    args.func(args)


if __name__ == "__main__":
    main()
