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
    python -m speech_separation_tpu.cli prior-train --codec-dir CKPT_T3TOK
    python -m speech_separation_tpu.cli prior-sample --prior-dir PRIOR --out sample.wav
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
            win=cfg.tasnet_win,
            bottleneck=cfg.tasnet_bottleneck,
            hidden=cfg.tasnet_hidden,
            blocks=cfg.tasnet_blocks,
            repeats=cfg.tasnet_repeats,
            causal=getattr(cfg, "tasnet_causal", False),
        )
    raise SystemExit(f"unknown separator variant {cfg.variant!r}")


def _build_vae_model(variant: str, cfg):
    from .models import VqVaeCodebook, VqVaeGumbel, VqVaeT2, VqVaeT3, VqVaeT3Tok

    if variant == "gumbel":
        return VqVaeGumbel(latent_dim=cfg.latent_dim)
    if variant == "v2":
        return VqVaeCodebook(embedding_dim=cfg.embedding_dim, num_embeddings=cfg.num_embeddings)
    if variant == "t2":
        return VqVaeT2(embedding_dim=cfg.embedding_dim, num_embeddings=cfg.num_embeddings)
    if variant == "t3":
        return VqVaeT3(embedding_dim=cfg.embedding_dim, num_embeddings=cfg.num_embeddings)
    if variant == "t3tok":
        return VqVaeT3Tok(
            embedding_dim=cfg.embedding_dim,
            num_embeddings=cfg.num_embeddings,
            skip_embeddings=cfg.skip_embeddings,
            deep_depth=cfg.deep_depth,
            skip_depth=cfg.skip_depth,
            skip_pq=cfg.skip_pq,
        )
    raise SystemExit(f"unknown VQ-VAE variant {variant!r}")


def cmd_prepare_data(args) -> None:
    from .data import FeatureConfig, generate_librimix, generate_split
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
    if args.librimix:
        # Libri2Mix tree sweep (the reference's bulk converters,
        # `parallel_stft_single.py:219-415`)
        results = generate_librimix(
            cfg.data_root,
            out_root=args.out_root,
            bands=tuple(args.bands.split(",")),
            conditions=tuple(args.conditions.split(",")),
            splits=tuple(args.librimix_splits.split(",")),
            cfg=FeatureConfig(
                sample_rate=cfg.stft.sample_rate,
                window_size=cfg.stft.size,
                window_shift=cfg.stft.shift,
                mode=cfg.mode,
                mix_dirname="mix_clean",
            ),
            max_workers=cfg.max_workers,
            progress_every=args.progress_every,
        )
        for split_dir, count in sorted(results.items()):
            print(f"{split_dir}: wrote {count} records")
        return
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

        if cfg.variant == "blstm":
            train_step, eval_step = train.make_upit_waveform_steps(
                model,
                cfg.stft.size,
                cfg.stft.shift,
                cfg.num_speakers,
                compute_dtype=jnp.bfloat16 if cfg.bf16_compute else None,
                pallas_scan=cfg.blstm_pallas_scan,
            )

            def batch_arrays(b):
                return (
                    jnp.asarray(b.mix),
                    jnp.asarray(b.sources),
                    jnp.asarray(b.frame_lengths),
                )

        elif cfg.variant == "tasnet":
            train_step, eval_step = train.make_time_domain_steps(
                model,
                compute_dtype=jnp.bfloat16
                if (cfg.bf16_compute or cfg.tasnet_pallas_trunk)
                else None,
                pallas_trunk=cfg.tasnet_pallas_trunk,
            )

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
            transfer_int16=cfg.transfer_int16,
            # dynamic mixing augments the TRAIN stream only; length-sorting
            # keeps the re-pairing windows length-homogeneous
            dynamic_mix=cfg.dynamic_mix and shuffle,
            sort_by_length=cfg.dynamic_mix,
        )
        if cfg.pack:
            # Sequence-packed training (data/packing.py): utterances packed
            # back-to-back into fixed rows — one compiled shape per corpus,
            # ~95% frame occupancy, exact per-utterance semantics.
            if cfg.variant != "blstm":
                raise ValueError("pack=true is only supported for the blstm variant")
            _packed_loaders = {}  # one header scan per split, reused by fit

            def make_loader(split, shuffle):
                if split not in _packed_loaders:
                    _packed_loaders[split] = data.PackedWaveformLoader(
                        root / split,
                        rows_per_batch=cfg.pack_rows_per_batch,
                        row_seconds=cfg.pack_row_seconds,
                        sample_rate=cfg.stft.sample_rate,
                        stft_size=cfg.stft.size,
                        stft_shift=cfg.stft.shift,
                        num_speakers=cfg.num_speakers,
                        shuffle=shuffle,
                        seed=cfg.seed,
                        transfer_int16=cfg.transfer_int16,
                        # shuffled epochs re-plan rows, so a ragged final
                        # batch would change row count per epoch — each a
                        # fresh XLA/Pallas compile; drop it (val keeps all
                        # rows: its unshuffled plan is stable)
                        drop_remainder=shuffle,
                    )
                return _packed_loaders[split]

            num_segments = max(
                make_loader(cfg.train_split, True).num_segments,
                make_loader(cfg.val_split, False).num_segments,
            )
            train_step, eval_step = train.make_upit_packed_steps(
                model,
                cfg.stft.size,
                cfg.stft.shift,
                cfg.num_speakers,
                num_segments=num_segments,
                compute_dtype=jnp.bfloat16 if cfg.bf16_compute else None,
                pallas_scan=cfg.blstm_pallas_scan,
            )

            def batch_arrays(b):
                return (
                    jnp.asarray(b.mix),
                    jnp.asarray(b.sources),
                    jnp.asarray(b.frame_seg),
                )

        if cfg.lr_schedule == "cosine":
            if cfg.pack:
                # packed loaders yield num_rows // rows_per_batch steps — off
                # from n_utts // batch_size by the packing factor (several ×),
                # so the horizon must come from the actual loader length
                steps_per_epoch = max(1, len(make_loader(cfg.train_split, True)))
            else:
                # horizon from the split listing (dynamic-mix loaders match it)
                n_utts = len(
                    data.utterance_names(pathlib.Path(cfg.data_root) / cfg.train_split)
                )
                steps_per_epoch = max(1, n_utts // cfg.batch_size)
            horizon_epochs = cfg.sched_epochs or cfg.epochs
            tx = train.cosine_adam(
                cfg.learning_rate,
                total_steps=horizon_epochs * steps_per_epoch,
                warmup_steps=cfg.lr_warmup_steps,
                grad_clip_norm=cfg.grad_clip_norm,
            )
        else:
            tx = (
                train.adam(cfg.learning_rate, grad_clip_norm=cfg.grad_clip_norm)
                if cfg.variant == "tasnet"
                else train.exponential_decay_adam(
                    cfg.learning_rate,
                    cfg.lr_decay_steps,
                    cfg.lr_decay_rate,
                    grad_clip_norm=cfg.grad_clip_norm,
                )
            )
        state = train.TrainState.create(model.apply, params, tx, rng)

        if cfg.mesh.model > 1 or cfg.mesh.data not in (None, 1):
            mesh = parallel.make_mesh(cfg.mesh.data, cfg.mesh.model)
            state = parallel.shard_state(state, mesh, cfg.mesh.tensor_parallel)

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
        # gumbel honors cfg.learning_rate like every other variant: the
        # reference's from-scratch LR is 1e-3 (`vq-vae_for_1d_data.ipynb
        # cell 11`); its cell-17 Adam(1e-4) is a fine-tune setting that
        # measurably never escapes uniform-code collapse from scratch.
        tx = (
            train.nadam(cfg.learning_rate)
            if cfg.variant in ("t2", "t3", "t3tok")
            else train.adam(cfg.learning_rate)
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
        alignment = 8 if cfg.variant in ("t3", "t3tok") else 4
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

    filename = "prior_config.json" if kind == "prior" else "train_config.json"
    path = pathlib.Path(checkpoint_dir) / filename
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
        train.adam(cfg.learning_rate, grad_clip_norm=cfg.grad_clip_norm)
        if cfg.variant == "tasnet"
        else train.exponential_decay_adam(
            cfg.learning_rate,
            cfg.lr_decay_steps,
            cfg.lr_decay_rate,
            grad_clip_norm=cfg.grad_clip_norm,
        )
    )
    state = train.TrainState.create(model.apply, params, tx, rng)
    ckpt = train.CheckpointManager(checkpoint_dir)
    state = ckpt.restore_params(state)
    ckpt.close()
    return cfg, model, state


def cmd_separate(args) -> None:
    from .separate import separate_directory, separate_long_directory

    cfg, model, state = _restore_upit(args.checkpoint_dir)
    if cfg.variant == "tasnet":
        _separate_time_domain(cfg, model, state, args)
        return
    import jax.numpy as jnp

    if args.long_utterance:
        # sequence parallelism: shard each utterance's time axis over every
        # device (halo-exchange STFT/iSTFT; see parallel/sequence.py)
        import jax

        if getattr(args, "transfer_int16", False):
            print("note: --transfer-int16 applies to the standard "
                  "full-utterance path; ignored under --long-utterance")

        from . import parallel

        mesh = parallel.make_mesh(data=1, model=len(jax.devices()))
        written = separate_long_directory(
            model,
            state.params,
            mesh,
            pathlib.Path(args.data_root or cfg.data_root) / args.split,
            args.out_dir,
            size=cfg.stft.size,
            shift=cfg.stft.shift,
            num_speakers=cfg.num_speakers,
            sample_rate=cfg.stft.sample_rate,
            chunked_mask=args.chunked_mask,
        )
        print(json.dumps({"written": len(written), "out_dir": str(args.out_dir),
                          "sequence_parallel_devices": mesh.shape["model"]}))
        return

    dp_mesh = None
    if args.dp:
        import jax

        from . import parallel

        dp_mesh = parallel.make_mesh(data=len(jax.devices()), model=1)
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
        dp_mesh=dp_mesh,
        transfer_int16=getattr(args, "transfer_int16", False),
    )
    out = {"written": len(written), "out_dir": str(args.out_dir)}
    if dp_mesh is not None:
        out["data_parallel_devices"] = dp_mesh.shape["data"]
    print(json.dumps(out))


def _separate_time_domain(cfg, model, state, args) -> None:
    import jax
    import jax.numpy as jnp

    from .data import WaveformLoader, audiowrite, wait_for_pending_writes

    use_pallas = getattr(args, "kernel", "xla") == "pallas"
    if getattr(args, "bf16", False) or use_pallas:
        # serving precision: convs/matmuls in bf16, gLN stats stay fp32
        model = model.clone(dtype=jnp.bfloat16)
    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    # --pad-quantum-seconds: round each batch's padded length up to a
    # multiple of this (loader default 1.0 s), bounding the number of
    # distinct compiled shapes — a fresh Pallas shape remote-compiles in
    # minutes, so a handful of length buckets amortizes that across any
    # corpus. Padding feeds the per-item gLN stats, so larger quanta can
    # shift outputs at noise level (trimmed to true length either way).
    # int16 link transfer applies to the standard full-utterance path; the
    # chunked/streaming branches slice float waveforms on the host
    use_int16 = (
        getattr(args, "transfer_int16", False)
        and not getattr(args, "chunk_seconds", 0.0)
        and not getattr(args, "streaming_hop_seconds", 0.0)
    )
    loader = WaveformLoader(
        pathlib.Path(args.data_root or cfg.data_root) / args.split,
        batch_size=args.batch_size or cfg.batch_size,
        sample_rate=cfg.stft.sample_rate,
        num_speakers=cfg.num_speakers,
        pad_quantum_seconds=getattr(args, "pad_quantum_seconds", 1.0),
        transfer_int16=use_int16,
    )
    if use_pallas:
        # fused Pallas TCN trunk (ops/tcn_pallas.py): needs samples to be a
        # multiple of the encoder stride; pad here, trim via sample_lengths
        from .models.tasnet_serving import pallas_apply

        stride = cfg.tasnet_win // 2

        def _base(p, m):
            orig = m.shape[1]
            pad = (-orig) % stride
            if pad:
                m = jnp.pad(m, ((0, 0), (0, pad)))
            est = pallas_apply(
                p,
                m,
                num_speakers=cfg.num_speakers,
                enc_dim=cfg.tasnet_enc_dim,
                win=cfg.tasnet_win,
                bottleneck=cfg.tasnet_bottleneck,
                hidden=cfg.tasnet_hidden,
                blocks=cfg.tasnet_blocks,
                repeats=cfg.tasnet_repeats,
            )
            # trim the stride padding: downstream consumers (streaming hops,
            # chunk stitching) assume output length == input length
            return est[:, :, :orig]

    else:

        def _base(p, m):
            return model.apply({"params": p}, m)

    if use_int16:
        # dequantize the int16 upload on device; quantize estimates before
        # the fetch (ops/quant.py convention: per-signal scale, no clipping)
        from .ops.quant import dequant_i16, quantize_estimates_i16

        _inner = _base

        def _base(p, m):
            est = _inner(p, dequant_i16(m)).astype(jnp.float32)
            return quantize_estimates_i16(est)

    dp_mesh = None
    if getattr(args, "dp", False):
        # data-parallel serving: each device runs the full model (XLA or the
        # Pallas trunk) on its batch shard — gLN statistics are per-item, so
        # the sharded output is identical to single-device
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from . import parallel

        dp_mesh = parallel.make_mesh(data=len(jax.devices()), model=1)
        params = jax.device_put(state.params, NamedSharding(dp_mesh, P()))
        separate = jax.jit(
            jax.shard_map(
                _base,
                mesh=dp_mesh,
                in_specs=(P(), P("data")),
                out_specs=(P("data"), P("data")) if use_int16 else P("data"),
                check_vma=False,
            )
        )
    else:
        params = state.params
        separate = jax.jit(_base)
    if getattr(args, "streaming_hop_seconds", 0.0):
        # online low-latency mode. Causal checkpoints stream EXACTLY via
        # carried state (O(hop)/hop, separate/streaming_stateful.py —
        # output ≡ offline forward); gLN checkpoints fall back to sliding
        # context windows with correlation-aligned permutations
        # (separate/streaming.py, an approximation).
        import numpy as _np

        stateful = bool(getattr(cfg, "tasnet_causal", False))
        if stateful:
            from .separate.streaming_stateful import stateful_stream_separate

            stream_model = _build_upit_model_from_cfg(cfg)
        else:
            from .separate.streaming import stream_separate

        if dp_mesh is not None:
            raise SystemExit("--streaming-hop-seconds is single-device")
        stride = cfg.tasnet_win // 2
        hop_samples = max(
            cfg.tasnet_win,
            int(round(args.streaming_hop_seconds * cfg.stft.sample_rate))
            // stride
            * stride,
        )
        written = 0
        all_lat = []
        for b in loader:
            for i, name in enumerate(b.names):
                stem = pathlib.Path(name).stem
                n = int(b.sample_lengths[i])
                if stateful:
                    est_u, lat = stateful_stream_separate(
                        stream_model,
                        state.params,
                        _np.asarray(b.mix[i, :n]),
                        hop_samples,
                    )
                else:
                    est_u, lat = stream_separate(
                        lambda m: separate(params, m),
                        _np.asarray(b.mix[i, :n]),
                        num_speakers=cfg.num_speakers,
                        sample_rate=cfg.stft.sample_rate,
                        hop_seconds=args.streaming_hop_seconds,
                        context_seconds=args.streaming_context_seconds,
                    )
                all_lat.extend(lat[1:])
                for s in range(cfg.num_speakers):
                    audiowrite(
                        est_u[s],
                        out_dir / f"{stem}_s{s + 1}.wav",
                        cfg.stft.sample_rate,
                        normalize=True,
                        threaded=True,
                    )
                    written += 1
        wait_for_pending_writes()
        print(
            json.dumps(
                {
                    "written": written,
                    "out_dir": str(out_dir),
                    "streaming_hop_s": args.streaming_hop_seconds,
                    # hop is rounded to a stride multiple with a win floor —
                    # a 10 ms request can become win samples; echo reality
                    "effective_hop_samples": hop_samples,
                    "effective_hop_s": round(hop_samples / cfg.stft.sample_rate, 4),
                    "streaming_engine": "stateful_exact" if stateful else "window",
                    # the exact stateful engine carries state; it needs no
                    # context window, so that flag is ignored when stateful
                    "context_seconds": (
                        None if stateful else args.streaming_context_seconds
                    ),
                    # first hop per utterance is dropped as compile/warmup;
                    # single-hop utterances leave all_lat empty → null, not NaN
                    "median_hop_latency_ms": (
                        round(float(_np.median(all_lat)) * 1e3, 2) if all_lat else None
                    ),
                }
            )
        )
        return

    written = 0
    for b in loader:
        import numpy as _np

        if getattr(args, "chunk_seconds", 0.0):
            # arbitrary-length serving: fixed overlapped chunks, one
            # compiled shape, permutation-aligned crossfade stitching.
            # With --dp the chunk batch itself shards over the mesh
            # (multi-chip long-form separation): quantize rows to the
            # data-axis size so every shard stays equal.
            import math

            from .separate.tasnet_chunked import separate_chunked

            quantum = 4
            if dp_mesh is not None:
                quantum = math.lcm(4, dp_mesh.shape["data"])

            def _chunk_apply(m):
                if dp_mesh is not None:
                    from .parallel.sharding import shard_batch

                    (m,) = shard_batch((m,), dp_mesh)
                return separate(params, m)

            for i, name in enumerate(b.names):
                stem = pathlib.Path(name).stem
                n = int(b.sample_lengths[i])
                est_u = separate_chunked(
                    _chunk_apply,
                    _np.asarray(b.mix[i, :n]),
                    num_speakers=cfg.num_speakers,
                    sample_rate=cfg.stft.sample_rate,
                    chunk_seconds=args.chunk_seconds,
                    overlap_seconds=args.chunk_overlap_seconds,
                    batch_quantum=quantum,
                )
                for s in range(cfg.num_speakers):
                    audiowrite(
                        est_u[s],
                        out_dir / f"{stem}_s{s + 1}.wav",
                        cfg.stft.sample_rate,
                        normalize=True,
                        threaded=True,
                    )
                    written += 1
            continue
        # full-utterance path: the whole batch goes to the device(s) at once.
        # The chunked branch above feeds the device per-chunk from host and
        # must not pay this (potentially long-utterance) full-batch transfer.
        mix = jnp.asarray(b.mix)
        n_real = mix.shape[0]
        if dp_mesh is not None:
            from .parallel.sharding import pad_batch_for_mesh, shard_batch

            (mix,), n_real = pad_batch_for_mesh((mix,), dp_mesh)
            (mix,) = shard_batch((mix,), dp_mesh)
        out = separate(params, mix)
        if use_int16:
            from .ops.quant import dequantize_estimates_i16

            codes, scale = out
            est = dequantize_estimates_i16(
                _np.asarray(codes)[:n_real], _np.asarray(scale)[:n_real]
            )
        else:
            est = _np.asarray(out)[:n_real]
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
    out = {"written": written, "out_dir": str(out_dir)}
    if dp_mesh is not None:
        out["data_parallel_devices"] = dp_mesh.shape["data"]
    print(json.dumps(out))


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
    from .tokenizer import code_metrics

    cfg, model, state = _restore_vae(args.checkpoint_dir)
    if not hasattr(type(model), "codes"):
        raise SystemExit(
            f"error: the {cfg.variant!r} codec does not expose a code stream "
            f"(its two VQ levels interleave mid-decoder); use gumbel, t2, t3 or t3tok"
        )
    wav = read_normalized(args.wav, cfg.sample_rate)
    frames = _stack_frames(wav, cfg.variant)
    codes = model.apply({"params": state.params}, jnp.asarray(frames), method=type(model).codes)
    if cfg.variant == "t3tok":
        deep, skip = (np.asarray(c) for c in codes)
        np.savez(args.out, deep=deep, skip=skip)
        print(
            json.dumps(
                {
                    "codes": str(args.out),
                    "deep_shape": list(deep.shape),
                    "skip_shape": list(skip.shape),
                    "samples": len(wav),
                    "deep": code_metrics(deep, cfg.num_embeddings),
                    "skip": code_metrics(skip, cfg.skip_embeddings),
                }
            )
        )
        return
    np.save(args.out, np.asarray(codes))
    vocab = cfg.latent_dim if cfg.variant == "gumbel" else cfg.num_embeddings
    print(
        json.dumps(
            {
                "codes": str(args.out),
                "shape": list(codes.shape),
                "samples": len(wav),
                "codebook": code_metrics(np.asarray(codes), vocab),
            }
        )
    )


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
    alignment = 8 if variant in ("t3", "t3tok") else 4
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
    tx = train.nadam(cfg.learning_rate) if cfg.variant in ("t2", "t3", "t3tok") else train.adam(
        cfg.learning_rate if cfg.variant != "gumbel" else 1e-4
    )
    state = train.TrainState.create(model.apply, params, tx, rng)
    ckpt = train.CheckpointManager(checkpoint_dir)
    state = ckpt.restore_params(state)
    ckpt.close()
    return cfg, model, state


def cmd_codec_decode(args) -> None:
    """Decode a saved code array back to a waveform (self-contained codecs).

    Self-contained codecs: ``gumbel`` (codes.npy) and the tokenizer-grade
    ``t3tok`` (codes.npz with ``deep``/``skip`` streams — both VQ levels are
    quantized, so codes fully determine the audio). The t2/t3 hierarchies
    carry a raw U-skip from the encoder (as in the reference topologies), so
    their codes alone cannot reconstruct — use ``codec-roundtrip`` there.
    """
    import jax.numpy as jnp

    from .data import audiowrite
    from .models import VqVaeGumbel, VqVaeT3Tok

    cfg, model, state = _restore_vae(args.checkpoint_dir)
    if isinstance(model, VqVaeT3Tok):
        payload = np.load(args.codes)
        wav = model.apply(
            {"params": state.params},
            jnp.asarray(payload["deep"]),
            jnp.asarray(payload["skip"]),
            method=VqVaeT3Tok.decode_codes,
        )
    elif isinstance(model, VqVaeGumbel):
        codes = jnp.asarray(np.load(args.codes))
        wav = model.apply(
            {"params": state.params}, codes, method=VqVaeGumbel.decode_codes
        )
    else:
        raise SystemExit(
            f"codec-decode requires a self-contained codec ('gumbel' or "
            f"'t3tok'); the {cfg.variant!r} hierarchy has a raw U-skip and "
            f"needs codec-roundtrip"
        )
    out = np.asarray(wav).reshape(-1)
    audiowrite(out, args.out, cfg.sample_rate, normalize=True)
    print(json.dumps({"out": str(args.out), "samples": int(out.size)}))


def _build_prior(cfg, vocab: int):
    from .models import CodePrior

    return CodePrior(
        num_codes=vocab,
        dim=cfg.dim,
        depth=cfg.depth,
        num_heads=cfg.num_heads,
        max_distance=cfg.max_distance,
    )


def cmd_prior_train(args) -> None:
    """Train a CodePrior transformer over a tokenizer codec's code streams.

    Finishes the reference's sketch: VQ codes as "transformer input"
    (`vq-vae_for_1d_data.ipynb cell 24`) with the relative-position attention
    of `Untitled.ipynb cells 1-4`.
    """
    import jax
    import jax.numpy as jnp

    from . import data, train
    from .tokenizer import (
        TokenLayout,
        TokenWindowLoader,
        code_metrics,
        encode_split,
        make_prior_steps,
    )
    from .utils import MetricsLogger, PriorTrainConfig, load_config, save_config

    cfg = load_config(
        PriorTrainConfig,
        args.config,
        dict(
            codec_dir=args.codec_dir,
            data_root=args.data_root,
            epochs=args.epochs,
            batch_size=args.batch_size,
            seq_len=args.seq_len,
            checkpoint_dir=args.checkpoint_dir,
        ),
    )
    codec_cfg, codec_model, codec_state = _restore_vae(cfg.codec_dir)
    if codec_cfg.variant != "t3tok":
        raise SystemExit(
            f"prior-train needs a self-contained 't3tok' tokenizer codec "
            f"(got {codec_cfg.variant!r}); its codes alone must reconstruct audio"
        )
    layout = TokenLayout.for_codec(codec_model)
    # snap the window to whole token groups (group size depends on the
    # codec's RVQ/PQ geometry, which the user shouldn't have to compute)
    seq_len = max(layout.group, cfg.seq_len // layout.group * layout.group)

    root = pathlib.Path(cfg.data_root)
    make_loader = lambda split: data.VaeLoader(
        root / split,
        source=cfg.source,
        batch_size=4,
        sample_rate=codec_cfg.sample_rate,
        stacked=True,
        stride_alignment=8,
    )
    train_tokens = encode_split(
        codec_model, codec_state.params, make_loader(cfg.train_split), seq_len, layout
    )
    val_tokens = encode_split(
        codec_model, codec_state.params, make_loader(cfg.val_split), seq_len, layout
    )

    model = _build_prior(cfg, layout.vocab)
    rng = jax.random.key(cfg.seed)
    params = model.init(rng, jnp.zeros((1, seq_len), jnp.int32))["params"]
    state = train.TrainState.create(model.apply, params, train.adam(cfg.learning_rate), rng)
    train_step, eval_step = make_prior_steps(model)

    ckpt = train.CheckpointManager(cfg.checkpoint_dir)
    save_config(cfg, pathlib.Path(cfg.checkpoint_dir) / "prior_config.json")
    logger = MetricsLogger(pathlib.Path(cfg.checkpoint_dir) / "metrics.jsonl", echo=False)
    result = train.fit(
        state,
        train_step,
        eval_step,
        TokenWindowLoader(train_tokens, cfg.batch_size, shuffle=True, seed=cfg.seed),
        TokenWindowLoader(val_tokens, cfg.batch_size),
        lambda b: (jnp.asarray(b),),
        epochs=cfg.epochs,
        patience=cfg.patience,
        checkpoints=ckpt,
        resume=args.resume,
        metrics=logger,
    )
    logger.close()
    ckpt.close()
    deep_stream, skip_stream = (np.asarray(s) for s in layout.deinterleave(train_tokens))
    # entropy calibration (VERDICT r2 #5): the val NLL is held-out-utterance
    # (val_split tokenizes different utterances); compare it against the
    # context-free unigram ceiling of the same stream so a tiny loss on a
    # near-deterministic stream can't masquerade as modeling skill
    from .tokenizer import empirical_token_entropy

    entropy = empirical_token_entropy(val_tokens, layout)
    nats = float(result.best_val_loss)
    summary = {
        "best_val_loss": result.best_val_loss,
        "best_epoch": result.best_epoch,
        "windows": int(train_tokens.shape[0]),
        "vocab": layout.vocab,
        "deep_codebook": code_metrics(deep_stream, codec_cfg.num_embeddings),
        "skip_codebook": code_metrics(skip_stream, codec_cfg.skip_embeddings),
        "prior_calibration": {
            "heldout_nats_per_token": round(nats, 4),
            "heldout_bits_per_token": round(nats / float(np.log(2.0)), 4),
            "heldout_perplexity": round(float(np.exp(nats)), 4),
            "unigram_positional_nats": entropy["positional_nats"],
            "unigram_marginal_nats": entropy["marginal_nats"],
            "context_gain_nats": round(entropy["positional_nats"] - nats, 4),
        },
    }
    # persist next to the checkpoint so queue harvests can't strand the
    # calibration in a log file (round 4 lost a finished run to /tmp)
    (pathlib.Path(cfg.checkpoint_dir) / "summary.json").write_text(
        json.dumps(summary, indent=2)
    )
    print(json.dumps(summary))


def cmd_prior_sample(args) -> None:
    """Sample the prior and decode the sampled codes to a waveform."""
    import jax
    import jax.numpy as jnp

    from . import train
    from .data import audiowrite
    from .models import VqVaeT3Tok
    from .tokenizer import TokenLayout, sample_codes
    from .utils import PriorTrainConfig

    cfg = _load_train_config(PriorTrainConfig, args.prior_dir, "prior")
    codec_cfg, codec_model, codec_state = _restore_vae(args.codec_dir or cfg.codec_dir)
    layout = TokenLayout.for_codec(codec_model)

    model = _build_prior(cfg, layout.vocab)
    rng = jax.random.key(args.seed)
    params = model.init(rng, jnp.zeros((1, 8 * layout.group), jnp.int32))["params"]
    state = train.TrainState.create(model.apply, params, train.adam(cfg.learning_rate), rng)
    ckpt = train.CheckpointManager(args.prior_dir)
    state = ckpt.restore_params(state)
    ckpt.close()

    # one group = one deep step = 8 waveform frames = 320 samples
    num_groups = max(1, int(args.seconds * codec_cfg.sample_rate) // 320)
    tokens = sample_codes(
        model,
        state.params,
        num_groups,
        jax.random.key(args.seed),
        layout,
        temperature=args.temperature,
    )
    deep, skip = layout.deinterleave(tokens)
    frames = codec_model.apply(
        {"params": codec_state.params}, deep, skip, method=VqVaeT3Tok.decode_codes
    )
    wav = np.asarray(frames).reshape(-1)
    audiowrite(wav, args.out, codec_cfg.sample_rate, normalize=True)
    from .tokenizer import distinct_n

    print(
        json.dumps(
            {
                "out": str(args.out),
                "samples": int(wav.size),
                "tokens": int(tokens.shape[1]),
                "seconds": round(wav.size / codec_cfg.sample_rate, 2),
                # sample diversity: collapse/looping shows up as distinct-n → 0
                "distinct_3": distinct_n(np.asarray(tokens), 3),
                "distinct_5": distinct_n(np.asarray(tokens), 5),
            }
        )
    )


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
    p.add_argument(
        "--librimix", action="store_true",
        help="treat data-root as a Libri2Mix tree ({band}/{condition}/{split})",
    )
    p.add_argument("--bands", default="wav8k", help="comma list: wav8k,wav16k")
    p.add_argument("--conditions", default="max,min")
    p.add_argument(
        "--librimix-splits", default="dev,test,train-100,train-360", dest="librimix_splits"
    )
    p.add_argument("--progress-every", type=int, default=500)
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
    p.add_argument(
        "--transfer-int16",
        action="store_true",
        help="ship int16 PCM over the host<->device link both ways (half the "
        "wire bytes: upload bit-exact for 16-bit sources; estimates "
        "quantized on device with a per-signal scale — no clipping, "
        "~0.5 LSB of the int16 wavs written); standard full-utterance "
        "path only",
    )
    p.add_argument(
        "--kernel",
        default="xla",
        choices=["xla", "pallas"],
        help="tasnet serving kernel: 'pallas' runs the TCN trunk as one fused "
        "Pallas program (bf16, fastest on TPU; implies --bf16)",
    )
    p.add_argument(
        "--dp",
        action="store_true",
        help="data-parallel serving: shard each batch over all devices "
        "(params replicated; output identical to single-device)",
    )
    p.add_argument(
        "--pad-quantum-seconds",
        type=float,
        default=1.0,
        help="round padded batch lengths up to a multiple of this, bounding "
        "distinct compiled shapes (time-domain serving; default 1.0)",
    )
    p.add_argument(
        "--chunk-seconds",
        type=float,
        default=0.0,
        help="tasnet: separate in fixed overlapped chunks (any utterance "
        "length, ONE compiled shape; permutation-aligned crossfade "
        "stitching; gLN stats become chunk-local — see RESULTS.md)",
    )
    p.add_argument(
        "--chunk-overlap-seconds",
        type=float,
        default=1.0,
        help="overlap between serving chunks (with --chunk-seconds)",
    )
    p.add_argument(
        "--streaming-hop-seconds",
        type=float,
        default=0.0,
        help="tasnet: ONLINE mode — process each utterance hop-by-hop with "
        "causal context windows (no lookahead; algorithmic delay = one hop); "
        "reports median per-hop compute latency",
    )
    p.add_argument(
        "--streaming-context-seconds",
        type=float,
        default=1.5,
        help="trailing context per streaming window (with --streaming-hop-seconds)",
    )
    p.add_argument(
        "--long-utterance",
        action="store_true",
        help="sequence-parallel path: shard each utterance's time axis over all devices",
    )
    p.add_argument(
        "--chunked-mask",
        action="store_true",
        help="with --long-utterance: run the mask net per time-chunk (full 1/n memory)",
    )
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

    p = sub.add_parser("prior-train", help="train a CodePrior over t3tok codec codes")
    p.add_argument("--config")
    p.add_argument("--codec-dir", default=None, help="t3tok codec checkpoint dir")
    p.add_argument("--data-root")
    p.add_argument("--epochs", type=int)
    p.add_argument("--batch-size", type=int)
    p.add_argument("--seq-len", type=int)
    p.add_argument("--checkpoint-dir", default="./PRIOR")
    p.add_argument("--resume", action="store_true")
    p.set_defaults(func=cmd_prior_train)

    p = sub.add_parser("prior-sample", help="sample the prior → decode → wav")
    p.add_argument("--prior-dir", default="./PRIOR")
    p.add_argument("--codec-dir", default=None, help="defaults to the prior's codec_dir")
    p.add_argument("--out", required=True)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(func=cmd_prior_sample)

    args = parser.parse_args(argv)
    if args.command == "train" and args.variant is None:
        args.variant = "blstm" if args.workload == "upit" else "t3"
    args.func(args)


if __name__ == "__main__":
    main()
