"""Conv-TasNet generalization training at corpus scale.

Same protocol as `scripts/corpus_train_run.py` (BLSTM) but for the flagship
time-domain model with this round's fast paths end to end: bf16
mixed-precision training (`make_time_domain_steps(compute_dtype=bf16)`),
decode-ahead length-sorted loaders, then held-out `test` separation served
through the fused Pallas TCN trunk (`pallas_apply`) and scored with
SI-SDR / SI-SDRi. Generates the 2,000-utterance Libri2Mix-shaped synthetic
corpus if it's not already present.

Usage: python scripts/tasnet_corpus_run.py [CORPUS_ROOT] [EPOCHS] [pallas] [BATCH]
  ``pallas``: train through the fused Pallas fwd+bwd trunk
  (`make_time_domain_steps(pallas_trunk=True)`) — fastest at batch ≥ 32.

Convergence levers (round 4 — VERDICT item 2):
  DM=1          dynamic mixing: re-pair sources across utterances each epoch
                with fresh ±2.5 dB gains (WaveformLoader(dynamic_mix=True))
  LR_SCHED=cosine  warmup+cosine decay over the whole run (train.cosine_adam)
  LR=1e-3       peak learning rate     WARMUP=500  warmup steps
  CLIP=5        global-norm gradient clipping
  TR_UTTS=1700  train-split size when generating the corpus
  RESUME=1      restore the newest best-val checkpoint before training
  CAUSAL=1      train the causal configuration (cLN + causal depthwise
                convs — models/tasnet.py); serving then uses the XLA path
                (the Pallas trunks implement the gLN topology) and the run
                additionally streams the test split hop-by-hop
                (HOP=0.5 CTX=1.5 seconds) and reports the online-vs-offline
                SI-SDRi gap (VERDICT r3 item 4 target: within ~1 dB)
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from speech_separation_tpu import data, train
from speech_separation_tpu.data import make_synthetic_librimix
from speech_separation_tpu.data.audio_io import audiowrite
from speech_separation_tpu.data.datasets import WaveformLoader, background_iterator
from speech_separation_tpu.evaluate import eval_si_sdr, eval_si_sdri
from speech_separation_tpu.models import ConvTasNet
from speech_separation_tpu.models.tasnet_serving import pallas_apply
from speech_separation_tpu.utils import MetricsLogger

PROFILE = os.environ.get("PROFILE", "easy")  # corpus difficulty regime
_default_root = "/tmp/data_scale/corpus" + ("" if PROFILE == "easy" else f"_{PROFILE}")
ROOT = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else pathlib.Path(_default_root)
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
PALLAS = len(sys.argv) > 3 and sys.argv[3] == "pallas"
BATCH = int(sys.argv[4]) if len(sys.argv) > 4 else (32 if PALLAS else 8)
BAND = ROOT / "wav8k" / "min"
OUT = pathlib.Path(
    "/tmp/tasnet_corpus"
    + ("" if PROFILE == "easy" else f"_{PROFILE}")
    + (f"_{os.environ['OUT_TAG']}" if os.environ.get("OUT_TAG") else "")
)


def _alias_mix(split_dir: pathlib.Path) -> None:
    mix = split_dir / "mix"
    if not mix.exists():
        os.symlink("mix_clean", mix)


TR_UTTS = int(os.environ.get("TR_UTTS", "1700"))


def main():
    if not ROOT.exists():
        t0 = time.time()
        make_synthetic_librimix(
            ROOT,
            utterances={"dev": 50, "test": 50, "train-100": 200, "train-360": TR_UTTS},
            min_seconds=2.0,
            max_seconds=6.0,
            profile=PROFILE,
            bands=("wav8k",),
            conditions=("min",),
        )
        print(json.dumps({"stage": "corpus_gen", "wall_s": round(time.time() - t0, 1)}), flush=True)
    for split in ("train-360", "dev", "test"):
        _alias_mix(BAND / split)

    dynamic_mix = bool(int(os.environ.get("DM", "0")))
    clip = float(os.environ.get("CLIP", "0"))

    def make_loader(split, shuffle):
        return WaveformLoader(
            BAND / split,
            batch_size=BATCH,
            shuffle=shuffle,
            sort_by_length=True,
            drop_remainder=shuffle,
            seed=0,
            # INT16=1: int16 PCM over the relay link (bit-exact; RESULTS.md)
            transfer_int16=bool(int(os.environ.get("INT16", "0"))),
            # DM=1 on the train loader only: eval stays on fixed mixtures
            dynamic_mix=dynamic_mix and shuffle,
        )

    train_loader = make_loader("train-360", True)

    causal = bool(int(os.environ.get("CAUSAL", "0")))
    if causal and PALLAS:
        raise SystemExit("CAUSAL=1 trains via the XLA path; drop `pallas`")
    # TINY=1: smoke mode — full code path (DM, cosine, int16, ckpt/resume,
    # streaming eval) on a reduced model, for de-risking runs off-chip
    tiny = bool(int(os.environ.get("TINY", "0")))
    model = (
        ConvTasNet(causal=causal, enc_dim=32, bottleneck=16, hidden=32,
                   blocks=3, repeats=1)
        if tiny
        else ConvTasNet(causal=causal)
    )
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 16000)))["params"]
    lr = float(os.environ.get("LR", "1e-3"))
    if os.environ.get("LR_SCHED", "") == "cosine":
        # SCHED_EPOCHS: cosine horizon for CHUNKED runs. `fit(resume=1)`
        # trains EPOCHS *more* epochs per invocation while the restored
        # optimizer step keeps counting globally, so a queue that runs
        # 40+40+40 epochs must pin the schedule to the 120-epoch horizon
        # once or later chunks would sit at the end_value floor.
        sched_epochs = int(os.environ.get("SCHED_EPOCHS", str(EPOCHS)))
        tx = train.cosine_adam(
            peak_learning_rate=lr,
            total_steps=sched_epochs * len(train_loader),
            warmup_steps=int(os.environ.get("WARMUP", "500")),
            grad_clip_norm=clip,
        )
    else:
        tx = train.adam(lr, grad_clip_norm=clip)
    state = train.TrainState.create(model.apply, params, tx, rng)
    train_step, eval_step = train.make_time_domain_steps(
        model, compute_dtype=jnp.bfloat16, pallas_trunk=PALLAS
    )

    def batch_arrays(b):
        return (jnp.asarray(b.mix), jnp.asarray(b.sources), jnp.asarray(b.sample_lengths))

    OUT.mkdir(parents=True, exist_ok=True)
    logger = MetricsLogger(OUT / "metrics.jsonl")
    ckpt = train.CheckpointManager(OUT / "ckpt")
    t0 = time.time()
    result = train.fit(
        state,
        train_step,
        eval_step,
        train_loader,
        make_loader("dev", False),
        batch_arrays,
        epochs=EPOCHS,
        metrics=logger,
        checkpoints=ckpt,
        resume=bool(int(os.environ.get("RESUME", "1"))),
    )
    ckpt_epoch = int(ckpt.latest_step or 0)  # cumulative across chunked runs
    ckpt.close()
    logger.close()
    train_s = time.time() - t0

    # held-out separation through the fused Pallas trunk (serving path);
    # the causal model serves via XLA (Pallas trunks implement gLN)
    sep_dir = OUT / "test_separated"
    sep_dir.mkdir(parents=True, exist_ok=True)
    if causal or tiny:
        sep = jax.jit(lambda p, m: model.apply({"params": p}, m))
    else:
        sep = jax.jit(lambda p, m: pallas_apply(p, m))
    t1 = time.time()
    # 2 s length quantum → 3 padded shapes over the 2-6 s corpus → 3 Pallas
    # remote compiles instead of 5 (each is ~1-4 min on the axon relay)
    loader = WaveformLoader(BAND / "test", batch_size=8, pad_quantum_seconds=2.0)
    audio_s = 0.0
    for b in background_iterator(iter(loader), depth=2):
        est = np.asarray(sep(result.state.params, jnp.asarray(b.mix)))
        audio_s += float(np.sum(b.sample_lengths)) / 8000.0
        for i, name in enumerate(b.names):
            stem = pathlib.Path(name).stem
            n = int(b.sample_lengths[i])
            for s in range(2):
                audiowrite(est[i, s, :n], sep_dir / f"{stem}_s{s + 1}.wav", 8000, True)
    data.wait_for_pending_writes()
    serve_s = time.time() - t1

    si = eval_si_sdr(BAND, sep_dir, split="test")
    si_i = eval_si_sdri(BAND, sep_dir, split="test")

    stream_stats = None
    if causal:
        # online eval: hop-by-hop streaming over the SAME held-out split;
        # the causal config's whole point is closing the online/offline gap
        from speech_separation_tpu.separate.streaming import stream_separate

        hop = float(os.environ.get("HOP", "0.5"))
        ctx = float(os.environ.get("CTX", "1.5"))
        window = int(round((hop + ctx) * 8000))
        stream_apply = jax.jit(lambda m: model.apply({"params": result.state.params}, m))
        stream_dir = OUT / "test_streamed"
        stream_dir.mkdir(parents=True, exist_ok=True)
        t2 = time.time()
        lat_all = []
        sloader = WaveformLoader(BAND / "test", batch_size=1)
        for b in sloader:
            n = int(b.sample_lengths[0])
            est, lat = stream_separate(
                stream_apply, np.asarray(b.mix[0, :n]),
                hop_seconds=hop, context_seconds=ctx,
            )
            lat_all.extend(lat[1:])
            stem = pathlib.Path(b.names[0]).stem
            for s in range(2):
                audiowrite(est[s], stream_dir / f"{stem}_s{s + 1}.wav", 8000, True)
        data.wait_for_pending_writes()
        stream_si_i = eval_si_sdri(BAND, stream_dir, split="test")

        # exact stateful engine (separate/streaming_stateful.py): output ≡
        # offline forward; measure its per-hop latency + score as proof
        from speech_separation_tpu.separate.streaming_stateful import (
            stateful_stream_separate,
        )

        hop_samples = max(16, int(round(hop * 8000)) // 8 * 8)
        sf_dir = OUT / "test_streamed_stateful"
        sf_dir.mkdir(parents=True, exist_ok=True)
        sf_lat = []
        for b in WaveformLoader(BAND / "test", batch_size=1):
            n = int(b.sample_lengths[0])
            est, lat = stateful_stream_separate(
                model, result.state.params, np.asarray(b.mix[0, :n]), hop_samples
            )
            sf_lat.extend(lat[1:])
            stem = pathlib.Path(b.names[0]).stem
            for s in range(2):
                audiowrite(est[s], sf_dir / f"{stem}_s{s + 1}.wav", 8000, True)
        data.wait_for_pending_writes()
        sf_si_i = eval_si_sdri(BAND, sf_dir, split="test")

        stream_stats = {
            "hop_s": hop,
            "context_s": ctx,
            "window_samples": window,
            "streamed_si_sdri_db": round(stream_si_i, 3),
            "offline_minus_streamed_db": round(si_i - stream_si_i, 3),
            "median_hop_latency_ms": (
                round(float(np.median(lat_all)) * 1e3, 2) if lat_all else None
            ),
            "stateful_streamed_si_sdri_db": round(sf_si_i, 3),
            "stateful_median_hop_latency_ms": (
                round(float(np.median(sf_lat)) * 1e3, 2) if sf_lat else None
            ),
            "stream_wall_s": round(time.time() - t2, 1),
        }

    summary = {
        "corpus_profile": PROFILE,
        "epochs": EPOCHS,
        "ckpt_epoch": ckpt_epoch,
        "batch": BATCH,
        "pallas_trunk": PALLAS,
        "train_utterances": TR_UTTS,
        "dynamic_mix": bool(int(os.environ.get("DM", "0"))),
        "lr_sched": os.environ.get("LR_SCHED", "const"),
        "history_loss": [round(x, 3) for x in result.history["loss"]],
        "history_val_loss": [round(x, 3) for x in result.history["val_loss"]],
        "train_wall_s": round(train_s, 1),
        "serve_wall_s": round(serve_s, 1),
        "serve_audio_s": round(audio_s, 1),
        "heldout_test_si_sdr_db": round(si, 3),
        "heldout_test_si_sdri_db": round(si_i, 3),
        "causal": causal,
        "streaming": stream_stats,
    }
    (OUT / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
