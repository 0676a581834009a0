"""3-speaker separation at corpus scale: train → separate → evaluate.

The round-2 VERDICT's 3-speaker loop ran on 8 utterances — enough to prove
the n-speaker machinery (PIT table, chunk stitcher, n-ary evaluate) but
not generalization. This run trains Conv-TasNet S=3 on a 400-utterance
hard-profile corpus-shaped fixture and scores the held-out ``tt`` split,
all through the product CLI surface (the reference is strictly 2-speaker —
beyond-parity: `uPIT_baseline.ipynb cell 29` fixes S=2).

Usage: python scripts/three_speaker_corpus_run.py [OUT_DIR] [EPOCHS] [PROFILE]
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from speech_separation_tpu import cli
from speech_separation_tpu.data import make_synthetic_fixture
from speech_separation_tpu.evaluate import evaluate_directory

OUT = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else pathlib.Path("/tmp/s3_corpus")
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 80
PROFILE = sys.argv[3] if len(sys.argv) > 3 else "hard"
# TR_UTTS: training-corpus size (the 400-utterance default run overfit by
# epoch ~26 — see RESULTS.md; larger corpora probe the data-starvation wall)
SPLITS = {"tr": int(os.environ.get("TR_UTTS", "400")), "cv": 50, "tt": 50}


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    fixture = OUT / "fixture"
    if not fixture.exists():
        t0 = time.time()
        make_synthetic_fixture(
            fixture, utterances_per_split=SPLITS, num_speakers=3, profile=PROFILE,
            min_seconds=2.0, max_seconds=4.0, seed=7,
        )
        print(json.dumps({"stage": "gen", "wall_s": round(time.time() - t0, 1)}),
              flush=True)

    ckpt = OUT / "ckpt"
    cfg_path = OUT / "cfg.json"
    cfg_path.write_text(json.dumps({
        "num_speakers": 3,
        "batch_size": 8,
        "bf16_compute": True,
        "patience": 10**9,
        "seed": 0,
        # round-3 product features, both measured elsewhere: int16 link
        # transfer (bit-exact, RESULTS.md) and spike-bounding grad clipping
        "transfer_int16": bool(int(os.environ.get("INT16", "0"))),
        "grad_clip_norm": float(os.environ.get("CLIP", "0")),
        # DM=1: dynamic mixing (re-paired sources + fresh gains per epoch) —
        # the ~N^2-combination lever for the data-starved 3-speaker regime
        "dynamic_mix": bool(int(os.environ.get("DM", "0"))),
        "lr_schedule": os.environ.get("LR_SCHED", "default"),
        # SCHED_EPOCHS pins the cosine horizon for chunked RESUME=1 queues
        # (fit trains EPOCHS *more* per invocation; the restored optimizer
        # step keeps counting globally — see scripts/tasnet_corpus_run.py)
        "sched_epochs": int(os.environ.get("SCHED_EPOCHS", "0")),
    }))
    t0 = time.time()
    cli.main([
        "train", "--config", str(cfg_path), "--workload", "upit",
        "--variant", "tasnet", "--data-root", str(fixture),
        "--epochs", str(EPOCHS), "--checkpoint-dir", str(ckpt),
        *(["--resume"] if int(os.environ.get("RESUME", "0")) else []),
    ])
    train_s = time.time() - t0

    results = {
        "profile": PROFILE, "epochs": EPOCHS, "splits": SPLITS,
        "num_speakers": 3, "train_wall_s": round(train_s, 1),
    }
    for tag, extra in [
        ("full", []),
        ("chunked", ["--chunk-seconds", "1.5", "--chunk-overlap-seconds", "0.375"]),
    ]:
        sep = OUT / f"sep_{tag}"
        cli.main([
            "separate", "--checkpoint-dir", str(ckpt), "--data-root", str(fixture),
            "--split", "tt", "--out-dir", str(sep), *extra,
        ])
        _, agg = evaluate_directory(fixture, sep, split="tt")
        results[tag] = {k: round(v, 2) for k, v in agg.items()}
        print(json.dumps({tag: results[tag]}), flush=True)

    (OUT / "summary.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
