#!/bin/bash
# Round-5 CPU prep: restore the round-4 t3tok hard-corpus checkpoint from
# artifacts/ and pre-generate every corpus the chip queue needs, so chip
# wall-clock is never spent on host-side data generation (/tmp was wiped
# between rounds — VERDICT r4 weak #4 showed what that costs).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_prep.log
{
  echo "=== prep start $(date -u +%H:%M:%S)"
  if [ ! -d /tmp/t3tok_hard_ckpt/38 ]; then
    mkdir -p /tmp/t3tok_hard_ckpt
    tar xzf artifacts/t3tok_hard/ckpt_ep38.tgz -C /tmp/t3tok_hard_ckpt
    cp artifacts/t3tok_hard/train_config.json artifacts/t3tok_hard/metrics.jsonl \
      /tmp/t3tok_hard_ckpt/
    echo "t3tok ckpt restored"
  fi
  python - <<'EOF'
import pathlib, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")  # never touch the relay from prep
from speech_separation_tpu.data import make_synthetic_librimix
from speech_separation_tpu.data.fixture import make_synthetic_fixture

def gen_librimix(root, tr_utts):
    if pathlib.Path(root).exists():
        print(f"{root}: exists, skipping", flush=True); return
    t0 = time.time()
    make_synthetic_librimix(
        root,
        utterances={"dev": 50, "test": 50, "train-100": 200, "train-360": tr_utts},
        min_seconds=2.0, max_seconds=6.0, profile="hard",
        bands=("wav8k",), conditions=("min",),
    )
    print(f"{root}: {time.time()-t0:.1f}s", flush=True)

# order = queue dependency order: causal+prior corpus first, then flagship 5k,
# then the 3-speaker fixture (exact same args the runners use, so the
# ROOT.exists() checks in the runners skip regeneration)
gen_librimix("/tmp/data_scale/corpus_hard", 1700)
gen_librimix("/tmp/data_scale/corpus_hard5k", 5000)
s3 = pathlib.Path("/tmp/s3_corpus_5k/fixture")
if not s3.exists():
    t0 = time.time()
    make_synthetic_fixture(
        s3, utterances_per_split={"tr": 5000, "cv": 50, "tt": 50},
        num_speakers=3, profile="hard",
        min_seconds=2.0, max_seconds=4.0, seed=7,
    )
    print(f"{s3}: {time.time()-t0:.1f}s", flush=True)
EOF
  echo "=== prep done $(date -u +%H:%M:%S)"
  touch /tmp/r5_prep_done
} >>"$LOG" 2>&1
