#!/bin/bash
# Round-4 on-chip work queue (run when the axon relay is back).
# Jobs run SEQUENTIALLY — the relay serves one client. Each job appends to
# /tmp/r4_queue.log and tolerates individual failures.
# Usage: bash scripts/r4_chip_queue.sh [stage...]   (default: all stages)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_queue.log
run() {
  local name="$1"; shift
  echo "=== [$name] $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
  "$@" >>"$LOG" 2>&1
  echo "=== [$name] rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

STAGES="${*:-bench codecs flagship causal s3 prior}"

for s in $STAGES; do case $s in
  bench)
    # sanity: new probe/watchdog/MFU plumbing on the real chip
    run bench timeout 2500 python bench.py
    ;;
  codecs)
    # VERDICT item 3: the three unmeasured codec generations (fixture protocol)
    run codec_gumbel timeout 1800 python scripts/codec_quality_run.py 4000 gumbel
    run codec_v2     timeout 1800 python scripts/codec_quality_run.py 4000 v2
    run codec_t2     timeout 1800 python scripts/codec_quality_run.py 6000 t2
    ;;
  flagship)
    # VERDICT item 2: converge 2-speaker hard (DM + cosine + clip, Pallas trunk)
    run tasnet_hard_dm env PROFILE=hard DM=1 INT16=1 LR_SCHED=cosine WARMUP=500 \
      CLIP=5 RESUME=1 TR_UTTS=5000 OUT_TAG=5kdm timeout 28000 \
      python scripts/tasnet_corpus_run.py /tmp/data_scale/corpus_hard5k 150 pallas 32
    ;;
  causal)
    # VERDICT item 4: causal config trained on hard, streamed vs offline
    run causal_hard env PROFILE=hard DM=1 INT16=1 LR_SCHED=cosine WARMUP=500 \
      CLIP=5 CAUSAL=1 RESUME=1 OUT_TAG=causal timeout 18000 \
      python scripts/tasnet_corpus_run.py /tmp/data_scale/corpus_hard 120 xla 16
    ;;
  s3)
    # VERDICT item 6: 3-speaker at 5k utterances (int16 + clip + DM via CLI cfg)
    run s3_5k env TR_UTTS=5000 INT16=1 CLIP=5 DM=1 LR_SCHED=cosine timeout 22000 \
      python scripts/three_speaker_corpus_run.py /tmp/s3_corpus_5k 80 hard
    ;;
  prior)
    # VERDICT item 5: tokenizer + prior on hard-corpus token streams (CLI surface)
    run t3tok_hard timeout 7200 python -m speech_separation_tpu.cli train \
      --workload vqvae --variant t3tok \
      --config scripts/r4_t3tok_hard_cfg.json \
      --data-root /tmp/data_scale/corpus_hard/wav8k/min \
      --epochs 12 --checkpoint-dir /tmp/t3tok_hard_ckpt
    run prior_hard timeout 7200 python -m speech_separation_tpu.cli prior-train \
      --codec-dir /tmp/t3tok_hard_ckpt \
      --config scripts/r4_prior_hard_cfg.json \
      --data-root /tmp/data_scale/corpus_hard/wav8k/min \
      --epochs 20 --checkpoint-dir /tmp/prior_hard_ckpt
    run prior_sample timeout 1800 python -m speech_separation_tpu.cli prior-sample \
      --prior-dir /tmp/prior_hard_ckpt --seconds 2 --temperature 0.8 \
      --out /tmp/prior_hard_sample.wav
    ;;
esac; done
echo "queue done" | tee -a "$LOG"
