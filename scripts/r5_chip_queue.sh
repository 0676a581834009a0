#!/bin/bash
# Round-5 on-chip work queue (run when the axon relay answers).
#
# Differences from round 4's queue (scripts/r4_chip_queue.sh forwards here):
# - INTERLEAVED chunks: the round-4 order would let the 5-chunk flagship run
#   eat a partial TPU window whole, leaving causal/3-speaker/MFU/prior with
#   zero measurements (that is exactly how rounds 3-4 slipped). Here every
#   VERDICT ask gets one resume-safe chunk before any ask gets its second.
# - Each corpus chunk still ends with held-out serving + eval + summary.json,
#   so a relay drop mid-queue leaves complete artifacts from finished chunks.
# - harvest(): summaries/metrics copy into artifacts/ immediately (committed
#   by the session or the end-of-round driver) — round 4 lost a finished
#   measurement to /tmp.
#
# R4_DEADLINE (epoch seconds, optional): stop starting jobs within ~25 min of
# it and clamp every job's timeout to the remaining window — the round driver
# needs the relay to itself for its end-of-round bench.py run.
#
# Usage: bash scripts/r5_chip_queue.sh [stage...]   (default: all, interleaved)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_queue.log
DEADLINE=${R4_DEADLINE:-0}
left() { if [ "$DEADLINE" -gt 0 ]; then echo $(( DEADLINE - $(date +%s) )); else echo 999999; fi; }
run() {
  # run NAME BUDGET_S CMD... — timeout = min(budget, time-to-deadline − 1500s)
  local name="$1" budget="$2"; shift 2
  local l; l=$(left)
  if [ $(( l - 1500 )) -le 300 ]; then
    echo "=== [$name] SKIPPED (${l}s to deadline)" | tee -a "$LOG"; return 1
  fi
  if [ "$budget" -gt $(( l - 1500 )) ]; then budget=$(( l - 1500 )); fi
  echo "=== [$name] $(date -u +%H:%M:%S) budget=${budget}s $*" | tee -a "$LOG"
  timeout "$budget" "$@" >>"$LOG" 2>&1
  echo "=== [$name] rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
}
harvest() {
  # harvest NAME SRC_DIR — snapshot a run's summary/metrics into artifacts/
  local name="$1" src="$2"
  [ -f "$src/summary.json" ] && cp "$src/summary.json" "artifacts/${name}_summary.json"
  [ -f "$src/metrics.jsonl" ] && cp "$src/metrics.jsonl" "artifacts/${name}_metrics.jsonl"
  return 0
}

flagship_chunk() {  # one 30-epoch resume-safe chunk of the 5k DM flagship
  run "tasnet_hard_dm_$1" 7200 env PROFILE=hard DM=1 INT16=1 \
    LR_SCHED=cosine WARMUP=500 SCHED_EPOCHS=150 CLIP=5 RESUME=1 \
    TR_UTTS=5000 OUT_TAG=5kdm \
    python scripts/tasnet_corpus_run.py /tmp/data_scale/corpus_hard5k 30 pallas 32
  harvest tasnet_hard_5kdm /tmp/tasnet_corpus_hard_5kdm
}
causal_chunk() {    # self-contained 45-epoch causal run + streaming eval
  # (retuned mid-round-5: /tmp wipe lost all resume state, so chunked
  #  90-epoch horizons would leave the cosine forever unfinished — run
  #  one complete 45-epoch schedule instead; batch 32 for throughput)
  run "causal_hard_$1" 4500 env PROFILE=hard DM=1 INT16=1 \
    LR_SCHED=cosine WARMUP=200 SCHED_EPOCHS=45 CLIP=5 CAUSAL=1 \
    RESUME=1 OUT_TAG=causal \
    python scripts/tasnet_corpus_run.py /tmp/data_scale/corpus_hard 45 xla 32
  harvest tasnet_hard_causal /tmp/tasnet_corpus_hard_causal
}
s3_chunk() {        # self-contained 20-epoch 3-speaker run at 5k utterances
  run "s3_5k_$1" 4500 env TR_UTTS=5000 INT16=1 CLIP=5 DM=1 \
    LR_SCHED=cosine SCHED_EPOCHS=20 RESUME=1 \
    python scripts/three_speaker_corpus_run.py /tmp/s3_corpus_5k 20 hard
  harvest three_speaker_5k /tmp/s3_corpus_5k
}

STAGES="${*:-bench codec_gumbel mfu flagship_1 causal_1 s3_1 prior dm_ab flagship_2 causal_2 s3_2 flagship_3 causal_3 s3_3 flagship_4 s3_4 flagship_5 codec_rest}"

for s in $STAGES; do case $s in
  bench)
    # sanity + this round's permanent perf record; persists last_good artifact
    run bench 2500 python bench.py
    ;;
  codec_gumbel)
    # VERDICT item 5: the one codec generation not measurable on CPU
    # (sample-level 5.1M-param stack, ~6-9 s/step on the 1-CPU host)
    run codec_gumbel 2400 env EVAL_EVERY=400 \
      python scripts/codec_quality_run.py 4000 gumbel
    ;;
  codec_rest)
    # re-confirm the CPU-measured generations on chip (dB is backend-
    # independent; this adds honest chip wall clocks to the table)
    run codec_v2 1800 python scripts/codec_quality_run.py 4000 v2
    run codec_t2 1800 python scripts/codec_quality_run.py 6000 t2
    ;;
  flagship_*) flagship_chunk "${s#flagship_}" ;;
  causal_*)   causal_chunk "${s#causal_}" ;;
  s3_*)       s3_chunk "${s#s3_}" ;;
  prior)
    # VERDICT item 2: CodePrior on the round-4 CPU-trained t3tok codec's
    # token streams (checkpoint restored from artifacts/t3tok_hard by
    # scripts/r5_prep.sh — best val 248.19 @ ep38, 40 CPU epochs; the
    # optional 12-epoch chip refresh is dropped: chip time goes to the
    # flagship convergence chunks instead) + sampled audio
    run prior_hard 5400 python -m speech_separation_tpu.cli prior-train \
      --codec-dir /tmp/t3tok_hard_ckpt \
      --config scripts/r4_prior_hard_cfg.json \
      --data-root /tmp/data_scale/corpus_hard/wav8k/min \
      --epochs 20 --checkpoint-dir /tmp/prior_hard_ckpt --resume
    run prior_sample 1800 python -m speech_separation_tpu.cli prior-sample \
      --prior-dir /tmp/prior_hard_ckpt --seconds 2 --temperature 0.8 \
      --out /tmp/prior_hard_sample.wav
    harvest t3tok_hard /tmp/t3tok_hard_ckpt
    harvest prior_hard /tmp/prior_hard_ckpt
    ;;
  dm_ab)
    # VERDICT item 3's ablation row: dynamic mixing on/off at MATCHED
    # epochs/corpus/schedule (the 144-epoch round-3 run is DM-off but
    # unmatched). 24 epochs each (trimmed mid-round-5 to fit the window),
    # fresh starts, same completed cosine horizon.
    run dm_ab_off 2400 env PROFILE=hard DM=0 INT16=1 \
      LR_SCHED=cosine WARMUP=100 SCHED_EPOCHS=24 CLIP=5 OUT_TAG=ab_nodm \
      python scripts/tasnet_corpus_run.py /tmp/data_scale/corpus_hard 24 pallas 32
    harvest tasnet_hard_ab_nodm /tmp/tasnet_corpus_hard_ab_nodm
    run dm_ab_on 2400 env PROFILE=hard DM=1 INT16=1 \
      LR_SCHED=cosine WARMUP=100 SCHED_EPOCHS=24 CLIP=5 OUT_TAG=ab_dm \
      python scripts/tasnet_corpus_run.py /tmp/data_scale/corpus_hard 24 pallas 32
    harvest tasnet_hard_ab_dm /tmp/tasnet_corpus_hard_ab_dm
    ;;
  mfu)
    # VERDICT item 7: decompose the BLSTM recurrence ceiling + TasNet
    # train-step TFLOP/s on chip
    run ceiling 2400 env B=32 T=500 \
      python scripts/blstm_kernel_ceiling_bench.py
    run tasnet_train_mfu 2400 env B=64 \
      python scripts/tasnet_pallas_train_bench.py
    run mfu_sweep 2400 python scripts/train_mfu_sweep.py 32 8
    ;;
esac; done
echo "queue done" | tee -a "$LOG"
