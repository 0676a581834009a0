#!/bin/bash
# Round-4 on-chip work queue (run when the axon relay is back).
# Jobs run SEQUENTIALLY — the relay serves one client. Each job appends to
# /tmp/r4_queue.log and tolerates individual failures.
#
# Long stages are CHUNKED: every chunk resumes from the newest checkpoint,
# pins the cosine horizon via SCHED_EPOCHS, and ends with held-out
# serving + eval + summary.json — so a relay drop or timeout mid-queue
# still leaves a complete measured artifact from the last finished chunk.
#
# R4_DEADLINE (epoch seconds, optional): stop starting jobs within ~25 min
# of it and clamp every job's timeout to the remaining window — the round
# driver needs the relay to itself for its end-of-round bench.py run.
#
# Usage: bash scripts/r4_chip_queue.sh [stage...]   (default: all stages)
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

STAGES="${*:-bench codec_gumbel flagship causal s3 prior mfu codec_rest}"

for s in $STAGES; do case $s in
  bench)
    # sanity: new probe/watchdog/MFU plumbing on the real chip
    run bench 2500 python bench.py
    ;;
  codec_gumbel)
    # VERDICT item 3: the one codec generation not measurable on CPU
    # (sample-level 5.1M-param stack, ~6-9 s/step on the 1-CPU host)
    run codec_gumbel 1800 env EVAL_EVERY=400 \
      python scripts/codec_quality_run.py 4000 gumbel
    ;;
  codec_rest)
    # re-confirm the CPU-measured generations on chip (dB is backend-
    # independent; this adds honest chip wall clocks to the table)
    run codec_v2 1800 python scripts/codec_quality_run.py 4000 v2
    run codec_t2 1800 python scripts/codec_quality_run.py 6000 t2
    ;;
  flagship)
    # VERDICT item 2: converge 2-speaker hard (DM + cosine + clip, Pallas
    # trunk). 5 chunks x 30 epochs; each ends with heldout serving + eval.
    for i in 1 2 3 4 5; do
      run tasnet_hard_dm_$i 7200 env PROFILE=hard DM=1 INT16=1 \
        LR_SCHED=cosine WARMUP=500 SCHED_EPOCHS=150 CLIP=5 RESUME=1 \
        TR_UTTS=5000 OUT_TAG=5kdm \
        python scripts/tasnet_corpus_run.py /tmp/data_scale/corpus_hard5k 30 pallas 32 \
        || break
    done
    ;;
  causal)
    # VERDICT item 4: causal config trained on hard, streamed vs offline
    # (each chunk re-runs the hop-by-hop streaming eval on the test split)
    for i in 1 2 3; do
      run causal_hard_$i 7200 env PROFILE=hard DM=1 INT16=1 \
        LR_SCHED=cosine WARMUP=500 SCHED_EPOCHS=90 CLIP=5 CAUSAL=1 \
        RESUME=1 OUT_TAG=causal \
        python scripts/tasnet_corpus_run.py /tmp/data_scale/corpus_hard 30 xla 16 \
        || break
    done
    ;;
  s3)
    # VERDICT item 6: 3-speaker at 5k utterances (int16 + clip + DM)
    for i in 1 2 3 4; do
      run s3_5k_$i 6500 env TR_UTTS=5000 INT16=1 CLIP=5 DM=1 \
        LR_SCHED=cosine SCHED_EPOCHS=80 RESUME=1 \
        python scripts/three_speaker_corpus_run.py /tmp/s3_corpus_5k 20 hard \
        || break
    done
    ;;
  prior)
    # VERDICT item 5: tokenizer + prior on hard-corpus token streams.
    # The CPU queue (scripts/r4_cpu_queue.sh) trains the same checkpoints
    # off-chip; these resume/refresh them on chip if there's time.
    run t3tok_hard 7200 python -m speech_separation_tpu.cli train \
      --workload vqvae --variant t3tok \
      --config scripts/r4_t3tok_hard_cfg.json \
      --data-root /tmp/data_scale/corpus_hard/wav8k/min \
      --epochs 12 --checkpoint-dir /tmp/t3tok_hard_ckpt --resume
    run prior_hard 7200 python -m speech_separation_tpu.cli prior-train \
      --codec-dir /tmp/t3tok_hard_ckpt \
      --config scripts/r4_prior_hard_cfg.json \
      --data-root /tmp/data_scale/corpus_hard/wav8k/min \
      --epochs 20 --checkpoint-dir /tmp/prior_hard_ckpt --resume
    run prior_sample 1800 python -m speech_separation_tpu.cli prior-sample \
      --prior-dir /tmp/prior_hard_ckpt --seconds 2 --temperature 0.8 \
      --out /tmp/prior_hard_sample.wav
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
