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

STAGES="${*:-bench codec_gumbel flagship causal s3 prior mfu codec_rest}"

for s in $STAGES; do case $s in
  bench)
    # sanity: new probe/watchdog/MFU plumbing on the real chip
    run bench timeout 2500 python bench.py
    ;;
  codec_gumbel)
    # VERDICT item 3: the one codec generation not measurable on CPU
    # (sample-level 5.1M-param stack, ~6-9 s/step on the 1-CPU host)
    run codec_gumbel env EVAL_EVERY=400 timeout 1800 \
      python scripts/codec_quality_run.py 4000 gumbel
    ;;
  codec_rest)
    # re-confirm the CPU-measured generations on chip (dB is backend-
    # independent; this adds honest chip wall clocks to the table)
    run codec_v2 timeout 1800 python scripts/codec_quality_run.py 4000 v2
    run codec_t2 timeout 1800 python scripts/codec_quality_run.py 6000 t2
    ;;
  flagship)
    # VERDICT item 2: converge 2-speaker hard (DM + cosine + clip, Pallas
    # trunk). 5 chunks x 30 epochs; each ends with heldout serving + eval.
    for i in 1 2 3 4 5; do
      run tasnet_hard_dm_$i env PROFILE=hard DM=1 INT16=1 LR_SCHED=cosine \
        WARMUP=500 SCHED_EPOCHS=150 CLIP=5 RESUME=1 TR_UTTS=5000 \
        OUT_TAG=5kdm timeout 7200 \
        python scripts/tasnet_corpus_run.py /tmp/data_scale/corpus_hard5k 30 pallas 32
    done
    ;;
  causal)
    # VERDICT item 4: causal config trained on hard, streamed vs offline
    for i in 1 2 3; do
      run causal_hard_$i env PROFILE=hard DM=1 INT16=1 LR_SCHED=cosine \
        WARMUP=500 SCHED_EPOCHS=120 CLIP=5 CAUSAL=1 RESUME=1 \
        OUT_TAG=causal timeout 7200 \
        python scripts/tasnet_corpus_run.py /tmp/data_scale/corpus_hard 40 xla 16
    done
    ;;
  s3)
    # VERDICT item 6: 3-speaker at 5k utterances (int16 + clip + DM)
    for i in 1 2 3 4; do
      run s3_5k_$i env TR_UTTS=5000 INT16=1 CLIP=5 DM=1 LR_SCHED=cosine \
        SCHED_EPOCHS=80 RESUME=1 timeout 6500 \
        python scripts/three_speaker_corpus_run.py /tmp/s3_corpus_5k 20 hard
    done
    ;;
  prior)
    # VERDICT item 5: tokenizer + prior on hard-corpus token streams.
    # The CPU queue (scripts/r4_cpu_queue.sh) trains the same checkpoints
    # off-chip; these resume/refresh them on chip if there's time.
    run t3tok_hard timeout 7200 python -m speech_separation_tpu.cli train \
      --workload vqvae --variant t3tok \
      --config scripts/r4_t3tok_hard_cfg.json \
      --data-root /tmp/data_scale/corpus_hard/wav8k/min \
      --epochs 12 --checkpoint-dir /tmp/t3tok_hard_ckpt --resume
    run prior_hard timeout 7200 python -m speech_separation_tpu.cli prior-train \
      --codec-dir /tmp/t3tok_hard_ckpt \
      --config scripts/r4_prior_hard_cfg.json \
      --data-root /tmp/data_scale/corpus_hard/wav8k/min \
      --epochs 20 --checkpoint-dir /tmp/prior_hard_ckpt
    run prior_sample timeout 1800 python -m speech_separation_tpu.cli prior-sample \
      --prior-dir /tmp/prior_hard_ckpt --seconds 2 --temperature 0.8 \
      --out /tmp/prior_hard_sample.wav
    ;;
  mfu)
    # VERDICT item 7: decompose the BLSTM recurrence ceiling + TasNet
    # train-step TFLOP/s on chip
    run ceiling env B=32 T=500 timeout 2400 \
      python scripts/blstm_kernel_ceiling_bench.py
    run tasnet_train_mfu env B=64 timeout 2400 \
      python scripts/tasnet_pallas_train_bench.py
    run mfu_sweep timeout 2400 python scripts/train_mfu_sweep.py 32 8
    ;;
esac; done
echo "queue done" | tee -a "$LOG"
