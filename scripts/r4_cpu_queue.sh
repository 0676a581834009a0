#!/bin/bash
# Round-4 CPU-only work queue — runs while the axon TPU relay is down.
# Strips PALLAS_AXON_POOL_IPS (so the axon plugin never registers) AND
# sets JAX_PLATFORMS=cpu (the kernel env pins it to "axon", which errors
# out once the plugin is absent) so jax runs on the host CPU. The quality
# numbers are backend-independent; wall clocks are not. Sequential +
# nice'd: this is a 1-CPU host and a chip-queue window must still win
# the machine.
#
# Stages: (1) finish the t3tok hard-corpus codec (VERDICT item 5 step 1),
# (2) train the CodePrior on its token streams + entropy calibration,
# (3) sample audio from the prior, (4) gumbel codec fallback at reduced
# steps (reference bar is only ~3.55 dB; the chip queue supersedes this
# with the full 4,000-step protocol if the relay returns).
# Launch detached: setsid nohup bash scripts/r4_cpu_queue.sh >/dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_cpu_queue.log
# self-register the process group so the TPU watcher can preempt this queue
# (under setsid, $$ is the group leader; kill -TERM -<pgid> stops the stage
# python too). Without this pid file the watcher's kill silently no-ops and
# the chip queue would race this queue on the shared orbax checkpoint dirs.
ps -o pgid= -p $$ | tr -d ' ' > /tmp/r4_cpu_queue.pid
CPU="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"
run() {
  local name="$1"; shift
  echo "=== [$name] $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
  nice -n 5 $CPU "$@" >>"$LOG" 2>&1
  echo "=== [$name] rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

STAGES="${*:-t3tok prior sample gumbel}"

for s in $STAGES; do case $s in
  t3tok)
    run t3tok_resume timeout 14400 python -m speech_separation_tpu.cli train \
      --workload vqvae --variant t3tok \
      --config scripts/r4_t3tok_hard_cfg.json \
      --data-root /tmp/data_scale/corpus_hard/wav8k/min \
      --epochs 40 --checkpoint-dir /tmp/t3tok_hard_ckpt --resume
    ;;
  prior)
    run prior_hard timeout 18000 python -m speech_separation_tpu.cli prior-train \
      --codec-dir /tmp/t3tok_hard_ckpt \
      --config scripts/r4_prior_hard_cfg.json \
      --data-root /tmp/data_scale/corpus_hard/wav8k/min \
      --epochs 20 --checkpoint-dir /tmp/prior_hard_ckpt
    ;;
  sample)
    run prior_sample timeout 3600 python -m speech_separation_tpu.cli prior-sample \
      --prior-dir /tmp/prior_hard_ckpt --seconds 2 --temperature 0.8 \
      --out /tmp/prior_hard_sample.wav
    ;;
  gumbel)
    run codec_gumbel_cpu env EVAL_EVERY=250 timeout 21600 \
      python scripts/codec_quality_run.py 1500 gumbel
    ;;
  causal_tiny)
    # VERDICT item 4 CPU fallback: a TRAINED causal model (TINY config,
    # 1,700-utt hard corpus) scored offline vs both streaming engines.
    # The chip queue's full-size `causal` stage supersedes this.
    run causal_tiny timeout 14400 env PROFILE=hard TINY=1 CAUSAL=1 DM=1 \
      CLIP=5 LR_SCHED=cosine WARMUP=200 RESUME=0 OUT_TAG=causaltiny_cpu \
      python scripts/tasnet_corpus_run.py /tmp/data_scale/corpus_hard 30 xla 16
    ;;
  dm_ab)
    # VERDICT item 2 support: dynamic mixing on/off A/B at equal budget
    # (TINY config, 400-utt hard corpus) — isolates the augmentation lever.
    run dm_on timeout 7200 env PROFILE=hard TINY=1 DM=1 CLIP=5 TR_UTTS=400 \
      LR_SCHED=cosine WARMUP=200 RESUME=0 OUT_TAG=dmab_on \
      python scripts/tasnet_corpus_run.py /tmp/data_scale/corpus_hard400 25 xla 16
    run dm_off timeout 7200 env PROFILE=hard TINY=1 DM=0 CLIP=5 TR_UTTS=400 \
      LR_SCHED=cosine WARMUP=200 RESUME=0 OUT_TAG=dmab_off \
      python scripts/tasnet_corpus_run.py /tmp/data_scale/corpus_hard400 25 xla 16
    ;;
esac; done
echo "cpu queue done" | tee -a "$LOG"
