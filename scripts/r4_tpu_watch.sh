#!/bin/bash
# Poll the axon TPU relay; the moment it answers, run the chip queue.
# Detach with setsid so it survives the driving session:
#   setsid nohup bash scripts/r4_tpu_watch.sh >/dev/null 2>&1 &
# The probe runs in a subprocess under timeout because jax.devices() on
# the axon backend blocks forever while the relay is down.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_queue.log
# Hard stop for chip work: the round driver needs the relay to itself for
# its end-of-round bench.py. Default horizon: 11 h from watcher start;
# override with R4_DEADLINE (epoch seconds).
ps -o pgid= -p $$ | tr -d ' ' > /tmp/r4_watch.pid
export R4_DEADLINE=${R4_DEADLINE:-$(( $(date +%s) + 11 * 3600 ))}
echo "[watch] $(date -u +%H:%M:%S) watcher start (pid $$, $(( R4_DEADLINE - $(date +%s) ))s to deadline)" >>"$LOG"
while true; do
  if [ $(( R4_DEADLINE - $(date +%s) )) -le 1800 ]; then
    echo "[watch] $(date -u +%H:%M:%S) deadline reached, TPU never answered" >>"$LOG"
    exit 0
  fi
  if timeout 150 python -c "import jax; d = jax.devices(); raise SystemExit(0 if d[0].platform == 'tpu' else 1)" >/dev/null 2>&1; then
    echo "[watch] $(date -u +%H:%M:%S) TPU UP — launching chip queue" >>"$LOG"
    # The chip queue supersedes the CPU fallback queue AND would otherwise
    # race it on the shared /tmp/t3tok_hard_ckpt orbax dir — stop the CPU
    # queue's process group first (recorded setsid leaders, never patterns).
    for pf in /tmp/r4_cpu_queue.pid /tmp/r4_cpu_chain.pid; do
      if [ -f "$pf" ]; then
        pg=$(cat "$pf")
        kill -TERM -- "-$pg" 2>/dev/null && \
          echo "[watch] stopped cpu queue group $pg ($pf)" >>"$LOG"
      fi
    done
    sleep 5
    bash scripts/r4_chip_queue.sh ${R4_STAGES:-}
    echo "[watch] $(date -u +%H:%M:%S) chip queue finished" >>"$LOG"
    break
  fi
  echo "[watch] $(date -u +%H:%M:%S) down" >>"$LOG"
  sleep 280
done
