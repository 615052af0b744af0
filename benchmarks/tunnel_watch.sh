#!/bin/bash
# Poll the axon TPU tunnel; the moment jax.devices() answers, fire the
# round-3 measurement queue (run_queue_r3.sh). Designed to sit in a tmux
# session for hours. Logs to MEASURE_r3/tunnel_watch.log.
set -u
cd "$(dirname "$0")/.."
mkdir -p MEASURE_r3
LOG=MEASURE_r3/tunnel_watch.log
echo "[$(date -u +%H:%M:%S)] tunnel watch started" | tee -a "$LOG"
while true; do
  if timeout 240 python -c "import jax; d=jax.devices(); assert d; print(d)" >>"$LOG" 2>&1; then
    echo "[$(date -u +%H:%M:%S)] TUNNEL UP — running queue" | tee -a "$LOG"
    bash benchmarks/run_queue_r3.sh 2>&1 | tee -a "$LOG"
    echo "[$(date -u +%H:%M:%S)] queue finished" | tee -a "$LOG"
    break
  fi
  echo "[$(date -u +%H:%M:%S)] tunnel still down; retry in 300s" | tee -a "$LOG"
  sleep 300
done
