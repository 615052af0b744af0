#!/bin/bash
# Poll the axon TPU tunnel; fire the round-5 queue when it answers.
set -u
cd "$(dirname "$0")/.."
mkdir -p MEASURE_r5
LOG=MEASURE_r5/tunnel_watch.log
echo "[$(date -u +%H:%M:%S)] tunnel watch started" | tee -a "$LOG"
while true; do
  if timeout 240 python -c "import jax; d=jax.devices(); x=jax.numpy.ones((8,8)); assert float(x.sum())==64.0; print(d)" >>"$LOG" 2>&1; then
    echo "[$(date -u +%H:%M:%S)] TUNNEL UP — running queue" | tee -a "$LOG"
    bash benchmarks/run_queue_r5b.sh 2>&1 | tee -a "$LOG"
    echo "[$(date -u +%H:%M:%S)] queue finished" | tee -a "$LOG"
    break
  fi
  echo "[$(date -u +%H:%M:%S)] tunnel still down; retry in 300s" | tee -a "$LOG"
  sleep 300
done
