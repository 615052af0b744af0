#!/bin/bash
# Round-3 measurement queue (ROADMAP.md): run everything that was blocked on
# the TPU tunnel, in one session, each under its own timeout, results into
# MEASURE_r3/. Safe to re-run; each step overwrites its own output file.
set -u
cd "$(dirname "$0")/.."
mkdir -p MEASURE_r3
echo "== tunnel check =="
timeout 240 python -c "import jax; print(jax.devices())" || {
  echo "TUNNEL DOWN — aborting"; exit 1; }

run() { # name, timeout_s, cmd...
  local name=$1 tmo=$2; shift 2
  echo "== $name =="
  timeout "$tmo" "$@" 2>&1 | tee "MEASURE_r3/$name.log"
  echo "-- $name exit: $? --"
}

run spmm_variants 1800 python benchmarks/spmm_variants.py
run nav_variants 1800 python benchmarks/nav_variants.py
run scan_breakdown 2400 python benchmarks/scan_breakdown.py --trace /tmp/scan_trace
run scan_opt 2400 python benchmarks/scan_opt.py
run gate_hygiene 1800 python benchmarks/gate_hygiene.py --emit-tune MEASURE_r3/tune.json
run serve_latency 1200 python benchmarks/serve_latency.py
run bench 3600 python bench.py
echo "ALL DONE"
