#!/bin/bash
# Round-4 measurement queue: everything blocked on the TPU tunnel, in one
# session, each under its own timeout, results into MEASURE_r4/. Safe to
# re-run; each step overwrites its own output file.
set -u
cd "$(dirname "$0")/.."
mkdir -p MEASURE_r4
echo "== tunnel check =="
timeout 240 python -c "import jax; print(jax.devices())" || {
  echo "TUNNEL DOWN — aborting"; exit 1; }

run() { # name, timeout_s, cmd...
  local name=$1 tmo=$2; shift 2
  echo "== $name =="
  timeout "$tmo" "$@" 2>&1 | tee "MEASURE_r4/$name.log"
  echo "-- $name exit: $? --"
}

# VERDICT #3: fused ring step / slice+pad wraparound
run state_churn 2400 python benchmarks/state_churn.py
# VERDICT #4: scan-free ring window on scored/learned selectors
run ring_window 2400 python benchmarks/state_churn.py --window
# ADVICE low: sparse/banded_scored unroll (never measured; SCAN_UNROLL=4
# defaulted them unmeasured)
run scan_unroll_sparse 2400 python benchmarks/scan_opt.py --sparse-unroll
# VERDICT #6: bf16-in/f32-accumulate SpMM variant
run spmm_bf16 1800 python benchmarks/spmm_variants.py
# VERDICT #9: banded-window 102M vs 41.6M reconciliation
run window_reconcile 1800 python benchmarks/window_reconcile.py
# VERDICT #8: backward-pass stage breakdown
run bwd_breakdown 2400 python benchmarks/bwd_breakdown.py
# VERDICT #10: SessionServer device-time isolation
run serve_latency 1200 python benchmarks/serve_latency.py --device-time
# headline
run bench 3600 python bench.py
echo "ALL DONE"
