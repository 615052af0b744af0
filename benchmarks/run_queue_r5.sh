#!/bin/bash
# Round-5 measurement queue (armed behind the tunnel watcher when the axon
# tunnel died mid-round): the remaining structured auto-core re-pin point
# and the reversible-backward pricing. Cheaper --t-dense than the default
# (the N=512 compile at T=640 was in flight when the tunnel stalled; 64/320
# compiles are ~4x smaller and both divide TRAIN_REMAT_CHUNK=32).
set -u
cd "$(dirname "$0")/.."
mkdir -p MEASURE_r5
python benchmarks/state_churn.py --structured --n 512 --t-dense 64 320 \
  > MEASURE_r5/structured_n512.log 2>&1
python benchmarks/state_churn.py --reverse --t-dense 64 320 \
  > MEASURE_r5/reverse_n128.log 2>&1
python benchmarks/state_churn.py --reverse --n 512 --t-dense 64 320 \
  > MEASURE_r5/reverse_n512.log 2>&1
# fifth SpMM family (scalar loop) vs the same-pass onehot/f32x2 references
python benchmarks/spmm_variants.py \
  --skip xla_sorted,xla_sorted_hint,xla_cumsum,pallas_win,pallas_win_bf16,pallas_seg \
  > MEASURE_r5/spmm_prefetch.log 2>&1
