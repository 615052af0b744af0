#!/bin/bash
# Round-5 queue B: the verify drive for post-drive-A changes and a bench.py
# dry run (sanity for pct_of_floor + nav_v256 before the driver's
# end-of-round run).
set -u
cd "$(dirname "$0")/.."
mkdir -p MEASURE_r5
timeout 570 python benchmarks/drive_r5c.py > MEASURE_r5/drive_r5c.out 2>&1
timeout 3600 python bench.py > MEASURE_r5/bench_dryrun.json 2> MEASURE_r5/bench_dryrun.err
