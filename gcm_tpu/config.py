"""Global backend knobs for gcm_tpu."""

from __future__ import annotations

import os

import jax

# Opt-in jaxtyping shape contracts on the public API (utils/contracts.py).
# Fires once per trace; zero compiled-path cost.
TYPECHECK: bool = os.environ.get("GCM_TYPECHECK", "") not in ("", "0")

# "auto": Pallas kernels on TPU, XLA fallbacks elsewhere.
# True/False force the choice (tests force False to pin fallback parity).
USE_PALLAS: bool | str = "auto"

# Dense graph conv: slope-timed measurements (TPU v5e) show XLA's batched
# einsum beats the per-block Pallas kernel at every practical size
# (B32/N128/F32: 25 vs 32us per scan step; B32/N512/F128: 25 vs 78us per
# 2-layer conv) — XLA batches the whole [B,N,N]@[B,N,F] onto the MXU at
# once. The Pallas path is kept for experimentation but defaults off.
PALLAS_DENSE_GCONV = False

# The banded cores (BandedRingGCM / BandedScoredGCM) compute each conv
# layer's tail as lin_rel(agg) + lin_root(h). True merges the two matmuls
# into one over the concatenated input (nn/dense_conv.py::conv_project) — a
# candidate for the overhead-dominated scan regime, pending TPU measurement
# (benchmarks/scan_opt.py). Default off until measured. (CliqueGCM is
# unaffected: its rel term is a [B,F] matmul with a different leading shape
# than the [B,N,F] root — the two cannot merge.)
MERGED_CONV_PROJ: bool = False

# Heuristic bounds: the one-hot-matmul SpMM trades FLOPs for MXU residency.
# Round-3 re-measurement (benchmarks/spmm_crossover.py + gate_hygiene.py,
# TPU v5e): the Pallas kernel wins 5-10x at EVERY measured point down to
# E*N=32768 (B=32 N=128 E=256), including the round-2 calibration point
# where XLA had won (N=128, E=512: now 0.022 vs 0.210 ms) — the old 1e6
# threshold was stale. Floor kept at half the smallest measured win so
# unmeasured micro-shapes stay on XLA.
PALLAS_SPMM_MAX_NODES = 1024
PALLAS_SPMM_MIN_WORK = 16_384  # E * N threshold

# SpMM one-hot kernel accuracy/speed point: 'default' rides the environment
# matmul precision (single-pass bf16 on this TPU: fastest, ~5e-2 max err —
# NOTE the env default applies to XLA's f32 matmuls too, so this is not a
# precision downgrade vs the fallback), 'f32x2' is the error-compensated
# 2-pass bf16 middle point (~1e-4), 'highest' the 3-pass exact form.
# Measured in BASELINE.md's SpMM variant table (benchmarks/spmm_variants.py).
SPMM_PRECISION: str = "default"

# lax.scan unroll factor used by every stepwise core when the caller passes
# unroll=None (bit-identical recurrence; parity pinned in
# tests/test_scan_opt.py). Measured round 3 (benchmarks/scan_opt.py + the
# --confirm variance check, TPU v5e): dense unroll=4 is +12-16% over
# unroll=1 across 6 measurements; banded deltas are within the ±10% run
# noise and never negative at 4. The first run's unroll=8 regression and
# +24% merged-proj interaction both failed to reproduce (artifacts).
SCAN_UNROLL: int = 4

# Ring core fused step: compose slot eviction + every selector's row/column
# write into ONE elementwise [B,N,N] adjacency rewrite per step, instead of
# the 3-4 scatter/dynamic-update-slice rewrites the round-3 trace showed
# dominating the scan (31% one DUS + 13% carry copies; MEASURE_r3). The
# rewrite is pointwise in the old adjacency, so XLA can alias the scan-carry
# buffer in place. Bit-identical to the unfused path
# (tests/test_ring_gcm.py::TestFusedStep). Measured round 4 (TPU v5e,
# flagship temporal config, MEASURE_r4/state_churn): 6.41M timesteps/s at
# unroll=1 vs 2.07M unfused — 3.1x, 58% of the [B,N,N]-carry HBM roofline.
RING_FUSED_STEP: bool = True

# Dense core fused step: wraparound shift + insert + every selector write
# composed into ONE select per array (the dense-core mirror of
# RING_FUSED_STEP at the logical index; models/dense_gcm.py::_call_fused).
# Bitwise-identical (tests/test_dense_gcm.py::TestFusedDenseStep). Measured
# round 4 (TPU v5e, flagship config, MEASURE_r4/dense_fused): 7.82M
# timesteps/s at unroll=4 vs 2.68M unfused — 2.9x; train 1.31M vs 1.17M.
# Unlike the ring core it prefers unroll=4 (the wrap-shift gather precludes
# in-place carry aliasing, so unrolling amortizes instead of breaking it);
# the global SCAN_UNROLL=4 already covers that. Unsupported custom
# selectors fall back to the unfused path automatically.
DENSE_FUSED_STEP: bool = True

# Training-side chunked checkpointing cap (scan remat=K): the backward's
# dominant cost is the per-step [B,N,N] carry residual; saving it only at
# chunk boundaries measured +50-85% fwd+bwd on the ring core across 3
# passes (MEASURE_r4/bwd_breakdown2 + chunk_confirm: 1.43-1.95M vs
# 0.90-1.13M). Trainers pick the largest divisor of T up to this cap
# (rl/wrappers.py::train_remat_for); dense measured a wash, fast cores
# train through window().
TRAIN_REMAT_CHUNK: int = 32

# lax.scan unroll for the FUSED ring step specifically: the single pointwise
# rewrite aliases the carry in place, and unrolling breaks that (measured
# round 4: 6.41M at unroll=1 vs 4.14M at unroll=4). Other cores keep
# SCAN_UNROLL.
RING_SCAN_UNROLL: int = 1

# Grid-free edge emission gate: window-space scoring wins when the graph is
# at least EMIT_WINDOW_FACTOR x the effective window (measured crossover,
# edges/sparse_learned.py::emit_profitable; benchmarks/gate_hygiene.py
# re-measures it at other shapes).
EMIT_WINDOW_FACTOR = 4

# hop_cap='auto' gate: engage the gather-compacted k-hop subgraph only in
# its measured win regime (MEASURE_r4/hop_compact*: +25% at N=4096/F=128/
# cap=32; a wash at N=4096/F=32; masked wins at N<=1024). Auto derives the
# cap from selector structure (reach_bound_per_hop) and engages when the
# cap is at most N // HOP_AUTO_RATIO AND the per-layer GNN work proxy N*F
# is at least HOP_AUTO_MIN_NF (= the 4096*64 midpoint between the measured
# wash at 4096*32 and the win at 4096*128).
HOP_AUTO_RATIO: int = 8
HOP_AUTO_MIN_NF: int = 262_144

# nav_core() dispatch: NavGCM's full [B,V,V] recompute wins at small maps
# (V=128: 1.92M vs 1.55M ts/s); NavGCMIncremental's cached-causal O(tau*V)
# step wins 6.1x at V=512 (166k vs 1.02M; MEASURE_r4/nav_v512). The V=256
# point (MEASURE_r4b/nav_v256) pins the crossover; maps at or above this
# vertex count route to the incremental core.
NAV_INCREMENTAL_MIN_V: int = 256


_TUNABLE_KEYS = ("USE_PALLAS", "PALLAS_DENSE_GCONV", "MERGED_CONV_PROJ",
                 "PALLAS_SPMM_MAX_NODES", "PALLAS_SPMM_MIN_WORK",
                 "EMIT_WINDOW_FACTOR", "SCAN_UNROLL", "RING_FUSED_STEP",
                 "RING_SCAN_UNROLL", "SPMM_PRECISION", "TRAIN_REMAT_CHUNK",
                 "DENSE_FUSED_STEP", "HOP_AUTO_RATIO", "HOP_AUTO_MIN_NF",
                 "NAV_INCREMENTAL_MIN_V")


def apply_tuning(overrides: dict) -> None:
    """Override dispatch thresholds/flags from a measurement pass. Every
    gate above was measured on ONE chip generation at specific shapes
    (values recorded in BASELINE.md); a deployment on different hardware
    re-measures (benchmarks/gate_hygiene.py, scan_opt.py) and applies the
    result here — or drops it in a JSON file named by GCM_TUNE_FILE, loaded
    at import. Unknown keys raise: silently ignored typos would look like
    applied tuning."""
    g = globals()
    for k, v in overrides.items():
        if k not in _TUNABLE_KEYS:
            raise KeyError(
                f"unknown tuning key {k!r}; tunable: {_TUNABLE_KEYS}")
        g[k] = v


def load_tuning(path: str) -> None:
    import json

    with open(path) as f:
        apply_tuning(json.load(f))


_tune_file = os.environ.get("GCM_TUNE_FILE", "")
if _tune_file:
    load_tuning(_tune_file)


def use_pallas() -> bool:
    if USE_PALLAS == "auto":
        return jax.default_backend() == "tpu"
    return bool(USE_PALLAS)
