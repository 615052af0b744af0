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

# Reversible backward for the fused scans (models/ring_reversible.py /
# dense_reversible.py): the training-side scan saves the [B,N,N] adjacency
# carry per step; the fused steps' rewrites are invertible from the evicted
# row/column (+ the wrap-dropped row/col 0 on the dense core), so the
# backward can reconstruct the carry in the reverse pass instead (residuals
# shrink O(B*N^2) -> O(B*(2N+F)) / O(B*(4N+2F)) per step).
# train_remat_for returns 'reverse' when the flag is on and the call
# qualifies (no dones/edge_weights; stochastic keys are replayed bitwise).
# PRICED NEGATIVE round 5 (BASELINE.md reversible table, same-pass at
# N=128/512): the reverse pass is ~4 HBM passes of [B,N,N]/step vs
# autodiff's ~2 — it loses 1.3-1.9x at N=128, and the ring's +4-12% at
# N=512 sits where the dispatched training path is the faster window()
# anyway. Defaults stay off permanently; flip only as a MEMORY escape
# hatch (zero [B,N,N] residuals) on HBM-constrained trainings.
RING_REVERSE_BWD: bool = False
DENSE_REVERSE_BWD: bool = False

# lax.scan unroll for the FUSED dense step's FORWARD (callers that pass
# unroll=None; trainers pass SCAN_UNROLL explicitly, and the training
# backward measured u4 > u8). Round-5 sweep (scan_opt --fused-unroll, two
# passes x two seeds): the u8 > u4 ordering reproduces in 4/4 same-pass
# seed-pairs (+12-15% in the clean pass; the second pass's absolutes were
# jitter-degenerate and only orderings were used), u16 loses 3/4. The
# VMEM-resident N=128 carry is why deeper unrolling now pays where the r3
# pre-fusion sweep saw an artifact.
DENSE_SCAN_UNROLL: int = 8

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

# Ring-core window() dispatch (RingDenseGCM.window_profitable): the scan-free
# trajectory path loses at small N (the [B,T,N+T,F] materialization is pure
# HBM overhead when the scan's [B,N,N] carry is cheap) and wins at large N,
# with the TRAINING crossover earlier than the forward one because the
# window's backward avoids the scan's per-step [B,N,N] carry residual.
# Measured on TPU v5e, B=32 obs=8 hid=32 euclidean (MEASURE_r4b
# ring_window_n512/n1024b): N=512 fwd 487k vs scan 643k (scan wins), train
# 224k vs 169k (+33% window); N=1024 fwd 500k vs 221k (2.3x window), train
# 217k vs 49k (4.4x window).
RING_WINDOW_FWD_MIN_N: int = 1024
RING_WINDOW_TRAIN_MIN_N: int = 512

# Memory bound for ring_window's per-chunk intermediates: the kill-cumsum
# materializes a handful of [B, c, N+c, F] tensors per T<=N chunk. The chunk
# length c is the largest with one such buffer under this many bytes
# (ring_window.max_chunk_len); exactness does not depend on c (any c <= N
# threads the state identically, tests/test_ring_window.py::TestChunked).
# Chunk-size sweep (TPU v5e 16 GB, N=1024 B=32 F=32 T=640, same pass,
# MEASURE_r5/ring_window_n1024_sweep): fwd c160/c320/c640 = 157k/176k/300k
# ts/s, train 89k/96k/126k — every extra chunk re-pays the O(B·(N+c)²·F)
# base/rewrite term, so the best chunk is the largest that fits. 4.5 GiB
# admits the measured-best single 640-chunk (4.36 GB buffer, fwd+bwd ran
# within 16 GB); 1 GiB (c=208) cost 1.6x fwd. (The r4b 40 GB OOM was the
# SCAN-train residual stack bf16[T,B,N,N], not this path — the window needs
# a ceiling, not a tiny budget.)
RING_WINDOW_CHUNK_BYTES: int = int(4.5 * (1 << 30))

# Kill-cumsum lowering for ring_window: None = plain jnp.cumsum; an int
# K = two-level blocked scan (same values to float reassociation —
# models/ring_window.py::_time_cumsum). Same-pass sweep at N=1024
# (MEASURE_r5/window_cumsum.log): FORWARD is flat (plain 312k vs blk16
# 303k vs blk64 328k — XLA's cumsum lowering is not the fwd bottleneck),
# but TRAIN gains +18% at K=16 (130k -> 154k; the backward differentiates
# the cumsum into a second, reverse cumsum, doubling the blocked form's
# savings). K=16 is the measured default; fwd sits within the run noise
# of plain there.
RING_WINDOW_CUMSUM_BLOCK: int | None = 16


_TUNABLE_KEYS = ("USE_PALLAS", "PALLAS_DENSE_GCONV", "MERGED_CONV_PROJ",
                 "PALLAS_SPMM_MAX_NODES", "PALLAS_SPMM_MIN_WORK",
                 "EMIT_WINDOW_FACTOR", "SCAN_UNROLL", "RING_FUSED_STEP",
                 "RING_SCAN_UNROLL", "SPMM_PRECISION", "TRAIN_REMAT_CHUNK",
                 "DENSE_FUSED_STEP", "DENSE_SCAN_UNROLL",
                 "HOP_AUTO_RATIO", "HOP_AUTO_MIN_NF",
                 "NAV_INCREMENTAL_MIN_V", "RING_REVERSE_BWD", "DENSE_REVERSE_BWD",
                 "RING_WINDOW_FWD_MIN_N",
                 "RING_WINDOW_TRAIN_MIN_N", "RING_WINDOW_CHUNK_BYTES",
                 "RING_WINDOW_CUMSUM_BLOCK")


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
