"""Reconcile the banded-window headline numbers (VERDICT round-3 item 9).

BASELINE.md recorded 102M timesteps/s for BandedRingGCM.window() via
scan_breakdown.py while bench.py records 41.6M on the nominally-same
B=32/N=128/hops=(1,) workload — a 2.5x methodology gap.

Hypothesis (this harness tests it): the two measure different window
lengths. scan_breakdown slope-times ONE window() call between T=128 and
T=2176 — the asymptotic in-window rate, amortizing the per-call fixed cost
(state hand-off, cursor algebra, first/last-step boundary work) over ~2k
steps. bench.py chains Tw=128-step windows threading the ring state — the
steady-state rate of a trainer consuming 128-step rollouts, which pays the
fixed cost every 128 steps.

Measures: (a) the chained-window rate at Tw in {128, 512, 2048}; (b) the
single-call T-slope rate (scan_breakdown method). If the Tw=2048 chained
rate converges to the single-call rate, the gap is per-window fixed cost
and both numbers are real — they get labeled, not averaged.

Run: python benchmarks/window_reconcile.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import bench
    from scan_breakdown import slope_rate

    results = {}

    def record(name, rate):
        results[name] = {"timesteps_per_s": round(rate)}
        print(json.dumps({name: results[name]}), flush=True)

    # (a) chained windows, varying window length (bench.py method; n range
    # scaled down as Tw grows to keep wall time sane). The Tw=128 point is
    # repeated: round 3 recorded 41.6M (bench) vs 102M (scan_breakdown) on
    # nominally the same workload and a round-4 single run gave 150M — the
    # per-step cost is so small that single slope runs sit inside tunnel
    # jitter, so the pinned number must carry a spread.
    for rep in range(3):
        record(f"chained_Tw128_r{rep}",
               bench.bench_banded_window(Tw=128, n_lo=8, n_hi=136))
    for Tw, (n_lo, n_hi) in ((512, (4, 68)), (2048, (2, 34))):
        record(f"chained_Tw{Tw}",
               bench.bench_banded_window(Tw=Tw, n_lo=n_lo, n_hi=n_hi))

    # (b) single-call T slope (scan_breakdown method)
    import jax.numpy as jnp

    from gcm_tpu.models.banded_gcm import BandedRingGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    B, OBS, HID, N = 32, 8, 32, 128
    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    model = BandedRingGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                          hops=(1,), graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def win_fn(xs, T):
        outs, _ = model.window(params, xs, state0)
        return jnp.sum(outs)

    rate, _ = slope_rate(win_fn, 128, 2176, seed=91)
    record("single_call_T128_2176", rate)

    print(json.dumps({"backend": jax.default_backend(),
                      "workload": "B=32 obs=8 hid=32 N=128 hops=(1,)",
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
