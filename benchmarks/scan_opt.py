"""Scan-optimization candidates on the real TPU: lax.scan unroll= and the
merged conv projection (config.MERGED_CONV_PROJ).

scan_breakdown.py names WHERE the per-step time goes; this measures the two
cheapest fixes for the overhead-dominated regime (BASELINE.md: dense scan at
~12% of its HBM floor):

- unroll=K: K loop iterations per XLA while-loop step — same recurrence,
  fewer loop-carried boundary crossings, cross-step fusion opportunities.
- MERGED_CONV_PROJ: one matmul per conv layer instead of two.

Slope-timed like bench.py (distinct inputs, scalar sync, T_hi−T_lo slope).
Prints one JSON line per variant; the winner (if any) flips the default in
rl/wrappers + BASELINE.md gets the numbers either way.

Run: python benchmarks/scan_opt.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scan_breakdown import B, HID, N, OBS, slope_rate  # noqa: E402


def dense_scan_fn(unroll):
    from gcm_tpu.models.presets import readme_dense_gcm

    model = readme_dense_gcm(obs_size=OBS, hidden=HID, graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def fn(xs, T):
        outs, _ = model.scan(params, xs, state0, unroll=unroll)
        return jnp.sum(outs)

    return fn


def banded_scan_fn(unroll):
    from gcm_tpu.models.banded_gcm import BandedRingGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    model = BandedRingGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                          hops=(1,), graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def fn(xs, T):
        outs, _ = model.scan(params, xs, state0, unroll=unroll)
        return jnp.sum(outs)

    return fn


def sparse_scan_fn(unroll):
    from gcm_tpu.models.presets import readme_sparse_gcm

    model = readme_sparse_gcm(obs_size=OBS, hidden=HID, graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def fn(xs, T):
        outs, _ = model.scan(params, xs, state0, unroll=unroll)
        return jnp.sum(outs)

    return fn


def banded_scored_scan_fn(unroll):
    from gcm_tpu.edges.distance import EuclideanEdge
    from gcm_tpu.models.banded_gcm import BandedScoredGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    model = BandedScoredGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                            distance=EuclideanEdge(1.0), window=8,
                            graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def fn(xs, T):
        outs, _ = model.scan(params, xs, state0, unroll=unroll)
        return jnp.sum(outs)

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--t-dense", type=int, nargs=2, default=(128, 640))
    ap.add_argument("--t-banded", type=int, nargs=2, default=(128, 2176))
    ap.add_argument("--sparse-unroll", action="store_true",
                    help="measure unroll on the two cores SCAN_UNROLL=4 "
                         "defaulted without measurement (ADVICE r3): "
                         "SparseGCM and BandedScoredGCM, unroll 1 vs 4, "
                         "two seeds each")
    ap.add_argument("--fused-unroll", action="store_true",
                    help="round-5 re-sweep: unroll 4/8/16 on the FUSED "
                         "dense scan, fwd + train, two seeds (the r3 u8 "
                         "regression-artifact predates the fused step, and "
                         "the N=128 carry is VMEM-resident)")
    ap.add_argument("--confirm", action="store_true",
                    help="variance check of the first run's winners: banded "
                         "unroll 1/4/8(+merged) and the missing 4+merged "
                         "point, two seeds each; plus dense unroll 1/4")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gcm_tpu import config

    results = {}

    def record(name, rate, slope):
        results[name] = {"timesteps_per_s": round(rate),
                         "us_per_step": round(slope * 1e6, 3)}
        print(json.dumps({name: results[name]}), flush=True)

    if args.fused_unroll:
        assert config.DENSE_FUSED_STEP
        for unroll in (4, 8, 16):
            for rep in (0, 1):
                rate, slope = slope_rate(dense_scan_fn(unroll),
                                         *args.t_dense,
                                         seed=100 * rep + 31 + unroll)
                record(f"dense_fused_u{unroll}_r{rep}", rate, slope)
        import functools as _ft

        def train_fn(unroll):
            from gcm_tpu.models.presets import readme_dense_gcm

            model = readme_dense_gcm(obs_size=OBS, hidden=HID, graph_size=N)
            params = model.init(jax.random.PRNGKey(0))
            state0 = model.initial_state(B, OBS)

            def loss(p, xs):
                outs, _ = model.scan(p, xs, state0, unroll=unroll)
                return jnp.sum(outs ** 2)

            def fn(xs, T):
                g = jax.grad(loss)(params, xs)
                return sum(jnp.sum(leaf)
                           for leaf in jax.tree_util.tree_leaves(g))

            return fn

        for unroll in (4, 8):
            for rep in (0, 1):
                rate, slope = slope_rate(train_fn(unroll), *args.t_dense,
                                         seed=100 * rep + 61 + unroll)
                record(f"dense_fused_train_u{unroll}_r{rep}", rate, slope)
        print(json.dumps({"backend": jax.default_backend(),
                          "workload": f"B={B} obs={OBS} hid={HID} N={N}",
                          "results": results}), flush=True)
        return

    if args.sparse_unroll:
        for unroll in (1, 4):
            for rep in (0, 1):
                rate, slope = slope_rate(sparse_scan_fn(unroll),
                                         *args.t_dense,
                                         seed=100 * rep + 11 + unroll)
                record(f"sparse_u{unroll}_r{rep}", rate, slope)
        for unroll in (1, 4):
            for rep in (0, 1):
                rate, slope = slope_rate(banded_scored_scan_fn(unroll),
                                         *args.t_dense,
                                         seed=100 * rep + 17 + unroll)
                record(f"banded_scored_u{unroll}_r{rep}", rate, slope)
        print(json.dumps({"backend": jax.default_backend(),
                          "workload": f"B={B} obs={OBS} hid={HID} N={N}",
                          "results": results}), flush=True)
        return

    if args.confirm:
        for merged in (False, True):
            config.MERGED_CONV_PROJ = merged
            tag = "m1" if merged else "m0"
            for unroll in (1, 4, 8):
                for rep in (0, 1):
                    rate, slope = slope_rate(banded_scan_fn(unroll),
                                             *args.t_banded,
                                             seed=100 * rep + 51 + unroll
                                             + (7 if merged else 0))
                    record(f"banded_u{unroll}_{tag}_r{rep}", rate, slope)
        config.MERGED_CONV_PROJ = False
        for unroll in (1, 4):
            for rep in (0, 1):
                rate, slope = slope_rate(dense_scan_fn(unroll),
                                         *args.t_dense,
                                         seed=100 * rep + 61 + unroll)
                record(f"dense_u{unroll}_r{rep}", rate, slope)
        print(json.dumps({"backend": jax.default_backend(),
                          "workload": f"B={B} obs={OBS} hid={HID} N={N}",
                          "results": results}), flush=True)
        return

    for unroll in (1, 2, 4, 8):
        rate, slope = slope_rate(dense_scan_fn(unroll), *args.t_dense,
                                 seed=21 + unroll)
        record(f"dense_unroll{unroll}", rate, slope)
    for unroll in (1, 2, 4, 8):
        rate, slope = slope_rate(banded_scan_fn(unroll), *args.t_banded,
                                 seed=31 + unroll)
        record(f"banded_unroll{unroll}", rate, slope)

    # merged=False baselines are banded_unroll1/banded_unroll8 above — only
    # the flag-on runs are new measurements (tunnel compiles are expensive)
    config.MERGED_CONV_PROJ = True
    rate, slope = slope_rate(banded_scan_fn(1), *args.t_banded, seed=42)
    record("banded_merged1", rate, slope)
    # merged projection under the best unroll (interaction term)
    rate, slope = slope_rate(banded_scan_fn(8), *args.t_banded, seed=44)
    record("banded_unroll8_merged1", rate, slope)
    config.MERGED_CONV_PROJ = False

    print(json.dumps({"backend": jax.default_backend(),
                      "workload": f"B={B} obs={OBS} hid={HID} N={N}",
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
