"""Flagship-scan step breakdown on the real TPU (VERDICT round-2 item 2).

BASELINE.md's roofline puts the dense scan's HBM floor at ~11M timesteps/s
and the banded core's at ~55M; measured are ~1.4M / ~6M. This script names
the gap by ABLATION: each variant is the flagship scan with one stage
removed/isolated, slope-timed exactly like bench.py (distinct inputs, scalar
sync, T_hi-T_lo slope). The difference between consecutive variants is the
cost of the stage. Also attempts a jax.profiler trace (whether the axon
tunnel supports device tracing is itself a finding).

Dense stages:  scan carry -> +insert -> +selector(adj) -> +preproc+GNN(full)
Banded stages: scan carry -> +insert -> +mask algebra -> +rolls -> full

Run:  python benchmarks/scan_breakdown.py [--trace DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, OBS, HID, N = 32, 8, 32, 128
REPEATS = 5


def timed_unique(fn, inputs):
    float(fn(*inputs[0]))
    times = []
    for args in inputs[1:]:
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def slope_rate(make_fn, T_lo, T_hi, seed):
    """Per-timestep rate (B timesteps per batch-step) from the T slope.

    Degenerate slopes (t_hi <= t_lo: tunnel jitter between the two T
    points swamped the marginal cost) retry up to twice with fresh
    inputs — the same guard bench.py grew after a 6.1e12 ts/s artifact
    got recorded (MEASURE_r4/window_reconcile2)."""
    jf = jax.jit(make_fn, static_argnames=("T",))

    def measure(T, salt):
        inputs = [
            (jax.random.normal(jax.random.PRNGKey(seed * T + salt + i),
                               (B, T, OBS)),)
            for i in range(REPEATS + 1)
        ]
        return timed_unique(lambda x: jf(x, T=T), inputs)

    for attempt in range(3):
        raw = measure(T_hi, 1000 * attempt) - measure(T_lo, 1000 * attempt)
        if raw > 0:
            break
    slope = max(raw, 1e-9) / (T_hi - T_lo)
    return B / slope, slope


# ---------------------------------------------------------------- dense

def dense_variants():
    from gcm_tpu.models.presets import readme_dense_gcm

    model = readme_dense_gcm(obs_size=OBS, hidden=HID, graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)
    b_idx = jnp.arange(B)

    def v_noop(xs, T):
        """Scan carrying the full DenseGraphState, body touches only x."""
        def step(carry, x):
            return carry, jnp.sum(x)
        st, outs = jax.lax.scan(step, state0, jnp.swapaxes(xs, 0, 1))
        return jnp.sum(outs) + jnp.sum(st.nodes)

    def v_insert(xs, T):
        """+ ring wraparound + insert (state churn, no adjacency work)."""
        from gcm_tpu.core.graph_state import dense_insert, dense_wrap_overflow

        def step(carry, x):
            st = dense_wrap_overflow(carry)
            st = dense_insert(st, x)
            return st._replace(num_nodes=st.num_nodes + 1), jnp.sum(x)
        st, outs = jax.lax.scan(step, state0, jnp.swapaxes(xs, 0, 1))
        return jnp.sum(outs) + jnp.sum(st.nodes) + jnp.sum(st.adj)

    def v_selector(xs, T):
        """+ TemporalBackedge adjacency update (still no GNN)."""
        from gcm_tpu.core.graph_state import dense_insert, dense_wrap_overflow

        def step(carry, x):
            st = dense_wrap_overflow(carry)
            st = dense_insert(st, x)
            nodes, adj, w, num = st
            adj, w = model.edge_selectors(
                params.get("edge_selectors", {}), nodes, adj, w, num)
            return type(st)(nodes, adj, w, num + 1), jnp.sum(x)
        st, outs = jax.lax.scan(step, state0, jnp.swapaxes(xs, 0, 1))
        return jnp.sum(outs) + jnp.sum(st.nodes) + jnp.sum(st.adj)

    def v_gnn(xs, T):
        """preproc + 2-layer GNN + belief gather on FIXED nodes/adj (row 0
        overwritten by x so the loop body depends on the step input); no
        state churn — isolates the compute stage."""
        nodes0 = jax.random.normal(jax.random.PRNGKey(5), (B, N, OBS))
        adj0 = (jax.random.uniform(jax.random.PRNGKey(6), (B, N, N))
                < (2.0 / N)).astype(jnp.float32)

        def step(carry, x):
            nodes = nodes0.at[b_idx, 0].set(x)
            dirty = model.preprocessor(params["preprocessor"], nodes)
            feats = model.gnn(params["gnn"], dirty, adj0, None)
            return carry, jnp.sum(feats[b_idx, 0])
        _, outs = jax.lax.scan(step, 0.0, jnp.swapaxes(xs, 0, 1))
        return jnp.sum(outs)

    def v_full(xs, T):
        outs, _ = model.scan(params, xs, state0)
        return jnp.sum(outs)

    return [("dense_noop", v_noop), ("dense_insert", v_insert),
            ("dense_selector", v_selector), ("dense_gnn_only", v_gnn),
            ("dense_full", v_full)]


# ---------------------------------------------------------------- banded

def banded_variants():
    from gcm_tpu.models.banded_gcm import BandedRingGCM, BandedState
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    model = BandedRingGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                          hops=(1,), graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)
    b_idx = jnp.arange(B)

    def v_noop(xs, T):
        def step(carry, x):
            return carry, jnp.sum(x)
        st, outs = jax.lax.scan(step, state0, jnp.swapaxes(xs, 0, 1))
        return jnp.sum(outs) + jnp.sum(st.nodes)

    def v_insert(xs, T):
        def step(carry, x):
            nodes, t = carry
            p = jnp.mod(t, N)
            nodes = nodes.at[b_idx, p].set(x)
            return BandedState(nodes, t + 1), jnp.sum(x)
        st, outs = jax.lax.scan(step, state0, jnp.swapaxes(xs, 0, 1))
        return jnp.sum(outs) + jnp.sum(st.nodes)

    def v_compute_nomask(xs, T):
        """insert + preproc + conv stack with mask fixed to ones (isolates
        the per-step hop-mask algebra by removing it)."""
        ones = jnp.ones((B, N), jnp.float32)

        def step(carry, x):
            nodes, t = carry
            p = jnp.mod(t, N)
            nodes = nodes.at[b_idx, p].set(x)
            h = model.preprocessor(params["preprocessor"], nodes)
            for ci, act in zip(model._conv_idx, model._acts):
                cp = params["gnn"][ci]
                agg = jnp.roll(h, 1, axis=1) * ones[..., None]
                out = (jnp.einsum("bnf,fo->bno", agg, cp["lin_rel"]["kernel"])
                       + jnp.einsum("bnf,fo->bno", h,
                                    cp["lin_root"]["kernel"])
                       + cp["lin_rel"]["bias"])
                h = jnp.tanh(out)
            return BandedState(nodes, t + 1), jnp.sum(h[b_idx, p])
        st, outs = jax.lax.scan(step, state0, jnp.swapaxes(xs, 0, 1))
        return jnp.sum(outs) + jnp.sum(st.nodes)

    def v_full(xs, T):
        outs, _ = model.scan(params, xs, state0)
        return jnp.sum(outs)

    def v_window(xs, T):
        outs, _ = model.window(params, xs, state0)
        return jnp.sum(outs)

    return [("banded_noop", v_noop), ("banded_insert", v_insert),
            ("banded_compute_nomask", v_compute_nomask),
            ("banded_full", v_full), ("banded_window", v_window)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="", help="jax.profiler trace dir")
    ap.add_argument("--t-dense", type=int, nargs=2, default=(128, 640))
    ap.add_argument("--t-banded", type=int, nargs=2, default=(128, 2176))
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on CPU (numbers meaningless)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    results = {}
    for name, fn in dense_variants():
        rate, slope = slope_rate(fn, *args.t_dense, seed=11)
        results[name] = {"timesteps_per_s": round(rate),
                         "us_per_step": round(slope * 1e6, 3)}
        print(json.dumps({name: results[name]}), flush=True)
    for name, fn in banded_variants():
        rate, slope = slope_rate(fn, *args.t_banded, seed=13)
        results[name] = {"timesteps_per_s": round(rate),
                         "us_per_step": round(slope * 1e6, 3)}
        print(json.dumps({name: results[name]}), flush=True)

    if args.trace:
        from gcm_tpu.models.presets import readme_dense_gcm

        model = readme_dense_gcm(obs_size=OBS, hidden=HID, graph_size=N)
        params = model.init(jax.random.PRNGKey(0))

        def full(xs):
            outs, _ = model.scan(params, xs, model.initial_state(B, OBS))
            return jnp.sum(outs)

        jf = jax.jit(full)
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, 256, OBS))
        float(jf(xs))  # compile outside the trace
        try:
            with jax.profiler.trace(args.trace):
                float(jf(jax.random.normal(jax.random.PRNGKey(2),
                                           (B, 256, OBS))))
            files = []
            for root, _, fs in os.walk(args.trace):
                files += [os.path.join(root, f) for f in fs]
            results["trace"] = {"ok": True, "files": files[:10]}
        except Exception as e:  # noqa: BLE001
            results["trace"] = {"ok": False, "error": repr(e)}
        print(json.dumps({"trace": results["trace"]}), flush=True)

    print(json.dumps({"backend": jax.default_backend(),
                      "workload": f"B={B} obs={OBS} hid={HID} N={N}",
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
