"""hop_cap gather-compaction in its target regime (VERDICT r3 missing #3).

The masked max_hops path reproduces the reference k_hop_subgraph's
*semantics* (sparse_gcm.py:176-199); hop_cap adds its *work reduction*:
the GNN runs on [B, cap, F] instead of [B, graph_size, F]. The win should
scale with graph_size / reachable-set — this measures masked vs compacted
whole-window forwards at graph_size >> reachable (temporal edges, tau=8,
max_hops=2 -> reachable <= 8 + 2*2 hops*2 = tight; cap=32).

Timing discipline: chained windows threading state inside one jitted scan,
distinct inputs per repetition, scalar sync, slope over window count
(bench.py's method). Run: python benchmarks/hop_compact.py [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, TAU, F, CAP, LAYERS = 16, 8, 32, 32, 2
REPEATS = 5
N_LO, N_HI = 2, 26


def timed_unique(fn, inputs):
    float(fn(*inputs[0]))
    times = []
    for args in inputs[1:]:
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def make_model(graph_size, hop_cap):
    from gcm_tpu.edges.sparse_temporal import TemporalEdge
    from gcm_tpu.models.sparse_gcm import SparseGCM
    from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN

    layers = []
    for _ in range(LAYERS):
        layers += [GraphConv(F, F), jnp.tanh]
    gnn = SparseGNN(layers)
    return SparseGCM(gnn, edge_selectors=TemporalEdge([1, 2]),
                     graph_size=graph_size, max_edges=4 * graph_size,
                     max_hops=LAYERS, hop_cap=hop_cap)


def measure(model, params, seed):
    taus = jnp.full((B,), TAU, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n_win",))
    def chain(p, xs_wins, n_win):
        state = model.initial_state(B, F)

        def body(st, xs_w):
            out, st2 = model(p, xs_w, taus, st)
            return st2, jnp.sum(out)

        _, sums = jax.lax.scan(body, state, xs_wins[:n_win])
        return jnp.sum(sums)

    def one(n_win):
        inputs = [
            (params,
             jax.random.normal(jax.random.PRNGKey(seed * n_win + i),
                               (N_HI, B, TAU, F)))
            for i in range(REPEATS + 1)
        ]
        return timed_unique(
            lambda p, x: chain(p, x, n_win=n_win), inputs)

    for attempt in range(3):
        raw = one(N_HI) - one(N_LO)
        if raw > 0:
            break
    slope = max(raw, 1e-9) / (N_HI - N_LO)
    return B * TAU / slope


def main():
    global F, LAYERS, CAP
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[256, 1024, 4096])
    ap.add_argument("--feat", type=int, default=F,
                    help="feature width — the node-proportional GNN work "
                         "the compaction removes scales with it")
    ap.add_argument("--layers", type=int, default=LAYERS)
    ap.add_argument("--cap", type=int, default=CAP)
    args = ap.parse_args()
    F, LAYERS, CAP = args.feat, args.layers, args.cap
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    results = {}
    for N in args.sizes:
        masked = make_model(N, None)
        compact = make_model(N, CAP)
        params = masked.init(jax.random.PRNGKey(0))
        for tag, model in (("masked", masked), ("hop_cap", compact)):
            rate = measure(model, params, seed=17 + N)
            results[f"{tag}_N{N}"] = round(rate)
            print(json.dumps({f"{tag}_N{N}_timesteps_per_s": round(rate)}),
                  flush=True)

    print(json.dumps({"backend": jax.default_backend(),
                      "workload": f"B={B} tau={TAU} F={F} hops={LAYERS} "
                                  f"layers={LAYERS} cap={CAP} "
                                  f"TemporalEdge[1,2]",
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
