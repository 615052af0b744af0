"""Profile harness for SparseGCM + LearnedEdge — the reference's
tests/profile_sparse.py workload (B=8, F=32, graph_size=256, 256-step
inference + one batched training pass, max_hops=2) on the TPU build.

Prints wall-clock JSON; pass --trace DIR to capture a jax.profiler trace
instead of cProfile.
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_req = os.environ.get("JAX_PLATFORMS", "")
if _req and "axon" not in _req:
    jax.config.update("jax_platforms", _req)

import jax.numpy as jnp

from gcm_tpu.edges.sparse_learned import LearnedEdge
from gcm_tpu.models.sparse_gcm import SparseGCM
from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN

B, F, N, T = 8, 32, 256, 256


def build():
    gnn = SparseGNN([GraphConv(F, F), jnp.tanh, GraphConv(F, F), jnp.tanh])
    model = SparseGCM(
        gnn, graph_size=N, max_edges=8 * N, max_hops=2,
        edge_selectors=LearnedEdge(input_size=F, deterministic=True,
                                   num_edge_samples=3, window=32),
    )
    return model, model.init(jax.random.PRNGKey(0))


def timed_unique(fn, inputs):
    float(fn(*inputs[0]))
    ts = []
    for a in inputs[1:]:
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    model, params = build()

    # 256-step inference (step-by-step scan, t=1 windows)
    def infer(p, xs):
        outs, _ = model.scan(p, xs, model.initial_state(B, F))
        return jnp.sum(outs)

    # one batched training pass over the whole window
    taus = jnp.full((B,), T, jnp.int32)

    def loss(p, xs):
        outs, _ = model(p, xs, taus, model.initial_state(B, F))
        return jnp.mean(outs ** 2)

    def train(p, xs):
        g = jax.grad(loss)(p, xs)
        return sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g))

    mk = lambda seed: jax.random.normal(jax.random.PRNGKey(seed), (B, T, F))
    infer_j, train_j = jax.jit(infer), jax.jit(train)

    if args.trace:
        float(infer_j(params, mk(0)))
        float(train_j(params, mk(0)))
        jax.profiler.start_trace(args.trace)
        float(infer_j(params, mk(1)))
        float(train_j(params, mk(1)))
        jax.profiler.stop_trace()
        print(json.dumps({"trace_dir": args.trace}))
        return

    t_inf = timed_unique(infer_j, [(params, mk(i)) for i in range(4)])
    t_train = timed_unique(train_j, [(params, mk(10 + i)) for i in range(4)])
    print(json.dumps({
        "workload": "SparseGCM+LearnedEdge B=8 F=32 N=256 T=256 max_hops=2",
        "inference_256step_s": round(t_inf, 4),
        "inference_timesteps_per_s": round(B * T / t_inf),
        "batched_train_pass_s": round(t_train, 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
