"""LSTM vs DenseGCM vs SparseGCM wall-clock comparison.

The TPU-native analog of the reference's speed harness
(tests/test_speed.py:22-63: 16-step rollout, F=32, fwd+bwd). Prints one JSON
line per model.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_req = os.environ.get("JAX_PLATFORMS", "")
if _req and "axon" not in _req:
    jax.config.update("jax_platforms", _req)

import jax.numpy as jnp

from gcm_tpu.edges.dense import DenseEdge
from gcm_tpu.edges.sparse_temporal import TemporalEdge
from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.models.sparse_gcm import SparseGCM
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import Linear
from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN

B, T, F, N = 32, 16, 32, 128


def timed(fn, *args, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def lstm_cell(params, x, hc):
    h, c = hc
    z = x @ params["wx"] + h @ params["wh"] + params["b"]
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, (h, c)


def bench_lstm(xs):
    key = jax.random.PRNGKey(0)
    params = {
        "wx": jax.random.normal(key, (F, 4 * F)) * 0.1,
        "wh": jax.random.normal(key, (F, 4 * F)) * 0.1,
        "b": jnp.zeros((4 * F,)),
    }

    def loss(p, xs):
        def step(hc, x):
            h, hc = lstm_cell(p, x, hc)
            return hc, h

        _, hs = jax.lax.scan(step, (jnp.zeros((B, F)), jnp.zeros((B, F))),
                             jnp.swapaxes(xs, 0, 1))
        return jnp.mean(hs ** 2)

    g = jax.jit(jax.grad(loss))
    return timed(g, params, xs)


def bench_dense(xs):
    gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                    DenseGraphConv(F, F), jnp.tanh])
    model = DenseGCM(gnn, edge_selectors=DenseEdge(), graph_size=N)
    params = model.init(jax.random.PRNGKey(0))

    def loss(p, xs):
        outs, _ = model.scan(p, xs, model.initial_state(B, F))
        return jnp.mean(outs ** 2)

    g = jax.jit(jax.grad(loss))
    return timed(g, params, xs)


def bench_sparse(xs):
    gnn = SparseGNN([GraphConv(F, F), jnp.tanh, GraphConv(F, F), jnp.tanh])
    model = SparseGCM(gnn, edge_selectors=TemporalEdge([1, 2]), graph_size=N,
                      max_edges=2 * N)
    params = model.init(jax.random.PRNGKey(0))
    taus = jnp.full((B,), T, jnp.int32)
    state = model.initial_state(B, F)

    # NOTE: taus/state are threaded as explicit jit args — device arrays
    # captured by closure become baked constants, which this environment's
    # TPU tunnel re-uploads on every call (~26 ms artifact).
    def loss(p, xs, taus, state):
        outs, _ = model(p, xs, taus, state)
        return jnp.mean(outs ** 2)

    g = jax.jit(jax.grad(loss))
    return timed(g, params, xs, taus, state)


if __name__ == "__main__":
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    for name, fn in (("lstm", bench_lstm), ("dense_gcm_denseedge", bench_dense),
                     ("sparse_gcm_temporal", bench_sparse)):
        dt = fn(xs)
        print(json.dumps({
            "model": name,
            "fwd_bwd_s": round(dt, 6),
            "timesteps_per_s": round(B * T / dt),
            "backend": jax.default_backend(),
            "config": f"B={B} T={T} F={F} N={N}",
        }))
