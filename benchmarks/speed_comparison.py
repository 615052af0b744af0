"""LSTM vs DenseGCM vs SparseGCM per-timestep training cost.

The TPU-native analog of the reference's speed harness
(tests/test_speed.py:22-63). Honest-timing methodology (see BASELINE.md):
distinct inputs per repetition, scalar-sync (block_until_ready is unreliable
through the dev tunnel), per-step cost from the slope between a short and a
long window. Prints one JSON line per model.
"""

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

from gcm_tpu.edges.dense import DenseEdge
from gcm_tpu.edges.sparse_temporal import TemporalEdge
from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.models.sparse_gcm import SparseGCM
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN

B, F, N = 32, 32, 128
T_LO, T_HI = 16, 64
REPEATS = 4


def timed_unique(fn, inputs):
    float(fn(*inputs[0]))  # warmup/compile; scalar pull = real sync
    times = []
    for args in inputs[1:]:
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def grad_scalar(loss):
    def f(p, xs):
        g = jax.grad(loss)(p, xs)
        return sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g))
    return jax.jit(f)


def slope(fn_for_T, params):
    def measure(T):
        fn = fn_for_T(T)
        inputs = [
            (params, jax.random.normal(jax.random.PRNGKey(13 * T + i),
                                       (B, T, F)))
            for i in range(REPEATS + 1)
        ]
        return timed_unique(fn, inputs)

    return max(measure(T_HI) - measure(T_LO), 1e-9) / (T_HI - T_LO)


def lstm_cell(params, x, hc):
    h, c = hc
    z = x @ params["wx"] + h @ params["wh"] + params["b"]
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, (h, c)


def bench_lstm():
    key = jax.random.PRNGKey(0)
    params = {
        "wx": jax.random.normal(key, (F, 4 * F)) * 0.1,
        "wh": jax.random.normal(key, (F, 4 * F)) * 0.1,
        "b": jnp.zeros((4 * F,)),
    }

    def fn_for_T(T):
        def loss(p, xs):
            def step(hc, x):
                h, hc = lstm_cell(p, x, hc)
                return hc, h
            _, hs = jax.lax.scan(step, (jnp.zeros((B, F)), jnp.zeros((B, F))),
                                 jnp.swapaxes(xs, 0, 1))
            return jnp.mean(hs ** 2)
        return grad_scalar(loss)

    return slope(fn_for_T, params)


def bench_dense():
    gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                    DenseGraphConv(F, F), jnp.tanh])
    model = DenseGCM(gnn, edge_selectors=DenseEdge(), graph_size=N)
    params = model.init(jax.random.PRNGKey(0))

    def fn_for_T(T):
        def loss(p, xs):
            outs, _ = model.scan(p, xs, model.initial_state(B, F))
            return jnp.mean(outs ** 2)
        return grad_scalar(loss)

    return slope(fn_for_T, params)


def bench_sparse():
    gnn = SparseGNN([GraphConv(F, F), jnp.tanh, GraphConv(F, F), jnp.tanh])
    model = SparseGCM(gnn, edge_selectors=TemporalEdge([1, 2]), graph_size=N,
                      max_edges=2 * N)
    params = model.init(jax.random.PRNGKey(0))

    def fn_for_T(T):
        taus = jnp.full((B,), T, jnp.int32)

        def loss(p, xs):
            outs, _ = model(p, xs, taus, model.initial_state(B, F))
            return jnp.mean(outs ** 2)
        return grad_scalar(loss)

    return slope(fn_for_T, params)


if __name__ == "__main__":
    for name, fn in (("lstm", bench_lstm), ("dense_gcm_denseedge", bench_dense),
                     ("sparse_gcm_temporal", bench_sparse)):
        s = fn()
        print(json.dumps({
            "model": name,
            "fwd_bwd_s_per_step": round(s, 8),
            "timesteps_per_s": round(B / s),
            "backend": jax.default_backend(),
            "config": f"B={B} F={F} N={N} slope T{T_LO}->T{T_HI}",
        }), flush=True)
