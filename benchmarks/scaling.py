"""DP/edge-partition scaling harness — edges/s and efficiency vs device count.

The BASELINE.json north star asks for ≥80% edges/s scaling efficiency from
1 chip → 1 host → N hosts. This harness measures SpMM throughput over meshes
of increasing size (1, 2, 4, ... up to all visible devices) for both
batch-sharded (DP) and edge-partitioned execution, and reports efficiency
relative to the single-device rate. On real multi-chip hardware this is the
scaling benchmark; on a single chip or virtual CPU mesh it validates the
harness itself.

Honest-timing rules apply (see BASELINE.md): scalar sync, distinct inputs,
slope over chain length.
"""

import functools
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
from jax.sharding import NamedSharding, PartitionSpec as P

from gcm_tpu.ops.scatter import edge_scatter_add
from gcm_tpu.parallel.edge_partition import spmm_edge_partitioned
from gcm_tpu.parallel.mesh import make_mesh

B, N, E, F = 64, 512, 8192, 128
REPEATS = 4


def timed_unique(fn, inputs):
    float(fn(*inputs[0]))
    ts = []
    for a in inputs[1:]:
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def make_graph(seed):
    sink = jax.random.randint(jax.random.PRNGKey(seed + 1), (B, E), 0, N)
    src = jax.random.randint(jax.random.PRNGKey(seed + 2), (B, E), 0, N)
    edges = jnp.stack([sink, src], axis=1).astype(jnp.int32)
    return edges, jnp.ones((B, E))


def slope_chain(spmm_fn, edges, w, shard_x=None, iters_lo=6, iters_hi=30):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(x, e, w, iters):
        def body(x, _):
            return spmm_fn(x, e, w) * 1e-1, None
        return jnp.sum(jax.lax.scan(body, x, None, length=iters)[0])

    def measure(iters):
        ins = []
        for i in range(REPEATS + 1):
            x = jax.random.normal(jax.random.PRNGKey(iters * 77 + i),
                                  (B, N, F))
            if shard_x is not None:
                x = jax.device_put(x, shard_x)
            ins.append((x, edges, w))
        return timed_unique(lambda x, e, w: chain(x, e, w, iters=iters), ins)

    slope = max(measure(iters_hi) - measure(iters_lo), 1e-9) / (
        iters_hi - iters_lo)
    return B * E / slope


def main():
    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    edges, w = make_graph(0)

    base_rate = None
    results = []
    for d in sizes:
        mesh = make_mesh(dp=d, tp=1, devices=jax.devices()[:d])
        # DP: shard the batch axis
        dp_shard = NamedSharding(mesh, P("dp", None, None))
        rate_dp = slope_chain(edge_scatter_add, edges, w, shard_x=dp_shard)
        # edge partition: shard the edge axis, x replicated
        ep_fn = spmm_edge_partitioned(mesh, axis="dp")
        rate_ep = slope_chain(ep_fn, edges, w)
        if base_rate is None:
            base_rate = rate_dp
        results.append({
            "devices": d,
            "dp_edges_per_s": round(rate_dp),
            "dp_efficiency": round(rate_dp / (base_rate * d), 3),
            "edge_partition_edges_per_s": round(rate_ep),
        })
    print(json.dumps({
        "backend": jax.default_backend(),
        "workload": f"B={B} N={N} E={E} F={F}",
        "scaling": results,
    }))


if __name__ == "__main__":
    main()
