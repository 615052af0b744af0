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
from gcm_tpu.parallel.edge_partition import (
    bucket_edges_by_sink,
    bucket_edges_cross,
    spmm_bucketed,
    spmm_edge_partitioned,
    spmm_halo,
    spmm_node_partitioned,
)
from gcm_tpu.parallel.mesh import make_mesh

B, N, E, F = 64, 512, 8192, 128
WINDOW = 8  # banded-workload half-bandwidth (the GCM windowed regime)
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


def make_banded_graph(seed, window=WINDOW):
    """Causal banded graph (the GCM windowed-candidate regime): sink i links
    back to i−1..i−window."""
    sink = jax.random.randint(jax.random.PRNGKey(seed + 1), (B, E), 1, N)
    hop = jax.random.randint(jax.random.PRNGKey(seed + 2), (B, E), 1,
                             window + 1)
    src = jnp.maximum(sink - hop, 0)
    edges = jnp.stack([sink, src], axis=1).astype(jnp.int32)
    return edges, jnp.ones((B, E))


def comms_bytes_per_device(variant, d, k_pair=None):
    """Per-device bytes moved over the interconnect per SpMM call (f32).

    - dp: none in forward (grad psum is the training-time cost, not SpMM's).
    - edge_partition: ring all-reduce of the full-width [B,N,F] partial
      accumulator ≈ 2·(d−1)/d·B·N·F·4.
    - node_gather: all_gather receives the other shards of x:
      (d−1)/d·B·N·F·4.
    - bucketed a2a: sends (d−1)/d of d·k_pair message rows (F floats + 1
      sink int) per batch: (d−1)/d·B·d·k_pair·(F+1)·4 — O(cross edges),
      constant per device for windowed graphs as N scales with d.
    - halo: one ppermute of the boundary rows: B·halo·F·4 — constant in
      BOTH N and d.
    """
    if d == 1:
        return 0
    if variant == "dp":
        return 0
    if variant == "edge_partition":
        return int(2 * (d - 1) / d * B * N * F * 4)
    if variant == "node_gather":
        return int((d - 1) / d * B * N * F * 4)
    if variant == "bucketed_a2a":
        return int((d - 1) / d * B * d * k_pair * (F + 1) * 4)
    if variant == "halo":
        return int(B * WINDOW * F * 4)
    raise ValueError(variant)


def sparse_gcm_halo_e2e(mesh, d, Tw=32, hidden=32):
    """END-TO-END whole-window SparseGCM on the scalable halo collective
    (VERDICT r2 item 1): selector -> sink-bucketed edge append -> halo-SpMM
    GNN, the full model step, timed over chained windows. Returns
    (timesteps/s, comms_bytes_per_device_per_window)."""
    from gcm_tpu.edges.sparse_temporal import TemporalEdge
    from gcm_tpu.models.sparse_gcm import SparseGCM
    from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN
    from gcm_tpu.parallel.edge_partition import PartitionedSparseGNN

    hops = [1, 2]
    halo = max(hops)
    layers = [GraphConv(hidden, hidden), jnp.tanh,
              GraphConv(hidden, hidden), jnp.tanh]
    n_convs = 2
    gnn = (PartitionedSparseGNN(layers, mesh, num_nodes=N, mode="halo",
                                halo=halo, axis="dp")
           if d > 1 else SparseGNN(layers))
    model = SparseGCM(gnn, graph_size=N, max_edges=len(hops) * N,
                      edge_selectors=TemporalEdge(hops))
    params = model.init(jax.random.PRNGKey(0))
    taus = jnp.full((B,), Tw, jnp.int32)
    n_windows = N // Tw  # full trajectory fits the graph exactly

    @functools.partial(jax.jit, static_argnames=("windows",))
    def run(params, xs, windows):
        # chain `windows` whole-window calls, threading the graph state
        def body(state, x_w):
            out, state = model(params, x_w, taus, state)
            return state, jnp.sum(out)
        st = model.initial_state(B, hidden)
        _, sums = jax.lax.scan(body, st, xs[:windows])
        return jnp.sum(sums)

    def measure(windows):
        ins = []
        for i in range(REPEATS + 1):
            xs = jax.random.normal(jax.random.PRNGKey(windows * 131 + i),
                                   (n_windows, B, Tw, hidden))
            ins.append((params, xs))
        return timed_unique(
            lambda p, xs: run(p, xs, windows=windows), ins)

    lo, hi = 2, n_windows
    slope = max(measure(hi) - measure(lo), 1e-9) / (hi - lo)
    steps_per_s = B * Tw / slope
    # one ppermute of the halo rows per conv layer per window
    comms = 0 if d == 1 else n_convs * B * halo * hidden * 4
    return steps_per_s, comms


def sharded_sparse_e2e(mesh, d, Tw=32, hidden=32):
    """The r5 FULLY-sharded step (parallel/sharded_sparse.py): selector grid
    scored over [B, Tw, N/d] per device, local compaction + per-shard append
    cursors, halo conv — nothing in the step is replicated (VERDICT r4
    missing #3; the r4 e2e ran only the GNN sharded and sat 4x under the DP
    control). d=1 runs the replicated production SparseGCM as the baseline.
    Returns (timesteps/s, comms_bytes_per_device_per_window)."""
    from gcm_tpu.edges.sparse_learned import LearnedEdge as SparseLearned
    from gcm_tpu.models.sparse_gcm import SparseGCM
    from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN
    from gcm_tpu.parallel.sharded_sparse import ShardedSparseGCM

    stack = [GraphConv(hidden, hidden), jnp.tanh,
             GraphConv(hidden, hidden), jnp.tanh]
    n_convs = 2

    def sel():
        return SparseLearned(input_size=hidden, deterministic=True,
                             num_edge_samples=3, window=WINDOW)

    if d > 1:
        model = ShardedSparseGCM(stack, mesh, axis="dp",
                                 edge_selectors=sel(), graph_size=N,
                                 max_edges=4 * N)
    else:
        model = SparseGCM(SparseGNN(stack), edge_selectors=sel(),
                          graph_size=N, max_edges=4 * N)
    params = model.init(jax.random.PRNGKey(0))
    taus = jnp.full((B,), Tw, jnp.int32)
    n_windows = N // Tw

    @functools.partial(jax.jit, static_argnames=("windows",))
    def run(params, xs, windows):
        def body(state, x_w):
            out, state = model(params, x_w, taus, state)
            return state, jnp.sum(out)
        st = model.initial_state(B, hidden)
        _, sums = jax.lax.scan(body, st, xs[:windows])
        return jnp.sum(sums)

    def measure(windows):
        ins = []
        for i in range(REPEATS + 1):
            xs = jax.random.normal(jax.random.PRNGKey(windows * 137 + i),
                                   (n_windows, B, Tw, hidden))
            ins.append((params, xs))
        return timed_unique(lambda p, xs: run(p, xs, windows=windows), ins)

    lo, hi = 2, n_windows
    slope = max(measure(hi) - measure(lo), 1e-9) / (hi - lo)
    steps_per_s = B * Tw / slope
    # per window: one halo ppermute per conv layer (W = window + Tw rows),
    # the sharded-softmax pmax+psum ([B, Tw] each), one [B, Tw, F] output
    # psum
    halo_rows = WINDOW + Tw
    comms = 0 if d == 1 else (n_convs * B * halo_rows * hidden * 4
                              + 2 * B * Tw * 4 + B * Tw * hidden * 4)
    return steps_per_s, comms


def sharded_cost_model(d=8, Tw=32, hidden=32):
    """Noise-free 1/d proof via the XLA cost model: total program FLOPs of
    the fully-sharded step vs the replicated step at the SAME workload. The
    virtual CPU mesh oversubscribes 8 'devices' onto 4 physical cores, so
    wall-clock efficiency there measures thread contention, not the design;
    compiled cost analysis is deterministic. If sharded_total ≈ replicated
    (no duplicated work), per-device work = replicated/d. (The r4 partial
    sharding would show sharded_total ≈ replicated + (d−1)/d·unsharded —
    the selector/append 7/8ths replicated on every device.)"""
    from gcm_tpu.edges.sparse_learned import LearnedEdge as SparseLearned
    from gcm_tpu.models.sparse_gcm import SparseGCM
    from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN
    from gcm_tpu.parallel.sharded_sparse import ShardedSparseGCM

    stack = [GraphConv(hidden, hidden), jnp.tanh,
             GraphConv(hidden, hidden), jnp.tanh]

    def sel():
        return SparseLearned(input_size=hidden, deterministic=True,
                             num_edge_samples=3, window=WINDOW)

    mesh = make_mesh(dp=d, tp=1, devices=jax.devices()[:d])
    sharded = ShardedSparseGCM(stack, mesh, axis="dp", edge_selectors=sel(),
                               graph_size=N, max_edges=4 * N)
    repl = SparseGCM(SparseGNN(stack), edge_selectors=sel(), graph_size=N,
                     max_edges=4 * N)
    params = repl.init(jax.random.PRNGKey(0))
    xs = jnp.ones((B, Tw, hidden))
    taus = jnp.full((B,), Tw, jnp.int32)

    def flops_of(model):
        f = jax.jit(lambda p, x: model(p, x, taus,
                                       model.initial_state(B, hidden))[0])
        an = f.lower(params, xs).compile().cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an.get("flops", float("nan")))

    fr = flops_of(repl)
    fs = flops_of(sharded)
    return {"replicated_flops": fr, "sharded_total_flops": fs,
            "sharded_over_replicated": round(fs / fr, 3),
            "per_device_fraction_of_replicated": round(fs / d / fr, 3),
            "devices": d}


def main():
    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    edges, w = make_graph(0)
    bedges, bww = make_banded_graph(0)

    base = {}
    results = []
    for d in sizes:
        mesh = make_mesh(dp=d, tp=1, devices=jax.devices()[:d])
        node_shard = NamedSharding(mesh, P(None, "dp", None))
        k_pair = max(E // (d * d), 64) if d > 1 else E

        row = {"devices": d}
        # DP: shard the batch axis (communication-free forward)
        dp_shard = NamedSharding(mesh, P("dp", None, None))
        row["dp"] = slope_chain(edge_scatter_add, edges, w, shard_x=dp_shard)
        # edge partition: edge axis sharded, full-width psum
        row["edge_partition"] = slope_chain(
            spmm_edge_partitioned(mesh, axis="dp"), edges, w)
        # node partition, all_gather sources
        nbe, nbw = bucket_edges_by_sink(edges, w, d, N)
        row["node_gather"] = slope_chain(
            spmm_node_partitioned(mesh, axis="dp") if d > 1
            else edge_scatter_add, nbe, nbw, shard_x=node_shard)
        # node+edge partition, bucketed all_to_all messages
        cbe, cbw = bucket_edges_cross(edges, w, d, N, k_pair)
        row["bucketed_a2a"] = slope_chain(
            spmm_bucketed(mesh, num_nodes=N, axis="dp") if d > 1
            else edge_scatter_add, cbe, cbw, shard_x=node_shard)
        # halo exchange on the banded workload
        hbe, hbw = bucket_edges_by_sink(bedges, bww, d, N)
        row["halo_banded"] = slope_chain(
            spmm_halo(mesh, num_nodes=N, halo=WINDOW, axis="dp") if d > 1
            else edge_scatter_add, hbe, hbw, shard_x=node_shard)

        # end-to-end whole-window SparseGCM on the halo path (model-level)
        e2e_steps, e2e_comms = sparse_gcm_halo_e2e(mesh, d)
        base.setdefault("sparse_gcm_halo_e2e", e2e_steps)
        # r5: the FULLY-sharded step (selector/compaction/append 1/d too)
        ss_steps, ss_comms = sharded_sparse_e2e(mesh, d)
        base.setdefault("sharded_sparse_e2e", ss_steps)

        out = {"devices": d,
               "sparse_gcm_halo_e2e_steps_per_s": round(e2e_steps),
               "sparse_gcm_halo_e2e_efficiency": round(
                   e2e_steps / (base["sparse_gcm_halo_e2e"] * d), 3),
               "sparse_gcm_halo_e2e_comms_bytes_per_device": e2e_comms,
               "sharded_sparse_e2e_steps_per_s": round(ss_steps),
               "sharded_sparse_e2e_efficiency": round(
                   ss_steps / (base["sharded_sparse_e2e"] * d), 3),
               "sharded_sparse_e2e_comms_bytes_per_device": ss_comms}
        for k, v in row.items():
            if k == "devices":
                continue
            base.setdefault(k, v)
            out[f"{k}_edges_per_s"] = round(v)
            out[f"{k}_efficiency"] = round(v / (base[k] * d), 3)
        out["comms_bytes_per_device"] = {
            v: comms_bytes_per_device(v, d, k_pair=k_pair)
            for v in ("dp", "edge_partition", "node_gather", "bucketed_a2a",
                      "halo")
        }
        results.append(out)
    cost = None
    if n_dev >= 8:
        try:
            cost = sharded_cost_model(d=8)
        except Exception as e:  # cost_analysis availability varies by backend
            cost = {"error": str(e)}
    print(json.dumps({
        "backend": jax.default_backend(),
        "workload": f"B={B} N={N} E={E} F={F} window={WINDOW}",
        "physical_cores": os.cpu_count(),
        "note": ("wall-clock efficiency on the virtual mesh measures thread "
                 "contention once devices > physical cores; the cost-model "
                 "block is the noise-free 1/d evidence"),
        "sharded_sparse_cost_model": cost,
        "scaling": results,
    }, indent=1))


if __name__ == "__main__":
    main()
