"""Edge-partitioned multi-chip graph aggregation (SURVEY.md §2 N6, §5.8).

For memory graphs larger than one chip's HBM/compute, the padded edge list is
sharded along the edge axis across the mesh: every device aggregates its
local edge shard into a full-width partial node accumulator, and one psum
over ICI combines the partials. XLA overlaps the psum with the tail of the
local segment-sum. The node matrix can additionally be sharded along N
("node_partition" variant): each device gathers the source rows it needs via
all_gather before aggregating — the ring-exchange CP analog for graph_size ≫
per-chip memory.

No counterpart exists in the reference (it is single-device); the design
follows the BASELINE.json north star (≥80% edges/s scaling efficiency).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gcm_tpu.ops.scatter import edge_scatter_add


def spmm_edge_partitioned(mesh: Mesh, axis: str = "dp"):
    """Returns f(x, edges, weights) computing the full SpMM with the edge
    axis sharded over `axis`. x [B, N, F] replicated; edges [B, 2, E],
    weights [B, E] sharded on E. Output [B, N, F] replicated."""

    def local(x, edges, weights):
        partial = edge_scatter_add(x, edges, weights)
        return jax.lax.psum(partial, axis)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, None, axis), P(None, axis)),
        out_specs=P(),
    )


def spmm_node_partitioned(mesh: Mesh, axis: str = "dp"):
    """Returns f(x, edges, weights) with the NODE axis sharded over `axis`:
    each device owns a contiguous row block of x and the edges whose sinks
    fall in its block (pre-bucketed by the caller via bucket_edges_by_sink).
    Source rows are all-gathered; output stays node-sharded."""

    def local(x_block, edges, weights):
        # x_block: [B, N/d, F]; edges hold GLOBAL indices; sinks are local
        # to this block by construction
        idx = jax.lax.axis_index(axis)
        n_local = x_block.shape[1]
        x_full = jax.lax.all_gather(x_block, axis, axis=1, tiled=True)
        valid = (edges[:, 0, :] >= 0) & (edges[:, 1, :] >= 0)
        local_sink = edges[:, 0, :] - idx * n_local
        sink_ok = valid & (local_sink >= 0) & (local_sink < n_local)
        local_edges = jnp.stack(
            [jnp.where(sink_ok, local_sink, -1),
             jnp.where(sink_ok, edges[:, 1, :], -1)],
            axis=1,
        )
        return edge_scatter_add(x_full, local_edges, weights,
                                num_nodes=n_local)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None, axis), P(None, axis)),
        out_specs=P(None, axis, None),
    )


def bucket_edges_cross(edges: jax.Array, weights: jax.Array, n_shards: int,
                       num_nodes: int, k_pair: int):
    """Bucket a padded edge list by (source device, sink device) pair for the
    all_to_all-partitioned SpMM (`spmm_bucketed`): N is block-partitioned into
    n_shards; each (s, t) pair gets a fixed-capacity `k_pair` slice, laid out
    source-device-major so sharding the edge axis hands every device its
    OUTGOING edges grouped by target. Overflowing edges per pair are dropped
    (size k_pair to the expected locality: for windowed/temporal GCM graphs
    cross-device pairs hold only boundary edges, so k_pair ≪ E).

    Returns (edges [B, 2, n_shards²·k_pair], weights [..]), sentinel-padded.
    """
    from gcm_tpu.ops.scatter import nonzero_padded

    B, _, E = edges.shape
    block = num_nodes // n_shards
    valid = (edges[:, 0, :] >= 0) & (edges[:, 1, :] >= 0)
    sink_dev = jnp.clip(edges[:, 0, :] // block, 0, n_shards - 1)
    src_dev = jnp.clip(edges[:, 1, :] // block, 0, n_shards - 1)
    out_e, out_w = [], []
    for s in range(n_shards):
        for t in range(n_shards):
            m = valid & (src_dev == s) & (sink_dev == t)
            idx, ok, _ = nonzero_padded(m, k_pair)
            sink = jnp.where(ok, jnp.take_along_axis(edges[:, 0, :], idx,
                                                     axis=-1), -1)
            src = jnp.where(ok, jnp.take_along_axis(edges[:, 1, :], idx,
                                                    axis=-1), -1)
            w = jnp.where(ok, jnp.take_along_axis(weights, idx, axis=-1), 0.0)
            out_e.append(jnp.stack([sink, src], axis=1))
            out_w.append(w)
    return (jnp.concatenate(out_e, axis=-1).astype(edges.dtype),
            jnp.concatenate(out_w, axis=-1))


def spmm_bucketed(mesh: Mesh, num_nodes: int, axis: str = "dp"):
    """Node+edge-partitioned SpMM with all_to_all message exchange (SURVEY.md
    §2 N6's called-for design): x is node-sharded [B, N/d, F]; edges are
    bucketed by (source device, sink device) via `bucket_edges_cross` and
    sharded so each device owns its outgoing edges. Each device gathers its
    local source rows into per-target message blocks, one all_to_all routes
    messages (and their sink indices) to the sink owners, and a local
    scatter-add lands them — communication is O(cross-device edges · F) per
    device instead of the O(N·F) all_gather of `spmm_node_partitioned`, so
    for windowed/temporal memory graphs (boundary-only cross edges) comms per
    device stays CONSTANT as the graph scales with the mesh. XLA overlaps the
    all_to_all with the (independent) local-pair aggregation.

    Returns f(x_block_sharded, edges_bucketed, weights_bucketed) with output
    node-sharded [B, N/d, F].
    """
    d = mesh.shape[axis]
    n_local = num_nodes // d

    def local(x_block, edges, w):
        # x_block [B, Nb, F]; edges [B, 2, d·k] outgoing, target-major groups
        s = jax.lax.axis_index(axis)
        B, _, L = edges.shape
        F = x_block.shape[-1]
        k = L // d
        sink = edges[:, 0, :]
        src = edges[:, 1, :]
        valid = (sink >= 0) & (src >= 0)
        src_local = jnp.clip(src - s * n_local, 0, n_local - 1)
        msgs = jnp.take_along_axis(x_block, src_local[..., None], axis=1)
        msgs = jnp.where(valid[..., None], msgs * w[..., None], 0.0)
        # route messages + sink indices to their sink-owner devices
        msgs = jax.lax.all_to_all(msgs.reshape(B, d, k, F), axis,
                                  split_axis=1, concat_axis=1)
        sink = jax.lax.all_to_all(sink.reshape(B, d, k), axis,
                                  split_axis=1, concat_axis=1)
        t = jax.lax.axis_index(axis)
        sink_flat = sink.reshape(B, d * k)
        sl = sink_flat - t * n_local
        sl = jnp.where((sink_flat >= 0) & (sl >= 0) & (sl < n_local), sl,
                       n_local).astype(jnp.int32)
        out = jnp.zeros((B, n_local + 1, F), x_block.dtype)
        out = out.at[jnp.arange(B)[:, None], sl].add(msgs.reshape(B, d * k, F))
        return out[:, :n_local]

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None, axis), P(None, axis)),
        out_specs=P(None, axis, None),
    )


def spmm_halo(mesh: Mesh, num_nodes: int, halo: int, axis: str = "dp"):
    """Node-partitioned SpMM for BANDED/windowed graphs (the GCM long-context
    regime, SURVEY.md §5: candidate edges windowed to the last `window`
    nodes): sources satisfy sink_block_start − halo ≤ source. Each device
    fetches only the last `halo` rows of its left neighbor with one ppermute
    ring step — comms per device is O(halo·F), independent of N and d (the
    ring-exchange CP analog of SURVEY.md N6). Edges must be pre-bucketed by
    sink (`bucket_edges_by_sink`) and sharded on the edge axis; x is
    node-sharded. halo ≤ N/d.
    """
    d = mesh.shape[axis]
    n_local = num_nodes // d
    assert halo <= n_local, "halo must fit in one neighbor block"

    def local(x_block, edges, w):
        i = jax.lax.axis_index(axis)
        B, Nb, F = x_block.shape
        send = x_block[:, Nb - halo:, :]
        perm = [(j, (j + 1) % d) for j in range(d)]
        halo_rows = jax.lax.ppermute(send, axis, perm)  # from left neighbor
        # device 0 receives device d−1's rows (wraparound garbage), but a
        # causal banded graph has no sources below 0, so they are never read
        x_ext = jnp.concatenate([halo_rows, x_block], axis=1)
        sink = edges[:, 0, :]
        src = edges[:, 1, :]
        valid = (sink >= 0) & (src >= 0)
        base = i * n_local - halo
        src_l = src - base
        ok = valid & (src_l >= 0) & (src_l < n_local + halo)
        msgs = jnp.take_along_axis(
            x_ext, jnp.clip(src_l, 0, n_local + halo - 1)[..., None], axis=1)
        msgs = jnp.where(ok[..., None], msgs * w[..., None], 0.0)
        sl = sink - i * n_local
        sl = jnp.where(ok & (sl >= 0) & (sl < n_local), sl,
                       n_local).astype(jnp.int32)
        out = jnp.zeros((B, n_local + 1, F), x_block.dtype)
        out = out.at[jnp.arange(B)[:, None], sl].add(msgs)
        return out[:, :n_local]

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None, axis), P(None, axis)),
        out_specs=P(None, axis, None),
    )


def bucket_edges_by_sink(edges: jax.Array, weights: jax.Array, n_shards: int,
                         num_nodes: int, per_shard: int | None = None):
    """Reorder a padded edge list so edges land in the shard that owns their
    sink row (block partition of N into n_shards). Returns (edges, weights)
    of width per_shard * n_shards, each slice holding only that shard's edges
    (padded -1). per_shard defaults to E (lossless); smaller values drop
    overflowing edges — size to the expected load imbalance."""
    B, _, E = edges.shape
    per = E if per_shard is None else per_shard
    block = num_nodes // n_shards
    valid = (edges[:, 0, :] >= 0) & (edges[:, 1, :] >= 0)
    shard_id = jnp.where(valid,
                         jnp.clip(edges[:, 0, :] // block, 0, n_shards - 1),
                         n_shards)
    out_e = []
    out_w = []
    for s in range(n_shards):
        m = shard_id == s
        order = jnp.argsort(~m, axis=-1, stable=True)[:, :per]
        ok = jnp.take_along_axis(m, order, axis=-1)
        sink = jnp.where(ok, jnp.take_along_axis(edges[:, 0, :], order,
                                                 axis=-1), -1)
        src = jnp.where(ok, jnp.take_along_axis(edges[:, 1, :], order,
                                                axis=-1), -1)
        w = jnp.where(ok, jnp.take_along_axis(weights, order, axis=-1), 0.0)
        out_e.append(jnp.stack([sink, src], axis=1))
        out_w.append(w)
    return (jnp.concatenate(out_e, axis=-1).astype(edges.dtype),
            jnp.concatenate(out_w, axis=-1))


class PartitionedSparseGNN:
    """SparseGNN-compatible stack whose GraphConv aggregations run on mesh
    collectives — the model-level entry to the multi-chip SpMMs above, a
    drop-in `gnn=` for SparseGCM (reference substrate: the single-device GNN
    call at sparse_gcm.py:178, here at pod scale).

    Modes (dispatched by the recorded comms accounting, BASELINE.md scaling
    section / SCALING_r2.json):

    - "halo": node-sharded x + sink-bucketed edge shards + one ppermute ring
      step fetching the left neighbor's last `halo` rows. Comms per device is
      B·halo·F·4 bytes, CONSTANT in N and shard count — the design that meets
      the ≥80% scaling north star (262 KB/device vs edge_partition's 29 MB at
      d=8). Requires every edge to satisfy source ≥ sink_block_start − halo,
      which windowed/temporal selectors guarantee structurally: source ≥
      sink − window ≥ sink_block_start − window, so halo = the selector's
      window (max hop for TemporalEdge, window + t for windowed learned).
    - "bucketed": node-sharded x + (src dev, sink dev)-bucketed edges + one
      all_to_all routing boundary messages — the general-graph variant; per-
      device bytes shrink with shard count. Needs a per-device-pair capacity
      `k_pair` (overflow drops; size to expected cross-shard edge counts).
    - "psum": the full-width-[B,N,F] psum fallback. O(B·N·F) comms
      independent of shard count — provably cannot scale (BASELINE.md), kept
      ONLY as the small-graph fallback where one psum beats a bucketing pass.
    - "auto": halo when `halo` is given; else psum for num_nodes ≤ 256
      (the regime where the [B,N,F] accumulator is a few hundred KB and the
      bucketing pass costs more than it saves); else bucketed.

    Edges are bucketed ONCE per call (inside the jitted step) and reused
    across the conv layers; the layouts are pure reorderings, so outputs are
    numerically identical to the single-device SparseGNN (pinned in
    tests/test_edge_partition.py).

    The wrapped layers must be GraphConv('add') / activation callables.
    """

    def __init__(self, layers, mesh: Mesh, axis: str = "dp",
                 num_nodes: int | None = None, mode: str = "auto",
                 halo: int | None = None, per_shard: int | None = None,
                 k_pair: int | None = None):
        from gcm_tpu.nn.sparse_conv import GraphConv

        for layer in layers:
            if hasattr(layer, "init"):
                assert isinstance(layer, GraphConv) and layer.aggr == "add", (
                    "PartitionedSparseGNN supports GraphConv('add') layers")
        assert mode in ("auto", "halo", "bucketed", "psum")
        if mode == "auto":
            if halo is not None:
                mode = "halo"
            elif num_nodes is not None and num_nodes > 256:
                mode = "bucketed"
            else:
                mode = "psum"
        if mode != "psum":
            assert num_nodes is not None, f"mode='{mode}' needs num_nodes"
            d = mesh.shape[axis]
            assert num_nodes % d == 0, (
                f"num_nodes={num_nodes} must divide over {d} shards")
        if mode == "halo":
            assert halo is not None, "mode='halo' needs halo (the selector's "\
                "source window: max hop / window + t)"
        self.layers = layers
        self.mesh = mesh
        self.axis = axis
        self.mode = mode
        self.num_nodes = num_nodes
        self.halo = halo
        self.per_shard = per_shard
        self.k_pair = k_pair
        if mode == "psum":
            self._spmm = spmm_edge_partitioned(mesh, axis=axis)
        elif mode == "halo":
            self._spmm = spmm_halo(mesh, num_nodes=num_nodes, halo=halo,
                                   axis=axis)
        else:
            assert k_pair is not None, "mode='bucketed' needs k_pair"
            self._spmm = spmm_bucketed(mesh, num_nodes=num_nodes, axis=axis)

    def init(self, key):
        params = []
        for layer in self.layers:
            if hasattr(layer, "init"):
                key, sub = jax.random.split(key)
                params.append(layer.init(sub))
            else:
                params.append({})
        return params

    def _bucket(self, edges, weights):
        d = self.mesh.shape[self.axis]
        if self.mode == "halo":
            return bucket_edges_by_sink(edges, weights, d, self.num_nodes,
                                        per_shard=self.per_shard)
        if self.mode == "bucketed":
            return bucket_edges_cross(edges, weights, d, self.num_nodes,
                                      k_pair=self.k_pair)
        return edges, weights

    def __call__(self, params, x, edges, weights=None):
        if weights is None:
            valid = (edges[:, 0, :] >= 0) & (edges[:, 1, :] >= 0)
            weights = valid.astype(x.dtype)
        edges, weights = self._bucket(edges, weights)
        for layer, p in zip(self.layers, params):
            if hasattr(layer, "init"):
                agg = self._spmm(x, edges, weights)
                x = (layer.lin_rel(p["lin_rel"], agg)
                     + layer.lin_root(p["lin_root"], x))
            else:
                x = layer(x)
        return x
