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
    """SparseGNN-compatible stack whose GraphConv aggregations run through
    the edge-partitioned SpMM on a mesh: each device owns an edge shard,
    aggregates locally, and a psum over ICI combines partials. Drop-in for
    SparseGNN inside SparseGCM for graphs whose edge lists exceed one chip.

    The wrapped layers must be GraphConv('add') / activation callables.
    """

    def __init__(self, layers, mesh: Mesh, axis: str = "dp"):
        from gcm_tpu.nn.sparse_conv import GraphConv

        for layer in layers:
            if hasattr(layer, "init"):
                assert isinstance(layer, GraphConv) and layer.aggr == "add", (
                    "PartitionedSparseGNN supports GraphConv('add') layers")
        self.layers = layers
        self.mesh = mesh
        self.axis = axis
        self._spmm = spmm_edge_partitioned(mesh, axis=axis)

    def init(self, key):
        params = []
        for layer in self.layers:
            if hasattr(layer, "init"):
                key, sub = jax.random.split(key)
                params.append(layer.init(sub))
            else:
                params.append({})
        return params

    def __call__(self, params, x, edges, weights=None):
        if weights is None:
            valid = (edges[:, 0, :] >= 0) & (edges[:, 1, :] >= 0)
            weights = valid.astype(x.dtype)
        for layer, p in zip(self.layers, params):
            if hasattr(layer, "init"):
                agg = self._spmm(x, edges, weights)
                x = (layer.lin_rel(p["lin_rel"], agg)
                     + layer.lin_root(p["lin_root"], x))
            else:
                x = layer(x)
        return x
