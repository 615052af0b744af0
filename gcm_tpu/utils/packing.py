"""State packing codec for the RL-framework boundary.

TPU-native pack_hidden / unpack_hidden (reference src/gcm/util.py:323-382):
the recurrent graph state must cross framework boundaries (rollout worker ↔
learner) as fixed-shape tensors. Our SparseGraphState is *already* the packed
fixed-capacity edge list, so packing is mostly a re-layout: edges [B, 2, E]
with `edge_fill` sentinels, weights [B, 1, E] with `weight_fill`, compacted to
the front. Round-trip contracts mirror tests/test_sparse_gcm.py:74-304
(empty / ragged / idempotent-after-cycles).
"""

from __future__ import annotations

import jax.numpy as jnp

from gcm_tpu.core.graph_state import SparseGraphState
from gcm_tpu.ops.scatter import edge_mask, nonzero_padded


def pack_hidden(state: SparseGraphState, max_edges: int,
                edge_fill: int = -1, weight_fill: float = 1.0):
    """SparseGraphState -> (nodes, edges [B,2,max_edges], weights
    [B,1,max_edges], T), the reference Ray packing format (util.py:326-353).
    Valid edges are compacted to the front in their stored order; remaining
    lanes take (edge_fill, weight_fill)."""
    nodes, edges, weights, T, _num_edges = state
    B, _, E = edges.shape
    valid = edge_mask(edges)
    k = min(E, max_edges)
    idx, ok, count = nonzero_padded(valid, k)
    sink = jnp.take_along_axis(edges[:, 0, :], idx, axis=1)
    src = jnp.take_along_axis(edges[:, 1, :], idx, axis=1)
    w = jnp.take_along_axis(weights, idx, axis=1)
    out_e = jnp.full((B, 2, max_edges), edge_fill, edges.dtype)
    out_w = jnp.full((B, 1, max_edges), weight_fill, weights.dtype)
    out_e = out_e.at[:, 0, :k].set(jnp.where(ok, sink, edge_fill))
    out_e = out_e.at[:, 1, :k].set(jnp.where(ok, src, edge_fill))
    out_w = out_w.at[:, 0, :k].set(jnp.where(ok, w, weight_fill))
    return nodes, out_e, out_w, T


def unpack_hidden(packed, max_edges: int | None = None) -> SparseGraphState:
    """(nodes, edges, weights, T) -> SparseGraphState (util.py:355-382).
    Lanes with sink < 0 are invalid. `max_edges` sets the state's edge
    capacity (defaults to the packed width)."""
    nodes, edges, weights, T = packed
    B, _, E = edges.shape
    cap = max_edges or E
    valid = (edges[:, 0, :] >= 0) & (edges[:, 1, :] >= 0)
    k = min(E, cap)
    idx, ok, _ = nonzero_padded(valid, k)
    sink = jnp.where(ok, jnp.take_along_axis(edges[:, 0, :], idx, axis=1), -1)
    src = jnp.where(ok, jnp.take_along_axis(edges[:, 1, :], idx, axis=1), -1)
    w = jnp.where(ok, jnp.take_along_axis(weights[:, 0, :], idx, axis=1), 1.0)
    out_e = jnp.full((B, 2, cap), -1, jnp.int32)
    out_w = jnp.ones((B, cap), weights.dtype)
    out_e = out_e.at[:, 0, :k].set(sink.astype(jnp.int32))
    out_e = out_e.at[:, 1, :k].set(src.astype(jnp.int32))
    out_w = out_w.at[:, :k].set(w)
    num_edges = jnp.sum(valid, axis=-1).astype(jnp.int32)
    return SparseGraphState(nodes, out_e, out_w, T.astype(jnp.int32), num_edges)
