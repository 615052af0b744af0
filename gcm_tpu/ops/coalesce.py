"""Fixed-shape coalesce (dedup + reduce) for padded edge lists.

Replaces `torch.sparse_coo.coalesce()` and
`torch_geometric.utils.coalesce(reduce=...)` (reference sparse_gcm.py:107,
133-139, 172-175) with a sort + segment reduction that keeps static shapes:
duplicate (sink, source) pairs are merged, invalid lanes stay at the tail.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcm_tpu.ops.scatter import edge_mask


def coalesce_edges(
    edges: jax.Array,
    weights: jax.Array,
    num_nodes: int,
    reduce: str = "sum",
):
    """Sort a padded edge list by (sink, source), merge duplicates.

    edges: [B, 2, E] (sink, source; -1 sentinel), weights: [B, E].
    reduce: 'sum' | 'mean' | 'min' | 'max' over duplicate-edge weights.

    Returns (edges, weights, num_edges) with unique edges compacted to the
    front in (sink, source) ascending order and sentinel -1 padding after.
    """
    B, _, E = edges.shape
    valid = edge_mask(edges)
    big = num_nodes * (num_nodes + 2)  # larger than any valid key
    key = jnp.where(
        valid,
        edges[:, 0, :].astype(jnp.int32) * (num_nodes + 1)
        + edges[:, 1, :].astype(jnp.int32),
        big,
    )
    order = jnp.argsort(key, axis=-1, stable=True)
    key_s = jnp.take_along_axis(key, order, axis=-1)
    w_s = jnp.take_along_axis(weights, order, axis=-1)
    valid_s = jnp.take_along_axis(valid, order, axis=-1)

    # first occurrence of each unique key
    first = jnp.concatenate(
        [jnp.ones((B, 1), bool), key_s[:, 1:] != key_s[:, :-1]], axis=-1
    )
    first = first & valid_s
    # segment id of each lane = number of unique keys before it (within batch)
    seg = jnp.cumsum(first.astype(jnp.int32), axis=-1) - 1  # [B, E]
    seg = jnp.where(valid_s, seg, E)  # route invalid to trash segment

    def reduce_batch(seg_b, w_b, valid_b):
        if reduce == "sum" or reduce == "mean":
            tot = jax.ops.segment_sum(
                jnp.where(valid_b, w_b, 0.0), seg_b, num_segments=E + 1
            )
            if reduce == "mean":
                cnt = jax.ops.segment_sum(
                    valid_b.astype(w_b.dtype), seg_b, num_segments=E + 1
                )
                tot = tot / jnp.maximum(cnt, 1.0)
            return tot
        if reduce == "min":
            return jax.ops.segment_min(
                jnp.where(valid_b, w_b, jnp.finfo(w_b.dtype).max),
                seg_b,
                num_segments=E + 1,
            )
        if reduce == "max":
            return jax.ops.segment_max(
                jnp.where(valid_b, w_b, jnp.finfo(w_b.dtype).min),
                seg_b,
                num_segments=E + 1,
            )
        raise ValueError(f"unknown reduce: {reduce}")

    reduced = jax.vmap(reduce_batch)(seg, w_s, valid_s)  # [B, E+1]

    # compact: unique edges (first occurrences) to the front
    comp_order = jnp.argsort(~first, axis=-1, stable=True)  # [B, E]
    uniq_mask = jnp.take_along_axis(first, comp_order, axis=-1)
    key_u = jnp.take_along_axis(key_s, comp_order, axis=-1)
    sink_u = jnp.where(uniq_mask, key_u // (num_nodes + 1), -1)
    src_u = jnp.where(uniq_mask, key_u % (num_nodes + 1), -1)
    seg_u = jnp.take_along_axis(seg, comp_order, axis=-1)
    w_u = jnp.take_along_axis(reduced, jnp.minimum(seg_u, E), axis=-1)
    w_u = jnp.where(uniq_mask, w_u, 0.0)

    out_edges = jnp.stack([sink_u, src_u], axis=1).astype(edges.dtype)
    num_edges = jnp.sum(first, axis=-1).astype(jnp.int32)
    return out_edges, w_u.astype(weights.dtype), num_edges
