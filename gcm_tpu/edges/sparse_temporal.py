"""Temporal edge selector, sparse (time-batched) API.

TPU-native TemporalEdge (reference src/gcm/sparse_edge_selectors/temporal.py:11-63):
connect each newly-inserted node t ∈ [T, T+tau) to t - hop for each hop.

Sparse selector API
-------------------
``__call__(params, nodes, T, taus, t, key=None) -> (grid, aux)`` where
``t`` is the static time-window length and ``grid [B, t, N]`` holds edge
weights: grid[b, i, j] = w means an edge (sink = T[b] + i) <- (source = j)
with weight w; 0 means no edge. Because the grid has exactly one lane per
(sink, source) pair, a step can never emit duplicate edges — which reproduces
the reference's concat+coalesce semantics (sparse_gcm.py:130-139, 172-175:
duplicates merge to a single weight-1 edge) *by construction*
(SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


class TemporalEdge:
    """Reference filter (sparse temporal.py:56-58): keep edges with
    source >= 0 and sink > 0."""

    def __init__(self, hops: Sequence[int] = (1,)):
        self.hops = tuple(hops)

    def init(self, key):
        del key
        return {}

    def reach_bound_per_hop(self) -> int:
        """Structural reachability growth per sink->source round: every
        edge this selector ever emits steps back at most max(hops) ids, so
        the k-hop reachable set around the t output nodes has at most
        t + max_hops * max(hops) members — the bound SparseGCM's
        hop_cap='auto' uses to size the gather-compacted subgraph. Valid
        for states whose whole edge history came from this selector."""
        return max(self.hops) if self.hops else 0

    def __call__(self, params, nodes, T, taus, t, key=None, seg_mask=None):
        del params, key
        B, N, _ = nodes.shape
        i = jnp.arange(t)[None, :]  # [1, t]
        sink = T[:, None] + i  # [B, t]
        new_valid = i < taus[:, None]  # [B, t]
        grid = jnp.zeros((B, t, N), nodes.dtype)
        src_iota = jnp.arange(N)[None, None, :]  # [1, 1, N]
        for hop in self.hops:
            source = sink - hop  # [B, t]
            ok = new_valid & (source >= 0) & (sink > 0)
            onehot = (src_iota == source[..., None]) & ok[..., None]
            grid = jnp.maximum(grid, onehot.astype(nodes.dtype))
        if seg_mask is not None:
            # episode-aware replay: drop edges that cross episode boundaries
            grid = grid * seg_mask.astype(grid.dtype)
        return grid, {}

    def emit_edges(self, params, nodes, T, taus, t, key=None, seg_mask=None):
        """Direct edge emission — the grid-free fast path.

        Temporal edges are known analytically (sink = T+i, source = sink−h,
        reference sparse temporal.py:34-63), so building a [B, t, N] grid
        and compacting it is pure overhead; this emits the K = t·len(hops)
        edges directly. Ordering matches the grid path bitwise: per new node
        i, sources ascending (hops descending).

        Returns (new_edges [B, 2, K], weights [B, K], valid [B, K], aux).
        """
        del params, key
        B, N, _ = nodes.shape
        i = jnp.arange(t)[None, :]                    # [1, t]
        sink_t = T[:, None] + i                       # [B, t]
        new_valid = i < taus[:, None]
        hops_desc = sorted(self.hops, reverse=True)
        sinks, srcs, valids = [], [], []
        for h in hops_desc:
            src = sink_t - h
            ok = new_valid & (src >= 0) & (sink_t > 0)
            if seg_mask is not None:
                # same-episode constraint: look up seg_mask[b, i, src]
                safe = jnp.clip(src, 0, seg_mask.shape[-1] - 1)
                ok = ok & jnp.take_along_axis(seg_mask, safe[:, :, None],
                                              axis=2)[:, :, 0]
            sinks.append(sink_t)
            srcs.append(src)
            valids.append(ok)
        # interleave per-i: stack [H, B, t] -> [B, t, H] -> [B, t*H]
        st_ = jnp.stack(sinks, axis=-1).reshape(B, -1)
        sr_ = jnp.stack(srcs, axis=-1).reshape(B, -1)
        ok_ = jnp.stack(valids, axis=-1).reshape(B, -1)
        new_e = jnp.stack([jnp.where(ok_, st_, -1),
                           jnp.where(ok_, sr_, -1)], axis=1)
        w = jnp.ones((B, new_e.shape[-1]), nodes.dtype)
        return new_e, w, ok_, {}
