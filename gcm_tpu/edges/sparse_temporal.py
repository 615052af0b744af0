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
