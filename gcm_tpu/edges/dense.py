"""Fully-connected-past edge selector (dense API).

TPU-native DenseEdge (reference src/gcm/edge_selectors/dense.py:4-23): connect
the current node bidirectionally to all past nodes plus a self edge. The
reference's Python loop over batch becomes a broadcasted iota mask.
"""

from __future__ import annotations

import jax.numpy as jnp


class DenseEdge:
    def init(self, key):
        del key
        return {}

    def __call__(self, params, nodes, adj, weights, num_nodes, key=None):
        del params, nodes, key
        B, N = adj.shape[0], adj.shape[1]
        r = jnp.arange(N)[None, :, None]  # sink index
        c = jnp.arange(N)[None, None, :]  # source index
        i = num_nodes[:, None, None]
        # adj[b, i, :i+1] = 1  (row i, cols <= i — includes the self edge)
        row_mask = (r == i) & (c <= i)
        # adj[b, :i, i] = 1    (col i, rows < i)
        col_mask = (c == i) & (r < i)
        return jnp.where(row_mask | col_mask, 1.0, adj), weights
