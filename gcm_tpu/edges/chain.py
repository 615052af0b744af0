"""Chaining of edge selectors.

Replaces the reference's use of torch_geometric.nn.Sequential to chain
selectors (tests/test_gcm.py:646-659): each selector receives the adj/weights
produced by the previous one.
"""

from __future__ import annotations

import jax


class EdgeChain:
    def __init__(self, selectors):
        self.selectors = list(selectors)

    def init(self, key):
        params = []
        for s in self.selectors:
            key, sub = jax.random.split(key)
            params.append(s.init(sub))
        return params

    def __call__(self, params, nodes, adj, weights, num_nodes, key=None):
        for s, p in zip(self.selectors, params):
            sub = None
            if key is not None:
                key, sub = jax.random.split(key)
            adj, weights = s(p, nodes, adj, weights, num_nodes, key=sub)
        return adj, weights
