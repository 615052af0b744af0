"""Temporal back-edge selector (dense API).

TPU-native TemporalBackedge (reference src/gcm/edge_selectors/temporal.py:17-94):
wires the just-inserted node to nodes `hop` steps in the past. The reference's
per-batch Python loops become masked gather/scatter over the whole batch.

Dense selector API: __call__(params, nodes, adj, weights, num_nodes, key=None)
-> (adj, weights). adj[b, sink, source] convention.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from gcm_tpu.utils.ste import diff_or, gumbel_softmax, spardmax


class TemporalBackedge:
    def __init__(
        self,
        hops: Sequence[int] = (1,),
        direction: str = "forward",
        learned: bool = False,
        learning_window: int = 10,
        deterministic: bool = False,
        num_samples: int = 3,
    ):
        assert direction in ("forward", "backward", "both")
        self.hops = tuple(hops)
        self.direction = direction
        self.learned = learned
        self.learning_window = learning_window
        self.deterministic = deterministic
        self.num_samples = num_samples

    def init(self, key):
        del key
        if self.learned:
            return {"window": jnp.ones((self.learning_window,), jnp.float32)}
        return {}

    def _deterministic(self, adj, num_nodes):
        B, N = adj.shape[0], adj.shape[1]
        b_idx = jnp.arange(B)
        for hop in self.hops:
            valid = num_nodes >= hop
            row = jnp.clip(num_nodes, 0, N - 1)
            col = jnp.clip(num_nodes - hop, 0, N - 1)
            if self.direction in ("forward", "both"):
                old = adj[b_idx, row, col]
                adj = adj.at[b_idx, row, col].set(jnp.where(valid, 1.0, old))
            if self.direction in ("backward", "both"):
                old = adj[b_idx, col, row]
                adj = adj.at[b_idx, col, row].set(jnp.where(valid, 1.0, old))
        return adj

    def _learned_update(self, params, num_nodes, N, key):
        """The [B, N] additive update to adjacency row num_nodes[b] from the
        learned mask over the last `learning_window` slots (reference
        temporal.py:51-70)."""
        W = self.learning_window
        window = params["window"]  # [W]
        B = num_nodes.shape[0]
        col_iota = jnp.arange(W)[None, :]  # [1, W]
        cand = col_iota < jnp.minimum(num_nodes, W)[:, None]  # [B, W]
        neg = jnp.finfo(window.dtype).min
        logits = jnp.where(cand, window[None, :], neg)
        if self.deterministic:
            mask = spardmax(logits, axis=-1)
        else:
            keys = jax.random.split(key, self.num_samples)
            samples = [gumbel_softmax(k, logits, hard=True) for k in keys]
            mask = diff_or(samples)
        mask = mask * cand.astype(mask.dtype)  # [B, W]
        has_nodes = (num_nodes > 0)[:, None]
        pad = jnp.zeros((B, N - W), mask.dtype) if N > W else None
        row_update = mask if pad is None else jnp.concatenate([mask, pad],
                                                              axis=-1)
        return jnp.where(has_nodes, row_update, 0.0)

    def _learned(self, params, adj, num_nodes, key):
        """Learned mask over the last `learning_window` slots; .at-write
        form of _learned_update."""
        B, N = adj.shape[0], adj.shape[1]
        b_idx = jnp.arange(B)
        row = jnp.clip(num_nodes, 0, N - 1)
        row_update = self._learned_update(params, num_nodes, N, key)
        return adj.at[b_idx, row, :].add(row_update)

    def __call__(self, params, nodes, adj, weights, num_nodes, key=None):
        del nodes
        if self.learned:
            adj = self._learned(params, adj, num_nodes, key)
        else:
            adj = self._deterministic(adj, num_nodes)
        return adj, weights
