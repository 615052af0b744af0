"""Learned (differentiable) edge selector, dense API.

TPU-native LearnedEdge (reference src/gcm/edge_selectors/learned.py:7-125):
an MLP scores (current ‖ past) node pairs; logits are sparsemaxed
(deterministic) or gumbel-softmax-sampled into edges, merged into the
adjacency through a straight-through estimator so gradients reach the scorer
without accumulating across selectors.

The reference builds a ragged candidate list via idxs_up_to_num_nodes
(util.py:501-522) and scatters logits into a [B, max(num_nodes)] matrix filled
with -1e10. Here the pair scoring runs dense over all N memory slots — one
batched MLP over [B, N, 2F] (MXU-friendly) — and invalid slots are masked to
-1e10, which is numerically equivalent under both softmax and sparsemax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcm_tpu.nn.module import LayerNorm, Linear, MLP
from gcm_tpu.utils.ste import gumbel_softmax, spardmax, ste


def default_edge_network(input_size: int, init: str = "torch") -> MLP:
    """The reference's scorer: Linear(2F,F)→ReLU→LN→Linear(F,F)→ReLU→LN→
    Linear(F,1) (learned.py:38-51). The sparse variant orthogonally
    initializes the linears (sparse_edge_selectors/learned.py:63-65)."""
    return MLP([
        Linear(2 * input_size, input_size, init=init),
        jax.nn.relu,
        LayerNorm(input_size),
        Linear(input_size, input_size, init=init),
        jax.nn.relu,
        LayerNorm(input_size),
        Linear(input_size, 1, init=init),
    ])


class LearnedEdge:
    def __init__(
        self,
        input_size: int = 0,
        model: MLP | None = None,
        num_edge_samples: int = 5,
        deterministic: bool = False,
    ):
        assert input_size or model, "Must specify either input_size or model"
        self.deterministic = deterministic
        self.num_edge_samples = num_edge_samples
        self.edge_network = model if model is not None else default_edge_network(
            input_size
        )

    def init(self, key):
        return {"edge_network": self.edge_network.init(key)}

    def __call__(self, params, nodes, adj, weights, num_nodes, key=None):
        B, N = adj.shape[0], adj.shape[1]
        b_idx = jnp.arange(B)
        curr_idx = jnp.clip(num_nodes, 0, N - 1)
        curr = nodes[b_idx, curr_idx]  # [B, F]
        # score all (current ‖ past) pairs in one batched MLP call
        net_in = jnp.concatenate(
            [jnp.broadcast_to(curr[:, None, :], nodes.shape), nodes], axis=-1
        )  # [B, N, 2F]
        logits = self.edge_network(params["edge_network"], net_in)[..., 0]  # [B, N]
        cand = jnp.arange(N)[None, :] < num_nodes[:, None]  # past nodes only
        shaped_logits = jnp.where(cand, logits, -1e10)
        if self.deterministic:
            edges = spardmax(shaped_logits, axis=-1)
        else:
            cutoff = 1.0 / (1 + self.num_edge_samples)
            soft = gumbel_softmax(key, shaped_logits, axis=-1)
            edges = ste(soft - cutoff)
        # merge into row num_nodes via STE-of-sum so grads don't accumulate
        # across chained selectors (reference learned.py:99-111)
        old_row = adj[b_idx, curr_idx]  # [B, N]
        new_row = jnp.where(cand, ste(edges + old_row), old_row)
        # no-op for batches with zero nodes (cand all False) and, like the
        # reference (learned.py:117-119), when the whole batch has < 1 node
        adj = adj.at[b_idx, curr_idx].set(new_row)
        return adj, weights
