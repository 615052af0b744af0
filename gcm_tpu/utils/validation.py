"""Runtime shape/dtype contracts for the public model APIs.

The reference enforces tensor contracts with torchtyping/typeguard
(sparse_gcm.py:72-92) and inline asserts (gcm.py:246-260). The TPU-native
analog: host-side validators callable outside jit (shapes are static under
jit, so calling these at trace time is free — they run once per compile).
"""

from __future__ import annotations

import jax.numpy as jnp


class ShapeError(ValueError):
    pass


def _check(cond: bool, msg: str):
    if not cond:
        raise ShapeError(msg)


def check_dense_inputs(x, state, graph_size: int):
    """DenseGCM step contract (reference gcm.py:246-260)."""
    _check(hasattr(state, "num_nodes"),
           f"DenseGCM expects a DenseGraphState (has num_nodes); got "
           f"{type(state).__name__} — a RingGraphState belongs to "
           f"RingDenseGCM")
    nodes, adj, weights, num_nodes = state
    _check(x.ndim == 2, f"x must be [B, feat], got {x.shape}")
    B, F = x.shape
    N = graph_size
    _check(nodes.shape == (B, N, F),
           f"nodes must be [B={B}, N={N}, F={F}], got {nodes.shape}")
    _check(adj.shape == (B, N, N),
           f"adj must be [B={B}, N={N}, N={N}], got {adj.shape}")
    _check(weights.size == 0 or weights.shape == (B, N, N),
           f"weights must be numel-0 or [B, N, N], got {weights.shape}")
    _check(num_nodes.shape == (B,),
           f"num_nodes must be [B={B}], got {num_nodes.shape}")
    _check(jnp.issubdtype(num_nodes.dtype, jnp.integer),
           f"num_nodes must be integer, got {num_nodes.dtype}")
    _check(jnp.issubdtype(x.dtype, jnp.floating),
           f"x must be floating, got {x.dtype}")


def check_sparse_inputs(x, taus, state, graph_size: int, max_edges: int):
    """SparseGCM forward contract (reference sparse_gcm.py:72-99)."""
    nodes, edges, weights, t, num_edges = state
    _check(x.ndim == 3, f"x must be [B, t, feat], got {x.shape}")
    B, tw, F = x.shape
    N = graph_size
    _check(taus.shape == (B,), f"taus must be [B={B}], got {taus.shape}")
    _check(jnp.issubdtype(taus.dtype, jnp.integer),
           f"taus must be integer, got {taus.dtype}")
    _check(nodes.shape == (B, N, F),
           f"nodes must be [B={B}, N={N}, F={F}], got {nodes.shape}")
    _check(edges.shape == (B, 2, max_edges),
           f"edges must be [B, 2, E={max_edges}], got {edges.shape}")
    _check(weights.shape == (B, max_edges),
           f"weights must be [B, E={max_edges}], got {weights.shape}")
    _check(t.shape == (B,), f"t must be [B={B}], got {t.shape}")


def check_ring_inputs(x, state, graph_size: int):
    """RingDenseGCM step contract: same shapes as dense, but the state must
    be a RingGraphState (cursor semantics differ from num_nodes)."""
    _check(hasattr(state, "t") and not hasattr(state, "num_edges"),
           f"RingDenseGCM expects a RingGraphState (has t); got "
           f"{type(state).__name__}")
    nodes, adj, weights, t = state
    _check(x.ndim == 2, f"x must be [B, feat], got {x.shape}")
    B, F = x.shape
    N = graph_size
    _check(nodes.shape == (B, N, F),
           f"nodes must be [B={B}, N={N}, F={F}], got {nodes.shape}")
    _check(adj.shape == (B, N, N),
           f"adj must be [B={B}, N={N}, N={N}], got {adj.shape}")
    _check(t.shape == (B,), f"t must be [B={B}], got {t.shape}")
    _check(jnp.issubdtype(t.dtype, jnp.integer),
           f"t must be integer, got {t.dtype}")
