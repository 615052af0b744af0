"""Recurrent graph-memory state pytrees and their fixed-shape update ops.

The hidden state that recurs across timesteps *is* the graph
(reference README.md:45-48). Two representations:

- `DenseGraphState`: nodes [B,N,F], adj [B,N,N], weights [B,N,N] (or size-0),
  num_nodes [B] — matches reference DenseGCM hidden
  (src/gcm/gcm.py:194-211).
- `SparseGraphState`: nodes [B,N,F], edges [B,2,E] padded with -1, weights
  [B,E], t [B], num_edges [B] — the COO adjacency of reference SparseGCM
  (src/gcm/sparse_gcm.py:55-70) re-designed as the fixed-capacity padded edge
  list the reference itself uses at its Ray boundary (util.py:323-353), which
  is the XLA-native form.

All ops are pure and fixed-shape; raggedness is carried by num_nodes / t /
sentinels, never by array shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DenseGraphState(NamedTuple):
    nodes: jax.Array       # [B, N, F] float
    adj: jax.Array         # [B, N, N] float
    weights: jax.Array     # [B, N, N] float, or shape (0,) when unused
    num_nodes: jax.Array   # [B] int32


class SparseGraphState(NamedTuple):
    nodes: jax.Array       # [B, N, F] float
    edges: jax.Array       # [B, 2, E] int32 (sink, source), -1 sentinel
    weights: jax.Array     # [B, E] float
    t: jax.Array           # [B] int32 — nodes in graph before this step
    num_edges: jax.Array   # [B] int32 — valid edges per batch


def dense_initial_state(B: int, graph_size: int, feat: int,
                        edge_weights: bool = False,
                        dtype=jnp.float32) -> DenseGraphState:
    """Zero-initialized dense hidden state (reference gcm.py:194-211)."""
    N = graph_size
    return DenseGraphState(
        nodes=jnp.zeros((B, N, feat), dtype),
        adj=jnp.zeros((B, N, N), dtype),
        weights=(jnp.zeros((B, N, N), dtype) if edge_weights
                 else jnp.zeros((0,), dtype)),
        num_nodes=jnp.zeros((B,), jnp.int32),
    )


def sparse_initial_state(B: int, graph_size: int, feat: int, max_edges: int,
                         edge_fill: int = -1, weight_fill: float = 1.0,
                         dtype=jnp.float32) -> SparseGraphState:
    """Empty sparse hidden state in packed form (reference sparse_gcm.py:55-70
    + the pack codec defaults util.py:323-353)."""
    return SparseGraphState(
        nodes=jnp.zeros((B, graph_size, feat), dtype),
        edges=jnp.full((B, 2, max_edges), edge_fill, jnp.int32),
        weights=jnp.full((B, max_edges), weight_fill, dtype),
        t=jnp.zeros((B,), jnp.int32),
        num_edges=jnp.zeros((B,), jnp.int32),
    )


def dense_wrap_overflow(state: DenseGraphState) -> DenseGraphState:
    """Ring-buffer wraparound: evict the oldest node, free the last row.

    Batch-selective: only batches with num_nodes + 1 > N are shifted, matching
    reference wrap_overflow (gcm.py:323-355, pinned by tests/test_gcm.py:113-184):
    zero row/col 0 of nodes/adj/weights, then roll by -1 along the node axes,
    and decrement num_nodes. Applied unconditionally here (a per-batch mask
    makes the reference's global `torch.any` gate unnecessary — non-overflowing
    batches are untouched).
    """
    nodes, adj, weights, num_nodes = state
    N = nodes.shape[1]
    over = num_nodes + 1 > N  # [B]
    om = over[:, None, None]

    # zero-row/col-0-then-roll(-1) == slice-off-the-first-row/col-and-pad:
    # a pure gather XLA fuses into the select, vs the reference's
    # scatter+scatter+roll (3 whole-array rewrites; the round-3 trace showed
    # this stage costing ~10 us/step of the 26 us dense scan step).
    nodes_w = jnp.pad(nodes[:, 1:], ((0, 0), (0, 1), (0, 0)))
    nodes = jnp.where(om, nodes_w, nodes)

    adj_w = jnp.pad(adj[:, 1:, 1:], ((0, 0), (0, 1), (0, 1)))
    adj = jnp.where(om, adj_w, adj)

    if weights.size > 0:
        w_w = jnp.pad(weights[:, 1:, 1:], ((0, 0), (0, 1), (0, 1)))
        weights = jnp.where(om, w_w, weights)

    num_nodes = jnp.where(over, num_nodes - 1, num_nodes)
    return DenseGraphState(nodes, adj, weights, num_nodes)


def dense_insert(state: DenseGraphState, x: jax.Array) -> DenseGraphState:
    """Insert x [B, F] at row num_nodes[b] (reference gcm.py:274).
    Does NOT bump num_nodes — DenseGCM does that at the end of its step."""
    nodes, adj, weights, num_nodes = state
    B = x.shape[0]
    nodes = nodes.at[jnp.arange(B), num_nodes].set(x.astype(nodes.dtype))
    return DenseGraphState(nodes, adj, weights, num_nodes)


# --- episode-boundary reset protocol ---------------------------------------
# Each graph-state class registers how its memory is wiped when an episode
# ends (the reset an RL trainer applies mid-rollout). A per-class registry —
# NOT field-name sniffing — so a new state type whose fields need sentinel
# fills (like SparseGraphState's -1 edge padding) cannot be silently
# zero-reset by accident: unregistered types raise.

_RESET_REGISTRY: dict[type, object] = {}


def register_reset(cls):
    """Decorator: register fn(state, done_mask_fn) -> state as the episode
    reset for `cls`. done_mask_fn(arr) returns the [B, 1, ...] broadcastable
    done mask for that array."""

    def deco(fn):
        _RESET_REGISTRY[cls] = fn
        return fn

    return deco


def zero_reset(state, mask_for):
    """Generic reset: every batch-leading array is zeroed where done."""

    def leaf(arr):
        m = mask_for(arr)
        return arr if m is None else jnp.where(m, jnp.zeros_like(arr), arr)

    return type(state)(*(leaf(arr) for arr in state))


def reset_where(state, done: jax.Array):
    """Reset the memory of batch elements where `done[b]` is True, using the
    state class's registered reset (see `register_reset`). Raises TypeError
    for unregistered state types instead of guessing field semantics."""
    fn = _RESET_REGISTRY.get(type(state))
    if fn is None:
        raise TypeError(
            f"no episode reset registered for {type(state).__name__}; "
            "register one with gcm_tpu.core.graph_state.register_reset")

    def mask_for(arr):
        if arr.ndim == 0 or arr.shape[0] != done.shape[0]:
            return None
        return done.reshape((-1,) + (1,) * (arr.ndim - 1))

    return fn(state, mask_for)


@register_reset(DenseGraphState)
def _reset_dense(state, mask_for):
    return zero_reset(state, mask_for)


@register_reset(SparseGraphState)
def _reset_sparse(state, mask_for):
    """Restore the packed-codec fills: edge sentinel -1, weight fill 1.0
    (util.py:323-353 defaults, matching sparse_initial_state)."""
    return SparseGraphState(
        nodes=jnp.where(mask_for(state.nodes), 0.0, state.nodes),
        edges=jnp.where(mask_for(state.edges), -1, state.edges),
        weights=jnp.where(mask_for(state.weights),
                          jnp.ones_like(state.weights), state.weights),
        t=jnp.where(mask_for(state.t), 0, state.t),
        num_edges=jnp.where(mask_for(state.num_edges), 0, state.num_edges),
    )


def node_validity_mask(num_nodes: jax.Array, N: int,
                       inclusive: bool = False) -> jax.Array:
    """[B, N] mask of rows < num_nodes (or <= when inclusive)."""
    iota = jnp.arange(N)[None, :]
    if inclusive:
        return iota <= num_nodes[:, None]
    return iota < num_nodes[:, None]
