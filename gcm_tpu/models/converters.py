"""Dense ↔ sparse graph format converters.

TPU-native SparseToDense / DenseToSparse (reference src/gcm/gcm.py:10-53):
lets dense-adjacency models feed edge-list GNNs and vice versa, with
gradient flow preserved through the dense adjacency. Round-trip contract
DenseToSparse∘SparseToDense = id is pinned by tests mirroring
tests/test_gcm.py:493-515.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcm_tpu.ops.scatter import edge_mask, nonzero_padded


def dense_to_sparse(adj: jax.Array, max_edges: int | None = None):
    """[B, N, N] adjacency -> padded edge list [B, 2, E] (sink, source) +
    weights [B, E] carrying the adjacency values (gradients flow).

    E defaults to N*N (lossless); pass max_edges to cap."""
    B, N, _ = adj.shape
    E = max_edges or N * N
    mask = (adj > 0).reshape(B, N * N)
    idx, valid, _ = nonzero_padded(mask, min(E, N * N))
    sink = jnp.where(valid, idx // N, -1).astype(jnp.int32)
    src = jnp.where(valid, idx % N, -1).astype(jnp.int32)
    w = jnp.take_along_axis(adj.reshape(B, N * N), idx, axis=1)
    w = jnp.where(valid, w, 0.0)
    edges = jnp.stack([sink, src], axis=1)
    if edges.shape[-1] < E:
        pad = E - edges.shape[-1]
        edges = jnp.pad(edges, ((0, 0), (0, 0), (0, pad)), constant_values=-1)
        w = jnp.pad(w, ((0, 0), (0, pad)))
    return edges, w


def sparse_to_dense(edges: jax.Array, weights: jax.Array | None,
                    num_nodes: int) -> jax.Array:
    """Padded edge list -> dense [B, N, N] adjacency (values = weights,
    duplicate edges sum like COO to_dense)."""
    B, _, E = edges.shape
    valid = edge_mask(edges)
    sink = jnp.where(valid, edges[:, 0, :], num_nodes).astype(jnp.int32)
    src = jnp.clip(edges[:, 1, :], 0, num_nodes - 1).astype(jnp.int32)
    w = (jnp.ones((B, E), jnp.float32) if weights is None else weights)
    w = jnp.where(valid, w, 0.0)
    adj = jnp.zeros((B, num_nodes + 1, num_nodes), w.dtype)
    adj = adj.at[jnp.arange(B)[:, None], sink, src].add(w)
    return adj[:, :num_nodes]
