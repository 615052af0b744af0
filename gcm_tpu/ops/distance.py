"""Pairwise-distance (SDDMM-style) scoring ops — XLA fallback implementations.

These back the distance edge selectors (reference
src/gcm/edge_selectors/distance.py) and the nav radius/kNN graph construction
(reference src/gcm/nav_gcm.py:95-117). Everything is batched dense matmul /
broadcast work that XLA maps straight onto the MXU; a fused Pallas variant
lives in gcm_tpu.ops.pallas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cdist(a: jax.Array, b: jax.Array, eps: float = 0.0) -> jax.Array:
    """Euclidean distance matrix ||a_i - b_j||_2.

    a: [..., P, F], b: [..., R, F] -> [..., P, R]. Uses the expanded
    quadratic form (MXU-friendly: one matmul + rank-1 updates).
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # [..., P, 1]
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # [..., R, 1]
    ab = jnp.einsum("...pf,...rf->...pr", a, b)
    sq = a2 - 2.0 * ab + jnp.swapaxes(b2, -1, -2)
    return jnp.sqrt(jnp.maximum(sq, eps))


def euclidean_score(curr: jax.Array, nodes: jax.Array) -> jax.Array:
    """Reference EuclideanEdge.dist_fn (edge_selectors/distance.py:42-49).

    curr: [B, F] current-node features; nodes: [B, N, F].
    NOTE: faithfully replicates the reference's broadcast:
    `torch.cdist(curr[B,F], nodes[B,N,F]).mean(dim=1)` averages the distance
    to *every batch's* current node — dist[b, n] = mean_j ||curr[j] − nodes[b, n]||.
    For B == 1 this is the plain euclidean distance.
    """
    d = cdist(curr[None, :, :], nodes)  # [B, B, N]
    return jnp.mean(d, axis=1)  # [B, N]


def cosine_score(curr: jax.Array, nodes: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Reference CosineEdge.dist_fn (edge_selectors/distance.py:52-61):
    cosine *similarity* (torch.nn.CosineSimilarity semantics, incl. the eps
    clamp on norms) between the current node and every memory node.
    curr: [B, F], nodes: [B, N, F] -> [B, N]."""
    na = jnp.maximum(jnp.linalg.norm(curr, axis=-1, keepdims=True), eps)  # [B,1]
    nb = jnp.maximum(jnp.linalg.norm(nodes, axis=-1), eps)  # [B,N]
    dots = jnp.einsum("bf,bnf->bn", curr, nodes)
    return dots / (na * nb)


def spatial_score(
    curr: jax.Array,
    nodes: jax.Array,
    a_slice: slice,
    b_slice: slice | None = None,
) -> jax.Array:
    """Reference SpatialEdge.dist_fn (edge_selectors/distance.py:64-81):
    euclidean distance between pose sub-slices of the current node and each
    memory node. curr: [B, F], nodes: [B, N, F] -> [B, N]."""
    if b_slice is None:
        b_slice = a_slice
    ra = curr[:, a_slice]  # [B, k]
    rb = nodes[:, :, b_slice]  # [B, N, k]
    return jnp.linalg.norm(ra[:, None, :] - rb, axis=-1)


def pairwise_radius_mask(
    pos: jax.Array,
    valid: jax.Array,
    radius: float,
    max_neighbors: int | None = None,
    loop: bool = True,
) -> jax.Array:
    """Radius-graph adjacency mask, the TPU replacement for
    `torch_geometric.nn.radius_graph` (reference nav_gcm.py:106-117).

    pos: [B, T, D]; valid: [B, T] node-validity mask.
    Returns mask [B, T, T] where mask[b, i, j] = True means node j is within
    `radius` of node i (an edge j -> i). If `max_neighbors` is set, keeps only
    the `max_neighbors` *nearest* neighbors per center node (the reference's
    `max_num_neighbors` keeps an implementation-defined subset; nearest-k is
    the deterministic TPU choice).
    """
    B, T, _ = pos.shape
    d = cdist(pos, pos)  # [B, T, T]
    pair_ok = valid[:, :, None] & valid[:, None, :]
    mask = (d <= radius) & pair_ok
    if not loop:
        eye = jnp.eye(T, dtype=bool)
        mask = mask & ~eye
    if max_neighbors is not None and max_neighbors < T:
        # keep the max_neighbors smallest distances per row (center i)
        big = jnp.finfo(d.dtype).max
        dm = jnp.where(mask, d, big)
        kth = jnp.sort(dm, axis=-1)[..., max_neighbors - 1 : max_neighbors]
        mask = mask & (dm <= kth)
    return mask


def pairwise_knn_mask(
    pos: jax.Array,
    valid: jax.Array,
    k: int,
    loop: bool = False,
) -> jax.Array:
    """k-nearest-neighbor adjacency mask (replacement for
    `torch_geometric.nn.knn_graph`, reference nav_gcm.py:95-103).
    mask[b, i, j] = True means j is one of i's k nearest valid nodes."""
    B, T, _ = pos.shape
    d = cdist(pos, pos)
    pair_ok = valid[:, :, None] & valid[:, None, :]
    big = jnp.finfo(d.dtype).max
    dm = jnp.where(pair_ok, d, big)
    if not loop:
        eye = jnp.eye(T, dtype=bool)
        dm = jnp.where(eye, big, dm)
    kk = min(k, T)
    kth = jnp.sort(dm, axis=-1)[..., kk - 1 : kk]
    return (dm <= kth) & (dm < big)
