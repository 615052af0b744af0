"""Fixed-shape masked scatter/gather primitives.

These are the TPU-native replacement for the torch_scatter / dynamic-COO
substrate the reference builds on (reference: src/gcm/util.py:4, torch_scatter
usage; src/gcm/sparse_gcm.py COO concat/coalesce). Every op here is
static-shape: invalid lanes are routed to a trash row/column instead of being
filtered, so the whole thing jits and shards cleanly.

Conventions
-----------
- Edge lists are padded: `edges [B, 2, E]` int32 with row 0 = sink, row 1 =
  source (the reference's adjacency convention `adj[b, sink, source]`,
  src/gcm/edge_selectors/temporal.py:5-14). Invalid lanes hold the sentinel -1
  (exactly the reference's Ray packing format, util.py:323-353).
- `N` is the node capacity; scatters allocate N+1 rows and drop row N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_arange(B: int) -> jax.Array:
    return jnp.arange(B, dtype=jnp.int32)


def row_set(target: jax.Array, row_idx: jax.Array, values: jax.Array,
            mask: jax.Array | None = None) -> jax.Array:
    """target[b, row_idx[b]] = values[b] (where mask[b]), fixed-shape.

    target: [B, N, ...]; row_idx: [B]; values: [B, ...].
    Invalid rows are routed to a trash row.
    """
    B, N = target.shape[0], target.shape[1]
    idx = row_idx.astype(jnp.int32)
    if mask is not None:
        idx = jnp.where(mask, idx, N)
    pad_shape = (B, 1) + target.shape[2:]
    padded = jnp.concatenate([target, jnp.zeros(pad_shape, target.dtype)], axis=1)
    padded = padded.at[batch_arange(B), idx].set(values.astype(target.dtype))
    return padded[:, :N]


def rows_set(target: jax.Array, row_idx: jax.Array, values: jax.Array,
             mask: jax.Array) -> jax.Array:
    """target[b, row_idx[b, k]] = values[b, k] where mask[b, k], fixed-shape.

    target: [B, N, ...]; row_idx: [B, K]; values: [B, K, ...]; mask: [B, K].
    Used for the SparseGCM multi-row insert (reference sparse_gcm.py:113-123).
    """
    B, N = target.shape[0], target.shape[1]
    idx = jnp.where(mask, row_idx.astype(jnp.int32), N)
    pad_shape = (B, 1) + target.shape[2:]
    padded = jnp.concatenate([target, jnp.zeros(pad_shape, target.dtype)], axis=1)
    padded = padded.at[batch_arange(B)[:, None], idx].set(values.astype(target.dtype))
    return padded[:, :N]


def edge_mask(edges: jax.Array) -> jax.Array:
    """Validity mask [B, E] of a padded edge list (sentinel -1 ⇒ invalid)."""
    return (edges[:, 0, :] >= 0) & (edges[:, 1, :] >= 0)


def gather_nodes(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x[b, idx[b, k]] with idx clamped into range. x: [B, N, F], idx: [B, K]."""
    N = x.shape[1]
    safe = jnp.clip(idx, 0, N - 1).astype(jnp.int32)
    return jnp.take_along_axis(x, safe[..., None], axis=1)


def edge_scatter_add(
    x: jax.Array,
    edges: jax.Array,
    weights: jax.Array | None = None,
    num_nodes: int | None = None,
) -> jax.Array:
    """Batched SpMM over a padded edge list: out[b, i] = Σ_{e: sink_e = i} w_e · x[b, src_e].

    The aggregation at the heart of sparse GraphConv (replaces
    torch_geometric's gather/scatter propagate, reference sparse_gcm.py:178).

    x: [B, N, F]; edges: [B, 2, E] (sink, source); weights: [B, E] or None.
    Returns [B, N, F] (N = num_nodes or x.shape[1]).
    """
    B, N, F = x.shape
    if num_nodes is None:
        num_nodes = N
    valid = edge_mask(edges)
    sink = jnp.where(valid, edges[:, 0, :], num_nodes).astype(jnp.int32)
    msgs = gather_nodes(x, edges[:, 1, :])  # [B, E, F]
    if weights is not None:
        msgs = msgs * weights[..., None].astype(x.dtype)
    msgs = jnp.where(valid[..., None], msgs, 0.0)
    out = jnp.zeros((B, num_nodes + 1, F), x.dtype)
    out = out.at[batch_arange(B)[:, None], sink].add(msgs)
    return out[:, :num_nodes]


def edge_scatter_count(edges: jax.Array, num_nodes: int) -> jax.Array:
    """In-degree per sink node from a padded edge list. Returns [B, N]."""
    B = edges.shape[0]
    valid = edge_mask(edges)
    sink = jnp.where(valid, edges[:, 0, :], num_nodes).astype(jnp.int32)
    deg = jnp.zeros((B, num_nodes + 1), jnp.float32)
    deg = deg.at[batch_arange(B)[:, None], sink].add(valid.astype(jnp.float32))
    return deg[:, :num_nodes]


def edge_weight_scatter_add(edges: jax.Array, weights: jax.Array,
                            num_nodes: int) -> jax.Array:
    """Weighted in-degree per sink node. Returns [B, N]."""
    B = edges.shape[0]
    valid = edge_mask(edges)
    sink = jnp.where(valid, edges[:, 0, :], num_nodes).astype(jnp.int32)
    w = jnp.where(valid, weights, 0.0)
    deg = jnp.zeros((B, num_nodes + 1), weights.dtype)
    deg = deg.at[batch_arange(B)[:, None], sink].add(w)
    return deg[:, :num_nodes]


def edge_scatter_max(
    x: jax.Array,
    edges: jax.Array,
    num_nodes: int | None = None,
    fill: float = 0.0,
) -> jax.Array:
    """Max-aggregation over a padded edge list; sinks with no edges get `fill`."""
    B, N, F = x.shape
    if num_nodes is None:
        num_nodes = N
    valid = edge_mask(edges)
    sink = jnp.where(valid, edges[:, 0, :], num_nodes).astype(jnp.int32)
    msgs = gather_nodes(x, edges[:, 1, :])
    neg = jnp.finfo(x.dtype).min
    msgs = jnp.where(valid[..., None], msgs, neg)
    out = jnp.full((B, num_nodes + 1, F), neg, x.dtype)
    out = out.at[batch_arange(B)[:, None], sink].max(msgs)
    out = out[:, :num_nodes]
    return jnp.where(out == neg, jnp.asarray(fill, x.dtype), out)


def bucket_rank(keyid):
    """Per-lane rank within its key group (count of EARLIER lanes with the
    same key), stable. Sort-based — O(E log E) per batch with O(E) memory,
    instead of the [B, E, num_keys] one-hot cumsum whose memory blows up
    with the key count. keyid: [B, E] int32. Returns [B, E] int32."""
    B, E = keyid.shape
    order = jnp.argsort(keyid, axis=-1, stable=True)           # [B, E]
    ks = jnp.take_along_axis(keyid, order, axis=-1)
    pos = jnp.arange(E, dtype=jnp.int32)[None, :]
    first = jnp.concatenate(
        [jnp.ones((B, 1), bool), ks[:, 1:] != ks[:, :-1]], axis=-1)
    seg_start = jax.lax.cummax(jnp.where(first, pos, -1), axis=1)
    rank_sorted = pos - seg_start                              # [B, E]
    # scatter ranks back to original lane order via the inverse permutation
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(rank_sorted, inv, axis=-1)


def nonzero_padded(mask: jax.Array, k: int):
    """Indices of True entries of `mask [B, M]`, padded to `k` per batch.

    The static-shape replacement for `torch.nonzero` /
    `torch.where` edge-extraction patterns throughout the reference
    (e.g. edge_selectors/distance.py:28, util.py:367).

    Returns (idx [B, k] int32 in original order, valid [B, k] bool,
    count [B] int32). If a batch has more than k True entries, the excess is
    silently dropped — size `k` to capacity. Invalid lanes hold an arbitrary
    index — always gate gathers at `idx` with `valid`.

    Implementation: stable top_k on the mask (XLA breaks ties toward lower
    indices, so True entries keep their original order). Measured on TPU
    v5e at the sparse hot-path size ([32, 4096] → k=256): top_k ≈ argsort
    (both ~30 µs) while the "sort-free" cumsum+scatter variant is 4× SLOWER
    (116 µs — XLA lowers the arbitrary-index scatter worse than the sort it
    was meant to avoid) and regressed the whole sparse core 3×. Asymptotics
    lose to lowering quality here; keep whichever form the chip measures
    fastest.
    """
    M = mask.shape[-1]
    if k > M:  # top_k needs k <= M; extra lanes are invalid padding
        pad = jnp.zeros(mask.shape[:-1] + (k - M,), mask.dtype)
        mask = jnp.concatenate([mask, pad], axis=-1)
    v, idx = jax.lax.top_k(mask.astype(jnp.int32), k)
    count = jnp.sum(mask, axis=-1).astype(jnp.int32)
    return idx.astype(jnp.int32), v > 0, count


def append_edges(
    edges: jax.Array,
    weights: jax.Array,
    num_edges: jax.Array,
    new_edges: jax.Array,
    new_weights: jax.Array,
    new_valid: jax.Array,
):
    """Append per-batch valid new edges into a padded edge list at the cursor.

    edges: [B, 2, E]; weights: [B, E]; num_edges: [B] current edge counts.
    new_edges: [B, 2, K]; new_weights: [B, K]; new_valid: [B, K].

    Replaces the reference's COO concat+coalesce grow path
    (sparse_gcm.py:130-139) with a fixed-capacity cursor write. Returns
    (edges, weights, num_edges, overflowed [B] bool). On overflow the
    overflowing writes are dropped (routed to the trash column) and the flag
    is set — the caller decides whether to raise (the reference raises,
    sparse_gcm.py:120-121) or to keep going.
    """
    B, _, E = edges.shape
    K = new_edges.shape[-1]
    # position of each new edge within the valid-compacted order
    pos = jnp.cumsum(new_valid.astype(jnp.int32), axis=-1) - 1  # [B, K]
    dest = num_edges[:, None] + pos  # [B, K]
    ok = new_valid & (dest < E)
    dest = jnp.where(ok, dest, E).astype(jnp.int32)
    b = batch_arange(B)[:, None]
    padded_e = jnp.concatenate(
        [edges, jnp.zeros((B, 2, 1), edges.dtype)], axis=-1
    )
    padded_w = jnp.concatenate([weights, jnp.zeros((B, 1), weights.dtype)], axis=-1)
    padded_e = padded_e.at[b, 0, dest].set(new_edges[:, 0, :].astype(edges.dtype))
    padded_e = padded_e.at[b, 1, dest].set(new_edges[:, 1, :].astype(edges.dtype))
    padded_w = padded_w.at[b, dest].set(new_weights.astype(weights.dtype))
    n_new = jnp.sum(new_valid, axis=-1).astype(num_edges.dtype)
    overflowed = num_edges + n_new > E
    num_edges = jnp.minimum(num_edges + n_new, E)
    return padded_e[:, :, :E], padded_w[:, :E], num_edges, overflowed
