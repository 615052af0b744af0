"""Vectorized ragged-batch index helpers (fixed-shape, padded).

TPU-native equivalents of the reference's jit-scripted Python-loop index
generators (src/gcm/util.py:176-282) and NavGCM's compute_idx family
(src/gcm/nav_gcm.py:38-168). Each returns padded index arrays plus a validity
mask instead of ragged tensors; entries are produced in the same
(batch-major, time-ascending) order the reference pins in
tests/test_nav_gcm.py:30-131. The model cores use broadcast masks directly —
these helpers exist for users and for parity testing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _segment_fill(lengths: jax.Array, cap: int):
    """Given per-batch lengths, return (b_idx, k_idx, mask) listing
    (b, 0..lengths[b]) pairs batch-major, padded to `cap` entries.

    The vectorized replacement for `torch.cat([ones(l[b]) * b ...])` /
    `torch.cat([arange(l[b]) ...])` loops (util.py:176-231)."""
    B = lengths.shape[0]
    total = jnp.sum(lengths)
    starts = jnp.cumsum(lengths) - lengths  # segment start offsets
    pos = jnp.arange(cap)
    # b_idx[p] = number of segment starts <= p  - 1
    b_idx = jnp.sum(pos[:, None] >= starts[None, :], axis=-1) - 1
    b_idx = jnp.clip(b_idx, 0, B - 1)
    k_idx = pos - starts[b_idx]
    mask = pos < total
    return (jnp.where(mask, b_idx, 0).astype(jnp.int32),
            jnp.where(mask, k_idx, 0).astype(jnp.int32),
            mask)


def get_nonpadded_idxs(T, taus, cap: int):
    """(b, 0..taus[b]) pairs — valid positions of a zero-padded input window
    (util.py:176-188)."""
    del T
    return _segment_fill(taus, cap)


def get_new_node_idxs(T, taus, cap: int):
    """(b, T[b]..T[b]+taus[b]) pairs — rows just inserted (util.py:191-208)."""
    b, k, m = _segment_fill(taus, cap)
    return b, jnp.where(m, T[b] + k, 0).astype(jnp.int32), m


def get_valid_node_idxs(T, taus, cap: int):
    """(b, 0..T[b]+taus[b]) pairs — all valid rows (util.py:211-231)."""
    return _segment_fill(T + taus, cap)


def get_batch_offsets(lengths):
    """(starts, ends) of each batch's segment in the flattened node order
    (util.py:234-240)."""
    ends = jnp.cumsum(lengths)
    starts = ends - lengths
    return starts, ends


def make_flat_new_idx(T, taus, cap: int):
    """Indices of the new nodes within the flattened valid-node order
    (nav_gcm.py:84-93): for each b, [cum(T+taus)[b] - taus[b], cum(T+taus)[b])."""
    b, k, m = _segment_fill(taus, cap)
    cs = jnp.cumsum(T + taus)
    return jnp.where(m, cs[b] - taus[b] + k, 0).astype(jnp.int32), m


def make_output_idx(taus, cap: int):
    """(b, 0..taus[b]) positions in the padded output (nav_gcm.py:66-80)."""
    return _segment_fill(taus, cap)


def front_back_ptr(T, taus):
    """Pointers to each graph's first/last node in the flattened order
    (nav_gcm.py:158-165)."""
    back = jnp.cumsum(T + taus) - 1
    front = jnp.concatenate([jnp.zeros((1,), back.dtype), back[:-1] + 1])
    return front, back


def causal_pair_mask(T, taus, t: int, N: int, window: int | None = None):
    """cand[b, i, j]: sink T[b]+i (i < taus[b]) receives from source j < sink,
    optionally windowed to j >= T[b] - window — the grid-mask form of
    get_causal_edges (util.py:242-282)."""
    i = jnp.arange(t)[None, :]
    j = jnp.arange(N)[None, None, :]
    sink = T[:, None] + i
    cand = (i < taus[:, None])[..., None] & (j < jnp.clip(sink, 0, N)[..., None])
    if window is not None:
        cand = cand & (j >= jnp.maximum(T[:, None, None] - window, 0))
    return cand
