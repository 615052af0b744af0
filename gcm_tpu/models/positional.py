"""Positional encoders for the memory graph.

TPU-native PositionalEncoding / RelativePositionalEncoding (reference
src/gcm/gcm.py:56-143). The sin/cos table is built eagerly at init (the
reference builds it lazily on first call); 'cat' mode's lazily-created
reprojection Linear becomes an init-time parameter, so `feat_dim` must be
given up front. Exact sin/cos values are pinned by tests mirroring
tests/test_gcm.py:39-86.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gcm_tpu.nn.module import Linear


def sincos_table(max_len: int, feat_dim: int, dtype=jnp.float32) -> jax.Array:
    """Transformer sin/cos table [max_len, d_model] with d_model = feat_dim
    rounded up to even (reference gcm.py:103-118)."""
    d_model = int(math.ceil(feat_dim / 2) * 2)
    position = jnp.arange(max_len, dtype=dtype)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model), dtype)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


class PositionalEncoding:
    """mode='add': x[b, i] += pe[i] for all valid rows i <= num_nodes[b].
    mode='cat': reproject features to F - cat_dim and prepend cat_dim PE dims.
    (reference gcm.py:92-143)."""

    def __init__(self, max_len: int = 5000, mode: str = "add",
                 cat_dim: int = 8, feat_dim: int | None = None):
        assert mode in ("add", "cat")
        self.max_len = max_len
        self.mode = mode
        self.cat_dim = cat_dim
        self.feat_dim = feat_dim

    def init(self, key):
        assert self.feat_dim is not None, "feat_dim required at init"
        params = {"pe": sincos_table(self.max_len, self.feat_dim)}
        if self.mode == "cat":
            params["reproject"] = Linear(
                self.feat_dim, self.feat_dim - self.cat_dim
            ).init(key)
        return params

    def __call__(self, params, x, num_nodes, positions=None):
        """positions: optional [B, N] per-row PE index overriding the default
        (row index). Used for episode-aware replay, where a node's position is
        its index WITHIN its episode, not its buffer row."""
        B, N, F = x.shape
        valid = (jnp.arange(N)[None, :] <= num_nodes[:, None])[..., None]
        table = params["pe"]

        def rows(width):
            if positions is None:
                return jnp.broadcast_to(table[None, :N, :width],
                                        (B, N, width))
            safe = jnp.clip(positions, 0, table.shape[0] - 1)
            return table[safe, :width]

        if self.mode == "add":
            return jnp.where(valid, x + rows(F), x)
        reproj = Linear(F, F - self.cat_dim)
        x_re = reproj(params["reproject"], x)  # [B, N, F - cat_dim]
        cat = jnp.concatenate([rows(self.cat_dim), x_re], axis=-1)
        return jnp.where(valid, cat, x)


class RelativePositionalEncoding:
    """Rolls the table so the current node sits at position 0
    (reference gcm.py:56-89)."""

    def __init__(self, max_len: int = 5000, feat_dim: int | None = None):
        self.max_len = max_len
        self.feat_dim = feat_dim

    def init(self, key):
        del key
        assert self.feat_dim is not None
        return {"pe": sincos_table(self.max_len, self.feat_dim)}

    def __call__(self, params, x, num_nodes):
        B, N, F = x.shape
        pe_full = params["pe"]

        def per_batch(xb, nb):
            rolled = jnp.roll(pe_full, nb, axis=0)[:N, :F]
            valid = (jnp.arange(N) <= nb)[:, None]
            return jnp.where(valid, xb + rolled, xb)

        return jax.vmap(per_batch)(x, num_nodes)
