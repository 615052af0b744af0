"""Fused dense graph-conv Pallas kernel (SURVEY.md N1).

One kernel per batch element computes
    out = (adj @ x) @ W_rel + b_rel + x @ W_root [+ activation]
entirely in VMEM: the neighborhood aggregate, both linears, and the optional
elementwise activation fuse into a single MXU pass — no HBM round trips
between the matmuls (replaces reference gcm.py:308's
DenseGraphConv(adj @ x) + XLA's generic fusion).

Falls back to interpret mode off-TPU so tests run on CPU.

DISPATCH STATUS: measured SLOWER than XLA at every practical size — XLA
batches [B,N,N]@[B,N,F] across the whole batch while the per-batch-block
kernel serializes (config.py PALLAS_DENSE_GCONV=False, BASELINE.md). Kept
as the tested N1 reference implementation; the dispatch layer records the
negative result rather than shipping a slower "optimization".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, adj_ref, wrel_ref, brel_ref, wroot_ref, out_ref, *,
            activation):
    x = x_ref[0]
    adj = adj_ref[0]
    agg = jnp.dot(adj, x, preferred_element_type=jnp.float32)
    out = (
        jnp.dot(agg, wrel_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(x, wroot_ref[...], preferred_element_type=jnp.float32)
        + brel_ref[0][None, :]
    )
    if activation == "tanh":
        out = jnp.tanh(out)
    elif activation == "relu":
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.astype(out_ref.dtype)


def _use_interpret():
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("activation",))
def fused_dense_graph_conv(x, adj, w_rel, b_rel, w_root, activation=None):
    """x: [B, N, F], adj: [B, N, N], w_rel: [F, Fo], b_rel: [Fo],
    w_root: [F, Fo] -> [B, N, Fo]."""
    B, N, F = x.shape
    Fo = w_rel.shape[-1]
    kernel = functools.partial(_kernel, activation=activation)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, F), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, Fo), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fo), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, Fo), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, Fo), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, Fo), x.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (N * N * F + 2 * N * F * Fo),
            bytes_accessed=4 * B * (N * F + N * N + N * Fo),
            transcendentals=B * N * Fo if activation == "tanh" else 0,
        ),
    )(x, adj, w_rel, b_rel.reshape(1, Fo), w_root)
