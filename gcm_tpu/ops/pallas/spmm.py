"""Padded-edge-list SpMM Pallas kernel (SURVEY.md N2).

Computes out[b, i] = Σ_{e: sink_e = i} w_e · x[b, src_e] — the aggregation of
sparse GraphConv (reference sparse_gcm.py:178 / torch_scatter substrate).

TPU design: scatter-add is hostile to the VPU, so the kernel reformulates the
gather+scatter as two one-hot matmuls that run on the MXU:

    gather  = OneHot(src) [E, N] @ x [N, F]        (selects source rows)
    scatter = OneHot(sink)ᵀ [N, E] @ (w ⊙ gather)  (accumulates into sinks)

One-hots are built in-register from iota comparisons — nothing extra leaves
HBM. For the memory-graph regime (N ≤ ~512, E ≤ ~4N) this is faster than
XLA's sort-based scatter lowering despite the nominal FLOP increase. Invalid
(sentinel -1) lanes compare to no row and contribute zero, so masking is free.

Falls back to interpret mode off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(edges_ref, w_ref, x_ref, out_ref):
    x = x_ref[0]          # [N, F]
    sink = edges_ref[0, 0, :]  # [E] int32 (-1 sentinel)
    src = edges_ref[0, 1, :]
    w = w_ref[0, 0]       # [E]
    N = x.shape[0]
    E = sink.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (E, N), 1)
    src_oh = (rows == src[:, None]).astype(x.dtype)        # [E, N]
    gathered = jnp.dot(src_oh, x, preferred_element_type=jnp.float32)
    gathered = gathered * w[:, None]
    sink_oh = (rows == sink[:, None]).astype(x.dtype)      # [E, N]
    out = jnp.dot(sink_oh.T, gathered,
                  preferred_element_type=jnp.float32)      # [N, F]
    out_ref[0] = out.astype(out_ref.dtype)


def _use_interpret():
    return jax.default_backend() != "tpu"


@jax.jit
def spmm_edge_list(x, edges, weights):
    """x: [B, N, F]; edges: [B, 2, E] (sink, source; -1 sentinel);
    weights: [B, E]. Returns [B, N, F]. Signature-compatible with
    ops.scatter.edge_scatter_add."""
    B, N, F = x.shape
    E = edges.shape[-1]
    return pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 2, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, F), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, F), x.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * E * N * F,
            bytes_accessed=4 * B * (N * F * 2 + 3 * E),
            transcendentals=0,
        ),
    )(edges, weights.astype(x.dtype).reshape(B, 1, E), x)
