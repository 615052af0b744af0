"""Padded-edge-list SpMM Pallas kernel (SURVEY.md N2).

Computes out[b, i] = Σ_{e: sink_e = i} w_e · x[b, src_e] — the aggregation of
sparse GraphConv (reference sparse_gcm.py:178 / torch_scatter substrate).

TPU design: scatter-add is hostile to the VPU, so the kernel reformulates the
gather+scatter as two one-hot matmuls that run on the MXU:

    gather  = OneHot(src) [E_blk, N] @ x [N, F]        (selects source rows)
    scatter = OneHot(sink)ᵀ [N, E_blk] @ (w ⊙ gather)  (accumulates into sinks)

One-hots are built in-register from iota comparisons — nothing extra leaves
HBM. The edge axis is tiled (grid dim 1) and partial results accumulate into
the output block across edge tiles, so VMEM stays bounded for any E. Invalid
(sentinel -1) lanes compare to no row and contribute zero, so masking is
free. For the memory-graph regime (N ≤ ~1024) this is ~6× faster than XLA's
sort-based scatter lowering despite the nominal FLOP increase.

Falls back to interpret mode off-TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# edges per VMEM tile: one-hot tile is E_BLK x N floats (2 MB at N=1024)
_E_BLK = 512


def _kernel(edges_ref, w_ref, x_ref, out_ref):
    x = x_ref[0]               # [N, F]
    sink = edges_ref[0, 0, :]  # [E_blk] int32 (-1 sentinel)
    src = edges_ref[0, 1, :]
    w = w_ref[0, 0]            # [E_blk]
    N = x.shape[0]
    E = sink.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (E, N), 1)
    src_oh = (rows == src[:, None]).astype(x.dtype)        # [E_blk, N]
    gathered = jnp.dot(src_oh, x, preferred_element_type=jnp.float32)
    gathered = gathered * w[:, None]
    sink_oh = (rows == sink[:, None]).astype(x.dtype)      # [E_blk, N]
    partial = jnp.dot(sink_oh.T, gathered,
                      preferred_element_type=jnp.float32)  # [N, F]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += partial.astype(out_ref.dtype)


def _use_interpret():
    return jax.default_backend() != "tpu"


@jax.jit
def spmm_edge_list(x, edges, weights):
    """x: [B, N, F]; edges: [B, 2, E] (sink, source; -1 sentinel);
    weights: [B, E]. Returns [B, N, F]. Signature-compatible with
    ops.scatter.edge_scatter_add."""
    B, N, F = x.shape
    E = edges.shape[-1]
    e_blk = min(_E_BLK, E)
    n_blk = pl.cdiv(E, e_blk)
    pad = n_blk * e_blk - E
    if pad:
        edges = jnp.pad(edges, ((0, 0), (0, 0), (0, pad)),
                        constant_values=-1)
        weights = jnp.pad(weights, ((0, 0), (0, pad)))
    return pl.pallas_call(
        _kernel,
        grid=(B, n_blk),
        in_specs=[
            pl.BlockSpec((1, 2, e_blk), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e_blk), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, F), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, F), x.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n_blk * e_blk * N * F,
            bytes_accessed=4 * B * (N * F * 2 + 3 * E),
            transcendentals=0,
        ),
    )(edges, weights.astype(x.dtype).reshape(B, 1, n_blk * e_blk), x)
