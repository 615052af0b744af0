"""Masked pairwise-distance SDDMM Pallas kernel (SURVEY.md N3).

Scores the current node against every memory slot and emits the thresholded
adjacency row in one fused pass — the hot path of the distance edge selectors
(reference edge_selectors/distance.py:18-39) and nav radius graphs
(nav_gcm.py:106-117). The expanded-quadratic distance (‖a‖² − 2a·b + ‖b‖²)
puts the a·b term on the MXU; threshold + validity masking happen in-register
before anything returns to HBM. Per-batch scalars (num_nodes, threshold)
arrive via scalar prefetch.

Falls back to interpret mode off-TPU.

DISPATCH STATUS (measured, TPU v5e 2026-08-17, slope-timed chained calls):
the XLA fallback (ops.distance score + mask, which XLA fuses into one
batched-matmul+elementwise program) beats this kernel at every size with
signal above timing noise — N=512/F=128: XLA 9.8/25.8 µs vs pallas
36.2/40.5 µs (euclidean/cosine); smaller selector sizes are sub-µs and
noise-dominated. The per-batch grid=(B,) launch cannot beat one fused
batched GEMM, so `edges/distance.py` intentionally stays on the XLA path
(same conclusion as the N1 dense-conv kernels, config.py). The kernel is
kept as the tested N3 reference implementation; numbers recorded in
BASELINE.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(nn_ref, thr_ref, q_ref, nodes_ref, out_ref, *, mode):
    b = pl.program_id(0)
    q = q_ref[0]            # [1, F] current node
    nodes = nodes_ref[0]    # [N, F]
    num_nodes = nn_ref[b]
    thr = thr_ref[0]
    N = nodes.shape[0]
    if mode == "euclidean":
        q2 = jnp.sum(q * q)
        n2 = jnp.sum(nodes * nodes, axis=-1)  # [N]
        qn = jnp.dot(nodes, q.T, preferred_element_type=jnp.float32)[:, 0]
        score = jnp.sqrt(jnp.maximum(q2 - 2.0 * qn + n2, 0.0))
    else:  # cosine similarity
        eps = 1e-8
        qn = jnp.dot(nodes, q.T, preferred_element_type=jnp.float32)[:, 0]
        nq = jnp.maximum(jnp.sqrt(jnp.sum(q * q)), eps)
        nn = jnp.maximum(jnp.sqrt(jnp.sum(nodes * nodes, axis=-1)), eps)
        score = qn / (nq * nn)
    idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
    mask = (score < thr) & (idx < num_nodes)
    out_ref[0, 0] = mask.astype(out_ref.dtype)


def _use_interpret():
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("mode",))
def sddmm_threshold_row(curr, nodes, num_nodes, threshold, mode="euclidean"):
    """curr: [B, F] current-node features; nodes: [B, N, F]; num_nodes: [B];
    threshold: scalar. Returns edge-mask row [B, N]: True where
    score(curr_b, node_j) < threshold and j < num_nodes[b] (no self edge) —
    the row the Distance selectors scatter into adj[num_nodes]."""
    B, N, F = nodes.shape
    kernel = functools.partial(_kernel, mode=mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, F), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, N), jnp.int32),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * F,
            bytes_accessed=4 * B * (N * F + F + N),
            transcendentals=B * N if mode == "euclidean" else 0,
        ),
    )(
        num_nodes.astype(jnp.int32),
        jnp.asarray([threshold], jnp.float32),
        curr.reshape(B, 1, F),
        nodes,
    )
    return out[:, 0, :].astype(jnp.bool_)
