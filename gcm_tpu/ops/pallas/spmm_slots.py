"""Sink-slot SpMM kernel — the degree-bounded fast path (zero matmul).

Layout: per (sink-window, source-window) pair bucket, each sink lane owns k
source SLOTS — srcs/ws [B, P, k, W] with local (within-window) source
indices. The kernel is k VPU lane-tile gathers + fused multiply-accumulate
per pair bucket: no one-hot build, no MXU, exact f32 (reference semantics:
sparse GraphConv aggregation, sparse_gcm.py:178).

Cost scales with k (the per-(sink, src-window) slot cap), NOT with W like
the one-hot scatter of spmm_pairs — so this is the winning form exactly
when the workload has a structural degree bound:

- TemporalEdge(hops): k = len(hops) by construction,
- learned selectors with a num_edge_samples cutoff: k = num_samples,
- radius/windowed selectors: k = window.

Measured (TPU v5e, B=64 N=512 E=8192 F=128): 0.67 ms at k=12 (7.8e8
edges/s) vs 1.23 ms for spmm_pairs f32x2 — and the advantage grows as k
shrinks (k=1 temporal graphs are bounded only by the x-block DMA, ~1e10
edges/s). For UNSTRUCTURED random graphs the required safe k (max bucket
occupancy, Poisson tail) erases the win — keep spmm_pairs there; numbers
in BASELINE.md.

Overflow contract: edges beyond a bucket's k slots are DROPPED by
`bucket_sink_slots` — validate with `check_slot_overflow` outside jit, or
choose k from the selector's structural bound (then overflow is impossible).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 128  # node window (one lane tile — the Mosaic dynamic_gather domain)


def _use_interpret():
    return jax.default_backend() != "tpu"


def _kernel(nw: int, k: int):
    def kernel(srcs_ref, w_ref, xT_ref, out_ref):
        xTw = xT_ref[0]          # [F, W] source window
        F = xTw.shape[0]
        p = pl.program_id(1)
        kc = p - (p // nw) * nw

        @pl.when(kc == 0)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        acc = jnp.zeros_like(out_ref[0], dtype=jnp.float32)
        for c in range(k):
            idx = jnp.broadcast_to(srcs_ref[0, 0, c, :][None, :], (F, W))
            g = jnp.take_along_axis(xTw, idx, axis=1)   # [F, W] VPU gather
            acc += g * w_ref[0, 0, c, :][None, :]
        out_ref[0] += acc
    return kernel


@functools.partial(jax.jit, static_argnames=("k",))
def spmm_slots_T(xT, srcs, ws, *, k: int):
    """Transposed-layout entry: xT [B, F, N]; srcs/ws [B, P, k, W] from
    `bucket_sink_slots` (P = (N/W)^2 pair buckets). Returns outT [B, F, N].
    N must be a multiple of 128."""
    B, F, N = xT.shape
    nw = N // W
    assert N % W == 0, f"N={N} must be a multiple of {W}"
    P = nw * nw
    assert srcs.shape == (B, P, k, W), srcs.shape

    return pl.pallas_call(
        _kernel(nw, k),
        grid=(B, P),
        in_specs=[
            pl.BlockSpec((1, 1, k, W), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k, W), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, W), lambda b, p: (b, 0, p % nw),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, F, W), lambda b, p: (b, 0, p // nw),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F, N), xT.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * P * k * W * F,
            bytes_accessed=4 * B * (2 * F * N + 2 * P * k * W),
            transcendentals=0,
        ),
    )(srcs, ws.astype(jnp.float32), xT)


def bucket_sink_slots(edges, weights, num_nodes: int, k: int):
    """Padded edge list [B, 2, E] -> sink-slot layout (srcs [B, P, k, W]
    int32 local source indices, ws [B, P, k, W], counts [B, N, nw]).
    Empty slots have weight 0 (they aggregate nothing). Edges beyond a
    (sink, src-window) bucket's k slots are DROPPED — check counts <= k
    outside jit (`check_slot_overflow`), or derive k from the selector's
    structural bound."""
    B, _, E = edges.shape
    nw = num_nodes // W
    P = nw * nw
    snk = edges[:, 0, :]
    src = edges[:, 1, :]
    valid = (snk >= 0) & (src >= 0)
    kc = jnp.clip(src // W, 0, nw - 1)
    keyid = jnp.where(valid, snk * nw + kc, num_nodes * nw)   # [B, E]
    from gcm_tpu.ops.scatter import bucket_rank

    myrank = bucket_rank(keyid)
    p = jnp.clip(snk // W, 0, nw - 1) * nw + kc
    lane = jnp.where(valid, snk, 0) % W
    dest = jnp.where(valid & (myrank < k),
                     (p * k + myrank) * W + lane, P * k * W)
    bi = jnp.arange(B)[:, None]
    srcs = jnp.zeros((B, P * k * W + 1), jnp.int32)
    srcs = srcs.at[bi, dest].set(jnp.where(valid, src, 0) % W)
    srcs = srcs[:, :-1].reshape(B, P, k, W)
    ws = jnp.zeros((B, P * k * W + 1), weights.dtype)
    ws = ws.at[bi, dest].set(jnp.where(valid, weights, 0.0))
    ws = ws[:, :-1].reshape(B, P, k, W)
    # per-bucket occupancy (overflow check only — not the hot path)
    cnt = jnp.zeros((B, num_nodes * nw + 1), jnp.int32)
    cnt = cnt.at[bi, jnp.minimum(keyid, num_nodes * nw)].add(1)
    counts = cnt[:, :-1].reshape(B, num_nodes, nw)
    return srcs, ws, counts


def check_slot_overflow(counts, k: int):
    """Outside-jit guard: raise if any (sink, src-window) bucket overflowed."""
    import numpy as np

    c = np.asarray(counts)
    if (c > k).any():
        raise ValueError(
            f"sink-slot overflow: max bucket count {int(c.max())} > k={k}; "
            f"raise k (or use ops.dispatch.spmm / spmm_pairs)")


def _layout_edges(srcs, ws, num_nodes):
    """Recover a padded global edge list [B, 2, P*k*W] from the slot layout
    (weight-0 slots become sentinels) — used by the backward pass."""
    B, P, k, _ = srcs.shape
    nw = num_nodes // W
    p = jnp.arange(P)[None, :, None, None]
    lane = jnp.arange(W)[None, None, None, :]
    sink = (p // nw) * W + lane
    src = (p % nw) * W + srcs
    valid = ws != 0.0
    sink = jnp.where(valid, jnp.broadcast_to(sink, srcs.shape), -1)
    src = jnp.where(valid, src, -1)
    flat = lambda a: a.reshape(B, -1)
    return jnp.stack([flat(sink), flat(src)], axis=1), flat(ws)


# ----------------------------------------------------------------- public op

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def spmm_slots(x, srcs, ws, num_nodes, k):
    """Differentiable degree-bounded SpMM in standard [B, N, F] layout.
    srcs/ws from bucket_sink_slots. Grad flows to x and ws."""
    xT = jnp.swapaxes(x, 1, 2)
    outT = spmm_slots_T(xT, srcs, ws, k=k)
    return jnp.swapaxes(outT, 1, 2)


def _fwd(x, srcs, ws, num_nodes, k):
    return spmm_slots(x, srcs, ws, num_nodes, k), (x, srcs, ws)


def _bwd(num_nodes, k, res, g):
    from gcm_tpu.ops.scatter import edge_mask, gather_nodes

    x, srcs, ws = res
    edges, flat_w = _layout_edges(srcs, ws, num_nodes)
    # dx: aggregate g over the TRANSPOSED graph. The flipped graph has no
    # structural slot bound, so rebucket at the safe cap... instead reuse
    # the pair-bucketed kernel's transpose trick is unavailable here;
    # aggregate with the dispatched spmm (one-hot kernel / XLA) on the
    # flipped edge list — correctness first, the forward is the hot path.
    from gcm_tpu.ops.dispatch import spmm as spmm_dispatch

    flipped = jnp.stack([edges[:, 1, :], edges[:, 0, :]], axis=1)
    dx = spmm_dispatch(g, flipped, flat_w)
    # dw[slot] = <g[sink], x[src]> per valid slot, in layout space
    valid = edge_mask(edges)
    g_sink = gather_nodes(g, edges[:, 0, :])
    x_src = gather_nodes(x, edges[:, 1, :])
    dw_flat = jnp.where(valid, jnp.sum(g_sink * x_src, axis=-1), 0.0)
    dw = dw_flat.reshape(ws.shape).astype(ws.dtype)
    return dx, None, dw


spmm_slots.defvjp(_fwd, _bwd)
