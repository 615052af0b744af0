"""Pair-window bucketed SpMM kernel — v2 of the padded-edge-list SpMM.

Computes out[b, i] = Σ_{e: sink_e = i} w_e · x[b, src_e] (the sparse
GraphConv aggregation, reference sparse_gcm.py:178) for edge lists grouped
into (sink-window, source-window) pair buckets of W=128 node rows each.

Why: the v1 kernel (ops/pallas/spmm.py) reformulates gather+scatter as two
one-hot matmuls over the FULL node axis — 4·E·N·F MXU flops for 2·E·F useful
ones. Measured on TPU v5e it runs at ~46% of bf16 MXU peak, so the only way
up is fewer flops, not better scheduling. Grouping edges by 128-row window
pairs shrinks both matmul contractions from N to W=128:

  gather : xT[:, kc·W:(kc+1)·W] rows selected by a LANE-TILE take_along_axis
           (Mosaic dynamic_gather — VPU, zero MXU flops; indices < 128 stay
           inside one lane tile, the only form Mosaic supports),
  scatter: msgs [F, e] @ OneHot(sink − ks·W) [e, W] on the MXU — 2·E·W·F
           flops instead of 2·E·N·F.

Precision: messages are exact f32 (VPU gather + f32 multiply). The scatter
matmul runs in bf16 with an optional error-compensated low part
(precision="f32x2": msgs split into hi+lo bf16, two MXU passes — measured
max error vs f32 ≈ 8e-5 relative on TPU v5e; "bf16": one pass, ~5e-2). Note
this environment's default f32 matmul precision is itself single-pass bf16,
so "f32x2" is *more* accurate than the XLA fallback under default settings.

Measured (TPU v5e, B=64 N=512 E=8192 F=128, cap=1024): 4.3e8 edges/s f32x2,
4.8e8 bf16 — 1.2-1.3x the v1 full-width one-hot kernel and ~7x the XLA
scatter fallback. Roofline accounting lives in BASELINE.md: the per-step
[F,e_blk]x[e_blk,W] matmul saturates a single 128x128 MXU (~31 TFLOP/s
observed = one-MXU peak), so the one-hot scatter's 2*W*F flops/edge put the
formulation's ceiling at ~0.9e9 edges/s / padding-factor; HBM speed of light
for this workload is 9.4e9. Going further requires a hardware scatter
primitive Mosaic does not expose (multi-tile dynamic_scatter).

Layout: the kernel works in transposed [B, F, N] ("xT") layout so the edge
axis lands on lanes for the gather. `spmm_pairs` accepts/returns standard
[B, N, F]; XLA fuses the boundary transposes into neighbouring ops.

The bucketed edge layout is produced by `bucket_edges_pairs` (one-time cost,
amortized across GNN layers that share the edge list — and the sparse core's
grid compaction can emit it directly). Bucket overflow drops edges, exactly
like the core's append_edges overflow contract: validate with
`check_bucket_overflow` outside jit.

Grid/VJP notes: out block (b, ks) accumulates across the kc-innermost grid
steps; the backward dx is the SAME kernel on the pair-transposed bucket
layout ((ks,kc)→(kc,ks), sink↔src — a pure reshape), dw is an XLA two-sided
gather. Falls back to interpret mode off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcm_tpu.ops.scatter import edge_mask, gather_nodes

W = 128   # node window (one lane tile — the Mosaic dynamic_gather domain)
_C = 128  # gather chunk along the edge axis


def _use_interpret():
    return jax.default_backend() != "tpu"


def _kernel(nw: int, e_blk: int, n_blk: int, two_pass: bool):
    def kernel(edges_ref, w_ref, xT_ref, out_ref):
        xTw = xT_ref[0]                      # [F, W] source window (f32)
        sink = edges_ref[0, 0, :]            # [e_blk] (-1 sentinel)
        src = edges_ref[0, 1, :]
        wts = w_ref[0, 0, :]                 # [e_blk] f32 (0 on invalid)
        F = xTw.shape[0]
        p = pl.program_id(1)
        ks = p // nw
        kc = p - ks * nw

        @pl.when(jnp.logical_and(kc == 0, pl.program_id(2) == 0))
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        sl = sink - ks * W                   # local sink rows (may be <0)
        il = jnp.clip(src - kc * W, 0, W - 1)

        # Gather the whole edge block in 128-lane chunks (the Mosaic
        # dynamic_gather domain), then scatter with ONE matmul per pass:
        # many tiny [F,128]x[128,W] dots are MXU-latency-bound, a single
        # [F,e_blk]x[e_blk,W] contraction is not.
        chunks = []
        for c in range(e_blk // _C):
            idx = jnp.broadcast_to(il[c * _C:(c + 1) * _C][None, :], (F, _C))
            chunks.append(jnp.take_along_axis(xTw, idx, axis=1))  # VPU
        g = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)
        msgs = g * wts[None, :]                                  # exact f32
        cols = jax.lax.broadcasted_iota(jnp.int32, (e_blk, W), 1)
        oh = (cols == sl[:, None]).astype(jnp.bfloat16)
        mh = msgs.astype(jnp.bfloat16)
        # precision pinned to DEFAULT: bf16 inputs are single-pass on the
        # MXU; a global jax_default_matmul_precision=highest would ask
        # Mosaic for a multi-pass bf16 contraction it rejects ("Bad lhs
        # type"). Accuracy is managed by the explicit hi+lo split instead.
        dot = functools.partial(jnp.dot,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        acc = dot(mh, oh)
        if two_pass:
            ml = (msgs - mh.astype(jnp.float32)).astype(jnp.bfloat16)
            acc += dot(ml, oh)

        out_ref[0] += acc.astype(out_ref.dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("cap", "precision", "e_blk"))
def spmm_pairs_T(xT, bedges, bweights, *, cap: int,
                 precision: str = "f32x2", e_blk: int = 1024):
    """Transposed-layout entry: xT [B, F, N], bedges [B, 2, P*cap] bucketed
    by `bucket_edges_pairs`, bweights [B, P*cap]. Returns outT [B, F, N].
    N and cap must be multiples of 128 (W) and e_blk respectively."""
    B, F, N = xT.shape
    nw = N // W
    assert N % W == 0, f"N={N} must be a multiple of {W}"
    assert cap % _C == 0, f"cap={cap} must be a multiple of {_C}"
    eb = min(e_blk, cap)
    while cap % eb:
        eb -= _C  # largest 128-multiple divisor of cap not above e_blk
    n_blk = cap // eb
    n_pairs = nw * nw
    assert bedges.shape == (B, 2, n_pairs * cap), bedges.shape

    return pl.pallas_call(
        _kernel(nw, eb, n_blk, precision == "f32x2"),
        grid=(B, n_pairs, n_blk),
        in_specs=[
            pl.BlockSpec((1, 2, eb),
                         lambda b, p, j: (b, 0, p * n_blk + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, eb),
                         lambda b, p, j: (b, 0, p * n_blk + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, W),
                         lambda b, p, j: (b, 0, p % nw),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, F, W),
                               lambda b, p, j: (b, 0, p // nw),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F, N), xT.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=(4 if precision == "f32x2" else 2) * B * n_pairs * cap * W * F,
            bytes_accessed=4 * B * (F * N * 2 + 3 * n_pairs * cap),
            transcendentals=0,
        ),
    )(bedges, bweights.astype(jnp.float32).reshape(B, 1, -1), xT)


def bucket_edges_pairs(edges, weights, num_nodes: int, cap: int):
    """Group a padded edge list [B, 2, E] into (sink-window, src-window) pair
    buckets of capacity `cap` each. Returns (bedges [B, 2, P*cap],
    bweights [B, P*cap], counts [B, P]) with P = (num_nodes/W)^2; invalid
    lanes hold sink=src=-1 and weight 0. Edges beyond a bucket's capacity are
    DROPPED (check counts <= cap outside jit — same contract as
    append_edges overflow, scatter.py:170-208).

    One-time O(E·P) index arithmetic, amortized across the GNN layers that
    share the edge list."""
    B, _, E = edges.shape
    nw = num_nodes // W
    P = nw * nw
    from gcm_tpu.ops.scatter import bucket_rank

    valid = edge_mask(edges)
    ks = jnp.clip(edges[:, 0, :] // W, 0, nw - 1)
    kc = jnp.clip(edges[:, 1, :] // W, 0, nw - 1)
    pair = jnp.where(valid, ks * nw + kc, P)                   # [B, E]
    myrank = bucket_rank(pair)  # sort-based: no [B, E, P] blowup
    dest = jnp.where(valid & (myrank < cap), pair * cap + myrank, P * cap)
    bi = jnp.arange(B)[:, None]
    be = jnp.full((B, 2, P * cap + 1), -1, jnp.int32)
    be = be.at[bi, 0, dest].set(jnp.where(valid, edges[:, 0, :], -1))
    be = be.at[bi, 1, dest].set(jnp.where(valid, edges[:, 1, :], -1))
    bw = jnp.zeros((B, P * cap + 1), weights.dtype)
    bw = bw.at[bi, dest].set(jnp.where(valid, weights, 0.0))
    cnt = jnp.zeros((B, P + 1), jnp.int32)
    cnt = cnt.at[bi, jnp.minimum(pair, P)].add(1)
    counts = cnt[:, :P]
    return be[:, :, :-1], bw[:, :-1], counts


def check_bucket_overflow(counts, cap: int):
    """Outside-jit guard: raise if any pair bucket overflowed (edges were
    dropped by bucket_edges_pairs)."""
    import numpy as np

    c = np.asarray(counts)
    if (c > cap).any():
        worst = int(c.max())
        raise ValueError(
            f"pair-bucket overflow: max bucket count {worst} > cap {cap}; "
            f"raise cap (or fall back to ops.dispatch.spmm)")


def transpose_pairs(bedges, bweights, num_nodes: int, cap: int):
    """Bucketed layout of the TRANSPOSED graph (sink<->src swapped): pair
    (ks,kc) -> (kc,ks), rows swapped. Pure reshape — no recompaction."""
    B = bedges.shape[0]
    nw = num_nodes // W
    e4 = bedges.reshape(B, 2, nw, nw, cap)
    e4 = jnp.flip(e4, axis=1)          # swap sink/src rows
    e4 = jnp.swapaxes(e4, 2, 3)        # (ks,kc) -> (kc,ks)
    w4 = jnp.swapaxes(bweights.reshape(B, nw, nw, cap), 1, 2)
    return e4.reshape(B, 2, -1), w4.reshape(B, -1)


# ----------------------------------------------------------------- public op

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def spmm_pairs(x, bedges, bweights, num_nodes, cap, precision="f32x2"):
    """Differentiable bucketed SpMM in standard [B, N, F] layout.
    bedges/bweights from bucket_edges_pairs. Grad flows to x and bweights."""
    xT = jnp.swapaxes(x, 1, 2)
    outT = spmm_pairs_T(xT, bedges, bweights, cap=cap, precision=precision)
    return jnp.swapaxes(outT, 1, 2)


def _fwd(x, bedges, bweights, num_nodes, cap, precision):
    return (spmm_pairs(x, bedges, bweights, num_nodes, cap, precision),
            (x, bedges, bweights))


def _bwd(num_nodes, cap, precision, res, g):
    x, bedges, bweights = res
    fe, fw = transpose_pairs(bedges, bweights, num_nodes, cap)
    dx = spmm_pairs(g, fe, fw, num_nodes, cap, precision)
    valid = edge_mask(bedges)
    g_sink = gather_nodes(g, bedges[:, 0, :])
    x_src = gather_nodes(x, bedges[:, 1, :])
    dw = jnp.where(valid, jnp.sum(g_sink * x_src, axis=-1), 0.0)
    return dx, None, dw.astype(bweights.dtype)


spmm_pairs.defvjp(_fwd, _bwd)
