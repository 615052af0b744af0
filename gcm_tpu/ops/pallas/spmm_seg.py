"""Sink-sorted segmented-reduction SpMM kernel — v4 of the padded-edge-list
SpMM (the one real attempt beyond the one-hot formulation ceiling, VERDICT r2
item 6; reference semantics: the sparse GraphConv aggregation,
sparse_gcm.py:178 / torch_scatter substrate util.py:4).

Idea: the one-hot family (spmm.py v1, spmm2.py v2) pays >= 2*W*F MXU flops
per edge for 2*F useful; the slot family (spmm_slots.py v3) pays k gathers
per 128 sink lanes regardless of occupancy. This kernel makes the cost scale
with the ACTUAL edge count and uses zero MXU: edges are grouped into the
same (sink-window, src-window) W=128 pair buckets as v2 but SORTED BY SINK
within each bucket; per 128-edge chunk the kernel

  1. lane-gathers the source rows (the Mosaic dynamic_gather, as v2/v3),
  2. takes a lane cumsum of the weighted messages [F, 128],
  3. reads each sink's segment sum as C[end-1] - C[begin-1] with two more
     lane gathers from the 128-wide cumsum table (per-chunk begin/end
     boundary tables are precomputed by `bucket_edges_segments`).

Per 128 edges: 3 lane gathers + 1 cumsum + O(1) VPU algebra — O(E*F) work,
exact f32 (no bf16 one-hot matmul). "Exact f32" means dtype-exact: every
add is f32 with no low-precision intermediates. It is NOT order-identical
to a sequential per-segment sum — the Hillis-Steele doubling scan below
reassociates the additions, so segment sums can differ from a sequential
jnp.cumsum in final ULPs. All gathers read 128-lane tables (the only
take_along_axis form Mosaic compiles; wider tables fail).

A sink whose edges span chunk boundaries accumulates partial sums across the
chunk grid dimension (out block revisited; sorted order makes every chunk's
contribution a contiguous segment).

Measured status (record in BASELINE.md per the dispatch-by-measurement
rule): measured at the bench point (negative — see BASELINE.md)
(B=64, N=512, E=8192, F=128) and the temporal regime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcm_tpu.ops.scatter import edge_mask, gather_nodes

W = 128   # node window (one lane tile — the Mosaic dynamic_gather domain)
_C = 128  # edge chunk (cumsum table width = one lane tile)


def _use_interpret():
    return jax.default_backend() != "tpu"


def _kernel(nw: int):
    def kernel(edges_ref, w_ref, begin_ref, end_ref, xT_ref, out_ref):
        xTw = xT_ref[0]                       # [F, W] source window
        src = edges_ref[0, 1, :]              # [_C]
        wts = w_ref[0, 0, :]                  # [_C] f32, 0 on invalid lanes
        begin = begin_ref[0, 0, 0, 0, :]      # [W] chunk-local begin per sink
        end = end_ref[0, 0, 0, 0, :]          # [W] chunk-local end per sink
        F = xTw.shape[0]
        p = pl.program_id(1)
        kc = p - (p // nw) * nw

        @pl.when(jnp.logical_and(kc == 0, pl.program_id(2) == 0))
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        il = jnp.clip(src - kc * W, 0, W - 1)
        idx = jnp.broadcast_to(il[None, :], (F, _C))
        g = jnp.take_along_axis(xTw, idx, axis=1)     # [F, _C] VPU gather
        msgs = g * wts[None, :]                       # exact f32
        # lane cumsum via log-step doubling (Mosaic has no cumsum lowering):
        # 7 static shift+adds on [F, 128], exact f32, VPU-only.
        C = msgs
        k = 1
        while k < _C:
            C = C + jnp.concatenate(
                [jnp.zeros((F, k), C.dtype), C[:, :_C - k]], axis=1)
            k *= 2

        e_idx = jnp.broadcast_to(jnp.clip(end - 1, 0, _C - 1)[None, :],
                                 (F, W))
        b_idx = jnp.broadcast_to(jnp.clip(begin - 1, 0, _C - 1)[None, :],
                                 (F, W))
        Ce = jnp.take_along_axis(C, e_idx, axis=1)    # [F, W]
        Cb = jnp.take_along_axis(C, b_idx, axis=1)
        has = (end > begin)[None, :]
        part = jnp.where(has,
                         Ce - jnp.where((begin > 0)[None, :], Cb, 0.0), 0.0)
        out_ref[0] += part.astype(out_ref.dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("cap",))
def spmm_seg_T(xT, bedges, bweights, begin, end, *, cap: int):
    """Transposed-layout entry: xT [B, F, N]; bedges/bweights/begin/end from
    `bucket_edges_segments` (sink-sorted pair buckets of capacity cap).
    Returns outT [B, F, N]. N, cap must be multiples of 128."""
    B, F, N = xT.shape
    nw = N // W
    assert N % W == 0, f"N={N} must be a multiple of {W}"
    assert cap % _C == 0, f"cap={cap} must be a multiple of {_C}"
    n_chunks = cap // _C
    P = nw * nw
    assert bedges.shape == (B, 2, P * cap), bedges.shape
    assert begin.shape == (B, P, n_chunks, W), begin.shape

    return pl.pallas_call(
        _kernel(nw),
        grid=(B, P, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 2, _C),
                         lambda b, p, j: (b, 0, p * n_chunks + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _C),
                         lambda b, p, j: (b, 0, p * n_chunks + j),
                         memory_space=pltpu.VMEM),
            # Mosaic needs the block's trailing two dims (8,128)-divisible or
            # equal to the array's; a singleton axis before W satisfies that
            # (block (...,1,W) over array (...,1,W)).
            pl.BlockSpec((1, 1, 1, 1, W), lambda b, p, j: (b, p, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1, W), lambda b, p, j: (b, p, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, W), lambda b, p, j: (b, 0, p % nw),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, F, W), lambda b, p, j: (b, 0, p // nw),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F, N), xT.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * P * cap * F,
            bytes_accessed=4 * B * (2 * F * N + 3 * P * cap
                                    + 2 * P * (cap // _C) * W),
            transcendentals=0,
        ),
    )(bedges, bweights.astype(jnp.float32).reshape(B, 1, -1),
      begin[:, :, :, None, :], end[:, :, :, None, :], xT)


def bucket_edges_segments(edges, weights, num_nodes: int, cap: int):
    """Pair-bucket a padded edge list [B, 2, E] like `bucket_edges_pairs`
    but SINK-SORTED within each bucket, and emit per-(pair, chunk) boundary
    tables: begin/end [B, P, cap/128, W] give each sink lane's contiguous
    segment inside each 128-edge chunk. Overflowing edges per bucket are
    dropped (check counts <= cap outside jit, as for v2/v3)."""
    from gcm_tpu.ops.scatter import bucket_rank

    B, _, E = edges.shape
    nw = num_nodes // W
    P = nw * nw
    n_chunks = cap // _C
    valid = edge_mask(edges)
    ks = jnp.clip(edges[:, 0, :] // W, 0, nw - 1)
    kc = jnp.clip(edges[:, 1, :] // W, 0, nw - 1)
    pair = jnp.where(valid, ks * nw + kc, P)
    sl = jnp.where(valid, edges[:, 0, :] - ks * W, W)
    comp = pair * (W + 1) + sl  # sort by (pair, local sink)
    order = jnp.argsort(comp, axis=-1, stable=True)
    take = lambda a: jnp.take_along_axis(a, order, axis=-1)
    pair_s, sl_s, valid_s = take(pair), take(sl), take(valid)
    sink_s = take(edges[:, 0, :])
    src_s = take(edges[:, 1, :])
    w_s = take(weights)
    rank = bucket_rank(pair_s)  # rank within pair, sink-ascending
    ok = valid_s & (rank < cap)
    dest = jnp.where(ok, pair_s * cap + rank, P * cap)
    bi = jnp.arange(B)[:, None]
    be = jnp.full((B, 2, P * cap + 1), -1, jnp.int32)
    be = be.at[bi, 0, dest].set(jnp.where(ok, sink_s, -1))
    be = be.at[bi, 1, dest].set(jnp.where(ok, src_s, -1))
    bw = jnp.zeros((B, P * cap + 1), weights.dtype)
    bw = bw.at[bi, dest].set(jnp.where(ok, w_s, 0.0))
    # boundary tables: count edges per (pair, chunk, sink lane), then end =
    # inclusive lane cumsum within the chunk, begin = end - count
    chunk = rank // _C
    key2 = jnp.where(ok, (pair_s * n_chunks + chunk) * W + sl_s,
                     P * n_chunks * W)
    cnt = jnp.zeros((B, P * n_chunks * W + 1), jnp.int32)
    cnt = cnt.at[bi, key2].add(1)
    cnt = cnt[:, :-1].reshape(B, P, n_chunks, W)
    end = jnp.cumsum(cnt, axis=-1)
    begin = end - cnt
    # per-bucket totals for the overflow guard
    tot = jnp.zeros((B, P + 1), jnp.int32)
    tot = tot.at[bi, jnp.minimum(pair, P)].add(valid.astype(jnp.int32))
    return (be[:, :, :-1], bw[:, :-1], begin.astype(jnp.int32),
            end.astype(jnp.int32), tot[:, :P])


# ----------------------------------------------------------------- public op

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def spmm_seg(x, bedges, bweights, begin, end, num_nodes, cap):
    """Differentiable segmented SpMM in standard [B, N, F] layout.
    Inputs from bucket_edges_segments. Grad flows to x and bweights."""
    xT = jnp.swapaxes(x, 1, 2)
    outT = spmm_seg_T(xT, bedges, bweights, begin, end, cap=cap)
    return jnp.swapaxes(outT, 1, 2)


def _fwd(x, bedges, bweights, begin, end, num_nodes, cap):
    return (spmm_seg(x, bedges, bweights, begin, end, num_nodes, cap),
            (x, bedges, bweights))


def _bwd(num_nodes, cap, res, g):
    # dx: aggregate g over the transposed graph — correctness-first via the
    # dispatched spmm on the flipped edge list (same policy as spmm_slots).
    from gcm_tpu.ops.dispatch import spmm as spmm_dispatch

    x, bedges, bweights = res
    flipped = jnp.stack([bedges[:, 1, :], bedges[:, 0, :]], axis=1)
    dx = spmm_dispatch(g, flipped, bweights)
    valid = edge_mask(bedges)
    g_sink = gather_nodes(g, bedges[:, 0, :])
    x_src = gather_nodes(x, bedges[:, 1, :])
    dw = jnp.where(valid, jnp.sum(g_sink * x_src, axis=-1), 0.0)
    return dx, None, dw.astype(bweights.dtype), None, None


spmm_seg.defvjp(_fwd, _bwd)
