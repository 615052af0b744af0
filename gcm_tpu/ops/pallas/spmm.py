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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# edges per VMEM tile: one-hot tile is E_BLK x N floats (2 MB at N=1024)
_E_BLK = 512


def _split_f32x2(v):
    """Error-compensated bf16 split: v ≈ hi + lo with both parts bf16.
    Each MXU pass is single-pass bf16 (Mosaic rejects multi-pass bf16
    contractions), accumulation is f32 via preferred_element_type."""
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_kernel(mode):
    def kernel(edges_ref, w_ref, x_ref, out_ref):
        x = x_ref[0]               # [N, F]
        sink = edges_ref[0, 0, :]  # [E_blk] int32 (-1 sentinel)
        src = edges_ref[0, 1, :]
        w = w_ref[0, 0]            # [E_blk]
        N = x.shape[0]
        E = sink.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (E, N), 1)
        if mode == "f32x2":
            # 2 bf16 MXU passes per dot with f32 accumulate: measured middle
            # point between the env-default single-pass bf16 (~5e-2 max err)
            # and Precision.HIGHEST 3-pass f32 (3x cost). One-hots are
            # exactly representable in bf16, so the only rounding is the
            # hi/lo split residual (~1e-4 relative).
            src_oh = (rows == src[:, None]).astype(jnp.bfloat16)
            xh, xl = _split_f32x2(x.astype(jnp.float32))
            gathered = (
                jnp.dot(src_oh, xh, preferred_element_type=jnp.float32)
                + jnp.dot(src_oh, xl, preferred_element_type=jnp.float32))
            gw = gathered * w[:, None].astype(jnp.float32)
            gh, gl = _split_f32x2(gw)
            sink_oh = (rows == sink[:, None]).astype(jnp.bfloat16)
            partial = (
                jnp.dot(sink_oh.T, gh, preferred_element_type=jnp.float32)
                + jnp.dot(sink_oh.T, gl, preferred_element_type=jnp.float32))
        else:
            # 'default' must pass precision=None (inherit the GLOBAL
            # jax_default_matmul_precision) — pinning Precision.DEFAULT
            # would force bf16 even under contexts that set 'highest'
            # (parity tests, bench_reference comparisons), which the round-4
            # TPU drive caught as a 2.7e-3 dense-vs-sparse divergence.
            prec = (jax.lax.Precision.HIGHEST if mode == "highest"
                    else None)
            src_oh = (rows == src[:, None]).astype(x.dtype)    # [E_blk, N]
            gathered = jnp.dot(src_oh, x,
                               preferred_element_type=jnp.float32,
                               precision=prec)
            gathered = gathered * w[:, None]
            sink_oh = (rows == sink[:, None]).astype(x.dtype)  # [E_blk, N]
            partial = jnp.dot(sink_oh.T, gathered.astype(x.dtype),
                              preferred_element_type=jnp.float32,
                              precision=prec)

        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        out_ref[0] += partial.astype(out_ref.dtype)
    return kernel


_KERNELS = {m: _make_kernel(m) for m in ("default", "f32x2", "highest")}


def _use_interpret():
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("precision",))
def spmm_edge_list(x, edges, weights, precision: str = "default"):
    """x: [B, N, F]; edges: [B, 2, E] (sink, source; -1 sentinel);
    weights: [B, E]. Returns [B, N, F]. Signature-compatible with
    ops.scatter.edge_scatter_add.

    precision: 'default' (env matmul precision — single-pass bf16 on this
    TPU, ~5e-2 max err), 'f32x2' (error-compensated 2-pass bf16, ~1e-4),
    'highest' (3-pass f32, exactest/slowest). Measured in BASELINE.md's
    SpMM variant table; config.SPMM_PRECISION picks the dispatch default."""
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
        _KERNELS[precision],
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
