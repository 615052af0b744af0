"""Differentiable, backend-dispatched compute ops.

The conv layers call these; each op picks the Pallas kernel on TPU (within
its profitable size regime) or the XLA fallback elsewhere, and defines a
custom VJP so training works through the Pallas forward (pallas_call has no
automatic transpose).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcm_tpu import config
from gcm_tpu.ops.scatter import edge_mask, edge_scatter_add, gather_nodes


def _spmm_forward(x, edges, weights):
    if (config.use_pallas()
            and x.shape[1] <= config.PALLAS_SPMM_MAX_NODES
            and edges.shape[-1] * x.shape[1] >= config.PALLAS_SPMM_MIN_WORK):
        from gcm_tpu.ops.pallas.spmm import spmm_edge_list

        return spmm_edge_list(x, edges, weights,
                              precision=config.SPMM_PRECISION)
    return edge_scatter_add(x, edges, weights)


@jax.custom_vjp
def spmm(x, edges, weights):
    """out[b, i] = Σ_{e: sink_e = i} w_e · x[b, src_e]. Differentiable in x
    and weights; edges are index data."""
    return _spmm_forward(x, edges, weights)


def _spmm_fwd(x, edges, weights):
    return _spmm_forward(x, edges, weights), (x, edges, weights)


def _spmm_bwd(res, g):
    x, edges, weights = res
    # dx: transpose the graph (swap sink/source), same weights
    flipped = jnp.stack([edges[:, 1, :], edges[:, 0, :]], axis=1)
    dx = _spmm_forward(g, flipped, weights)
    # dw_e = <g[b, sink_e], x[b, src_e]>
    valid = edge_mask(edges)
    g_sink = gather_nodes(g, edges[:, 0, :])
    x_src = gather_nodes(x, edges[:, 1, :])
    dw = jnp.where(valid, jnp.sum(g_sink * x_src, axis=-1), 0.0)
    return dx, None, dw.astype(weights.dtype)


spmm.defvjp(_spmm_fwd, _spmm_bwd)


def _gconv_forward(x, adj, w_rel, b_rel, w_root):
    if config.use_pallas() and config.PALLAS_DENSE_GCONV:
        from gcm_tpu.ops.pallas.dense_gconv import fused_dense_graph_conv

        return fused_dense_graph_conv(x, adj, w_rel, b_rel, w_root)
    agg = jnp.einsum("bij,bjf->bif", adj, x)
    return (jnp.einsum("bnf,fo->bno", agg, w_rel) + b_rel
            + jnp.einsum("bnf,fo->bno", x, w_root))


@jax.custom_vjp
def dense_graph_conv(x, adj, w_rel, b_rel, w_root):
    """out = (adj @ x) @ w_rel + b_rel + x @ w_root (DenseGraphConv 'add'
    semantics). Differentiable in every argument incl. adj (learned edges)."""
    return _gconv_forward(x, adj, w_rel, b_rel, w_root)


def _gconv_fwd(x, adj, w_rel, b_rel, w_root):
    return _gconv_forward(x, adj, w_rel, b_rel, w_root), (x, adj, w_rel,
                                                          w_root)


def _gconv_bwd(res, g):
    x, adj, w_rel, w_root = res
    agg = jnp.einsum("bij,bjf->bif", adj, x)
    dagg = jnp.einsum("bno,fo->bnf", g, w_rel)
    dx = (jnp.einsum("bij,bif->bjf", adj, dagg)
          + jnp.einsum("bno,fo->bnf", g, w_root))
    dadj = jnp.einsum("bnf,bjf->bnj", dagg, x)
    dw_rel = jnp.einsum("bnf,bno->fo", agg, g)
    db_rel = jnp.sum(g, axis=(0, 1))
    dw_root = jnp.einsum("bnf,bno->fo", x, g)
    return dx, dadj, dw_rel, db_rel, dw_root


dense_graph_conv.defvjp(_gconv_fwd, _gconv_bwd)
