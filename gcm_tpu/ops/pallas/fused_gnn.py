"""Whole-GNN fused Pallas kernel (SURVEY.md N1, extended).

Runs an entire stack of DenseGraphConv('add') layers + elementwise
activations in ONE kernel per batch element: every intermediate activation
stays in VMEM, so a 2-layer GCM conv stack costs one HBM read of (x, adj) and
one write of the output instead of four round trips. This is the hot loop of
the flagship DenseGCM scan (reference gcm.py:308 executed T times).

Backward: custom VJP that replays the forward with XLA einsums (recompute /
rematerialization — trades FLOPs for the memory XLA would spend saving
per-layer activations inside lax.scan).

DISPATCH STATUS: measured SLOWER than XLA's own fusion at every practical
size (same finding as dense_gconv.py; config.py PALLAS_DENSE_GCONV=False).
Kept as the tested reference implementation of the fused-stack design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_act(h, act):
    if act == "tanh":
        return jnp.tanh(h)
    if act == "relu":
        return jnp.maximum(h, 0.0)
    if act is None:
        return h
    raise ValueError(f"unsupported activation {act}")


def _kernel(x_ref, adj_ref, *refs, acts, n_layers, bb):
    # refs: [wr_0, br_0, wo_0, ..., wr_{L-1}, br_{L-1}, wo_{L-1}, out_ref]
    # Processes a block of `bb` batch elements per program: per-element work
    # is tiny (N≈128 matmuls), so batching amortizes the kernel launch.
    out_ref = refs[-1]
    for b in range(bb):
        h = x_ref[b]
        adj = adj_ref[b]
        for layer in range(n_layers):
            wr = refs[3 * layer][...]
            br = refs[3 * layer + 1][0]
            wo = refs[3 * layer + 2][...]
            agg = jnp.dot(adj, h, preferred_element_type=jnp.float32)
            h = (jnp.dot(agg, wr, preferred_element_type=jnp.float32)
                 + jnp.dot(h, wo, preferred_element_type=jnp.float32)
                 + br[None, :])
            h = _apply_act(h, acts[layer])
        out_ref[b] = h.astype(out_ref.dtype)


def _use_interpret():
    return jax.default_backend() != "tpu"


def _xla_forward(x, adj, flat_params, acts):
    h = x
    for layer, act in enumerate(acts):
        wr, br, wo = flat_params[3 * layer : 3 * layer + 3]
        agg = jnp.einsum("bij,bjf->bif", adj, h)
        h = (jnp.einsum("bnf,fo->bno", agg, wr) + br
             + jnp.einsum("bnf,fo->bno", h, wo))
        h = _apply_act(h, act)
    return h


def _batch_block(B, N, F, budget_bytes=6 * 1024 * 1024):
    """Largest batch block whose (adj + 2 activations) fit the VMEM budget."""
    per_elem = 4 * (N * N + 2 * N * max(F, 128))
    bb = max(1, budget_bytes // per_elem)
    while B % bb:
        bb -= 1
    return bb


@functools.partial(jax.jit, static_argnames=("acts",))
def _pallas_forward(x, adj, flat_params, acts):
    B, N, F = x.shape
    n_layers = len(acts)
    Fo = flat_params[-3].shape[-1]
    bb = _batch_block(B, N, max(F, Fo))
    kernel = functools.partial(_kernel, acts=acts, n_layers=n_layers, bb=bb)
    in_specs = [
        pl.BlockSpec((bb, N, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, N, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    call_params = []
    for layer in range(n_layers):
        wr, br, wo = flat_params[3 * layer : 3 * layer + 3]
        in_specs += [
            pl.BlockSpec(wr.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + br.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wo.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
        ]
        call_params += [wr, br.reshape(1, -1), wo]
    flops = 2 * B * sum(
        N * N * flat_params[3 * i].shape[0]
        + 2 * N * flat_params[3 * i].shape[0] * flat_params[3 * i].shape[1]
        for i in range(n_layers)
    )
    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, N, Fo), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, Fo), x.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * B * (N * F + N * N + N * Fo),
            transcendentals=B * N * Fo * n_layers,
        ),
    )(x, adj, *call_params)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_dense_gnn(x, adj, flat_params, acts):
    """x [B,N,F], adj [B,N,N], flat_params = (wr0, br0, wo0, wr1, ...),
    acts = tuple of None|'tanh'|'relu' per layer. Fully differentiable."""
    from gcm_tpu import config

    if config.use_pallas() and config.PALLAS_DENSE_GCONV:
        return _pallas_forward(x, adj, tuple(flat_params), tuple(acts))
    return _xla_forward(x, adj, flat_params, acts)


def _fwd(x, adj, flat_params, acts):
    return fused_dense_gnn(x, adj, flat_params, acts), (x, adj, flat_params)


def _bwd(acts, res, g):
    x, adj, flat_params = res

    def replay(x, adj, flat_params):
        return _xla_forward(x, adj, flat_params, acts)

    _, vjp = jax.vjp(replay, x, adj, flat_params)
    return vjp(g)


fused_dense_gnn.defvjp(_fwd, _bwd)
