"""Dense (adjacency-matrix) graph convolutions — the GNN layer zoo, dense side.

TPU-native implementations of torch_geometric's DenseGraphConv / DenseGCNConv
semantics (the canonical GNNs for DenseGCM — reference src/gcm/gcm.py:308 and
tests/test_gcm.py:95-101, 202-240 which pin lin_root/lin_rel behavior). The
whole layer is batched matmul (`adj @ x` then two linears), which is exactly
what the MXU wants; the fused Pallas variant lives in gcm_tpu.ops.pallas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcm_tpu.nn.module import Linear


class DenseGraphConv:
    """out = lin_rel(aggr(adj, x)) + lin_root(x).

    aggr='add'  : aggr = adj @ x
    aggr='mean' : aggr = adj @ x / max(deg, 1)
    aggr='max'  : elementwise max over in-neighbors

    Matches torch_geometric.nn.DenseGraphConv. `adj[b, i, j] != 0` means the
    message flows j -> i (sink-row convention, reference
    edge_selectors/temporal.py:5-14).
    """

    def __init__(self, in_dim: int, out_dim: int, aggr: str = "add",
                 use_bias: bool = True, dtype=jnp.float32):
        assert aggr in ("add", "mean", "max")
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.aggr = aggr
        self.lin_rel = Linear(in_dim, out_dim, use_bias=use_bias, dtype=dtype)
        self.lin_root = Linear(in_dim, out_dim, use_bias=False, dtype=dtype)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"lin_rel": self.lin_rel.init(k1),
                "lin_root": self.lin_root.init(k2)}

    def __call__(self, params, x, adj, mask=None):
        if self.aggr == "add":
            # differentiable backend-dispatched op (fused Pallas kernel on
            # TPU, XLA einsum elsewhere)
            from gcm_tpu.ops.dispatch import dense_graph_conv

            b_rel = params["lin_rel"].get(
                "bias", jnp.zeros((self.out_dim,), x.dtype)
            )
            out = dense_graph_conv(
                x, adj.astype(x.dtype), params["lin_rel"]["kernel"], b_rel,
                params["lin_root"]["kernel"],
            )
            if mask is not None:
                out = out * mask[..., None].astype(out.dtype)
            return out
        if self.aggr == "mean":
            agg = jnp.einsum("bij,bjf->bif", adj, x)
            deg = jnp.sum(adj, axis=-1, keepdims=True)
            agg = agg / jnp.maximum(deg, 1.0)
        else:  # max aggregation
            neg = jnp.finfo(x.dtype).min
            msgs = jnp.where((adj != 0)[..., None], x[:, None, :, :], neg)
            agg = jnp.max(msgs, axis=2)
            agg = jnp.where(agg == neg, 0.0, agg)
        out = self.lin_rel(params["lin_rel"], agg) + self.lin_root(
            params["lin_root"], x
        )
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        return out


class DenseGCNConv:
    """Dense GCN layer: out = D^-1/2 (A with unit diagonal) D^-1/2 (x W) + b.

    Matches torch_geometric.nn.DenseGCNConv: with add_loop=True the diagonal
    is *set* to 1 (2 if improved), degrees are clamped to >= 1.
    """

    def __init__(self, in_dim: int, out_dim: int, improved: bool = False,
                 use_bias: bool = True, dtype=jnp.float32):
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.improved = improved
        self.use_bias = use_bias
        self.lin = Linear(in_dim, out_dim, use_bias=False, init="glorot",
                          dtype=dtype)
        self.dtype = dtype

    def init(self, key):
        params = {"lin": self.lin.init(key)}
        if self.use_bias:
            params["bias"] = jnp.zeros((self.out_dim,), self.dtype)
        return params

    def __call__(self, params, x, adj, mask=None, add_loop: bool = True):
        B, N, _ = x.shape
        if add_loop:
            eye = jnp.eye(N, dtype=adj.dtype)
            diag_val = 2.0 if self.improved else 1.0
            adj = adj * (1.0 - eye) + eye * diag_val
        out = self.lin(params["lin"], x)
        deg_inv_sqrt = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(adj, axis=-1), 1.0)
        )
        adj = deg_inv_sqrt[:, :, None] * adj * deg_inv_sqrt[:, None, :]
        out = jnp.einsum("bij,bjf->bif", adj, out)
        if self.use_bias:
            out = out + params["bias"]
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        return out


def conv_project(cp, agg, h, act):
    """The tail of every DenseGraphConv: lin_rel(agg) + lin_root(h)
    [+ bias] [+ activation], for inputs of shape [..., F].

    With config.MERGED_CONV_PROJ the two matmuls are computed as ONE:
    concat([agg, h], -1) @ [W_rel; W_root] — same contraction, half the
    matmul dispatches in a scan body (candidate for the overhead-dominated
    scan regime, benchmarks/scan_opt.py; bit-identical only up to matmul
    accumulation order, so parity tests compare against a tolerance)."""
    from gcm_tpu import config

    if config.MERGED_CONV_PROJ:
        w = jnp.concatenate(
            [cp["lin_rel"]["kernel"], cp["lin_root"]["kernel"]], axis=0)
        out = jnp.einsum("...f,fo->...o", jnp.concatenate([agg, h], -1), w)
    else:
        out = (jnp.einsum("...f,fo->...o", agg, cp["lin_rel"]["kernel"])
               + jnp.einsum("...f,fo->...o", h, cp["lin_root"]["kernel"]))
    if "bias" in cp["lin_rel"]:
        out = out + cp["lin_rel"]["bias"]
    if act == "tanh":
        out = jnp.tanh(out)
    elif act == "relu":
        out = jnp.maximum(out, 0.0)
    return out


def plan_conv_stack(layers, allowed_aggrs=("add",)):
    """Detect a DenseGraphConv(+optional tanh/relu) stack. Returns
    (conv_idx, acts, aggrs) tuples — one entry per conv — or None if any
    layer falls outside the pattern or uses a disallowed aggregation.
    Shared by the Pallas fusion planner ('add' only) and the fast cores
    (which also implement 'mean' analytically)."""
    acts = []
    conv_idx = []
    aggrs = []
    i = 0
    while i < len(layers):
        layer = layers[i]
        if not (isinstance(layer, DenseGraphConv)
                and layer.aggr in allowed_aggrs):
            return None
        conv_idx.append(i)
        aggrs.append(layer.aggr)
        act = None
        if i + 1 < len(layers) and not hasattr(layers[i + 1], "init"):
            fn = layers[i + 1]
            if fn is jnp.tanh:
                act = "tanh"
            elif fn is jax.nn.relu:
                act = "relu"
            else:
                return None
            i += 1
        acts.append(act)
        i += 1
    if not conv_idx:
        return None
    return tuple(conv_idx), tuple(acts), tuple(aggrs)


class DenseGNN:
    """A stack of dense conv layers and activation callables, composing a GNN
    with the DenseGCM signature gnn(params, x, adj, weights) -> x.

    Mirrors the reference's torch_geometric.nn.Sequential usage
    (ray_gcm.py:34-42); conv layers receive (x, adj), activations receive x.
    If `use_weights`, adj is multiplied elementwise by the weight matrix
    before convolution (for learned/bernoulli edges, gcm.py:179-181).
    """

    def __init__(self, layers, use_weights: bool = False, fuse: str = "auto"):
        self.layers = layers
        self.use_weights = use_weights
        self.fuse = fuse
        self._fused_plan = self._plan_fusion() if fuse else None

    def _plan_fusion(self):
        """Detect the fusable pattern (DenseGraphConv('add') each optionally
        followed by one tanh/relu) for the whole-GNN Pallas kernel."""
        plan = plan_conv_stack(self.layers, allowed_aggrs=("add",))
        return plan[:2] if plan is not None else None

    def init(self, key):
        params = []
        for layer in self.layers:
            if hasattr(layer, "init"):
                key, sub = jax.random.split(key)
                params.append(layer.init(sub))
            else:
                params.append({})
        return params

    def __call__(self, params, x, adj, weights=None):
        if self.use_weights and weights is not None and weights.size > 0:
            adj = adj * weights
        if self._fused_plan is not None:
            from gcm_tpu.ops.pallas.fused_gnn import fused_dense_gnn

            conv_idx, acts = self._fused_plan
            flat = []
            for i, ci in enumerate(conv_idx):
                p = params[ci]
                conv = self.layers[ci]
                b = p["lin_rel"].get(
                    "bias", jnp.zeros((conv.out_dim,), x.dtype))
                flat += [p["lin_rel"]["kernel"], b, p["lin_root"]["kernel"]]
            return fused_dense_gnn(x, adj.astype(x.dtype), tuple(flat), acts)
        for layer, p in zip(self.layers, params):
            if hasattr(layer, "init"):
                x = layer(p, x, adj)
            else:
                x = layer(x)
        return x
