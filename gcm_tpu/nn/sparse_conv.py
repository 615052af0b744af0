"""Sparse (padded-edge-list) graph convolutions — GNN layer zoo, sparse side.

TPU-native implementations of torch_geometric GraphConv / GCNConv semantics
over the fixed-capacity padded edge list (the representation the reference
itself adopts at its Ray boundary, util.py:323-353). The gather/scatter SpMM
inside (ops.scatter.edge_scatter_add) replaces torch_geometric's
C++/CUDA propagate path (reference sparse_gcm.py:178).

Edge list convention: edges[b] = [[sink...], [source...]] with -1 sentinel
padding; message flows source -> sink.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcm_tpu.nn.module import Linear
from gcm_tpu.ops.scatter import (
    edge_mask,
    edge_scatter_add,
    edge_scatter_count,
    edge_scatter_max,
    edge_weight_scatter_add,
)


class GraphConv:
    """out_i = lin_root(x_i) + lin_rel(aggr_j w_ij x_j).

    Matches torch_geometric.nn.GraphConv (aggr='add' default): edge weights
    multiply the message features before aggregation.
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

    def __call__(self, params, x, edges, weights=None, agg_fn=None):
        from gcm_tpu.ops.dispatch import spmm

        N = x.shape[1]
        if agg_fn is not None:
            # precomputed aggregation backend (e.g. the degree-bounded
            # slot kernel, ops/pallas/spmm_slots.py): layout is shared
            # across layers, only the features change
            assert self.aggr == "add", "agg_fn supports aggr='add' only"
            agg = agg_fn(x)
        elif self.aggr == "max":
            agg = edge_scatter_max(x, edges, num_nodes=N)
        else:
            if weights is None:
                weights = edge_mask(edges).astype(x.dtype)
            agg = spmm(x, edges, weights)
            if self.aggr == "mean":
                deg = edge_scatter_count(edges, N)
                agg = agg / jnp.maximum(deg, 1.0)[..., None]
        return self.lin_rel(params["lin_rel"], agg) + self.lin_root(
            params["lin_root"], x
        )


class GCNConv:
    """GCN layer over a padded edge list, matching torch_geometric.nn.GCNConv.

    With add_self_loops=True, self loops (weight 1) are added to every *valid*
    node; norm = d_i^-1/2 · w_ij · d_j^-1/2 with degrees from edge weights
    including self loops. `node_mask [B, N]` marks valid nodes (ragged graphs).
    """

    def __init__(self, in_dim: int, out_dim: int, improved: bool = False,
                 add_self_loops: bool = True, use_bias: bool = True,
                 dtype=jnp.float32):
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.improved = improved
        self.add_self_loops = add_self_loops
        self.use_bias = use_bias
        self.lin = Linear(in_dim, out_dim, use_bias=False, init="glorot",
                          dtype=dtype)
        self.dtype = dtype

    def init(self, key):
        params = {"lin": self.lin.init(key)}
        if self.use_bias:
            params["bias"] = jnp.zeros((self.out_dim,), self.dtype)
        return params

    def __call__(self, params, x, edges, weights=None, node_mask=None):
        B, N, _ = x.shape
        valid = edge_mask(edges)
        if weights is None:
            weights = valid.astype(x.dtype)
        if node_mask is None:
            node_mask = jnp.ones((B, N), bool)
        fill = 2.0 if self.improved else 1.0
        # degree of each node: sum of incoming edge weights (+ self loop)
        deg = edge_weight_scatter_add(edges, weights, N)
        if self.add_self_loops:
            deg = deg + fill * node_mask.astype(deg.dtype)
        dis = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        # normalized edge weights: dis[sink] * w * dis[source]
        sink = jnp.clip(edges[:, 0, :], 0, N - 1)
        src = jnp.clip(edges[:, 1, :], 0, N - 1)
        b = jnp.arange(B)[:, None]
        norm_w = dis[b, sink] * weights * dis[b, src]
        xw = self.lin(params["lin"], x)
        from gcm_tpu.ops.dispatch import spmm

        out = spmm(xw, edges, norm_w)
        if self.add_self_loops:
            self_norm = dis * fill * dis  # d_i^-1/2 * fill * d_i^-1/2
            out = out + xw * (self_norm * node_mask.astype(xw.dtype))[..., None]
        if self.use_bias:
            out = out + params["bias"]
        return out


class SparseGNN:
    """Stack of sparse conv layers + activations, with the SparseGCM GNN
    signature gnn(params, x [B,N,F], edges [B,2,E], weights [B,E]) -> x.

    Mirrors the reference's sparse Sequential (ray_sparse_gcm.py:34-42)."""

    def __init__(self, layers):
        self.layers = layers

    def init(self, key):
        params = []
        for layer in self.layers:
            if hasattr(layer, "init"):
                key, sub = jax.random.split(key)
                params.append(layer.init(sub))
            else:
                params.append({})
        return params

    def __call__(self, params, x, edges, weights=None, agg_fn=None):
        for layer, p in zip(self.layers, params):
            if hasattr(layer, "init"):
                if agg_fn is not None:
                    assert isinstance(layer, GraphConv), (
                        "slot aggregation supports GraphConv stacks")
                    x = layer(p, x, edges, weights, agg_fn=agg_fn)
                else:
                    x = layer(p, x, edges, weights)
            else:
                x = layer(x)
        return x
