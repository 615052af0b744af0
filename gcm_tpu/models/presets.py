"""Canonical model configurations.

`readme_dense_gcm` is the reference's README workload (README.md:48-88 and
BASELINE.json config 1): obs → Linear preprocessor → DenseGCM with 2-layer
graph conv + Tanh and TemporalBackedge([1]) on a 128-node graph. Used as the
flagship model by __graft_entry__.py and bench.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from gcm_tpu.edges.sparse_temporal import TemporalEdge
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.models.sparse_gcm import SparseGCM
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import MLP, Linear
from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN


def readme_dense_gcm(obs_size: int = 8, hidden: int = 32,
                     graph_size: int = 128, hops=(1,),
                     dtype=jnp.float32) -> DenseGCM:
    gnn = DenseGNN([
        DenseGraphConv(hidden, hidden, dtype=dtype), jnp.tanh,
        DenseGraphConv(hidden, hidden, dtype=dtype), jnp.tanh,
    ])
    pre = MLP([Linear(obs_size, hidden, dtype=dtype)])
    return DenseGCM(gnn, preprocessor=pre, graph_size=graph_size,
                    edge_selectors=TemporalBackedge(list(hops)))


def readme_sparse_gcm(obs_size: int = 8, hidden: int = 32,
                      graph_size: int = 128, max_edges: int = 512,
                      hops=(1,), dtype=jnp.float32) -> SparseGCM:
    gnn = SparseGNN([
        GraphConv(hidden, hidden, dtype=dtype), jnp.tanh,
        GraphConv(hidden, hidden, dtype=dtype), jnp.tanh,
    ])
    pre = MLP([Linear(obs_size, hidden, dtype=dtype)])
    return SparseGCM(gnn, preprocessor=pre, graph_size=graph_size,
                     max_edges=max_edges,
                     edge_selectors=TemporalEdge(list(hops)))
