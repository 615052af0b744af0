"""Pallas kernel parity vs XLA fallbacks (interpret mode on CPU) —
SURVEY.md §7 step 3's contract: kernels swap in behind the same signature."""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.nn.dense_conv import DenseGraphConv
from gcm_tpu.ops.distance import cosine_score, euclidean_score
from gcm_tpu.ops.pallas.dense_gconv import fused_dense_graph_conv
from gcm_tpu.ops.pallas.sddmm import sddmm_threshold_row
from gcm_tpu.ops.pallas.spmm import spmm_edge_list
from gcm_tpu.ops.scatter import edge_scatter_add


class TestFusedDenseGraphConv:
    def test_matches_fallback(self):
        B, N, F, Fo = 4, 16, 8, 8
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, N, F))
        adj = (jax.random.uniform(jax.random.PRNGKey(1), (B, N, N)) < 0.3
               ).astype(jnp.float32)
        conv = DenseGraphConv(F, Fo)
        params = conv.init(jax.random.PRNGKey(2))
        want = conv(params, x, adj)
        got = fused_dense_graph_conv(
            x, adj, params["lin_rel"]["kernel"], params["lin_rel"]["bias"],
            params["lin_root"]["kernel"],
        )
        assert np.allclose(np.array(got), np.array(want), atol=1e-4)

    def test_fused_activation(self):
        B, N, F = 2, 8, 4
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
        adj = jnp.zeros((B, N, N))
        conv = DenseGraphConv(F, F)
        params = conv.init(jax.random.PRNGKey(1))
        want = jnp.tanh(conv(params, x, adj))
        got = fused_dense_graph_conv(
            x, adj, params["lin_rel"]["kernel"], params["lin_rel"]["bias"],
            params["lin_root"]["kernel"], activation="tanh",
        )
        assert np.allclose(np.array(got), np.array(want), atol=1e-4)


class TestSpMM:
    def test_matches_scatter_fallback(self):
        B, N, F, E = 3, 16, 8, 24
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
        sink = jax.random.randint(jax.random.PRNGKey(1), (B, E), 0, N)
        src = jax.random.randint(jax.random.PRNGKey(2), (B, E), 0, N)
        edges = jnp.stack([sink, src], axis=1).astype(jnp.int32)
        # punch sentinel holes
        edges = edges.at[:, :, -4:].set(-1)
        w = jax.random.uniform(jax.random.PRNGKey(3), (B, E))
        want = edge_scatter_add(x, edges, w)
        got = spmm_edge_list(x, edges, w)
        assert np.allclose(np.array(got), np.array(want), atol=1e-4)

    def test_empty_edges(self):
        B, N, F, E = 2, 8, 4, 6
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
        edges = jnp.full((B, 2, E), -1, jnp.int32)
        w = jnp.ones((B, E))
        got = spmm_edge_list(x, edges, w)
        assert np.allclose(np.array(got), 0.0)


class TestSDDMM:
    def test_euclidean_matches_fallback(self):
        B, N, F = 3, 16, 8
        nodes = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
        num_nodes = jnp.array([3, 8, 15], jnp.int32)
        curr = nodes[jnp.arange(B), num_nodes]
        # fallback: per-batch euclidean distance (not the batch-mean quirk)
        d = jnp.linalg.norm(curr[:, None, :] - nodes, axis=-1)
        want = (d < 1.5) & (jnp.arange(N)[None, :] < num_nodes[:, None])
        got = sddmm_threshold_row(curr, nodes, num_nodes, 1.5,
                                  mode="euclidean")
        assert np.array_equal(np.array(got), np.array(want))

    def test_cosine_matches_fallback(self):
        B, N, F = 2, 12, 6
        nodes = jax.random.normal(jax.random.PRNGKey(1), (B, N, F))
        num_nodes = jnp.array([5, 9], jnp.int32)
        curr = nodes[jnp.arange(B), num_nodes]
        sim = cosine_score(curr, nodes)
        want = (sim < 0.2) & (jnp.arange(N)[None, :] < num_nodes[:, None])
        got = sddmm_threshold_row(curr, nodes, num_nodes, 0.2, mode="cosine")
        assert np.array_equal(np.array(got), np.array(want))
