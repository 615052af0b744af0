"""Format-converter round trips (reference tests/test_gcm.py:493-515)."""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.models.converters import dense_to_sparse, sparse_to_dense


class TestConverters:
    def test_round_trip(self):
        rng = np.random.default_rng(0)
        adj = (rng.random((3, 8, 8)) < 0.3).astype(np.float32)
        edges, w = dense_to_sparse(jnp.asarray(adj))
        back = sparse_to_dense(edges, w, num_nodes=8)
        assert np.allclose(np.array(back), adj)

    def test_weighted_round_trip(self):
        adj = jnp.zeros((1, 4, 4)).at[0, 2, 1].set(0.7).at[0, 3, 0].set(1.5)
        edges, w = dense_to_sparse(adj)
        back = sparse_to_dense(edges, w, num_nodes=4)
        assert np.allclose(np.array(back), np.array(adj))

    def test_gradient_flows_through_adj(self):
        """DenseToSparse preserves gradients w.r.t. adjacency values
        (reference gcm.py:24-53 docstring contract)."""
        adj = jnp.zeros((1, 4, 4)).at[0, 2, 1].set(0.7)

        def f(a):
            _, w = dense_to_sparse(a)
            return jnp.sum(w ** 2)

        g = jax.grad(f)(adj)
        assert np.allclose(np.array(g[0, 2, 1]), 1.4, atol=1e-6)

    def test_duplicate_edges_sum(self):
        edges = jnp.array([[[2, 2, -1], [1, 1, -1]]], jnp.int32)
        w = jnp.array([[0.5, 0.25, 9.0]])
        dense = sparse_to_dense(edges, w, num_nodes=4)
        assert np.allclose(np.array(dense[0, 2, 1]), 0.75)
