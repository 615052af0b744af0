"""Custom-VJP correctness of the backend-dispatched ops: hand-written
backward passes must match XLA autodiff through the plain fallback."""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.ops.dispatch import dense_graph_conv, spmm
from gcm_tpu.ops.scatter import edge_scatter_add


def tree_allclose(a, b, atol=1e-4):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        if not np.allclose(np.array(x), np.array(y), atol=atol):
            return False
    return True


class TestSpmmVJP:
    def setup_method(self):
        B, N, F, E = 2, 10, 6, 16
        self.x = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
        sink = jax.random.randint(jax.random.PRNGKey(1), (B, E), 0, N)
        src = jax.random.randint(jax.random.PRNGKey(2), (B, E), 0, N)
        self.edges = jnp.stack([sink, src], axis=1).astype(jnp.int32)
        self.edges = self.edges.at[:, :, -3:].set(-1)
        self.w = jax.random.uniform(jax.random.PRNGKey(3), (B, E))
        self.cot = jax.random.normal(jax.random.PRNGKey(4), (B, N, F))

    def test_grads_match_autodiff(self):
        def f_custom(x, w):
            return jnp.sum(spmm(x, self.edges, w) * self.cot)

        def f_ref(x, w):
            return jnp.sum(edge_scatter_add(x, self.edges, w) * self.cot)

        g_custom = jax.grad(f_custom, argnums=(0, 1))(self.x, self.w)
        g_ref = jax.grad(f_ref, argnums=(0, 1))(self.x, self.w)
        assert tree_allclose(g_custom, g_ref)


class TestDenseGraphConvVJP:
    def test_grads_match_autodiff(self):
        B, N, F, Fo = 2, 8, 5, 4
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
        adj = jax.random.uniform(jax.random.PRNGKey(1), (B, N, N))
        wr = jax.random.normal(jax.random.PRNGKey(2), (F, Fo))
        br = jax.random.normal(jax.random.PRNGKey(3), (Fo,))
        wo = jax.random.normal(jax.random.PRNGKey(4), (F, Fo))
        cot = jax.random.normal(jax.random.PRNGKey(5), (B, N, Fo))

        def ref(x, adj, wr, br, wo):
            agg = jnp.einsum("bij,bjf->bif", adj, x)
            return (jnp.einsum("bnf,fo->bno", agg, wr) + br
                    + jnp.einsum("bnf,fo->bno", x, wo))

        def loss_c(*args):
            return jnp.sum(dense_graph_conv(*args) * cot)

        def loss_r(*args):
            return jnp.sum(ref(*args) * cot)

        g_c = jax.grad(loss_c, argnums=(0, 1, 2, 3, 4))(x, adj, wr, br, wo)
        g_r = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, adj, wr, br, wo)
        assert tree_allclose(g_c, g_r)

    def test_forward_matches(self):
        B, N, F = 2, 6, 4
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
        adj = jax.random.uniform(jax.random.PRNGKey(1), (B, N, N))
        wr = jnp.eye(F)
        br = jnp.zeros(F)
        wo = jnp.eye(F)
        got = dense_graph_conv(x, adj, wr, br, wo)
        want = jnp.einsum("bij,bjf->bif", adj, x) + x
        assert np.allclose(np.array(got), np.array(want), atol=1e-5)
