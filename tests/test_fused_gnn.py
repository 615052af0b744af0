"""Whole-GNN fused kernel: parity with the unfused layer stack and gradient
correctness of the recompute VJP."""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.ops.pallas.fused_gnn import fused_dense_gnn


def make(F, fuse):
    return DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                     DenseGraphConv(F, F), jnp.tanh], fuse=fuse)


class TestFusedGNN:
    def setup_method(self):
        self.F = 8
        self.gnn_fused = make(self.F, fuse="auto")
        self.gnn_plain = make(self.F, fuse="")
        assert self.gnn_fused._fused_plan is not None
        assert self.gnn_plain._fused_plan is None
        self.params = self.gnn_plain.init(jax.random.PRNGKey(0))
        self.x = jax.random.normal(jax.random.PRNGKey(1), (3, 12, self.F))
        self.adj = (jax.random.uniform(jax.random.PRNGKey(2), (3, 12, 12))
                    < 0.3).astype(jnp.float32)

    def test_forward_parity(self):
        a = self.gnn_fused(self.params, self.x, self.adj)
        b = self.gnn_plain(self.params, self.x, self.adj)
        assert np.allclose(np.array(a), np.array(b), atol=1e-5)

    def test_grad_parity(self):
        cot = jax.random.normal(jax.random.PRNGKey(3), (3, 12, self.F))

        def loss(gnn):
            def f(p, x, adj):
                return jnp.sum(gnn(p, x, adj) * cot)
            return f

        gf = jax.grad(loss(self.gnn_fused), argnums=(0, 1, 2))(
            self.params, self.x, self.adj)
        gp = jax.grad(loss(self.gnn_plain), argnums=(0, 1, 2))(
            self.params, self.x, self.adj)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gp)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-4)

    def test_unfusable_patterns(self):
        # mean aggregation -> not fusable
        g = DenseGNN([DenseGraphConv(4, 4, aggr="mean"), jnp.tanh])
        assert g._fused_plan is None
        # foreign activation -> not fusable
        g = DenseGNN([DenseGraphConv(4, 4), jnp.exp])
        assert g._fused_plan is None
        # conv without activation -> fusable with act None
        g = DenseGNN([DenseGraphConv(4, 4), DenseGraphConv(4, 4), jnp.tanh])
        assert g._fused_plan == ((0, 1), (None, "tanh"))

    def test_direct_call_three_layers(self):
        F = 4
        convs = [DenseGraphConv(F, F) for _ in range(3)]
        params = [c.init(jax.random.PRNGKey(i)) for i, c in enumerate(convs)]
        flat = []
        for c, p in zip(convs, params):
            flat += [p["lin_rel"]["kernel"], p["lin_rel"]["bias"],
                     p["lin_root"]["kernel"]]
        x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, F))
        adj = jnp.zeros((2, 8, 8)).at[:, 1, 0].set(1.0)
        got = fused_dense_gnn(x, adj, tuple(flat), ("relu", None, "tanh"))
        h = x
        for i, (c, p) in enumerate(zip(convs, params)):
            h = c(p, h, adj)
            h = [jax.nn.relu, lambda v: v, jnp.tanh][i](h)
        assert np.allclose(np.array(got), np.array(h), atol=1e-5)
