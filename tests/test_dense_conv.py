"""GNN layer-zoo semantics tests (dense side), with surgically-set weights.

Mirrors the reference's weight-surgery strategy (tests/test_gcm.py:202-240):
identity/zero linears make the conv output analytically predictable, pinning
the message direction and lin_root/lin_rel semantics of DenseGraphConv, and a
numpy oracle pins DenseGCNConv's normalization."""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.nn.dense_conv import DenseGCNConv, DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import Linear


def identity_conv_params(f, rel=1.0, root=1.0):
    return {
        "lin_rel": {"kernel": jnp.eye(f) * rel, "bias": jnp.zeros(f)},
        "lin_root": {"kernel": jnp.eye(f) * root},
    }


class TestDenseGraphConv:
    def test_message_direction(self):
        """lin_root=0, lin_rel=I: adj[0, 3]=1 means node 3's features flow to
        node 0 (sink-row convention; mirrors tests/test_gcm.py:202-240)."""
        B, N, F = 1, 10, 11
        conv = DenseGraphConv(F, F)
        params = identity_conv_params(F, rel=1.0, root=0.0)
        x = jnp.arange(B * N * F, dtype=jnp.float32).reshape(B, N, F)
        adj = jnp.zeros((B, N, N)).at[:, 0, 3].set(1.0)
        out = conv(params, x, adj)
        assert np.allclose(np.array(out[0, 0]), np.array(x[0, 3]))
        assert np.allclose(np.array(out[0, 1]), 0.0)

    def test_root_only(self):
        B, N, F = 2, 4, 3
        conv = DenseGraphConv(F, F)
        params = identity_conv_params(F, rel=0.0, root=1.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
        adj = jnp.ones((B, N, N))
        out = conv(params, x, adj)
        assert np.allclose(np.array(out), np.array(x), atol=1e-6)

    def test_aggr_mean(self):
        B, N, F = 1, 4, 2
        conv = DenseGraphConv(F, F, aggr="mean")
        params = identity_conv_params(F, rel=1.0, root=0.0)
        x = jnp.array([[[1.0, 1], [3, 3], [5, 5], [0, 0]]])
        adj = jnp.zeros((B, N, N)).at[0, 0, 1].set(1.0).at[0, 0, 2].set(1.0)
        out = conv(params, x, adj)
        assert np.allclose(np.array(out[0, 0]), [4.0, 4.0])

    def test_aggr_max(self):
        B, N, F = 1, 4, 2
        conv = DenseGraphConv(F, F, aggr="max")
        params = identity_conv_params(F, rel=1.0, root=0.0)
        x = jnp.array([[[1.0, 1], [3, 7], [5, 2], [9, 9]]])
        adj = jnp.zeros((B, N, N)).at[0, 0, 1].set(1.0).at[0, 0, 2].set(1.0)
        out = conv(params, x, adj)
        assert np.allclose(np.array(out[0, 0]), [5.0, 7.0])
        assert np.allclose(np.array(out[0, 3]), 0.0)  # no in-edges -> fill 0

    def test_random_weights_vs_numpy(self):
        B, N, Fi, Fo = 3, 6, 5, 4
        conv = DenseGraphConv(Fi, Fo)
        params = conv.init(jax.random.PRNGKey(1))
        x = np.random.default_rng(0).normal(size=(B, N, Fi)).astype(np.float32)
        adj = (np.random.default_rng(1).random((B, N, N)) < 0.3).astype(np.float32)
        out = conv(params, jnp.asarray(x), jnp.asarray(adj))
        Wr = np.array(params["lin_rel"]["kernel"])
        br = np.array(params["lin_rel"]["bias"])
        Wo = np.array(params["lin_root"]["kernel"])
        want = (adj @ x) @ Wr + br + x @ Wo
        assert np.allclose(np.array(out), want, atol=1e-4)


class TestDenseGCNConv:
    def test_vs_numpy_oracle(self):
        """Pins torch_geometric DenseGCNConv semantics: diagonal SET to 1,
        deg clamp >= 1, symmetric normalization, x @ W first."""
        B, N, Fi, Fo = 2, 5, 4, 3
        conv = DenseGCNConv(Fi, Fo)
        params = conv.init(jax.random.PRNGKey(2))
        rng = np.random.default_rng(2)
        x = rng.normal(size=(B, N, Fi)).astype(np.float32)
        adj = (rng.random((B, N, N)) < 0.4).astype(np.float32)
        out = conv(params, jnp.asarray(x), jnp.asarray(adj))

        W = np.array(params["lin"]["kernel"])
        b = np.array(params["bias"])
        a = adj.copy()
        for i in range(N):
            a[:, i, i] = 1.0
        deg = np.clip(a.sum(-1), 1.0, None)
        dis = deg ** -0.5
        a_norm = dis[:, :, None] * a * dis[:, None, :]
        want = a_norm @ (x @ W) + b
        assert np.allclose(np.array(out), want, atol=1e-4)

    def test_improved_diag_two(self):
        B, N, F = 1, 3, 2
        conv = DenseGCNConv(F, F, improved=True, use_bias=False)
        params = {"lin": {"kernel": jnp.eye(F)}}
        x = jnp.ones((B, N, F))
        adj = jnp.zeros((B, N, N))
        out = conv(params, x, adj)
        # isolated nodes: diag set to 2, deg 2 -> (1/sqrt2)*2*(1/sqrt2)=1
        assert np.allclose(np.array(out), 1.0, atol=1e-6)


class TestDenseGNN:
    def test_stack_and_activation(self):
        F = 4
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh, DenseGraphConv(F, F)])
        params = gnn.init(jax.random.PRNGKey(3))
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, F))
        adj = jnp.zeros((2, 6, 6))
        out = gnn(params, x, adj)
        assert out.shape == (2, 6, F)

    def test_use_weights(self):
        F = 3
        gnn = DenseGNN([DenseGraphConv(F, F)], use_weights=True)
        params = [identity_conv_params(F, rel=1.0, root=0.0)]
        x = jnp.ones((1, 4, F))
        adj = jnp.zeros((1, 4, 4)).at[0, 0, 1].set(1.0)
        w = jnp.full((1, 4, 4), 0.5)
        out = gnn(params, x, adj, w)
        assert np.allclose(np.array(out[0, 0]), 0.5)


class TestLinearInit:
    def test_torch_default_bounds(self):
        lin = Linear(64, 32)
        p = lin.init(jax.random.PRNGKey(0))
        bound = np.sqrt(2.0 / (1 + 5)) * np.sqrt(3.0 / 64)
        assert np.abs(np.array(p["kernel"])).max() <= bound + 1e-6
        assert np.abs(np.array(p["bias"])).max() <= 1 / np.sqrt(64) + 1e-6
