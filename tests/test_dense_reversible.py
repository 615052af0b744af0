"""Reversible fused-dense backward (models/dense_reversible.py): forward
bit-identical to the fused scan (which is bitwise == the unfused reference
step); gradients match autodiff; the shift+rewrite inversion is exact
through wraparound."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.edges.chain import EdgeChain
from gcm_tpu.edges.dense import DenseEdge
from gcm_tpu.edges.distance import EuclideanEdge
from gcm_tpu.edges.learned import LearnedEdge
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.models.dense_reversible import (dense_reversible_scan,
                                             dense_reversible_supported)
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import MLP, Linear

B, OBS, HID = 3, 5, 8


def build(selector_fn, N=6, seed=0):
    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    model = DenseGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                     edge_selectors=selector_fn(), graph_size=N)
    params = model.init(jax.random.PRNGKey(seed))
    return model, params


SELECTORS = {
    "temporal": lambda: TemporalBackedge([1]),
    "temporal_both": lambda: TemporalBackedge([1, 2], direction="both"),
    "dense_edge": lambda: DenseEdge(),
    "euclidean": lambda: EuclideanEdge(max_distance=1.0),
    "learned": lambda: LearnedEdge(input_size=OBS, deterministic=True),
    "chain": lambda: EdgeChain([TemporalBackedge([1]),
                                EuclideanEdge(max_distance=1.0)]),
}


class TestDenseReversible:
    @pytest.mark.parametrize("kind", sorted(SELECTORS))
    def test_forward_bitwise_and_grads(self, kind):
        model, params = build(SELECTORS[kind])
        T = 15  # > 2N: wraparound shifts to invert
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, OBS))
        st = model.initial_state(B, OBS)

        outs_s, st_s = model.scan(params, xs, st)
        outs_r, st_r = dense_reversible_scan(model, params, xs, st)
        np.testing.assert_array_equal(np.asarray(outs_s), np.asarray(outs_r))
        np.testing.assert_array_equal(np.asarray(st_s.adj),
                                      np.asarray(st_r.adj))
        np.testing.assert_array_equal(np.asarray(st_s.nodes),
                                      np.asarray(st_r.nodes))
        np.testing.assert_array_equal(np.asarray(st_s.num_nodes),
                                      np.asarray(st_r.num_nodes))

        def loss(p, x, rev):
            if rev:
                o, fs = model.scan(p, x, st, remat="reverse")
            else:
                o, fs = model.scan(p, x, st)
            return jnp.sum(o ** 2) + jnp.sum(fs.nodes ** 2)

        g_s = jax.jit(jax.grad(lambda p, x: loss(p, x, False)))(params, xs)
        g_r = jax.jit(jax.grad(lambda p, x: loss(p, x, True)))(params, xs)
        for a, b in zip(jax.tree_util.tree_leaves(g_s),
                        jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_warm_partial_fill(self):
        """Start from a partially-filled (pre-wrap) state and cross the
        wrap boundary inside the reversible window."""
        model, params = build(SELECTORS["chain"], N=5)
        st = model.initial_state(B, OBS)
        xs_w = jax.random.normal(jax.random.PRNGKey(4), (B, 3, OBS))
        _, st = model.scan(params, xs_w, st)
        xs = jax.random.normal(jax.random.PRNGKey(5), (B, 8, OBS))

        def loss(p, rev):
            o, _ = model.scan(p, xs, st, remat="reverse" if rev else False)
            return jnp.sum(o ** 2)

        g_s = jax.grad(lambda p: loss(p, False))(params)
        g_r = jax.grad(lambda p: loss(p, True))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_s),
                        jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_stochastic_with_key(self):
        model, params = build(
            lambda: LearnedEdge(input_size=OBS, deterministic=False,
                                num_edge_samples=3))
        xs = jax.random.normal(jax.random.PRNGKey(6), (B, 10, OBS))
        st = model.initial_state(B, OBS)
        k = jax.random.PRNGKey(7)
        outs_s, _ = model.scan(params, xs, st, key=k)
        outs_r, _ = model.scan(params, xs, st, key=k, remat="reverse")
        np.testing.assert_array_equal(np.asarray(outs_s), np.asarray(outs_r))

        def loss(p, rev):
            o, _ = model.scan(p, xs, st, key=k,
                              remat="reverse" if rev else False)
            return jnp.sum(o ** 2)

        g_s = jax.grad(lambda p: loss(p, False))(params)
        g_r = jax.grad(lambda p: loss(p, True))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_s),
                        jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_supported_gate(self):
        model, _ = build(SELECTORS["temporal"])
        assert dense_reversible_supported(model)
        assert dense_reversible_supported(model, key=jax.random.PRNGKey(0))
        assert not dense_reversible_supported(
            model, dones=jnp.zeros((B, 3), bool))
        gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh],
                       use_weights=True)
        mw = DenseGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                      edge_selectors=TemporalBackedge([1]), graph_size=6,
                      edge_weights=True)
        assert not dense_reversible_supported(mw)


class TestTrainerDispatch:
    def test_train_remat_for_dense_reverse(self, monkeypatch):
        from gcm_tpu import config
        from gcm_tpu.rl.wrappers import train_remat_for

        model, _ = build(SELECTORS["temporal"])
        assert train_remat_for(model, 64) is False  # dense default: a wash
        monkeypatch.setattr(config, "DENSE_REVERSE_BWD", True)
        assert train_remat_for(model, 64) == "reverse"
        # dones keep the non-reversible default
        assert train_remat_for(model, 64,
                               dones=jnp.zeros((B, 64), bool)) is False
