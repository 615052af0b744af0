"""Reversible fused-ring backward (models/ring_reversible.py): forward is
bit-identical to the plain scan; gradients match autodiff to float
reassociation; state reconstruction in the reverse pass is exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.edges.chain import EdgeChain
from gcm_tpu.edges.distance import EuclideanEdge
from gcm_tpu.edges.learned import LearnedEdge
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.models.ring_gcm import RingDenseGCM
from gcm_tpu.models.ring_reversible import (reversible_scan,
                                            reversible_supported)
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import MLP, Linear

B, OBS, HID = 3, 5, 8


def build(selector_fn, N=6, seed=0):
    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    model = RingDenseGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                         edge_selectors=selector_fn(), graph_size=N)
    params = model.init(jax.random.PRNGKey(seed))
    return model, params


SELECTORS = {
    "temporal": lambda: TemporalBackedge([1]),
    "temporal_both": lambda: TemporalBackedge([1, 2], direction="both"),
    "euclidean": lambda: EuclideanEdge(max_distance=1.0),
    "learned": lambda: LearnedEdge(input_size=OBS, deterministic=True),
    "chain": lambda: EdgeChain([TemporalBackedge([1]),
                                EuclideanEdge(max_distance=1.0)]),
}


class TestReversibleParity:
    @pytest.mark.parametrize("kind", sorted(SELECTORS))
    def test_forward_bitwise_and_grads(self, kind):
        model, params = build(SELECTORS[kind])
        T = 15  # > 2N: plenty of wraparound/eviction to invert
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, OBS))
        st = model.initial_state(B, OBS)

        outs_s, st_s = model.scan(params, xs, st)
        outs_r, st_r = reversible_scan(model, params, xs, st)
        np.testing.assert_array_equal(np.asarray(outs_s), np.asarray(outs_r))
        np.testing.assert_array_equal(np.asarray(st_s.adj),
                                      np.asarray(st_r.adj))
        np.testing.assert_array_equal(np.asarray(st_s.nodes),
                                      np.asarray(st_r.nodes))
        np.testing.assert_array_equal(np.asarray(st_s.t), np.asarray(st_r.t))

        def loss(p, x, rev):
            f = reversible_scan if rev else model.scan
            o, fs = f(model, p, x, st) if rev else f(p, x, st)
            return jnp.sum(o ** 2) + jnp.sum(fs.nodes ** 2)

        g_s = jax.jit(jax.grad(lambda p, x: loss(p, x, False)))(params, xs)
        g_r = jax.jit(jax.grad(lambda p, x: loss(p, x, True)))(params, xs)
        for a, b in zip(jax.tree_util.tree_leaves(g_s),
                        jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_grad_wrt_inputs_and_initial_state(self):
        model, params = build(SELECTORS["euclidean"])
        xs = jax.random.normal(jax.random.PRNGKey(2), (B, 9, OBS))
        st = model.initial_state(B, OBS)
        # warm the state so adj0/nodes0 are nontrivial
        xs_w = jax.random.normal(jax.random.PRNGKey(3), (B, 4, OBS))
        _, st = model.scan(params, xs_w, st)

        def loss(x, nodes0, rev):
            s0 = st._replace(nodes=nodes0)
            if rev:
                o, _ = reversible_scan(model, params, x, s0)
            else:
                o, _ = model.scan(params, x, s0)
            return jnp.sum(o ** 2)

        gx_s, gn_s = jax.grad(loss, argnums=(0, 1))(xs, st.nodes, False)
        gx_r, gn_r = jax.grad(loss, argnums=(0, 1))(xs, st.nodes, True)
        np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gn_s), np.asarray(gn_r),
                                   atol=1e-4, rtol=1e-4)

    def test_supported_gate(self):
        model, _ = build(SELECTORS["temporal"])
        assert reversible_supported(model)
        # keys ARE supported (threaded + replayed bitwise in the backward)
        assert reversible_supported(model, key=jax.random.PRNGKey(0))
        assert not reversible_supported(model,
                                        dones=jnp.zeros((B, 3), bool))
        gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh],
                       use_weights=True)
        mw = RingDenseGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                          edge_selectors=TemporalBackedge([1]), graph_size=6,
                          edge_weights=True)
        assert not reversible_supported(mw)

    def test_warm_unaligned_start(self):
        """Start mid-ring (t not a multiple of N) — the reverse
        reconstruction must invert from an arbitrary cursor."""
        model, params = build(SELECTORS["chain"], N=5)
        st = model.initial_state(B, OBS)
        xs_w = jax.random.normal(jax.random.PRNGKey(4), (B, 7, OBS))
        _, st = model.scan(params, xs_w, st)
        xs = jax.random.normal(jax.random.PRNGKey(5), (B, 11, OBS))

        def loss(p, rev):
            f = (lambda pp: reversible_scan(model, pp, xs, st)) if rev \
                else (lambda pp: model.scan(pp, xs, st))
            o, _ = f(p)
            return jnp.sum(o ** 2)

        g_s = jax.grad(lambda p: loss(p, False))(params)
        g_r = jax.grad(lambda p: loss(p, True))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_s),
                        jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


    def test_stochastic_selector_with_key(self):
        """Stochastic (gumbel) selector: forward identical to scan with the
        same key; grads match autodiff (the per-step keys replay bitwise in
        the backward re-execution)."""
        model, params = build(
            lambda: LearnedEdge(input_size=OBS, deterministic=False,
                                num_edge_samples=3))
        xs = jax.random.normal(jax.random.PRNGKey(6), (B, 10, OBS))
        st = model.initial_state(B, OBS)
        k = jax.random.PRNGKey(7)

        outs_s, st_s = model.scan(params, xs, st, key=k)
        outs_r, st_r = reversible_scan(model, params, xs, st, key=k)
        np.testing.assert_array_equal(np.asarray(outs_s), np.asarray(outs_r))
        np.testing.assert_array_equal(np.asarray(st_s.adj),
                                      np.asarray(st_r.adj))

        def loss(p, rev):
            if rev:
                o, _ = reversible_scan(model, p, xs, st, key=k)
            else:
                o, _ = model.scan(p, xs, st, key=k)
            return jnp.sum(o ** 2)

        g_s = jax.grad(lambda p: loss(p, False))(params)
        g_r = jax.grad(lambda p: loss(p, True))(params)
        leaves = list(zip(jax.tree_util.tree_leaves(g_s),
                          jax.tree_util.tree_leaves(g_r)))
        assert any(float(jnp.sum(jnp.abs(a))) > 0 for a, _ in leaves)
        for a, b in leaves:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)
