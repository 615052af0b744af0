"""ring_window (scan-free trajectory forward, general ring core) parity:
outputs and final state must match RingDenseGCM.scan — which is itself
parity-pinned against DenseGCM (tests/test_ring_gcm.py) and the torch
reference (tests/test_torch_oracle.py) — for every supported selector,
through multiple window chunks and wraparound."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.edges.chain import EdgeChain
from gcm_tpu.edges.distance import CosineEdge, EuclideanEdge, SpatialEdge
from gcm_tpu.edges.learned import LearnedEdge
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.models.ring_gcm import RingDenseGCM
from gcm_tpu.models.ring_window import ring_window, window_supported
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import MLP, Linear


def build(selector_fn, B=3, N=6, F=5, layers=2, aggr="add", pre=False,
          seed=0):
    stack = []
    for _ in range(layers):
        stack += [DenseGraphConv(F, F, aggr=aggr), jnp.tanh]
    kw = {}
    if pre:
        kw["preprocessor"] = MLP([Linear(F, F)])
    model = RingDenseGCM(DenseGNN(stack), edge_selectors=selector_fn(),
                         graph_size=N, **kw)
    params = model.init(jax.random.PRNGKey(seed))
    return model, params


def compare(selector_fn, B=3, N=6, F=5, T=20, layers=2, aggr="add",
            pre=False, warm=0, seed=0, atol=1e-5):
    """Run `warm` steps via scan to set up a mid-trajectory state, then
    compare scan vs window over T more steps."""
    model, params = build(selector_fn, B, N, F, layers, aggr, pre, seed)
    st = model.initial_state(B, F)
    key = jax.random.PRNGKey(seed + 1)
    if warm:
        xs_w = jax.random.normal(key, (B, warm, F))
        _, st = model.scan(params, xs_w, st)
    xs = jax.random.normal(jax.random.PRNGKey(seed + 2), (B, T, F))
    outs_s, st_s = model.scan(params, xs, st)
    outs_w, st_w = ring_window(model, params, xs, st)
    np.testing.assert_allclose(np.asarray(outs_s), np.asarray(outs_w),
                               atol=atol, rtol=0)
    # final state: nodes and t are pure copies — exact; the reconstructed
    # adjacency carries exact selector-row values — exact too
    np.testing.assert_array_equal(np.asarray(st_s.t), np.asarray(st_w.t))
    np.testing.assert_allclose(np.asarray(st_s.nodes),
                               np.asarray(st_w.nodes), atol=0, rtol=0)
    np.testing.assert_allclose(np.asarray(st_s.adj), np.asarray(st_w.adj),
                               atol=atol, rtol=0)


class TestRingWindowParity:
    def test_temporal(self):
        compare(lambda: TemporalBackedge([1]))

    def test_temporal_multihop(self):
        compare(lambda: TemporalBackedge([1, 3]))

    def test_euclidean(self):
        compare(lambda: EuclideanEdge(max_distance=2.0))

    def test_euclidean_learned_scale(self):
        compare(lambda: EuclideanEdge(max_distance=2.0, learned=True))

    def test_cosine(self):
        compare(lambda: CosineEdge(0.5))

    def test_spatial(self):
        compare(lambda: SpatialEdge(1.0, slice(0, 2)))

    def test_learned_deterministic(self):
        compare(lambda: LearnedEdge(input_size=5, deterministic=True),
                atol=1e-4)

    def test_chain(self):
        compare(lambda: EdgeChain([TemporalBackedge([1]),
                                   EuclideanEdge(2.0)]))

    def test_no_selector(self):
        compare(lambda: None)

    def test_with_preprocessor(self):
        compare(lambda: TemporalBackedge([1]), pre=True)

    def test_one_layer(self):
        compare(lambda: EuclideanEdge(2.0), layers=1)

    def test_mean_aggr(self):
        compare(lambda: EuclideanEdge(2.0), aggr="mean")

    def test_exact_window_boundary(self):
        compare(lambda: TemporalBackedge([1]), N=6, T=6)

    def test_short_window(self):
        compare(lambda: EuclideanEdge(2.0), N=8, T=3)

    def test_warm_state(self):
        """Start mid-trajectory (t0 > 0, wrapped memory)."""
        compare(lambda: EuclideanEdge(2.0), warm=9)

    def test_warm_unaligned(self):
        compare(lambda: TemporalBackedge([1, 2]), warm=4, T=7)

    def test_larger_shapes(self):
        compare(lambda: EuclideanEdge(1.5), B=2, N=16, F=8, T=40, warm=21,
                atol=1e-4)


class TestWindowSupported:
    def test_supported(self):
        model, _ = build(lambda: EuclideanEdge(2.0))
        assert window_supported(model)

    def test_bidirectional_unsupported(self):

        class BiEuclidean(EuclideanEdge):
            def __init__(self):
                super().__init__(2.0)
                self.bidirectional = True

        model, _ = build(BiEuclidean)
        assert not window_supported(model)

    def test_three_layers_unsupported(self):
        model, _ = build(lambda: EuclideanEdge(2.0), layers=3)
        assert not window_supported(model)

    def test_stochastic_learned_unsupported(self):
        model, _ = build(lambda: LearnedEdge(input_size=5,
                                             deterministic=False))
        assert not window_supported(model)

    def test_unsupported_raises(self):
        model, params = build(lambda: LearnedEdge(input_size=5,
                                                  deterministic=False))
        xs = jnp.ones((2, 4, 5))
        with pytest.raises(AssertionError):
            ring_window(model, params, xs, model.initial_state(2, 5))


class TestRingWindowGrad:
    def test_grad_matches_scan(self):
        """Training through the window: grads wrt params and inputs match
        the scan's (the window's backward is cumsum transposes, not a
        sequential backward scan)."""
        from gcm_tpu.models.ring_window import ring_window

        model, params = build(lambda: EuclideanEdge(2.0), pre=True)
        xs = jax.random.normal(jax.random.PRNGKey(5), (3, 14, 5))
        st = model.initial_state(3, 5)

        def loss(p, x, use_window):
            f = ring_window(model, p, x, st) if use_window \
                else model.scan(p, x, st)
            return jnp.sum(f[0] ** 2)

        gs = jax.grad(loss, argnums=(0, 1))(params, xs, False)
        gw = jax.grad(loss, argnums=(0, 1))(params, xs, True)
        for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gw)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_learned_selector_grad(self):
        """Gradient flows into the LearnedEdge MLP through the window's
        spardmax/STE path, matching the scan."""
        from gcm_tpu.models.ring_window import ring_window

        model, params = build(
            lambda: LearnedEdge(input_size=5, deterministic=True))
        xs = jax.random.normal(jax.random.PRNGKey(6), (2, 11, 5))
        st = model.initial_state(2, 5)

        def loss(p, use_window):
            f = ring_window(model, p, xs, st) if use_window \
                else model.scan(p, xs, st)
            return jnp.sum(f[0] ** 2)

        gs = jax.grad(loss)(params, False)
        gw = jax.grad(loss)(params, True)
        en_s = jax.tree.leaves(gs["edge_selectors"])
        en_w = jax.tree.leaves(gw["edge_selectors"])
        assert any(float(jnp.sum(jnp.abs(g))) > 0 for g in en_s)
        for a, b in zip(en_s, en_w):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)
