"""RingDenseGCM ↔ DenseGCM output parity: the ring-pointer core must produce
the exact belief sequence of the roll-based core for every supported selector,
through multiple wraparounds of the memory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.edges.chain import EdgeChain
from gcm_tpu.edges.dense import DenseEdge
from gcm_tpu.edges.distance import EuclideanEdge, SpatialEdge
from gcm_tpu.edges.learned import LearnedEdge
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.models.positional import PositionalEncoding
from gcm_tpu.models.ring_gcm import RingDenseGCM
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import MLP, Linear


def run_pair(selector_fn, B=3, N=6, F=5, T=20, preprocessor=False, pe=False,
             seed=0):
    """Build DenseGCM and RingDenseGCM with identical params, run T steps
    (> 3 wraps), compare outputs."""
    gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                    DenseGraphConv(F, F), jnp.tanh])
    kw = dict(graph_size=N)
    if preprocessor:
        kw["preprocessor"] = MLP([Linear(F, F)])
    if pe:
        kw["positional_encoder"] = PositionalEncoding(max_len=N, mode="add",
                                                      feat_dim=F)
        kw["aux_edge_selectors"] = selector_fn()
        dense = DenseGCM(gnn, **kw)
        ring = RingDenseGCM(gnn, **kw)
    else:
        dense = DenseGCM(gnn, edge_selectors=selector_fn(), **kw)
        ring = RingDenseGCM(gnn, edge_selectors=selector_fn(), **kw)
    params = dense.init(jax.random.PRNGKey(seed))
    xs = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, T, F))
    outs_d, _ = dense.scan(params, xs, dense.initial_state(B, F))
    outs_r, _ = ring.scan(params, xs, ring.initial_state(B, F))
    return np.array(outs_d), np.array(outs_r)


class TestRingParity:
    def test_temporal(self):
        d, r = run_pair(lambda: TemporalBackedge([1]))
        assert np.allclose(d, r, atol=1e-5)

    def test_temporal_multihop_both(self):
        d, r = run_pair(lambda: TemporalBackedge([1, 3], direction="both"))
        assert np.allclose(d, r, atol=1e-5)

    def test_dense_edge(self):
        d, r = run_pair(DenseEdge)
        assert np.allclose(d, r, atol=1e-5)

    def test_euclidean(self):
        d, r = run_pair(lambda: EuclideanEdge(max_distance=2.0))
        assert np.allclose(d, r, atol=1e-5)

    def test_spatial(self):
        d, r = run_pair(lambda: SpatialEdge(1.0, slice(0, 2)))
        assert np.allclose(d, r, atol=1e-5)

    def test_learned_deterministic(self):
        d, r = run_pair(lambda: LearnedEdge(input_size=5, deterministic=True))
        assert np.allclose(d, r, atol=1e-4)

    def test_chain(self):
        d, r = run_pair(lambda: EdgeChain([TemporalBackedge([1]),
                                           TemporalBackedge([2])]))
        assert np.allclose(d, r, atol=1e-5)

    def test_with_preprocessor(self):
        d, r = run_pair(lambda: TemporalBackedge([1]), preprocessor=True)
        assert np.allclose(d, r, atol=1e-5)

    def test_with_positional_encoding_aux(self):
        d, r = run_pair(lambda: LearnedEdge(input_size=5, deterministic=True),
                        pe=True)
        assert np.allclose(d, r, atol=1e-4)

    def test_exact_fill_boundary(self):
        """T == N and T == N+1: the first wrap step must agree."""
        d, r = run_pair(lambda: TemporalBackedge([1]), N=6, T=7)
        assert np.allclose(d, r, atol=1e-5)

    def test_unsupported_selector_raises(self):
        class ExoticSelector:
            def init(self, key):
                return {}

        gnn = DenseGNN([DenseGraphConv(4, 4)])
        ring = RingDenseGCM(gnn, graph_size=4,
                            edge_selectors=ExoticSelector())
        params = {"gnn": gnn.init(jax.random.PRNGKey(0)),
                  "edge_selectors": {}}
        with pytest.raises(NotImplementedError):
            ring(params, jnp.ones((1, 4)), ring.initial_state(1, 4))


class TestRingGeneralization:
    def test_learned_temporal_deterministic_parity(self):
        d, r = run_pair(lambda: TemporalBackedge([1], learned=True,
                                                 learning_window=5,
                                                 deterministic=True),
                        N=6, T=15)
        assert np.allclose(d, r, atol=1e-5)

    def test_cat_pe_parity(self):
        """cat-mode positional encoding with an aux learned selector."""
        B, N, F, T = 2, 6, 8, 14
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh])
        kw = dict(
            graph_size=N,
            positional_encoder=PositionalEncoding(max_len=N, mode="cat",
                                                  cat_dim=4, feat_dim=F),
            aux_edge_selectors=LearnedEdge(input_size=F, deterministic=True),
        )
        dense = DenseGCM(gnn, **kw)
        ring = RingDenseGCM(gnn, **kw)
        params = dense.init(jax.random.PRNGKey(3))
        xs = jax.random.normal(jax.random.PRNGKey(4), (B, T, F))
        outs_d, _ = dense.scan(params, xs, dense.initial_state(B, F))
        outs_r, _ = ring.scan(params, xs, ring.initial_state(B, F))
        assert np.allclose(np.array(outs_d), np.array(outs_r), atol=1e-4)


class TestRingLearnedDistance:
    def test_learned_euclidean_parity(self):
        d, r = run_pair(lambda: EuclideanEdge(max_distance=2.0, learned=True))
        assert np.allclose(d, r, atol=1e-5)


class TestFusedStep:
    """config.RING_FUSED_STEP composes eviction + selector writes into one
    pointwise adjacency rewrite; it must be BITWISE identical to the unfused
    step (same values, different write schedule) for every supported
    selector, through wraparound, including the full state."""

    def _pair_states(self, selector_fn, B=3, N=6, F=5, T=20, seed=0, **kw):
        from gcm_tpu import config

        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                        DenseGraphConv(F, F), jnp.tanh])
        ring = RingDenseGCM(gnn, edge_selectors=selector_fn(),
                            graph_size=N, **kw)
        params = ring.init(jax.random.PRNGKey(seed))
        xs = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, T, F))
        prev = config.RING_FUSED_STEP
        try:
            config.RING_FUSED_STEP = False
            outs_u, st_u = ring.scan(params, xs, ring.initial_state(B, F))
            config.RING_FUSED_STEP = True
            outs_f, st_f = ring.scan(params, xs, ring.initial_state(B, F))
        finally:
            config.RING_FUSED_STEP = prev
        return (np.array(outs_u), jax.tree_util.tree_map(np.array, st_u),
                np.array(outs_f), jax.tree_util.tree_map(np.array, st_f))

    def _assert_bitwise(self, selector_fn, **kw):
        ou, su, of, sf = self._pair_states(selector_fn, **kw)
        np.testing.assert_array_equal(ou, of)
        for a, b in zip(su, sf):
            np.testing.assert_array_equal(a, b)

    def test_temporal(self):
        self._assert_bitwise(lambda: TemporalBackedge([1]))

    def test_temporal_multihop_both(self):
        self._assert_bitwise(
            lambda: TemporalBackedge([1, 3], direction="both"))

    def test_dense_edge(self):
        self._assert_bitwise(DenseEdge)

    def test_euclidean(self):
        self._assert_bitwise(lambda: EuclideanEdge(max_distance=2.0))

    def test_learned_deterministic(self):
        self._assert_bitwise(
            lambda: LearnedEdge(input_size=5, deterministic=True))

    def test_learned_temporal(self):
        self._assert_bitwise(
            lambda: TemporalBackedge([1], learned=True, learning_window=5,
                                     deterministic=True), N=6, T=15)

    def test_chain(self):
        self._assert_bitwise(lambda: EdgeChain([TemporalBackedge([1]),
                                                TemporalBackedge([2])]))

    def test_edge_weights_state(self):
        self._assert_bitwise(lambda: TemporalBackedge([1]),
                             edge_weights=True)

    def test_fused_matches_dense_gcm(self):
        """Fused ring vs the roll-based DenseGCM (allclose, like
        TestRingParity)."""
        from gcm_tpu import config

        prev = config.RING_FUSED_STEP
        config.RING_FUSED_STEP = True
        try:
            d, r = run_pair(lambda: TemporalBackedge([1]), N=6, T=14)
        finally:
            config.RING_FUSED_STEP = prev
        assert np.allclose(d, r, atol=1e-5)


class TestAdjDtype:
    """adj_dtype=bfloat16 carries the [B,N,N] adjacency in half the HBM.
    For 0/1-valued selectors the stored values are exactly representable and
    the conv upcasts before the matmul, so beliefs are BITWISE-identical to
    the f32 carry — in both the unfused and fused step."""

    @pytest.mark.parametrize("fused", [False, True])
    def test_bitwise_vs_f32(self, fused):
        from gcm_tpu import config

        B, N, F, T = 3, 6, 5, 20
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                        DenseGraphConv(F, F), jnp.tanh])
        mk = lambda dt: RingDenseGCM(
            gnn, edge_selectors=EdgeChain([TemporalBackedge([1]),
                                           EuclideanEdge(2.0)]),
            graph_size=N, adj_dtype=dt)
        m32, m16 = mk(None), mk(jnp.bfloat16)
        params = m32.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        prev = config.RING_FUSED_STEP
        config.RING_FUSED_STEP = fused
        try:
            o32, s32 = m32.scan(params, xs, m32.initial_state(B, F))
            o16, s16 = m16.scan(params, xs, m16.initial_state(B, F))
        finally:
            config.RING_FUSED_STEP = prev
        np.testing.assert_array_equal(np.asarray(o32), np.asarray(o16))
        assert s16.adj.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(s32.adj),
                                      np.asarray(s16.adj.astype(s32.adj.dtype)))

    def test_learned_temporal_rejected(self):
        gnn = DenseGNN([DenseGraphConv(4, 4)])
        with pytest.raises(ValueError):
            RingDenseGCM(gnn, graph_size=4, adj_dtype=jnp.bfloat16,
                         edge_selectors=TemporalBackedge(
                             [1], learned=True, learning_window=3))
