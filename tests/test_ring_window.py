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


class TestChunked:
    """Memory-bounded chunking (config.RING_WINDOW_CHUNK_BYTES): any chunk
    length <= N threads the state identically — the VERDICT r4 OOM fix must
    not change a single output."""

    def test_explicit_chunk_sizes(self):
        model, params = build(lambda: EuclideanEdge(max_distance=1.0))
        xs = jax.random.normal(jax.random.PRNGKey(3), (3, 20, 5))
        st = model.initial_state(3, 5)
        ref_o, ref_st = ring_window(model, params, xs, st, chunk=model.graph_size)
        for chunk in (1, 3, 5, 7, 100):  # incl. non-divisors and > N (clamped)
            o, fst = ring_window(model, params, xs, st, chunk=chunk)
            np.testing.assert_allclose(np.asarray(o), np.asarray(ref_o),
                                       atol=1e-5, rtol=0)
            np.testing.assert_allclose(np.asarray(fst.adj),
                                       np.asarray(ref_st.adj), atol=1e-5,
                                       rtol=0)
            np.testing.assert_array_equal(np.asarray(fst.nodes),
                                          np.asarray(ref_st.nodes))

    def test_auto_chunk_respects_budget(self, monkeypatch):
        """max_chunk_len keeps B*c*(N+c)*Fwide*4 under the configured byte
        budget (or degenerates to c=1), and a squeezed budget still yields
        scan-exact outputs."""
        from gcm_tpu import config
        from gcm_tpu.models.ring_window import max_chunk_len

        model, params = build(lambda: EuclideanEdge(max_distance=1.0),
                              B=2, N=8, F=4)
        B, F, N = 2, 4, 8
        for budget in (10_000, 4_000, 1_000):
            monkeypatch.setattr(config, "RING_WINDOW_CHUNK_BYTES", budget)
            c = max_chunk_len(model, B, F)
            assert 1 <= c <= N
            assert c == 1 or B * c * (N + c) * F * 4 <= budget
        monkeypatch.setattr(config, "RING_WINDOW_CHUNK_BYTES", 1_500)
        c = max_chunk_len(model, B, F)
        assert c < N  # the squeeze engaged
        xs = jax.random.normal(jax.random.PRNGKey(4), (B, 19, F))
        st = model.initial_state(B, F)
        outs_s, st_s = model.scan(params, xs, st)
        outs_w, st_w = ring_window(model, params, xs, st)  # auto chunk
        np.testing.assert_allclose(np.asarray(outs_s), np.asarray(outs_w),
                                   atol=1e-5, rtol=0)
        np.testing.assert_allclose(np.asarray(st_s.adj), np.asarray(st_w.adj),
                                   atol=1e-5, rtol=0)

    def test_learned_widens_the_bound(self):
        """The learned selector's pair-concat doubles the widest feature dim
        the budget must cover."""
        from gcm_tpu.models.ring_window import max_chunk_len

        m_plain, _ = build(lambda: EuclideanEdge(max_distance=1.0),
                           B=2, N=8, F=4)
        m_learned, _ = build(
            lambda: LearnedEdge(input_size=4, deterministic=True),
            B=2, N=8, F=4)
        assert (max_chunk_len(m_learned, 2, 4)
                <= max_chunk_len(m_plain, 2, 4))


class TestTrainAwareGate:
    """window_profitable(mode) — the measured (N, mode) crossovers
    (BASELINE.md round-4b: train flips at N=512, forward at N=1024)."""

    def _model(self, N):
        model, _ = build(lambda: EuclideanEdge(max_distance=1.0), N=N)
        return model

    def test_crossovers(self):
        assert not self._model(128).window_profitable("forward")
        assert not self._model(128).window_profitable("train")
        assert not self._model(512).window_profitable("forward")
        assert self._model(512).window_profitable("train")
        assert self._model(1024).window_profitable("forward")
        assert self._model(1024).window_profitable("train")

    def test_tunable(self, monkeypatch):
        from gcm_tpu import config

        monkeypatch.setattr(config, "RING_WINDOW_TRAIN_MIN_N", 4)
        assert self._model(6).window_profitable("train")
        assert not self._model(6).window_profitable("forward")

    def test_window_applicable(self):
        m = self._model(6)
        assert m.window_applicable(dones=None)
        assert not m.window_applicable(dones=jnp.zeros((2, 3), bool))
        m_bidir = RingDenseGCM(
            DenseGNN([DenseGraphConv(5, 5), jnp.tanh]),
            edge_selectors=TemporalBackedge([1], direction="both"),
            graph_size=6)
        assert not m_bidir.window_applicable(dones=None)


class TestCumsumBlock:
    """Blocked kill-cumsum (config.RING_WINDOW_CUMSUM_BLOCK): same values to
    float reassociation, for any block size incl. non-divisors."""

    def test_blocked_matches_plain(self, monkeypatch):
        from gcm_tpu import config

        model, params = build(lambda: EuclideanEdge(max_distance=1.0))
        xs = jax.random.normal(jax.random.PRNGKey(9), (3, 20, 5))
        st = model.initial_state(3, 5)
        ref_o, ref_st = ring_window(model, params, xs, st)
        for block in (2, 3, 8, 64):
            monkeypatch.setattr(config, "RING_WINDOW_CUMSUM_BLOCK", block)
            o, fst = ring_window(model, params, xs, st)
            np.testing.assert_allclose(np.asarray(o), np.asarray(ref_o),
                                       atol=1e-5, rtol=0)
            np.testing.assert_allclose(np.asarray(fst.adj),
                                       np.asarray(ref_st.adj), atol=1e-5,
                                       rtol=0)

    def test_blocked_grad_matches(self, monkeypatch):
        from gcm_tpu import config

        model, params = build(lambda: EuclideanEdge(max_distance=1.0))
        xs = jax.random.normal(jax.random.PRNGKey(10), (2, 12, 5))
        st = model.initial_state(2, 5)

        def loss(p):
            o, _ = ring_window(model, p, xs, st)
            return jnp.sum(o ** 2)

        g_plain = jax.grad(loss)(params)
        monkeypatch.setattr(config, "RING_WINDOW_CUMSUM_BLOCK", 4)
        g_blk = jax.grad(loss)(params)
        for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_blk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_mean_aggr_blocked(self, monkeypatch):
        from gcm_tpu import config

        monkeypatch.setattr(config, "RING_WINDOW_CUMSUM_BLOCK", 4)
        compare(lambda: EuclideanEdge(max_distance=1.0), aggr="mean")
