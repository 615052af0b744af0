"""BandedRingGCM ↔ DenseGCM exact belief parity (temporal fast path)."""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.models.banded_gcm import BandedRingGCM
from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import MLP, Linear


def run_pair(hops, B=3, N=6, F=5, T=21, obs=None, preprocessor=False, seed=0):
    obs = obs or F
    gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                    DenseGraphConv(F, F), jnp.tanh])
    pre = MLP([Linear(obs, F)]) if preprocessor else None
    dense = DenseGCM(gnn, preprocessor=pre, graph_size=N,
                     edge_selectors=TemporalBackedge(list(hops)))
    banded = BandedRingGCM(gnn, preprocessor=pre, hops=hops, graph_size=N)
    params = dense.init(jax.random.PRNGKey(seed))
    xs = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, T, obs))
    outs_d, _ = dense.scan(params, xs, dense.initial_state(B, obs))
    outs_b, _ = banded.scan(params, xs, banded.initial_state(B, obs))
    return np.array(outs_d), np.array(outs_b)


class TestBandedParity:
    def test_single_hop(self):
        d, b = run_pair((1,))
        assert np.allclose(d, b, atol=1e-5)

    def test_multi_hop(self):
        d, b = run_pair((1, 3))
        assert np.allclose(d, b, atol=1e-5)

    def test_hop_larger_than_graph_boundary(self):
        d, b = run_pair((5,), N=6, T=15)
        assert np.allclose(d, b, atol=1e-5)

    def test_with_preprocessor(self):
        d, b = run_pair((1,), obs=3, preprocessor=True)
        assert np.allclose(d, b, atol=1e-5)

    def test_fill_boundary(self):
        d, b = run_pair((1,), N=6, T=7)
        assert np.allclose(d, b, atol=1e-5)

    def test_deep_wrap(self):
        d, b = run_pair((2,), N=4, T=30)
        assert np.allclose(d, b, atol=1e-5)


class TestBandedDirections:
    def _pair(self, direction, hops=(1,), B=2, N=6, F=4, T=17):
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh])
        dense = DenseGCM(gnn, graph_size=N,
                         edge_selectors=TemporalBackedge(list(hops),
                                                         direction=direction))
        banded = BandedRingGCM(gnn, hops=hops, graph_size=N,
                               direction=direction)
        params = dense.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        d, _ = dense.scan(params, xs, dense.initial_state(B, F))
        b, _ = banded.scan(params, xs, banded.initial_state(B, F))
        return np.array(d), np.array(b)

    def test_both(self):
        d, b = self._pair("both")
        assert np.allclose(d, b, atol=1e-5)

    def test_backward(self):
        d, b = self._pair("backward")
        assert np.allclose(d, b, atol=1e-5)

    def test_both_multihop_deep_wrap(self):
        d, b = self._pair("both", hops=(1, 2), N=5, T=23)
        assert np.allclose(d, b, atol=1e-5)


class TestBandedRemat:
    def test_remat_scan_matches_plain(self):
        gnn = DenseGNN([DenseGraphConv(4, 4), jnp.tanh])
        banded = BandedRingGCM(gnn, hops=(1,), graph_size=6)
        params = banded.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 4))

        def loss(p, remat):
            outs, _ = banded.scan(p, xs, banded.initial_state(2, 4),
                                  remat=remat)
            return jnp.mean(outs ** 2)

        g_plain = jax.grad(lambda p: loss(p, False))(params)
        g_remat = jax.grad(lambda p: loss(p, True))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                        jax.tree_util.tree_leaves(g_remat)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-6)


class TestBandedScoredParity:
    """BandedScoredGCM ↔ DenseGCM exact parity for windowed distance
    selectors (+ optional temporal hops) — the scored-band fast path."""

    def _pair(self, distance_d, distance_b, hops=(), B=3, N=8, F=5, T=25,
              window=3, preprocessor=False, obs=None, seed=0):
        from gcm_tpu.edges.chain import EdgeChain
        from gcm_tpu.models.banded_gcm import BandedScoredGCM

        obs = obs or F
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                        DenseGraphConv(F, F), jnp.tanh])
        pre = MLP([Linear(obs, F)]) if preprocessor else None
        sels = ([TemporalBackedge(list(hops))] if hops else []) + [distance_d]
        dense = DenseGCM(gnn, preprocessor=pre, graph_size=N,
                         edge_selectors=(EdgeChain(sels) if len(sels) > 1
                                         else sels[0]))
        banded = BandedScoredGCM(gnn, distance=distance_b, preprocessor=pre,
                                 hops=hops, window=window, graph_size=N)
        dp = dense.init(jax.random.PRNGKey(seed))
        bp = banded.init(jax.random.PRNGKey(seed))
        bp["gnn"] = dp["gnn"]
        if pre is not None:
            bp["preprocessor"] = dp["preprocessor"]
        if distance_b is not None and distance_b.learned:
            sel_params = (dp["edge_selectors"][-1] if hops
                          else dp["edge_selectors"])
            bp["distance"] = sel_params
        xs = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, T, obs))
        outs_d, _ = dense.scan(dp, xs, dense.initial_state(B, obs))
        outs_b, _ = banded.scan(bp, xs, banded.initial_state(B, obs))
        return np.array(outs_d), np.array(outs_b)

    def test_euclidean_windowed_exact(self):
        from gcm_tpu.edges.distance import EuclideanEdge

        dd = EuclideanEdge(3.0)
        dd.window = 3  # dense selector carries the same candidate window
        d, b = self._pair(dd, EuclideanEdge(3.0), window=3)
        assert np.allclose(d, b, atol=1e-5), np.abs(d - b).max()

    def test_cosine_with_wraparound(self):
        from gcm_tpu.edges.distance import CosineEdge

        dd = CosineEdge(0.3)
        dd.window = 2
        d, b = self._pair(dd, CosineEdge(0.3), window=2, N=5, T=23)
        assert np.allclose(d, b, atol=1e-5), np.abs(d - b).max()

    def test_spatial_with_preprocessor(self):
        from gcm_tpu.edges.distance import SpatialEdge

        dd = SpatialEdge(0.8, a_pose_slice=slice(0, 2))
        dd.window = 3
        bb = SpatialEdge(0.8, a_pose_slice=slice(0, 2))
        d, b = self._pair(dd, bb, window=3, obs=4, preprocessor=True)
        assert np.allclose(d, b, atol=1e-5), np.abs(d - b).max()

    def test_temporal_plus_distance_chain(self):
        from gcm_tpu.edges.distance import EuclideanEdge

        dd = EuclideanEdge(2.5)
        dd.window = 4
        d, b = self._pair(dd, EuclideanEdge(2.5), hops=(1, 2), window=4)
        assert np.allclose(d, b, atol=1e-5), np.abs(d - b).max()

    def test_learned_scale(self):
        from gcm_tpu.edges.distance import EuclideanEdge

        dd = EuclideanEdge(2.0, learned=True)
        dd.window = 3
        d, b = self._pair(dd, EuclideanEdge(2.0, learned=True), window=3)
        assert np.allclose(d, b, atol=1e-5), np.abs(d - b).max()

    def test_hops_only_matches_banded_ring(self):
        from gcm_tpu.models.banded_gcm import BandedScoredGCM

        B, N, F, T = 2, 6, 4, 19
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh])
        ring = BandedRingGCM(gnn, hops=(1, 2), graph_size=N)
        scored = BandedScoredGCM(gnn, hops=(1, 2), window=2, graph_size=N)
        params = ring.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        o1, _ = ring.scan(params, xs, ring.initial_state(B, F))
        o2, _ = scored.scan(params, xs, scored.initial_state(B, F))
        assert np.allclose(np.array(o1), np.array(o2), atol=1e-5)

    def test_gradients_flow_to_gnn(self):
        from gcm_tpu.edges.distance import EuclideanEdge
        from gcm_tpu.models.banded_gcm import BandedScoredGCM

        B, N, F, T = 2, 6, 4, 9
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh])
        model = BandedScoredGCM(gnn, distance=EuclideanEdge(2.0), window=2,
                                graph_size=N)
        params = model.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))

        def loss(p):
            outs, _ = model.scan(p, xs, model.initial_state(B, F))
            return jnp.sum(outs ** 2)

        g = jax.grad(loss)(params)
        total = sum(float(jnp.sum(jnp.abs(l)))
                    for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0


class TestWindowParity:
    """BandedRingGCM.window — the scan-free whole-trajectory forward — must
    be BITWISE identical to scan() in outputs AND final state, across
    wraparound, pre-existing state, mid-window episode resets, and hops."""

    def _model(self, hops, N, F=4):
        from gcm_tpu.nn.module import MLP, Linear

        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                        DenseGraphConv(F, F), jnp.tanh])
        from gcm_tpu.models.banded_gcm import BandedRingGCM

        return BandedRingGCM(gnn, preprocessor=MLP([Linear(F, F)]),
                             hops=hops, graph_size=N)

    def test_bitwise_parity_all_regimes(self):
        F, B, N = 4, 3, 8
        for hops in [(1,), (1, 2), (2, 3)]:
            m = self._model(hops, N, F)
            params = m.init(jax.random.PRNGKey(0))
            T = 2 * N + 5  # wraps the ring twice
            xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
            st = m.initial_state(B, F)
            _, smid = m.scan(params, xs[:, :7], st)
            dones = jax.random.bernoulli(jax.random.PRNGKey(2), 0.2, (B, T))
            cases = [
                (xs, st, None),
                (xs[:, 7:], smid, None),           # pre-existing nodes
                (xs, st, dones),                   # mid-window resets
                (xs[:, 7:], smid, dones[:, 7:]),   # both
                (xs[:, :5], st,                    # done on the last step
                 jnp.zeros((B, 5), bool).at[:, -1].set(True)),
            ]
            for xw, st0, dn in cases:
                o1, s1 = m.scan(params, xw, st0, dones=dn)
                o2, s2 = m.window(params, xw, st0, dones=dn)
                assert np.array_equal(np.array(o1), np.array(o2))
                assert np.array_equal(np.array(s1.nodes), np.array(s2.nodes))
                assert np.array_equal(np.array(s1.t), np.array(s2.t))

    def test_gradients_match_scan(self):
        F, B, N, T = 4, 2, 8, 12
        m = self._model((1, 2), N, F)
        params = m.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))

        def loss(fwd, p):
            o, _ = fwd(p, xs, m.initial_state(B, F))
            return jnp.sum(o ** 2)

        g1 = jax.grad(lambda p: loss(m.scan, p))(params)
        g2 = jax.grad(lambda p: loss(m.window, p))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-5)

    def test_window_forward_only(self):
        import pytest

        m = self._model((1,), 8)
        m.direction = "backward"
        with pytest.raises(AssertionError, match="forward-only"):
            m.window(m.init(jax.random.PRNGKey(0)),
                     jnp.zeros((1, 4, 4)), m.initial_state(1, 4))


class TestScoredWindowParity:
    """BandedScoredGCM.window — scan-free whole-trajectory forward for the
    scored band — bitwise-identical to scan() (outputs, nodes, band, t)
    across distance selectors, hops, wraparound, pre-existing state, and
    mid-window episode resets."""

    def _cases(self):
        from gcm_tpu.edges.distance import (CosineEdge, EuclideanEdge,
                                            SpatialEdge)

        return [(EuclideanEdge(2.0), ()), (CosineEdge(0.3), (1,)),
                (EuclideanEdge(1.5, learned=True), (1, 2)),
                (None, (1, 2)), (SpatialEdge(1.0, slice(0, 2)), ())]

    def test_bitwise_parity_all_regimes(self):
        from gcm_tpu.models.banded_gcm import BandedScoredGCM
        from gcm_tpu.nn.module import MLP, Linear

        F, B, N, T = 4, 3, 8, 20
        for dist, hops in self._cases():
            gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                            DenseGraphConv(F, F), jnp.tanh])
            m = BandedScoredGCM(gnn, distance=dist,
                                preprocessor=MLP([Linear(F, F)]),
                                hops=hops, window=3, graph_size=N)
            params = m.init(jax.random.PRNGKey(0))
            xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
            st = m.initial_state(B, F)
            _, smid = m.scan(params, xs[:, :7], st)
            dones = jax.random.bernoulli(jax.random.PRNGKey(2), 0.2, (B, T))
            for xw, st0, dn in [(xs, st, None), (xs[:, 7:], smid, None),
                                (xs, st, dones),
                                (xs[:, 7:], smid, dones[:, 7:])]:
                o1, s1 = m.scan(params, xw, st0, dones=dn)
                o2, s2 = m.window(params, xw, st0, dones=dn)
                assert np.array_equal(np.array(o1), np.array(o2))
                for a, b in zip(s1, s2):
                    assert np.array_equal(np.array(a), np.array(b))

    def test_gradients_match_scan(self):
        from gcm_tpu.edges.distance import EuclideanEdge
        from gcm_tpu.models.banded_gcm import BandedScoredGCM

        F, B, N, T = 4, 2, 8, 12
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh])
        m = BandedScoredGCM(gnn, distance=EuclideanEdge(2.0, learned=True),
                            window=3, graph_size=N)
        params = m.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))

        def loss(fwd, p):
            o, _ = fwd(p, xs, m.initial_state(B, F))
            return jnp.sum(o ** 2)

        g1 = jax.grad(lambda p: loss(m.scan, p))(params)
        g2 = jax.grad(lambda p: loss(m.window, p))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-5)


class TestScoredWindowProperty:
    """Randomized scored-band window-vs-scan parity over wrap depth,
    pre-existing state, window size vs graph size, and reset patterns."""

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.data())
    def test_window_matches_scan_random(self, data):
        from gcm_tpu.edges.distance import EuclideanEdge
        from gcm_tpu.models.banded_gcm import BandedScoredGCM
        from gcm_tpu.nn.module import MLP, Linear

        st_ = self.st
        N = data.draw(st_.integers(3, 9), label="N")
        w = data.draw(st_.integers(1, min(4, N - 1)), label="window")
        T = data.draw(st_.integers(1, 18), label="T")
        B = data.draw(st_.integers(1, 3), label="B")
        warm = data.draw(st_.integers(0, 10), label="warm")
        p_done = data.draw(st_.sampled_from([0.0, 0.25]), label="p_done")
        seed = data.draw(st_.integers(0, 2**16), label="seed")

        F = 3
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                        DenseGraphConv(F, F), jnp.tanh])
        m = BandedScoredGCM(gnn, distance=EuclideanEdge(1.2),
                            preprocessor=MLP([Linear(F, F)]),
                            window=w, graph_size=N)
        params = m.init(jax.random.PRNGKey(seed))
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
        st0 = m.initial_state(B, F)
        if warm:
            _, st0 = m.scan(params, jax.random.normal(k1, (B, warm, F)),
                            st0)
        xs = jax.random.normal(k2, (B, T, F))
        dones = (jax.random.bernoulli(k3, p_done, (B, T))
                 if p_done else None)
        o1, s1 = m.scan(params, xs, st0, dones=dones)
        o2, s2 = m.window(params, xs, st0, dones=dones)
        assert np.allclose(np.array(o1), np.array(o2),
                           rtol=1e-4, atol=1e-4)
        for a, b in zip(s1, s2):
            assert np.array_equal(np.array(a), np.array(b))


class TestMeanAggregationParity:
    """Fast cores with DenseGraphConv('mean') stacks — exact DenseGCM
    parity (the analytic deg division must match adj.sum(-1) clamped >= 1,
    dense_conv.py mean semantics) across scan and window paths."""

    def _gnn(self, F=4):
        return DenseGNN([DenseGraphConv(F, F, aggr="mean"), jnp.tanh,
                         DenseGraphConv(F, F, aggr="mean"), jnp.tanh])

    def test_banded_mean_matches_dense(self):
        from gcm_tpu.models.banded_gcm import BandedRingGCM

        F, B, N, T = 4, 3, 6, 17
        gnn = self._gnn(F)
        dense = DenseGCM(gnn, graph_size=N,
                         edge_selectors=TemporalBackedge([1, 2]))
        banded = BandedRingGCM(gnn, hops=(1, 2), graph_size=N)
        params = dense.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        d, _ = dense.scan(params, xs, dense.initial_state(B, F))
        b, _ = banded.scan(params, xs, banded.initial_state(B, F))
        assert np.allclose(np.array(d), np.array(b), atol=1e-5)
        w, _ = banded.window(params, xs, banded.initial_state(B, F))
        assert np.allclose(np.array(d), np.array(w), atol=1e-5)

    def test_scored_mean_matches_dense(self):
        from gcm_tpu.edges.distance import EuclideanEdge
        from gcm_tpu.models.banded_gcm import BandedScoredGCM

        F, B, N, T = 4, 3, 6, 15
        gnn = self._gnn(F)
        dist = EuclideanEdge(1.2, window=3)
        dense = DenseGCM(gnn, graph_size=N, edge_selectors=dist)
        scored = BandedScoredGCM(gnn, distance=dist, graph_size=N)
        params = dense.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        d, _ = dense.scan(params, xs, dense.initial_state(B, F))
        s, _ = scored.scan(params, xs, scored.initial_state(B, F))
        assert np.allclose(np.array(d), np.array(s), atol=1e-5)
        w, _ = scored.window(params, xs, scored.initial_state(B, F))
        assert np.allclose(np.array(d), np.array(w), atol=1e-5)
