"""SparseGCM contracts: packing round trips, sparse selectors, and the
north-star dense↔sparse parity suite.

Mirrors reference tests/test_sparse_gcm.py: pack/unpack round trips
(:74-304), TestDenseVsSparse exact-equality across execution modes
(:349-540), divergence-free training parity (:542-613), gradient canaries
(:757-770), and forced-logit deterministic edge sampling (:616-622)."""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.core.graph_state import SparseGraphState, sparse_initial_state
from gcm_tpu.edges.sparse_learned import LearnedEdge as SparseLearnedEdge
from gcm_tpu.edges.sparse_spatial import SparseEdgeChain, SpatialRadiusEdge
from gcm_tpu.edges.sparse_temporal import TemporalEdge
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.models.sparse_gcm import SparseGCM
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN
from gcm_tpu.ops.coalesce import coalesce_edges
from gcm_tpu.utils.packing import pack_hidden, unpack_hidden


def edge_set(edges_b):
    """Set of (sink, source) pairs from one batch's padded edge list."""
    e = np.asarray(edges_b)
    return {(int(s), int(t)) for s, t in zip(e[0], e[1]) if s >= 0 and t >= 0}


class TestPackUnpack:
    def _roundtrip(self, state, max_edges):
        packed = pack_hidden(state, max_edges)
        return unpack_hidden(packed, max_edges=state.edges.shape[-1])

    def test_empty(self):
        st = sparse_initial_state(3, 16, 4, max_edges=8)
        rt = self._roundtrip(st, 8)
        assert np.array_equal(np.array(rt.edges), np.array(st.edges))
        assert np.array_equal(np.array(rt.t), np.array(st.t))

    def test_ragged(self):
        st = sparse_initial_state(2, 16, 4, max_edges=8)
        edges = st.edges.at[0, :, 0].set(jnp.array([1, 0]))
        edges = edges.at[0, :, 1].set(jnp.array([2, 1]))
        edges = edges.at[1, :, 0].set(jnp.array([3, 2]))
        st = st._replace(edges=edges,
                         num_edges=jnp.array([2, 1], jnp.int32),
                         t=jnp.array([3, 4], jnp.int32))
        rt = self._roundtrip(st, 8)
        assert edge_set(rt.edges[0]) == {(1, 0), (2, 1)}
        assert edge_set(rt.edges[1]) == {(3, 2)}
        assert np.array_equal(np.array(rt.num_edges), [2, 1])
        assert np.array_equal(np.array(rt.t), [3, 4])

    def test_idempotent_ten_cycles(self):
        """Mirrors the 10-cycle idempotence contract
        (tests/test_sparse_gcm.py:240-304)."""
        st = sparse_initial_state(2, 16, 4, max_edges=8)
        edges = st.edges.at[0, :, 0].set(jnp.array([5, 4]))
        st = st._replace(edges=edges, num_edges=jnp.array([1, 0], jnp.int32))
        cur = st
        for _ in range(10):
            cur = self._roundtrip(cur, 8)
        assert edge_set(cur.edges[0]) == {(5, 4)}
        assert edge_set(cur.edges[1]) == set()

    def test_pack_format(self):
        st = sparse_initial_state(1, 8, 2, max_edges=4)
        edges = st.edges.at[0, :, 0].set(jnp.array([2, 1]))
        st = st._replace(edges=edges, num_edges=jnp.array([1], jnp.int32))
        nodes, pe, pw, T = pack_hidden(st, 6)
        assert pe.shape == (1, 2, 6) and pw.shape == (1, 1, 6)
        assert np.array_equal(np.array(pe[0, :, 0]), [2, 1])
        assert (np.array(pe[0, :, 1:]) == -1).all()
        assert np.allclose(np.array(pw), 1.0)


class TestCoalesce:
    def test_dedup_mean(self):
        edges = jnp.array([[[3, 3, 1, -1], [0, 0, 0, -1]]], jnp.int32)
        w = jnp.array([[2.0, 4.0, 1.0, 9.0]])
        e2, w2, n = coalesce_edges(edges, w, num_nodes=8, reduce="mean")
        assert int(n[0]) == 2
        assert edge_set(e2[0]) == {(3, 0), (1, 0)}
        got = {(int(s), int(t)): float(v) for s, t, v in
               zip(np.array(e2[0, 0]), np.array(e2[0, 1]), np.array(w2[0]))
               if s >= 0}
        assert got[(3, 0)] == 3.0 and got[(1, 0)] == 1.0

    def test_dedup_sum_and_sorted(self):
        edges = jnp.array([[[5, 2, 5, 2], [1, 0, 1, 0]]], jnp.int32)
        w = jnp.ones((1, 4))
        e2, w2, n = coalesce_edges(edges, w, num_nodes=8, reduce="sum")
        assert int(n[0]) == 2
        e = np.array(e2[0])
        assert (e[0, 0], e[1, 0]) == (2, 0)  # ascending (sink, source)
        assert (e[0, 1], e[1, 1]) == (5, 1)
        assert np.allclose(np.array(w2[0, :2]), [2.0, 2.0])


class TestTemporalEdgeGrid:
    def test_grid(self):
        sel = TemporalEdge([1])
        nodes = jnp.zeros((2, 8, 3))
        grid, _ = sel({}, nodes, jnp.array([0, 2]), jnp.array([2, 1]), t=2)
        g = np.array(grid)
        want0 = np.zeros((2, 8))
        want0[1, 0] = 1  # sink 1 <- source 0 (sink 0 filtered: sink > 0)
        assert np.array_equal(g[0], want0)
        want1 = np.zeros((2, 8))
        want1[0, 1] = 1  # sink 2 <- source 1; second slot padded (tau=1)
        assert np.array_equal(g[1], want1)

    def test_multi_hop(self):
        sel = TemporalEdge([1, 2])
        nodes = jnp.zeros((1, 8, 3))
        grid, _ = sel({}, nodes, jnp.array([3]), jnp.array([1]), t=1)
        g = np.array(grid[0, 0])
        assert g[2] == 1 and g[1] == 1 and g.sum() == 2


def make_models(feats=6, N=12, max_edges=64, hops=(1,)):
    dense_gnn = DenseGNN([DenseGraphConv(feats, feats), jnp.tanh,
                          DenseGraphConv(feats, feats), jnp.tanh])
    sparse_gnn = SparseGNN([GraphConv(feats, feats), jnp.tanh,
                            GraphConv(feats, feats), jnp.tanh])
    dense = DenseGCM(dense_gnn, graph_size=N,
                     edge_selectors=TemporalBackedge(list(hops)))
    sparse = SparseGCM(sparse_gnn, graph_size=N, max_edges=max_edges,
                       edge_selectors=TemporalEdge(list(hops)))
    params = dense.init(jax.random.PRNGKey(0))
    # DenseGraphConv and GraphConv share the same param structure, so the
    # exact same pytree drives both models (the reference loads state_dicts
    # across, tests/test_sparse_gcm.py:326-330)
    return dense, sparse, params


class TestDenseVsSparse:
    """The reference's strongest invariant (tests/test_sparse_gcm.py:307-613):
    identical weights ⇒ identical outputs across dense step-by-step, sparse
    step-by-step, and sparse whole-sequence execution."""

    def setup_method(self):
        self.B, self.T, self.F, self.N = 3, 8, 6, 12
        self.dense, self.sparse, self.params = make_models(self.F, self.N)
        self.xs = jax.random.normal(jax.random.PRNGKey(1),
                                    (self.B, self.T, self.F))

    def run_dense(self):
        state = self.dense.initial_state(self.B, self.F)
        return self.dense.scan(self.params, self.xs, state)

    def test_sparse_step_matches_dense_step(self):
        outs_d, final_d = self.run_dense()
        state = self.sparse.initial_state(self.B, self.F)
        outs_s, final_s = self.sparse.scan(self.params, self.xs, state)
        assert np.allclose(np.array(outs_d), np.array(outs_s), atol=1e-5)
        assert np.allclose(np.array(final_d.nodes), np.array(final_s.nodes),
                           atol=1e-6)

    def test_sparse_whole_sequence_matches_dense(self):
        outs_d, final_d = self.run_dense()
        state = self.sparse.initial_state(self.B, self.F)
        taus = jnp.full((self.B,), self.T, jnp.int32)
        outs_s, final_s = self.sparse(self.params, self.xs, taus, state)
        assert np.allclose(np.array(outs_d), np.array(outs_s), atol=1e-5)
        assert np.array_equal(np.array(final_s.t), [self.T] * self.B)
        # edge sets: (i, i-1) chains per batch
        want = {(i, i - 1) for i in range(1, self.T)}
        for b in range(self.B):
            assert edge_set(final_s.edges[b]) == want

    def test_whole_sequence_matches_chunked(self):
        """Feeding the same data in two windows equals one window."""
        state = self.sparse.initial_state(self.B, self.F)
        taus = jnp.full((self.B,), self.T, jnp.int32)
        outs_full, final_full = self.sparse(self.params, self.xs, taus, state)

        state = self.sparse.initial_state(self.B, self.F)
        h = self.T // 2
        tau_h = jnp.full((self.B,), h, jnp.int32)
        outs_a, state = self.sparse(self.params, self.xs[:, :h], tau_h, state)
        outs_b, final_ch = self.sparse(self.params, self.xs[:, h:], tau_h, state)
        outs_ch = jnp.concatenate([outs_a, outs_b], axis=1)
        assert np.allclose(np.array(outs_full), np.array(outs_ch), atol=1e-5)
        for b in range(self.B):
            assert edge_set(final_full.edges[b]) == edge_set(final_ch.edges[b])

    def test_ragged_taus(self):
        """Zero-padded ragged windows: each batch only advances taus[b]."""
        taus = jnp.array([2, 5, 8], jnp.int32)
        mask = (jnp.arange(self.T)[None, :] < taus[:, None])[..., None]
        xs = jnp.where(mask, self.xs, 0.0)
        state = self.sparse.initial_state(self.B, self.F)
        outs, final = self.sparse(self.params, xs, taus, state)
        # outputs beyond taus[b] are zero
        assert np.allclose(np.array(outs)[0, 2:], 0.0)
        assert np.allclose(np.array(outs)[1, 5:], 0.0)
        assert np.array_equal(np.array(final.t), [2, 5, 8])
        # each batch matches an unpadded dense run of its own length
        for b in range(self.B):
            tb = int(taus[b])
            dense_state = self.dense.initial_state(1, self.F)
            outs_d, _ = self.dense.scan(
                self.params, self.xs[b : b + 1, :tb], dense_state
            )
            assert np.allclose(np.array(outs[b, :tb]), np.array(outs_d[0]),
                               atol=1e-5), f"batch {b}"

    def test_max_hops_is_output_invariant(self):
        """max_hops is a compute-saving device in the reference; outputs at
        the new nodes are identical (tests/test_sparse_gcm.py:448-540)."""
        sparse2 = SparseGCM(self.sparse.gnn, graph_size=self.N, max_edges=64,
                            edge_selectors=TemporalEdge([1]), max_hops=2)
        state = self.sparse.initial_state(self.B, self.F)
        taus = jnp.full((self.B,), self.T, jnp.int32)
        outs_a, _ = self.sparse(self.params, self.xs, taus, state)
        outs_b, _ = sparse2(self.params, self.xs, taus,
                            sparse2.initial_state(self.B, self.F))
        assert np.allclose(np.array(outs_a), np.array(outs_b), atol=1e-6)

    def test_training_parity(self):
        """Gradients through both paths agree (the reference checks parameter
        allclose after optimizer steps, tests/test_sparse_gcm.py:542-613)."""
        tgt = jax.random.normal(jax.random.PRNGKey(3),
                                (self.B, self.T, self.F))

        def loss_dense(p):
            outs, _ = self.dense.scan(
                p, self.xs, self.dense.initial_state(self.B, self.F))
            return jnp.mean((outs - tgt) ** 2)

        def loss_sparse(p):
            taus = jnp.full((self.B,), self.T, jnp.int32)
            outs, _ = self.sparse(
                p, self.xs, taus, self.sparse.initial_state(self.B, self.F))
            return jnp.mean((outs - tgt) ** 2)

        gd = jax.grad(loss_dense)(self.params)
        gs = jax.grad(loss_sparse)(self.params)
        for ld, ls in zip(jax.tree_util.tree_leaves(gd),
                          jax.tree_util.tree_leaves(gs)):
            assert np.allclose(np.array(ld), np.array(ls), atol=1e-4)


class ForcedLogits:
    """DummyEdgenet analog (tests/test_sparse_gcm.py:616-622): huge positive
    logits for every pair -> softmax mass spreads over candidates; used to
    make stochastic sampling deterministic."""

    def __init__(self, value=1e15):
        self.value = value

    def init(self, key):
        del key
        return {}

    def __call__(self, params, pair_in):
        del params
        return jnp.full(pair_in.shape[:-1] + (1,), self.value,
                        pair_in.dtype) * 0 + jnp.sum(
            pair_in * 0, axis=-1, keepdims=True) + self.value


class TestSparseLearnedEdge:
    def test_deterministic_selection(self):
        F, B, N, t = 4, 2, 10, 3
        sel = SparseLearnedEdge(input_size=F, deterministic=True,
                                num_edge_samples=5)
        params = sel.init(jax.random.PRNGKey(0))
        nodes = jax.random.normal(jax.random.PRNGKey(1), (B, N, F))
        T = jnp.array([2, 0], jnp.int32)
        taus = jnp.array([3, 2], jnp.int32)
        grid, aux = sel(params, nodes, T, taus, t)
        g = np.array(grid)
        # causality: grid[b, i, j] nonzero only for j < T + i and i < taus
        for b, Tb, taub in ((0, 2, 3), (1, 0, 2)):
            for i in range(t):
                for j in range(N):
                    if g[b, i, j] != 0:
                        assert i < taub and j < Tb + i
        assert "temperature" in aux and "edges_per_node" in aux

    def test_cutoff_bounds_edges_per_sink(self):
        """softmax mass > 1/(1+num_samples) bounds selected edges per sink."""
        F, B, N, t = 4, 1, 12, 1
        n_samples = 3
        sel = SparseLearnedEdge(model=ForcedLogits(), input_size=F,
                                deterministic=True,
                                num_edge_samples=n_samples)
        params = sel.init(jax.random.PRNGKey(0))
        nodes = jnp.ones((B, N, F))
        grid, _ = sel(params, nodes, jnp.array([10], jnp.int32),
                      jnp.array([1], jnp.int32), t)
        per_sink = np.array(grid[0, 0] > 0).sum()
        # uniform softmax over 10 candidates = 0.1 < 1/4 cutoff -> none kept
        assert per_sink == 0

        sel2 = SparseLearnedEdge(model=ForcedLogits(), input_size=F,
                                 deterministic=True, num_edge_samples=20)
        grid2, _ = sel2(sel2.init(jax.random.PRNGKey(0)), nodes,
                        jnp.array([10], jnp.int32), jnp.array([1], jnp.int32),
                        t)
        assert np.array(grid2[0, 0] > 0).sum() == 10  # 0.1 > 1/21 -> all kept

    def test_window_limits_sources(self):
        F, B, N, t = 4, 1, 16, 2
        sel = SparseLearnedEdge(model=ForcedLogits(), input_size=F,
                                deterministic=True, num_edge_samples=100,
                                window=3)
        params = sel.init(jax.random.PRNGKey(0))
        nodes = jnp.ones((B, N, F))
        grid, _ = sel(params, nodes, jnp.array([10], jnp.int32),
                      jnp.array([2], jnp.int32), t)
        g = np.array(grid)
        nz = np.argwhere(g[0] > 0)
        assert (nz[:, 1] >= 7).all()  # sources >= T - window = 7

    def test_grads_reach_network_and_temperature(self):
        F, B, N, t = 4, 2, 8, 2
        sel = SparseLearnedEdge(input_size=F, deterministic=True,
                                num_edge_samples=1)
        params = sel.init(jax.random.PRNGKey(0))
        nodes = jax.random.normal(jax.random.PRNGKey(1), (B, N, F))

        def loss(p):
            grid, _ = sel(p, nodes, jnp.array([3, 4], jnp.int32),
                          jnp.array([2, 2], jnp.int32), t)
            return jnp.sum(grid * jnp.arange(N)[None, None, :])

        g = jax.grad(loss)(params)
        net_total = sum(float(jnp.abs(l).sum()) for l in
                        jax.tree_util.tree_leaves(g["edge_network"]))
        assert np.isfinite(net_total) and net_total > 0
        assert np.isfinite(float(g["tau"][0]))


class TestSparseGCMWithLearnedEdges:
    def test_end_to_end_with_learned_selector(self):
        F, B, N, T_len = 4, 2, 16, 5
        gnn = SparseGNN([GraphConv(F, F), jnp.tanh])
        model = SparseGCM(gnn, graph_size=N, max_edges=128,
                          edge_selectors=SparseLearnedEdge(
                              input_size=F, deterministic=True,
                              num_edge_samples=3))
        params = model.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T_len, F))
        taus = jnp.full((B,), T_len, jnp.int32)
        out, state, aux = model(params, xs, taus,
                                model.initial_state(B, F), return_aux=True)
        assert out.shape == (B, T_len, F)
        assert np.isfinite(np.array(out)).all()
        assert "temperature" in aux

        def loss(p):
            o, _ = model(p, xs, taus, model.initial_state(B, F))
            return jnp.sum(o ** 2)

        g = jax.grad(loss)(params)
        net_total = sum(float(jnp.abs(l).sum()) for l in
                        jax.tree_util.tree_leaves(g["edge_selectors"]))
        assert np.isfinite(net_total) and net_total > 0

    def test_chain_and_radius(self):
        F, B, N, T_len = 6, 2, 16, 4
        pos_slice = slice(0, 2)
        gnn = SparseGNN([GraphConv(F, F), jnp.tanh])
        chain = SparseEdgeChain([TemporalEdge([1]),
                                 SpatialRadiusEdge(pos_slice, radius=10.0)])
        model = SparseGCM(gnn, graph_size=N, max_edges=128,
                          edge_selectors=chain)
        params = model.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T_len, F)) * 0.1
        taus = jnp.full((B,), T_len, jnp.int32)
        out, state = model(params, xs, taus, model.initial_state(B, F))
        # radius 10 connects everything causal; plus temporal chain — dedup by
        # construction means edge count == causal pair count
        want = {(i, j) for i in range(1, T_len) for j in range(i)}
        assert edge_set(state.edges[0]) == want
        w = np.array(state.weights[0])[: len(want)]
        assert np.allclose(w, 1.0)  # weights normalized to exactly 1.0


class TestSparseOverflow:
    def test_overflow_drops_and_check_raises(self):
        F, B, N = 3, 1, 4
        gnn = SparseGNN([GraphConv(F, F)])
        model = SparseGCM(gnn, graph_size=N, max_edges=16,
                          edge_selectors=TemporalEdge([1]))
        params = model.init(jax.random.PRNGKey(0))
        xs = jnp.ones((B, 6, F))
        taus = jnp.full((B,), 6, jnp.int32)
        state = model.initial_state(B, F)
        import pytest

        with pytest.raises(Exception):
            model.check_overflow(state, taus)
        out, st2 = model(params, xs, taus, state)  # must not crash under jit
        assert np.isfinite(np.array(out)).all()


class TestFactoredScorer:
    def test_factored_equals_pair_grid(self):
        """The factored first-layer decomposition must equal the explicit
        (sink ‖ source) pair-grid MLP exactly (same params)."""
        F, B, N, t = 6, 2, 10, 3
        sel = SparseLearnedEdge(input_size=F, deterministic=True)
        params = sel.init(jax.random.PRNGKey(0))
        nodes = jax.random.normal(jax.random.PRNGKey(1), (B, N, F))
        T = jnp.array([2, 4], jnp.int32)
        taus = jnp.array([3, 2], jnp.int32)
        sink = jnp.clip(T[:, None] + jnp.arange(t)[None, :], 0, N - 1)
        sink_feats = jnp.take_along_axis(nodes, sink[..., None], axis=1)

        fast = sel._score_pairs(params["edge_network"], sink_feats, nodes)
        pair_in = jnp.concatenate(
            [jnp.broadcast_to(sink_feats[:, :, None, :], (B, t, N, F)),
             jnp.broadcast_to(nodes[:, None, :, :], (B, t, N, F))], axis=-1)
        slow = sel.edge_network(params["edge_network"], pair_in)[..., 0]
        assert np.allclose(np.array(fast), np.array(slow), atol=1e-5)


class TestCodecProperties:
    """Property-style randomized round trips for the packing and coalesce
    codecs (the reference pins these with enumerated cases,
    tests/test_sparse_gcm.py:74-304; here: 20 random graphs each)."""

    def test_pack_unpack_random_roundtrips(self):
        rng = np.random.default_rng(0)
        for trial in range(20):
            B = int(rng.integers(1, 4))
            N = int(rng.integers(4, 20))
            E = int(rng.integers(2, 16))
            st = sparse_initial_state(B, N, 4, max_edges=E)
            edges = np.full((B, 2, E), -1, np.int32)
            counts = rng.integers(0, E + 1, size=B)
            for b in range(B):
                for e in range(counts[b]):
                    edges[b, 0, e] = rng.integers(0, N)
                    edges[b, 1, e] = rng.integers(0, N)
            st = st._replace(edges=jnp.asarray(edges),
                             num_edges=jnp.asarray(counts, jnp.int32))
            packed = pack_hidden(st, max_edges=E)
            rt = unpack_hidden(packed, max_edges=E)
            for b in range(B):
                assert edge_set(rt.edges[b]) == edge_set(st.edges[b]), trial

    def test_coalesce_random_matches_numpy(self):
        rng = np.random.default_rng(1)
        for trial in range(20):
            N = int(rng.integers(3, 12))
            E = int(rng.integers(2, 24))
            count = int(rng.integers(0, E + 1))
            edges = np.full((1, 2, E), -1, np.int32)
            w = np.zeros((1, E), np.float32)
            for e in range(count):
                edges[0, 0, e] = rng.integers(0, N)
                edges[0, 1, e] = rng.integers(0, N)
                w[0, e] = rng.random() + 0.1
            e2, w2, n = coalesce_edges(jnp.asarray(edges), jnp.asarray(w),
                                       num_nodes=N, reduce="mean")
            # numpy oracle
            groups = {}
            for e in range(count):
                key = (edges[0, 0, e], edges[0, 1, e])
                groups.setdefault(key, []).append(w[0, e])
            want = {k: float(np.mean(v)) for k, v in groups.items()}
            got = {}
            for e in range(E):
                s, t = int(e2[0, 0, e]), int(e2[0, 1, e])
                if s >= 0:
                    got[(s, t)] = float(w2[0, e])
            assert int(n[0]) == len(want), trial
            assert set(got) == set(want), trial
            for k in want:
                assert abs(got[k] - want[k]) < 1e-5, (trial, k)


class TestSparsePositionalEncoder:
    def test_step_matches_whole_window_with_pe(self):
        """PE in the sparse core is applied to the GNN input every call
        (reference sparse_gcm.py:148-149); step-by-step must equal
        whole-window."""
        from gcm_tpu.models.positional import PositionalEncoding

        F, B, N, T_len = 6, 2, 12, 7
        gnn = SparseGNN([GraphConv(F, F), jnp.tanh])
        model = SparseGCM(gnn, graph_size=N, max_edges=64,
                          edge_selectors=TemporalEdge([1]),
                          positional_encoder=PositionalEncoding(
                              max_len=N, mode="add", feat_dim=F))
        params = model.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T_len, F))
        taus = jnp.full((B,), T_len, jnp.int32)
        whole, _ = model(params, xs, taus, model.initial_state(B, F))
        step, _ = model.scan(params, xs, model.initial_state(B, F))
        assert np.allclose(np.array(whole), np.array(step), atol=1e-5)


class TestSlotAggregation:
    """aggregation='slots' (degree-bounded sink-slot SpMM backend,
    ops/pallas/spmm_slots.py) must match the default aggregation exactly
    when slot_k covers the selector's structural degree bound."""

    def _models(self, hops, slot_k, N=128, F=8):
        from gcm_tpu.edges.sparse_temporal import TemporalEdge
        from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN

        def gnn():
            return SparseGNN([GraphConv(F, F), jnp.tanh,
                              GraphConv(F, F), jnp.tanh])
        base = SparseGCM(gnn(), graph_size=N, max_edges=4 * N,
                         edge_selectors=TemporalEdge(list(hops)))
        slots = SparseGCM(gnn(), graph_size=N, max_edges=4 * N,
                          edge_selectors=TemporalEdge(list(hops)),
                          aggregation="slots", slot_k=slot_k)
        return base, slots

    def test_matches_default_aggregation(self):
        base, slots = self._models((1, 2), slot_k=2)
        params = base.init(jax.random.PRNGKey(0))
        B, T, F = 2, 20, 8
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        taus = jnp.full((B,), T, jnp.int32)
        o1, s1 = base(params, xs, taus, base.initial_state(B, F))
        o2, s2 = slots(params, xs, taus, slots.initial_state(B, F))
        assert np.allclose(np.array(o1), np.array(o2), atol=1e-4), (
            np.abs(np.array(o1) - np.array(o2)).max())

    def test_gradients_match(self):
        base, slots = self._models((1,), slot_k=1)
        params = base.init(jax.random.PRNGKey(0))
        B, T, F = 2, 8, 8
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        taus = jnp.full((B,), T, jnp.int32)

        def loss(model, p):
            o, _ = model(p, xs, taus, model.initial_state(B, F))
            return jnp.sum(o ** 2)

        g1 = jax.grad(lambda p: loss(base, p))(params)
        g2 = jax.grad(lambda p: loss(slots, p))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-3)

    def test_config_validation(self):
        import pytest

        from gcm_tpu.edges.sparse_temporal import TemporalEdge
        from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN

        gnn = SparseGNN([GraphConv(4, 4)])
        with pytest.raises(AssertionError, match="slot_k"):
            SparseGCM(gnn, graph_size=128, max_edges=16,
                      edge_selectors=TemporalEdge([1]), aggregation="slots")
        with pytest.raises(AssertionError, match="128"):
            SparseGCM(gnn, graph_size=64, max_edges=16,
                      edge_selectors=TemporalEdge([1]),
                      aggregation="slots", slot_k=1)


class TestOverflowCounters:
    """In-band capacity-drop observability (VERDICT r2 weak #4): every edge
    silently dropped behind a static cap is counted in the aux dict, so a
    training run that starts dropping edges sees it in its logs instead of
    debugging returns."""

    def _run(self, max_edges, emit):
        F, B, N, T_len = 4, 2, 8, 6
        gnn = SparseGNN([GraphConv(F, F)])
        model = SparseGCM(gnn, graph_size=N, max_edges=max_edges,
                          edge_selectors=TemporalEdge([1]), emit=emit)
        params = model.init(jax.random.PRNGKey(0))
        xs = jnp.ones((B, T_len, F))
        taus = jnp.full((B,), T_len, jnp.int32)
        _, _, aux = model(params, xs, taus, model.initial_state(B, F),
                          return_aux=True)
        return aux

    def test_no_drop_counts_zero(self):
        for emit in (True, False):
            aux = self._run(max_edges=16, emit=emit)
            assert np.array(aux["dropped_edges"]).tolist() == [0, 0]

    def test_capacity_drop_counted_both_paths(self):
        # 5 temporal edges (sink > 0) into a 3-slot list -> 2 dropped,
        # identically on the emit and grid paths
        for emit in (True, False):
            aux = self._run(max_edges=3, emit=emit)
            assert np.array(aux["dropped_edges"]).tolist() == [2, 2], emit

    def test_slot_overflow_counted(self):
        F, B, N, T_len = 4, 1, 128, 10
        gnn = SparseGNN([GraphConv(F, F)])

        def run(slot_k):
            model = SparseGCM(gnn, graph_size=N, max_edges=64,
                              edge_selectors=TemporalEdge([1, 2]),
                              aggregation="slots", slot_k=slot_k)
            params = model.init(jax.random.PRNGKey(0))
            xs = jnp.ones((B, T_len, F))
            taus = jnp.full((B,), T_len, jnp.int32)
            _, _, aux = model(params, xs, taus, model.initial_state(B, F),
                              return_aux=True)
            return int(np.array(aux["slot_overflow"])[0])

        assert run(slot_k=2) == 0
        # hops {1,2} put 2 edges in one (sink, src-window) bucket: k=1 drops
        assert run(slot_k=1) > 0


class TestEmitOverride:
    """emit=True/False force the grid-free/grid paths; outputs and state are
    bitwise identical either way (the tested emit invariant, CLAUDE.md)."""

    def test_forced_paths_identical(self):
        F, B, N, T_len = 4, 2, 12, 6
        gnn = SparseGNN([GraphConv(F, F), jnp.tanh])
        mk = lambda emit: SparseGCM(gnn, graph_size=N, max_edges=64,
                                    edge_selectors=TemporalEdge([1, 3]),
                                    emit=emit)
        m_on, m_off = mk(True), mk(False)
        params = m_on.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T_len, F))
        taus = jnp.full((B,), T_len, jnp.int32)
        o1, s1 = m_on(params, xs, taus, m_on.initial_state(B, F))
        o2, s2 = m_off(params, xs, taus, m_off.initial_state(B, F))
        assert np.array_equal(np.array(o1), np.array(o2))
        for a, b in zip(s1, s2):
            assert np.array_equal(np.array(a), np.array(b))

    def test_emit_true_requires_support(self):
        import pytest

        from gcm_tpu.edges.sparse_spatial import SpatialRadiusEdge

        gnn = SparseGNN([GraphConv(4, 4)])
        with pytest.raises(AssertionError, match="grid-free"):
            SparseGCM(gnn, graph_size=8, max_edges=16,
                      edge_selectors=SpatialRadiusEdge(slice(0, 2),
                                                       radius=1.0),
                      emit=True)


class TestEmitEdgesFastPath:
    """TemporalEdge.emit_edges (grid-free) must produce BITWISE-identical
    state and outputs to the [B,t,N]-grid path."""

    class _GridOnly:
        """Wrap a selector, hiding emit_edges so the core takes the grid
        path."""

        def __init__(self, sel):
            self._sel = sel

        def init(self, key):
            return self._sel.init(key)

        def __call__(self, *a, **kw):
            return self._sel(*a, **kw)

    def _run(self, hops, dones=None, T_steps=14, N=16):
        from gcm_tpu.edges.sparse_temporal import TemporalEdge
        from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN

        B, F = 2, 5
        outs = []
        for wrap in (False, True):
            sel = TemporalEdge(list(hops))
            if wrap:
                sel = self._GridOnly(sel)
            gnn = SparseGNN([GraphConv(F, F), jnp.tanh])
            m = SparseGCM(gnn, graph_size=N, max_edges=4 * N,
                          edge_selectors=sel)
            params = m.init(jax.random.PRNGKey(0))
            xs = jax.random.normal(jax.random.PRNGKey(1), (B, T_steps, F))
            taus = jnp.full((B,), T_steps, jnp.int32)
            o, st = m(params, xs, taus, m.initial_state(B, F), dones=dones)
            outs.append((o, st))
        return outs

    def test_bitwise_identical_to_grid_path(self):
        (o1, s1), (o2, s2) = self._run((1, 3))
        assert np.array_equal(np.array(o1), np.array(o2))
        assert np.array_equal(np.array(s1.edges), np.array(s2.edges))
        assert np.array_equal(np.array(s1.weights), np.array(s2.weights))
        assert np.array_equal(np.array(s1.num_edges), np.array(s2.num_edges))

    def test_identical_with_mid_window_dones(self):
        B, T_steps = 2, 14
        dones = jnp.zeros((B, T_steps), bool).at[:, 5].set(True)
        (o1, s1), (o2, s2) = self._run((1, 2), dones=dones)
        assert np.array_equal(np.array(o1), np.array(o2))
        assert np.array_equal(np.array(s1.edges), np.array(s2.edges))


class TestLearnedEmitFastPath:
    """Windowed sparse LearnedEdge emit_edges (window-space scoring) must
    match the [B,t,N]-grid path: same candidates, same MLP, same masked
    softmax -> same kept edges and (weight-normalized) outputs."""

    def _models(self, deterministic=True, window=6, N=128):
        # N must clear the emit_profitable gate (N >= 4*(window+t))
        # or the "emit" model silently takes the grid path too
        from gcm_tpu.edges.sparse_learned import LearnedEdge as SLE
        from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN

        F = 5

        class GridOnly:
            def __init__(self, sel):
                self._sel = sel
                self.supports_emit = False

            def init(self, key):
                return self._sel.init(key)

            def __call__(self, *a, **kw):
                return self._sel(*a, **kw)

        def mk(wrap):
            sel = SLE(input_size=F, deterministic=deterministic,
                      window=window, num_edge_samples=3)
            if wrap:
                sel = GridOnly(sel)
            gnn = SparseGNN([GraphConv(F, F), jnp.tanh])
            return SparseGCM(gnn, graph_size=N, max_edges=8 * N,
                             edge_selectors=sel)
        return mk(True), mk(False), F

    def test_deterministic_matches_grid_path(self):
        grid_m, emit_m, F = self._models()
        params = grid_m.init(jax.random.PRNGKey(0))
        B, T_steps = 2, 16
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T_steps, F))
        taus = jnp.full((B,), T_steps, jnp.int32)
        o1, s1 = grid_m(params, xs, taus, grid_m.initial_state(B, F))
        o2, s2 = emit_m(params, xs, taus, emit_m.initial_state(B, F))
        assert np.array_equal(np.array(s1.edges), np.array(s2.edges)), (
            "edge sets diverged between grid and window-space scoring")
        assert np.allclose(np.array(o1), np.array(o2), atol=1e-5)

    def test_deterministic_matches_with_dones(self):
        grid_m, emit_m, F = self._models()
        B, T_steps = 2, 12
        dones = jnp.zeros((B, T_steps), bool).at[:, 4].set(True)
        params = grid_m.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T_steps, F))
        taus = jnp.full((B,), T_steps, jnp.int32)
        o1, s1 = grid_m(params, xs, taus, grid_m.initial_state(B, F),
                        dones=dones)
        o2, s2 = emit_m(params, xs, taus, emit_m.initial_state(B, F),
                        dones=dones)
        assert np.array_equal(np.array(s1.edges), np.array(s2.edges))
        assert np.allclose(np.array(o1), np.array(o2), atol=1e-5)

    def test_stochastic_valid_and_reproducible(self):
        grid_m, emit_m, F = self._models(deterministic=False)
        params = emit_m.init(jax.random.PRNGKey(0))
        B, T_steps = 2, 10
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T_steps, F))
        taus = jnp.full((B,), T_steps, jnp.int32)
        key = jax.random.PRNGKey(5)
        o1, s1 = emit_m(params, xs, taus, emit_m.initial_state(B, F),
                        key=key)
        o2, s2 = emit_m(params, xs, taus, emit_m.initial_state(B, F),
                        key=key)
        assert np.array_equal(np.array(s1.edges), np.array(s2.edges))
        # causality + window bound hold on every emitted edge
        e = np.array(s1.edges)
        valid = e[:, 0] >= 0
        assert (e[:, 1][valid] < e[:, 0][valid]).all()
        assert np.isfinite(np.array(o1)).all()

    def test_unwindowed_keeps_grid_path(self):
        from gcm_tpu.edges.sparse_learned import LearnedEdge as SLE

        sel = SLE(input_size=4, window=None)
        assert not sel.supports_emit
