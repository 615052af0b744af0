"""DenseGCM behavioral-contract tests.

Mirrors the reference suite tests/test_gcm.py: batch-selective wraparound
(:113-184), message direction (:202-240), e2e accumulation with identity
self+neighbor convs (:259-323), new-obs placement (:375-403), gradient flow
(:355-365), plus scan-vs-step equivalence (the lax.scan replacement for the
Ray adapter's Python loop, ray_gcm.py:200-202)."""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.core.graph_state import DenseGraphState, dense_wrap_overflow
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv


def identity_gnn(f, layers=2, rel=1.0, root=1.0, act=jax.nn.relu):
    mods = []
    params = []
    for _ in range(layers):
        mods += [DenseGraphConv(f, f), act]
        params += [
            {
                "lin_rel": {"kernel": jnp.eye(f) * rel, "bias": jnp.zeros(f)},
                "lin_root": {"kernel": jnp.eye(f) * root},
            },
            {},
        ]
    return DenseGNN(mods), params


class TestWrapOverflow:
    """Mirror of tests/test_gcm.py:88-184: batch 0 (no overflow) untouched,
    batch 1 (full) shifted by one with the oldest node evicted."""

    def setup_method(self):
        feats, batches, N = 5, 2, 7
        self.N, self.F = N, feats
        gnn, gnn_params = identity_gnn(feats, layers=1)
        self.model = DenseGCM(gnn, graph_size=N)
        self.params = {"gnn": gnn_params}
        self.nodes = jnp.arange(batches * N * feats, dtype=jnp.float32).reshape(
            batches, N, feats
        )
        self.obs = jnp.ones((batches, feats)) * 5
        self.adj = jnp.zeros((batches, N, N))
        self.weights = jnp.ones((batches, N, N))
        self.num_nodes = jnp.array([1, 7], jnp.int32)

    def test_wrap_overflow(self):
        nodes = self.nodes.at[:, 0].set(0)
        adj = self.adj.at[:, 0, :].set(1).at[:, :, 0].set(1)
        weights = self.weights.at[:, 0, :].set(5).at[:, :, 0].set(5)

        _, (nodes, adj, weights, num_nodes) = self.model(
            self.params, self.obs,
            DenseGraphState(nodes, adj, weights, self.num_nodes),
        )

        desired_adj = np.zeros((2, self.N, self.N), np.float32)
        desired_adj[0, 0, :] = 1
        desired_adj[0, :, 0] = 1
        assert np.array_equal(np.array(adj), desired_adj)

        desired_w = np.ones((2, self.N, self.N), np.float32)
        desired_w[0, 0, :] = 5
        desired_w[0, :, 0] = 5
        desired_w[1, -1, :] = 0
        desired_w[1, :, -1] = 0
        assert np.array_equal(np.array(weights), desired_w)

        # batch 0: obs inserted at row 1, row 0 still zeroed
        want0 = np.array(self.nodes[0].at[0].set(0))
        want0[1] = 5
        assert np.array_equal(np.array(nodes[0]), want0)
        # batch 1: shifted by one, oldest (row 0, which was zeroed) evicted
        assert np.array_equal(np.array(nodes[1, 0]), np.arange(8 * 5, 9 * 5))
        assert np.array_equal(np.array(nodes[1, -1]), 5 * np.ones(5))
        assert np.array_equal(np.array(num_nodes), [2, 7])

    def test_wrap_overflow_no_weights(self):
        nodes = self.nodes.at[:, 0].set(0)
        adj = self.adj.at[:, 0, :].set(1).at[:, :, 0].set(1)
        weights = jnp.zeros((0,))
        _, (nodes, adj, weights, num_nodes) = self.model(
            self.params, self.obs,
            DenseGraphState(nodes, adj, weights, self.num_nodes),
        )
        desired_adj = np.zeros((2, self.N, self.N), np.float32)
        desired_adj[0, 0, :] = 1
        desired_adj[0, :, 0] = 1
        assert np.array_equal(np.array(adj), desired_adj)
        assert weights.size == 0

    def test_wrap_is_noop_when_not_full(self):
        st = DenseGraphState(self.nodes, self.adj, self.weights,
                             jnp.array([2, 3], jnp.int32))
        out = dense_wrap_overflow(st)
        for a, b in zip(st, out):
            assert np.array_equal(np.array(a), np.array(b))


class TestDirection:
    def test_message_flows_source_to_sink(self):
        """adj[0, 3] = 1 conveys node 3 -> node 0 (tests/test_gcm.py:226-240)."""
        feats, N = 11, 10
        gnn, gnn_params = identity_gnn(feats, layers=1, rel=1.0, root=0.0)
        model = DenseGCM(gnn, graph_size=N)
        params = {"gnn": gnn_params}
        nodes = jnp.arange(N * feats, dtype=jnp.float32).reshape(1, N, feats)
        adj = jnp.zeros((1, N, N)).at[:, 0, 3].set(1)
        out, _ = model(
            params, jnp.ones((1, feats)),
            DenseGraphState(nodes, adj, jnp.ones((1, N, N)),
                            jnp.zeros((1,), jnp.int32)),
        )
        # output read at row 0 (num_nodes=0) = neighbor row 3 of the
        # pre-insert nodes... but row 0 was overwritten by the obs; the obs
        # contributes via lin_root=0, so out == nodes[3]
        assert np.allclose(np.array(out[0]), np.arange(3 * 11, 4 * 11))


class TestE2E:
    """Mirror of tests/test_gcm.py:242-323: identity self+neighbor conv with
    no edges returns the observation itself each step."""

    def setup_method(self):
        feats, batches, N = 11, 5, 10
        self.feats, self.B, self.N = feats, batches, N
        gnn, gnn_params = identity_gnn(feats, layers=2, rel=1.0, root=1.0)
        self.model = DenseGCM(gnn, graph_size=N)
        self.params = {"gnn": gnn_params}
        self.state = self.model.initial_state(batches, feats)

    def test_e2e_accumulation(self):
        state = self.state
        for k in (1.0, 2.0, 3.0):
            obs = k * jnp.ones((self.B, self.feats))
            out, state = self.model(self.params, obs, state)
            assert np.allclose(np.array(out), k), f"step {k}"
        # nodes hold raw observations
        assert np.allclose(np.array(state.nodes[:, 0]), 1.0)
        assert np.allclose(np.array(state.nodes[:, 1]), 2.0)
        assert np.allclose(np.array(state.nodes[:, 2]), 3.0)
        assert np.array_equal(np.array(state.num_nodes), [3] * self.B)

    def test_new_obs_placement(self):
        """Mirrors tests/test_gcm.py:375-403."""
        state = self.state
        obs = jnp.arange(self.B * self.feats, dtype=jnp.float32).reshape(
            self.B, self.feats
        )
        _, state = self.model(self.params, obs, state)
        assert np.allclose(np.array(state.nodes[:, 0]), np.array(obs))

    def test_scan_matches_step_loop(self):
        T = 7
        xs = jax.random.normal(jax.random.PRNGKey(0), (self.B, T, self.feats))
        outs_scan, final_scan = self.model.scan(self.params, xs, self.state)
        state = self.state
        outs = []
        for t in range(T):
            o, state = self.model(self.params, xs[:, t], state)
            outs.append(o)
        outs = jnp.stack(outs, axis=1)
        assert np.allclose(np.array(outs_scan), np.array(outs), atol=1e-5)
        assert np.allclose(np.array(final_scan.nodes), np.array(state.nodes),
                           atol=1e-6)

    def test_scan_wraps_past_capacity(self):
        T = self.N + 5  # overflow the ring buffer
        xs = jnp.stack(
            [jnp.full((self.B, self.feats), 1.0 + t) for t in range(T)], axis=1
        )
        outs, final = self.model.scan(self.params, xs, self.state)
        assert np.array_equal(np.array(final.num_nodes), [self.N] * self.B)
        # oldest nodes evicted: first row is obs from step T - N
        assert np.allclose(np.array(final.nodes[:, 0]), float(T - self.N + 1))
        assert np.allclose(np.array(final.nodes[:, -1]), float(T))


class TestGradFlow:
    def test_grads_reach_gnn_params(self):
        """jax.grad analog of the reference's torchviz/canary gradient checks
        (tests/test_gcm.py:355-365)."""
        feats, B, N = 8, 3, 6
        gnn = DenseGNN([DenseGraphConv(feats, feats), jnp.tanh,
                        DenseGraphConv(feats, feats), jnp.tanh])
        model = DenseGCM(gnn, graph_size=N,
                         edge_selectors=TemporalBackedge([1]))
        key = jax.random.PRNGKey(0)
        params = model.init(key)
        xs = jax.random.normal(key, (B, 5, feats))

        def loss(p):
            outs, _ = model.scan(p, xs, model.initial_state(B, feats))
            return jnp.sum(outs ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g["gnn"])
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert np.isfinite(total) and total > 0

    def test_learning_decreases_loss(self):
        """20 gradient steps shrink a regression loss
        (mirrors tests/test_gcm.py:412-439)."""
        import optax

        feats, B, N, T = 4, 2, 8, 6
        gnn = DenseGNN([DenseGraphConv(feats, feats), jnp.tanh])
        model = DenseGCM(gnn, graph_size=N,
                         edge_selectors=TemporalBackedge([1]))
        params = model.init(jax.random.PRNGKey(1))
        xs = jax.random.normal(jax.random.PRNGKey(2), (B, T, feats))
        tgt = jax.random.normal(jax.random.PRNGKey(3), (B, T, feats))

        def loss(p):
            outs, _ = model.scan(p, xs, model.initial_state(B, feats))
            return jnp.mean((outs - tgt) ** 2)

        opt = optax.adam(5e-3)
        opt_state = opt.init(params)
        l0 = float(loss(params))
        step = jax.jit(lambda p, s: (lambda g: opt.update(g, s, p))(
            jax.grad(loss)(p)))
        for _ in range(20):
            updates, opt_state = step(params, opt_state)
            params = optax.apply_updates(params, updates)
        assert float(loss(params)) < l0


class TestJit:
    def test_step_jits(self):
        feats, B, N = 8, 4, 16
        gnn, gnn_params = identity_gnn(feats, layers=2)
        model = DenseGCM(gnn, graph_size=N, edge_selectors=TemporalBackedge([1]))
        params = {"gnn": gnn_params, "edge_selectors": {}}
        state = model.initial_state(B, feats)
        stepf = jax.jit(lambda p, x, s: model(p, x, s))
        x = jnp.ones((B, feats))
        out1, state = stepf(params, x, state)
        out2, state = stepf(params, 2 * x, state)
        assert out1.shape == (B, feats)
        # identity 2-layer self+neighbor conv with edge 1<-0:
        # layer1: h0 = 1, h1 = 1 + 2 = 3; layer2: g1 = h0 + h1 = 4
        assert np.allclose(np.array(out2), 4.0)


class TestScanRemat:
    def test_remat_outputs_and_grads_match(self):
        """scan(remat=True) must be gradient-exact vs the plain scan (the
        checkpoint only changes the backward schedule, never values)."""
        from gcm_tpu.models.presets import readme_dense_gcm

        m = readme_dense_gcm(obs_size=4, hidden=8, graph_size=8)
        p = m.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 4))

        def loss(p, remat):
            o, _ = m.scan(p, xs, m.initial_state(2, 4), remat=remat)
            return jnp.sum(o ** 2)

        o0, _ = m.scan(p, xs, m.initial_state(2, 4))
        o1, _ = m.scan(p, xs, m.initial_state(2, 4), remat=True)
        assert np.array_equal(np.array(o0), np.array(o1))
        g0 = jax.grad(lambda p: loss(p, False))(p)
        g1 = jax.grad(lambda p: loss(p, True))(p)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-5)


class TestFusedDenseStep:
    """config.DENSE_FUSED_STEP composes wraparound + insert + selector
    writes into one select per array; it must be BITWISE identical to the
    unfused step for every supported selector, through wraparound,
    including the full state."""

    def _pair(self, selector_fn, B=3, N=6, F=5, T=20, seed=0, **kw):
        from gcm_tpu import config
        from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv

        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                        DenseGraphConv(F, F), jnp.tanh])
        model = DenseGCM(gnn, edge_selectors=selector_fn(), graph_size=N,
                         **kw)
        params = model.init(jax.random.PRNGKey(seed))
        xs = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, T, F))
        prev = config.DENSE_FUSED_STEP
        try:
            config.DENSE_FUSED_STEP = False
            o_u, f_u = model.scan(params, xs, model.initial_state(B, F))
            config.DENSE_FUSED_STEP = True
            o_f, f_f = model.scan(params, xs, model.initial_state(B, F))
        finally:
            config.DENSE_FUSED_STEP = prev
        np.testing.assert_array_equal(np.asarray(o_u), np.asarray(o_f))
        for a, b in zip(f_u, f_f):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_temporal(self):
        from gcm_tpu.edges.temporal import TemporalBackedge

        self._pair(lambda: TemporalBackedge([1]))

    def test_temporal_multihop_both(self):
        from gcm_tpu.edges.temporal import TemporalBackedge

        self._pair(lambda: TemporalBackedge([1, 3], direction="both"))

    def test_temporal_learned(self):
        from gcm_tpu.edges.temporal import TemporalBackedge

        self._pair(lambda: TemporalBackedge([1], learned=True,
                                            learning_window=5,
                                            deterministic=True), N=6, T=15)

    def test_dense_edge(self):
        from gcm_tpu.edges.dense import DenseEdge

        self._pair(DenseEdge)

    def test_euclidean_windowed(self):
        from gcm_tpu.edges.distance import EuclideanEdge

        self._pair(lambda: EuclideanEdge(max_distance=2.0, window=3))

    def test_spatial_bidirectional(self):
        from gcm_tpu.edges.distance import SpatialEdge

        class BiSpatial(SpatialEdge):
            def __init__(self):
                super().__init__(1.0, slice(0, 2))
                self.bidirectional = True

        self._pair(BiSpatial)

    def test_learned_deterministic(self):
        from gcm_tpu.edges.learned import LearnedEdge

        self._pair(lambda: LearnedEdge(input_size=5, deterministic=True))

    def test_chain(self):
        from gcm_tpu.edges.chain import EdgeChain
        from gcm_tpu.edges.distance import EuclideanEdge
        from gcm_tpu.edges.temporal import TemporalBackedge

        self._pair(lambda: EdgeChain([TemporalBackedge([1]),
                                      EuclideanEdge(2.0)]))

    def test_edge_weights_state(self):
        from gcm_tpu.edges.temporal import TemporalBackedge

        self._pair(lambda: TemporalBackedge([1]), edge_weights=True)

    def test_no_selector(self):
        self._pair(lambda: None)

    def test_unsupported_selector_falls_back(self):
        """A custom selector keeps the unfused path (no error)."""
        from gcm_tpu import config
        from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv

        class Custom:
            def init(self, key):
                return {}

            def __call__(self, params, nodes, adj, weights, num_nodes,
                         key=None):
                return adj, weights

        gnn = DenseGNN([DenseGraphConv(4, 4)])
        model = DenseGCM(gnn, edge_selectors=Custom(), graph_size=4)
        params = model.init(jax.random.PRNGKey(0))
        prev = config.DENSE_FUSED_STEP
        try:
            config.DENSE_FUSED_STEP = True
            out, _ = model(params, jnp.ones((2, 4)),
                           model.initial_state(2, 4))
        finally:
            config.DENSE_FUSED_STEP = prev
        assert out.shape == (2, 4)
