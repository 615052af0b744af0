"""Dense edge-selector behavioral tests.

Mirrors the reference's literal-adjacency expectations: TemporalBackedge hops
(tests/test_gcm.py:595-617), DenseEdge (:784-801), Euclidean/Cosine/Spatial
zero/one-distance cases (:690-760, :1111-1160), LearnedEdge candidate masking,
and selector chaining (:646-659)."""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.edges.chain import EdgeChain
from gcm_tpu.edges.dense import DenseEdge
from gcm_tpu.edges.distance import CosineEdge, EuclideanEdge, SpatialEdge
from gcm_tpu.edges.learned import LearnedEdge
from gcm_tpu.edges.temporal import TemporalBackedge


def blank(B, N, F=3):
    nodes = jnp.zeros((B, N, F))
    adj = jnp.zeros((B, N, N))
    weights = jnp.ones((B, N, N))
    return nodes, adj, weights


class TestTemporalBackedge:
    def test_single_hop(self):
        nodes, adj, w = blank(2, 6)
        sel = TemporalBackedge([1])
        adj, _ = sel({}, nodes, adj, w, jnp.array([0, 3]))
        want = np.zeros((2, 6, 6), np.float32)
        want[1, 3, 2] = 1  # batch 0 has no past node -> no edge
        assert np.array_equal(np.array(adj), want)

    def test_multi_hop(self):
        nodes, adj, w = blank(1, 8)
        sel = TemporalBackedge([2, 5])
        adj, _ = sel({}, nodes, adj, w, jnp.array([6]))
        want = np.zeros((1, 8, 8), np.float32)
        want[0, 6, 4] = 1
        want[0, 6, 1] = 1
        assert np.array_equal(np.array(adj), want)

    def test_hop_exceeds_history(self):
        nodes, adj, w = blank(1, 8)
        sel = TemporalBackedge([5])
        adj, _ = sel({}, nodes, adj, w, jnp.array([3]))
        assert np.array(adj).sum() == 0

    def test_directions(self):
        nodes, adj, w = blank(1, 4)
        fwd, _ = TemporalBackedge([1], direction="forward")(
            {}, nodes, adj, w, jnp.array([2]))
        bwd, _ = TemporalBackedge([1], direction="backward")(
            {}, nodes, adj, w, jnp.array([2]))
        both, _ = TemporalBackedge([1], direction="both")(
            {}, nodes, adj, w, jnp.array([2]))
        assert np.array(fwd)[0, 2, 1] == 1 and np.array(fwd).sum() == 1
        assert np.array(bwd)[0, 1, 2] == 1 and np.array(bwd).sum() == 1
        assert np.array(both).sum() == 2

    def test_learned_deterministic(self):
        sel = TemporalBackedge([1], learned=True, learning_window=5,
                               deterministic=True)
        params = sel.init(jax.random.PRNGKey(0))
        nodes, adj, w = blank(2, 8)
        adj2, _ = sel(params, nodes, adj, w, jnp.array([0, 4]))
        a = np.array(adj2)
        assert a[0].sum() == 0  # no past nodes
        # mask placed on row num_nodes, cols < min(num_nodes, window)
        assert a[1, 4, :4].sum() > 0
        assert a[1, 4, 4:].sum() == 0

    def test_learned_grad(self):
        sel = TemporalBackedge([1], learned=True, learning_window=5,
                               deterministic=True)
        params = sel.init(jax.random.PRNGKey(0))
        nodes, adj, w = blank(1, 8)

        def loss(p):
            a, _ = sel(p, nodes, adj, w, jnp.array([4]))
            return jnp.sum(a * jnp.arange(8.0)[None, None, :])

        g = jax.grad(loss)(params)
        assert np.abs(np.array(g["window"])).sum() > 0


class TestDenseEdge:
    def test_full_past_connection(self):
        """Mirrors tests/test_gcm.py:784-801."""
        nodes, adj, w = blank(2, 5)
        adj, _ = DenseEdge()({}, nodes, adj, w, jnp.array([0, 3]))
        a = np.array(adj)
        # batch 0: only the self edge at [0,0]
        want0 = np.zeros((5, 5), np.float32)
        want0[0, 0] = 1
        assert np.array_equal(a[0], want0)
        # batch 1: row 3 cols 0..3, col 3 rows 0..2
        want1 = np.zeros((5, 5), np.float32)
        want1[3, :4] = 1
        want1[:3, 3] = 1
        assert np.array_equal(a[1], want1)


class TestDistanceEdges:
    def test_euclidean_zero_dist(self):
        """All-zero obs and nodes: every past node within distance 1
        (mirrors tests/test_gcm.py:708-717: edge from current row to node 0)."""
        B, N, F = 5, 10, 11
        nodes = jnp.zeros((B, N, F))
        adj = jnp.zeros((B, N, N))
        sel = EuclideanEdge(max_distance=1)
        adj, _ = sel({}, nodes, adj, jnp.ones((B, N, N)), jnp.ones((B,), jnp.int32))
        want = np.zeros((B, N, N), np.float32)
        want[:, 1, 0] = 1
        assert np.array_equal(np.array(adj), want)

    def test_euclidean_one_dist(self):
        """Current node all-ones vs zero nodes: distance sqrt(F) > 1, no edges
        (mirrors tests/test_gcm.py:719-729)."""
        B, N, F = 5, 10, 11
        nodes = jnp.zeros((B, N, F)).at[:, 1].set(1.0)  # current node = ones
        adj = jnp.zeros((B, N, N))
        sel = EuclideanEdge(max_distance=1)
        adj, _ = sel({}, nodes, adj, jnp.ones((B, N, N)), jnp.ones((B,), jnp.int32))
        assert np.array(adj).sum() == 0

    def test_learned_scaling_param(self):
        sel = EuclideanEdge(max_distance=2.5, learned=True)
        params = sel.init(jax.random.PRNGKey(0))
        assert np.allclose(np.array(params["dist_param"]), 2.5)
        assert sel.max_distance == 1.0

        nodes = jnp.zeros((1, 4, 3)).at[:, 0].set(10.0).at[:, 1].set(0.0)

        def loss(p):
            adj, _ = sel(p, nodes, jnp.zeros((1, 4, 4)), jnp.ones((1, 4, 4)),
                         jnp.ones((1,), jnp.int32))
            return jnp.sum(adj)

        g = jax.grad(loss)(params)
        assert np.isfinite(np.array(g["dist_param"])).all()

    def test_cosine(self):
        B, N, F = 2, 6, 4
        nodes = jnp.zeros((B, N, F))
        nodes = nodes.at[:, 0].set(jnp.array([1.0, 0, 0, 0]))
        nodes = nodes.at[:, 1].set(jnp.array([1.0, 0, 0, 0]))  # identical dir
        nodes = nodes.at[:, 2].set(jnp.array([1.0, 0, 0, 0]))  # current
        sel = CosineEdge(max_distance=0.5)  # sim < 0.5 required
        adj, _ = sel({}, nodes, jnp.zeros((B, N, N)), jnp.ones((B, N, N)),
                     jnp.full((B,), 2, jnp.int32))
        # nodes 0,1 have cos sim 1.0 with current -> NOT < 0.5 -> no edge
        assert np.array(adj).sum() == 0
        sel2 = CosineEdge(max_distance=1.5)  # everything connects
        adj2, _ = sel2({}, nodes, jnp.zeros((B, N, N)), jnp.ones((B, N, N)),
                       jnp.full((B,), 2, jnp.int32))
        a = np.array(adj2)
        assert (a[:, 2, :2] == 1).all()

    def test_spatial_slice(self):
        """Mirrors TestSpatialEdge.test_zero_dist (tests/test_gcm.py:1111-1147):
        only nodes whose pose slice matches the current pose get an edge."""
        B, N, F = 5, 10, 11
        sl = slice(0, 2)
        nodes = jnp.ones((B, N, F))
        nodes = nodes.at[:, 0:2, sl].set(0.0)
        obs_row = jnp.zeros((B, F))  # current obs: pose (0, 0)
        num_nodes = jnp.ones((B,), jnp.int32)
        nodes = nodes.at[jnp.arange(B), num_nodes].set(obs_row)
        sel = SpatialEdge(1.0, sl)
        adj, _ = sel({}, nodes, jnp.zeros((B, N, N)), jnp.ones((B, N, N)),
                     num_nodes)
        want = np.zeros((B, N, N), np.float32)
        want[:, 1, 0] = 1  # node 0 pose (0,0) matches; nodes >= num_nodes excluded
        assert np.array_equal(np.array(adj), want)


class TestLearnedEdge:
    def test_deterministic_masks_future(self):
        F, B, N = 6, 3, 8
        sel = LearnedEdge(input_size=F, deterministic=True)
        params = sel.init(jax.random.PRNGKey(0))
        nodes = jax.random.normal(jax.random.PRNGKey(1), (B, N, F))
        num_nodes = jnp.array([0, 2, 5], jnp.int32)
        adj, _ = sel(params, nodes, jnp.zeros((B, N, N)), jnp.ones((B, N, N)),
                     num_nodes)
        a = np.array(adj)
        assert a[0].sum() == 0  # no past nodes
        # edges only on row num_nodes, cols < num_nodes
        assert a[1, 2, 2:].sum() == 0
        assert np.delete(a[1], 2, axis=0).sum() == 0
        assert a[2, 5, 5:].sum() == 0
        assert a[1, 2, :2].sum() >= 1  # spardmax selects at least one

    def test_stochastic_runs_with_key(self):
        F, B, N = 4, 2, 6
        sel = LearnedEdge(input_size=F, deterministic=False, num_edge_samples=3)
        params = sel.init(jax.random.PRNGKey(0))
        nodes = jax.random.normal(jax.random.PRNGKey(1), (B, N, F))
        adj, _ = sel(params, nodes, jnp.zeros((B, N, N)), jnp.ones((B, N, N)),
                     jnp.array([3, 4], jnp.int32), key=jax.random.PRNGKey(2))
        a = np.array(adj)
        assert set(np.unique(a)) <= {0.0, 1.0}
        # edges live only on row num_nodes and past columns
        assert np.delete(a[0], 3, axis=0).sum() == 0
        assert a[0, 3, 3:].sum() == 0

    def test_grads_reach_edge_network(self):
        F, B, N = 4, 2, 6
        sel = LearnedEdge(input_size=F, deterministic=True)
        params = sel.init(jax.random.PRNGKey(0))
        nodes = jax.random.normal(jax.random.PRNGKey(1), (B, N, F))

        def loss(p):
            adj, _ = sel(p, nodes, jnp.zeros((B, N, N)), jnp.ones((B, N, N)),
                         jnp.array([4, 5], jnp.int32))
            return jnp.sum(adj * jax.random.normal(jax.random.PRNGKey(2),
                                                   (B, N, N)))

        g = jax.grad(loss)(params)
        total = sum(float(jnp.abs(l).sum())
                    for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0

    def test_preserves_existing_edges(self):
        F, B, N = 4, 1, 5
        sel = LearnedEdge(input_size=F, deterministic=True)
        params = sel.init(jax.random.PRNGKey(0))
        nodes = jax.random.normal(jax.random.PRNGKey(1), (B, N, F))
        adj0 = jnp.zeros((B, N, N)).at[0, 3, 1].set(1.0)
        adj, _ = sel(params, nodes, adj0, jnp.ones((B, N, N)),
                     jnp.array([3], jnp.int32))
        assert np.array(adj)[0, 3, 1] == 1.0  # STE(edges + old) keeps the 1


class TestChain:
    def test_chained_selectors(self):
        """Mirrors tests/test_gcm.py:646-659: chaining temporal hops."""
        nodes, adj, w = blank(1, 8)
        chain = EdgeChain([TemporalBackedge([1]), TemporalBackedge([3])])
        params = chain.init(jax.random.PRNGKey(0))
        adj, _ = chain(params, nodes, adj, w, jnp.array([5]))
        a = np.array(adj)
        assert a[0, 5, 4] == 1 and a[0, 5, 2] == 1 and a.sum() == 2


class TestLearnedTemporalStochastic:
    def test_gumbel_branch_with_key(self):
        """The stochastic learned-window branch (reference temporal.py:58-66:
        num_samples gumbel draws OR-ed together)."""
        sel = TemporalBackedge([1], learned=True, learning_window=5,
                               deterministic=False, num_samples=3)
        params = sel.init(jax.random.PRNGKey(0))
        nodes, adj, w = blank(2, 8)
        adj2, _ = sel(params, nodes, adj, w, jnp.array([0, 4]),
                      key=jax.random.PRNGKey(7))
        a = np.array(adj2)
        assert a[0].sum() == 0  # no past nodes
        assert a[1, 4, :4].sum() >= 1  # at least one sampled edge
        assert a[1, 4, 4:].sum() == 0
        assert np.delete(a[1], 4, axis=0).sum() == 0

    def test_gumbel_branch_grads(self):
        sel = TemporalBackedge([1], learned=True, learning_window=5,
                               deterministic=False, num_samples=2)
        params = sel.init(jax.random.PRNGKey(0))
        nodes, adj, w = blank(1, 8)

        def loss(p):
            a, _ = sel(p, nodes, adj, w, jnp.array([4]),
                       key=jax.random.PRNGKey(1))
            return jnp.sum(a * jnp.arange(8.0)[None, None, :])

        g = jax.grad(loss)(params)
        assert np.isfinite(np.array(g["window"])).all()
        assert np.abs(np.array(g["window"])).sum() > 0


class TestStochasticInvariants:
    """Distributional invariants of the stochastic selector paths (driven on
    TPU in round 2; pinned here as CPU tests): key-reproducibility,
    key-sensitivity, and the num_edge_samples edge budget."""

    def _run(self, key, num_edge_samples=3):
        from gcm_tpu.edges.learned import LearnedEdge
        from gcm_tpu.models.dense_gcm import DenseGCM
        from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv

        F, N, B, T = 6, 12, 3, 9
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh])
        m = DenseGCM(gnn, graph_size=N,
                     edge_selectors=LearnedEdge(
                         input_size=F, deterministic=False,
                         num_edge_samples=num_edge_samples))
        params = m.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        outs, state = m.scan(params, xs, m.initial_state(B, F), key=key)
        return np.array(outs), np.array(state.adj)

    def test_fixed_key_reproducible(self):
        o1, a1 = self._run(jax.random.PRNGKey(7))
        o2, a2 = self._run(jax.random.PRNGKey(7))
        assert np.array_equal(o1, o2) and np.array_equal(a1, a2)

    def test_key_sensitivity(self):
        o1, a1 = self._run(jax.random.PRNGKey(7))
        o2, a2 = self._run(jax.random.PRNGKey(8))
        assert not np.array_equal(a1, a2)

    def test_learned_window_budget(self):
        """Learned TemporalBackedge: at most learning_window backedges per
        step are sampleable (the window parameter bounds the support)."""
        from gcm_tpu.models.dense_gcm import DenseGCM
        from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv

        F, N, B, T, W_ = 4, 10, 2, 8, 3
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh])
        m = DenseGCM(gnn, graph_size=N,
                     edge_selectors=TemporalBackedge(
                         [1], learned=True, learning_window=W_,
                         num_samples=2))
        params = m.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        _, state = m.scan(params, xs, m.initial_state(B, F),
                          key=jax.random.PRNGKey(2))
        adj = np.array(state.adj)
        # the learned mask scores window params over ABSOLUTE slots
        # [0, min(num_nodes, W)) — the reference writes
        # adj[b][num_nodes][:num_nodes] += mask with a W-sized param vector
        # (temporal.py:51-70), so no edge can have a source column >= W
        assert (adj[:, :, W_:] == 0).all()
        assert adj.sum() > 0  # and the sampler does write edges
