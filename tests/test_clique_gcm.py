"""CliqueGCM ↔ DenseGCM(DenseEdge) belief parity + scan-free window parity.

The clique core's contract: EXACT DenseGCM belief sequence for
edge_selectors=DenseEdge() (reference src/gcm/edge_selectors/dense.py:4-23 —
complete graph with self-loops over alive nodes) with a DenseGraphConv('add')
+ tanh GNN stack, across fill, wraparound, pre-existing state, and episode
resets; and window() bitwise-identical to scan().
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.edges.dense import DenseEdge
from gcm_tpu.models.clique_gcm import CliqueGCM
from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import MLP, Linear


def make_pair(B=3, N=6, F=5, obs=None, preprocessor=False, layers=2, seed=0):
    obs = obs or F
    stack = []
    for _ in range(layers):
        stack += [DenseGraphConv(F, F), jnp.tanh]
    gnn = DenseGNN(stack)
    pre = MLP([Linear(obs, F)]) if preprocessor else None
    dense = DenseGCM(gnn, preprocessor=pre, graph_size=N,
                     edge_selectors=DenseEdge())
    clique = CliqueGCM(gnn, preprocessor=pre, graph_size=N)
    params = dense.init(jax.random.PRNGKey(seed))
    return dense, clique, params


class TestCliqueParity:
    def _run(self, B=3, N=6, F=5, T=21, **kw):
        dense, clique, params = make_pair(B=B, N=N, F=F, **kw)
        obs = kw.get("obs") or F
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, obs))
        d, _ = dense.scan(params, xs, dense.initial_state(B, obs))
        c, _ = clique.scan(params, xs, clique.initial_state(B, obs))
        return np.array(d), np.array(c)

    def test_fill_phase(self):
        d, c = self._run(T=5, N=8)
        assert np.allclose(d, c, atol=1e-5)

    def test_boundary_and_wrap(self):
        d, c = self._run(N=6, T=21)  # wraps the ring three times
        assert np.allclose(d, c, atol=1e-5)

    def test_with_preprocessor(self):
        d, c = self._run(obs=3, preprocessor=True)
        assert np.allclose(d, c, atol=1e-5)

    def test_single_layer(self):
        d, c = self._run(layers=1)
        assert np.allclose(d, c, atol=1e-5)

    def test_three_layers_deep_wrap(self):
        d, c = self._run(layers=3, N=4, T=19)
        assert np.allclose(d, c, atol=1e-5)

    def test_dones_match_dense(self):
        B, N, F, T = 3, 6, 4, 17
        dense, clique, params = make_pair(B=B, N=N, F=F)
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        dones = jax.random.bernoulli(jax.random.PRNGKey(2), 0.25, (B, T))
        d, _ = dense.scan(params, xs, dense.initial_state(B, F), dones=dones)
        c, _ = clique.scan(params, xs, clique.initial_state(B, F),
                           dones=dones)
        assert np.allclose(np.array(d), np.array(c), atol=1e-5)

    def test_gradient_flow(self):
        B, N, F, T = 2, 6, 4, 9
        _, clique, params = make_pair(B=B, N=N, F=F)

        def loss(p):
            o, _ = clique.scan(p, jax.random.normal(
                jax.random.PRNGKey(1), (B, T, F)),
                clique.initial_state(B, F))
            return jnp.sum(o ** 2)

        g = jax.grad(loss)(params)
        norms = [float(jnp.linalg.norm(a))
                 for a in jax.tree_util.tree_leaves(g)]
        assert all(n > 0 for n in norms), norms


class TestCliqueWindowProperty:
    """Randomized window-vs-scan parity over the algebraically tricky axes:
    graph size vs trajectory length (wrap depth), pre-existing state depth,
    random reset patterns, layer count, and both window implementations."""

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(st.data())
    def test_window_matches_scan_random(self, data):
        st_ = self.st
        N = data.draw(st_.integers(2, 9), label="N")
        T = data.draw(st_.integers(1, 20), label="T")
        B = data.draw(st_.integers(1, 3), label="B")
        layers = data.draw(st_.integers(1, 3), label="layers")
        warm = data.draw(st_.integers(0, 12), label="warm")
        impl = data.draw(st_.sampled_from(["gather", "proj"]), label="impl")
        p_done = data.draw(st_.sampled_from([0.0, 0.2, 0.5]), label="p_done")
        seed = data.draw(st_.integers(0, 2**16), label="seed")

        F = 3
        stack = []
        for _ in range(layers):
            stack += [DenseGraphConv(F, F), jnp.tanh]
        m = CliqueGCM(DenseGNN(stack), preprocessor=MLP([Linear(F, F)]),
                      graph_size=N)
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
        o2, s2 = m.window(params, xs, st0, dones=dones, impl=impl)
        assert np.allclose(np.array(o1), np.array(o2),
                           rtol=1e-4, atol=1e-4)
        assert np.array_equal(np.array(s1.nodes), np.array(s2.nodes))
        assert np.array_equal(np.array(s1.t), np.array(s2.t))


class TestCliqueWindowParity:
    """window() vs scan(): outputs within float-reassociation tolerance
    (backend GEMMs accumulate in a row-count-dependent order, so [B·T,F]
    vs [B,F] matmuls of identical values differ by a few ULP of the
    pre-activation scale), final state BITWISE — across wraparound,
    pre-existing state, and mid-window resets."""

    def _model(self, N, F=4, layers=2):
        stack = []
        for _ in range(layers):
            stack += [DenseGraphConv(F, F), jnp.tanh]
        return CliqueGCM(DenseGNN(stack), preprocessor=MLP([Linear(F, F)]),
                         graph_size=N)

    @pytest.mark.parametrize("layers,impl", [(1, "gather"), (2, "gather"),
                                             (3, "gather"), (1, "proj"),
                                             (2, "proj"), (3, "proj")])
    def test_bitwise_parity_all_regimes(self, layers, impl):
        F, B, N = 4, 3, 8
        m = self._model(N, F, layers)
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
            o2, s2 = m.window(params, xw, st0, dones=dn, impl=impl)
            assert np.allclose(np.array(o1), np.array(o2),
                               rtol=1e-5, atol=1e-5)
            assert np.array_equal(np.array(s1.nodes), np.array(s2.nodes))
            assert np.array_equal(np.array(s1.t), np.array(s2.t))

    @pytest.mark.parametrize("impl", ["gather", "proj"])
    def test_gradients_match_scan(self, impl):
        F, B, N, T = 4, 2, 8, 12
        m = self._model(N, F)
        params = m.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))

        def loss(fwd, p, **kw):
            o, _ = fwd(p, xs, m.initial_state(B, F), **kw)
            return jnp.sum(o ** 2)

        g1 = jax.grad(lambda p: loss(m.scan, p))(params)
        g2 = jax.grad(lambda p: loss(m.window, p, impl=impl))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-5)

    def test_chained_windows_match_one_scan(self):
        """Two consecutive window() calls (state threaded) == one scan."""
        F, B, N, T = 4, 2, 6, 16
        m = self._model(N, F)
        params = m.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        o_ref, s_ref = m.scan(params, xs, m.initial_state(B, F))
        o1, s1 = m.window(params, xs[:, :9], m.initial_state(B, F))
        o2, s2 = m.window(params, xs[:, 9:], s1)
        assert np.allclose(np.array(o_ref),
                           np.concatenate([o1, o2], axis=1),
                           rtol=1e-5, atol=1e-5)
        assert np.array_equal(np.array(s_ref.nodes), np.array(s2.nodes))


class TestCliqueMeanAggregation:
    def test_clique_mean_matches_dense_edge(self):
        """aggr='mean' stacks: the shared aggregate divides by the alive
        count (== every alive sink's degree in the complete graph) —
        exact DenseGCM+DenseEdge parity on scan and both window impls."""
        from gcm_tpu.edges.dense import DenseEdge

        F, B, N, T = 4, 3, 6, 17
        gnn = DenseGNN([DenseGraphConv(F, F, aggr="mean"), jnp.tanh,
                        DenseGraphConv(F, F, aggr="mean"), jnp.tanh])
        dense = DenseGCM(gnn, graph_size=N, edge_selectors=DenseEdge())
        clique = CliqueGCM(gnn, graph_size=N)
        params = dense.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        d, _ = dense.scan(params, xs, dense.initial_state(B, F))
        c, _ = clique.scan(params, xs, clique.initial_state(B, F))
        assert np.allclose(np.array(d), np.array(c), atol=1e-5)
        for impl in ("gather", "proj"):
            w, _ = clique.window(params, xs, clique.initial_state(B, F),
                                 impl=impl)
            assert np.allclose(np.array(d), np.array(w), atol=1e-5), impl
