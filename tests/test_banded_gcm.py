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
