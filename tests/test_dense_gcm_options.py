"""DenseGCM option-path tests: pooled output, edge_weights, aux edge
selectors after positional encoding, preprocessor — the config knobs of
reference gcm.py:156-182 and the aux path gcm.py:294-306."""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.edges.learned import LearnedEdge
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.models.positional import PositionalEncoding
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import MLP, Linear


class MeanPoolGNN:
    """GNN with global mean pooling — pooled=True expects a single output
    vector per batch (reference gcm.py:309-312)."""

    def __init__(self, f):
        self.conv = DenseGraphConv(f, f)

    def init(self, key):
        return {"conv": self.conv.init(key)}

    def __call__(self, params, x, adj, weights=None):
        h = jnp.tanh(self.conv(params["conv"], x, adj))
        return jnp.mean(h, axis=1)


class TestPooled:
    def test_pooled_output_shape(self):
        F, B, N = 6, 3, 8
        model = DenseGCM(MeanPoolGNN(F), graph_size=N, pooled=True,
                         edge_selectors=TemporalBackedge([1]))
        params = model.init(jax.random.PRNGKey(0))
        state = model.initial_state(B, F)
        out, state = model(params, jnp.ones((B, F)), state)
        assert out.shape == (B, F)
        assert np.isfinite(np.array(out)).all()


class TestEdgeWeights:
    def test_weights_state_allocated_and_used(self):
        F, B, N = 4, 2, 6
        gnn = DenseGNN([DenseGraphConv(F, F)], use_weights=True)
        model = DenseGCM(gnn, graph_size=N, edge_weights=True,
                         edge_selectors=TemporalBackedge([1]))
        params = model.init(jax.random.PRNGKey(0))
        state = model.initial_state(B, F)
        assert state.weights.shape == (B, N, N)
        out, state2 = model(params, jnp.ones((B, F)), state)
        # zero weights nullify the adjacency contribution entirely
        out_w, _ = model(params, jnp.ones((B, F)),
                         state._replace(weights=jnp.zeros((B, N, N))))
        assert out.shape == (B, F)
        assert np.isfinite(np.array(out_w)).all()


class TestAuxSelectors:
    def test_aux_after_positional_encoding(self):
        """Aux selectors see positionally-encoded features
        (reference gcm.py:294-306); the graph state must stay raw."""
        F, B, N = 8, 2, 10
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh])
        model = DenseGCM(
            gnn,
            graph_size=N,
            edge_selectors=TemporalBackedge([1]),
            aux_edge_selectors=LearnedEdge(input_size=F, deterministic=True),
            positional_encoder=PositionalEncoding(max_len=N, mode="add",
                                                  feat_dim=F),
        )
        params = model.init(jax.random.PRNGKey(0))
        state = model.initial_state(B, F)
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, 4, F))
        outs, final = model.scan(params, xs, state)
        assert np.isfinite(np.array(outs)).all()
        # state nodes remain raw observations (no PE leaked into state)
        assert np.allclose(np.array(final.nodes[:, 3]), np.array(xs[:, 3]),
                           atol=1e-6)
        # aux learned selector added edges beyond the temporal chain
        assert np.array(final.adj).sum() >= 3  # 3 temporal edges at least

    def test_preprocessor_keeps_raw_state(self):
        F, H, B, N = 4, 6, 2, 8
        gnn = DenseGNN([DenseGraphConv(H, H), jnp.tanh])
        model = DenseGCM(gnn, graph_size=N,
                         preprocessor=MLP([Linear(F, H)]),
                         edge_selectors=TemporalBackedge([1]))
        params = model.init(jax.random.PRNGKey(0))
        state = model.initial_state(B, F)  # state holds raw F-dim obs
        x = jax.random.normal(jax.random.PRNGKey(1), (B, F))
        out, state = model(params, x, state)
        assert out.shape == (B, H)
        assert np.allclose(np.array(state.nodes[:, 0]), np.array(x), atol=1e-6)
