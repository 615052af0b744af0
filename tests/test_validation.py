"""Runtime shape-contract validation (the torchtyping/typeguard analog,
reference sparse_gcm.py:72-92, gcm.py:246-260) plus deeper codec/gradient
contracts: grads flow through the pack/unpack boundary (reference
tests/test_sparse_gcm.py:888-957) and sparse convs run inside DenseGCM via
the converters (tests/test_gcm.py:448-460)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.models.converters import dense_to_sparse
from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.models.presets import readme_sparse_gcm
from gcm_tpu.nn.dense_conv import DenseGNN
from gcm_tpu.nn.sparse_conv import GraphConv
from gcm_tpu.utils.packing import pack_hidden, unpack_hidden
from gcm_tpu.utils.validation import ShapeError


class TestValidation:
    def test_dense_wrong_obs_dim(self):
        from gcm_tpu.models.presets import readme_dense_gcm

        model = readme_dense_gcm(obs_size=8, hidden=16, graph_size=8)
        model.validate = True
        params = model.init(jax.random.PRNGKey(0))
        state = model.initial_state(2, 8)
        with pytest.raises(ShapeError, match="nodes must be"):
            model(params, jnp.ones((2, 9)), state)

    def test_dense_wrong_num_nodes_dtype(self):
        from gcm_tpu.models.presets import readme_dense_gcm

        model = readme_dense_gcm(obs_size=4, hidden=8, graph_size=4)
        model.validate = True
        params = model.init(jax.random.PRNGKey(0))
        state = model.initial_state(1, 4)
        bad = state._replace(num_nodes=state.num_nodes.astype(jnp.float32))
        with pytest.raises(ShapeError, match="integer"):
            model(params, jnp.ones((1, 4)), bad)

    def test_sparse_wrong_taus(self):
        model = readme_sparse_gcm(obs_size=4, hidden=8, graph_size=8,
                                  max_edges=16)
        model.validate = True
        params = model.init(jax.random.PRNGKey(0))
        state = model.initial_state(2, 4)
        with pytest.raises(ShapeError, match="taus"):
            model(params, jnp.ones((2, 3, 4)), jnp.ones((3,), jnp.int32),
                  state)

    def test_valid_inputs_pass_under_jit(self):
        model = readme_sparse_gcm(obs_size=4, hidden=8, graph_size=8,
                                  max_edges=16)
        model.validate = True
        params = model.init(jax.random.PRNGKey(0))
        state = model.initial_state(2, 4)
        f = jax.jit(lambda p, x, t, s: model(p, x, t, s))
        out, _ = f(params, jnp.ones((2, 3, 4)), jnp.full((2,), 3, jnp.int32),
                   state)
        assert np.isfinite(np.array(out)).all()


class TestGradThroughPackBoundary:
    def test_grads_flow_through_unpacked_state(self):
        """The rllib-boundary contract: gradients reach params through a
        state that round-tripped the pack codec
        (reference tests/test_sparse_gcm.py:888-957)."""
        model = readme_sparse_gcm(obs_size=4, hidden=8, graph_size=8,
                                  max_edges=16)
        params = model.init(jax.random.PRNGKey(0))
        B = 2
        xs1 = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 4))
        xs2 = jax.random.normal(jax.random.PRNGKey(2), (B, 3, 4))
        taus = jnp.full((B,), 3, jnp.int32)

        def loss(p):
            _, st = model(p, xs1, taus, model.initial_state(B, 4))
            packed = pack_hidden(st, max_edges=16)
            st2 = unpack_hidden(packed, max_edges=16)
            out, _ = model(p, xs2, taus, st2)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(params)
        tot = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(tot) and tot > 0


class SparseConvViaDenseAdj:
    """GNN running a sparse conv inside DenseGCM by converting the dense
    adjacency to an edge list each call (reference tests/test_gcm.py:448-460)."""

    def __init__(self, f):
        self.conv = GraphConv(f, f)

    def init(self, key):
        return {"conv": self.conv.init(key)}

    def __call__(self, params, x, adj, weights=None):
        edges, w = dense_to_sparse(adj)
        return jnp.tanh(self.conv(params["conv"], x, edges, w))


class TestSparseConvInsideDenseGCM:
    def test_runs_and_matches_dense_conv(self):
        from gcm_tpu.edges.temporal import TemporalBackedge
        from gcm_tpu.nn.dense_conv import DenseGraphConv

        F, B, N, T = 5, 2, 8, 6
        hybrid = DenseGCM(SparseConvViaDenseAdj(F), graph_size=N,
                          edge_selectors=TemporalBackedge([1]))
        params = hybrid.init(jax.random.PRNGKey(0))

        dense_gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh])
        plain = DenseGCM(dense_gnn, graph_size=N,
                         edge_selectors=TemporalBackedge([1]))
        plain_params = {"gnn": [params["gnn"]["conv"], {}],
                        "edge_selectors": {}}

        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        out_h, _ = hybrid.scan(params, xs, hybrid.initial_state(B, F))
        out_p, _ = plain.scan(plain_params, xs, plain.initial_state(B, F))
        assert np.allclose(np.array(out_h), np.array(out_p), atol=1e-5)


class TestCrossStateGuard:
    def test_ring_rejects_dense_state(self):
        from gcm_tpu.edges.temporal import TemporalBackedge
        from gcm_tpu.models.ring_gcm import RingDenseGCM
        from gcm_tpu.nn.dense_conv import DenseGraphConv

        F, N = 4, 6
        gnn = DenseGNN([DenseGraphConv(F, F)])
        ring = RingDenseGCM(gnn, graph_size=N, validate=True,
                            edge_selectors=TemporalBackedge([1]))
        params = ring.init(jax.random.PRNGKey(0))
        dense_model = DenseGCM(gnn, graph_size=N)
        dense_state = dense_model.initial_state(1, F)
        with pytest.raises(ShapeError, match="RingGraphState"):
            ring(params, jnp.ones((1, F)), dense_state)

    def test_dense_rejects_ring_state(self):
        from gcm_tpu.models.presets import readme_dense_gcm
        from gcm_tpu.models.ring_gcm import RingGraphState

        model = readme_dense_gcm(obs_size=4, hidden=8, graph_size=4)
        model.validate = True
        params = model.init(jax.random.PRNGKey(0))
        ring_state = RingGraphState(
            nodes=jnp.zeros((1, 4, 4)), adj=jnp.zeros((1, 4, 4)),
            weights=jnp.zeros((0,)), t=jnp.zeros((1,), jnp.int32))
        with pytest.raises(ShapeError, match="DenseGraphState"):
            model(params, jnp.ones((1, 4)), ring_state)


class TestJaxtypingContracts:
    """Opt-in jaxtyping contracts on the public API (utils/contracts.py) —
    the torchtyping @typechecked analog (reference sparse_gcm.py:72-92)."""

    def _with_typecheck(self):
        from gcm_tpu import config

        config.TYPECHECK = True
        return config

    def test_dense_rejects_wrong_rank(self):
        from gcm_tpu.models.presets import readme_dense_gcm

        config = self._with_typecheck()
        try:
            model = readme_dense_gcm(obs_size=4, hidden=8, graph_size=4)
            params = model.init(jax.random.PRNGKey(0))
            state = model.initial_state(2, 4)
            with pytest.raises(TypeError, match="typecheck|contract"):
                model(params, jnp.ones((2, 1, 4)), state)  # [B,t,F] not [B,F]
        finally:
            config.TYPECHECK = False

    def test_sparse_cross_arg_axis_mismatch(self):
        """taus batch axis must equal x's — cross-argument axis binding."""
        config = self._with_typecheck()
        try:
            model = readme_sparse_gcm(obs_size=4, hidden=8, graph_size=8,
                                      max_edges=16)
            params = model.init(jax.random.PRNGKey(0))
            state = model.initial_state(2, 4)
            with pytest.raises(TypeError, match="typecheck|contract"):
                model(params, jnp.ones((2, 3, 4)),
                      jnp.ones((3,), jnp.int32), state)
        finally:
            config.TYPECHECK = False

    def test_off_by_default_no_overhead_path(self):
        from gcm_tpu import config

        assert config.TYPECHECK is False
        from gcm_tpu.models.presets import readme_dense_gcm

        model = readme_dense_gcm(obs_size=4, hidden=8, graph_size=4)
        params = model.init(jax.random.PRNGKey(0))
        state = model.initial_state(1, 4)
        out, _ = model(params, jnp.ones((1, 4)), state)
        assert out.shape == (1, 4 * 2) or out.ndim == 2
