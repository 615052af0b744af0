"""Cross-framework activation-parity gate: gcm_tpu.DenseGCM vs the PyTorch
reference semantics (BASELINE.json north star: "bit-parity belief states on
the README DenseGCM workload").

`bench_reference.RefDenseGCM` is a faithful pure-torch reimplementation of the
reference DenseGCM hot path (reference src/gcm/gcm.py:213-321 per-step
algorithm + torch_geometric DenseGraphConv semantics + the selector semantics
of edge_selectors/{temporal,dense,distance,learned}.py — torch_geometric is
not installed in this image). These tests transplant its torch weights into
the JAX param pytree (the weight-transplant pattern of reference
tests/test_sparse_gcm.py:326-330), run the same T-step rollout through both
frameworks, and assert the belief sequences match. If the JAX DenseGCM ever
drifts from reference semantics, the whole internal parity web (dense<->sparse,
fast-core<->DenseGCM) would move with it — this is the external anchor.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from bench_reference import RefDenseGCM
from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import MLP, Linear
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.edges.dense import DenseEdge
from gcm_tpu.edges.distance import CosineEdge, EuclideanEdge, SpatialEdge
from gcm_tpu.edges.learned import LearnedEdge

OBS, HIDDEN = 8, 32


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def build_jax_model(selector, graph_size):
    gnn = DenseGNN([DenseGraphConv(HIDDEN, HIDDEN), jnp.tanh,
                    DenseGraphConv(HIDDEN, HIDDEN), jnp.tanh])
    return DenseGCM(gnn, preprocessor=MLP([Linear(OBS, HIDDEN)]),
                    edge_selectors=selector, graph_size=graph_size)


def transplant(ref: RefDenseGCM, params):
    """torch state_dict -> JAX param pytree (torch Linear weight is
    [out, in]; JAX kernels are [in, out])."""
    params = jax.tree.map(lambda x: x, params)
    params["preprocessor"][0] = {"kernel": t2j(ref.pre.weight).T,
                                 "bias": t2j(ref.pre.bias)}
    for idx, conv in ((0, ref.conv1), (2, ref.conv2)):
        params["gnn"][idx] = {
            "lin_rel": {"kernel": t2j(conv.lin_rel.weight).T,
                        "bias": t2j(conv.lin_rel.bias)},
            "lin_root": {"kernel": t2j(conv.lin_root.weight).T},
        }
    if hasattr(ref, "edge_mlp"):
        net = []
        for mod in ref.edge_mlp.net:
            if isinstance(mod, torch.nn.Linear):
                net.append({"kernel": t2j(mod.weight).T,
                            "bias": t2j(mod.bias)})
            elif isinstance(mod, torch.nn.LayerNorm):
                net.append({"scale": t2j(mod.weight),
                            "bias": t2j(mod.bias)})
            else:  # ReLU
                net.append({})
        params["edge_selectors"] = {"edge_network": net}
    return params


def run_ref(ref, xs):
    B, T, _ = xs.shape
    N = ref.N
    hidden = (torch.zeros(B, N, OBS), torch.zeros(B, N, N),
              torch.zeros(B, dtype=torch.long))
    beliefs = []
    with torch.no_grad():
        for t in range(T):
            mx, hidden = ref(torch.from_numpy(xs[:, t]), hidden)
            beliefs.append(mx.numpy())
    return np.stack(beliefs, axis=1), hidden


def assert_parity(ref_selector, jax_selector, graph_size=128, T=32, B=4,
                  atol=1e-5, seed=0):
    torch.manual_seed(seed)
    ref = RefDenseGCM(OBS, HIDDEN, graph_size, selector=ref_selector)
    model = build_jax_model(jax_selector, graph_size)
    params = transplant(ref, model.init(jax.random.PRNGKey(0)))
    xs = np.random.RandomState(seed + 1).randn(B, T, OBS).astype(np.float32)
    want, (ref_nodes, ref_adj, ref_nn) = run_ref(ref, xs)
    outs, state = model.scan(params, jnp.asarray(xs),
                             model.initial_state(B, OBS))
    np.testing.assert_allclose(np.asarray(outs), want, atol=atol, rtol=0)
    # the recurrent graph state itself matches, not just its projection
    np.testing.assert_allclose(np.asarray(state.nodes),
                               ref_nodes.numpy(), atol=atol, rtol=0)
    np.testing.assert_allclose(np.asarray(state.adj),
                               ref_adj.numpy(), atol=atol, rtol=0)
    np.testing.assert_array_equal(np.asarray(state.num_nodes),
                                  ref_nn.numpy())


class TestTorchOracleParity:
    def test_temporal_readme_workload(self):
        """The BASELINE.json north-star gate: README DenseGCM workload
        (obs=8, hidden=32, graph_size=128, TemporalBackedge([1]),
        README.md:48-88), T=32 steps."""
        assert_parity("temporal", TemporalBackedge([1]))

    def test_temporal_with_wraparound(self):
        """Ring-buffer eviction parity (reference wrap_overflow,
        gcm.py:323-355): graph_size=8 with T=24 wraps every batch twice."""
        assert_parity("temporal", TemporalBackedge([1]), graph_size=8, T=24)

    def test_dense_edge(self):
        """Fully-connected-past selector (edge_selectors/dense.py:16-21)."""
        assert_parity("dense", DenseEdge())

    def test_euclidean(self):
        """Distance-threshold selector incl. the reference's cdist batch-mean
        broadcast quirk (edge_selectors/distance.py:42-49)."""
        assert_parity("euclidean", EuclideanEdge(max_distance=1.0))

    def test_cosine(self):
        assert_parity("cosine", CosineEdge(max_distance=0.5))

    def test_spatial(self):
        assert_parity("spatial",
                      SpatialEdge(max_distance=0.25, a_pose_slice=slice(0, 2)))

    def test_learned_spardmax(self):
        """Pair-MLP scorer + Spardmax + STE merge (edge_selectors/
        learned.py:38-113). The scorer runs on raw (pre-preprocessor) nodes
        in both frameworks — the aliasing discipline of gcm.py:262-291."""
        torch.manual_seed(3)
        ref = RefDenseGCM(OBS, HIDDEN, 128, selector="learned")
        model = build_jax_model(
            LearnedEdge(input_size=OBS, deterministic=True), 128)
        params = transplant(ref, model.init(jax.random.PRNGKey(0)))
        xs = np.random.RandomState(4).randn(4, 32, OBS).astype(np.float32)
        want, _ = run_ref(ref, xs)
        outs, _ = model.scan(params, jnp.asarray(xs),
                             model.initial_state(4, OBS))
        # sparsemax support boundaries are fp-sensitive; beliefs (not the
        # binarized adj) are the contract here
        np.testing.assert_allclose(np.asarray(outs), want, atol=1e-4, rtol=0)

    def test_gradient_parity_temporal(self):
        """Loss gradients w.r.t. the preprocessor kernel match across
        frameworks (the reference's gradient-flow contract,
        tests/test_gcm.py:355-365, strengthened to exact values)."""
        torch.manual_seed(5)
        ref = RefDenseGCM(OBS, HIDDEN, 128, selector="temporal")
        model = build_jax_model(TemporalBackedge([1]), 128)
        params = transplant(ref, model.init(jax.random.PRNGKey(0)))
        xs = np.random.RandomState(6).randn(2, 8, OBS).astype(np.float32)

        hidden = (torch.zeros(2, 128, OBS), torch.zeros(2, 128, 128),
                  torch.zeros(2, dtype=torch.long))
        loss_t = 0.0
        for t in range(8):
            mx, hidden = ref(torch.from_numpy(xs[:, t]), hidden)
            loss_t = loss_t + mx.square().sum()
        loss_t.backward()
        want = ref.pre.weight.grad.numpy().T  # -> [in, out]

        def loss_fn(p):
            outs, _ = model.scan(p, jnp.asarray(xs),
                                 model.initial_state(2, OBS))
            return jnp.sum(outs ** 2)

        got = jax.grad(loss_fn)(params)["preprocessor"][0]["kernel"]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=0)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
