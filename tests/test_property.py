"""Property-based tests (hypothesis) for the codec layer (ROADMAP item 11).

Randomized analogs of the reference's hand-enumerated round-trip suites
(tests/test_sparse_gcm.py:74-304): pack/unpack idempotence, coalesce vs a
numpy oracle, compaction stability, and bucket conservation — over arbitrary
edge lists with sentinel holes, not just the curated cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from gcm_tpu.core.graph_state import SparseGraphState
from gcm_tpu.ops.coalesce import coalesce_edges
from gcm_tpu.ops.scatter import edge_mask, edge_scatter_add, nonzero_padded
from gcm_tpu.utils.packing import pack_hidden, unpack_hidden

# keep shapes static across examples so each property compiles once
B, N, E, F = 2, 8, 12, 3


def edge_list(draw):
    """Random padded edge list: each lane either a valid (sink, src) pair or
    a -1 sentinel hole (holes may appear anywhere, as after deletion)."""
    lanes = draw(st.lists(
        st.one_of(
            st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)),
            st.none(),
        ),
        min_size=B * E, max_size=B * E))
    edges = np.full((B, 2, E), -1, np.int32)
    for i, lane in enumerate(lanes):
        b, e = divmod(i, E)
        if lane is not None:
            edges[b, 0, e], edges[b, 1, e] = lane
    w = draw(st.lists(st.floats(0.25, 4.0, width=32), min_size=B * E,
                      max_size=B * E))
    weights = np.asarray(w, np.float32).reshape(B, E)
    return edges, weights


@st.composite
def edge_lists_strategy(draw):
    return edge_list(draw)


class TestPackRoundTrip:
    @settings(max_examples=25, deadline=None)
    @given(edge_lists_strategy())
    def test_pack_unpack_preserves_edge_multiset(self, ew):
        edges, weights = ew
        state = SparseGraphState(
            nodes=jnp.zeros((B, N, F)),
            edges=jnp.asarray(edges), weights=jnp.asarray(weights),
            t=jnp.zeros((B,), jnp.int32),
            num_edges=jnp.sum(jnp.asarray(edges[:, 0]) >= 0,
                              axis=-1).astype(jnp.int32))
        packed = pack_hidden(state, max_edges=E)
        state2 = unpack_hidden(packed, max_edges=E)
        for b in range(B):
            def multiset(e, w):
                v = np.array(e[b, 0]) >= 0
                return sorted(zip(np.array(e[b, 0])[v].tolist(),
                                  np.array(e[b, 1])[v].tolist(),
                                  np.round(np.array(w[b])[v], 5).tolist()))
            assert multiset(edges, weights) == multiset(
                np.array(state2.edges), np.array(state2.weights))

    @settings(max_examples=10, deadline=None)
    @given(edge_lists_strategy())
    def test_pack_idempotent_after_cycle(self, ew):
        edges, weights = ew
        state = SparseGraphState(
            nodes=jnp.zeros((B, N, F)),
            edges=jnp.asarray(edges), weights=jnp.asarray(weights),
            t=jnp.zeros((B,), jnp.int32),
            num_edges=jnp.sum(jnp.asarray(edges[:, 0]) >= 0,
                              axis=-1).astype(jnp.int32))
        p1 = pack_hidden(state, max_edges=E)
        s1 = unpack_hidden(p1, max_edges=E)
        p2 = pack_hidden(s1, max_edges=E)
        for a, b_ in zip(p1, p2):
            assert np.array_equal(np.array(a), np.array(b_))


class TestCoalesceOracle:
    @settings(max_examples=25, deadline=None)
    @given(edge_lists_strategy(), st.sampled_from(["sum", "mean", "max"]))
    def test_matches_numpy_oracle(self, ew, reduce):
        edges, weights = ew
        ce, cw, cn = coalesce_edges(jnp.asarray(edges), jnp.asarray(weights),
                                    num_nodes=N, reduce=reduce)
        ce, cw, cn = np.array(ce), np.array(cw), np.array(cn)
        for b in range(B):
            groups = {}
            for e in range(E):
                s, r = edges[b, 0, e], edges[b, 1, e]
                if s >= 0 and r >= 0:
                    groups.setdefault((s, r), []).append(weights[b, e])
            want = sorted(
                (k, {"sum": np.sum, "mean": np.mean, "max": np.max}[reduce](v))
                for k, v in groups.items())
            got_valid = ce[b, 0] >= 0
            got = sorted(zip(
                zip(ce[b, 0][got_valid].tolist(), ce[b, 1][got_valid].tolist()),
                cw[b][got_valid].tolist()))
            assert len(got) == cn[b] == len(want)
            for (ka, va), (kb, vb) in zip(want, got):
                assert ka == kb and abs(va - vb) < 1e-4


class TestCompaction:
    @settings(max_examples=25, deadline=None)
    @given(edge_lists_strategy())
    def test_nonzero_padded_stable_order(self, ew):
        edges, _ = ew
        valid = np.array(edge_mask(jnp.asarray(edges)))
        idx, ok, count = nonzero_padded(jnp.asarray(valid), E)
        idx, ok, count = np.array(idx), np.array(ok), np.array(count)
        for b in range(B):
            want = np.nonzero(valid[b])[0]
            assert count[b] == len(want)
            assert idx[b][ok[b]].tolist() == want.tolist()  # stable order


class TestBucketConservation:
    @settings(max_examples=15, deadline=None)
    @given(edge_lists_strategy())
    def test_spmm_invariant_under_bucketing(self, ew):
        """Bucketing is a permutation: spmm over the bucketed layout equals
        the plain scatter whenever no bucket overflows."""
        from gcm_tpu.ops.pallas.spmm2 import bucket_edges_pairs, spmm_pairs

        edges, weights = ew
        NN, cap = 128, 128  # kernel-scale shapes; E=12 edges always fit
        e = jnp.asarray(edges)
        w = jnp.asarray(weights)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, NN, F))
        be, bw, counts = bucket_edges_pairs(e, w, NN, cap)
        assert int(np.array(counts).max()) <= cap
        want = edge_scatter_add(x, e, w)
        got = spmm_pairs(x, be, bw, NN, cap, "f32x2")
        assert np.allclose(np.array(got), np.array(want), atol=1e-3)


class TestFusedRingProperty:
    """Property fuzz over the round-4 ring hot paths: for random selector
    chains, shapes, and warm-up lengths, the fused step must be BITWISE
    equal to the unfused step, and (when the structure qualifies) the
    scan-free window() must match the scan allclose with an exactly-equal
    final node buffer/step count."""

    @settings(max_examples=20, deadline=None)
    @given(
        st.integers(1, 3),            # batch
        st.integers(4, 9),            # graph size N
        st.integers(3, 7),            # feature dim
        st.integers(1, 22),           # trajectory length
        st.integers(0, 9),            # warm-up steps before comparing
        st.lists(st.sampled_from(["temporal1", "temporal2", "euclid",
                                  "spatial"]),
                 min_size=1, max_size=2, unique=True),
        st.integers(0, 2 ** 31 - 1),  # seed
    )
    def test_fused_bitwise_and_window_parity(self, B, N, F, T, warm, kinds,
                                             seed):
        from gcm_tpu import config
        from gcm_tpu.edges.chain import EdgeChain
        from gcm_tpu.edges.distance import EuclideanEdge, SpatialEdge
        from gcm_tpu.edges.temporal import TemporalBackedge
        from gcm_tpu.models.ring_gcm import RingDenseGCM
        from gcm_tpu.models.ring_window import ring_window, window_supported
        from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv

        mk = {
            "temporal1": lambda: TemporalBackedge([1]),
            "temporal2": lambda: TemporalBackedge([2]),
            "euclid": lambda: EuclideanEdge(max_distance=1.5),
            "spatial": lambda: SpatialEdge(1.0, slice(0, min(2, F))),
        }
        sels = [mk[k]() for k in kinds]
        sel = sels[0] if len(sels) == 1 else EdgeChain(sels)
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                        DenseGraphConv(F, F), jnp.tanh])
        model = RingDenseGCM(gnn, edge_selectors=sel, graph_size=N)
        params = model.init(jax.random.PRNGKey(seed % 10_000))
        st0 = model.initial_state(B, F)
        prev = config.RING_FUSED_STEP
        try:
            if warm:
                xs_w = jax.random.normal(jax.random.PRNGKey(seed % 997),
                                         (B, warm, F))
                config.RING_FUSED_STEP = False
                _, st0 = model.scan(params, xs_w, st0)
            xs = jax.random.normal(jax.random.PRNGKey(seed % 9991),
                                   (B, T, F))
            config.RING_FUSED_STEP = False
            o_u, f_u = model.scan(params, xs, st0)
            config.RING_FUSED_STEP = True
            o_f, f_f = model.scan(params, xs, st0)
            np.testing.assert_array_equal(np.asarray(o_u), np.asarray(o_f))
            for a, b in zip(f_u, f_f):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

            if window_supported(model):
                o_w, f_w = ring_window(model, params, xs, st0)
                np.testing.assert_allclose(np.asarray(o_u), np.asarray(o_w),
                                           atol=2e-5, rtol=0)
                np.testing.assert_array_equal(np.asarray(f_u.nodes),
                                              np.asarray(f_w.nodes))
                np.testing.assert_array_equal(np.asarray(f_u.t),
                                              np.asarray(f_w.t))
                np.testing.assert_allclose(np.asarray(f_u.adj),
                                           np.asarray(f_w.adj),
                                           atol=2e-5, rtol=0)
        finally:
            config.RING_FUSED_STEP = prev


class TestFusedDenseProperty:
    """Property fuzz over the round-4 dense fused step (the flipped
    DENSE_FUSED_STEP default): for random selector chains, shapes, and
    warm-up lengths (including wrapped-around warm states built by the
    unfused step), the fused step must be BITWISE equal to the unfused
    step on outputs and the full final state. The hand-enumerated mirror
    is tests/test_dense_gcm.py::TestFusedDenseStep."""

    @settings(max_examples=20, deadline=None)
    @given(
        st.integers(1, 3),            # batch
        st.integers(4, 9),            # graph size N
        st.integers(3, 7),            # feature dim
        st.integers(1, 22),           # trajectory length
        st.integers(0, 9),            # warm-up steps before comparing
        st.lists(st.sampled_from(["temporal1", "temporal2", "dense",
                                  "euclid", "spatial"]),
                 min_size=1, max_size=2, unique=True),
        st.integers(0, 2 ** 31 - 1),  # seed
    )
    def test_fused_bitwise_parity(self, B, N, F, T, warm, kinds, seed):
        from gcm_tpu import config
        from gcm_tpu.edges.chain import EdgeChain
        from gcm_tpu.edges.dense import DenseEdge
        from gcm_tpu.edges.distance import EuclideanEdge, SpatialEdge
        from gcm_tpu.edges.temporal import TemporalBackedge
        from gcm_tpu.models.dense_gcm import DenseGCM
        from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv

        mk = {
            "temporal1": lambda: TemporalBackedge([1]),
            "temporal2": lambda: TemporalBackedge([2], direction="both"),
            "dense": lambda: DenseEdge(),
            "euclid": lambda: EuclideanEdge(max_distance=1.5),
            "spatial": lambda: SpatialEdge(1.0, slice(0, min(2, F))),
        }
        sels = [mk[k]() for k in kinds]
        sel = sels[0] if len(sels) == 1 else EdgeChain(sels)
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                        DenseGraphConv(F, F), jnp.tanh])
        model = DenseGCM(gnn, edge_selectors=sel, graph_size=N)
        params = model.init(jax.random.PRNGKey(seed % 10_000))
        st0 = model.initial_state(B, F)
        prev = config.DENSE_FUSED_STEP
        try:
            if warm:
                xs_w = jax.random.normal(jax.random.PRNGKey(seed % 997),
                                         (B, warm, F))
                config.DENSE_FUSED_STEP = False
                _, st0 = model.scan(params, xs_w, st0)
            xs = jax.random.normal(jax.random.PRNGKey(seed % 9991),
                                   (B, T, F))
            config.DENSE_FUSED_STEP = False
            o_u, f_u = model.scan(params, xs, st0)
            config.DENSE_FUSED_STEP = True
            o_f, f_f = model.scan(params, xs, st0)
            np.testing.assert_array_equal(np.asarray(o_u), np.asarray(o_f))
            for a, b in zip(f_u, f_f):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        finally:
            config.DENSE_FUSED_STEP = prev
