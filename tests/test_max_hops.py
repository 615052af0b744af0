"""max_hops = k-hop subgraph semantics (reference sparse_gcm.py:176-199).

When max_hops >= GNN depth the restriction is output-invariant (pinned by the
dense↔sparse parity suite). When max_hops < depth it must TRUNCATE the
receptive field exactly like torch_geometric's k_hop_subgraph: a 2-layer GNN
with max_hops=1 only sees 1-hop sources (plus edges among them)."""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.edges.sparse_temporal import TemporalEdge
from gcm_tpu.models.sparse_gcm import SparseGCM
from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN

B, t, F, N, E = 2, 6, 5, 16, 64


def _models():
    gnn = SparseGNN([GraphConv(F, F), jnp.tanh, GraphConv(F, F), jnp.tanh])
    kw = dict(edge_selectors=TemporalEdge([1]), graph_size=N, max_edges=E)
    m1 = SparseGCM(gnn, max_hops=1, **kw)
    mf = SparseGCM(gnn, **kw)
    params = m1.init(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, t, F))
    taus = jnp.full((B,), t, jnp.int32)
    return m1, mf, params, xs, taus


def _numpy_k_hop_prune(edges, out_rows, hops):
    """Reference-faithful oracle: BFS sink→source from the output set,
    keep edges with both endpoints in the reachable node set."""
    edges = np.asarray(edges)
    B_, _, E_ = edges.shape
    pruned = edges.copy()
    for b in range(B_):
        reach = set(out_rows[b])
        for _ in range(hops):
            new = {int(edges[b, 1, e]) for e in range(E_)
                   if edges[b, 0, e] >= 0 and int(edges[b, 0, e]) in reach}
            reach |= new
        for e in range(E_):
            s, r = int(pruned[b, 0, e]), int(pruned[b, 1, e])
            if s < 0 or r < 0 or s not in reach or r not in reach:
                pruned[b, :, e] = -1
    return jnp.asarray(pruned)


def test_max_hops_1_truncates_2_layer_gnn():
    # In a FIRST whole-window call every node is an output node, so the k-hop
    # restriction keeps everything (also the reference's behavior). The
    # truncation regime needs pre-existing nodes: window 2's outputs reach
    # back into window 1's chain.
    m1, mf, params, xs, taus = _models()
    t0 = 4
    xs0, xs1 = xs[:, :t0], xs[:, t0:]
    taus0 = jnp.full((B,), t0, jnp.int32)
    taus1 = jnp.full((B,), t - t0, jnp.int32)

    _, st1_a = m1(params, xs0, taus0, m1.initial_state(B, F))
    out1, _ = m1(params, xs1, taus1, st1_a)
    _, stf_a = mf(params, xs0, taus0, mf.initial_state(B, F))
    outf, stf = mf(params, xs1, taus1, stf_a)
    # divergence: with a temporal chain and a 2-layer GNN, max_hops=1
    # removes the 2-hop contribution into the window-2 outputs
    assert not jnp.allclose(out1, outf, atol=1e-6)

    # oracle: prune the full model's edge list with a numpy BFS around the
    # window-2 output rows and run the same GNN on the pruned graph
    out_rows = [[t0 + i for i in range(t - t0)] for _ in range(B)]
    pruned = _numpy_k_hop_prune(stf.edges, out_rows, hops=1)
    feats = m1.gnn(params["gnn"], stf.nodes, pruned, stf.weights)
    oracle = feats[:, t0:t, :]
    assert jnp.allclose(out1, oracle, atol=1e-5), (
        jnp.max(jnp.abs(out1 - oracle)))


def test_max_hops_at_depth_is_output_invariant():
    gnn = SparseGNN([GraphConv(F, F), jnp.tanh, GraphConv(F, F), jnp.tanh])
    kw = dict(edge_selectors=TemporalEdge([1]), graph_size=N, max_edges=E)
    m2 = SparseGCM(gnn, max_hops=2, **kw)
    mf = SparseGCM(gnn, **kw)
    params = m2.init(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, t, F))
    taus = jnp.full((B,), t, jnp.int32)
    out2, _ = m2(params, xs, taus, m2.initial_state(B, F))
    outf, _ = mf(params, xs, taus, mf.initial_state(B, F))
    assert jnp.allclose(out2, outf, atol=1e-6)


class TestHopCapCompaction:
    """hop_cap gather-compacts the k-hop subgraph (the reference
    k_hop_subgraph's work reduction, sparse_gcm.py:176-199): the GNN runs
    on [B, cap, F]. Must match the masked max_hops path whenever the
    reachable set fits the cap."""

    def _pair(self, cap, hops=1, graph=N):
        gnn = SparseGNN([GraphConv(F, F), jnp.tanh, GraphConv(F, F),
                         jnp.tanh])
        kw = dict(edge_selectors=TemporalEdge([1, 2]), graph_size=graph,
                  max_edges=E)
        masked = SparseGCM(gnn, max_hops=hops, **kw)
        compact = SparseGCM(gnn, max_hops=hops, hop_cap=cap, **kw)
        params = masked.init(jax.random.PRNGKey(0))
        return masked, compact, params

    def test_matches_masked_path_across_windows(self):
        masked, compact, params = self._pair(cap=N)
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, t, F))
        taus = jnp.full((B,), t, jnp.int32)
        t0 = 4
        sm = masked.initial_state(B, F)
        sc = compact.initial_state(B, F)
        for sl in (slice(None, t0), slice(t0, None)):
            w = xs[:, sl]
            tw = jnp.full((B,), w.shape[1], jnp.int32)
            om, sm = masked(params, w, tw, sm)
            oc, sc = compact(params, w, tw, sc)
            np.testing.assert_allclose(np.asarray(om), np.asarray(oc),
                                       atol=1e-5, rtol=0)
        # persistent state identical (compaction is GNN-local)
        for a, b in zip(sm, sc):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_truncation_regime_matches(self):
        # max_hops=1 < GNN depth 2: the truncated receptive field must
        # survive compaction identically
        masked, compact, params = self._pair(cap=N, hops=1)
        xs = jax.random.normal(jax.random.PRNGKey(2), (B, t, F))
        t0 = 4
        sm = masked.initial_state(B, F)
        sc = compact.initial_state(B, F)
        for sl in (slice(None, t0), slice(t0, None)):
            w = xs[:, sl]
            tw = jnp.full((B,), w.shape[1], jnp.int32)
            om, sm = masked(params, w, tw, sm)
            oc, sc = compact(params, w, tw, sc)
        np.testing.assert_allclose(np.asarray(om), np.asarray(oc),
                                   atol=1e-5, rtol=0)

    def test_tight_cap_is_exact_and_jits(self):
        # reachable set for tau=2, hops=2, TemporalEdge[1,2]: outputs + up
        # to 4 hops back = at most 6 nodes -> cap=8 is lossless
        masked, compact, params = self._pair(cap=8, hops=2)
        xs = jax.random.normal(jax.random.PRNGKey(3), (B, t, F))
        sm = masked.initial_state(B, F)
        sc = compact.initial_state(B, F)
        fwd = jax.jit(lambda p, w, tw, s: compact(p, w, tw, s,
                                                  return_aux=True))
        for i in range(3):
            w = xs[:, 2 * i: 2 * i + 2]
            tw = jnp.full((B,), 2, jnp.int32)
            om, sm = masked(params, w, tw, sm)
            oc, sc, aux = fwd(params, w, tw, sc)
            assert int(jnp.max(aux["hop_overflow"])) == 0
            np.testing.assert_allclose(np.asarray(om), np.asarray(oc),
                                       atol=1e-5, rtol=0)

    def test_overflow_drops_oldest_and_counts(self):
        # cap=3 < reachable set: overflow surfaces in aux and the outputs
        # stay finite; output rows (the newest nodes) always survive
        _, compact, params = self._pair(cap=3, hops=2)
        xs = jax.random.normal(jax.random.PRNGKey(4), (B, t, F))
        sc = compact.initial_state(B, F)
        o1, sc = compact(params, xs[:, :3], jnp.full((B,), 3, jnp.int32), sc)
        o2, sc, aux = compact(params, xs[:, 3:6],
                              jnp.full((B,), 3, jnp.int32), sc,
                              return_aux=True)
        assert int(jnp.min(aux["hop_overflow"])) > 0
        assert bool(jnp.all(jnp.isfinite(o2)))
        # dropping the oldest reachable nodes diverges from the full path
        masked, _, _ = self._pair(cap=3, hops=2)
        smm = masked.initial_state(B, F)
        _, smm = masked(params, xs[:, :3], jnp.full((B,), 3, jnp.int32), smm)
        om, _ = masked(params, xs[:, 3:6], jnp.full((B,), 3, jnp.int32), smm)
        assert not jnp.allclose(om, o2, atol=1e-6)

    def test_cap_below_window_asserts(self):
        _, compact, params = self._pair(cap=2, hops=1)
        xs = jax.random.normal(jax.random.PRNGKey(5), (B, t, F))
        taus = jnp.full((B,), t, jnp.int32)
        try:
            compact(params, xs, taus, compact.initial_state(B, F))
        except AssertionError as e:
            assert "hop_cap" in str(e)
        else:
            raise AssertionError("expected hop_cap < t to assert")

    def test_requires_max_hops(self):
        gnn = SparseGNN([GraphConv(F, F), jnp.tanh])
        try:
            SparseGCM(gnn, hop_cap=8, graph_size=N, max_edges=E)
        except AssertionError as e:
            assert "max_hops" in str(e)
        else:
            raise AssertionError("expected hop_cap without max_hops to "
                                 "assert")

    def test_grad_parity_with_masked_path(self):
        # training through the compacted subgraph: grads wrt params and
        # inputs must match the masked path when the cap is lossless
        masked, compact, params = self._pair(cap=N, hops=1)
        xs = jax.random.normal(jax.random.PRNGKey(6), (B, t, F))
        taus = jnp.full((B,), t, jnp.int32)

        def loss(model):
            def f(p, x):
                out, _ = model(p, x, taus, model.initial_state(B, F))
                return jnp.sum(out ** 2)
            return f

        gm = jax.grad(loss(masked), argnums=(0, 1))(params, xs)
        gc = jax.grad(loss(compact), argnums=(0, 1))(params, xs)
        for a, b in zip(jax.tree_util.tree_leaves(gm),
                        jax.tree_util.tree_leaves(gc)):
            assert bool(jnp.all(jnp.isfinite(b)))
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)
        flat = jnp.concatenate([jnp.ravel(l)
                                for l in jax.tree_util.tree_leaves(gc)])
        assert float(jnp.linalg.norm(flat)) > 0


class TestHopCapAuto:
    """hop_cap='auto': the cap is derived from selector structure
    (TemporalEdge.reach_bound_per_hop) at trace time and compaction engages
    only in the measured win regime (config.HOP_AUTO_RATIO /
    HOP_AUTO_MIN_NF, MEASURE_r4/hop_compact*)."""

    def _pair(self, hops=2, graph=N, sel=None):
        gnn = SparseGNN([GraphConv(F, F), jnp.tanh, GraphConv(F, F),
                         jnp.tanh])
        kw = dict(edge_selectors=sel or TemporalEdge([1, 2]),
                  graph_size=graph, max_edges=E)
        masked = SparseGCM(gnn, max_hops=hops, **kw)
        auto = SparseGCM(gnn, max_hops=hops, hop_cap="auto", **kw)
        params = masked.init(jax.random.PRNGKey(0))
        return masked, auto, params

    def _force(self, ratio, min_nf):
        from gcm_tpu import config

        old = (config.HOP_AUTO_RATIO, config.HOP_AUTO_MIN_NF)
        config.apply_tuning({"HOP_AUTO_RATIO": ratio,
                             "HOP_AUTO_MIN_NF": min_nf})
        return old

    def _restore(self, old):
        from gcm_tpu import config

        config.apply_tuning({"HOP_AUTO_RATIO": old[0],
                             "HOP_AUTO_MIN_NF": old[1]})

    def test_auto_cap_is_structural_bound(self):
        # t=6, max_hops=2, TemporalEdge[1,2]: cap = 6 + 2*2 = 10 -> 16
        _, auto, _ = self._pair(hops=2, graph=128)
        old = self._force(ratio=8, min_nf=0)
        try:
            assert auto._resolve_hop_cap(t=6, N=128, F=F) == 16
        finally:
            self._restore(old)

    def test_auto_engaged_matches_masked_bitwise(self):
        masked, auto, params = self._pair(hops=2)
        old = self._force(ratio=1, min_nf=0)  # force engagement at N=16
        try:
            assert auto._resolve_hop_cap(t=t, N=N, F=F) is not None
            xs = jax.random.normal(jax.random.PRNGKey(7), (B, t, F))
            t0 = 3
            sm = masked.initial_state(B, F)
            sa = auto.initial_state(B, F)
            fwd = jax.jit(lambda p, w, tw, s: auto(p, w, tw, s))
            for sl in (slice(None, t0), slice(t0, None)):
                w = xs[:, sl]
                tw = jnp.full((B,), w.shape[1], jnp.int32)
                om, sm = masked(params, w, tw, sm)
                oa, sa = fwd(params, w, tw, sa)
                np.testing.assert_allclose(np.asarray(om), np.asarray(oa),
                                           atol=1e-5, rtol=0)
            for a, b in zip(sm, sa):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        finally:
            self._restore(old)

    def test_auto_off_below_measured_regime(self):
        # default gate: N=16, F=5 is far below the N*F >= 262144 crossover,
        # so auto stays on the masked path
        _, auto, _ = self._pair(hops=2)
        assert auto._resolve_hop_cap(t=t, N=N, F=F) is None

    def test_auto_off_without_structural_bound(self):
        class Unbounded:
            """Selector shim without reach_bound_per_hop (learned/spatial
            reachability is data-dependent)."""

            def __init__(self):
                self._inner = TemporalEdge([1])

            def init(self, key):
                return self._inner.init(key)

            def __call__(self, *a, **kw):
                return self._inner(*a, **kw)

        _, auto, _ = self._pair(hops=2, sel=Unbounded())
        old = self._force(ratio=1, min_nf=0)
        try:
            assert auto._resolve_hop_cap(t=t, N=N, F=F) is None
        finally:
            self._restore(old)

    def test_auto_off_with_aux_selector(self):
        gnn = SparseGNN([GraphConv(F, F), jnp.tanh])
        auto = SparseGCM(gnn, edge_selectors=TemporalEdge([1]),
                         aux_edge_selectors=TemporalEdge([2]),
                         graph_size=N, max_edges=E, max_hops=1,
                         hop_cap="auto")
        old = self._force(ratio=1, min_nf=0)
        try:
            assert auto._resolve_hop_cap(t=t, N=N, F=F) is None
        finally:
            self._restore(old)


class TestCheckHopOverflow:
    """check_hop_overflow — the outside-jit guard for hop_cap truncation
    (ADVICE r4: silent divergence was only visible by reading aux)."""

    def _pair(self, cap, hops):
        return TestHopCapCompaction._pair(TestHopCapCompaction(), cap=cap,
                                          hops=hops)

    def test_clean_aux_passes(self):
        _, compact, params = self._pair(cap=8, hops=2)
        xs = jax.random.normal(jax.random.PRNGKey(5), (B, 2, F))
        sc = compact.initial_state(B, F)
        _, _, aux = compact(params, xs, jnp.full((B,), 2, jnp.int32), sc,
                            return_aux=True)
        compact.check_hop_overflow(aux)  # no raise
        compact.check_hop_overflow({})  # no hop_cap in play -> no-op

    def test_truncation_raises(self):
        import pytest

        _, compact, params = self._pair(cap=3, hops=2)
        xs = jax.random.normal(jax.random.PRNGKey(6), (B, t, F))
        sc = compact.initial_state(B, F)
        _, sc = compact(params, xs[:, :3], jnp.full((B,), 3, jnp.int32), sc)
        _, _, aux = compact(params, xs[:, 3:6],
                            jnp.full((B,), 3, jnp.int32), sc,
                            return_aux=True)
        with pytest.raises(Exception, match="hop_cap dropped"):
            compact.check_hop_overflow(aux)
