"""Pallas kernel parity vs XLA fallbacks (interpret mode on CPU) —
SURVEY.md §7 step 3's contract: kernels swap in behind the same signature."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.nn.dense_conv import DenseGraphConv
from gcm_tpu.ops.distance import cosine_score, euclidean_score
from gcm_tpu.ops.pallas.dense_gconv import fused_dense_graph_conv
from gcm_tpu.ops.pallas.sddmm import sddmm_threshold_row
from gcm_tpu.ops.pallas.spmm import spmm_edge_list
from gcm_tpu.ops.scatter import edge_scatter_add


class TestFusedDenseGraphConv:
    def test_matches_fallback(self):
        B, N, F, Fo = 4, 16, 8, 8
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, N, F))
        adj = (jax.random.uniform(jax.random.PRNGKey(1), (B, N, N)) < 0.3
               ).astype(jnp.float32)
        conv = DenseGraphConv(F, Fo)
        params = conv.init(jax.random.PRNGKey(2))
        want = conv(params, x, adj)
        got = fused_dense_graph_conv(
            x, adj, params["lin_rel"]["kernel"], params["lin_rel"]["bias"],
            params["lin_root"]["kernel"],
        )
        assert np.allclose(np.array(got), np.array(want), atol=1e-4)

    def test_fused_activation(self):
        B, N, F = 2, 8, 4
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
        adj = jnp.zeros((B, N, N))
        conv = DenseGraphConv(F, F)
        params = conv.init(jax.random.PRNGKey(1))
        want = jnp.tanh(conv(params, x, adj))
        got = fused_dense_graph_conv(
            x, adj, params["lin_rel"]["kernel"], params["lin_rel"]["bias"],
            params["lin_root"]["kernel"], activation="tanh",
        )
        assert np.allclose(np.array(got), np.array(want), atol=1e-4)


class TestSpMM:
    def test_matches_scatter_fallback(self):
        B, N, F, E = 3, 16, 8, 24
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
        sink = jax.random.randint(jax.random.PRNGKey(1), (B, E), 0, N)
        src = jax.random.randint(jax.random.PRNGKey(2), (B, E), 0, N)
        edges = jnp.stack([sink, src], axis=1).astype(jnp.int32)
        # punch sentinel holes
        edges = edges.at[:, :, -4:].set(-1)
        w = jax.random.uniform(jax.random.PRNGKey(3), (B, E))
        want = edge_scatter_add(x, edges, w)
        got = spmm_edge_list(x, edges, w)
        assert np.allclose(np.array(got), np.array(want), atol=1e-4)

    def test_empty_edges(self):
        B, N, F, E = 2, 8, 4, 6
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
        edges = jnp.full((B, 2, E), -1, jnp.int32)
        w = jnp.ones((B, E))
        got = spmm_edge_list(x, edges, w)
        assert np.allclose(np.array(got), 0.0)

    def test_precision_modes_match_fallback(self):
        """f32x2 (error-compensated 2-pass bf16) and highest must agree with
        the exact scatter fallback to their respective tolerances (the
        precision knob of config.SPMM_PRECISION)."""
        B, N, F, E = 3, 16, 8, 24
        x = jax.random.normal(jax.random.PRNGKey(4), (B, N, F))
        sink = jax.random.randint(jax.random.PRNGKey(5), (B, E), 0, N)
        src = jax.random.randint(jax.random.PRNGKey(6), (B, E), 0, N)
        edges = jnp.stack([sink, src], axis=1).astype(jnp.int32)
        edges = edges.at[:, :, -4:].set(-1)
        w = jax.random.uniform(jax.random.PRNGKey(7), (B, E))
        want = np.array(edge_scatter_add(x, edges, w))
        got_x2 = np.array(spmm_edge_list(x, edges, w, precision="f32x2"))
        assert np.allclose(got_x2, want, atol=2e-3)
        got_hi = np.array(spmm_edge_list(x, edges, w, precision="highest"))
        assert np.allclose(got_hi, want, atol=1e-4)


class TestSDDMM:
    def test_euclidean_matches_fallback(self):
        B, N, F = 3, 16, 8
        nodes = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
        num_nodes = jnp.array([3, 8, 15], jnp.int32)
        curr = nodes[jnp.arange(B), num_nodes]
        # fallback: per-batch euclidean distance (not the batch-mean quirk)
        d = jnp.linalg.norm(curr[:, None, :] - nodes, axis=-1)
        want = (d < 1.5) & (jnp.arange(N)[None, :] < num_nodes[:, None])
        got = sddmm_threshold_row(curr, nodes, num_nodes, 1.5,
                                  mode="euclidean")
        assert np.array_equal(np.array(got), np.array(want))

    def test_cosine_matches_fallback(self):
        B, N, F = 2, 12, 6
        nodes = jax.random.normal(jax.random.PRNGKey(1), (B, N, F))
        num_nodes = jnp.array([5, 9], jnp.int32)
        curr = nodes[jnp.arange(B), num_nodes]
        sim = cosine_score(curr, nodes)
        want = (sim < 0.2) & (jnp.arange(N)[None, :] < num_nodes[:, None])
        got = sddmm_threshold_row(curr, nodes, num_nodes, 0.2, mode="cosine")
        assert np.array_equal(np.array(got), np.array(want))


class TestSpMMPairs:
    """Pair-window bucketed SpMM v2 (ops/pallas/spmm2.py) — parity vs the
    XLA scatter fallback in interpret mode, incl. gradients and the
    transpose-layout reshape used by the backward pass."""

    def _graph(self, B=2, N=256, E=512, F=64, seed=0):
        sink = jax.random.randint(jax.random.PRNGKey(seed + 1), (B, E), 0, N)
        src = jax.random.randint(jax.random.PRNGKey(seed + 2), (B, E), 0, N)
        edges = jnp.stack([sink, src], axis=1).astype(jnp.int32)
        w = jax.random.uniform(jax.random.PRNGKey(seed + 3), (B, E)) + 0.5
        x = jax.random.normal(jax.random.PRNGKey(seed + 4), (B, N, F))
        return x, edges, w

    def test_matches_scatter_fallback(self):
        from gcm_tpu.ops.pallas.spmm2 import (bucket_edges_pairs,
                                              check_bucket_overflow,
                                              spmm_pairs)

        x, edges, w = self._graph()
        N, cap = 256, 256
        be, bw, counts = bucket_edges_pairs(edges, w, N, cap)
        check_bucket_overflow(counts, cap)
        want = edge_scatter_add(x, edges, w)
        got = spmm_pairs(x, be, bw, N, cap, "f32x2")
        assert np.allclose(np.array(got), np.array(want), atol=1e-3)

    def test_sentinel_edges_ignored(self):
        from gcm_tpu.ops.pallas.spmm2 import bucket_edges_pairs, spmm_pairs

        x, edges, w = self._graph(E=128)
        edges = edges.at[:, :, 64:].set(-1)  # invalidate half
        be, bw, _ = bucket_edges_pairs(edges, w, 256, 128)
        want = edge_scatter_add(x, edges, w)
        got = spmm_pairs(x, be, bw, 256, 128, "f32x2")
        assert np.allclose(np.array(got), np.array(want), atol=1e-3)

    def test_gradients_match_fallback(self):
        from gcm_tpu.ops.pallas.spmm2 import bucket_edges_pairs, spmm_pairs

        x, edges, w = self._graph(B=1, N=128, E=128, F=32)
        be, bw, _ = bucket_edges_pairs(edges, w, 128, 256)

        def loss_pairs(xx, ww):
            return jnp.sum(spmm_pairs(xx, be, ww, 128, 256, "f32x2") ** 2)

        def loss_ref(xx, ww):
            return jnp.sum(edge_scatter_add(xx, edges, ww) ** 2)

        gx, gw = jax.grad(loss_pairs, argnums=(0, 1))(x, bw)
        rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        assert np.allclose(np.array(gx), np.array(rx), atol=1e-2)
        # bucketed-layout weight grads: compare via scatter back through the
        # bucket permutation (invalid lanes have zero grad)
        from gcm_tpu.ops.scatter import edge_mask
        assert np.isfinite(np.array(gw)).all()
        valid = np.array(edge_mask(be))
        assert (np.abs(np.array(gw))[~valid] == 0).all()

    def test_overflow_detected(self):
        import pytest

        from gcm_tpu.ops.pallas.spmm2 import (bucket_edges_pairs,
                                              check_bucket_overflow)

        x, edges, w = self._graph(B=1, N=128, E=512)
        _, _, counts = bucket_edges_pairs(edges, w, 128, 128)  # cap < E
        with pytest.raises(ValueError, match="overflow"):
            check_bucket_overflow(counts, 128)

    def test_transpose_pairs_roundtrip(self):
        from gcm_tpu.ops.pallas.spmm2 import (bucket_edges_pairs,
                                              transpose_pairs)

        x, edges, w = self._graph()
        be, bw, _ = bucket_edges_pairs(edges, w, 256, 256)
        fe, fw = transpose_pairs(be, bw, 256, 256)
        fe2, fw2 = transpose_pairs(fe, fw, 256, 256)
        # double transpose undoes the pair swap but leaves rows swapped twice
        assert np.array_equal(np.array(fe2), np.array(be))
        assert np.array_equal(np.array(fw2), np.array(bw))


class TestSpMMSlots:
    """Degree-bounded sink-slot SpMM (ops/pallas/spmm_slots.py) — parity vs
    the XLA scatter in interpret mode, incl. gradients and overflow guard."""

    def _graph(self, B=2, N=256, E=256, F=32, seed=0):
        sink = jax.random.randint(jax.random.PRNGKey(seed + 1), (B, E), 0, N)
        src = jax.random.randint(jax.random.PRNGKey(seed + 2), (B, E), 0, N)
        edges = jnp.stack([sink, src], axis=1).astype(jnp.int32)
        w = jax.random.uniform(jax.random.PRNGKey(seed + 3), (B, E)) + 0.5
        x = jax.random.normal(jax.random.PRNGKey(seed + 4), (B, N, F))
        return x, edges, w

    def test_matches_scatter_fallback(self):
        from gcm_tpu.ops.pallas.spmm_slots import (bucket_sink_slots,
                                                   check_slot_overflow,
                                                   spmm_slots)

        x, edges, w = self._graph()
        srcs, ws, counts = bucket_sink_slots(edges, w, 256, 8)
        check_slot_overflow(counts, 8)
        want = edge_scatter_add(x, edges, w)
        got = spmm_slots(x, srcs, ws, 256, 8)
        assert np.allclose(np.array(got), np.array(want), atol=1e-4)

    def test_temporal_hop_graph_k_equals_hops(self):
        """The structural-bound case: hop-{1,2} temporal edges need k=2."""
        from gcm_tpu.ops.pallas.spmm_slots import (bucket_sink_slots,
                                                   check_slot_overflow,
                                                   spmm_slots)

        B, N, F = 2, 256, 16
        sinks = jnp.broadcast_to(jnp.arange(N)[None, :], (B, N))
        e1 = jnp.stack([sinks, jnp.maximum(sinks - 1, 0)], axis=1)
        e2 = jnp.stack([sinks, jnp.maximum(sinks - 2, 0)], axis=1)
        edges = jnp.concatenate([e1, e2], axis=-1).astype(jnp.int32)
        w = jnp.ones((B, 2 * N))
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
        srcs, ws, counts = bucket_sink_slots(edges, w, N, 2)
        check_slot_overflow(counts, 2)  # k = len(hops), never overflows
        want = edge_scatter_add(x, edges, w)
        got = spmm_slots(x, srcs, ws, N, 2)
        assert np.allclose(np.array(got), np.array(want), atol=1e-4)

    def test_gradients(self):
        from gcm_tpu.ops.pallas.spmm_slots import (bucket_sink_slots,
                                                   spmm_slots)

        x, edges, w = self._graph(B=1, N=128, E=64, F=8)
        srcs, ws, _ = bucket_sink_slots(edges, w, 128, 8)

        def loss_slots(xx, ww):
            return jnp.sum(spmm_slots(xx, srcs, ww, 128, 8) ** 2)

        def loss_ref(xx, ww):
            return jnp.sum(edge_scatter_add(xx, edges, ww) ** 2)

        gx, gw = jax.grad(loss_slots, argnums=(0, 1))(x, ws)
        rx, _ = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        assert np.allclose(np.array(gx), np.array(rx), atol=1e-3)
        assert np.isfinite(np.array(gw)).all()
        # empty slots (weight 0) are sentinels in the recovered edge list,
        # so their grad is exactly 0
        assert (np.array(gw)[np.array(ws) == 0.0] == 0).all()

    def test_overflow_detected(self):
        import pytest

        from gcm_tpu.ops.pallas.spmm_slots import (bucket_sink_slots,
                                                   check_slot_overflow)

        B, N = 1, 128
        # 10 edges into one sink: k=4 overflows
        sinks = jnp.full((B, 10), 5, jnp.int32)
        srcs_ = jnp.arange(10, dtype=jnp.int32)[None, :]
        edges = jnp.stack([sinks, srcs_], axis=1)
        _, _, counts = bucket_sink_slots(edges, jnp.ones((B, 10)), N, 4)
        with pytest.raises(ValueError, match="overflow"):
            check_slot_overflow(counts, 4)


class TestSpMMSeg:
    """Sink-sorted segmented-reduction SpMM v4 (ops/pallas/spmm_seg.py) —
    parity vs the XLA scatter in interpret mode, gradients, sentinel
    handling, and the boundary-table construction."""

    def _graph(self, B=2, N=256, E=512, F=16, seed=0, sentinel_tail=32):
        sink = jax.random.randint(jax.random.PRNGKey(seed + 1), (B, E), 0, N)
        src = jax.random.randint(jax.random.PRNGKey(seed + 2), (B, E), 0, N)
        edges = jnp.stack([sink, src], axis=1).astype(jnp.int32)
        if sentinel_tail:
            edges = edges.at[:, :, -sentinel_tail:].set(-1)
        w = jax.random.uniform(jax.random.PRNGKey(seed + 3), (B, E)) + 0.5
        x = jax.random.normal(jax.random.PRNGKey(seed + 4), (B, N, F))
        return x, edges, w

    def test_matches_scatter_fallback(self):
        from gcm_tpu.ops.pallas.spmm_seg import (bucket_edges_segments,
                                                 spmm_seg)

        x, edges, w = self._graph()
        cap = 256
        be, bw, begin, end, tot = bucket_edges_segments(edges, w, 256, cap)
        assert int(np.array(tot).max()) <= cap
        want = edge_scatter_add(x, edges, w)
        got = spmm_seg(x, be, bw, begin, end, 256, cap)
        assert np.allclose(np.array(got), np.array(want), atol=1e-4)

    def test_chunk_spanning_sink(self):
        """A sink whose edges span 128-edge chunk boundaries accumulates
        partial segment sums across chunks."""
        from gcm_tpu.ops.pallas.spmm_seg import (bucket_edges_segments,
                                                 spmm_seg)

        B, N, F, E = 1, 128, 8, 256
        # 200 edges all into sink 7 -> spans two chunks of the bucket
        sinks = jnp.full((B, E), 7, jnp.int32).at[:, 200:].set(-1)
        srcs = jnp.arange(E, dtype=jnp.int32)[None, :] % N
        edges = jnp.stack([sinks, jnp.where(sinks >= 0, srcs, -1)], axis=1)
        w = jnp.ones((B, E))
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
        cap = 256
        be, bw, begin, end, _ = bucket_edges_segments(edges, w, N, cap)
        want = edge_scatter_add(x, edges, w)
        got = spmm_seg(x, be, bw, begin, end, N, cap)
        assert np.allclose(np.array(got), np.array(want), atol=1e-3)

    def test_gradients(self):
        from gcm_tpu.ops.pallas.spmm_seg import (bucket_edges_segments,
                                                 spmm_seg)

        x, edges, w = self._graph(B=1, N=128, E=128, F=8)
        cap = 128
        be, bw, begin, end, _ = bucket_edges_segments(edges, w, 128, cap)

        def loss_seg(xx):
            return jnp.sum(spmm_seg(xx, be, bw, begin, end, 128, cap) ** 2)

        def loss_ref(xx):
            return jnp.sum(edge_scatter_add(xx, edges, w) ** 2)

        gx = jax.grad(loss_seg)(x)
        rx = jax.grad(loss_ref)(x)
        assert np.allclose(np.array(gx), np.array(rx), atol=1e-3)
        gw = jax.grad(lambda ww: jnp.sum(
            spmm_seg(x, be, ww, begin, end, 128, cap) ** 2))(bw)
        assert np.isfinite(np.array(gw)).all()
        assert (np.array(gw)[np.array(bw) == 0.0] == 0).all()

    def test_boundary_tables_partition_chunks(self):
        """begin/end are a disjoint cover of each chunk's valid lanes:
        sum over sink lanes of (end - begin) == valid edges per chunk."""
        from gcm_tpu.ops.pallas.spmm_seg import bucket_edges_segments
        from gcm_tpu.ops.scatter import edge_mask

        _, edges, w = self._graph(B=3, N=256, E=384, F=4, seed=5)
        cap = 256
        be, bw, begin, end, _ = bucket_edges_segments(edges, w, 256, cap)
        per_chunk = np.array((end - begin).sum(axis=-1))  # [B, P, n_chunks]
        valid = np.array(edge_mask(be)).reshape(per_chunk.shape[0],
                                                per_chunk.shape[1], -1)
        want = valid.reshape(*per_chunk.shape, -1).sum(axis=-1)
        assert (per_chunk == want).all()


class TestSpmmPrefetch:
    """Scalar-loop SpMM (ops/pallas/spmm_prefetch.py, the fifth kernel
    family): interpret-mode parity vs the XLA scatter, bucketing contract."""

    def _graph(self, B=3, N=16, E=40, F=8, seed=0):
        from gcm_tpu.ops.scatter import edge_scatter_add

        x = jax.random.normal(jax.random.PRNGKey(seed), (B, N, F))
        sink = jax.random.randint(jax.random.PRNGKey(seed + 1), (B, E), 0, N)
        src = jax.random.randint(jax.random.PRNGKey(seed + 2), (B, E), 0, N)
        edges = jnp.stack([sink, src], 1).astype(jnp.int32)
        edges = edges.at[:, :, -5:].set(-1)
        w = jax.random.uniform(jax.random.PRNGKey(seed + 3), (B, E))
        return x, edges, w, edge_scatter_add(x, edges, w)

    @pytest.mark.parametrize("nblk", [1, 2, 4])
    def test_parity(self, nblk):
        from gcm_tpu.ops.pallas.spmm_prefetch import spmm_prefetch

        x, edges, w, want = self._graph()
        got = spmm_prefetch(x, edges, w, n_blocks=nblk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=0)

    def test_bucketing_counts_drops(self):
        from gcm_tpu.ops.pallas.spmm_prefetch import bucket_edges_sink_blocks

        x, edges, w, _ = self._graph()
        sl, src, ws, dropped = bucket_edges_sink_blocks(edges, w, 16, 4)
        assert int(jnp.max(dropped)) == 0  # lossless cap=E
        sl2, _, _, dropped2 = bucket_edges_sink_blocks(edges, w, 16, 4,
                                                       cap=2)
        # cap=2 per block must drop something for 35 valid edges / 4 blocks
        assert int(jnp.max(dropped2)) > 0
        # local sink coords stay in-block
        S = 16 // 4
        ok = np.asarray(sl) >= 0
        assert ((np.asarray(sl)[ok] >= 0) & (np.asarray(sl)[ok] < S)).all()

    def test_grad_not_required(self):
        """The kernel is measurement-only (no custom VJP) — document that it
        is not wired into ops.dispatch and stays out of the training path."""
        from gcm_tpu.ops import dispatch

        assert not hasattr(dispatch, "spmm_prefetch")
