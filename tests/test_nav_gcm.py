"""NavGCM tests: index helpers (mirroring the expected values pinned in
reference tests/test_nav_gcm.py:30-131), state update (:135-170), and the
train-vs-inference parity contract (:172-270)."""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.models.nav_gcm import NavDenseGNN, NavGCM, NavState
from gcm_tpu.nn.dense_conv import DenseGraphConv
from gcm_tpu.utils import indexing as ix


def unpadded(*arrs_and_mask):
    *arrs, mask = arrs_and_mask
    m = np.array(mask)
    return [np.array(a)[m] for a in arrs]


class TestIndexing:
    """Expected values from reference tests/test_nav_gcm.py:34-131."""

    def test_ragged(self):
        T = jnp.array([1, 2], jnp.int32)
        taus = jnp.array([2, 3], jnp.int32)
        b, t, m = ix.get_valid_node_idxs(T, taus, cap=10)
        bv, tv = unpadded(b, t, m)
        assert bv.tolist() == [0, 0, 0, 1, 1, 1, 1, 1]
        assert tv.tolist() == [0, 1, 2, 0, 1, 2, 3, 4]

        b, t, m = ix.get_new_node_idxs(T, taus, cap=8)
        bv, tv = unpadded(b, t, m)
        assert bv.tolist() == [0, 0, 1, 1, 1]
        assert tv.tolist() == [1, 2, 2, 3, 4]

        f, m = ix.make_flat_new_idx(T, taus, cap=8)
        (fv,) = unpadded(f, m)
        assert fv.tolist() == [1, 2, 5, 6, 7]

        b, t, m = ix.make_output_idx(taus, cap=8)
        bv, tv = unpadded(b, t, m)
        assert bv.tolist() == [0, 0, 1, 1, 1]
        assert tv.tolist() == [0, 1, 0, 1, 2]

        front, back = ix.front_back_ptr(T, taus)
        assert np.array(back).tolist() == [2, 7]
        assert np.array(front).tolist() == [0, 3]

    def test_base_case(self):
        T = jnp.array([0, 0, 0], jnp.int32)
        taus = jnp.array([1, 1, 1], jnp.int32)
        b, t, m = ix.get_valid_node_idxs(T, taus, cap=6)
        bv, tv = unpadded(b, t, m)
        assert bv.tolist() == [0, 1, 2]
        assert tv.tolist() == [0, 0, 0]
        f, m = ix.make_flat_new_idx(T, taus, cap=6)
        (fv,) = unpadded(f, m)
        assert fv.tolist() == [0, 1, 2]
        front, back = ix.front_back_ptr(T, taus)
        assert np.array(back).tolist() == [0, 1, 2]
        assert np.array(front).tolist() == [0, 1, 2]

    def test_inference(self):
        T = jnp.array([2], jnp.int32)
        taus = jnp.array([1], jnp.int32)
        b, t, m = ix.get_new_node_idxs(T, taus, cap=4)
        bv, tv = unpadded(b, t, m)
        assert bv.tolist() == [0] and tv.tolist() == [2]
        f, m = ix.make_flat_new_idx(T, taus, cap=4)
        (fv,) = unpadded(f, m)
        assert fv.tolist() == [2]

    def test_nonpadded(self):
        T = jnp.array([5, 1], jnp.int32)
        taus = jnp.array([2, 3], jnp.int32)
        b, t, m = ix.get_nonpadded_idxs(T, taus, cap=8)
        bv, tv = unpadded(b, t, m)
        assert bv.tolist() == [0, 0, 1, 1, 1]
        assert tv.tolist() == [0, 1, 0, 1, 2]

    def test_causal_pair_mask_matches_reference_tril(self):
        """Oracle: tril_indices-based candidate set (util.py:242-263)."""
        T = np.array([2, 0])
        taus = np.array([2, 3])
        mask = np.array(ix.causal_pair_mask(jnp.array(T), jnp.array(taus),
                                            t=3, N=8))
        for b in range(2):
            for i in range(3):
                for j in range(8):
                    want = i < taus[b] and j < T[b] + i
                    assert mask[b, i, j] == want, (b, i, j)


class TestUpdate:
    def test_ragged_update(self):
        """Mirrors reference tests/test_nav_gcm.py:137-170."""
        gcm = NavGCM(gnn=NavDenseGNN([]), max_verts=10)
        state = NavState(
            x=jnp.zeros((2, 10, 1)), pos=jnp.zeros((2, 10, 2)),
            rot=jnp.zeros((2, 10, 1)), t=jnp.array([1, 2], jnp.int32),
        )
        taus = jnp.array([2, 3], jnp.int32)
        x_in = jnp.ones((2, 3, 1))
        pos_in = jnp.ones((2, 3, 2))
        rot_in = jnp.ones((2, 3, 1))
        _, new_state = gcm({"gnn": []}, x_in, pos_in, rot_in, taus, state)
        x = np.array(new_state.x)
        assert (x[0, 1:3] == 1).all() and x[0, 0] == 0 and (x[0, 3:] == 0).all()
        assert (x[1, 2:5] == 1).all() and (x[1, :2] == 0).all()
        assert (np.array(new_state.pos)[0, 1:3] == 1).all()
        assert np.array(new_state.t).tolist() == [3, 5]


def make_nav(feats=1, max_verts=8, r=3.0, k=16, causal=True):
    in_dim = feats + 2 + 1  # x ‖ pos ‖ rot like the reference test GNN
    gnn = NavDenseGNN([DenseGraphConv(in_dim, 4), jnp.tanh])
    return NavGCM(gnn, max_verts=max_verts, r=r, k=k, causal=causal,
                  edge_method="radius")


class TestE2EParity:
    """Train-mode (whole sequence) ≡ inference-mode (step-by-step), the
    reference contract at tests/test_nav_gcm.py:172-270."""

    def _run(self, B):
        V = 8
        gcm = make_nav(max_verts=V)
        params = gcm.init(jax.random.PRNGKey(0))
        obs = jnp.arange(B * V * 1, dtype=jnp.float32).reshape(B, V, 1)
        pos = jnp.arange(B * V * 2, dtype=jnp.float32).reshape(B, V, 2)
        rot = jnp.arange(B * V * 1, dtype=jnp.float32).reshape(B, V, 1)

        taus = jnp.full((B,), V, jnp.int32)
        train_out, train_state = gcm(params, obs, pos, rot, taus,
                                     gcm.initial_state(B, 1))

        inf_state = gcm.initial_state(B, 1)
        tau1 = jnp.ones((B,), jnp.int32)
        outs = []
        for i in range(V):
            o, inf_state = gcm(params, obs[:, i : i + 1], pos[:, i : i + 1],
                               rot[:, i : i + 1], tau1, inf_state)
            assert np.allclose(np.array(o), np.array(train_out[:, i : i + 1]),
                               atol=1e-5), f"step {i}"
            outs.append(o)
        inf_out = jnp.concatenate(outs, axis=1)
        assert np.allclose(np.array(inf_out), np.array(train_out), atol=1e-5)
        for a, b in zip(train_state, inf_state):
            assert np.allclose(np.array(a), np.array(b), atol=1e-6)

    def test_one_batch(self):
        self._run(1)

    def test_multi_batch(self):
        self._run(2)

    def test_ragged_taus(self):
        B, V = 2, 8
        gcm = make_nav(max_verts=V)
        params = gcm.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        obs = jax.random.normal(key, (B, V, 1))
        pos = jax.random.normal(jax.random.PRNGKey(2), (B, V, 2)) * 2
        rot = jax.random.normal(jax.random.PRNGKey(3), (B, V, 1))
        taus = jnp.array([3, 5], jnp.int32)
        out, state = gcm(params, obs, pos, rot, taus, gcm.initial_state(B, 1))
        o = np.array(out)
        assert np.allclose(o[0, 3:], 0.0)  # outputs beyond tau zero-padded
        assert np.array(state.t).tolist() == [3, 5]

    def test_knn_mode(self):
        B, V = 1, 8
        in_dim = 4
        gnn = NavDenseGNN([DenseGraphConv(in_dim, 4), jnp.tanh])
        gcm = NavGCM(gnn, max_verts=V, k=2, causal=True, edge_method="knn")
        params = gcm.init(jax.random.PRNGKey(0))
        obs = jnp.ones((B, V, 1))
        pos = jnp.arange(B * V * 2, dtype=jnp.float32).reshape(B, V, 2)
        rot = jnp.zeros((B, V, 1))
        taus = jnp.full((B,), V, jnp.int32)
        out, _ = gcm(params, obs, pos, rot, taus, gcm.initial_state(B, 1))
        assert np.isfinite(np.array(out)).all()

    def test_full_mode_runs(self):
        B, V = 2, 6
        gcm = make_nav(max_verts=V, causal=False)
        params = gcm.init(jax.random.PRNGKey(0))
        obs = jax.random.normal(jax.random.PRNGKey(1), (B, V, 1))
        pos = jax.random.normal(jax.random.PRNGKey(2), (B, V, 2))
        rot = jnp.zeros((B, V, 1))
        taus = jnp.full((B,), V, jnp.int32)
        out, state = gcm(params, obs, pos, rot, taus, gcm.initial_state(B, 1))
        assert np.isfinite(np.array(out)).all()
        assert out.shape == (B, V, 4)

    def test_grads_flow(self):
        B, V = 2, 8
        gcm = make_nav(max_verts=V)
        params = gcm.init(jax.random.PRNGKey(0))
        obs = jax.random.normal(jax.random.PRNGKey(1), (B, V, 1))
        pos = jax.random.normal(jax.random.PRNGKey(2), (B, V, 2))
        rot = jnp.zeros((B, V, 1))
        taus = jnp.full((B,), V, jnp.int32)

        def loss(p):
            o, _ = gcm(p, obs, pos, rot, taus, gcm.initial_state(B, 1))
            return jnp.sum(o ** 2)

        g = jax.grad(loss)(params)
        tot = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(tot) and tot > 0


class TestNavPoseGNN:
    """Pose-aware nav conv: relative-geometry messages, train≡inference."""

    def _make(self, V=8):
        from gcm_tpu.nn.nav_conv import NavPoseGNN, NavRelPosConv

        gnn = NavPoseGNN([NavRelPosConv(1, 4), jnp.tanh])
        return NavGCM(gnn, max_verts=V, r=3.0, k=16, causal=True,
                      edge_method="radius")

    def test_train_inference_parity(self):
        B, V = 2, 8
        gcm = self._make(V)
        params = gcm.init(jax.random.PRNGKey(0))
        obs = jax.random.normal(jax.random.PRNGKey(1), (B, V, 1))
        pos = jax.random.normal(jax.random.PRNGKey(2), (B, V, 2))
        rot = jax.random.normal(jax.random.PRNGKey(3), (B, V, 1))
        taus = jnp.full((B,), V, jnp.int32)
        train_out, _ = gcm(params, obs, pos, rot, taus,
                           gcm.initial_state(B, 1))
        state = gcm.initial_state(B, 1)
        tau1 = jnp.ones((B,), jnp.int32)
        for i in range(V):
            o, state = gcm(params, obs[:, i : i + 1], pos[:, i : i + 1],
                           rot[:, i : i + 1], tau1, state)
            assert np.allclose(np.array(o), np.array(train_out[:, i : i + 1]),
                               atol=1e-5), f"step {i}"

    def test_message_uses_relative_pose(self):
        """Shifting all positions uniformly must not change outputs
        (translation invariance of relative-pose messages), while shifting
        one node does."""
        from gcm_tpu.nn.nav_conv import NavPoseGNN, NavRelPosConv

        gnn = NavPoseGNN([NavRelPosConv(1, 4)])
        params = gnn.init(jax.random.PRNGKey(0))
        B, V = 1, 5
        x = jax.random.normal(jax.random.PRNGKey(1), (B, V, 1))
        pos = jax.random.normal(jax.random.PRNGKey(2), (B, V, 2))
        rot = jnp.zeros((B, V, 1))
        adj = jnp.ones((B, V, V)) - jnp.eye(V)[None]
        valid = jnp.ones((B, V), bool)
        out1 = gnn(params, x, adj, pos, rot, valid, None, None)
        out2 = gnn(params, x, adj, pos + 7.0, rot, valid, None, None)
        assert np.allclose(np.array(out1), np.array(out2), atol=1e-5)
        out3 = gnn(params, x, adj, pos.at[0, 2].add(1.0), rot, valid,
                   None, None)
        assert not np.allclose(np.array(out1), np.array(out3), atol=1e-3)

    def test_grads_flow(self):
        B, V = 2, 6
        gcm = self._make(V)
        params = gcm.init(jax.random.PRNGKey(0))
        obs = jax.random.normal(jax.random.PRNGKey(1), (B, V, 1))
        pos = jax.random.normal(jax.random.PRNGKey(2), (B, V, 2))
        rot = jnp.zeros((B, V, 1))
        taus = jnp.full((B,), V, jnp.int32)

        def loss(p):
            o, _ = gcm(p, obs, pos, rot, taus, gcm.initial_state(B, 1))
            return jnp.sum(o ** 2)

        g = jax.grad(loss)(params)
        tot = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(tot) and tot > 0


class TestIncrementalParity:
    """NavGCMIncremental ≡ NavGCM(causal=True): the cached-feature fast path
    must reproduce the full-recompute outputs over chained windows, ragged
    taus, and the k-nearest cap binding."""

    def _models(self, V=16, k=3, r=2.5, layers=2, edge_method="radius"):
        from gcm_tpu.models.nav_gcm import NavGCMIncremental

        in_dim = 2 + 2 + 1
        stack = []
        dim = in_dim
        for _ in range(layers):
            stack += [DenseGraphConv(dim, 4), jnp.tanh]
            dim = 4
        gnn = NavDenseGNN(stack)
        ref = NavGCM(gnn, max_verts=V, r=r, k=k, causal=True,
                     edge_method=edge_method)
        fast = NavGCMIncremental(gnn, max_verts=V, r=r, k=k,
                                 edge_method=edge_method)
        params = ref.init(jax.random.PRNGKey(0))
        return ref, fast, params

    def _chain(self, ref, fast, params, B, V, taus_seq, seed=1):
        s_ref = ref.initial_state(B, 2)
        s_fast = fast.initial_state(B, 2)
        key = jax.random.PRNGKey(seed)
        for wi, taus in enumerate(taus_seq):
            t = int(jnp.max(taus))
            key, k1, k2, k3 = jax.random.split(key, 4)
            obs = jax.random.normal(k1, (B, t, 2))
            pos = jax.random.normal(k2, (B, t, 2)) * 2.0
            rot = jax.random.normal(k3, (B, t, 1))
            o_ref, s_ref = ref(params, obs, pos, rot, taus, s_ref)
            o_fast, s_fast = fast(params, obs, pos, rot, taus, s_fast)
            assert np.allclose(np.array(o_fast), np.array(o_ref),
                               atol=1e-5), f"window {wi}"
        for a, b in zip((s_ref.x, s_ref.pos, s_ref.rot, s_ref.t),
                        (s_fast.x, s_fast.pos, s_fast.rot, s_fast.t)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-6)

    def test_full_taus(self):
        ref, fast, params = self._models()
        taus = [jnp.full((2,), 4, jnp.int32)] * 4
        self._chain(ref, fast, params, B=2, V=16, taus_seq=taus)

    def test_ragged_taus(self):
        ref, fast, params = self._models()
        taus = [jnp.array([3, 4], jnp.int32), jnp.array([4, 2], jnp.int32),
                jnp.array([1, 4], jnp.int32)]
        self._chain(ref, fast, params, B=2, V=16, taus_seq=taus, seed=7)

    def test_knn_mode(self):
        ref, fast, params = self._models(edge_method="knn", k=2)
        taus = [jnp.full((2,), 4, jnp.int32)] * 3
        self._chain(ref, fast, params, B=2, V=16, taus_seq=taus, seed=3)

    def test_single_layer(self):
        ref, fast, params = self._models(layers=1)
        taus = [jnp.full((1,), 5, jnp.int32)] * 3
        self._chain(ref, fast, params, B=1, V=16, taus_seq=taus, seed=5)

    def test_pose_gnn_parity(self):
        """NavPoseGNN stacks (relative-geometry pairwise MLP) through the
        incremental core — the row-restricted message MLP must match the
        full [B,V,V] recompute over chained windows."""
        from gcm_tpu.models.nav_gcm import NavGCMIncremental
        from gcm_tpu.nn.nav_conv import NavPoseGNN, NavRelPosConv

        V, k, r = 16, 3, 2.5
        gnn = NavPoseGNN([NavRelPosConv(2, 4), jnp.tanh,
                          NavRelPosConv(4, 4), jnp.tanh])
        ref = NavGCM(gnn, max_verts=V, r=r, k=k, causal=True,
                     edge_method="radius")
        fast = NavGCMIncremental(gnn, max_verts=V, r=r, k=k,
                                 edge_method="radius")
        params = ref.init(jax.random.PRNGKey(0))
        taus = [jnp.array([3, 4], jnp.int32), jnp.array([4, 2], jnp.int32),
                jnp.array([4, 4], jnp.int32)]
        self._chain(ref, fast, params, B=2, V=V, taus_seq=taus, seed=11)

    def test_grads_flow(self):
        from gcm_tpu.models.nav_gcm import NavGCMIncremental  # noqa: F401

        ref, fast, params = self._models()
        B = 2
        obs = jax.random.normal(jax.random.PRNGKey(1), (B, 4, 2))
        pos = jax.random.normal(jax.random.PRNGKey(2), (B, 4, 2))
        rot = jnp.zeros((B, 4, 1))
        taus = jnp.full((B,), 4, jnp.int32)

        def loss(p):
            o, _ = fast(p, obs, pos, rot, taus, fast.initial_state(B, 2))
            return jnp.sum(o ** 2)

        g = jax.grad(loss)(params)
        tot = sum(float(jnp.abs(l).sum())
                  for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(tot) and tot > 0


class TestIncrementalProperty:
    """Randomized NavGCMIncremental ≡ NavGCM(causal) parity: random ragged
    tau sequences (including zero-step windows), edge methods, k caps, and
    vertex budgets — the cached-feature algebra must hold for any chaining."""

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(st.data())
    def test_chained_ragged_windows_random(self, data):
        from gcm_tpu.models.nav_gcm import NavGCMIncremental

        st_ = self.st
        V = data.draw(st_.integers(6, 20), label="V")
        B = data.draw(st_.integers(1, 3), label="B")
        k = data.draw(st_.integers(1, 4), label="k")
        edge_method = data.draw(st_.sampled_from(["radius", "knn"]),
                                label="edge_method")
        n_windows = data.draw(st_.integers(1, 4), label="n_windows")
        seed = data.draw(st_.integers(0, 2**16), label="seed")

        in_dim = 2 + 2 + 1
        gnn = NavDenseGNN([DenseGraphConv(in_dim, 4), jnp.tanh,
                           DenseGraphConv(4, 4), jnp.tanh])
        ref = NavGCM(gnn, max_verts=V, r=2.0, k=k, causal=True,
                     edge_method=edge_method)
        fast = NavGCMIncremental(gnn, max_verts=V, r=2.0, k=k,
                                 edge_method=edge_method)
        params = ref.init(jax.random.PRNGKey(seed))

        rng = np.random.default_rng(seed)
        s_ref = ref.initial_state(B, 2)
        s_fast = fast.initial_state(B, 2)
        key = jax.random.PRNGKey(seed + 1)
        total = np.zeros(B, np.int64)
        for _ in range(n_windows):
            # ragged taus, capped so the vertex budget is never exceeded
            room = V - total
            taus = np.minimum(rng.integers(0, 4, size=B), room)
            if taus.max() == 0:
                taus[int(np.argmax(room))] = min(1, int(room.max()))
            if taus.max() == 0:
                break
            total += taus
            t = int(taus.max())
            key, k1, k2, k3 = jax.random.split(key, 4)
            obs = jax.random.normal(k1, (B, t, 2))
            pos = jax.random.normal(k2, (B, t, 2)) * 2.0
            rot = jax.random.normal(k3, (B, t, 1))
            taus_j = jnp.asarray(taus, jnp.int32)
            o_ref, s_ref = ref(params, obs, pos, rot, taus_j, s_ref)
            o_fast, s_fast = fast(params, obs, pos, rot, taus_j, s_fast)
            assert np.allclose(np.array(o_fast), np.array(o_ref),
                               atol=1e-4)
        for a, b in zip((s_ref.x, s_ref.pos, s_ref.rot, s_ref.t),
                        (s_fast.x, s_fast.pos, s_fast.rot, s_fast.t)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-5)


class TestNavCoreDispatch:
    """nav_core(): measured V-crossover dispatch between the full-recompute
    and cached-incremental cores (config.NAV_INCREMENTAL_MIN_V; the
    incremental core is output-identical, TestIncrementalParity, so the
    dispatch is a pure perf decision)."""

    def _gnn(self, feats=1):
        in_dim = feats + 2 + 1
        return NavDenseGNN([DenseGraphConv(in_dim, 4), jnp.tanh])

    def test_small_map_routes_full(self):
        from gcm_tpu import nav_core
        from gcm_tpu.models.nav_gcm import NavGCMIncremental

        core = nav_core(self._gnn(), max_verts=128)
        assert isinstance(core, NavGCM)
        assert not isinstance(core, NavGCMIncremental)

    def test_large_map_routes_incremental(self):
        from gcm_tpu import config, nav_core
        from gcm_tpu.models.nav_gcm import NavGCMIncremental

        core = nav_core(self._gnn(),
                        max_verts=config.NAV_INCREMENTAL_MIN_V)
        assert isinstance(core, NavGCMIncremental)

    def test_structural_fallbacks(self):
        from gcm_tpu import config, nav_core
        from gcm_tpu.models.nav_gcm import NavGCMIncremental

        V = config.NAV_INCREMENTAL_MIN_V
        # non-causal and pooled modes are full-recompute only
        assert not isinstance(nav_core(self._gnn(), max_verts=V,
                                       causal=False), NavGCMIncremental)
        assert not isinstance(nav_core(self._gnn(), max_verts=V, pool=True),
                              NavGCMIncremental)
        pooled = nav_core(self._gnn(), max_verts=V, pool=True)
        assert pooled.pool

        # a GNN the incremental core cannot cache falls back cleanly
        class Opaque:
            layers = None

            def init(self, key):
                return {}

        assert isinstance(nav_core(Opaque(), max_verts=V), NavGCM)

    def test_dispatched_core_runs(self):
        from gcm_tpu import config, nav_core

        V = config.NAV_INCREMENTAL_MIN_V
        core = nav_core(self._gnn(), max_verts=V)
        params = core.init(jax.random.PRNGKey(0))
        B, tau = 2, 4
        x = jax.random.normal(jax.random.PRNGKey(1), (B, tau, 1))
        pos = jax.random.normal(jax.random.PRNGKey(2), (B, tau, 2))
        rot = jax.random.normal(jax.random.PRNGKey(3), (B, tau, 1))
        taus = jnp.full((B,), tau, jnp.int32)
        out, st = core(params, x, pos, rot, taus, core.initial_state(B, 1))
        assert out.shape == (B, tau, 4)
        assert bool(jnp.all(jnp.isfinite(out)))
