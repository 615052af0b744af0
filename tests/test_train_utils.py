"""Checkpoint/resume and debug-guard tests (SURVEY.md §5 equivalents)."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.models.presets import readme_dense_gcm
from gcm_tpu.train.checkpoint import make_manager, restore, save
from gcm_tpu.utils.debug import assert_causal_edges, nan_guard


class TestCheckpoint:
    def test_save_restore_params_and_memory_state(self):
        model = readme_dense_gcm(obs_size=4, hidden=8, graph_size=8)
        params = model.init(jax.random.PRNGKey(0))
        state = model.initial_state(2, 4)
        xs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4))
        _, state = model.scan(params, xs, state)
        tree = {"params": params, "memory": state._asdict()}

        with tempfile.TemporaryDirectory() as d:
            mgr = make_manager(d)
            save(mgr, 0, tree)
            got = restore(mgr, template=tree)
            for a, b in zip(jax.tree_util.tree_leaves(tree),
                            jax.tree_util.tree_leaves(got)):
                assert np.allclose(np.array(a), np.array(b))

    def test_latest_step_resume(self):
        with tempfile.TemporaryDirectory() as d:
            mgr = make_manager(d)
            save(mgr, 0, {"x": jnp.zeros(3)})
            save(mgr, 5, {"x": jnp.ones(3)})
            got = restore(mgr, template={"x": jnp.zeros(3)})
            assert np.allclose(np.array(got["x"]), 1.0)


class TestGuards:
    def test_nan_guard_raises_on_nan(self):
        @nan_guard
        def bad(x):
            return x / 0.0

        err, _ = bad(jnp.zeros(3))
        with pytest.raises(Exception):
            err.throw()

    def test_nan_guard_clean(self):
        @nan_guard
        def good(x):
            return jnp.tanh(x)

        err, out = good(jnp.ones(3))
        err.throw()  # no error
        assert np.allclose(np.array(out), np.tanh(1.0))

    def test_causality_check(self):
        good = jnp.array([[[3, 2, -1], [1, 0, -1]]], jnp.int32)
        bad = jnp.array([[[1, -1], [2, -1]]], jnp.int32)
        assert bool(assert_causal_edges(good))
        assert not bool(assert_causal_edges(bad))


class TestShardedCheckpoint:
    def test_save_restore_sharded_params(self):
        """Checkpoint/restore of a dp/tp-sharded param tree on the virtual
        mesh — the multi-chip checkpointing claim (SURVEY.md §5)."""
        import pytest

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from gcm_tpu.parallel.mesh import make_mesh
        from gcm_tpu.parallel.sharding import param_specs, to_named

        model = readme_dense_gcm(obs_size=4, hidden=16, graph_size=8)
        params = model.init(jax.random.PRNGKey(0))
        mesh = make_mesh(dp=4, tp=2)
        shardings = to_named(mesh, param_specs(params))
        sharded = jax.tree_util.tree_map(jax.device_put, params, shardings)

        with tempfile.TemporaryDirectory() as d:
            mgr = make_manager(d)
            save(mgr, 0, {"params": sharded})
            got = restore(mgr, template={"params": sharded})["params"]
            for a, b in zip(jax.tree_util.tree_leaves(sharded),
                            jax.tree_util.tree_leaves(got)):
                assert np.allclose(np.array(a), np.array(b))
                # restored arrays carry the same sharding
                assert b.sharding.is_equivalent_to(a.sharding, a.ndim)


class TestResilientTraining:
    """Crash-resume training driver (train/resilient.py) — closes the
    SURVEY.md §5 'failure detection / elastic recovery' gap (the reference
    has none; fixed-shape serializable state is its only primitive)."""

    def _trainer(self):
        from gcm_tpu.edges.temporal import TemporalBackedge
        from gcm_tpu.rl.a2c import A2C
        from gcm_tpu.rl.env import RecallEnv
        from gcm_tpu.rl.wrappers import GCMActorCritic

        env = RecallEnv(num_symbols=2, horizon=4, noise_dim=2)
        pol = GCMActorCritic(env.obs_dim, env.num_actions, env.num_actions,
                             graph_size=env.horizon + 1, gnn_input_size=8,
                             gnn_output_size=8,
                             edge_selectors=TemporalBackedge([1]))
        return A2C(env, pol)

    def test_resume_equals_uninterrupted(self, tmp_path):
        import jax

        from gcm_tpu.train.resilient import train_resilient

        # uninterrupted: 6 updates
        p_full, _ = train_resilient(
            self._trainer(), str(tmp_path / "full"), updates=6, B=4,
            key=jax.random.PRNGKey(7), checkpoint_every=2)
        # crash after 4, then restart asking for 6 — resumes at 4
        p_a, _ = train_resilient(
            self._trainer(), str(tmp_path / "crashed"), updates=4, B=4,
            key=jax.random.PRNGKey(7), checkpoint_every=2)
        p_b, hist = train_resilient(
            self._trainer(), str(tmp_path / "crashed"), updates=6, B=4,
            key=jax.random.PRNGKey(7), checkpoint_every=2)
        assert len(hist) == 2  # only the 2 post-resume updates ran
        for a, b in zip(jax.tree_util.tree_leaves(p_full),
                        jax.tree_util.tree_leaves(p_b)):
            assert np.array_equal(np.array(a), np.array(b))

    def test_fresh_start_when_no_checkpoint(self, tmp_path):
        import jax

        from gcm_tpu.train.resilient import train_resilient

        p, hist = train_resilient(
            self._trainer(), str(tmp_path / "fresh"), updates=3, B=4,
            key=jax.random.PRNGKey(0), checkpoint_every=10)
        assert len(hist) == 3
        assert all(np.isfinite(h) for h in hist)


class TestPrecisionUtils:
    def test_cast_pytree_floats_only(self):
        from gcm_tpu.utils.precision import cast_pytree
        from gcm_tpu.models.presets import readme_dense_gcm

        model = readme_dense_gcm(obs_size=4, hidden=8, graph_size=8)
        params = model.init(jax.random.PRNGKey(0))
        state = model.initial_state(2, 4)
        bf_params = cast_pytree(params)
        bf_state = cast_pytree(state)
        for a in jax.tree_util.tree_leaves(bf_params):
            assert a.dtype == jnp.bfloat16
        assert bf_state.num_nodes.dtype == jnp.int32  # ints untouched
        assert bf_state.nodes.dtype == jnp.bfloat16
        # the cast model still steps
        out, _ = model(bf_params, jnp.ones((2, 4), jnp.bfloat16), bf_state)
        assert out.dtype == jnp.bfloat16

    def test_param_count_and_summary(self):
        from gcm_tpu.models.presets import readme_dense_gcm
        from gcm_tpu.utils.precision import param_count, summarize

        model = readme_dense_gcm(obs_size=4, hidden=8, graph_size=8)
        params = model.init(jax.random.PRNGKey(0))
        n = param_count(params)
        hand = sum(int(np.prod(a.shape))
                   for a in jax.tree_util.tree_leaves(params))
        assert n == hand and n > 0
        s = summarize(params)
        assert "TOTAL" in s and f"{n:,}" in s


class TestTrajectorySupervisedStep:
    """make_trajectory_supervised_step: the train-aware window-vs-scan
    dispatch as a first-class training-step factory (the reference's
    per-step rollout vs whole-window training split, ray_gcm.py:200-202 vs
    ray_sparse_gcm.py:201-213)."""

    def _model(self, N=8):
        from gcm_tpu.edges.distance import EuclideanEdge
        from gcm_tpu.models.ring_gcm import RingDenseGCM
        from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
        from gcm_tpu.nn.module import MLP, Linear

        gnn = DenseGNN([DenseGraphConv(8, 8), jnp.tanh,
                        DenseGraphConv(8, 8), jnp.tanh])
        return RingDenseGCM(
            gnn, preprocessor=MLP([Linear(4, 8)]),
            edge_selectors=EuclideanEdge(max_distance=1.0), graph_size=N)

    def test_window_dispatch_matches_scan_step(self, monkeypatch):
        import optax

        from gcm_tpu import config
        from gcm_tpu.train.train_step import (
            make_dense_supervised_step, make_trajectory_supervised_step)

        model = self._model(N=8)
        params = model.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 4))
        tgt = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 8))
        opt = optax.adam(1e-2)

        # force the training gate on — the factory must bind window()
        monkeypatch.setattr(config, "RING_WINDOW_TRAIN_MIN_N", 8)
        spy = []
        real_window = model.window
        monkeypatch.setattr(
            model, "window",
            lambda *a, **k: spy.append("window") or real_window(*a, **k))
        step_w = make_trajectory_supervised_step(model, opt)
        p_w, _, l_w = step_w(params, opt.init(params), xs, tgt)
        assert spy == ["window"]

        step_s = make_dense_supervised_step(model, opt)
        p_s, _, l_s = step_s(params, opt.init(params), xs, tgt)
        assert np.allclose(float(l_w), float(l_s), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p_w),
                        jax.tree_util.tree_leaves(p_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_scan_dispatch_below_gate(self, monkeypatch):
        import optax

        from gcm_tpu import config
        from gcm_tpu.train.train_step import make_trajectory_supervised_step

        model = self._model(N=8)
        monkeypatch.setattr(config, "RING_WINDOW_TRAIN_MIN_N", 1 << 30)
        spy = []
        real_scan = model.scan
        monkeypatch.setattr(
            model, "scan",
            lambda *a, **k: spy.append("scan") or real_scan(*a, **k))
        opt = optax.adam(1e-2)
        step = make_trajectory_supervised_step(model, opt)
        params = model.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 4))
        tgt = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 8))
        step(params, opt.init(params), xs, tgt)
        assert spy == ["scan"]
