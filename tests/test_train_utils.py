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
