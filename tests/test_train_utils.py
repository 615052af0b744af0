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
