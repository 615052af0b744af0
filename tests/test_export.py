"""Serving export round trip: serialize the inference step, reload it, and
get identical beliefs without touching model-building code."""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.models.presets import readme_dense_gcm
from gcm_tpu.serve.export import export_step, load_step


class TestExport:
    def test_round_trip_identical_outputs(self):
        model = readme_dense_gcm(obs_size=8, hidden=16, graph_size=8)
        params = model.init(jax.random.PRNGKey(0))
        B = 2
        state = model.initial_state(B, 8)
        obs = jax.random.normal(jax.random.PRNGKey(1), (B, 8))

        blob, _ = export_step(model, params, obs, state)
        assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0

        step = load_step(bytes(blob))
        # run several steps through the deserialized artifact
        want_state = state
        got_state = state
        for t in range(3):
            x = jax.random.normal(jax.random.PRNGKey(10 + t), (B, 8))
            want, want_state = model(params, x, want_state)
            got, got_state = step(params, x, got_state)
            assert np.allclose(np.array(want), np.array(got), atol=1e-6)
        assert np.allclose(np.array(want_state.nodes),
                           np.array(got_state.nodes), atol=1e-6)
