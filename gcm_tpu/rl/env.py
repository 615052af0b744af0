"""Toy memory POMDP, fully vectorized in JAX.

Replaces the reference's CartPole/rllib integration test vehicle
(tests/test_ray_gcm.py:12-46) with a memory task that actually *requires* the
graph memory: at t=0 the env shows a cue symbol; all later observations are
noise; at the final step the agent is rewarded for choosing the action
matching the cue. A memoryless policy scores 1/num_symbols; a working memory
scores ~1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RecallEnvState(NamedTuple):
    cue: jax.Array     # [B] int32
    t: jax.Array       # [B] int32


class RecallEnv:
    """Episode length `horizon`; obs = [one-hot cue (t=0 only) ‖ noise ‖
    query flag]. Reward 1 at the last step iff action == cue."""

    def __init__(self, num_symbols: int = 4, horizon: int = 8,
                 noise_dim: int = 4):
        self.num_symbols = num_symbols
        self.horizon = horizon
        self.noise_dim = noise_dim
        self.obs_dim = num_symbols + noise_dim + 1
        self.num_actions = num_symbols

    def reset(self, key, B: int):
        cue = jax.random.randint(key, (B,), 0, self.num_symbols)
        state = RecallEnvState(cue=cue, t=jnp.zeros((B,), jnp.int32))
        return self._obs(state, key), state

    def _obs(self, state, key):
        B = state.cue.shape[0]
        show = (state.t == 0)[:, None]
        cue_oh = jax.nn.one_hot(state.cue, self.num_symbols) * show
        noise = jax.random.normal(key, (B, self.noise_dim)) * 0.1
        query = (state.t == self.horizon - 1)[:, None].astype(jnp.float32)
        return jnp.concatenate([cue_oh, noise, query], axis=-1)

    def step(self, state: RecallEnvState, action, key):
        is_last = state.t == self.horizon - 1
        reward = jnp.where(is_last & (action == state.cue), 1.0, 0.0)
        done = is_last
        new_t = jnp.where(done, 0, state.t + 1)
        new_cue = jnp.where(
            done,
            jax.random.randint(key, state.cue.shape, 0, self.num_symbols),
            state.cue,
        )
        new_state = RecallEnvState(cue=new_cue, t=new_t)
        obs = self._obs(new_state, jax.random.fold_in(key, 1))
        return obs, reward, done, new_state
