"""Action distributions for the RL trainers.

The reference is action-space-agnostic by delegation: its model emits
`num_outputs` logits and rllib's action distribution turns them into
discrete or continuous actions (ray_gcm.py:173-212 serves either). Without
rllib the trainers own that role; A2C/PPO take a `dist=` (default
Categorical — the behavior to date, bit-identical) and every
sample/log_prob/entropy/prev-action decision goes through it.

Contract (all shapes batched arbitrarily, logits [..., num_outputs]):
- sample(key, logits) -> actions
- log_prob(logits, actions) -> [...]  (per-sample)
- entropy(logits) -> [...]            (per-sample)
- neutral_action(B) -> the "no previous action" placeholder the rollout
  carry starts from (and resets to at episode boundaries)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


class Categorical:
    """Discrete actions from a softmax over logits (rllib's default for
    Discrete spaces; matches the trainers' original inline math exactly)."""

    def sample(self, key, logits):
        return jax.random.categorical(key, logits)

    def log_prob(self, logits, actions):
        logp = jax.nn.log_softmax(logits)
        return jnp.take_along_axis(logp, actions[..., None], axis=-1)[..., 0]

    def entropy(self, logits):
        logp = jax.nn.log_softmax(logits)
        return -jnp.sum(jnp.exp(logp) * logp, axis=-1)

    def neutral_action(self, B):
        return jnp.zeros((B,), jnp.int32)

    def reset_prev(self, actions, done):
        return jnp.where(done, 0, actions)


class DiagGaussian:
    """Continuous actions: logits [..., 2*act_dim] = [mean ‖ log_std]
    (rllib's DiagGaussian layout — num_outputs must be 2*act_dim).
    log_std is clamped to [min_log_std, max_log_std] for stability; the
    clamp is differentiable-through (hard clip, gradient zero outside)."""

    def __init__(self, act_dim: int, min_log_std: float = -5.0,
                 max_log_std: float = 2.0):
        self.act_dim = act_dim
        self.min_log_std = min_log_std
        self.max_log_std = max_log_std

    def _split(self, logits):
        assert logits.shape[-1] == 2 * self.act_dim, (
            f"DiagGaussian needs num_outputs == 2*act_dim "
            f"({2 * self.act_dim}), got {logits.shape[-1]}")
        mean = logits[..., : self.act_dim]
        log_std = jnp.clip(logits[..., self.act_dim:],
                           self.min_log_std, self.max_log_std)
        return mean, log_std

    def sample(self, key, logits):
        mean, log_std = self._split(logits)
        return mean + jnp.exp(log_std) * jax.random.normal(
            key, mean.shape, mean.dtype)

    def log_prob(self, logits, actions):
        mean, log_std = self._split(logits)
        z = (actions - mean) * jnp.exp(-log_std)
        per_dim = -0.5 * z ** 2 - log_std - 0.5 * math.log(2.0 * math.pi)
        return jnp.sum(per_dim, axis=-1)

    def entropy(self, logits):
        _, log_std = self._split(logits)
        return jnp.sum(log_std + 0.5 * math.log(2.0 * math.pi * math.e),
                       axis=-1)

    def neutral_action(self, B):
        return jnp.zeros((B, self.act_dim), jnp.float32)

    def reset_prev(self, actions, done):
        return jnp.where(done[..., None], 0.0, actions)
