"""Minimal A2C trainer over GCM actor-critic policies, fully jitted.

Replicates the capability exercised by the reference's rllib integration
test (tune.run("A2C", ...), tests/test_ray_gcm.py:29-46) without Ray: rollout
collection under the recurrent memory policy (lax.scan over env+policy),
discounted returns, advantage actor-critic loss with entropy bonus, adam.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax


def discounted_returns(rewards, dones, gamma):
    """rewards, dones: [B, T] -> returns [B, T] (resets at dones)."""

    def scan_fn(carry, rd):
        r, d = rd
        carry = r + gamma * carry * (1.0 - d)
        return carry, carry

    rT = jnp.swapaxes(rewards, 0, 1)[::-1]
    dT = jnp.swapaxes(dones.astype(rewards.dtype), 0, 1)[::-1]
    _, rets = jax.lax.scan(scan_fn, jnp.zeros(rewards.shape[0]), (rT, dT))
    return jnp.swapaxes(rets[::-1], 0, 1)


class A2C:
    def __init__(self, env, policy, gamma: float = 0.99, lr: float = 3e-3,
                 value_coef: float = 0.5, entropy_coef: float = 0.01,
                 rollout_len: int | None = None,
                 log_grad_norms: bool = False,
                 dp_mesh=None, dp_axis: str = "dp",
                 opt=None, max_grad_norm: float | None = None,
                 dist=None, replay_dones: bool = True):
        from gcm_tpu.rl.distributions import Categorical

        self.env = env
        self.policy = policy
        # dist: action distribution (rl/distributions.py). Default
        # Categorical — the reference delegates this choice to rllib's
        # action dists (discrete AND continuous trainers share one model,
        # ray_gcm.py:173-212); DiagGaussian gives the continuous side.
        self.dist = dist if dist is not None else Categorical()
        if not isinstance(self.dist, Categorical):
            assert not getattr(policy, "cfg", {}).get(
                "use_prev_action", False), (
                "use_prev_action embeds discrete actions one-hot; disable "
                "it (or extend the wrapper) for continuous distributions")
        # dp_mesh: a jax.sharding.Mesh for data-parallel training. The
        # collected trajectory is sharding-constrained on its batch axis, so
        # GSPMD shards the env rollout, replay, and loss across `dp_axis`
        # and all-reduces the gradients — every memory graph lives wholly on
        # one device (graphs never interact across batch, SURVEY.md N6).
        # B must divide the axis size. None = single-device (default).
        self.dp_mesh = dp_mesh
        self.dp_axis = dp_axis
        self.gamma = gamma
        self.value_coef = value_coef
        self.entropy_coef = entropy_coef
        self.rollout_len = rollout_len or env.horizon
        # opt: any optax GradientTransformation overrides the default
        # adam(lr); max_grad_norm prepends global-norm clipping (the
        # standard rllib grad_clip knob the reference trains under)
        base_opt = opt if opt is not None else optax.adam(lr)
        self.opt = (optax.chain(optax.clip_by_global_norm(max_grad_norm),
                                base_opt)
                    if max_grad_norm is not None else base_opt)
        # per-parameter grad-norm observability (reference registers backward
        # hooks per param, sparse_edge_selectors/learned.py:67-68,85-87)
        self.log_grad_norms = log_grad_norms
        # replay_dones=False: the training replay omits dones. ONLY valid
        # when episodes cannot end mid-rollout (fixed-horizon envs with
        # rollout_len == env.horizon: the final-step reset affects no output,
        # so the replay is mathematically identical — pinned in
        # tests/test_rl.py::TestReplayDones). It unlocks the dones-free fast
        # paths: the ring core's window() training at graph_size >= 512 and
        # the end-to-end sharded sparse core (mesh=). Leave True for envs
        # with early termination (e.g. CartPole).
        self.replay_dones = replay_dones

    def init(self, key):
        params = self.policy.init(key)
        return params, self.opt.init(params)

    # -- rollout (no grads) -------------------------------------------------
    def collect(self, params, key, B: int):
        """Roll the policy for rollout_len steps. Returns trajectory dict."""
        k_reset, k_run = jax.random.split(key)
        obs, env_state = self.env.reset(k_reset, B)
        mem = self.policy.initial_state(B)

        def step(carry, k):
            obs, env_state, mem, prev_a = carry
            logits, value, mem = self.policy.step(params, obs, mem,
                                                  prev_action=prev_a)
            ka, ke = jax.random.split(k)
            action = self.dist.sample(ka, logits)
            nobs, reward, done, env_state = self.env.step(env_state, action, ke)
            out = (obs, action, reward, done, prev_a)
            # episode boundary: wipe the graph memory of finished episodes
            from gcm_tpu.core.graph_state import reset_where

            mem = reset_where(mem, done)
            next_prev = self.dist.reset_prev(action, done)
            return (nobs, env_state, mem, next_prev), out

        keys = jax.random.split(k_run, self.rollout_len)
        _, (obs_seq, actions, rewards, dones, prev_as) = jax.lax.scan(
            step, (obs, env_state, mem, self.dist.neutral_action(B)), keys
        )
        to_bt = lambda x: jnp.swapaxes(x, 0, 1)
        return {
            "obs": to_bt(obs_seq),
            "actions": to_bt(actions),
            "rewards": to_bt(rewards),
            "dones": to_bt(dones),
            "prev_actions": to_bt(prev_as),
        }

    # -- update -------------------------------------------------------------
    def loss(self, params, traj):
        B = traj["obs"].shape[0]
        mem = self.policy.initial_state(B)
        # dones: replay resets memory at episode boundaries exactly as
        # collect did (reference seq_lens semantics, ray_sparse_gcm.py:195-200)
        from gcm_tpu import config
        from gcm_tpu.rl.wrappers import train_remat_for

        # training-side scan knobs (both measured, MEASURE_r4): the backward
        # has no in-place carry rewrite to protect, so even the fused ring
        # core prefers the global SCAN_UNROLL (+17%); chunked checkpointing
        # saves the [B,N,N] carry residual only at chunk boundaries
        # (+50-85% fwd+bwd on the ring core)
        T = traj["obs"].shape[1]
        replay_d = traj["dones"] if self.replay_dones else None
        logits, values, _ = self.policy(params, traj["obs"], mem,
                                        prev_actions=traj["prev_actions"],
                                        dones=replay_d,
                                        unroll=config.SCAN_UNROLL,
                                        remat=train_remat_for(
                                            getattr(self.policy, "core",
                                                    None), T,
                                            dones=replay_d),
                                        train=True)
        returns = discounted_returns(traj["rewards"], traj["dones"], self.gamma)
        adv = jax.lax.stop_gradient(returns - values)
        act_logp = self.dist.log_prob(logits, traj["actions"])
        pg_loss = -jnp.mean(act_logp * adv)
        v_loss = jnp.mean((returns - values) ** 2)
        entropy = jnp.mean(self.dist.entropy(logits))
        total = pg_loss + self.value_coef * v_loss - self.entropy_coef * entropy
        return total, {"pg": pg_loss, "v": v_loss, "entropy": entropy,
                       "return": jnp.mean(jnp.sum(traj["rewards"], axis=1))}

    def _dp_constrain(self, traj):
        if self.dp_mesh is None:
            return traj
        from jax.sharding import NamedSharding, PartitionSpec as P

        def c(a):
            spec = P(self.dp_axis, *([None] * (a.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                a, NamedSharding(self.dp_mesh, spec))

        return jax.tree_util.tree_map(c, traj)

    @partial(jax.jit, static_argnums=(0, 4))
    def update(self, params, opt_state, key, B: int):
        traj = self._dp_constrain(self.collect(params, key, B))
        (l, metrics), grads = jax.value_and_grad(self.loss, has_aux=True)(
            params, traj
        )
        updates, opt_state = self.opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["loss"] = l
        if self.log_grad_norms:
            from gcm_tpu.utils.debug import grad_norms

            metrics.update(grad_norms(grads))
        return params, opt_state, metrics

    def train(self, key, updates: int, B: int = 16, log_every: int = 0):
        params, opt_state = self.init(key)
        history = []
        for i in range(updates):
            key, sub = jax.random.split(key)
            params, opt_state, metrics = self.update(params, opt_state, sub, B)
            history.append(float(metrics["return"]))
            if log_every and i % log_every == 0:
                print(f"update {i}: return={history[-1]:.3f} "
                      f"loss={float(metrics['loss']):.3f}")
        return params, history
