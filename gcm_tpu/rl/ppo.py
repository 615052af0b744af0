"""PPO trainer with GAE over GCM actor-critic policies, fully jitted.

Complements the A2C trainer (rl/a2c.py): clipped surrogate objective,
generalized advantage estimation, multiple epochs of minibatched updates per
rollout. Minibatches slice the batch axis; each policy evaluation replays the
recurrent memory from the initial state (standard recurrent-PPO practice —
the graph state is cheap to recompute under lax.scan).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from gcm_tpu.rl.a2c import A2C


def gae(rewards, values, dones, gamma, lam):
    """rewards, values, dones: [B, T]. Bootstrap value 0 after the window
    (episodes here end inside the window). Returns (advantages, returns)."""
    B, T = rewards.shape
    nonterm = 1.0 - dones.astype(rewards.dtype)
    next_values = jnp.concatenate([values[:, 1:], jnp.zeros((B, 1))], axis=1)
    deltas = rewards + gamma * next_values * nonterm - values

    def scan_fn(carry, x):
        delta, nt = x
        carry = delta + gamma * lam * nt * carry
        return carry, carry

    dT = jnp.swapaxes(deltas, 0, 1)[::-1]
    nT = jnp.swapaxes(nonterm, 0, 1)[::-1]
    _, adv = jax.lax.scan(scan_fn, jnp.zeros(B), (dT, nT))
    adv = jnp.swapaxes(adv[::-1], 0, 1)
    return adv, adv + values


class PPO(A2C):
    def __init__(self, env, policy, gamma: float = 0.99, lam: float = 0.95,
                 lr: float = 3e-3, clip_eps: float = 0.2,
                 value_coef: float = 0.5, entropy_coef: float = 0.01,
                 epochs: int = 4, num_minibatches: int = 2,
                 rollout_len: int | None = None,
                 log_grad_norms: bool = False,
                 dp_mesh=None, dp_axis: str = "dp",
                 opt=None, max_grad_norm: float | None = None,
                 dist=None, replay_dones: bool = True):
        # dp_mesh: data-parallel training over a mesh, same contract as A2C
        # (the reference's adapter is trainer-agnostic, ray_gcm.py:173-212 —
        # every trainer gets the same batch-sharded execution). The permuted
        # minibatch gather a[idx] would break the batch sharding, so each
        # minibatch is re-constrained onto the dp axis after the gather
        # (GSPMD inserts one all-to-all; numerics are unchanged).
        super().__init__(env, policy, gamma=gamma, lr=lr,
                         value_coef=value_coef, entropy_coef=entropy_coef,
                         rollout_len=rollout_len,
                         log_grad_norms=log_grad_norms,
                         dp_mesh=dp_mesh, dp_axis=dp_axis,
                         opt=opt, max_grad_norm=max_grad_norm, dist=dist,
                         replay_dones=replay_dones)
        self.lam = lam
        self.clip_eps = clip_eps
        self.epochs = epochs
        self.num_minibatches = num_minibatches

    def _evaluate(self, params, traj_mb):
        B = traj_mb["obs"].shape[0]
        mem = self.policy.initial_state(B)
        # dones: replay resets memory at episode boundaries exactly as
        # collect did (reference seq_lens semantics, ray_sparse_gcm.py:195-200)
        from gcm_tpu import config
        from gcm_tpu.rl.wrappers import train_remat_for

        # training-side scan knobs (see rl/a2c.py loss; MEASURE_r4)
        T = traj_mb["obs"].shape[1]
        replay_d = traj_mb["dones"] if self.replay_dones else None
        logits, values, _ = self.policy(params, traj_mb["obs"], mem,
                                        prev_actions=traj_mb["prev_actions"],
                                        dones=replay_d,
                                        unroll=config.SCAN_UNROLL,
                                        remat=train_remat_for(
                                            getattr(self.policy, "core",
                                                    None), T,
                                            dones=replay_d),
                                        train=True)
        logp = self.dist.log_prob(logits, traj_mb["actions"])
        entropy = self.dist.entropy(logits)
        return logp, values, entropy

    def ppo_loss(self, params, traj_mb):
        logp, values, entropy = self._evaluate(params, traj_mb)
        ratio = jnp.exp(logp - traj_mb["logp_old"])
        adv = traj_mb["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        unclipped = ratio * adv
        clipped = jnp.clip(ratio, 1 - self.clip_eps, 1 + self.clip_eps) * adv
        pg_loss = -jnp.mean(jnp.minimum(unclipped, clipped))
        v_loss = jnp.mean((traj_mb["returns"] - values) ** 2)
        ent = jnp.mean(entropy)
        total = pg_loss + self.value_coef * v_loss - self.entropy_coef * ent
        return total, {"pg": pg_loss, "v": v_loss, "entropy": ent}

    @partial(jax.jit, static_argnums=(0, 4))
    def update(self, params, opt_state, key, B: int):
        k_collect, k_perm = jax.random.split(key)
        traj = self._dp_constrain(self.collect(params, k_collect, B))
        logp_old, values, _ = self._evaluate(params, traj)
        adv, returns = gae(traj["rewards"], values, traj["dones"],
                           self.gamma, self.lam)
        traj = {**traj,
                "logp_old": jax.lax.stop_gradient(logp_old),
                "adv": jax.lax.stop_gradient(adv),
                "returns": jax.lax.stop_gradient(returns)}

        mb = B // self.num_minibatches

        def epoch(carry, ek):
            params, opt_state = carry
            perm = jax.random.permutation(ek, B)

            def minibatch(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                traj_mb = self._dp_constrain(
                    jax.tree_util.tree_map(lambda a: a[idx], traj))
                (l, _), grads = jax.value_and_grad(
                    self.ppo_loss, has_aux=True)(params, traj_mb)
                updates, opt_state = self.opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                if self.log_grad_norms:
                    from gcm_tpu.utils.debug import grad_norms

                    return (params, opt_state), (l, grad_norms(grads))
                return (params, opt_state), (l, {})

            (params, opt_state), (losses, norms) = jax.lax.scan(
                minibatch, (params, opt_state),
                jnp.arange(self.num_minibatches))
            return (params, opt_state), (jnp.mean(losses), norms)

        keys = jax.random.split(k_perm, self.epochs)
        (params, opt_state), (losses, norms) = jax.lax.scan(
            epoch, (params, opt_state), keys)
        metrics = {
            "loss": jnp.mean(losses),
            "return": jnp.mean(jnp.sum(traj["rewards"], axis=1)),
        }
        # per-parameter grad-norm observability (reference backward hooks,
        # sparse_edge_selectors/learned.py:67-68,85-87): last update's norms
        metrics.update({k: v[-1, -1] for k, v in norms.items()})
        return params, opt_state, metrics
