"""External-environment adapter: host-stepped envs, device-stepped policy.

The reference's L4 exists to plug GCM into a real RL ecosystem — rllib calls
`RayDenseGCM.forward` with observations produced by arbitrary (CPU, Python)
environments (reference ray_gcm.py:21-212, exercised on CartPole in
tests/test_ray_gcm.py:29-46). The TPU-native equivalent splits the loop at
the host/device boundary:

- the ENV steps on the host (any Python object with the gym-style protocol
  below — no jax required, so real simulators plug in),
- the POLICY steps on the device (one jitted `policy.step` per env tick,
  recurrent graph memory carried on-device between ticks),
- finished episodes stream into the native `HostReplayBuffer`
  (native/host_buffer.cpp), and
- training samples fixed-shape padded windows ([B, T_max, F] + taus) from
  the buffer and replays them through the sparse core in ONE time-batched
  call — the reference's RaySparseGCM whole-window execution mode
  (ray_sparse_gcm.py:201-213).

See examples/train_external_env.py for the end-to-end workflow.
"""

from __future__ import annotations

from typing import Protocol, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class PythonEnv(Protocol):
    """Minimal gym-style host environment protocol."""

    obs_dim: int
    num_actions: int

    def reset(self) -> np.ndarray: ...           # -> obs [obs_dim]

    def step(self, action: int):                 # -> (obs, reward, done)
        ...


class HostEnvPool:
    """Vectorizes a set of host Python envs behind a batched interface.
    Auto-resets finished envs (the reset obs starts the next episode)."""

    def __init__(self, envs: Sequence[PythonEnv]):
        assert envs
        self.envs = list(envs)
        self.obs_dim = envs[0].obs_dim
        self.num_actions = envs[0].num_actions

    def __len__(self):
        return len(self.envs)

    def reset(self) -> np.ndarray:
        return np.stack([e.reset() for e in self.envs]).astype(np.float32)

    def step(self, actions: np.ndarray):
        obs = np.empty((len(self.envs), self.obs_dim), np.float32)
        rew = np.empty((len(self.envs),), np.float32)
        done = np.empty((len(self.envs),), bool)
        for i, (e, a) in enumerate(zip(self.envs, actions)):
            o, r, d = e.step(int(a))
            if d:
                o = e.reset()
            obs[i], rew[i], done[i] = o, r, d
        return obs, rew, done


def collect_host_episodes(pool: HostEnvPool, policy, params, buffer,
                          steps: int, key, greedy: bool = False):
    """Run the device policy against the host env pool for `steps` ticks,
    appending every FINISHED episode to `buffer` (HostReplayBuffer). The
    recurrent graph memory lives on device and is reset per-env at episode
    boundaries (reference ray adapters get this from rllib's episode
    handling). Returns (episodes_appended, mean_episode_return)."""
    from gcm_tpu.core.graph_state import reset_where

    B = len(pool)
    step_j = jax.jit(policy.step)
    obs = pool.reset()
    mem = policy.initial_state(B)
    prev = jnp.zeros((B,), jnp.int32)
    partial = [{"obs": [], "act": [], "rew": []} for _ in range(B)]
    n_eps, returns = 0, []
    for _ in range(steps):
        logits, _v, mem = step_j(params, jnp.asarray(obs), mem,
                                 prev_action=prev)
        if greedy:
            act = np.asarray(jnp.argmax(logits, axis=-1))
        else:
            key, sub = jax.random.split(key)
            act = np.asarray(jax.random.categorical(sub, logits))
        nobs, rew, done = pool.step(act)
        for i in range(B):
            partial[i]["obs"].append(obs[i])
            partial[i]["act"].append(act[i])
            partial[i]["rew"].append(rew[i])
            if done[i]:
                ep = partial[i]
                buffer.append(np.stack(ep["obs"]),
                              np.asarray(ep["act"], np.int32),
                              np.asarray(ep["rew"], np.float32))
                returns.append(float(np.sum(ep["rew"])))
                n_eps += 1
                partial[i] = {"obs": [], "act": [], "rew": []}
        d = jnp.asarray(done)
        mem = reset_where(mem, d)
        prev = jnp.where(d, 0, jnp.asarray(act))
        obs = nobs
    return n_eps, (float(np.mean(returns)) if returns else 0.0)


def episode_batch_to_device(obs, acts, rews, taus, gamma: float):
    """Turn a HostReplayBuffer sample (padded episodes) into the device-side
    training batch for the sparse whole-window core: prev-actions shifted
    within episode, per-step validity, discounted returns."""
    obs = jnp.asarray(obs)
    acts = jnp.asarray(acts)
    rews = jnp.asarray(rews)
    taus = jnp.asarray(taus)
    B, T = acts.shape
    valid = jnp.arange(T)[None, :] < taus[:, None]
    prev = jnp.concatenate(
        [jnp.zeros((B, 1), acts.dtype), acts[:, :-1]], axis=1) * valid
    # backward discounted sum within the valid prefix
    def scan_fn(carry, rv):
        r, v = rv
        carry = jnp.where(v, r + gamma * carry, 0.0)
        return carry, carry
    rT = jnp.swapaxes(jnp.where(valid, rews, 0.0), 0, 1)[::-1]
    vT = jnp.swapaxes(valid, 0, 1)[::-1]
    _, rets = jax.lax.scan(scan_fn, jnp.zeros(B), (rT, vT))
    returns = jnp.swapaxes(rets[::-1], 0, 1)
    return {"obs": obs, "actions": acts, "prev_actions": prev,
            "returns": returns, "taus": taus, "valid": valid}


def make_offline_a2c_update(policy, opt, value_coef: float = 0.5,
                            entropy_coef: float = 0.01):
    """Jitted A2C-style update over buffer-sampled episode batches through
    the sparse core's single whole-window call (masked to valid steps)."""

    def loss(params, batch):
        B = batch["obs"].shape[0]
        mem = policy.initial_state(B)
        logits, values, _ = policy(params, batch["obs"], mem,
                                   prev_actions=batch["prev_actions"],
                                   taus=batch["taus"])
        v = batch["valid"]
        nv = jnp.maximum(jnp.sum(v), 1)
        adv = jax.lax.stop_gradient(batch["returns"] - values)
        logp = jax.nn.log_softmax(logits)
        alogp = jnp.take_along_axis(logp, batch["actions"][..., None],
                                    axis=-1)[..., 0]
        pg = -jnp.sum(jnp.where(v, alogp * adv, 0.0)) / nv
        vl = jnp.sum(jnp.where(v, (batch["returns"] - values) ** 2, 0.0)) / nv
        ent = -jnp.sum(jnp.where(v, jnp.sum(jnp.exp(logp) * logp, -1),
                                 0.0)) / nv
        return pg + value_coef * vl - entropy_coef * ent, {
            "pg": pg, "v": vl, "entropy": ent}

    @jax.jit
    def update(params, opt_state, batch):
        import optax

        (l, metrics), grads = jax.value_and_grad(loss, has_aux=True)(
            params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["loss"] = l
        return params, opt_state, metrics

    return update
