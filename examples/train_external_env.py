"""End-to-end external-environment workflow: host-stepped Python envs,
device-stepped GCM policy, native C++ replay buffer, sparse whole-window
training.

This is the TPU-native analog of the reference's rllib integration
(tests/test_ray_gcm.py:29-46: an external CartPole env driving RayDenseGCM
through a framework boundary): the env below is plain numpy — no jax — to
stand in for any real simulator; episodes stream through
native/host_buffer.cpp and training replays padded windows through
SparseGCM's single time-batched call.

Run:  python examples/train_external_env.py [--updates 60]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import optax

from gcm_tpu.data.host_buffer import HostReplayBuffer
from gcm_tpu.edges.sparse_temporal import TemporalEdge
from gcm_tpu.rl.external import (
    HostEnvPool,
    collect_host_episodes,
    episode_batch_to_device,
    make_offline_a2c_update,
)
from gcm_tpu.rl.wrappers import SparseGCMActorCritic


class PyTMaze:
    """Pure-Python (numpy) T-maze — an 'external' env with no jax anywhere.
    The goal side is shown only at the corridor start; the agent must turn
    the remembered way at the junction (memory task)."""

    def __init__(self, corridor_length=4, rng=None):
        self.L = corridor_length
        self.obs_dim = 4
        self.num_actions = 3
        self.rng = rng or np.random.default_rng(0)

    def _obs(self):
        at_start = self.pos == 0
        at_junction = self.pos >= self.L
        return np.array([
            1.0 if at_start and self.goal == 0 else 0.0,
            1.0 if at_start and self.goal == 1 else 0.0,
            0.0 if at_junction else 1.0,
            1.0 if at_junction else 0.0,
        ], np.float32)

    def reset(self):
        self.goal = int(self.rng.integers(0, 2))
        self.pos = 0
        self.t = 0
        return self._obs()

    def step(self, action):
        at_junction = self.pos >= self.L
        self.t += 1
        if at_junction and action in (1, 2):
            correct = (action - 1) == self.goal
            return self._obs(), (4.0 if correct else -0.1), True
        if action == 0 and not at_junction:
            self.pos += 1
            return self._obs(), 0.0, self.t > self.L + 2
        return self._obs(), -0.1, self.t > self.L + 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=60)
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--corridor", type=int, default=4)
    ap.add_argument("--native-cartpole", action="store_true",
                    help="use the C++ vectorized CartPole pool "
                         "(rl.native_env, 44x the Python env loop) instead "
                         "of the Python T-maze")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the sitecustomize pins "
                         "the TPU plugin, which hangs when the tunnel is "
                         "down; JAX_PLATFORMS alone is ignored)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.native_cartpole:
        from gcm_tpu.rl.native_env import NativeCartPolePool

        pool = NativeCartPolePool(args.envs, horizon=24, reward_scale=0.1,
                                  seed=100)
        T_max = pool.horizon
    else:
        pool = HostEnvPool([PyTMaze(args.corridor,
                                    np.random.default_rng(100 + i))
                            for i in range(args.envs)])
        T_max = args.corridor + 4
    policy = SparseGCMActorCritic(
        pool.obs_dim, pool.num_actions, pool.num_actions,
        graph_size=T_max + 1, gnn_input_size=32, gnn_output_size=32,
        edge_selectors=TemporalEdge([1]), max_edges=4 * T_max,
        use_prev_action=True)
    params = policy.init(jax.random.PRNGKey(0))
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    update = make_offline_a2c_update(policy, opt)
    buf = HostReplayBuffer(capacity_steps=200_000, obs_dim=pool.obs_dim)

    key = jax.random.PRNGKey(1)
    B_train = 32
    print(f"backend={jax.default_backend()} envs={args.envs} "
          f"T_max={T_max}", flush=True)
    for u in range(args.updates):
        key, kc = jax.random.split(key)
        n_eps, mean_ret = collect_host_episodes(
            pool, policy, params, buf, steps=2 * T_max, key=kc)
        obs, acts, rews, taus = buf.sample(B_train, T_max, seed=u)
        batch = episode_batch_to_device(obs, acts, rews, taus, gamma=0.99)
        params, opt_state, metrics = update(params, opt_state, batch)
        if u % 10 == 0 or u == args.updates - 1:
            print(f"update {u:3d}: buffer={buf.total_steps} steps/"
                  f"{buf.num_episodes} eps  collect_return={mean_ret:.2f}  "
                  f"loss={float(metrics['loss']):.3f}", flush=True)

    # greedy evaluation
    n_eps, mean_ret = collect_host_episodes(
        pool, policy, params, buf, steps=4 * T_max, key=key, greedy=True)
    note = ("(reward 0.1/step, horizon 24)" if args.native_cartpole
            else "(optimal = 4.0, memoryless ~ 1.95)")
    print(f"greedy eval over {n_eps} episodes: mean return {mean_ret:.2f} "
          f"{note}", flush=True)
    return mean_ret


if __name__ == "__main__":
    main()
