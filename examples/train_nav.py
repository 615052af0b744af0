"""Habitat-style navigation training for NavGCM (ROADMAP item 6).

Point-goal navigation with memory: the goal vector is observable only on the
first step; the agent navigates by remembered goal + streaming odometry.
Collection steps through NavGCMIncremental (cached causal features, O(tau*V)
per tick); episodes stream into the native C++ replay buffer; training
replays whole episodes through NavGCM's single time-batched call — the two
cores are output-identical, so collect-time and replay-time beliefs match.

The reference uses NavGCM in its habitat experiments but ships no RL adapter
(src/gcm/nav_gcm.py is a bare module); this is the TPU-native integration.

Run:  python examples/train_nav.py [--updates 80]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import optax

from gcm_tpu.data.host_buffer import HostReplayBuffer
from gcm_tpu.rl.external import (
    HostEnvPool,
    collect_host_episodes,
    episode_batch_to_device,
)
from gcm_tpu.rl.nav import NavActorCritic, PointGoalNav, make_nav_a2c_update


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=80)
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--horizon", type=int, default=24)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (JAX_PLATFORMS is ignored "
                         "by the sitecustomize; needed when the TPU tunnel "
                         "is down)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    pool = HostEnvPool([PointGoalNav(horizon=args.horizon,
                                     rng=np.random.default_rng(100 + i))
                        for i in range(args.envs)])
    policy = NavActorCritic(pool.obs_dim, pool.num_actions,
                            max_verts=args.horizon + 2, hidden=32,
                            k=8, r=2.5)
    params = policy.init(jax.random.PRNGKey(0))
    # clipping + a real entropy bonus: without them the policy learns, then
    # collapses once entropy dwindles (observed at ~150 updates)
    opt = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(5e-4))
    opt_state = opt.init(params)
    update = make_nav_a2c_update(policy, opt, entropy_coef=0.03)
    # tight capacity = FIFO recency window (the native buffer evicts oldest
    # episodes over capacity) — keeps the vanilla-PG update near-on-policy;
    # wider windows (40 collections) were measured to learn then diverge
    # from stale-policy replay
    buf = HostReplayBuffer(capacity_steps=4 * args.envs * args.horizon,
                           obs_dim=pool.obs_dim)

    key = jax.random.PRNGKey(1)
    B_train = 32
    print(f"backend={jax.default_backend()} envs={args.envs} "
          f"horizon={args.horizon}", flush=True)
    for u in range(args.updates):
        key, kc = jax.random.split(key)
        n_eps, mean_ret = collect_host_episodes(
            pool, policy, params, buf, steps=args.horizon + 2, key=kc)
        obs, acts, rews, taus = buf.sample(B_train, args.horizon, seed=u)
        batch = episode_batch_to_device(obs, acts, rews, taus, gamma=0.99)
        params, opt_state, metrics = update(params, opt_state, batch)
        if u % 10 == 0 or u == args.updates - 1:
            print(f"update {u:3d}: buffer={buf.total_steps} steps/"
                  f"{buf.num_episodes} eps  collect_return={mean_ret:.2f}  "
                  f"loss={float(metrics['loss']):.3f}", flush=True)

    n_eps, mean_ret = collect_host_episodes(
        pool, policy, params, buf, steps=2 * args.horizon, key=key,
        greedy=True)
    print(f"greedy eval over {n_eps} episodes: mean return {mean_ret:.2f} "
          f"(reaching the goal ~ {3.0 + 1.0:.1f}; random walk ~ 0)",
          flush=True)
    return mean_ret


if __name__ == "__main__":
    main()
