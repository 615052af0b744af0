"""External-env adapter: host-stepped Python envs → device policy → native
replay buffer → sparse whole-window training (the reference's framework-
interop role, ray_gcm.py:21-212 / test_ray_gcm.py:29-46, without Ray)."""

import sys
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "examples"))

from gcm_tpu.data.host_buffer import HostReplayBuffer
from gcm_tpu.edges.sparse_temporal import TemporalEdge
from gcm_tpu.rl.external import (
    HostEnvPool,
    collect_host_episodes,
    episode_batch_to_device,
    make_offline_a2c_update,
)
from gcm_tpu.rl.wrappers import SparseGCMActorCritic


def _make():
    from train_external_env import PyTMaze

    pool = HostEnvPool([PyTMaze(2, np.random.default_rng(i))
                        for i in range(4)])
    T_max = 6
    policy = SparseGCMActorCritic(
        pool.obs_dim, pool.num_actions, pool.num_actions,
        graph_size=T_max + 1, gnn_input_size=8, gnn_output_size=8,
        edge_selectors=TemporalEdge([1]), max_edges=4 * T_max,
        use_prev_action=True)
    return pool, policy, T_max


def test_collect_fills_buffer_and_update_runs():
    pool, policy, T_max = _make()
    params = policy.init(jax.random.PRNGKey(0))
    buf = HostReplayBuffer(capacity_steps=10_000, obs_dim=pool.obs_dim)
    n_eps, _ = collect_host_episodes(pool, policy, params, buf, steps=20,
                                     key=jax.random.PRNGKey(1))
    assert n_eps > 0 and buf.num_episodes == n_eps and buf.total_steps > 0

    obs, acts, rews, taus = buf.sample(8, T_max, seed=0)
    assert obs.shape == (8, T_max, pool.obs_dim)
    assert (taus >= 1).all() and (taus <= T_max).all()
    # padding beyond taus is zero
    for b in range(8):
        assert np.all(obs[b, taus[b]:] == 0.0)

    batch = episode_batch_to_device(obs, acts, rews, taus, gamma=0.9)
    # returns decay correctly within the valid prefix and are 0 in padding
    assert np.all(np.asarray(batch["returns"])[~np.asarray(batch["valid"])]
                  == 0.0)
    # prev_actions are shifted actions within the episode
    assert np.all(np.asarray(batch["prev_actions"])[:, 0] == 0)

    opt = optax.adam(1e-3)
    update = make_offline_a2c_update(policy, opt)
    params2, _opt_state, metrics = update(params, opt.init(params), batch)
    assert np.isfinite(float(metrics["loss"]))
    # parameters actually moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params2)))
    assert moved


def test_returns_match_manual_discount():
    rews = np.array([[1.0, 1.0, 1.0, 0.0]], np.float32)
    taus = np.array([3], np.int32)
    obs = np.zeros((1, 4, 2), np.float32)
    acts = np.zeros((1, 4), np.int32)
    b = episode_batch_to_device(obs, acts, rews, taus, gamma=0.5)
    want = np.array([[1 + 0.5 * (1 + 0.5), 1.5, 1.0, 0.0]])
    assert np.allclose(np.asarray(b["returns"]), want)
