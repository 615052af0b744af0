"""Nav RL integration tests: PointGoalNav env contract, collect-vs-replay
belief parity through the incremental/full core pair, and the offline A2C
update (the nav analog of the external-env workflow tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gcm_tpu.rl.nav import NavActorCritic, PointGoalNav, make_nav_a2c_update


class TestPointGoalNav:
    def test_goal_only_at_reset(self):
        env = PointGoalNav(horizon=8, rng=np.random.default_rng(0))
        o0 = env.reset()
        assert o0.shape == (5,)
        assert np.linalg.norm(o0[:2]) > 0  # goal visible
        o1, r, d = env.step(2)
        assert np.all(o1[:2] == 0.0)  # goal hidden after t=0

    def test_terminates(self):
        env = PointGoalNav(horizon=5, rng=np.random.default_rng(1))
        env.reset()
        done = False
        for _ in range(5):
            _, _, done = env.step(2)
            if done:
                break
        assert done

    def test_reaching_goal_rewards(self):
        env = PointGoalNav(horizon=10, goal_radius=2.0, step_size=1.0,
                           reach=1.0, rng=np.random.default_rng(2))
        env.reset()
        env.goal = np.array([2.0, 0.0])  # straight ahead (theta=0)
        total, done = 0.0, False
        while not done:
            _, r, done = env.step(2)
            total += r
        # potential shaping sums to (d0 - d_end) >= 1, plus the +1 bonus
        assert total > 1.5


def _rollout(policy, params, env, T):
    """Step-by-step collection with the incremental core; returns the
    per-step logits and the (obs, act) trajectory."""
    obs = env.reset()
    mem = policy.initial_state(1)
    prev = jnp.zeros((1,), jnp.int32)
    step_j = jax.jit(policy.step)
    logits_seq, obs_seq, act_seq = [], [], []
    for t in range(T):
        logits, _v, mem = step_j(params, jnp.asarray(obs)[None], mem,
                                 prev_action=prev)
        a = int(jnp.argmax(logits, -1)[0])
        logits_seq.append(np.array(logits[0]))
        obs_seq.append(obs)
        act_seq.append(a)
        obs, _, done = env.step(a)
        if done:
            obs = env.reset()
            break
        prev = jnp.array([a], jnp.int32)
    return (np.stack(logits_seq), np.stack(obs_seq),
            np.array(act_seq, np.int32))


class TestCollectReplayParity:
    def test_step_logits_match_whole_window_replay(self):
        env = PointGoalNav(horizon=8, rng=np.random.default_rng(3))
        policy = NavActorCritic(env.obs_dim, env.num_actions, max_verts=16,
                                hidden=8, k=4, r=2.5)
        params = policy.init(jax.random.PRNGKey(0))
        logits_collect, obs_seq, acts = _rollout(policy, params, env, T=6)
        T = obs_seq.shape[0]
        prev = np.concatenate([[0], acts[:-1]]).astype(np.int32)
        logits_replay, _values, _ = policy(
            params, jnp.asarray(obs_seq)[None], None,
            prev_actions=jnp.asarray(prev)[None],
            taus=jnp.full((1,), T, jnp.int32))
        assert np.allclose(logits_collect, np.array(logits_replay[0]),
                           atol=1e-5)


class TestNavUpdate:
    def test_update_runs_and_learns_signal(self):
        env = PointGoalNav(horizon=6, rng=np.random.default_rng(4))
        policy = NavActorCritic(env.obs_dim, env.num_actions, max_verts=8,
                                hidden=8, k=4, r=2.5)
        params = policy.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)
        update = make_nav_a2c_update(policy, opt)

        B, T = 4, 6
        key = jax.random.PRNGKey(1)
        k1, k2, k3 = jax.random.split(key, 3)
        batch = {
            "obs": jax.random.normal(k1, (B, T, env.obs_dim)),
            "actions": jax.random.randint(k2, (B, T), 0, env.num_actions),
            "prev_actions": jnp.zeros((B, T), jnp.int32),
            "returns": jax.random.normal(k3, (B, T)),
            "taus": jnp.array([6, 4, 6, 2], jnp.int32),
            "valid": jnp.arange(T)[None, :] < jnp.array([6, 4, 6, 2])[:, None],
        }
        p0 = jax.tree_util.tree_leaves(params)[0].copy()
        params2, opt_state, metrics = update(params, opt_state, batch)
        assert np.isfinite(float(metrics["loss"]))
        moved = any(
            not np.allclose(np.array(a), np.array(b))
            for a, b in zip(jax.tree_util.tree_leaves(params),
                            jax.tree_util.tree_leaves(params2)))
        assert moved

    @pytest.mark.slow
    def test_end_to_end_short_run(self):
        """Tiny end-to-end loop through collect -> native buffer -> update."""
        from gcm_tpu.data.host_buffer import HostReplayBuffer
        from gcm_tpu.rl.external import (HostEnvPool, collect_host_episodes,
                                         episode_batch_to_device)

        pool = HostEnvPool([PointGoalNav(horizon=6,
                                         rng=np.random.default_rng(10 + i))
                            for i in range(2)])
        policy = NavActorCritic(pool.obs_dim, pool.num_actions, max_verts=8,
                                hidden=8, k=4, r=2.5)
        params = policy.init(jax.random.PRNGKey(0))
        opt = optax.adam(3e-3)
        opt_state = opt.init(params)
        update = make_nav_a2c_update(policy, opt)
        buf = HostReplayBuffer(capacity_steps=10_000, obs_dim=pool.obs_dim)
        key = jax.random.PRNGKey(2)
        for u in range(2):
            key, kc = jax.random.split(key)
            collect_host_episodes(pool, policy, params, buf, steps=8, key=kc)
            assert buf.num_episodes > 0
            obs, acts, rews, taus = buf.sample(4, 6, seed=u)
            batch = episode_batch_to_device(obs, acts, rews, taus, 0.99)
            params, opt_state, metrics = update(params, opt_state, batch)
            assert np.isfinite(float(metrics["loss"]))
