"""CartPoleEnv — the reference's integration-test vehicle
(tests/test_ray_gcm.py:29-46: rllib A2C on CartPole-v0), as a JAX env.

Physics pinned against an independent numpy implementation of the classic
Gym dynamics; downstream sanity = A2C + GCM policy improves episode length
(the reference test is pass/fail on the same vehicle).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.rl.env import CartPoleEnv


def numpy_cartpole_step(s, action):
    """Independent numpy oracle for one Euler step (Gym classic params)."""
    x, x_dot, th, th_dot = s
    force = 10.0 if action == 1 else -10.0
    costh, sinth = np.cos(th), np.sin(th)
    temp = (force + 0.05 * th_dot ** 2 * sinth) / 1.1
    th_acc = (9.8 * sinth - costh * temp) / (
        0.5 * (4.0 / 3.0 - 0.1 * costh ** 2 / 1.1))
    x_acc = temp - 0.05 * th_acc * costh / 1.1
    return (x + 0.02 * x_dot, x_dot + 0.02 * x_acc,
            th + 0.02 * th_dot, th_dot + 0.02 * th_acc)


class TestCartPolePhysics:
    def test_dynamics_match_numpy_oracle(self):
        env = CartPoleEnv(horizon=500)
        obs, st = env.reset(jax.random.PRNGKey(0), B=3)
        ref = [tuple(float(v[b]) for v in
                     (st.x, st.x_dot, st.theta, st.theta_dot))
               for b in range(3)]
        actions = [1, 0, 1, 1, 0, 1, 0, 0, 1, 1]
        for i, a in enumerate(actions):
            act = jnp.full((3,), a, jnp.int32)
            obs, r, done, st = env.step(st, act, jax.random.PRNGKey(i + 1))
            assert not bool(done.any())  # stays alive this long from ±0.05
            ref = [numpy_cartpole_step(s, a) for s in ref]
            for b in range(3):
                got = (float(st.x[b]), float(st.x_dot[b]),
                       float(st.theta[b]), float(st.theta_dot[b]))
                assert np.allclose(got, ref[b], atol=1e-5), (i, b, got,
                                                             ref[b])

    def test_termination_and_autoreset(self):
        env = CartPoleEnv(horizon=500)
        _, st = env.reset(jax.random.PRNGKey(0), B=2)
        # push one batch element over the x limit
        st = st._replace(x=jnp.array([2.5, 0.0]), t=jnp.array([7, 7]))
        obs, r, done, st2 = env.step(st, jnp.array([1, 1]),
                                     jax.random.PRNGKey(1))
        assert bool(done[0]) and not bool(done[1])
        # done element re-initialized (t back to 0, state within ±0.05)
        assert int(st2.t[0]) == 0 and int(st2.t[1]) == 8
        assert abs(float(st2.x[0])) <= 0.05

    def test_time_cap(self):
        env = CartPoleEnv(horizon=5)
        _, st = env.reset(jax.random.PRNGKey(0), B=1)
        done_at = None
        for i in range(6):
            _, _, done, st = env.step(st, jnp.zeros((1,), jnp.int32),
                                      jax.random.PRNGKey(i))
            if bool(done[0]) and done_at is None:
                done_at = i
        assert done_at is not None and done_at <= 5

    def test_masked_velocity_obs(self):
        env = CartPoleEnv(masked_velocity=True)
        obs, st = env.reset(jax.random.PRNGKey(0), B=4)
        assert obs.shape == (4, 2)
        assert env.obs_dim == 2


class TestCartPoleLearns:
    def test_a2c_gcm_improves_episode_length(self):
        """Downstream RL sanity on the reference's vehicle: A2C with a GCM
        policy lengthens CartPole episodes (analog of
        tests/test_ray_gcm.py:29-46's pass/fail tune.run)."""
        from gcm_tpu.edges.temporal import TemporalBackedge
        from gcm_tpu.rl.a2c import A2C
        from gcm_tpu.rl.wrappers import GCMActorCritic

        # reward_scale keeps the value-loss magnitude near the policy
        # gradient's (see CartPoleEnv.__init__ measurement note)
        env = CartPoleEnv(horizon=48, reward_scale=0.05)
        pol = GCMActorCritic(env.obs_dim, env.num_actions, env.num_actions,
                             core="banded", graph_size=env.horizon + 1,
                             gnn_input_size=16, gnn_output_size=16,
                             edge_selectors=TemporalBackedge([1]))
        trainer = A2C(env, pol, lr=3e-3, entropy_coef=0.01)

        def ep_len(params, key, B=64):
            traj = jax.jit(trainer.collect, static_argnums=2)(params, key, B)
            d = np.array(traj["dones"])
            return d.size / max(d.sum(), 1)

        params, opt_state = trainer.init(jax.random.PRNGKey(0))
        before = ep_len(params, jax.random.PRNGKey(100))
        key = jax.random.PRNGKey(1)
        for _ in range(200):
            key, sub = jax.random.split(key)
            params, opt_state, _ = trainer.update(params, opt_state, sub, 32)
        after = ep_len(params, jax.random.PRNGKey(200))
        # measured: reaches the 48-step cap (24.8 -> 48.0) at this config
        assert after > max(before * 1.5, 40.0), (before, after)
