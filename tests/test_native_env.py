"""Native C++ CartPole pool (native/host_buffer.cpp::ep_*) — dynamics
parity vs the JAX CartPoleEnv, HostEnvPool auto-reset semantics, and the
end-to-end external-env collection path on the native pool."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.rl.env import CartPoleEnv, CartPoleState
from gcm_tpu.rl.native_env import NativeCartPolePool

B = 4


def make_state(rng, B):
    v = rng.uniform(-0.05, 0.05, (4, B)).astype(np.float32)
    return v


class TestNativeCartPole:
    def test_dynamics_parity_vs_jax_env(self):
        """Identical states + identical actions -> identical (obs, reward,
        done) per step until each env's first termination (after a done the
        auto-reset RNGs legitimately differ)."""
        horizon = 10
        env = CartPoleEnv(horizon=horizon, reward_scale=0.5)
        pool = NativeCartPolePool(B, horizon=horizon, reward_scale=0.5,
                                  seed=1)
        rng = np.random.default_rng(0)
        v = make_state(rng, B)
        pool.set_state(*v)
        js = CartPoleState(x=jnp.asarray(v[0]), x_dot=jnp.asarray(v[1]),
                           theta=jnp.asarray(v[2]),
                           theta_dot=jnp.asarray(v[3]),
                           t=jnp.zeros((B,), jnp.int32))
        alive = np.ones((B,), bool)  # not yet terminated once
        acts = rng.integers(0, 2, (horizon + 2, B))
        for t in range(horizon + 2):
            jobs, jrew, jdone, js = env.step(
                js, jnp.asarray(acts[t]), jax.random.PRNGKey(100 + t))
            nobs, nrew, ndone = pool.step(acts[t])
            np.testing.assert_allclose(nrew[alive],
                                       np.asarray(jrew)[alive])
            np.testing.assert_array_equal(ndone[alive],
                                          np.asarray(jdone)[alive])
            # on a done tick both sides return the NEXT episode's freshly
            # sampled init obs — legitimately different RNGs; physics
            # parity is checked on the still-running envs only
            run = alive & ~np.asarray(jdone)
            np.testing.assert_allclose(nobs[run], np.asarray(jobs)[run],
                                       rtol=1e-5, atol=1e-6)
            alive = run
            if not alive.any():
                break
        assert not alive.all()  # the horizon cap fired for someone

    def test_masked_velocity_obs(self):
        pool = NativeCartPolePool(B, masked_velocity=True, seed=2)
        assert pool.obs_dim == 2
        rng = np.random.default_rng(1)
        v = make_state(rng, B)
        pool.set_state(*v)
        obs, _, _ = pool.step(np.zeros(B, np.int64))
        # masked obs = [x, theta] only
        assert obs.shape == (B, 2)

    def test_auto_reset_and_horizon_cap(self):
        horizon = 5
        pool = NativeCartPolePool(B, horizon=horizon, seed=3)
        pool.reset()
        dones = []
        for t in range(horizon * 3):
            _, _, d = pool.step(np.random.default_rng(t).integers(0, 2, B))
            dones.append(d)
        d = np.stack(dones)
        # every env terminates at least twice in 3*horizon random steps
        assert (d.sum(axis=0) >= 2).all()
        # after a done, the returned obs is a fresh-init state (|x| <= .05
        # plus at most one integration step wouldn't apply: reset exact)
        pool2 = NativeCartPolePool(1, horizon=2, seed=4)
        pool2.reset()
        _, _, d1 = pool2.step(np.zeros(1, np.int32))
        obs, _, d2 = pool2.step(np.zeros(1, np.int32))  # t cap -> reset
        assert d2[0]
        assert np.all(np.abs(obs) <= 0.05 + 1e-6)

    def test_collection_path_end_to_end(self):
        """collect_host_episodes runs unmodified on the native pool and
        fills the native replay buffer (the all-native host data path)."""
        from gcm_tpu.data.host_buffer import HostReplayBuffer
        from gcm_tpu.edges.temporal import TemporalBackedge
        from gcm_tpu.rl.external import collect_host_episodes
        from gcm_tpu.rl.wrappers import GCMActorCritic

        pool = NativeCartPolePool(3, horizon=6, seed=5)
        policy = GCMActorCritic(pool.obs_dim, pool.num_actions,
                                pool.num_actions, graph_size=8,
                                gnn_input_size=8, gnn_output_size=8,
                                edge_selectors=TemporalBackedge([1]),
                                core="banded", use_prev_action=False)
        params = policy.init(jax.random.PRNGKey(0))
        buf = HostReplayBuffer(capacity_steps=512, obs_dim=pool.obs_dim)
        n_eps, mean_ret = collect_host_episodes(
            pool, policy, params, buf, steps=20, key=jax.random.PRNGKey(1))
        assert n_eps >= 3
        assert buf.num_episodes >= 3
        assert mean_ret > 0

    def test_throughput_exceeds_python_pool(self):
        """The point of the native pool: >= 5x the per-env Python loop at
        B=64 (measured ~30x; generous margin keeps CI stable)."""
        from gcm_tpu.rl.external import HostEnvPool

        class PyCartPole:
            obs_dim, num_actions = 4, 2

            def __init__(self, seed):
                self.rng = np.random.default_rng(seed)
                self.reset()

            def reset(self):
                self.s = self.rng.uniform(-0.05, 0.05, 4)
                self.t = 0
                return self.s.copy()

            def step(self, a):
                x, xd, th, thd = self.s
                f = 10.0 if a == 1 else -10.0
                ct, st = np.cos(th), np.sin(th)
                tmp = (f + 0.05 * thd ** 2 * st) / 1.1
                tha = (9.8 * st - ct * tmp) / (
                    0.5 * (4 / 3 - 0.1 * ct ** 2 / 1.1))
                xa = tmp - 0.05 * tha * ct / 1.1
                self.s = self.s + 0.02 * np.array([xd, xa, thd, tha])
                self.t += 1
                done = (abs(self.s[0]) > 2.4 or abs(self.s[2]) > 0.21
                        or self.t >= 64)
                if done:
                    out = self.s.copy()
                    self.reset()
                    return out, 1.0, True
                return self.s.copy(), 1.0, False

        Bn, T = 64, 200
        acts = np.random.default_rng(0).integers(0, 2, (T, Bn))

        py = HostEnvPool([PyCartPole(i) for i in range(Bn)])
        py.reset()
        t0 = time.perf_counter()
        for t in range(T):
            py.step(acts[t])
        t_py = time.perf_counter() - t0

        nat = NativeCartPolePool(Bn, horizon=64, seed=0)
        nat.reset()
        t0 = time.perf_counter()
        for t in range(T):
            nat.step(acts[t])
        t_nat = time.perf_counter() - t0
        assert t_nat * 5 < t_py, (
            f"native {t_nat*1e3/T:.3f} ms/tick vs python "
            f"{t_py*1e3/T:.3f} ms/tick")
