"""Native (C++) vectorized CartPole pool for the external-env training path.

`rl.external.HostEnvPool` steps per-env Python objects — measured
0.7 ms/tick at B=64, which dominates collection once the device policy tick
is fast (the reference's production posture: envs on host CPUs feeding a
GPU/TPU policy, ray_gcm.py:21-212). `NativeCartPolePool` is the same
batched interface backed by one C call per tick
(native/host_buffer.cpp::ep_step): dynamics replicate
`rl.env.CartPoleEnv` (classic Gym Euler integration, auto-reset,
masked-velocity POMDP mode), parity pinned by tests/test_native_env.py.

Drop-in wherever a `HostEnvPool` is accepted (`collect_host_episodes`).
"""

from __future__ import annotations

import ctypes

import numpy as np

from gcm_tpu.data.host_buffer import _load


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeCartPolePool:
    num_actions = 2

    def __init__(self, n: int, horizon: int = 64,
                 masked_velocity: bool = False, reward_scale: float = 1.0,
                 seed: int = 0):
        self._lib = _load()
        self._h = self._lib.ep_create(n, horizon, int(masked_velocity),
                                      float(reward_scale), seed)
        self.n = n
        self.horizon = horizon
        self.obs_dim = int(self._lib.ep_obs_dim(self._h))
        self._obs = np.empty((n, self.obs_dim), np.float32)
        self._rew = np.empty((n,), np.float32)
        self._done = np.empty((n,), np.uint8)

    def __len__(self):
        return self.n

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.ep_destroy(h)
            self._h = None

    def reset(self) -> np.ndarray:
        self._lib.ep_reset(self._h, _f32p(self._obs))
        return self._obs.copy()

    def set_state(self, x, x_dot, theta, theta_dot) -> None:
        """Test hook: overwrite the physical state (episode clocks to 0)."""
        arrs = [np.ascontiguousarray(a, np.float32)
                for a in (x, x_dot, theta, theta_dot)]
        assert all(a.shape == (self.n,) for a in arrs)
        self._lib.ep_set_state(self._h, *[_f32p(a) for a in arrs])

    def step(self, actions: np.ndarray):
        """One batch tick. Returns (obs [n, obs_dim], rewards [n],
        dones [n] bool); finished envs auto-reset and return the next
        episode's first observation — HostEnvPool semantics."""
        acts = np.ascontiguousarray(actions, np.int32)
        assert acts.shape == (self.n,)
        self._lib.ep_step(
            self._h, acts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            _f32p(self._obs), _f32p(self._rew),
            self._done.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return (self._obs.copy(), self._rew.copy(),
                self._done.astype(bool))
