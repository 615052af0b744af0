"""Toy memory POMDP, fully vectorized in JAX.

Replaces the reference's CartPole/rllib integration test vehicle
(tests/test_ray_gcm.py:12-46) with a memory task that actually *requires* the
graph memory: at t=0 the env shows a cue symbol; all later observations are
noise; at the final step the agent is rewarded for choosing the action
matching the cue. A memoryless policy scores 1/num_symbols; a working memory
scores ~1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RecallEnvState(NamedTuple):
    cue: jax.Array     # [B] int32
    t: jax.Array       # [B] int32


class TMazeState(NamedTuple):
    goal: jax.Array  # [B] int32: 0 = left, 1 = right
    pos: jax.Array   # [B] int32 position along the corridor


class TMazeEnv:
    """Classic T-maze memory POMDP (Bakker 2001): the goal side is shown only
    at the corridor start; the agent walks the corridor and must turn the
    remembered way at the junction. Reward 4 for the correct turn, -0.1 for
    the wrong one (standard shaping), -0.1 for bumping.

    Actions: 0 = forward, 1 = left, 2 = right.
    Obs: [goal_left, goal_right, in_corridor, at_junction].
    """

    def __init__(self, corridor_length: int = 6):
        self.corridor_length = corridor_length
        self.horizon = corridor_length + 1
        self.obs_dim = 4
        self.num_actions = 3

    def reset(self, key, B: int):
        goal = jax.random.randint(key, (B,), 0, 2)
        state = TMazeState(goal=goal, pos=jnp.zeros((B,), jnp.int32))
        return self._obs(state), state

    def _obs(self, state):
        at_start = state.pos == 0
        at_junction = state.pos >= self.corridor_length
        goal_l = (at_start & (state.goal == 0)).astype(jnp.float32)
        goal_r = (at_start & (state.goal == 1)).astype(jnp.float32)
        corridor = (~at_junction).astype(jnp.float32)
        junction = at_junction.astype(jnp.float32)
        return jnp.stack([goal_l, goal_r, corridor, junction], axis=-1)

    def step(self, state: TMazeState, action, key):
        at_junction = state.pos >= self.corridor_length
        forward = action == 0
        turn = jnp.where(action == 1, 0, jnp.where(action == 2, 1, -1))
        correct = at_junction & (turn == state.goal)
        wrong_turn = at_junction & (turn >= 0) & (turn != state.goal)
        reward = jnp.where(correct, 4.0,
                           jnp.where(wrong_turn, -0.1,
                                     jnp.where(forward & ~at_junction, 0.0,
                                               -0.1)))
        done = at_junction & (turn >= 0)
        # timeout at horizon
        done = done | (state.pos >= self.horizon)
        new_pos = jnp.where(done, 0,
                            jnp.where(forward & ~at_junction,
                                      state.pos + 1, state.pos))
        new_goal = jnp.where(done,
                             jax.random.randint(key, state.goal.shape, 0, 2),
                             state.goal)
        new_state = TMazeState(goal=new_goal, pos=new_pos)
        return self._obs(new_state), reward, done, new_state


class CartPoleState(NamedTuple):
    x: jax.Array          # [B] cart position
    x_dot: jax.Array      # [B] cart velocity
    theta: jax.Array      # [B] pole angle (rad)
    theta_dot: jax.Array  # [B] pole angular velocity
    t: jax.Array          # [B] int32 steps since episode start


class CartPoleEnv:
    """CartPole (the reference's rllib integration-test vehicle,
    tests/test_ray_gcm.py:29-46 trains A2C on CartPole-v0) as a fully
    vectorized JAX env — classic Gym dynamics (Euler, tau=0.02, ±10 N
    force), reward 1 per step, termination at |x|>2.4 or |theta|>12°, time
    cap `horizon`, auto-reset on done (uniform ±0.05 init).

    masked_velocity=True drops x_dot/theta_dot from the observation — the
    classic POMDP variant where a memoryless policy cannot infer the state
    and the graph memory has to supply the missing derivatives. Measured
    (A2C, 600 updates, B=64, horizon 64, reward_scale 0.05, CPU): a banded
    GCM policy (hops=[1,2], graph_size=16) saturates the 64-step cap
    (eplen 63.4, exactly 64.0 from update ~500) while the memoryless
    control (graph_size=1, no reachable edges) plateaus at eplen ~54;
    random is ~20."""

    GRAVITY = 9.8
    MASS_CART = 1.0
    MASS_POLE = 0.1
    LENGTH = 0.5  # half pole length
    FORCE_MAG = 10.0
    TAU = 0.02
    X_LIMIT = 2.4
    THETA_LIMIT = 12 * 2 * jnp.pi / 360

    def __init__(self, horizon: int = 64, masked_velocity: bool = False,
                 reward_scale: float = 1.0):
        # reward_scale: multiplies the per-step reward. Gym semantics are
        # 1/step, but undiscounted returns then reach ~horizon and the A2C
        # value loss (0.5 · (R − V)²) dwarfs the policy gradient — measured:
        # scale 1.0 learns 24.8→26.0 episode length in 200 updates, scale
        # 0.05 reaches the 48-step cap (tests/test_cartpole.py).
        self.horizon = horizon
        self.masked_velocity = masked_velocity
        self.reward_scale = reward_scale
        self.obs_dim = 2 if masked_velocity else 4
        self.num_actions = 2

    def _init_state(self, key, B):
        v = jax.random.uniform(key, (4, B), minval=-0.05, maxval=0.05)
        return CartPoleState(x=v[0], x_dot=v[1], theta=v[2], theta_dot=v[3],
                             t=jnp.zeros((B,), jnp.int32))

    def reset(self, key, B: int):
        state = self._init_state(key, B)
        return self._obs(state), state

    def _obs(self, s: CartPoleState):
        if self.masked_velocity:
            return jnp.stack([s.x, s.theta], axis=-1)
        return jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot], axis=-1)

    def step(self, s: CartPoleState, action, key):
        force = jnp.where(action == 1, self.FORCE_MAG, -self.FORCE_MAG)
        costh = jnp.cos(s.theta)
        sinth = jnp.sin(s.theta)
        total_mass = self.MASS_CART + self.MASS_POLE
        pml = self.MASS_POLE * self.LENGTH
        temp = (force + pml * s.theta_dot ** 2 * sinth) / total_mass
        theta_acc = (self.GRAVITY * sinth - costh * temp) / (
            self.LENGTH * (4.0 / 3.0 - self.MASS_POLE * costh ** 2
                           / total_mass))
        x_acc = temp - pml * theta_acc * costh / total_mass
        x = s.x + self.TAU * s.x_dot
        x_dot = s.x_dot + self.TAU * x_acc
        theta = s.theta + self.TAU * s.theta_dot
        theta_dot = s.theta_dot + self.TAU * theta_acc
        t = s.t + 1

        fell = (jnp.abs(x) > self.X_LIMIT) | (jnp.abs(theta)
                                              > self.THETA_LIMIT)
        done = fell | (t >= self.horizon)
        # 1 per step while alive (Gym semantics), times reward_scale
        reward = jnp.full_like(x, self.reward_scale)

        fresh = self._init_state(key, x.shape[0])
        pick = lambda new, init: jnp.where(done, init, new)  # noqa: E731
        new_state = CartPoleState(
            x=pick(x, fresh.x), x_dot=pick(x_dot, fresh.x_dot),
            theta=pick(theta, fresh.theta),
            theta_dot=pick(theta_dot, fresh.theta_dot),
            t=pick(t, fresh.t),
        )
        return self._obs(new_state), reward, done, new_state


class RecallEnv:
    """Episode length `horizon`; obs = [one-hot cue (t=0 only) ‖ noise ‖
    query flag]. Reward 1 at the last step iff action == cue."""

    def __init__(self, num_symbols: int = 4, horizon: int = 8,
                 noise_dim: int = 4):
        self.num_symbols = num_symbols
        self.horizon = horizon
        self.noise_dim = noise_dim
        self.obs_dim = num_symbols + noise_dim + 1
        self.num_actions = num_symbols

    def reset(self, key, B: int):
        cue = jax.random.randint(key, (B,), 0, self.num_symbols)
        state = RecallEnvState(cue=cue, t=jnp.zeros((B,), jnp.int32))
        return self._obs(state, key), state

    def _obs(self, state, key):
        B = state.cue.shape[0]
        show = (state.t == 0)[:, None]
        cue_oh = jax.nn.one_hot(state.cue, self.num_symbols) * show
        noise = jax.random.normal(key, (B, self.noise_dim)) * 0.1
        query = (state.t == self.horizon - 1)[:, None].astype(jnp.float32)
        return jnp.concatenate([cue_oh, noise, query], axis=-1)

    def step(self, state: RecallEnvState, action, key):
        is_last = state.t == self.horizon - 1
        reward = jnp.where(is_last & (action == state.cue), 1.0, 0.0)
        done = is_last
        new_t = jnp.where(done, 0, state.t + 1)
        new_cue = jnp.where(
            done,
            jax.random.randint(key, state.cue.shape, 0, self.num_symbols),
            state.cue,
        )
        new_state = RecallEnvState(cue=new_cue, t=new_t)
        obs = self._obs(new_state, jax.random.fold_in(key, 1))
        return obs, reward, done, new_state


class ContinuousRecallState(NamedTuple):
    target: jax.Array  # [B] float32 in [-1, 1]
    t: jax.Array       # [B] int32


class ContinuousRecallEnv:
    """Continuous-action memory task (the DiagGaussian counterpart of
    RecallEnv): t=0 shows a scalar target in [-1, 1], later steps are noise,
    and the last step rewards 1 − (action − target)² for the 1-D continuous
    action. A memoryless policy's best score is 1 − Var(target) = 2/3;
    remembering the cue reaches ~1. Same interface as the discrete envs;
    actions are [B, 1] float."""

    act_dim = 1

    def __init__(self, horizon: int = 8, noise_dim: int = 4):
        self.horizon = horizon
        self.noise_dim = noise_dim
        self.obs_dim = 1 + noise_dim + 1  # target ‖ noise ‖ query flag

    def reset(self, key, B: int):
        target = jax.random.uniform(key, (B,), minval=-1.0, maxval=1.0)
        state = ContinuousRecallState(target=target,
                                      t=jnp.zeros((B,), jnp.int32))
        return self._obs(state, key), state

    def _obs(self, state, key):
        B = state.target.shape[0]
        show = (state.t == 0).astype(jnp.float32)[:, None]
        cue = state.target[:, None] * show
        noise = jax.random.normal(key, (B, self.noise_dim)) * 0.1
        query = (state.t == self.horizon - 1)[:, None].astype(jnp.float32)
        return jnp.concatenate([cue, noise, query], axis=-1)

    def step(self, state: ContinuousRecallState, action, key):
        is_last = state.t == self.horizon - 1
        err = (action[:, 0] - state.target) ** 2
        reward = jnp.where(is_last, 1.0 - err, 0.0)
        done = is_last
        new_t = jnp.where(done, 0, state.t + 1)
        new_target = jnp.where(
            done,
            jax.random.uniform(key, state.target.shape,
                               minval=-1.0, maxval=1.0),
            state.target,
        )
        new_state = ContinuousRecallState(target=new_target, t=new_t)
        obs = self._obs(new_state, jax.random.fold_in(key, 1))
        return obs, reward, done, new_state
