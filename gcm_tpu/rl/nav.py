"""Navigation RL integration for NavGCM (ROADMAP item 6).

The reference ships NavGCM as a bare module (src/gcm/nav_gcm.py:12-263, used
in the paper's habitat experiments) with no RL adapter in-repo. This module
supplies the TPU-native integration end-to-end:

- `PointGoalNav`: a habitat-style host (pure numpy) point-goal task — the
  goal vector is observable only at t=0, so the policy must *remember* it
  across the episode while odometry (pos/rot) streams in. This is exactly
  the regime NavGCM's geometry-indexed memory targets.
- `NavActorCritic`: actor-critic heads over a nav memory core. Collection
  steps through `NavGCMIncremental` (O(τ·V) per step); training replays
  whole episodes through `NavGCM` in ONE time-batched call — the two are
  output-identical (tests/test_nav_gcm.py::TestIncrementalParity), so
  collect-time and replay-time beliefs match, the same contract the dense
  adapter gets from dones threading (rl/wrappers.py:84-248).
- `collect_nav_episodes` / `make_nav_a2c_update`: the external-env workflow
  (rl/external.py) with pose channels threaded through the buffer (pose is
  packed into the observation tail, split on device by `pose_slice`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.models.nav_gcm import NavDenseGNN, NavGCM, NavGCMIncremental
from gcm_tpu.nn.dense_conv import DenseGraphConv
from gcm_tpu.nn.module import Linear


class PointGoalNav:
    """Host point-goal navigation with memory: obs = [goal_dx, goal_dy,
    pos_x, pos_y, heading]; the goal channels are non-zero ONLY on the first
    step of the episode. Actions: 0 turn left, 1 turn right, 2 forward.
    Reward: potential-based (distance decrease), +1 bonus on reaching the
    goal. Episode ends on goal or horizon."""

    def __init__(self, horizon: int = 24, goal_radius: float = 3.0,
                 step_size: float = 1.0, reach: float = 1.0, rng=None):
        self.horizon = horizon
        self.goal_radius = goal_radius
        self.step_size = step_size
        self.reach = reach
        self.obs_dim = 5  # goal(2) + pos(2) + rot(1)
        self.num_actions = 3
        self.rng = rng or np.random.default_rng(0)

    def _obs(self, show_goal: bool) -> np.ndarray:
        goal = self.goal - self.pos if show_goal else np.zeros(2)
        return np.concatenate(
            [goal, self.pos, [self.theta]]).astype(np.float32)

    def reset(self) -> np.ndarray:
        self.pos = np.zeros(2, np.float64)
        self.theta = 0.0
        ang = self.rng.uniform(0, 2 * np.pi)
        self.goal = self.goal_radius * np.array([np.cos(ang), np.sin(ang)])
        self.t = 0
        return self._obs(show_goal=True)

    def step(self, action: int):
        if action == 0:
            self.theta += np.pi / 4
        elif action == 1:
            self.theta -= np.pi / 4
        else:
            self.pos = self.pos + self.step_size * np.array(
                [np.cos(self.theta), np.sin(self.theta)])
        prev_d = np.linalg.norm(self.goal - (
            self.pos - (self.step_size * np.array(
                [np.cos(self.theta), np.sin(self.theta)])
                if action == 2 else 0.0)))
        d = np.linalg.norm(self.goal - self.pos)
        self.t += 1
        reached = d < self.reach
        done = reached or self.t >= self.horizon
        rew = (prev_d - d) + (1.0 if reached else 0.0)
        return self._obs(show_goal=False), float(rew), bool(done)


class NavActorCritic:
    """Actor-critic over a NavGCM memory core.

    Observations carry pose in their TAIL channels: obs[..., pose_slice]
    splits into pos (first pos_dim) and rot (the rest); the head channels
    are the task observation fed to the GNN as node features (pose is
    re-attached by NavDenseGNN's use_pose concat, matching the reference
    test GNN, reference tests/test_nav_gcm.py:13-28)."""

    def __init__(self, obs_dim: int, num_actions: int,
                 pose_dim: int = 3, pos_dim: int = 2,
                 hidden: int = 16, max_verts: int = 32,
                 edge_method: str = "radius", k: int = 8, r: float = 2.5,
                 use_prev_action: bool = True):
        self.obs_dim = obs_dim
        self.num_actions = num_actions
        self.pose_dim = pose_dim
        self.pos_dim = pos_dim
        self.use_prev_action = use_prev_action
        self.feat_dim = obs_dim - pose_dim + (
            num_actions if use_prev_action else 0)
        gnn = NavDenseGNN([
            DenseGraphConv(self.feat_dim + pose_dim, hidden), jnp.tanh,
            DenseGraphConv(hidden, hidden), jnp.tanh,
        ])
        self.core_train = NavGCM(gnn, max_verts=max_verts,
                                 edge_method=edge_method, k=k, r=r,
                                 causal=True)
        self.core_step = NavGCMIncremental(gnn, max_verts=max_verts,
                                           edge_method=edge_method, k=k, r=r)
        self.logit_branch = Linear(hidden, num_actions, init=("normc", 0.01))
        self.value_branch = Linear(hidden, 1, init=("normc", 0.01))

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "core": self.core_train.init(k1),
            "logit": self.logit_branch.init(k2),
            "value": self.value_branch.init(k3),
        }

    def initial_state(self, B: int, dtype=jnp.float32):
        """Collection-time state (the incremental core's cached form)."""
        return self.core_step.initial_state(
            B, self.feat_dim, pos_dim=self.pos_dim,
            rot_dim=self.pose_dim - self.pos_dim, dtype=dtype)

    def _split(self, obs, prev_actions):
        """obs [..., obs_dim] -> (x features, pos, rot)."""
        feat = obs[..., : self.obs_dim - self.pose_dim]
        pose = obs[..., self.obs_dim - self.pose_dim:]
        pos = pose[..., : self.pos_dim]
        rot = pose[..., self.pos_dim:]
        if self.use_prev_action:
            onehot = jax.nn.one_hot(prev_actions, self.num_actions,
                                    dtype=obs.dtype)
            feat = jnp.concatenate([feat, onehot], axis=-1)
        return feat, pos, rot

    def step(self, params, obs, state, prev_action=None, key=None):
        """One tick: obs [B, obs_dim] -> (logits [B, A], value [B], state);
        runs the incremental core (tau=1 window)."""
        del key
        B = obs.shape[0]
        prev = (prev_action if prev_action is not None
                else jnp.zeros((B,), jnp.int32))
        feat, pos, rot = self._split(obs[:, None, :], prev[:, None])
        taus = jnp.ones((B,), jnp.int32)
        belief, state = self.core_step(params["core"], feat, pos, rot,
                                       taus, state)
        belief = belief[:, 0]
        logits = self.logit_branch(params["logit"], belief)
        value = self.value_branch(params["value"], belief)[..., 0]
        return logits, value, state

    def __call__(self, params, obs_seq, state, prev_actions=None, taus=None,
                 key=None):
        """Whole episode in one time-batched NavGCM call: obs_seq
        [B, T, obs_dim] -> (logits [B, T, A], values [B, T], state).
        `state` must be a fresh NavState (episodes replay from empty
        memory); use core_train.initial_state or pass None."""
        del key
        B, T, _ = obs_seq.shape
        if taus is None:
            taus = jnp.full((B,), T, jnp.int32)
        if prev_actions is None:
            prev_actions = jnp.zeros((B, T), jnp.int32)
        if state is None:
            state = self.core_train.initial_state(
                B, self.feat_dim, pos_dim=self.pos_dim,
                rot_dim=self.pose_dim - self.pos_dim)
        feat, pos, rot = self._split(obs_seq, prev_actions)
        beliefs, state = self.core_train(params["core"], feat, pos, rot,
                                         taus, state)
        logits = self.logit_branch(params["logit"], beliefs)
        values = self.value_branch(params["value"], beliefs)[..., 0]
        return logits, values, state


def make_nav_a2c_update(policy: NavActorCritic, opt, value_coef: float = 0.5,
                        entropy_coef: float = 0.01):
    """Jitted A2C-style update over buffer-sampled padded episodes through
    the whole-window nav core (the nav analog of
    rl/external.py::make_offline_a2c_update)."""

    def loss(params, batch):
        logits, values, _ = policy(params, batch["obs"], None,
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
