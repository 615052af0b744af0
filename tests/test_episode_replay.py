"""Episode-aware training replay: collect-time and replay-time beliefs must
be identical for rollouts with MID-WINDOW episode terminations.

The reference gets this from rllib: sequences are chopped at episode
boundaries and state is re-initialized where T==0
(ray_sparse_gcm.py:195-200, seq_lens in ray_gcm.py:188-202). Here the
trainers replay the whole window with `dones`, which resets the dense-core
memory inside the scan and segment-masks the sparse core's selector
candidates.
"""

import jax
import jax.numpy as jnp
import pytest

from gcm_tpu.core.graph_state import reset_where
from gcm_tpu.edges.sparse_learned import LearnedEdge as SparseLearnedEdge
from gcm_tpu.edges.sparse_temporal import TemporalEdge
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.rl.env import TMazeEnv
from gcm_tpu.rl.wrappers import GCMActorCritic, SparseGCMActorCritic

B, T = 4, 10
HID = 8


def rollout_with_logits(env, policy, params, key):
    """Manual A2C.collect mirror that also records the collect-time logits."""
    k_reset, k_run = jax.random.split(key)
    obs, env_state = env.reset(k_reset, B)
    mem = policy.initial_state(B)
    prev_a = jnp.zeros((B,), jnp.int32)
    rec = {"obs": [], "logits": [], "values": [], "dones": [], "prev": []}
    for _ in range(T):
        logits, value, mem = policy.step(params, obs, mem, prev_action=prev_a)
        k_run, ka, ke = jax.random.split(k_run, 3)
        action = jax.random.categorical(ka, logits)
        nobs, reward, done, env_state = env.step(env_state, action, ke)
        rec["obs"].append(obs)
        rec["logits"].append(logits)
        rec["values"].append(value)
        rec["dones"].append(done)
        rec["prev"].append(prev_a)
        mem = reset_where(mem, done)  # the collect-time episode reset
        prev_a = jnp.where(done, 0, action)
        obs = nobs
    stack = lambda xs: jnp.stack(xs, axis=1)
    return {k: stack(v) for k, v in rec.items()}


def check_policy(policy, seed=0):
    env = TMazeEnv(corridor_length=2)  # horizon 3 << T: many mid-window ends
    params = policy.init(jax.random.PRNGKey(seed))
    traj = rollout_with_logits(env, policy, params, jax.random.PRNGKey(seed))
    assert bool(jnp.any(traj["dones"][:, : T - 1])), "need mid-window dones"

    mem = policy.initial_state(B)
    logits_r, values_r, _ = policy(params, traj["obs"], mem,
                                   prev_actions=traj["prev"],
                                   dones=traj["dones"])
    assert jnp.allclose(logits_r, traj["logits"], atol=1e-5), (
        jnp.max(jnp.abs(logits_r - traj["logits"])))
    assert jnp.allclose(values_r, traj["values"], atol=1e-5)

    # negative control: without dones the replay diverges after the first
    # mid-window termination — the test is actually detecting something
    logits_n, _, _ = policy(params, traj["obs"], policy.initial_state(B),
                            prev_actions=traj["prev"])
    assert not jnp.allclose(logits_n, traj["logits"], atol=1e-5)


@pytest.mark.parametrize("core", ["dense", "ring", "banded"])
def test_dense_family_replay_matches_collect(core):
    env = TMazeEnv(corridor_length=2)
    policy = GCMActorCritic(
        env.obs_dim, env.num_actions, env.num_actions,
        core=core, graph_size=T + 2, gnn_input_size=HID, gnn_output_size=HID,
        edge_selectors=TemporalBackedge([1]), use_prev_action=True)
    check_policy(policy)


def test_sparse_temporal_replay_matches_collect():
    env = TMazeEnv(corridor_length=2)
    policy = SparseGCMActorCritic(
        env.obs_dim, env.num_actions, env.num_actions,
        graph_size=T + 2, gnn_input_size=HID, gnn_output_size=HID,
        edge_selectors=TemporalEdge([1]), max_edges=4 * T,
        use_prev_action=True)
    check_policy(policy)


def test_sparse_learned_pe_replay_matches_collect():
    env = TMazeEnv(corridor_length=2)
    policy = SparseGCMActorCritic(
        env.obs_dim, env.num_actions, env.num_actions,
        graph_size=T + 2, gnn_input_size=HID, gnn_output_size=HID,
        edge_selectors=SparseLearnedEdge(input_size=env.obs_dim
                                         + env.num_actions,
                                         deterministic=True),
        positional_encoding="add", max_edges=8 * T, use_prev_action=True)
    check_policy(policy)


def test_sparse_whole_window_matches_stepwise_with_dones():
    """Core-level: one dones-aware whole-window call ≡ step-by-step scan with
    per-step reset_where."""
    from gcm_tpu.models.presets import readme_sparse_gcm

    model = readme_sparse_gcm(obs_size=6, hidden=HID, graph_size=T + 2,
                              max_edges=4 * T)
    params = model.init(jax.random.PRNGKey(1))
    xs = jax.random.normal(jax.random.PRNGKey(2), (B, T, 6))
    dones = jnp.zeros((B, T), bool).at[:, 3].set(True).at[1, 6].set(True)

    out_step, _ = model.scan(params, xs, model.initial_state(B, 6),
                             dones=dones)
    taus = jnp.full((B,), T, jnp.int32)
    out_whole, _ = model(params, xs, taus, model.initial_state(B, 6),
                         dones=dones)
    assert jnp.allclose(out_step, out_whole, atol=1e-5), (
        jnp.max(jnp.abs(out_step - out_whole)))
