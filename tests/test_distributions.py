"""Action distributions (rl/distributions.py) + continuous-action training.

The reference gets continuous control for free from rllib's action
distributions over the same model outputs (ray_gcm.py:173-212); here the
trainers own that role. Categorical must be bit-identical to the trainers'
original inline math (pinned against it), DiagGaussian against a numpy
normal oracle, and the end-to-end bar mirrors the discrete one: a
DiagGaussian A2C policy beats the memoryless ceiling on the continuous
recall task.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.rl.a2c import A2C
from gcm_tpu.rl.distributions import Categorical, DiagGaussian
from gcm_tpu.rl.env import ContinuousRecallEnv
from gcm_tpu.rl.ppo import PPO
from gcm_tpu.rl.wrappers import GCMActorCritic


class TestCategorical:
    def test_matches_original_inline_math(self):
        d = Categorical()
        logits = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 3))
        actions = jax.random.randint(jax.random.PRNGKey(1), (4, 7), 0, 3)
        logp_all = jax.nn.log_softmax(logits)
        want_lp = jnp.take_along_axis(logp_all, actions[..., None],
                                      axis=-1)[..., 0]
        want_ent = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)
        np.testing.assert_array_equal(np.asarray(d.log_prob(logits, actions)),
                                      np.asarray(want_lp))
        np.testing.assert_array_equal(np.asarray(d.entropy(logits)),
                                      np.asarray(want_ent))
        # sampling is the trainers' original call
        k = jax.random.PRNGKey(2)
        np.testing.assert_array_equal(
            np.asarray(d.sample(k, logits)),
            np.asarray(jax.random.categorical(k, logits)))


class TestDiagGaussian:
    def test_log_prob_matches_numpy_normal(self):
        d = DiagGaussian(act_dim=3)
        logits = np.random.default_rng(0).standard_normal((5, 6)).astype(
            np.float32)
        actions = np.random.default_rng(1).standard_normal((5, 3)).astype(
            np.float32)
        mean, log_std = logits[:, :3], np.clip(logits[:, 3:], -5.0, 2.0)
        std = np.exp(log_std)
        want = np.sum(
            -0.5 * ((actions - mean) / std) ** 2 - log_std
            - 0.5 * math.log(2 * math.pi), axis=-1)
        got = np.asarray(d.log_prob(jnp.asarray(logits),
                                    jnp.asarray(actions)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_entropy_analytic(self):
        d = DiagGaussian(act_dim=2)
        logits = jnp.array([[0.0, 0.0, 0.0, math.log(2.0)]])
        want = ((0.5 * math.log(2 * math.pi * math.e) + 0.0)
                + (0.5 * math.log(2 * math.pi * math.e) + math.log(2.0)))
        np.testing.assert_allclose(float(d.entropy(logits)[0]), want,
                                   rtol=1e-6)

    def test_sample_moments(self):
        d = DiagGaussian(act_dim=1)
        logits = jnp.broadcast_to(jnp.array([1.5, math.log(0.5)]),
                                  (20000, 2))
        s = np.asarray(d.sample(jax.random.PRNGKey(0), logits))[:, 0]
        assert abs(s.mean() - 1.5) < 0.02
        assert abs(s.std() - 0.5) < 0.02

    def test_log_std_clamped(self):
        d = DiagGaussian(act_dim=1, min_log_std=-1.0, max_log_std=1.0)
        logits = jnp.array([[0.0, 99.0]])
        # entropy at the clamp == entropy at log_std exactly 1
        want = float(d.entropy(jnp.array([[0.0, 1.0]]))[0])
        np.testing.assert_allclose(float(d.entropy(logits)[0]), want)


def make_cont_policy(env, **over):
    cfg = dict(graph_size=env.horizon + 1, gnn_input_size=16,
               gnn_output_size=16, use_prev_action=False,
               edge_selectors=TemporalBackedge([1]), core="banded")
    cfg.update(over)
    # num_outputs = 2*act_dim (mean ‖ log_std); num_actions inert without
    # use_prev_action
    return GCMActorCritic(env.obs_dim, env.act_dim, 2 * env.act_dim, **cfg)


class TestContinuousControl:
    def test_a2c_gaussian_learns_continuous_recall(self):
        """Beat the memoryless ceiling: with the std floored at e^-1 (the
        exploration floor keeps the mean-head gradient alive; without it
        the std collapses and returns plateau at exactly 1 − Var(target) =
        2/3, the memoryless bound — observed), a memoryless policy peaks at
        1 − e^-2 − 1/3 ≈ 0.53; only the graph memory can carry the t=0 cue
        to the rewarded last step. Hops [1,2] so the 2-layer receptive
        field reaches age 3 (the cue) — with hop-1 only, no information
        path exists and training measurably plateaus at the memoryless
        bound (use_prev_action, the discrete test's side channel, is off
        for continuous actions)."""
        env = ContinuousRecallEnv(horizon=4, noise_dim=2)
        pol = make_cont_policy(env,
                               edge_selectors=TemporalBackedge([1, 2]))
        trainer = A2C(env, pol, lr=8e-3, entropy_coef=1e-4,
                      dist=DiagGaussian(env.act_dim, min_log_std=-1.0))
        _, history = trainer.train(jax.random.PRNGKey(0), updates=300, B=32)
        early = np.mean(history[:10])
        late = np.mean(history[-10:])
        assert late > max(0.70, early + 0.05), (
            f"did not learn: early={early:.3f} late={late:.3f}")

    def test_ppo_gaussian_update_runs_finite(self):
        env = ContinuousRecallEnv(horizon=4, noise_dim=2)
        pol = make_cont_policy(env)
        trainer = PPO(env, pol, dist=DiagGaussian(env.act_dim),
                      epochs=2, num_minibatches=2)
        params, opt_state = trainer.init(jax.random.PRNGKey(0))
        params, opt_state, metrics = trainer.update(
            params, opt_state, jax.random.PRNGKey(1), 8)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["return"]))

    def test_ppo_gaussian_dp_matches_single_device(self):
        """DiagGaussian composes with dp_mesh data parallelism: the sharded
        PPO update is numerically identical to the single-device one
        (mirrors test_parallel.py's categorical version — the dist math is
        per-sample, so batch sharding must not change it)."""
        from gcm_tpu.parallel.mesh import make_mesh

        env = ContinuousRecallEnv(horizon=4, noise_dim=2)

        def mk(mesh):
            pol = make_cont_policy(env)
            return PPO(env, pol, epochs=2, num_minibatches=2, dp_mesh=mesh,
                       dist=DiagGaussian(env.act_dim))

        mesh = make_mesh(dp=8, tp=1, devices=jax.devices()[:8])
        plain = mk(None)
        dp = mk(mesh)
        params, opt_state = plain.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        p1, o1, m1 = plain.update(params, opt_state, key, 16)
        p2, o2, m2 = dp.update(params, opt_state, key, 16)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-5)
        assert np.allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-5)

    def test_prev_action_rejected_for_gaussian(self):
        env = ContinuousRecallEnv(horizon=4, noise_dim=2)
        pol = make_cont_policy(env, use_prev_action=True)
        try:
            A2C(env, pol, dist=DiagGaussian(env.act_dim))
            raise AssertionError("expected use_prev_action assert")
        except AssertionError as e:
            assert "use_prev_action" in str(e)
