"""End-to-end example: train a GCM actor-critic on the recall POMDP with A2C,
checkpoint the result, and evaluate.

Run:  python examples/train_recall.py  [--sparse] [--updates 300]
Works on CPU or TPU. Demonstrates the full user workflow: build policy from a
config dict, train (jitted A2C with per-episode memory resets), checkpoint
with orbax, restore, evaluate greedily.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gcm_tpu.edges.sparse_temporal import TemporalEdge
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.rl.a2c import A2C
from gcm_tpu.rl.env import RecallEnv, TMazeEnv
from gcm_tpu.rl.wrappers import GCMActorCritic, SparseGCMActorCritic
from gcm_tpu.train.checkpoint import make_manager, restore, save


def build_policy(env, sparse: bool, core: str = "dense"):
    cfg = dict(
        graph_size=env.horizon + 1,
        gnn_input_size=32,
        gnn_output_size=32,
        use_prev_action=True,
    )
    if sparse:
        return SparseGCMActorCritic(env.obs_dim, env.num_actions,
                                    env.num_actions,
                                    edge_selectors=TemporalEdge([1]),
                                    max_edges=64, **cfg)
    if core == "banded_scored":
        from gcm_tpu.edges.chain import EdgeChain
        from gcm_tpu.edges.distance import EuclideanEdge

        sel = EdgeChain([TemporalBackedge([1]),
                         EuclideanEdge(1.0, window=4)])
    elif core == "clique":
        from gcm_tpu.edges.dense import DenseEdge

        sel = DenseEdge()
    else:
        sel = TemporalBackedge([1])
    return GCMActorCritic(env.obs_dim, env.num_actions, env.num_actions,
                          edge_selectors=sel, core=core, **cfg)


def evaluate(env, policy, params, key, B=64):
    """Greedy rollout; returns mean episode return."""
    k_reset, k_run = jax.random.split(key)
    obs, env_state = env.reset(k_reset, B)
    mem = policy.initial_state(B)
    prev_a = jnp.zeros((B,), jnp.int32)
    total = jnp.zeros((B,))
    for _ in range(env.horizon):
        logits, _, mem = policy.step(params, obs, mem, prev_action=prev_a)
        action = jnp.argmax(logits, axis=-1)
        k_run, ke = jax.random.split(k_run)
        obs, reward, done, env_state = env.step(env_state, action, ke)
        total += reward
        prev_a = action
    return float(jnp.mean(total))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sparse", action="store_true")
    ap.add_argument("--core", default="dense",
                    choices=["dense", "ring", "banded", "banded_scored",
                             "clique", "auto"])
    ap.add_argument("--ppo", action="store_true")
    ap.add_argument("--env", default="recall", choices=["recall", "tmaze"])
    ap.add_argument("--updates", type=int, default=400)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (JAX_PLATFORMS is ignored "
                         "by the sitecustomize; needed when the TPU tunnel "
                         "is down)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.env == "tmaze":
        env = TMazeEnv(corridor_length=4)
    else:
        env = RecallEnv(num_symbols=2, horizon=6, noise_dim=4)
    policy = build_policy(env, args.sparse, core=args.core)
    if args.ppo:
        from gcm_tpu.rl.ppo import PPO

        trainer = PPO(env, policy, lr=5e-3, entropy_coef=0.003)
    else:
        trainer = A2C(env, policy, lr=8e-3, entropy_coef=0.003)

    ceiling = (f"memoryless ceiling = {1 / env.num_symbols:.2f} return"
               if args.env == "recall" else "optimal return = +4")
    print(f"training {'Sparse' if args.sparse else args.core}-core GCM "
          f"({'PPO' if args.ppo else 'A2C'}) policy on {args.env} "
          f"({ceiling})...")
    params, history = trainer.train(jax.random.PRNGKey(0),
                                    updates=args.updates, B=32, log_every=50)
    print(f"final training return (avg last 10): "
          f"{sum(history[-10:]) / 10:.3f}")

    ckpt_dir = args.ckpt_dir or tempfile.mkdtemp(prefix="gcm_ckpt_")
    mgr = make_manager(ckpt_dir)
    save(mgr, step=args.updates, tree={"params": params})
    print(f"checkpointed to {ckpt_dir}")

    restored = restore(mgr, template={"params": params})["params"]
    ret = evaluate(env, policy, restored, jax.random.PRNGKey(42))
    print(f"greedy eval return from restored checkpoint: {ret:.3f}")


if __name__ == "__main__":
    main()
