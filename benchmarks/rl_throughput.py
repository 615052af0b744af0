"""A2C training throughput on the recall POMDP.

Measures full RL updates/s (rollout collection + loss + grads + adam) for
dense, ring, and sparse cores, using the honest-timing methodology
(scalar-sync + distinct inputs; each timed call is one full jitted update
with a fresh key). Prints one JSON line per core.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_req = os.environ.get("JAX_PLATFORMS", "")
if _req and "axon" not in _req:
    jax.config.update("jax_platforms", _req)

import jax.numpy as jnp

from gcm_tpu.edges.sparse_temporal import TemporalEdge
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.rl.a2c import A2C
from gcm_tpu.rl.env import RecallEnv
from gcm_tpu.rl.wrappers import GCMActorCritic, SparseGCMActorCritic

B = 64
REPEATS = 5


def build(env, core):
    cfg = dict(graph_size=env.horizon + 1, gnn_input_size=32,
               gnn_output_size=32, use_prev_action=True)
    if core == "sparse":
        return SparseGCMActorCritic(env.obs_dim, env.num_actions,
                                    env.num_actions,
                                    edge_selectors=TemporalEdge([1]),
                                    max_edges=64, **cfg)
    return GCMActorCritic(env.obs_dim, env.num_actions, env.num_actions,
                          edge_selectors=TemporalBackedge([1]), core=core,
                          **cfg)


def bench(core, graph_size=None, horizon=16, replay_dones=True,
          selector="temporal", B_=None):
    env = RecallEnv(num_symbols=4, horizon=horizon, noise_dim=4)
    global B
    Bl = B_ or B
    if graph_size is None:
        policy = build(env, core)
    else:
        from gcm_tpu.edges.distance import EuclideanEdge

        sel = (EuclideanEdge(max_distance=1.0) if selector == "euclidean"
               else TemporalBackedge([1]))
        policy = GCMActorCritic(env.obs_dim, env.num_actions,
                                env.num_actions, edge_selectors=sel,
                                core=core, graph_size=graph_size,
                                gnn_input_size=32, gnn_output_size=32,
                                use_prev_action=True)
    trainer = A2C(env, policy, replay_dones=replay_dones)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    def one_update(params, opt_state, key):
        p, o, m = trainer.update(params, opt_state, key, B)
        return m["loss"]  # scalar sync target

    keys = [jax.random.PRNGKey(100 + i) for i in range(REPEATS + 1)]
    float(one_update(params, opt_state, keys[0]))
    times = []
    for k in keys[1:]:
        t0 = time.perf_counter()
        float(one_update(params, opt_state, k))
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    env_steps = Bl * env.horizon
    return dt, env_steps / dt


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--window-n512", action="store_true",
                    help="round-5 trainer-level window unlock: A2C updates "
                         "at graph_size=512 (euclidean ring core, fixed-"
                         "horizon env), replay_dones True (scan replay) vs "
                         "False (the training replay dispatches the scan-"
                         "free window at N>=512), same pass")
    args = ap.parse_args()

    if args.window_n512:
        for rd in (True, False):
            dt, steps_s = bench("ring", graph_size=512, horizon=64,
                                replay_dones=rd, selector="euclidean",
                                B_=B)
            print(json.dumps({
                "core": "ring_n512_euclidean",
                "replay_dones": rd,
                "replay_path": "scan" if rd else "window (dispatched)",
                "update_s": round(dt, 5),
                "env_steps_per_s": round(steps_s),
                "backend": jax.default_backend(),
                "config": "B=64 horizon=64 recall env, graph_size=512",
            }), flush=True)
        sys.exit(0)

    for core in ("dense", "ring", "sparse"):
        dt, steps_s = bench(core)
        print(json.dumps({
            "core": core,
            "update_s": round(dt, 5),
            "env_steps_per_s": round(steps_s),
            "backend": jax.default_backend(),
            "config": "B=64 horizon=16 recall env (rollout+train per update)",
        }), flush=True)
