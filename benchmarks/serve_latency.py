"""SessionServer request-path latency/throughput on the real TPU.

The serving runtime (serve/sessions.py) steps ONE fixed-shape masked batch
per request tick, so its cost model is: constant device time per tick
(independent of live-request count) + host marshalling + (here) the axon
tunnel RTT. This measures exactly that:

- per-tick wall latency at request counts 1 / cap/4 / cap (same jitted
  step — the numbers should be flat; divergence means marshalling scales),
- session churn (allocate+evict every tick, the LRU worst case),
- the from_policy actor-critic server vs the bare-core belief server.

Wall-clock per call is the honest metric here (a serving process eats the
host round trip on every tick); the tunnel RTT inflates the absolute
numbers vs an on-host TPU — the request-count *flatness* and the
churn-vs-steady *delta* are the transferable findings.

Run: python benchmarks/serve_latency.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CAP, OBS, HID, N = 64, 8, 32, 128
TICKS = 30


def make_server():
    from gcm_tpu.models.banded_gcm import BandedRingGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear
    from gcm_tpu.serve.sessions import SessionServer

    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    model = BandedRingGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                          hops=(1,), graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    return SessionServer(model, params, capacity=CAP, obs_dim=OBS)


def make_policy_server():
    from gcm_tpu.edges.temporal import TemporalBackedge
    from gcm_tpu.rl.wrappers import GCMActorCritic
    from gcm_tpu.serve.sessions import SessionServer

    policy = GCMActorCritic(
        obs_dim=OBS, num_actions=4, num_outputs=4, graph_size=N,
        gnn_input_size=HID, gnn_output_size=HID, use_prev_action=False,
        edge_selectors=TemporalBackedge([1]), core="banded")
    params = policy.init(jax.random.PRNGKey(0))
    return SessionServer.from_policy(policy, params, capacity=CAP)


def tick_latency(server, n_req, ticks=TICKS, churn=False, seed=0):
    rng = np.random.default_rng(seed)
    # steady pool: same sessions every tick; churn: fresh ids every tick
    # (allocate + LRU-evict on a full pool)
    base = [f"s{i}" for i in range(n_req)]
    for w in range(3):  # warm: compile + fill the pool
        server.step({s: rng.standard_normal(OBS) for s in base})
    times = []
    for t in range(ticks):
        ids = ([f"c{t}_{i}" for i in range(n_req)] if churn else base)
        reqs = {s: rng.standard_normal(OBS) for s in ids}
        t0 = time.perf_counter()
        out = server.step(reqs)
        # np conversion inside step() already syncs; touch one value anyway
        _ = float(np.sum(next(iter(out.values()))["logits"]
                         if isinstance(next(iter(out.values())), dict)
                         else next(iter(out.values()))))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def device_tick_rate(server, n_req, iters_lo=8, iters_hi=72, seed=0):
    """DEVICE time per tick, tunnel-RTT-free (VERDICT r3 item 10): chain the
    server's jitted masked step inside ONE jit over a scan of per-tick obs
    batches, slope-time over iteration count with a scalar sync — the same
    discipline bench.py uses. This prices the SessionServer's compute claim
    (ticks/s/chip) separately from the per-call host round trip that
    tick_latency honestly includes."""
    import functools

    rng = np.random.default_rng(seed)
    base = [f"s{i}" for i in range(n_req)]
    for _ in range(3):  # fill the pool so slots 0..n_req-1 are allocated
        server.step({s: rng.standard_normal(OBS) for s in base})
    active = jnp.arange(CAP) < n_req
    params, state = server.params, server.state

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(params, state, obs_seq, active, iters):
        def body(st, obs):
            out, st2 = server._step(params, obs, st, active)
            return st2, sum(jnp.sum(leaf)
                            for leaf in jax.tree_util.tree_leaves(out))
        _, outs = jax.lax.scan(body, state, obs_seq)
        return jnp.sum(outs)

    def measure(iters):
        times = []
        for i in range(4):
            obs_seq = jnp.asarray(
                rng.standard_normal((iters, CAP, OBS)), jnp.float32)
            t0 = time.perf_counter()
            _ = float(chain(params, state, obs_seq, active, iters=iters))
            times.append(time.perf_counter() - t0)
        return min(times[1:]) if len(times) > 1 else times[0]

    measure(iters_lo)  # compile both sizes before timing
    measure(iters_hi)
    slope = max(measure(iters_hi) - measure(iters_lo), 1e-9) / (
        iters_hi - iters_lo)
    return slope


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--device-time", action="store_true",
                    help="also isolate device time per tick (chained jit "
                         "scan, no per-call RTT)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    results = {}

    server = make_server()
    for n_req in (1, CAP // 4, CAP):
        ms = tick_latency(server, n_req, seed=n_req) * 1e3
        results[f"belief_req{n_req}_ms"] = round(ms, 3)
        results[f"belief_req{n_req}_steps_per_s"] = round(n_req / (ms / 1e3))
        print(json.dumps({f"belief_req{n_req}": results[
            f"belief_req{n_req}_ms"]}), flush=True)
    ms = tick_latency(server, CAP // 4, churn=True, seed=99) * 1e3
    results["belief_churn_ms"] = round(ms, 3)
    print(json.dumps({"belief_churn_ms": results["belief_churn_ms"]}),
          flush=True)

    if args.device_time:
        for n_req in (1, CAP // 4, CAP):
            s = device_tick_rate(server, n_req, seed=n_req)
            results[f"belief_req{n_req}_device_us"] = round(s * 1e6, 2)
            results[f"belief_req{n_req}_device_steps_per_s"] = round(
                n_req / s)
            print(json.dumps(
                {f"belief_req{n_req}_device_us":
                 results[f"belief_req{n_req}_device_us"]}), flush=True)

    pserver = make_policy_server()
    ms = tick_latency(pserver, CAP // 4, seed=7) * 1e3
    key = f"policy_req{CAP // 4}_ms"
    results[key] = round(ms, 3)
    print(json.dumps({key: results[key]}), flush=True)

    print(json.dumps({"backend": jax.default_backend(),
                      "workload": f"cap={CAP} obs={OBS} hid={HID} N={N}",
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
