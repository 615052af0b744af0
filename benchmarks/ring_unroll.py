"""Ring-core unroll check: bench_postflip showed ring at 1.03M timesteps/s
vs 1.75M in round 2 — the only metric that regressed after SCAN_UNROLL
flipped to 4. This measures ring unroll 1 vs 4 (2 reps each) to decide
whether the ring core pins its own unroll.

Run: python benchmarks/ring_unroll.py (real TPU)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scan_breakdown import B, HID, N, OBS, slope_rate  # noqa: E402


def ring_scan_fn(unroll):
    from gcm_tpu.edges.temporal import TemporalBackedge
    from gcm_tpu.models.ring_gcm import RingDenseGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    model = RingDenseGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                         edge_selectors=TemporalBackedge([1]), graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def fn(xs, T):
        outs, _ = model.scan(params, xs, state0, unroll=unroll)
        return jnp.sum(outs)

    return fn


def main():
    results = {}
    for unroll in (1, 4):
        for rep in (0, 1):
            rate, slope = slope_rate(ring_scan_fn(unroll), 128, 640,
                                     seed=200 + 10 * unroll + rep)
            rec = {"timesteps_per_s": round(rate),
                   "us_per_step": round(slope * 1e6, 3)}
            results[f"ring_u{unroll}_r{rep}"] = rec
            print(json.dumps({f"ring_u{unroll}_r{rep}": rec}), flush=True)
    print(json.dumps({"backend": jax.default_backend(),
                      "workload": f"B={B} obs={OBS} hid={HID} N={N}",
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
