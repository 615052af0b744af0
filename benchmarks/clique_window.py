"""Clique window-vs-scan dispatch measurement (TPU).

bench_postflip (N=512, T=64): clique scan 2.49M ts/s vs window gather 257k /
proj 287k — the CPU ordering (proj 2.2x faster than scan) INVERTS on TPU.
This measures both impls vs the scan at the RL-relevant small graph too
(N=128) to decide the wrapper's whole-trajectory dispatch per backend.

Run: python benchmarks/clique_window.py (real TPU)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scan_breakdown import B, HID, OBS, slope_rate  # noqa: E402


def clique_fn(N, mode):
    from gcm_tpu.models.clique_gcm import CliqueGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    model = CliqueGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                      graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def fn(xs, T):
        if mode == "scan":
            outs, _ = model.scan(params, xs, state0)
        else:
            outs, _ = model.window(params, xs, state0, impl=mode)
        return jnp.sum(outs)

    return fn


def main():
    results = {}
    for N in (128, 512):
        for mi, mode in enumerate(("scan", "gather", "proj")):
            rate, slope = slope_rate(clique_fn(N, mode), 64, 192,
                                     seed=300 + N + mi)
            rec = {"timesteps_per_s": round(rate),
                   "us_per_step": round(slope * 1e6, 3)}
            results[f"clique_N{N}_{mode}"] = rec
            print(json.dumps({f"clique_N{N}_{mode}": rec}), flush=True)
    print(json.dumps({"backend": jax.default_backend(),
                      "workload": f"B={B} obs={OBS} hid={HID}",
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
