"""Backward-pass stage breakdown + selective remat (VERDICT round-3 item 8).

Round 3 traced the FORWARD scan op-by-op; the training path (fwd+bwd, 781k
timesteps/s vs 1.40M fwd) never got the same treatment. This does for the
backward what scan_breakdown.py did for the forward:

1. Stage ablation, fwd+bwd: each scan_breakdown dense variant wrapped in
   jax.grad wrt xs — consecutive differences price each stage's backward.
2. Full-model training shapes: grad wrt xs only vs grad wrt params
   (the dw matmuls), on the dense core and the fused ring core.
3. Remat policy sweep: none / full jax.checkpoint / 'dots'
   (dots_saveable: keep matmul results, recompute selector+churn) /
   'dots_no_batch' (recompute the batched products too) — the selective
   middle points round 3 never tried (full remat was −32% on ring).

Slope-timed like bench.py. Run: python benchmarks/bwd_breakdown.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from scan_breakdown import B, HID, N, OBS, dense_variants, slope_rate


def gradify(fn):
    """fwd+bwd of a scalar-valued (xs, T) fn: grad wrt the trajectory."""

    def g(xs, T):
        return jnp.sum(jax.grad(lambda x: fn(x, T))(xs))

    return g


def full_model_fns(core: str, remat):
    if core == "dense":
        from gcm_tpu.models.presets import readme_dense_gcm

        model = readme_dense_gcm(obs_size=OBS, hidden=HID, graph_size=N)
    else:  # fused ring
        from gcm_tpu import config
        from gcm_tpu.edges.temporal import TemporalBackedge
        from gcm_tpu.models.ring_gcm import RingDenseGCM
        from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
        from gcm_tpu.nn.module import MLP, Linear

        config.RING_FUSED_STEP = True
        gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                        DenseGraphConv(HID, HID), jnp.tanh])
        model = RingDenseGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                             edge_selectors=TemporalBackedge([1]),
                             graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def loss(p, xs):
        outs, _ = model.scan(p, xs, state0, remat=remat)
        return jnp.sum(outs ** 2)

    def grad_x(xs, T):
        return jnp.sum(jax.grad(lambda x: loss(params, x))(xs))

    def grad_p(xs, T):
        g = jax.grad(loss)(params, xs)
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(g))

    return grad_x, grad_p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--t", type=int, nargs=2, default=(128, 640))
    ap.add_argument("--stages-only", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    results = {}

    def record(name, rate, slope):
        results[name] = {"timesteps_per_s": round(rate),
                         "us_per_step": round(slope * 1e6, 3)}
        print(json.dumps({name: results[name]}), flush=True)

    # 1. stage ablation under grad (consecutive diffs = per-stage bwd cost)
    for vi, (name, fn) in enumerate(dense_variants()):
        # stable seed: str hash is salted per interpreter (PYTHONHASHSEED),
        # which would make inputs differ across runs
        rate, slope = slope_rate(gradify(fn), *args.t, seed=41 + vi)
        record(f"bwd_{name}", rate, slope)
    if args.stages_only:
        print(json.dumps({"backend": jax.default_backend(),
                          "results": results}), flush=True)
        return

    # 2+3. full model x remat policy x core. remat=<int K> is the chunked
    # sqrt-T checkpointing (saves the [B,N,N] carry residual only at chunk
    # boundaries — the bwd interaction term the stage ablation exposed).
    for core in ("dense", "ring_fused"):
        for remat in (False, True, "dots", "dots_no_batch", 8, 16, 32):
            tag = {False: "none", True: "full"}.get(remat, remat)
            if isinstance(remat, int) and not isinstance(remat, bool):
                tag = f"chunk{remat}"
            gx, gp = full_model_fns(core, remat)
            rate, slope = slope_rate(gp, *args.t,
                                     seed=(31 + len(str(tag))) % 97)
            record(f"{core}_gradp_remat_{tag}", rate, slope)
        # grad wrt xs only (no dw matmuls), no remat — prices the param grads
        gx, _ = full_model_fns(core, False)
        rate, slope = slope_rate(gx, *args.t, seed=53)
        record(f"{core}_gradx_remat_none", rate, slope)

    print(json.dumps({"backend": jax.default_backend(),
                      "workload": f"B={B} obs={OBS} hid={HID} N={N}",
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
