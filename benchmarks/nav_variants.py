"""NavGCM implementation shoot-out on the real TPU (VERDICT round-2 item 7).

Measures the causal rollout path (BASELINE.json config 5b: B=8, tau=8,
V=128, F=16, radius graph from geometry) across variants:

  nav_full      NavGCM as shipped — full [B,V,V] recompute per window
                (kth-threshold via lax.top_k since round 3)
  nav_sort      the round-2 variant: kth-threshold via full jnp.sort
                (reconstructed here to quantify the top_k win)
  nav_inc       NavGCMIncremental — cached causal features, only the tau
                new rows computed per window (O(tau*V) geometry + conv)

Timing discipline is bench.py's: chained windows threading state inside one
jitted scan, distinct inputs per repetition, scalar sync, slope over window
count. Run:  python benchmarks/nav_variants.py
"""

from __future__ import annotations

import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gcm_tpu.models.nav_gcm import NavDenseGNN, NavGCM, NavGCMIncremental
from gcm_tpu.nn.dense_conv import DenseGraphConv

B, F, V, TAU = 8, 16, 128, 8
POSE = 3
REPEATS = 5
N_LO, N_HI = 8, 408


def timed_unique(fn, inputs):
    float(fn(*inputs[0]))
    times = []
    for args in inputs[1:]:
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def make_gnn():
    return NavDenseGNN([DenseGraphConv(F + POSE, F), jnp.tanh,
                        DenseGraphConv(F, F), jnp.tanh])


def measure_model(model, params, seed):
    taus = jnp.full((B,), TAU, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n_win",))
    def chain(p, xs, poss, rots, n_win):
        state = model.initial_state(B, F)

        def body(st, inp):
            x_w, p_w, r_w = inp
            out, st2 = model(p, x_w, p_w, r_w, taus, st)
            return st2, jnp.sum(out)

        _, sums = jax.lax.scan(body, state,
                               (xs[:n_win], poss[:n_win], rots[:n_win]))
        return jnp.sum(sums)

    def measure(n_win):
        inputs = []
        for i in range(REPEATS + 1):
            k = jax.random.PRNGKey(seed * n_win + i)
            k1, k2, k3 = jax.random.split(k, 3)
            inputs.append((
                params,
                jax.random.normal(k1, (N_HI, B, TAU, F)),
                jax.random.normal(k2, (N_HI, B, TAU, 2)),
                jax.random.normal(k3, (N_HI, B, TAU, 1)),
            ))
        return timed_unique(
            lambda p, x, ps, rs: chain(p, x, ps, rs, n_win=n_win), inputs)

    slopes = sorted(
        max(measure(N_HI) - measure(N_LO), 1e-9) / (N_HI - N_LO)
        for _ in range(3))
    return B * TAU / slopes[1]


class NavGCMSortCap(NavGCM):
    """Round-2 kth-threshold (full jnp.sort) for the A/B measurement."""

    def _knn_cap(self, d, mask):
        if self.k is not None and self.k < d.shape[-1]:
            big = jnp.finfo(d.dtype).max
            dm = jnp.where(mask, d, big)
            kth = jnp.sort(dm, axis=-1)[..., self.k - 1 : self.k]
            mask = mask & (dm <= kth)
        return mask


def main():
    import argparse

    global V, F
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=V,
                    help="max_verts — the incremental core's predicted "
                         "winning regime is large V (BASELINE.md nav "
                         "roofline: full recompute's structural overhead "
                         "is ~V/tau)")
    ap.add_argument("--f", type=int, default=F)
    ap.add_argument("--skip-sort", action="store_true",
                    help="skip the reconstructed round-2 sort variant")
    args = ap.parse_args()
    V, F = args.v, args.f

    out = {}
    gnn = make_gnn()
    full = NavGCM(gnn, max_verts=V, edge_method="radius", r=2.0, k=16)
    params = full.init(jax.random.PRNGKey(0))

    variants = [
        ("nav_sort", NavGCMSortCap(gnn, max_verts=V, edge_method="radius",
                                   r=2.0, k=16)),
        ("nav_full", full),
        ("nav_inc", NavGCMIncremental(gnn, max_verts=V,
                                      edge_method="radius", r=2.0, k=16)),
    ]
    if args.skip_sort:
        variants = variants[1:]
    for name, model in variants:
        rate = measure_model(model, params, seed=53)
        out[name] = {"timesteps_per_s": round(rate)}
        print(json.dumps({name: out[name]}), flush=True)

    # numerical cross-check at the bench point (same params, same inputs)
    k = jax.random.PRNGKey(9)
    k1, k2, k3 = jax.random.split(k, 3)
    xs = jax.random.normal(k1, (B, TAU, F))
    ps = jax.random.normal(k2, (B, TAU, 2))
    rs = jax.random.normal(k3, (B, TAU, 1))
    taus = jnp.full((B,), TAU, jnp.int32)
    inc = NavGCMIncremental(gnn, max_verts=V, edge_method="radius",
                            r=2.0, k=16)
    o_full, _ = jax.jit(full)(params, xs, ps, rs, taus,
                              full.initial_state(B, F))
    o_inc, _ = jax.jit(inc)(params, xs, ps, rs, taus,
                            inc.initial_state(B, F))
    out["max_abs_diff_full_vs_inc"] = float(jnp.max(jnp.abs(o_full - o_inc)))

    print(json.dumps({"backend": jax.default_backend(),
                      "workload": f"B={B} V={V} F={F} tau={TAU} radius k=16",
                      "results": out}), flush=True)


if __name__ == "__main__":
    main()
