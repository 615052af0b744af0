"""Dispatch-gate robustness re-measurement (VERDICT round-2 item 9 / weak #7).

The two measured dispatch gates were single-point calibrations:
  1. LearnedEdge.emit_profitable: N >= 4*(window+t), measured at B=32 F=32
  2. config.PALLAS_SPMM_MIN_WORK = 1e6 E*N, measured at B=64 F=128

This re-measures both at a second batch size / feature width and reports
whether the recorded crossover still predicts the winner. bench.py timing
discipline (distinct inputs, scalar sync, slope over chained work).

Run:  python benchmarks/gate_hygiene.py
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

REPEATS = 4


def timed_unique(fn, inputs):
    float(fn(*inputs[0]))
    times = []
    for args in inputs[1:]:
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


# ------------------------------------------------------- emit crossover

def emit_window_ms(B, hidden, N, emit, Tw=32, window=16, n_lo=2, n_hi=14,
                   seed=3):
    """Per-window forward ms for SparseGCM + LearnedEdge(window), grid
    (emit=False) vs window-space emission (emit=True)."""
    from gcm_tpu.edges.sparse_learned import LearnedEdge
    from gcm_tpu.models.sparse_gcm import SparseGCM

    obs = 8
    sel = LearnedEdge(input_size=obs, deterministic=True, window=window)
    model = SparseGCM(
        gnn=_gnn(hidden),
        preprocessor=_pre(obs, hidden),
        edge_selectors=sel,
        graph_size=N,
        max_edges=4 * N,
        emit=emit,
    )
    params = model.init(jax.random.PRNGKey(0))
    taus_w = jnp.full((B,), Tw, jnp.int32)
    state = model.initial_state(B, obs)

    @functools.partial(jax.jit, static_argnames=("n_win",))
    def chain(p, xs_wins, st, n_win):
        def body(carry, xs_w):
            st, acc = carry
            out, st2 = model(p, xs_w, taus_w, st)
            return (st2, acc + jnp.sum(out)), None

        (st, acc), _ = jax.lax.scan(body, (st, 0.0), xs_wins[:n_win])
        return acc

    def measure(n_win):
        inputs = [
            (params,
             jax.random.normal(jax.random.PRNGKey(seed * n_win + i),
                               (n_hi, B, Tw, obs)), state)
            for i in range(REPEATS + 1)
        ]
        return timed_unique(
            lambda p, xs, st: chain(p, xs, st, n_win=n_win), inputs)

    slopes = sorted(
        max(measure(n_hi) - measure(n_lo), 1e-9) / (n_hi - n_lo)
        for _ in range(3))
    return slopes[1] * 1e3


def _gnn(hidden):
    from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN

    return SparseGNN([GraphConv(hidden, hidden), jnp.tanh,
                      GraphConv(hidden, hidden), jnp.tanh])


def _pre(obs, hidden):
    from gcm_tpu.nn.module import MLP, Linear

    return MLP([Linear(obs, hidden)])


# ------------------------------------------------------- spmm threshold

def spmm_ms(B, N, E, F, impl, iters_lo=10, iters_hi=60, seed=7):
    from gcm_tpu.ops.scatter import edge_scatter_add

    if impl == "pallas":
        from gcm_tpu.ops.pallas.spmm import spmm_edge_list as op
    else:
        op = edge_scatter_add

    sink = jax.random.randint(jax.random.PRNGKey(1), (B, E), 0, N)
    src = jax.random.randint(jax.random.PRNGKey(2), (B, E), 0, N)
    edges = jnp.stack([sink, src], axis=1).astype(jnp.int32)
    w = jnp.ones((B, E))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(x, e, ww, iters):
        def body(x, _):
            return op(x, e, ww) * 1e-1, None
        return jnp.sum(jax.lax.scan(body, x, None, length=iters)[0])

    def measure(iters):
        inputs = [
            (jax.random.normal(jax.random.PRNGKey(seed * iters + i),
                               (B, N, F)), edges, w)
            for i in range(REPEATS + 1)
        ]
        return timed_unique(
            lambda x, e, ww: chain(x, e, ww, iters=iters), inputs)

    slope = max(measure(iters_hi) - measure(iters_lo), 1e-9) / (
        iters_hi - iters_lo)
    return slope * 1e3


def derive_tuning(out, window_eff=16 + 32):
    """Turn the measured win/loss table into config.apply_tuning overrides
    (pure function; unit-tested in tests/test_scan_opt.py).

    - EMIT_WINDOW_FACTOR: the N/w' boundary separating emit wins from grid
      wins — midpoint between the largest losing ratio and the smallest
      winning ratio. If the measurements are not separable by any single
      factor (win below a loss), the current gate is kept and flagged.
    - PALLAS_SPMM_MIN_WORK: same construction on E*N (geometric midpoint).
    Only gates whose measured boundary is separable appear in the result.
    """
    import math

    tune, notes = {}, []

    win_r, loss_r = [], []
    for key, rec in out.get("emit", {}).items():
        n = int(key.rsplit("_N", 1)[1])
        (win_r if rec["emit_wins"] else loss_r).append(n / window_eff)
    if win_r and loss_r:
        if max(loss_r) < min(win_r):
            tune["EMIT_WINDOW_FACTOR"] = round(
                (max(loss_r) + min(win_r)) / 2, 2)
        else:
            notes.append("emit results not separable by a single factor")
    elif win_r or loss_r:
        notes.append("emit results one-sided; keeping current factor")

    win_w, loss_w = [], []
    for rec in out.get("spmm", {}).values():
        (win_w if rec["pallas_wins"] else loss_w).append(rec["EN_work"])
    if win_w and loss_w:
        if max(loss_w) < min(win_w):
            tune["PALLAS_SPMM_MIN_WORK"] = int(
                math.sqrt(max(loss_w) * min(win_w)))
        else:
            notes.append("spmm results not separable by a single threshold")
    elif win_w or loss_w:
        notes.append("spmm results one-sided; keeping current threshold")

    return tune, notes


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--emit-tune", default="",
                    help="write derived config.apply_tuning overrides "
                         "(GCM_TUNE_FILE format) to this path")
    args = ap.parse_args()

    out = {"emit": {}, "spmm": {}}

    # 1) emit crossover at a second B and hidden width. Recorded gate:
    #    use emit iff N >= 4*(window + Tw) = 4*48 = 192 -> emit at N=512,
    #    grid at N=128.
    for B, hidden, N in [(8, 32, 128), (8, 32, 512),
                         (32, 64, 128), (32, 64, 512)]:
        ms_grid = emit_window_ms(B, hidden, N, emit=False)
        ms_emit = emit_window_ms(B, hidden, N, emit=True)
        gate_says_emit = N >= 4 * (16 + 32)
        rec = {"grid_ms": round(ms_grid, 3), "emit_ms": round(ms_emit, 3),
               "emit_wins": ms_emit < ms_grid,
               "gate_predicts": gate_says_emit == (ms_emit < ms_grid)}
        out["emit"][f"B{B}_h{hidden}_N{N}"] = rec
        print(json.dumps({f"emit_B{B}_h{hidden}_N{N}": rec}), flush=True)

    # 2) PALLAS_SPMM_MIN_WORK (=1e6 E*N) at B=8 and F=32 around the
    #    threshold. Recorded calibration point was B=64 F=128.
    for B, F in [(8, 32), (64, 128)]:
        for N, E in [(128, 4096), (256, 4096), (256, 8192), (512, 2048)]:
            ms_x = spmm_ms(B, N, E, F, "xla")
            ms_p = spmm_ms(B, N, E, F, "pallas")
            work = N * E
            rec = {"xla_ms": round(ms_x, 3), "pallas_ms": round(ms_p, 3),
                   "pallas_wins": ms_p < ms_x, "EN_work": work,
                   "gate_predicts": (work >= 1_000_000) == (ms_p < ms_x)}
            out["spmm"][f"B{B}_F{F}_N{N}_E{E}"] = rec
            print(json.dumps({f"spmm_B{B}_F{F}_N{N}_E{E}": rec}), flush=True)

    tune, notes = derive_tuning(out)
    print(json.dumps({"backend": jax.default_backend(), "results": out,
                      "derived_tuning": tune, "notes": notes}), flush=True)
    if args.emit_tune:
        with open(args.emit_tune, "w") as f:
            json.dump(tune, f)
        print(json.dumps({"tune_file": args.emit_tune}), flush=True)


if __name__ == "__main__":
    main()
