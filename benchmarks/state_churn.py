"""State-churn fixes on the real TPU (VERDICT round-3 item 3).

The round-3 trace blamed the dense/ring scan gap on whole-[B,N,N] state
rewrites (one dynamic-update-slice = 31% of step time, carry copies = 13%).
Round 4 ships two structural fixes; this measures them:

- dense core: wrap_overflow as slice+pad gather (one fused select) instead
  of scatter+scatter+roll (graph_state.py::dense_wrap_overflow).
- ring core: config.RING_FUSED_STEP — eviction + every selector write
  composed into ONE pointwise adjacency rewrite (ring_gcm.py::_call_fused),
  bitwise-identical (tests/test_ring_gcm.py::TestFusedStep).

Slope-timed like bench.py (distinct inputs, scalar sync, T_hi−T_lo slope).
Prints one JSON line per variant; winners flip defaults + BASELINE.md gets
the numbers either way.

Run: python benchmarks/state_churn.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scan_breakdown import B, HID, N, OBS, slope_rate  # noqa: E402


def dense_scan_fn(unroll, train=False):
    from gcm_tpu.models.presets import readme_dense_gcm

    model = readme_dense_gcm(obs_size=OBS, hidden=HID, graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def loss(p, xs):
        outs, _ = model.scan(p, xs, state0, unroll=unroll)
        return jnp.sum(outs ** 2)

    def fn(xs, T):
        if train:
            g = jax.grad(loss)(params, xs)
            return sum(jnp.sum(leaf)
                       for leaf in jax.tree_util.tree_leaves(g))
        outs, _ = model.scan(params, xs, state0, unroll=unroll)
        return jnp.sum(outs)

    return fn


def ring_model(adj_dtype=None):
    from gcm_tpu.edges.temporal import TemporalBackedge
    from gcm_tpu.models.ring_gcm import RingDenseGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    return RingDenseGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                        edge_selectors=TemporalBackedge([1]), graph_size=N,
                        adj_dtype=adj_dtype)


def ring_scan_fn(unroll, adj_dtype=None):
    model = ring_model(adj_dtype=adj_dtype)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def fn(xs, T):
        outs, _ = model.scan(params, xs, state0, unroll=unroll)
        return jnp.sum(outs)

    return fn


def ring_train_fn(unroll, remat=False, kind=None):
    """fwd+bwd: grad of an L2 loss through the scan (training shape).
    remat: False | K (chunked) | 'reverse' (the r5 reversible backward).
    kind: None = flagship temporal config; 'euclidean'/'learned' = the
    scored ring configs."""
    model = ring_model() if kind is None else scored_model(kind)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def loss(p, xs):
        outs, _ = model.scan(p, xs, state0, unroll=unroll, remat=remat)
        return jnp.sum(outs ** 2)

    def fn(xs, T):
        g = jax.grad(loss)(params, xs)
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(g))

    return fn


def scored_model(kind):
    """Ring model on the bench_distance / bench_learned_edge configs (the
    euclidean/learned_edge headline metrics, run on the ring core so the
    scan-free window path applies)."""
    from gcm_tpu.edges.distance import EuclideanEdge
    from gcm_tpu.edges.learned import LearnedEdge
    from gcm_tpu.models.ring_gcm import RingDenseGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    sel = (EuclideanEdge(max_distance=1.0) if kind == "euclidean"
           else LearnedEdge(input_size=OBS, deterministic=True))
    return RingDenseGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                        edge_selectors=sel, graph_size=N)


def scored_fn(kind, use_window, train=False, chunk=None, remat=False):
    from gcm_tpu.models.ring_window import ring_window

    model = scored_model(kind)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def loss(p, xs):
        if use_window:
            outs, _ = ring_window(model, p, xs, state0, chunk=chunk)
        else:
            outs, _ = model.scan(p, xs, state0, remat=remat)
        return jnp.sum(outs ** 2)

    def fn(xs, T):
        if train:
            g = jax.grad(loss)(params, xs)
            return sum(jnp.sum(leaf)
                       for leaf in jax.tree_util.tree_leaves(g))
        if use_window:
            outs, _ = ring_window(model, params, xs, state0, chunk=chunk)
        else:
            outs, _ = model.scan(params, xs, state0)
        return jnp.sum(outs)

    return fn


def dense_scored_model(kind):
    """DenseGCM on the same euclidean/learned configs as scored_model —
    the head-to-head counterpart now that DENSE_FUSED_STEP covers the
    scored selectors (dense_gcm.py::_dense_selector_row_col)."""
    from gcm_tpu.edges.distance import EuclideanEdge
    from gcm_tpu.edges.learned import LearnedEdge
    from gcm_tpu.models.dense_gcm import DenseGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    sel = (EuclideanEdge(max_distance=1.0) if kind == "euclidean"
           else LearnedEdge(input_size=OBS, deterministic=True))
    return DenseGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                    edge_selectors=sel, graph_size=N)


def banded_model():
    from gcm_tpu.models.banded_gcm import BandedRingGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    return BandedRingGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                         hops=(1,), graph_size=N)


def windowed_scored_models(w=32):
    """The banded_scored head-to-head pair: DenseGCM vs BandedScoredGCM on
    an identical windowed EuclideanEdge config (the core='auto' rule at
    rl/wrappers.py:209-214 decides between exactly these two)."""
    from gcm_tpu.edges.distance import EuclideanEdge
    from gcm_tpu.models.banded_gcm import BandedScoredGCM
    from gcm_tpu.models.dense_gcm import DenseGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    def gnn():
        return DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                         DenseGraphConv(HID, HID), jnp.tanh])

    dense = DenseGCM(gnn(), preprocessor=MLP([Linear(OBS, HID)]),
                     edge_selectors=EuclideanEdge(max_distance=1.0, window=w),
                     graph_size=N)
    scored = BandedScoredGCM(gnn(), preprocessor=MLP([Linear(OBS, HID)]),
                             distance=EuclideanEdge(max_distance=1.0,
                                                    window=w),
                             graph_size=N)
    return dense, scored


def window_train_fn(model):
    """fwd+bwd through the core's scan-free window() trajectory path — the
    mode the fast cores train in (wrappers dispatch window when
    window_profitable('train'))."""
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def loss(p, xs):
        outs, _ = model.window(p, xs, state0)
        return jnp.sum(outs ** 2)

    def fn(xs, T):
        g = jax.grad(loss)(params, xs)
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(g))

    return fn


def core_fn(model, unroll, train=False):
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def loss(p, xs):
        outs, _ = model.scan(p, xs, state0, unroll=unroll)
        return jnp.sum(outs ** 2)

    def fn(xs, T):
        if train:
            g = jax.grad(loss)(params, xs)
            return sum(jnp.sum(leaf)
                       for leaf in jax.tree_util.tree_leaves(g))
        outs, _ = model.scan(params, xs, state0, unroll=unroll)
        return jnp.sum(outs)

    return fn


def dense_remat_fn(unroll, remat):
    from gcm_tpu.models.presets import readme_dense_gcm

    model = readme_dense_gcm(obs_size=OBS, hidden=HID, graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    state0 = model.initial_state(B, OBS)

    def loss(p, xs):
        outs, _ = model.scan(p, xs, state0, unroll=unroll, remat=remat)
        return jnp.sum(outs ** 2)

    def fn(xs, T):
        g = jax.grad(loss)(params, xs)
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(g))

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--t-dense", type=int, nargs=2, default=(128, 640))
    ap.add_argument("--dense-remat", action="store_true",
                    help="re-measure chunked remat on the FUSED dense train "
                         "path (the r4 wash was measured pre-fuse; the "
                         "fused step is cheaper to recompute)")
    ap.add_argument("--window", action="store_true",
                    help="measure the scan-free ring window path vs the "
                         "scan on the euclidean / learned-edge configs")
    ap.add_argument("--dense-fused", action="store_true",
                    help="measure DENSE_FUSED_STEP (one select per array) "
                         "vs the unfused dense step, fwd and train, u1/u4")
    ap.add_argument("--head2head", action="store_true",
                    help="dense-fused core vs ring-fused core at their "
                         "per-core default unrolls, same pass, on the "
                         "temporal/euclidean/learned configs (decides the "
                         "core='auto' general-selector fallback)")
    ap.add_argument("--reverse", action="store_true",
                    help="measure the reversible fused-ring backward "
                         "(remat='reverse') vs plain and chunked-remat "
                         "training, same pass, temporal + euclidean configs")
    ap.add_argument("--structured", action="store_true",
                    help="re-pin the core='auto' STRUCTURED crossovers "
                         "against the FUSED dense core (VERDICT r4 weak #1): "
                         "temporal family dense-vs-banded and windowed-"
                         "distance dense-vs-banded_scored, fwd + train + "
                         "window-train, same pass, at the current --n")
    ap.add_argument("--n", type=int, default=None,
                    help="override graph_size (ring_window's regime is "
                         "N >> 128 — ROADMAP round-5 lever 3)")
    ap.add_argument("--window-cumsum", action="store_true",
                    help="sweep RING_WINDOW_CUMSUM_BLOCK (the kill-cumsum "
                         "lowering: plain log-doubling vs two-level blocked "
                         "scan) on the euclidean window at the current --n, "
                         "fwd + train, same pass")
    ap.add_argument("--window-chunks", type=int, nargs="*", default=(),
                    help="extra explicit ring_window chunk lengths to sweep "
                         "(fwd and train), on top of the auto pick")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.n is not None:  # `is not None`, so --n 0 fails loudly below
        # rebind BOTH modules' N: the builders here read state_churn's copy,
        # but scan_breakdown helpers must agree if any ever reads its own
        import scan_breakdown

        globals()["N"] = args.n
        scan_breakdown.N = args.n

    from gcm_tpu import config

    results = {}

    def record(name, rate, slope):
        results[name] = {"timesteps_per_s": round(rate),
                         "us_per_step": round(slope * 1e6, 3)}
        print(json.dumps({name: results[name]}), flush=True)

    if args.dense_remat:
        assert config.DENSE_FUSED_STEP
        for remat in (False, 8, 16, 32):
            rate, slope = slope_rate(dense_remat_fn(4, remat),
                                     *args.t_dense,
                                     seed=501 + (remat or 0))
            record(f"dense_fused_train_u4_remat{remat}", rate, slope)
        print(json.dumps({"backend": jax.default_backend(),
                          "workload": f"B={B} obs={OBS} hid={HID} N={N}",
                          "results": results}), flush=True)
        return

    if args.head2head:
        # Per-core production defaults: dense scans at config.SCAN_UNROLL
        # (fused prefers u4 — the wrap-shift gather precludes in-place
        # aliasing), ring at config.RING_SCAN_UNROLL (u1 — protects the
        # in-place carry rewrite). Train measured at u4 on both (the
        # backward has no in-place rewrite to protect; BASELINE.md r4).
        assert config.DENSE_FUSED_STEP and config.RING_FUSED_STEP
        from gcm_tpu.models.presets import readme_dense_gcm

        builds = {
            "temporal": (lambda: readme_dense_gcm(obs_size=OBS, hidden=HID,
                                                  graph_size=N),
                         ring_model),
            "euclidean": (lambda: dense_scored_model("euclidean"),
                          lambda: scored_model("euclidean")),
            "learned": (lambda: dense_scored_model("learned"),
                        lambda: scored_model("learned")),
        }
        for i, (kind, (mk_dense, mk_ring)) in enumerate(builds.items()):
            for j, (tag, mk, unroll) in enumerate(
                    (("dense", mk_dense, config.SCAN_UNROLL),
                     ("ring", mk_ring, config.RING_SCAN_UNROLL))):
                rate, slope = slope_rate(core_fn(mk(), unroll),
                                         *args.t_dense, seed=401 + 10 * i + j)
                record(f"{kind}_{tag}_fwd", rate, slope)
                rate, slope = slope_rate(core_fn(mk(), 4, train=True),
                                         *args.t_dense, seed=451 + 10 * i + j)
                record(f"{kind}_{tag}_train", rate, slope)
        print(json.dumps({"backend": jax.default_backend(),
                          "workload": f"B={B} obs={OBS} hid={HID} N={N}",
                          "results": results}), flush=True)
        return

    if args.dense_fused:
        prev = config.DENSE_FUSED_STEP
        try:
            for fused in (False, True):
                config.DENSE_FUSED_STEP = fused
                tag = "fused" if fused else "unfused"
                for unroll in (1, 4):
                    rate, slope = slope_rate(
                        dense_scan_fn(unroll), *args.t_dense,
                        seed=211 + unroll + (7 if fused else 0))
                    record(f"dense_{tag}_u{unroll}", rate, slope)
                rate, slope = slope_rate(dense_scan_fn(4, train=True),
                                         *args.t_dense,
                                         seed=231 + (7 if fused else 0))
                record(f"dense_{tag}_train_u4", rate, slope)
        finally:
            config.DENSE_FUSED_STEP = prev
        print(json.dumps({"backend": jax.default_backend(),
                          "workload": f"B={B} obs={OBS} hid={HID} N={N}",
                          "results": results}), flush=True)
        return

    if args.reverse:
        variants = (("plain", False), ("chunk32", 32), ("reverse", "reverse"))
        for i, (tag, remat) in enumerate(variants):
            rate, slope = slope_rate(ring_train_fn(4, remat=remat),
                                     *args.t_dense, seed=701 + i)
            record(f"ring_temporal_train_{tag}", rate, slope)
        for i, (tag, remat) in enumerate(variants):
            rate, slope = slope_rate(
                ring_train_fn(4, remat=remat, kind="euclidean"),
                *args.t_dense, seed=721 + i)
            record(f"ring_euclid_train_{tag}", rate, slope)
        # dense core (the flagship fwd_bwd metric's core): plain vs the
        # dense reversible backward (models/dense_reversible.py)
        for i, (tag, remat) in enumerate((("plain", False),
                                          ("reverse", "reverse"))):
            rate, slope = slope_rate(dense_remat_fn(4, remat),
                                     *args.t_dense, seed=741 + i)
            record(f"dense_temporal_train_{tag}", rate, slope)
        print(json.dumps({"backend": jax.default_backend(),
                          "workload": f"B={B} obs={OBS} hid={HID} N={N}",
                          "results": results}), flush=True)
        return

    if args.structured:
        assert config.DENSE_FUSED_STEP
        from gcm_tpu.models.presets import readme_dense_gcm

        # temporal family: fused dense scan vs banded scan vs banded window
        pairs = [
            ("temporal_dense",
             lambda: core_fn(readme_dense_gcm(obs_size=OBS, hidden=HID,
                                              graph_size=N),
                             config.SCAN_UNROLL)),
            ("temporal_banded",
             lambda: core_fn(banded_model(), config.SCAN_UNROLL)),
        ]
        for i, (tag, mk) in enumerate(pairs):
            rate, slope = slope_rate(mk(), *args.t_dense, seed=601 + i)
            record(f"{tag}_fwd", rate, slope)
            rate, slope = slope_rate(
                core_fn((readme_dense_gcm(obs_size=OBS, hidden=HID,
                                          graph_size=N)
                         if "dense" in tag else banded_model()),
                        config.SCAN_UNROLL, train=True),
                *args.t_dense, seed=611 + i)
            record(f"{tag}_train", rate, slope)
        rate, slope = slope_rate(window_train_fn(banded_model()),
                                 *args.t_dense, seed=621)
        record("temporal_banded_window_train", rate, slope)

        # windowed distance: fused dense vs banded_scored
        for i, (tag, model) in enumerate(
                zip(("scoredw_dense", "scoredw_banded_scored"),
                    windowed_scored_models())):
            rate, slope = slope_rate(core_fn(model, config.SCAN_UNROLL),
                                     *args.t_dense, seed=631 + i)
            record(f"{tag}_fwd", rate, slope)
        for i, (tag, model) in enumerate(
                zip(("scoredw_dense", "scoredw_banded_scored"),
                    windowed_scored_models())):
            rate, slope = slope_rate(
                core_fn(model, config.SCAN_UNROLL, train=True),
                *args.t_dense, seed=641 + i)
            record(f"{tag}_train", rate, slope)
        rate, slope = slope_rate(window_train_fn(windowed_scored_models()[1]),
                                 *args.t_dense, seed=651)
        record("scoredw_banded_scored_window_train", rate, slope)
        print(json.dumps({"backend": jax.default_backend(),
                          "workload": f"B={B} obs={OBS} hid={HID} N={N} w=32",
                          "results": results}), flush=True)
        return

    if args.window_cumsum:
        for blk in (None, 8, 16, 32, 64):
            config.RING_WINDOW_CUMSUM_BLOCK = blk
            tag = "plain" if blk is None else f"blk{blk}"
            rate, slope = slope_rate(scored_fn("euclidean", True),
                                     *args.t_dense,
                                     seed=801 + (blk or 0))
            record(f"window_cumsum_{tag}_fwd", rate, slope)
        for blk in (None, 16, 32):
            config.RING_WINDOW_CUMSUM_BLOCK = blk
            tag = "plain" if blk is None else f"blk{blk}"
            rate, slope = slope_rate(
                scored_fn("euclidean", True, train=True), *args.t_dense,
                seed=821 + (blk or 0))
            record(f"window_cumsum_{tag}_train", rate, slope)
        config.RING_WINDOW_CUMSUM_BLOCK = None
        print(json.dumps({"backend": jax.default_backend(),
                          "workload": f"B={B} obs={OBS} hid={HID} N={N}",
                          "results": results}), flush=True)
        return

    if args.window:
        for kind in ("euclidean", "learned"):
            for use_window in (False, True):
                tag = "window" if use_window else "scan"
                rate, slope = slope_rate(scored_fn(kind, use_window),
                                         *args.t_dense,
                                         seed=141 + len(kind) + use_window)
                record(f"ring_{kind}_{tag}", rate, slope)
        # chunk-size sweep: each extra chunk re-pays the O(B*M^2*F) base/
        # rewrite term, but over-long chunks blow the [B,c,N+c,F] kill-cumsum
        # intermediates (the memory bound RING_WINDOW_CHUNK_BYTES encodes)
        for chunk in args.window_chunks:
            rate, slope = slope_rate(
                scored_fn("euclidean", True, chunk=chunk),
                *args.t_dense, seed=161 + chunk)
            record(f"ring_euclidean_window_c{chunk}", rate, slope)
        # fwd+bwd: the window's backward is also scan-free (cumsum
        # transposes), vs the scan's sequential backward. The scan leg runs
        # the PRODUCTION training path (chunked remat, rl/wrappers.py::
        # train_remat_for) — without it the T-stacked [B,N,N] carry residual
        # OOMs outright at N=1024 (MEASURE_r4b/ring_window_n1024.log: a
        # 40 GB bf16[640,32,1024,1024] allocation).
        remat = config.TRAIN_REMAT_CHUNK \
            if all(t % config.TRAIN_REMAT_CHUNK == 0 for t in args.t_dense) \
            else False
        rate, slope = slope_rate(
            scored_fn("euclidean", False, train=True, remat=remat),
            *args.t_dense, seed=151)
        record(f"ring_euclidean_scan_train_remat{remat}", rate, slope)
        rate, slope = slope_rate(
            scored_fn("euclidean", True, train=True), *args.t_dense,
            seed=152)
        record("ring_euclidean_window_train", rate, slope)
        for chunk in args.window_chunks:
            rate, slope = slope_rate(
                scored_fn("euclidean", True, train=True, chunk=chunk),
                *args.t_dense, seed=171 + chunk)
            record(f"ring_euclidean_window_train_c{chunk}", rate, slope)
        print(json.dumps({"backend": jax.default_backend(),
                          "workload": f"B={B} obs={OBS} hid={HID} N={N}",
                          "results": results}), flush=True)
        return

    # dense core with the slice+pad wraparound (r3 baseline: 1.40M @ u4)
    for unroll in (1, 4):
        rate, slope = slope_rate(dense_scan_fn(unroll), *args.t_dense,
                                 seed=70 + unroll)
        record(f"dense_slicepad_u{unroll}", rate, slope)

    # ring: unfused vs fused, u1 and u4 (r3 baseline: 1.80M @ u4)
    prev0 = config.RING_FUSED_STEP
    for fused in (False, True):
        config.RING_FUSED_STEP = fused
        tag = "fused" if fused else "unfused"
        for unroll in (1, 4):
            rate, slope = slope_rate(ring_scan_fn(unroll), *args.t_dense,
                                     seed=81 + unroll + (7 if fused else 0))
            record(f"ring_{tag}_u{unroll}", rate, slope)
    config.RING_FUSED_STEP = prev0

    # bf16 adjacency carry (bitwise-exact for 0/1 selectors): halves the
    # dominant [B,N,N] HBM traffic of the fused step
    prev_fused = config.RING_FUSED_STEP
    config.RING_FUSED_STEP = True
    rate, slope = slope_rate(ring_scan_fn(1, jnp.bfloat16), *args.t_dense,
                             seed=201)
    record("ring_fused_bf16adj_u1", rate, slope)

    # training through the fused step (r3 dense fwd_bwd baseline: 781k)
    for unroll in (1, 4):
        rate, slope = slope_rate(ring_train_fn(unroll), *args.t_dense,
                                 seed=96 + unroll)
        record(f"ring_fused_train_u{unroll}", rate, slope)
    config.RING_FUSED_STEP = prev_fused

    print(json.dumps({"backend": jax.default_backend(),
                      "workload": f"B={B} obs={OBS} hid={HID} N={N}",
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
