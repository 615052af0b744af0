"""Benchmark the flagship workload; prints ONE JSON line.

Primary metric: DenseGCM timesteps/s on the BASELINE.json config 1 workload
(B=32, obs=8, hidden=32, graph_size=128, TemporalBackedge([1]), 2-layer
DenseGraphConv), forward pass over a 128-step scanned trajectory. Baseline is
the PyTorch reference-equivalent measured by bench_reference.py on CPU
(see BASELINE.md). Also reports fwd+bwd, sparse whole-window training, and
padded-edge-list SpMM edges/s.

Timing discipline: this environment's TPU tunnel serves repeat executions of
an identical (program, inputs) pair from a cache at the RPC floor, so every
timed repetition here uses a DISTINCT input buffer; we report the min of
cold calls (the tunnel's noise is one-sided).
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

_req = os.environ.get("JAX_PLATFORMS", "")
if _req and "axon" not in _req:
    jax.config.update("jax_platforms", _req)
else:
    # The axon tunnel can go down for hours (round 3); backend init then
    # HANGS instead of failing, which would leave the driver's end-of-round
    # bench run with no JSON line at all. Probe device discovery in a
    # subprocess under a timeout; if it hangs/fails, fall back to CPU and
    # say so in the output (a marked CPU line beats a silent hang).
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=240, check=True, capture_output=True)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        print("bench.py: TPU tunnel unavailable (device probe hung); "
              "falling back to CPU", file=sys.stderr, flush=True)
        jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: first-compile through the TPU tunnel costs
# minutes per program; cached runs take seconds
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp

# PyTorch reference-equivalent, measured on this machine's CPU by
# bench_reference.py. Best of the round-1 (20209) and round-2 (34975)
# measurements — the round-1 run was depressed by concurrent host load, so
# the higher number is the fair baseline.
BASELINE_FWD_TIMESTEPS_PER_S = 34975.0

REPEATS = 5


def timed_unique(fn, inputs):
    """Time fn over distinct inputs (list of argument tuples); first call is
    the warmup/compile, remaining are cold measurements; returns the MIN.

    Min, not median: the tunnel's RTT noise is one-sided (stalls only add
    time), so min-of-N approaches the true cost while median keeps ~σ of
    jitter — which poisons slope estimates whose signal is a few ms.

    `fn` MUST return a scalar: synchronization is `float(...)` (device→host
    of the result), because block_until_ready does not reliably block
    through this environment's TPU tunnel."""
    float(fn(*inputs[0]))
    times = []
    for args in inputs[1:]:
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_dense_gcm(B=32, obs=8, hidden=32, N=128, T_lo=128, T_hi=640):
    """Per-timestep cost from the slope between a T_lo-step and a T_hi-step
    scan, removing the constant per-call dispatch/sync overhead of the dev
    tunnel (a real TPU deployment doesn't pay it per step)."""
    from gcm_tpu.models.presets import readme_dense_gcm

    model = readme_dense_gcm(obs_size=obs, hidden=hidden, graph_size=N)
    params = model.init(jax.random.PRNGKey(0))

    def fwd(p, x):
        outs, _ = model.scan(p, x, model.initial_state(B, obs))
        return jnp.sum(outs)

    def loss(p, x):
        # production-training parity: trainers pass unroll=SCAN_UNROLL
        # explicitly (the fwd-path DENSE_SCAN_UNROLL default measured
        # slower under grad)
        from gcm_tpu import config

        outs, _ = model.scan(p, x, model.initial_state(B, obs),
                             unroll=config.SCAN_UNROLL)
        return jnp.mean(outs ** 2)

    def bwd(p, x):
        g = jax.grad(loss)(p, x)
        return sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g))

    jf_fwd, jf_bwd = jax.jit(fwd), jax.jit(bwd)

    def measure(jf, T, salt=0):
        inputs = [
            (params, jax.random.normal(
                jax.random.PRNGKey(7 * T + 1000 * salt + i), (B, T, obs)))
            for i in range(REPEATS + 1)
        ]
        return timed_unique(jf, inputs)

    # median of 3 independent slope estimates: this is THE headline metric
    # and a single slope pair has shown ±2-3x session scatter (round 4:
    # 1.17M-3.76M on identical code) — the median keeps one bad pair from
    # defining the round record
    def med_slope(jf):
        slopes = sorted(
            max(measure(jf, T_hi, s) - measure(jf, T_lo, s), 1e-9)
            / (T_hi - T_lo)
            for s in range(3))
        return slopes[1]

    return B / med_slope(jf_fwd), B / med_slope(jf_bwd)


def bench_sparse_gcm(B=32, obs=8, hidden=32, N=128, T=128):
    """Whole-rollout time-batched training pass through SparseGCM — the
    execution mode the dense core cannot do (one call for all T steps).
    Slope-based between half and full windows."""
    from gcm_tpu.models.presets import readme_sparse_gcm

    model = readme_sparse_gcm(obs_size=obs, hidden=hidden, graph_size=N,
                              max_edges=2 * N)
    params = model.init(jax.random.PRNGKey(0))
    taus = jnp.full((B,), T, jnp.int32)
    state = model.initial_state(B, obs)

    def loss(p, xs, taus, state):
        outs, _ = model(p, xs, taus, state)
        return jnp.mean(outs ** 2)

    # chain sequential training windows (state threads through) and take the
    # slope over the number of windows — whole-window compute is small, so a
    # single-call T spread lands inside tunnel timing noise
    import functools

    Tw = T // 4  # window length; n_win windows fill the graph exactly
    taus_w = jnp.full((B,), Tw, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n_win",))
    def chain(p, xs_wins, state, n_win):
        def body(carry, xs_w):
            st, acc = carry
            g = jax.grad(loss)(p, xs_w, taus_w, st)
            gsum = sum(jnp.sum(jnp.abs(l))
                       for l in jax.tree_util.tree_leaves(g))
            _, st2 = model(p, xs_w, taus_w, st)
            return (st2, acc + gsum), None
        (st, acc), _ = jax.lax.scan(body, (state, 0.0), xs_wins[:n_win])
        return acc

    n_lo, n_hi = 2, 26  # wide spread: the per-window cost (~0.35 ms) must
    # clear the tunnel's per-call RTT jitter (~±3 ms); a 24-window spread
    # gives ~8-9 ms of signal. (Windows beyond graph capacity keep the same
    # static per-window program — fine for timing.)

    def measure(n_win, salt=0):
        inputs = [
            (params,
             jax.random.normal(jax.random.PRNGKey(17 * n_win + 1000 * salt + i),
                               (n_hi, B, Tw, obs)),
             state)
            for i in range(REPEATS + 1)
        ]
        return timed_unique(
            lambda p, xs, st: chain(p, xs, st, n_win=n_win), inputs)

    # median of independent slope estimates — a single pair is noise-prone
    slopes = sorted(
        max(measure(n_hi, s) - measure(n_lo, s), 1e-9) / (n_hi - n_lo)
        for s in range(3))
    return B * Tw / slopes[1]


def bench_spmm(B=64, N=512, E=8192, F=128, iters_lo=10, iters_hi=60):
    """Chained iterations (output feeds input) so device execution is
    serialized. Reports edges/s from the SLOPE between a short and a long
    chain — immune to per-call constant overheads and to any caching of
    repeat executions."""
    import functools

    from gcm_tpu.ops.dispatch import spmm

    sink = jax.random.randint(jax.random.PRNGKey(1), (B, E), 0, N)
    src = jax.random.randint(jax.random.PRNGKey(2), (B, E), 0, N)
    edges = jnp.stack([sink, src], axis=1).astype(jnp.int32)
    w = jnp.ones((B, E))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(x, e, w, iters):
        def body(x, _):
            return spmm(x, e, w) * 1e-1, None
        return jnp.sum(jax.lax.scan(body, x, None, length=iters)[0])

    def measure(iters):
        inputs = [
            (jax.random.normal(jax.random.PRNGKey(100 * iters + i),
                               (B, N, F)), edges, w)
            for i in range(REPEATS + 1)
        ]
        return timed_unique(
            lambda x, e, w: chain(x, e, w, iters=iters), inputs)

    t_lo = measure(iters_lo)
    t_hi = measure(iters_hi)
    slope = max(t_hi - t_lo, 1e-9) / (iters_hi - iters_lo)
    return B * E / slope


def bench_ring_gcm(B=32, obs=8, hidden=32, N=128, T_lo=128, T_hi=640):
    """RingDenseGCM: same outputs as DenseGCM, O(N) eviction instead of the
    O(N^2) wraparound roll."""
    from gcm_tpu.edges.temporal import TemporalBackedge
    from gcm_tpu.models.ring_gcm import RingDenseGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(hidden, hidden), jnp.tanh,
                    DenseGraphConv(hidden, hidden), jnp.tanh])
    model = RingDenseGCM(gnn, preprocessor=MLP([Linear(obs, hidden)]),
                         edge_selectors=TemporalBackedge([1]), graph_size=N)
    params = model.init(jax.random.PRNGKey(0))

    def fwd(p, x):
        outs, _ = model.scan(p, x, model.initial_state(B, obs))
        return jnp.sum(outs)

    jf = jax.jit(fwd)

    def measure(T):
        inputs = [
            (params, jax.random.normal(jax.random.PRNGKey(23 * T + i),
                                       (B, T, obs)))
            for i in range(REPEATS + 1)
        ]
        return timed_unique(jf, inputs)

    slope = max(measure(T_hi) - measure(T_lo), 1e-9) / (T_hi - T_lo)
    return B / slope


def bench_banded_gcm(B=32, obs=8, hidden=32, N=128, T_lo=128, T_hi=2176):
    """BandedRingGCM: exact DenseGCM outputs for the temporal workload with
    the adjacency kept implicit (masked rolls, no N^2 matmul). The core is
    so fast (~6 us per scanned step) that the slope needs a ~2k-step spread
    to clear tunnel jitter (observed 3x run-to-run wobble at 512 steps)."""
    from gcm_tpu.models.banded_gcm import BandedRingGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(hidden, hidden), jnp.tanh,
                    DenseGraphConv(hidden, hidden), jnp.tanh])
    model = BandedRingGCM(gnn, preprocessor=MLP([Linear(obs, hidden)]),
                          hops=(1,), graph_size=N)
    params = model.init(jax.random.PRNGKey(0))

    def fwd(p, x):
        outs, _ = model.scan(p, x, model.initial_state(B, obs))
        return jnp.sum(outs)

    jf = jax.jit(fwd)

    def measure(T):
        inputs = [
            (params, jax.random.normal(jax.random.PRNGKey(29 * T + i),
                                       (B, T, obs)))
            for i in range(REPEATS + 1)
        ]
        return timed_unique(jf, inputs)

    slope = max(measure(T_hi) - measure(T_lo), 1e-9) / (T_hi - T_lo)
    return B / slope


def bench_banded_window(B=32, obs=8, hidden=32, N=128, Tw=128,
                        n_lo=8, n_hi=136, train=False):
    """BandedRingGCM.window — the scan-free whole-trajectory forward (r3):
    all T steps as batched stencil matmuls, bitwise-equal to scan. Chained
    Tw-step windows threading the ring state; slope over window count (per-
    window cost is tiny, so the spread is sized to clear tunnel jitter)."""
    import functools

    from gcm_tpu.models.banded_gcm import BandedRingGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(hidden, hidden), jnp.tanh,
                    DenseGraphConv(hidden, hidden), jnp.tanh])
    model = BandedRingGCM(gnn, preprocessor=MLP([Linear(obs, hidden)]),
                          hops=(1,), graph_size=N)
    params = model.init(jax.random.PRNGKey(0))

    def win_loss(p, x_w, st):
        outs, st2 = model.window(p, x_w, st)
        return jnp.mean(outs ** 2), st2

    @functools.partial(jax.jit, static_argnames=("n_win",))
    def chain(p, xs, n_win):
        st0 = model.initial_state(B, obs)

        def body(carry, x_w):
            st, acc = carry
            if train:
                (l, st2), g = jax.value_and_grad(win_loss, has_aux=True)(
                    p, x_w, st)
                gsum = sum(jnp.sum(jnp.abs(v))
                           for v in jax.tree_util.tree_leaves(g))
                return (st2, acc + l + gsum), None
            outs, st2 = model.window(p, x_w, st)
            return (st2, acc + jnp.sum(outs)), None

        (_, acc), _ = jax.lax.scan(body, (st0, 0.0), xs[:n_win])
        return acc

    def measure(n_win):
        inputs = [
            (params, jax.random.normal(jax.random.PRNGKey(59 * n_win + i),
                                       (n_hi, B, Tw, obs)))
            for i in range(REPEATS + 1)
        ]
        return timed_unique(
            lambda p, xs: chain(p, xs, n_win=n_win), inputs)

    slope = max(measure(n_hi) - measure(n_lo), 1e-9) / (n_hi - n_lo)
    return B * Tw / slope


def _bench_dense_scan(model, params, obs, B, T_lo, T_hi, seed=31):
    """Slope-timed forward scan for an arbitrary dense-API model."""
    def fwd(p, x):
        outs, _ = model.scan(p, x, model.initial_state(B, obs))
        return jnp.sum(outs)

    jf = jax.jit(fwd)

    def measure(T):
        inputs = [
            (params, jax.random.normal(jax.random.PRNGKey(seed * T + i),
                                       (B, T, obs)))
            for i in range(REPEATS + 1)
        ]
        return timed_unique(jf, inputs)

    slope = max(measure(T_hi) - measure(T_lo), 1e-9) / (T_hi - T_lo)
    return B / slope


def bench_dense_edge(B=32, obs=8, hidden=32, N=512, T_lo=64, T_hi=256):
    """BASELINE.json config 2: DenseEdge (fully-connected past) at
    graph_size=512 (reference edge_selectors/dense.py:4-23)."""
    from gcm_tpu.edges.dense import DenseEdge
    from gcm_tpu.models.presets import readme_dense_gcm

    model = readme_dense_gcm(obs_size=obs, hidden=hidden, graph_size=N)
    model.edge_selectors = DenseEdge()
    params = model.init(jax.random.PRNGKey(0))
    return _bench_dense_scan(model, params, obs, B, T_lo, T_hi, seed=37)


def bench_clique(B=32, obs=8, hidden=32, N=512, T_lo=64, T_hi=256,
                 window=False, n_lo=4, n_hi=68, Tw=64, impl="gather"):
    """CliqueGCM — the DenseEdge fast path on the config-2 workload
    (fully-connected past @ graph_size=512). window=False: stepwise scan
    (O(N·F·F')/step vs DenseGCM's O(N²·F)); window=True: the scan-free
    whole-trajectory forward, chained Tw-step windows threading the ring
    state (slope over window count, like bench_banded_window)."""
    import functools

    from gcm_tpu.models.clique_gcm import CliqueGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(hidden, hidden), jnp.tanh,
                    DenseGraphConv(hidden, hidden), jnp.tanh])
    model = CliqueGCM(gnn, preprocessor=MLP([Linear(obs, hidden)]),
                      graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    if not window:
        return _bench_dense_scan(model, params, obs, B, T_lo, T_hi, seed=41)

    @functools.partial(jax.jit, static_argnames=("n_win",))
    def chain(p, xs, n_win):
        st0 = model.initial_state(B, obs)

        def body(carry, x_w):
            st, acc = carry
            outs, st2 = model.window(p, x_w, st, impl=impl)
            return (st2, acc + jnp.sum(outs)), None

        (_, acc), _ = jax.lax.scan(body, (st0, 0.0), xs[:n_win])
        return acc

    def measure(n_win):
        inputs = [
            (params, jax.random.normal(jax.random.PRNGKey(43 * n_win + i),
                                       (n_hi, B, Tw, obs)))
            for i in range(REPEATS + 1)
        ]
        return timed_unique(
            lambda p, xs: chain(p, xs, n_win=n_win), inputs)

    slope = max(measure(n_hi) - measure(n_lo), 1e-9) / (n_hi - n_lo)
    return B * Tw / slope


def bench_distance(mode, B=32, obs=8, hidden=32, N=128, T_lo=128, T_hi=640):
    """BASELINE.json config 3: distance edge selectors — the SDDMM scoring
    path (reference edge_selectors/distance.py:42-81). mode in
    euclidean|cosine|spatial."""
    from gcm_tpu.edges.distance import CosineEdge, EuclideanEdge, SpatialEdge
    from gcm_tpu.models.presets import readme_dense_gcm

    sel = {
        "euclidean": lambda: EuclideanEdge(max_distance=1.0),
        "cosine": lambda: CosineEdge(max_distance=0.5),
        "spatial": lambda: SpatialEdge(max_distance=0.25,
                                       a_pose_slice=slice(0, 2)),
    }[mode]()
    model = readme_dense_gcm(obs_size=obs, hidden=hidden, graph_size=N)
    model.edge_selectors = sel
    params = model.init(jax.random.PRNGKey(0))
    return _bench_dense_scan(model, params, obs, B, T_lo, T_hi,
                             seed=41 + len(mode))


def bench_ring_scored(kind, B=32, obs=8, hidden=32, N=128, T_lo=128,
                      T_hi=640):
    """Scored/learned selectors on the FUSED ring core — the core='auto'
    production path for these configs (wrappers resolve scored selectors to
    'ring'; RING_FUSED_STEP measured 3.1-7x the r3 numbers, MEASURE_r4)."""
    from gcm_tpu.edges.distance import EuclideanEdge
    from gcm_tpu.edges.learned import LearnedEdge
    from gcm_tpu.models.ring_gcm import RingDenseGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(hidden, hidden), jnp.tanh,
                    DenseGraphConv(hidden, hidden), jnp.tanh])
    sel = (EuclideanEdge(max_distance=1.0) if kind == "euclidean"
           else LearnedEdge(input_size=obs, deterministic=True))
    model = RingDenseGCM(gnn, preprocessor=MLP([Linear(obs, hidden)]),
                         edge_selectors=sel, graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    return _bench_dense_scan(model, params, obs, B, T_lo, T_hi,
                             seed=47 + len(kind))


def bench_learned_edge(B=32, obs=8, hidden=32, N=128, T_lo=64, T_hi=640):
    """BASELINE.json config 5a: dense LearnedEdge (pair-MLP scorer +
    Spardmax, reference edge_selectors/learned.py:7-125), deterministic."""
    from gcm_tpu.edges.learned import LearnedEdge
    from gcm_tpu.models.presets import readme_dense_gcm

    # selectors see RAW (pre-preprocessor) nodes — obs-dim features
    # (reference aliasing discipline, gcm.py:262-291)
    model = readme_dense_gcm(obs_size=obs, hidden=hidden, graph_size=N)
    model.edge_selectors = LearnedEdge(input_size=obs, deterministic=True)
    params = model.init(jax.random.PRNGKey(0))
    return _bench_dense_scan(model, params, obs, B, T_lo, T_hi, seed=43)


def bench_nav_gcm(B=8, F=16, V=128, tau=8, n_lo=8, n_hi=408,
                  incremental=False):
    """BASELINE.json config 5b: NavGCM rollout (reference nav_gcm.py:237-263,
    radius edges recomputed from geometry each call, causal mode). Chained
    windows of tau steps; slope over window count. A window costs ~25 us on
    TPU, so the spread must be hundreds of windows for the signal to clear
    the tunnel's ms-scale jitter (windows beyond the vertex capacity keep
    the same static per-window program — fine for timing).

    incremental=True measures NavGCMIncremental (cached causal features,
    only the tau new rows computed per window; output-identical)."""
    import functools

    from gcm_tpu.models.nav_gcm import (NavDenseGNN, NavGCM,
                                        NavGCMIncremental)
    from gcm_tpu.nn.dense_conv import DenseGraphConv

    pose = 3  # pos 2 + rot 1 concatenated by NavDenseGNN
    gnn = NavDenseGNN([DenseGraphConv(F + pose, F), jnp.tanh,
                       DenseGraphConv(F, F), jnp.tanh])
    if incremental:
        model = NavGCMIncremental(gnn, max_verts=V, edge_method="radius",
                                  r=2.0, k=16)
    else:
        model = NavGCM(gnn, max_verts=V, edge_method="radius", r=2.0, k=16)
    params = model.init(jax.random.PRNGKey(0))
    taus = jnp.full((B,), tau, jnp.int32)

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
            k = jax.random.PRNGKey(53 * n_win + i)
            k1, k2, k3 = jax.random.split(k, 3)
            inputs.append((
                params,
                jax.random.normal(k1, (n_hi, B, tau, F)),
                jax.random.normal(k2, (n_hi, B, tau, 2)),
                jax.random.normal(k3, (n_hi, B, tau, 1)),
            ))
        return timed_unique(
            lambda p, x, ps, rs: chain(p, x, ps, rs, n_win=n_win), inputs)

    slope = max(measure(n_hi) - measure(n_lo), 1e-9) / (n_hi - n_lo)
    return B * tau / slope


def bench_ring_window_train(B=32, obs=8, hidden=32, N=1024, T_lo=96,
                            T_hi=320):
    """The round-5 shipped win regime: whole-trajectory TRAINING through the
    ring core's scan-free window() at graph_size=1024 — the path
    window_profitable('train') dispatches (2.9-4.4x the scan+remat train,
    MEASURE_r5/ring_window_n1024_sweep + MEASURE_r4b). Slope over T of a
    grad through the dispatched trajectory path."""
    from gcm_tpu.edges.distance import EuclideanEdge
    from gcm_tpu.models.ring_gcm import RingDenseGCM
    from gcm_tpu.models.ring_window import ring_window
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(hidden, hidden), jnp.tanh,
                    DenseGraphConv(hidden, hidden), jnp.tanh])
    model = RingDenseGCM(gnn, preprocessor=MLP([Linear(obs, hidden)]),
                         edge_selectors=EuclideanEdge(max_distance=1.0),
                         graph_size=N)
    assert model.window_profitable("train")
    params = model.init(jax.random.PRNGKey(0))

    def loss(p, xs):
        outs, _ = ring_window(model, p, xs, model.initial_state(B, obs))
        return jnp.sum(outs ** 2)

    def train(p, xs):
        g = jax.grad(loss)(p, xs)
        return sum(jnp.sum(jnp.abs(l))
                   for l in jax.tree_util.tree_leaves(g))

    jf = jax.jit(train)

    def measure(T):
        inputs = [
            (params, jax.random.normal(jax.random.PRNGKey(61 * T + i),
                                       (B, T, obs)))
            for i in range(REPEATS + 1)
        ]
        return timed_unique(jf, inputs)

    slope = max(measure(T_hi) - measure(T_lo), 1e-9) / (T_hi - T_lo)
    return B / slope


SANE_TS_MAX = 5e8  # no per-chip scan path measures >500M timesteps/s
DEGENERATE = []  # metrics still insane after retries (emitted in the line)


def sane(fn, *a, floor=None, **kw):
    """Retry a slope-timed metric once if it degenerates: when tunnel jitter
    makes t_hi <= t_lo the slope clamps at 1e-9 and the rate explodes (seen
    round 4: learned_edge "6.1e12 timesteps/s"). Additionally, any reading
    above 115% of its analytic roofline floor is PHYSICALLY impossible and
    therefore a measurement artifact (round-5 dry run: a 56.7M dense-scan
    headline = 580% of the HBM floor slipped under the 5e8 absolute cap) —
    retry those too. One retry re-rolls the jitter; a still-insane value is
    reported (visible, not silently truncated)."""
    cap = min(SANE_TS_MAX, 2.5 * floor) if floor else SANE_TS_MAX
    v = fn(*a, **kw)
    for attempt in range(3):
        if v <= cap:
            return v
        print(f"# degenerate slope ({v:.3g}/s > cap {cap:.3g}) from "
              f"{fn.__name__}{a} — retry {attempt + 1}/3", file=sys.stderr,
              flush=True)
        v = fn(*a, **kw)
    if v > cap:
        # report visibly AND machine-readably (round-5 close: a tunnel
        # session produced mass degenerates that survived one retry)
        DEGENERATE.append(getattr(fn, "__name__", str(fn)) + repr(a))
    return v


def floor_table():
    """Analytic speed-of-light denominators for each metric
    (utils/roofline.py, VERDICT r4 item 5): BENCH lines carry % of floor so
    distance-to-hardware regressions stay visible under the tunnel's
    ±25-35% absolute session variance (the % moves only with real program
    changes at fixed shapes). fwd_bwd uses the standard 3x-forward
    convention (backward ≈ 2 extra passes of the same tensors). Metrics
    with no principled formula (sparse whole-window, clique's O(N·F²)
    step) carry null rather than an invented number. NOTE: pct_of_floor
    can legitimately exceed 100 for small-N configs — the floors model
    HBM-resident state, and e.g. the N=128 [B,N,N] carry (2.1 MB) can stay
    VMEM-resident across scan iterations."""
    from gcm_tpu.utils import roofline

    dense128 = roofline.dense_scan_step(32, 128, 32)["timesteps_per_s"]
    dense512 = roofline.dense_scan_step(32, 512, 32)["timesteps_per_s"]
    banded128 = roofline.banded_scan_step(32, 128, 32)["timesteps_per_s"]
    return {
        "gcm_timesteps_per_s": dense128,
        "fwd_bwd_timesteps_per_s": dense128 / 3.0,
        "ring_timesteps_per_s": dense128,
        "banded_timesteps_per_s": banded128,
        "banded_window_chainedTw128_timesteps_per_s": banded128,
        # the window train's backward is scan-free (no per-step residual
        # rematerialization), so the 3x-forward convention overshoots: the
        # dry run measured 227% of the /3 floor while its forward sat at
        # 75% of the fwd floor. Use the fwd floor as the (loose) train
        # denominator — the backward re-reads the same tensors it already
        # streamed.
        "banded_window_chainedTw128_train_timesteps_per_s": banded128,
        "spmm_edges_per_s": roofline.spmm(64, 512, 8192, 128)["edges_per_s"],
        "dense_edge_n512_timesteps_per_s": dense512,
        "euclidean_timesteps_per_s": dense128,
        "cosine_timesteps_per_s": dense128,
        "spatial_timesteps_per_s": dense128,
        "learned_edge_timesteps_per_s": dense128,
        "ring_euclidean_timesteps_per_s": dense128,
        "ring_learned_timesteps_per_s": dense128,
        "nav_gcm_timesteps_per_s":
            roofline.nav_window(8, 128, 8, 16)["timesteps_per_s"],
        "nav_incremental_timesteps_per_s":
            roofline.nav_incremental_window(8, 128, 8, 16)["timesteps_per_s"],
        "nav_incremental_v256_timesteps_per_s":
            roofline.nav_incremental_window(8, 256, 8, 16)["timesteps_per_s"],
        # clique step streams the [B,N,F] node buffer like the banded core
        # (implicit adjacency; its O(N·F·F') matmuls are HBM-dominated too)
        "clique_n512_timesteps_per_s":
            roofline.banded_scan_step(32, 512, 32)["timesteps_per_s"],
        # the window path has its OWN roofline (no [B,N,N] exists there)
        "ring_window_train_n1024_timesteps_per_s":
            roofline.ring_window_train(32, 1024, 32,
                                       chunk=640)["timesteps_per_s"],
    }


def main():
    floors = floor_table()
    fwd, fwd_bwd = bench_dense_gcm()
    for attempt in range(3):
        if fwd <= 2.5 * floors["gcm_timesteps_per_s"] \
                and fwd_bwd <= 2.5 * floors["fwd_bwd_timesteps_per_s"]:
            break
        print(f"# headline above its roofline floor (fwd {fwd:.3g}, "
              f"fwd_bwd {fwd_bwd:.3g}) — degenerate, retry "
              f"{attempt + 1}/3", file=sys.stderr, flush=True)
        fwd, fwd_bwd = bench_dense_gcm()
    else:
        DEGENERATE.append("bench_dense_gcm")
    ring = sane(bench_ring_gcm, floor=floors["ring_timesteps_per_s"])
    banded = sane(bench_banded_gcm, floor=floors["banded_timesteps_per_s"])
    banded_win = sane(
        bench_banded_window,
        floor=floors["banded_window_chainedTw128_timesteps_per_s"])
    banded_win_train = sane(
        bench_banded_window, train=True,
        floor=floors["banded_window_chainedTw128_train_timesteps_per_s"])
    sparse_train = sane(bench_sparse_gcm)
    spmm = bench_spmm()
    dense_edge = sane(bench_dense_edge,
                      floor=floors["dense_edge_n512_timesteps_per_s"])
    clique = sane(bench_clique,
                  floor=floors["clique_n512_timesteps_per_s"])
    # clique window() variants dropped from the headline matrix round 4: the
    # path is gated OFF on TPU (CliqueGCM.window_profitable — loses 5-11x to
    # its own scan, MEASURE_r3/clique_window.log), so benching it here
    # measured a path the wrappers never take. benchmarks/clique_window.py
    # still measures all variants on demand.
    dense128_floor = floors["euclidean_timesteps_per_s"]
    euclid = sane(bench_distance, "euclidean", floor=dense128_floor)
    cosine = sane(bench_distance, "cosine", floor=dense128_floor)
    spatial = sane(bench_distance, "spatial", floor=dense128_floor)
    learned = sane(bench_learned_edge, floor=dense128_floor)
    ring_euclid = sane(bench_ring_scored, "euclidean",
                       floor=dense128_floor)
    ring_learned = sane(bench_ring_scored, "learned",
                        floor=dense128_floor)
    nav = sane(bench_nav_gcm, floor=floors["nav_gcm_timesteps_per_s"])
    nav_inc = sane(bench_nav_gcm, incremental=True,
                   floor=floors["nav_incremental_timesteps_per_s"])
    # the incremental core's WIN regime (nav_core() routes V >= 256 here —
    # config.NAV_INCREMENTAL_MIN_V; 1.8x at V=256, 6.1x at V=512): one bench
    # point where the dispatch payoff is the thing being regression-tracked
    nav_inc_256 = sane(bench_nav_gcm, V=256, incremental=True)
    ring_win_train = sane(
        bench_ring_window_train,
        floor=floors["ring_window_train_n1024_timesteps_per_s"])
    results = {
        "metric": "gcm_timesteps_per_s",
        "value": round(fwd),
        "unit": "timesteps/s",
        "vs_baseline": round(fwd / BASELINE_FWD_TIMESTEPS_PER_S, 3),
        "fwd_bwd_timesteps_per_s": round(fwd_bwd),
        "ring_timesteps_per_s": round(ring),
        "banded_timesteps_per_s": round(banded),
        "banded_window_chainedTw128_timesteps_per_s": round(banded_win),
        "banded_window_chainedTw128_train_timesteps_per_s": round(banded_win_train),
        "sparse_train_timesteps_per_s": round(sparse_train),
        "spmm_edges_per_s": round(spmm),
        "dense_edge_n512_timesteps_per_s": round(dense_edge),
        "clique_n512_timesteps_per_s": round(clique),
        "euclidean_timesteps_per_s": round(euclid),
        "cosine_timesteps_per_s": round(cosine),
        "spatial_timesteps_per_s": round(spatial),
        "learned_edge_timesteps_per_s": round(learned),
        "ring_euclidean_timesteps_per_s": round(ring_euclid),
        "ring_learned_timesteps_per_s": round(ring_learned),
        "nav_gcm_timesteps_per_s": round(nav),
        "nav_incremental_timesteps_per_s": round(nav_inc),
        "nav_incremental_v256_timesteps_per_s": round(nav_inc_256),
        "ring_window_train_n1024_timesteps_per_s": round(ring_win_train),
        "backend": jax.default_backend(),
        "config": "B=32 obs=8 hidden=32 graph=128 T=128 TemporalBackedge[1]",
    }
    floors["value"] = floors["gcm_timesteps_per_s"]  # the headline metric
    if DEGENERATE:
        results["degenerate_metrics"] = sorted(set(DEGENERATE))
    results["pct_of_floor"] = {
        k: (round(100.0 * results[k] / floors[k], 2) if k in floors
            else None)
        for k in results
        if isinstance(results[k], (int, float)) and k != "vs_baseline"
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
