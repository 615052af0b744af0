"""bench.py harness smoke tests — every bench function runs end-to-end at
tiny sizes on CPU (guards the driver's end-of-round benchmark run against
API rot; numbers are meaningless at these sizes and not asserted)."""

import numpy as np
import pytest

import bench


@pytest.mark.parametrize("fn,kwargs", [
    (bench.bench_dense_edge, dict(B=2, N=64, T_lo=4, T_hi=8)),
    (bench.bench_learned_edge, dict(B=2, N=16, T_lo=4, T_hi=8)),
    (bench.bench_nav_gcm, dict(B=2, F=8, V=32, tau=4, n_lo=1, n_hi=2)),
    (bench.bench_nav_gcm, dict(B=2, F=8, V=32, tau=4, n_lo=1, n_hi=2,
                               incremental=True)),
    (bench.bench_ring_gcm, dict(B=2, N=16, T_lo=4, T_hi=8)),
    (bench.bench_banded_gcm, dict(B=2, N=16, T_lo=4, T_hi=8)),
    # N=512 is the smallest graph the train gate admits (the function
    # asserts window_profitable('train'))
    (bench.bench_ring_window_train, dict(B=2, N=512, T_lo=4, T_hi=8)),
])
def test_bench_fn_runs(fn, kwargs):
    rate = fn(**kwargs)
    assert np.isfinite(rate) and rate > 0


@pytest.mark.parametrize("mode", ["euclidean", "cosine", "spatial"])
def test_bench_distance_runs(mode):
    rate = bench.bench_distance(mode, B=2, N=16, T_lo=4, T_hi=8)
    assert np.isfinite(rate) and rate > 0


def test_bench_sparse_runs():
    rate = bench.bench_sparse_gcm(B=2, obs=4, hidden=4, N=16, T=8)
    assert np.isfinite(rate) and rate > 0


def test_bench_spmm_runs():
    rate = bench.bench_spmm(B=2, N=32, E=64, F=8, iters_lo=2, iters_hi=4)
    assert np.isfinite(rate) and rate > 0


@pytest.mark.parametrize("train", [False, True])
def test_bench_banded_window_runs(train):
    rate = bench.bench_banded_window(B=2, N=16, Tw=8, n_lo=1, n_hi=3,
                                     train=train)
    assert np.isfinite(rate) and rate > 0


@pytest.mark.parametrize("window,impl", [(False, "gather"),
                                         (True, "gather"), (True, "proj")])
def test_bench_clique_runs(window, impl):
    rate = bench.bench_clique(B=2, N=16, T_lo=4, T_hi=8, window=window,
                              n_lo=1, n_hi=3, Tw=8, impl=impl)
    assert np.isfinite(rate) and rate > 0
