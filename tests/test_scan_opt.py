"""Scan-optimization knobs: unroll= (bit-identical recurrence) and the
merged conv projection (config.MERGED_CONV_PROJ, nn/dense_conv.py::
conv_project). Both are TPU-overhead candidates from the scan_breakdown
ablation (BASELINE.md roofline section); these tests pin that neither
changes results, so flipping either after measurement is safe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu import config
from gcm_tpu.models.banded_gcm import BandedRingGCM, BandedScoredGCM
from gcm_tpu.models.clique_gcm import CliqueGCM
from gcm_tpu.models.presets import readme_dense_gcm
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import MLP, Linear

B, T, OBS, HID, N = 3, 13, 5, 7, 6


def _banded():
    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    return BandedRingGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                         hops=(1, 2), graph_size=N)


def _traj(seed=0):
    k = jax.random.PRNGKey(seed)
    xs = jax.random.normal(k, (B, T, OBS))
    dones = jax.random.bernoulli(jax.random.PRNGKey(seed + 1),
                                 0.2, (B, T))
    return xs, dones


class TestUnroll:
    """unroll=K must be BITWISE identical to unroll=1: XLA unrolling reorders
    nothing inside a step, it only batches loop iterations."""

    @pytest.mark.parametrize("unroll", [2, 4])
    def test_dense_gcm_unroll_bitwise(self, unroll):
        model = readme_dense_gcm(obs_size=OBS, hidden=HID, graph_size=N)
        params = model.init(jax.random.PRNGKey(0))
        xs, dones = _traj()
        st = model.initial_state(B, OBS)
        out1, fs1 = model.scan(params, xs, st, dones=dones)
        outk, fsk = model.scan(params, xs, st, dones=dones, unroll=unroll)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(outk))
        for a, b in zip(jax.tree.leaves(fs1), jax.tree.leaves(fsk)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_banded_unroll_bitwise_with_dones(self):
        model = _banded()
        params = model.init(jax.random.PRNGKey(0))
        xs, dones = _traj(2)
        st = model.initial_state(B, OBS)
        out1, _ = model.scan(params, xs, st, dones=dones)
        out4, _ = model.scan(params, xs, st, dones=dones, unroll=4)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out4))

    def test_clique_unroll_bitwise(self):
        gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh])
        model = CliqueGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                          graph_size=N)
        params = model.init(jax.random.PRNGKey(0))
        xs, _ = _traj(3)
        st = model.initial_state(B, OBS)
        out1, _ = model.scan(params, xs, st)
        out4, _ = model.scan(params, xs, st, unroll=4)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out4))

    def test_unroll_not_multiple_of_T(self):
        # T=13 is prime; unroll=4 exercises the remainder path
        model = _banded()
        params = model.init(jax.random.PRNGKey(0))
        xs, _ = _traj(4)
        st = model.initial_state(B, OBS)
        out1, fs1 = model.scan(params, xs, st)
        out4, fs4 = model.scan(params, xs, st, unroll=4)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out4))
        np.testing.assert_array_equal(np.asarray(fs1.t), np.asarray(fs4.t))


class TestMergedConvProj:
    """MERGED_CONV_PROJ computes lin_rel(agg)+lin_root(h) as one matmul over
    the concatenated operands — identical up to matmul accumulation order
    (conftest pins precision=highest, so agreement is tight)."""

    @pytest.fixture(autouse=True)
    def _restore(self):
        prev = config.MERGED_CONV_PROJ
        yield
        config.MERGED_CONV_PROJ = prev

    def test_banded_scan_parity(self):
        model = _banded()
        params = model.init(jax.random.PRNGKey(0))
        xs, dones = _traj(5)
        st = model.initial_state(B, OBS)
        config.MERGED_CONV_PROJ = False
        out_off, _ = model.scan(params, xs, st, dones=dones)
        config.MERGED_CONV_PROJ = True
        out_on, _ = model.scan(params, xs, st, dones=dones)
        np.testing.assert_allclose(np.asarray(out_off), np.asarray(out_on),
                                   rtol=1e-6, atol=1e-6)

    def test_scored_window_parity(self):
        from gcm_tpu.edges.distance import EuclideanEdge

        gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh])
        model = BandedScoredGCM(
            gnn, distance=EuclideanEdge(max_distance=1.0, window=3),
            preprocessor=MLP([Linear(OBS, HID)]), graph_size=N)
        params = model.init(jax.random.PRNGKey(0))
        xs, _ = _traj(6)
        st = model.initial_state(B, OBS)
        config.MERGED_CONV_PROJ = False
        w_off, _ = model.window(params, xs, st)
        s_off, _ = model.scan(params, xs, st)
        config.MERGED_CONV_PROJ = True
        w_on, _ = model.window(params, xs, st)
        s_on, _ = model.scan(params, xs, st)
        np.testing.assert_allclose(np.asarray(w_off), np.asarray(w_on),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s_off), np.asarray(s_on),
                                   rtol=1e-6, atol=1e-6)
        # the window/scan parity contract must hold WITH the flag on for
        # both paths (both then route through conv_project's merged matmul)
        np.testing.assert_allclose(np.asarray(w_on), np.asarray(s_on),
                                   rtol=1e-5, atol=1e-6)

    def test_grad_flows_when_merged(self):
        model = _banded()
        params = model.init(jax.random.PRNGKey(0))
        xs, _ = _traj(7)
        st = model.initial_state(B, OBS)
        config.MERGED_CONV_PROJ = True

        def loss(p):
            out, _ = model.scan(p, xs, st)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(params)
        norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
        assert all(np.isfinite(n) for n in norms)
        assert any(n > 0 for n in norms)


class TestTuningOverrides:
    """config.apply_tuning / GCM_TUNE_FILE: measurement-pass overrides for
    the dispatch gates (per-deployment retuning; VERDICT round-2 weak #7)."""

    @pytest.fixture(autouse=True)
    def _restore(self):
        keep = {k: getattr(config, k) for k in config._TUNABLE_KEYS}
        yield
        for k, v in keep.items():
            setattr(config, k, v)

    def test_apply_and_reject_unknown(self):
        config.apply_tuning({"PALLAS_SPMM_MIN_WORK": 5,
                             "EMIT_WINDOW_FACTOR": 2})
        assert config.PALLAS_SPMM_MIN_WORK == 5
        assert config.EMIT_WINDOW_FACTOR == 2
        with pytest.raises(KeyError):
            config.apply_tuning({"PALLAS_SPMM_MIN_WROK": 5})  # typo

    def test_load_from_file(self, tmp_path):
        import json

        p = tmp_path / "tune.json"
        p.write_text(json.dumps({"EMIT_WINDOW_FACTOR": 7}))
        config.load_tuning(str(p))
        assert config.EMIT_WINDOW_FACTOR == 7

    def test_emit_gate_reads_config(self):
        from gcm_tpu.edges.sparse_learned import LearnedEdge

        sel = LearnedEdge(input_size=4, window=16)
        # default factor 4: N=128, w'=min(16+16,128)=32 -> 128 >= 128 True
        assert sel.emit_profitable(t=16, N=128)
        config.EMIT_WINDOW_FACTOR = 8
        assert not sel.emit_profitable(t=16, N=128)

    def test_gate_hygiene_derivation(self):
        """derive_tuning turns win/loss tables into overrides only when a
        single boundary separates them."""
        import importlib.util, os
        spec = importlib.util.spec_from_file_location(
            "gate_hygiene", os.path.join(os.path.dirname(__file__), "..",
                                         "benchmarks", "gate_hygiene.py"))
        gh = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(gh)

        out = {"emit": {"B8_h32_N128": {"emit_wins": False},
                        "B8_h32_N512": {"emit_wins": True}},
               "spmm": {"a": {"pallas_wins": False, "EN_work": 500_000},
                        "b": {"pallas_wins": True, "EN_work": 2_000_000}}}
        tune, notes = gh.derive_tuning(out, window_eff=48)
        assert 128 / 48 < tune["EMIT_WINDOW_FACTOR"] < 512 / 48
        assert 500_000 < tune["PALLAS_SPMM_MIN_WORK"] < 2_000_000
        assert not notes
        # non-separable: a win below a loss -> keep gate, note it
        out["spmm"]["c"] = {"pallas_wins": False, "EN_work": 3_000_000}
        tune2, notes2 = gh.derive_tuning(out, window_eff=48)
        assert "PALLAS_SPMM_MIN_WORK" not in tune2
        assert any("spmm" in n for n in notes2)
        # the derived overrides load through the real config path
        config.apply_tuning(tune)


class TestRematPolicies:
    """remat='dots'/'dots_no_batch' (selective jax.checkpoint policies) must
    produce the same loss and gradients as remat=False — rematerialization
    changes the backward schedule, not the math (allclose: recompute can
    reassociate fusions)."""

    @pytest.mark.parametrize("remat", [True, "dots", "dots_no_batch"])
    def test_dense_grad_parity(self, remat):
        model = readme_dense_gcm(obs_size=OBS, hidden=HID, graph_size=N)
        params = model.init(jax.random.PRNGKey(0))
        xs, _ = _traj()
        st = model.initial_state(B, OBS)

        def loss(p, r):
            outs, _ = model.scan(p, xs, st, remat=r)
            return jnp.sum(outs ** 2)

        l0, g0 = jax.value_and_grad(loss)(params, False)
        l1, g1 = jax.value_and_grad(loss)(params, remat)
        assert np.allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


class TestChunkedRemat:
    """remat=<int K> (chunked sqrt-T checkpointing): forward bit-identical
    to the plain scan; gradients match to reassociation tolerance; works
    with dones and on the fused ring core."""

    def test_forward_bitwise_and_grads(self):
        model = readme_dense_gcm(obs_size=OBS, hidden=HID, graph_size=N)
        params = model.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, 12, OBS))
        st = model.initial_state(B, OBS)
        o0, f0 = model.scan(params, xs, st)
        o1, f1 = model.scan(params, xs, st, remat=4)
        np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
        for a, b in zip(jax.tree.leaves(f0), jax.tree.leaves(f1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        def loss(p, r):
            outs, _ = model.scan(p, xs, st, remat=r)
            return jnp.sum(outs ** 2)

        g0 = jax.grad(loss)(params, False)
        g1 = jax.grad(loss)(params, 4)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_ring_fused_with_dones(self):
        from gcm_tpu.edges.temporal import TemporalBackedge
        from gcm_tpu.models.ring_gcm import RingDenseGCM

        gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh])
        model = RingDenseGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                             edge_selectors=TemporalBackedge([1]),
                             graph_size=N)
        params = model.init(jax.random.PRNGKey(2))
        xs, dones = _traj(seed=3)
        xs = xs[:, :12]
        dones = dones[:, :12]
        st = model.initial_state(B, OBS)
        o0, _ = model.scan(params, xs, st, dones=dones)
        o1, _ = model.scan(params, xs, st, dones=dones, remat=3)
        np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))

    def test_indivisible_raises(self):
        model = readme_dense_gcm(obs_size=OBS, hidden=HID, graph_size=N)
        params = model.init(jax.random.PRNGKey(0))
        xs = jnp.ones((B, 13, OBS))
        with pytest.raises(AssertionError):
            model.scan(params, xs, model.initial_state(B, OBS), remat=4)


class TestTrainRematFor:
    def test_picks_divisor_on_ring(self):
        from gcm_tpu.edges.temporal import TemporalBackedge
        from gcm_tpu.models.ring_gcm import RingDenseGCM
        from gcm_tpu.rl.wrappers import train_remat_for

        gnn = DenseGNN([DenseGraphConv(4, 4)])
        ring = RingDenseGCM(gnn, edge_selectors=TemporalBackedge([1]),
                            graph_size=8)
        assert train_remat_for(ring, 128) == 32
        assert train_remat_for(ring, 48) == 24
        assert train_remat_for(ring, 13) is False  # prime, no useful chunk
        assert train_remat_for(None, 128) is False

    def test_false_on_other_cores(self):
        from gcm_tpu.rl.wrappers import train_remat_for

        assert train_remat_for(_banded(), 128) is False
