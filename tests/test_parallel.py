"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The reference has no distributed support; these pin the new build's DP/TP
design (SURVEY.md §2 N6): sharded execution must be numerically identical to
single-device execution, and the full training step must compile and run
under real dp/tp shardings."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gcm_tpu.models.presets import readme_dense_gcm, readme_sparse_gcm
from gcm_tpu.parallel.mesh import batch_sharding, make_mesh
from gcm_tpu.parallel.sharding import param_specs, state_specs, to_named
from gcm_tpu.train.train_step import (
    make_dense_supervised_step,
    make_sparse_supervised_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(dp=4, tp=2)
        assert mesh.shape == {"dp": 4, "tp": 2}
        mesh = make_mesh(tp=1)
        assert mesh.shape["dp"] == 8


class TestDPParity:
    def test_dense_scan_dp_matches_single_device(self):
        B, T, obs = 8, 6, 8
        model = readme_dense_gcm(obs_size=obs, hidden=16, graph_size=16)
        params = model.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, obs))

        outs_single, _ = model.scan(params, xs, model.initial_state(B, obs))

        mesh = make_mesh(dp=8, tp=1)
        xs_sharded = jax.device_put(xs, batch_sharding(mesh, 3))
        st = model.initial_state(B, obs)
        st_sharded = jax.tree_util.tree_map(
            jax.device_put, st, to_named(mesh, state_specs(st))
        )
        f = jax.jit(lambda p, x, s: model.scan(p, x, s))
        outs_dp, _ = f(params, xs_sharded, st_sharded)
        assert np.allclose(np.array(outs_single), np.array(outs_dp), atol=1e-5)

    def test_sparse_dp_matches_single_device(self):
        B, T, obs = 8, 5, 8
        model = readme_sparse_gcm(obs_size=obs, hidden=16, graph_size=16,
                                  max_edges=64)
        params = model.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, obs))
        taus = jnp.full((B,), T, jnp.int32)

        outs_single, _ = model(params, xs, taus, model.initial_state(B, obs))

        mesh = make_mesh(dp=8, tp=1)
        xs_s = jax.device_put(xs, batch_sharding(mesh, 3))
        taus_s = jax.device_put(taus, batch_sharding(mesh, 1))
        st = model.initial_state(B, obs)
        st_s = jax.tree_util.tree_map(
            jax.device_put, st, to_named(mesh, state_specs(st))
        )
        outs_dp, _ = jax.jit(lambda p, x, t, s: model(p, x, t, s))(
            params, xs_s, taus_s, st_s
        )
        assert np.allclose(np.array(outs_single), np.array(outs_dp), atol=1e-5)


class TestTPParity:
    def test_dense_train_step_dp_tp(self):
        """Full train step under dp=4 × tp=2 matches the unsharded step."""
        B, T, obs, hidden = 8, 4, 8, 16
        model = readme_dense_gcm(obs_size=obs, hidden=hidden, graph_size=12)
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        step = make_dense_supervised_step(model, opt)
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, obs))
        tgt = jax.random.normal(jax.random.PRNGKey(2), (B, T, hidden))

        p_ref, _, loss_ref = step(params, opt_state, xs, tgt)

        mesh = make_mesh(dp=4, tp=2)
        p_shard = to_named(mesh, param_specs(params))
        params_s = jax.tree_util.tree_map(jax.device_put, params, p_shard)
        data_shard = NamedSharding(mesh, P("dp", None, None))
        xs_s = jax.device_put(xs, data_shard)
        tgt_s = jax.device_put(tgt, data_shard)
        jit_step = jax.jit(step)
        p_out, _, loss_out = jit_step(params_s, opt_state, xs_s, tgt_s)

        assert np.allclose(float(loss_ref), float(loss_out), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_out)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-4)

    def test_window_train_step_dp_tp(self):
        """Train step through the scan-free window() forward under dp×tp
        matches the unsharded step (and the scan-based step's loss)."""
        from gcm_tpu.models.banded_gcm import BandedRingGCM
        from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
        from gcm_tpu.train.train_step import make_window_supervised_step

        B, T, hidden = 8, 6, 16
        model = BandedRingGCM(
            DenseGNN([DenseGraphConv(hidden, hidden), jnp.tanh]),
            hops=(1,), graph_size=12)
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        step = make_window_supervised_step(model, opt)
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, hidden))
        tgt = jax.random.normal(jax.random.PRNGKey(2), (B, T, hidden))

        p_ref, _, loss_ref = step(params, opt_state, xs, tgt)

        mesh = make_mesh(dp=4, tp=2)
        p_shard = to_named(mesh, param_specs(params))
        params_s = jax.tree_util.tree_map(jax.device_put, params, p_shard)
        data_shard = NamedSharding(mesh, P("dp", None, None))
        jit_step = jax.jit(step)
        p_out, _, loss_out = jit_step(params_s, opt_state,
                                      jax.device_put(xs, data_shard),
                                      jax.device_put(tgt, data_shard))
        assert np.allclose(float(loss_ref), float(loss_out), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_out)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-4)

        # the window loss equals the scan loss (same forward, no scan)
        from gcm_tpu.train.train_step import make_dense_supervised_step

        scan_step = make_dense_supervised_step(model, opt)
        _, _, loss_scan = scan_step(params, opt_state, xs, tgt)
        assert np.allclose(float(loss_scan), float(loss_ref), atol=1e-6)

    def test_sparse_train_step_dp(self):
        B, T, obs, hidden = 8, 4, 8, 16
        model = readme_sparse_gcm(obs_size=obs, hidden=hidden, graph_size=12,
                                  max_edges=64)
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        step = make_sparse_supervised_step(model, opt)
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, obs))
        tgt = jax.random.normal(jax.random.PRNGKey(2), (B, T, hidden))
        taus = jnp.full((B,), T, jnp.int32)

        _, _, loss_ref = step(params, opt_state, xs, tgt, taus)

        mesh = make_mesh(dp=8, tp=1)
        data_shard = NamedSharding(mesh, P("dp", None, None))
        xs_s = jax.device_put(xs, data_shard)
        _, _, loss_out = jax.jit(step)(params, opt_state, xs_s, tgt, taus)
        assert np.allclose(float(loss_ref), float(loss_out), atol=1e-5)


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out, state = jax.jit(fn)(*args)
        assert out.shape == (32, 32)
        assert np.isfinite(np.array(out)).all()


class TestBandedPartition:
    """Node-sharded BandedRingGCM scan (parallel/banded_partition.py) —
    exact parity with the unsharded scan on the virtual mesh; the CP-analog
    ring-halo design from SURVEY.md N6."""

    def _model(self, hops, N, F=4):
        from gcm_tpu.models.banded_gcm import BandedRingGCM
        from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
        from gcm_tpu.nn.module import MLP, Linear

        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                        DenseGraphConv(F, F), jnp.tanh])
        return BandedRingGCM(gnn, preprocessor=MLP([Linear(F, F)]),
                             hops=hops, graph_size=N)

    def _run(self, hops, N, d, B=2, F=4, T=None):
        from gcm_tpu.parallel.banded_partition import (banded_scan_sharded,
                                                       shard_banded_state)
        from gcm_tpu.parallel.mesh import make_mesh

        T = T or (2 * N + 3)  # wraps past capacity
        model = self._model(hops, N, F)
        params = model.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        want, ws = model.scan(params, xs, model.initial_state(B, F))

        mesh = make_mesh(dp=d, tp=1, devices=jax.devices()[:d])
        # reuse the dp axis name as the node-shard axis
        scan = banded_scan_sharded(model, mesh, axis="dp")
        state = shard_banded_state(model.initial_state(B, F), mesh,
                                   axis="dp")
        got, gs = jax.jit(scan, static_argnums=())(params, xs, state)
        assert np.allclose(np.array(want), np.array(got), atol=1e-5), (
            np.abs(np.array(want) - np.array(got)).max())
        assert np.allclose(np.array(ws.nodes), np.array(gs.nodes),
                           atol=1e-6)

    def test_single_hop_8way(self):
        self._run((1,), N=16, d=8)

    def test_multi_hop_4way(self):
        self._run((1, 2), N=16, d=4)

    def test_hop_at_halo_boundary(self):
        # max hop == shard width: halo is the entire neighbor block
        self._run((2,), N=8, d=4)


class TestBandedScoredPartition:
    """Node-sharded BandedScoredGCM scan — windowed-distance memory over a
    mesh axis (raw-window ppermute at insert + per-layer halo); parity vs
    the unsharded scan on the virtual mesh."""

    def _run(self, N, d, window, hops=(), B=2, F=4, T=None, learned=False):
        from gcm_tpu.edges.distance import EuclideanEdge
        from gcm_tpu.models.banded_gcm import BandedScoredGCM
        from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
        from gcm_tpu.nn.module import MLP, Linear
        from gcm_tpu.parallel.banded_partition import (
            banded_scored_scan_sharded, shard_banded_scored_state)
        from gcm_tpu.parallel.mesh import make_mesh

        T = T or (2 * N + 3)  # wraps past capacity
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                        DenseGraphConv(F, F), jnp.tanh])
        dist = EuclideanEdge(max_distance=1.1, learned=learned,
                             window=window)
        model = BandedScoredGCM(gnn, distance=dist, hops=hops,
                                preprocessor=MLP([Linear(F, F)]),
                                graph_size=N)
        params = model.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        want, ws = model.scan(params, xs, model.initial_state(B, F))

        mesh = make_mesh(dp=d, tp=1, devices=jax.devices()[:d])
        scan = banded_scored_scan_sharded(model, mesh, axis="dp")
        state = shard_banded_scored_state(model.initial_state(B, F), mesh,
                                          axis="dp")
        got, gs = jax.jit(scan)(params, xs, state)
        assert np.allclose(np.array(want), np.array(got), atol=1e-5), (
            np.abs(np.array(want) - np.array(got)).max())
        assert np.allclose(np.array(ws.nodes), np.array(gs.nodes),
                           atol=1e-6)
        assert np.allclose(np.array(ws.band), np.array(gs.band), atol=1e-6)

    def test_4way_window2(self):
        self._run(N=16, d=4, window=2)

    def test_8way_window_at_block_boundary(self):
        # window == shard width: the halo is the whole neighbor block
        self._run(N=16, d=8, window=2)

    def test_4way_with_hops_and_learned_scale(self):
        self._run(N=16, d=4, window=3, hops=(1,), learned=True)


class TestCliquePartition:
    """Node-sharded CliqueGCM scan — the shared clique aggregate makes the
    only collective one [B,F] psum per layer-step; parity vs the unsharded
    scan on the virtual mesh."""

    def _run(self, N, d, B=2, F=4, T=None):
        from gcm_tpu.models.clique_gcm import CliqueGCM
        from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
        from gcm_tpu.nn.module import MLP, Linear
        from gcm_tpu.parallel.banded_partition import (clique_scan_sharded,
                                                       shard_banded_state)
        from gcm_tpu.parallel.mesh import make_mesh

        T = T or (2 * N + 3)  # wraps past capacity
        gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh,
                        DenseGraphConv(F, F), jnp.tanh])
        model = CliqueGCM(gnn, preprocessor=MLP([Linear(F, F)]),
                          graph_size=N)
        params = model.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
        want, ws = model.scan(params, xs, model.initial_state(B, F))

        mesh = make_mesh(dp=d, tp=1, devices=jax.devices()[:d])
        scan = clique_scan_sharded(model, mesh, axis="dp")
        state = shard_banded_state(model.initial_state(B, F), mesh,
                                   axis="dp")
        got, gs = jax.jit(scan)(params, xs, state)
        assert np.allclose(np.array(want), np.array(got), atol=1e-5), (
            np.abs(np.array(want) - np.array(got)).max())
        assert np.allclose(np.array(ws.nodes), np.array(gs.nodes),
                           atol=1e-6)

    def test_8way(self):
        self._run(N=16, d=8)

    def test_4way_uneven_traj(self):
        self._run(N=16, d=4, T=21)


class TestDPTrainer:
    """Data-parallel A2C: dp_mesh shards the rollout batch across the mesh
    (GSPMD inserts the gradient all-reduce); results match the unsharded
    trainer."""

    def test_dp_update_matches_single_device(self):
        from gcm_tpu.edges.temporal import TemporalBackedge
        from gcm_tpu.parallel.mesh import make_mesh
        from gcm_tpu.rl.a2c import A2C
        from gcm_tpu.rl.env import RecallEnv
        from gcm_tpu.rl.wrappers import GCMActorCritic

        env = RecallEnv(num_symbols=2, horizon=4, noise_dim=2)

        def mk(mesh):
            pol = GCMActorCritic(env.obs_dim, env.num_actions,
                                 env.num_actions, graph_size=env.horizon + 1,
                                 gnn_input_size=8, gnn_output_size=8,
                                 edge_selectors=TemporalBackedge([1]))
            return A2C(env, pol, dp_mesh=mesh)

        mesh = make_mesh(dp=8, tp=1, devices=jax.devices()[:8])
        plain = mk(None)
        dp = mk(mesh)
        params, opt_state = plain.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        p1, o1, m1 = plain.update(params, opt_state, key, 16)
        p2, o2, m2 = dp.update(params, opt_state, key, 16)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-5)
        assert np.allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-5)

    def test_dp_update_matches_single_device_clique_window(self):
        """dp_mesh A2C on core='clique': training replay routes through
        CliqueGCM.window() (the [B·T,N,F] slot formulation) — sharded
        updates must match single-device ones there too."""
        from gcm_tpu.edges.dense import DenseEdge
        from gcm_tpu.parallel.mesh import make_mesh
        from gcm_tpu.rl.a2c import A2C
        from gcm_tpu.rl.env import RecallEnv
        from gcm_tpu.rl.wrappers import GCMActorCritic

        env = RecallEnv(num_symbols=2, horizon=4, noise_dim=2)

        def mk(mesh):
            pol = GCMActorCritic(env.obs_dim, env.num_actions,
                                 env.num_actions, core="clique",
                                 graph_size=env.horizon + 1,
                                 gnn_input_size=8, gnn_output_size=8,
                                 edge_selectors=DenseEdge())
            return A2C(env, pol, dp_mesh=mesh)

        mesh = make_mesh(dp=8, tp=1, devices=jax.devices()[:8])
        plain = mk(None)
        dp = mk(mesh)
        params, opt_state = plain.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        p1, o1, m1 = plain.update(params, opt_state, key, 16)
        p2, o2, m2 = dp.update(params, opt_state, key, 16)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-5)
        assert np.allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-5)

    def test_ppo_dp_update_matches_single_device(self):
        """PPO with dp_mesh: the permuted minibatch gather is re-constrained
        onto the dp axis after the gather (rl/ppo.py), so sharded updates are
        numerically identical to single-device ones."""
        from gcm_tpu.edges.temporal import TemporalBackedge
        from gcm_tpu.parallel.mesh import make_mesh
        from gcm_tpu.rl.env import RecallEnv
        from gcm_tpu.rl.ppo import PPO
        from gcm_tpu.rl.wrappers import GCMActorCritic

        env = RecallEnv(num_symbols=2, horizon=4, noise_dim=2)

        def mk(mesh):
            pol = GCMActorCritic(env.obs_dim, env.num_actions,
                                 env.num_actions, graph_size=env.horizon + 1,
                                 gnn_input_size=8, gnn_output_size=8,
                                 edge_selectors=TemporalBackedge([1]))
            return PPO(env, pol, epochs=2, num_minibatches=2, dp_mesh=mesh)

        mesh = make_mesh(dp=8, tp=1, devices=jax.devices()[:8])
        plain = mk(None)
        dp = mk(mesh)
        params, opt_state = plain.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        p1, o1, m1 = plain.update(params, opt_state, key, 16)
        p2, o2, m2 = dp.update(params, opt_state, key, 16)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            assert np.allclose(np.array(a), np.array(b), atol=1e-5)
        assert np.allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-5)

    def test_dp_trains(self):
        from gcm_tpu.edges.temporal import TemporalBackedge
        from gcm_tpu.parallel.mesh import make_mesh
        from gcm_tpu.rl.a2c import A2C
        from gcm_tpu.rl.env import RecallEnv
        from gcm_tpu.rl.wrappers import GCMActorCritic

        env = RecallEnv(num_symbols=2, horizon=4, noise_dim=2)
        mesh = make_mesh(dp=8, tp=1, devices=jax.devices()[:8])
        pol = GCMActorCritic(env.obs_dim, env.num_actions, env.num_actions,
                             graph_size=env.horizon + 1, gnn_input_size=8,
                             gnn_output_size=8,
                             edge_selectors=TemporalBackedge([1]))
        tr = A2C(env, pol, dp_mesh=mesh)
        params, opt_state = tr.init(jax.random.PRNGKey(0))
        for i in range(3):
            params, opt_state, m = tr.update(params, opt_state,
                                             jax.random.PRNGKey(10 + i), 16)
        assert np.isfinite(float(m["loss"]))
