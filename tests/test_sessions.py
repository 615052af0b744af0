"""SessionServer — batched streaming inference with per-session memory.

The correctness bar: however requests interleave across sessions, each
session's belief stream must equal running its observation sequence alone
through the model (row assignment, masking, and other sessions' traffic
must be invisible).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.models.ring_gcm import RingDenseGCM
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import MLP, Linear
from gcm_tpu.serve.sessions import SessionServer


def make_model(F=4, N=6):
    gnn = DenseGNN([DenseGraphConv(F, F), jnp.tanh])
    return RingDenseGCM(gnn, preprocessor=MLP([Linear(F, F)]),
                        edge_selectors=TemporalBackedge([1]), graph_size=N)


def solo_beliefs(model, params, xs):
    """Reference: the session's stream alone through model.scan."""
    outs, _ = model.scan(params, xs[None], model.initial_state(1,
                                                               xs.shape[-1]))
    return np.asarray(outs[0])


class TestSessionServer:
    def test_interleaved_sessions_match_solo_runs(self):
        F = 4
        model = make_model(F)
        params = model.init(jax.random.PRNGKey(0))
        srv = SessionServer(model, params, capacity=3, obs_dim=F)

        streams = {sid: jax.random.normal(jax.random.PRNGKey(10 + sid),
                                          (5, F)) for sid in (1, 2, 3)}
        got = {sid: [] for sid in streams}
        # interleave: s1 on every call, s2 on even, s3 on odd
        cursors = {sid: 0 for sid in streams}
        schedule = [(1, 2), (1, 3), (1, 2), (1, 3), (1, 2), (2,), (3,),
                    (1, 3), (2, 3), (3,)]
        for sids in schedule:
            reqs = {}
            for sid in sids:
                if cursors[sid] < 5:
                    reqs[sid] = streams[sid][cursors[sid]]
                    cursors[sid] += 1
            out = srv.step(reqs)
            for sid, b in out.items():
                got[sid].append(b)

        for sid, xs in streams.items():
            want = solo_beliefs(model, params, xs[:cursors[sid]])
            np.testing.assert_allclose(np.stack(got[sid]), want, atol=1e-5)

    def test_lru_eviction_and_fresh_memory(self):
        F = 4
        model = make_model(F)
        params = model.init(jax.random.PRNGKey(0))
        srv = SessionServer(model, params, capacity=2, obs_dim=F)
        x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (F,)))

        srv.step({"a": x})
        srv.step({"b": x})
        srv.step({"a": x})          # b is now LRU
        assert srv.num_active == 2
        out_c = srv.step({"c": x})  # evicts b
        assert srv.num_active == 2 and "b" not in srv._row_of
        # c starts from fresh memory: first belief == solo first belief
        want = solo_beliefs(model, params, jnp.asarray(x)[None])[0]
        np.testing.assert_allclose(out_c["c"], want, atol=1e-5)
        # b rejoins as a NEW session (fresh memory), in a's old slot or b's
        out_b = srv.step({"b": x})
        np.testing.assert_allclose(out_b["b"], want, atol=1e-5)

    def test_stats_counters(self):
        F = 4
        model = make_model(F)
        params = model.init(jax.random.PRNGKey(0))
        srv = SessionServer(model, params, capacity=2, obs_dim=F)
        x = np.zeros(F, np.float32)
        srv.step({"a": x, "b": x})   # 2 allocations
        srv.step({"a": x})           # b LRU
        srv.step({"c": x})           # evicts b, allocates c
        s = srv.stats
        assert s["ticks"] == 3 and s["requests"] == 4
        assert s["allocations"] == 3 and s["evictions"] == 1
        assert s["active"] == 2 and s["capacity"] == 2

    def test_random_interleavings_property(self):
        """Hypothesis: for ANY request interleaving (random per-tick session
        subsets, random mid-stream end_session restarts), every session's
        belief stream equals running its own observation sub-stream solo.
        Generalizes the fixed interleaving test."""
        from hypothesis import given, settings, strategies as st

        F = 4
        model = make_model(F)
        params = model.init(jax.random.PRNGKey(0))

        @settings(max_examples=15, deadline=None)
        @given(st.lists(
            st.tuples(st.lists(st.integers(0, 3), min_size=1, max_size=4,
                               unique=True),
                      st.integers(-1, 3)),  # (requesters, end_session or -1)
            min_size=1, max_size=6), st.integers(0, 2 ** 31 - 1))
        def run(script, seed):
            srv = SessionServer(model, params, capacity=4, obs_dim=F)
            rng = np.random.default_rng(seed)
            streams = {i: [] for i in range(4)}  # obs history per session
            beliefs = {i: [] for i in range(4)}
            for requesters, ender in script:
                reqs = {}
                for s in requesters:
                    x = rng.standard_normal(F).astype(np.float32)
                    streams[s].append(x)
                    reqs[f"s{s}"] = x
                out = srv.step(reqs)
                for s in requesters:
                    beliefs[s].append(np.asarray(out[f"s{s}"]))
                if ender >= 0:
                    srv.end_session(f"s{ender}")
                    streams[ender] = []   # restarts fresh on next request
                    beliefs[ender] = []
            for s in range(4):
                if not streams[s]:
                    continue
                xs = jnp.asarray(np.stack(streams[s]))[None]
                want, _ = model.scan(params, xs, model.initial_state(1, F))
                np.testing.assert_allclose(np.stack(beliefs[s]),
                                           np.asarray(want[0]), atol=1e-5)

        run()

    def test_mesh_sharded_pool_matches_unsharded(self):
        """mesh= shards the capacity axis over devices (8-way virtual mesh):
        same request stream -> identical outputs, and the pool actually
        lives on more than one device."""
        from gcm_tpu.parallel.mesh import make_mesh

        F = 4
        model = make_model(F)
        params = model.init(jax.random.PRNGKey(0))
        mesh = make_mesh(dp=8)
        srv_1 = SessionServer(model, params, capacity=8, obs_dim=F)
        srv_m = SessionServer(model, params, capacity=8, obs_dim=F,
                              mesh=mesh)
        assert len(srv_m.state.nodes.sharding.device_set) == 8
        rng = np.random.default_rng(0)
        for t in range(5):
            n_live = 2 + (t % 3) * 3  # varies 2..8, exercises allocation
            reqs = {f"s{i}": rng.standard_normal(F) for i in range(n_live)}
            o1 = srv_1.step(dict(reqs))
            om = srv_m.step(dict(reqs))
            for sid in o1:
                np.testing.assert_allclose(np.asarray(o1[sid]),
                                           np.asarray(om[sid]), atol=1e-6)
        # failover across sharding layouts: unsharded snapshot -> mesh server
        snap = srv_1.snapshot()
        srv_m2 = SessionServer(model, params, capacity=8, obs_dim=F,
                               mesh=mesh)
        srv_m2.restore(snap)
        x = rng.standard_normal(F)
        np.testing.assert_allclose(
            np.asarray(srv_1.step({"s0": x})["s0"]),
            np.asarray(srv_m2.step({"s0": x})["s0"]), atol=1e-6)

    def test_snapshot_restore_bit_exact(self):
        """Kill-and-restore mid-stream: a restored server continues every
        session bit-exactly vs an uninterrupted one (incl. LRU order — the
        next eviction picks the same victim)."""
        F = 4
        model = make_model(F)
        params = model.init(jax.random.PRNGKey(0))
        srv_a = SessionServer(model, params, capacity=2, obs_dim=F)
        xs = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (6, F)))

        srv_a.step({"a": xs[0], "b": xs[1]})
        srv_a.step({"a": xs[2]})          # b becomes LRU
        snap = srv_a.snapshot()

        srv_b = SessionServer(model, params, capacity=2, obs_dim=F)
        srv_b.restore(snap)
        out_a = srv_a.step({"a": xs[3], "b": xs[4]})
        out_b = srv_b.step({"a": xs[3], "b": xs[4]})
        for s in ("a", "b"):
            np.testing.assert_array_equal(np.asarray(out_a[s]),
                                          np.asarray(out_b[s]))
        # same LRU victim on both servers after restore
        o1 = srv_a.step({"c": xs[5]})
        o2 = srv_b.step({"c": xs[5]})
        assert set(srv_a._row_of) == set(srv_b._row_of)
        np.testing.assert_array_equal(np.asarray(o1["c"]),
                                      np.asarray(o2["c"]))

    def test_batched_allocation_resets_every_new_row(self):
        """Several NEW sessions in one tick, all landing on dirty reused
        rows, each start from fresh memory (step() wipes all of a tick's
        new rows in one batched reset)."""
        F = 4
        model = make_model(F)
        params = model.init(jax.random.PRNGKey(0))
        srv = SessionServer(model, params, capacity=3, obs_dim=F)
        x = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (F,)))

        for _ in range(3):  # dirty all three rows with history
            srv.step({"a": x, "b": x, "c": x})
        for s in ("a", "b", "c"):
            srv.end_session(s)
        out = srv.step({"d": x, "e": x, "f": x})  # 3 new rows, one tick
        want = solo_beliefs(model, params, jnp.asarray(x)[None])[0]
        for s in ("d", "e", "f"):
            np.testing.assert_allclose(out[s], want, atol=1e-5)

    def test_victim_never_in_current_batch(self):
        F = 4
        model = make_model(F)
        params = model.init(jax.random.PRNGKey(0))
        srv = SessionServer(model, params, capacity=2, obs_dim=F)
        x = np.zeros(F, np.float32)
        srv.step({"a": x})
        srv.step({"b": x})
        # a is LRU, but a is also in this batch -> b must be evicted instead
        srv.step({"a": x, "c": x})
        assert "a" in srv._row_of and "c" in srv._row_of
        assert "b" not in srv._row_of

    def test_end_session_frees_row(self):
        F = 4
        model = make_model(F)
        params = model.init(jax.random.PRNGKey(0))
        srv = SessionServer(model, params, capacity=1, obs_dim=F)
        x = np.zeros(F, np.float32)
        srv.step({"a": x})
        srv.end_session("a")
        assert srv.num_active == 0
        out = srv.step({"b": x})  # no eviction needed, fresh row
        want = solo_beliefs(model, params, jnp.zeros((1, F)))[0]
        np.testing.assert_allclose(out["b"], want, atol=1e-5)

    def test_serving_from_exported_blob(self):
        """Artifact path: export the step, round-trip through bytes, serve
        from the deserialized callable — beliefs match the model-backed
        server exactly."""
        from gcm_tpu.serve.export import export_step, load_step

        F, cap = 4, 3
        model = make_model(F)
        params = model.init(jax.random.PRNGKey(0))
        st0 = model.initial_state(cap, F)
        blob, _ = export_step(model, params, jnp.zeros((cap, F)), st0)
        loaded = load_step(blob)

        srv_model = SessionServer(model, params, capacity=cap, obs_dim=F)
        srv_blob = SessionServer.from_step(loaded, st0, params, obs_dim=F)

        xs = jax.random.normal(jax.random.PRNGKey(5), (4, F))
        for i in range(4):
            reqs = {"a": xs[i]} if i % 2 == 0 else {"a": xs[i],
                                                   "b": xs[i] * 2}
            o1 = srv_model.step(reqs)
            o2 = srv_blob.step(reqs)
            for sid in o1:
                np.testing.assert_allclose(o1[sid], o2[sid], atol=1e-6)

    def test_policy_serving(self):
        """from_policy serves {"logits","value"} per session, matching the
        policy's own sequential step on the same stream."""
        from gcm_tpu.rl.wrappers import GCMActorCritic
        from gcm_tpu.edges.temporal import TemporalBackedge

        pol = GCMActorCritic(obs_dim=4, num_actions=3, num_outputs=3,
                             graph_size=8, gnn_input_size=8,
                             gnn_output_size=8, use_prev_action=False,
                             edge_selectors=TemporalBackedge([1]))
        params = pol.init(jax.random.PRNGKey(0))
        srv = SessionServer.from_policy(pol, params, capacity=3)

        xs = jax.random.normal(jax.random.PRNGKey(1), (4, 4))
        # reference: sequential single-session stepping
        state = pol.initial_state(1)
        want = []
        for i in range(4):
            lo, va, state = pol.step(params, xs[i][None], state)
            want.append((np.asarray(lo[0]), float(va[0])))
        # served interleaved with another session's traffic
        got = []
        for i in range(4):
            out = srv.step({"main": xs[i], "noise": np.zeros(4)})
            got.append(out["main"])
        for (wl, wv), g in zip(want, got):
            np.testing.assert_allclose(g["logits"], wl, atol=1e-5)
            np.testing.assert_allclose(float(g["value"]), wv, atol=1e-5)

    def test_idle_sessions_untouched(self):
        """A session receiving no request must not advance: its next belief
        equals the solo run's next belief regardless of other traffic."""
        F = 4
        model = make_model(F)
        params = model.init(jax.random.PRNGKey(0))
        srv = SessionServer(model, params, capacity=2, obs_dim=F)
        xs = jax.random.normal(jax.random.PRNGKey(3), (3, F))
        noise = jax.random.normal(jax.random.PRNGKey(4), (F,))

        b0 = srv.step({"s": xs[0]})["s"]
        for _ in range(4):  # heavy unrelated traffic
            srv.step({"other": noise})
        b1 = srv.step({"s": xs[1]})["s"]
        b2 = srv.step({"s": xs[2]})["s"]
        want = solo_beliefs(model, params, xs)
        np.testing.assert_allclose(np.stack([b0, b1, b2]), want, atol=1e-5)
