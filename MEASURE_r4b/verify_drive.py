import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_default_matmul_precision", "highest")
import gcm_tpu as g

print("devices:", jax.devices(), flush=True)

B, obs, HID, N, T = 32, 8, 32, 128, 64
gnn = g.DenseGNN([g.DenseGraphConv(HID, HID), jnp.tanh,
                  g.DenseGraphConv(HID, HID), jnp.tanh])
from gcm_tpu.nn.module import MLP, Linear
gcm = g.DenseGCM(gnn, preprocessor=MLP([Linear(obs, HID)]),
                 edge_selectors=g.TemporalBackedge([1]), graph_size=N)
params = gcm.init(jax.random.PRNGKey(0))
state = gcm.initial_state(B, obs)
step = jax.jit(lambda p, x, s: gcm(p, x, s))
t0 = time.time()
for i in range(4):
    x = jnp.full((B, obs), float(i))
    belief, state = step(params, x, state)
print(f"RL-style loop ok (first-compile {time.time()-t0:.0f}s), belief {belief.shape}", flush=True)

xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, obs))
scan = jax.jit(lambda p, xs, s: gcm.scan(p, xs, s))
outs, st = scan(params, xs, gcm.initial_state(B, obs))
print(f"dense scan ok {outs.shape}, sum {float(jnp.sum(outs)):.3f}", flush=True)

# sparse whole-rollout + pack/unpack round trip
sgnn = g.SparseGNN([g.GraphConv(HID, HID), jnp.tanh, g.GraphConv(HID, HID), jnp.tanh])
sgcm = g.SparseGCM(sgnn, preprocessor=MLP([Linear(obs, HID)]),
                   edge_selectors=g.TemporalEdge([1]), graph_size=N, max_edges=4*N)
sp = sgcm.init(jax.random.PRNGKey(0))
# transplant dense params so parity is meaningful
sp = {**sp, "gnn": [{"lin_rel": params["gnn"][0]["lin_rel"], "lin_root": params["gnn"][0]["lin_root"]}, {},
                    {"lin_rel": params["gnn"][2]["lin_rel"], "lin_root": params["gnn"][2]["lin_root"]}, {}],
      "preprocessor": params["preprocessor"]}
taus = jnp.full((B,), T, jnp.int32)
souts, sstate = jax.jit(lambda p, x, t, s: sgcm(p, x, t, s))(sp, xs, taus, sgcm.initial_state(B, obs))
from gcm_tpu.utils.packing import pack_hidden, unpack_hidden
packed = pack_hidden(sstate, max_edges=4*N)
rt = unpack_hidden(packed, max_edges=4*N)
for a, b in zip(sstate, rt):
    assert jnp.array_equal(a, b), "pack/unpack round trip"
print("sparse whole-rollout + pack/unpack round trip ok", flush=True)

diff = float(jnp.max(jnp.abs(outs - souts)))
print(f"dense scan vs sparse whole-rollout max abs diff: {diff:.2e}", flush=True)
assert diff == 0.0, "parity broke"

def loss(p):
    o, _ = gcm.scan(p, xs, gcm.initial_state(B, obs))
    return jnp.sum(o ** 2)
gn = jax.jit(lambda p: jax.tree_util.tree_reduce(
    lambda a, l: a + jnp.sum(l * l), jax.grad(loss)(p), 0.0))(params)
gn = float(gn) ** 0.5
print(f"grad norm {gn:.3e}", flush=True)
assert 0 < gn < float("inf")

# NEW this session: hop_cap compaction parity on-chip
cg = g.SparseGCM(sgnn, preprocessor=MLP([Linear(obs, HID)]),
                 edge_selectors=g.TemporalEdge([1, 2]), graph_size=N,
                 max_edges=4*N, max_hops=2, hop_cap=80)
mg = g.SparseGCM(sgnn, preprocessor=MLP([Linear(obs, HID)]),
                 edge_selectors=g.TemporalEdge([1, 2]), graph_size=N,
                 max_edges=4*N, max_hops=2)
cp = cg.init(jax.random.PRNGKey(3))
oc, _, auxc = jax.jit(lambda p, x, t, s: cg(p, x, t, s, return_aux=True))(cp, xs, taus, cg.initial_state(B, obs))
om, _ = jax.jit(lambda p, x, t, s: mg(p, x, t, s))(cp, xs, taus, mg.initial_state(B, obs))
d2 = float(jnp.max(jnp.abs(oc - om)))
print(f"hop_cap vs masked max abs diff: {d2:.2e}, overflow={int(jnp.max(auxc['hop_overflow']))}", flush=True)
assert d2 < 1e-5

# NEW this session: hop_cap='auto' — forced into the engage regime, must
# match the masked path on-chip and pick the structural cap
from gcm_tpu import config as _cfg
_old = (_cfg.HOP_AUTO_RATIO, _cfg.HOP_AUTO_MIN_NF)
_cfg.apply_tuning({"HOP_AUTO_RATIO": 1, "HOP_AUTO_MIN_NF": 0})
ag = g.SparseGCM(sgnn, preprocessor=MLP([Linear(obs, HID)]),
                 edge_selectors=g.TemporalEdge([1, 2]), graph_size=N,
                 max_edges=4*N, max_hops=2, hop_cap="auto")
cap = ag._resolve_hop_cap(T, N, HID)
assert cap == min(N, -(-(T + 2 * 2) // 8) * 8), cap
oa, _ = jax.jit(lambda p, x, t, s: ag(p, x, t, s))(cp, xs, taus, ag.initial_state(B, obs))
_cfg.apply_tuning({"HOP_AUTO_RATIO": _old[0], "HOP_AUTO_MIN_NF": _old[1]})
assert ag._resolve_hop_cap(T, N, HID) is None  # default gate: off at N=128
d3 = float(jnp.max(jnp.abs(oa - om)))
print(f"hop_cap='auto' (cap={cap}) vs masked max abs diff: {d3:.2e}", flush=True)
assert d3 < 1e-5

# NEW: auto-core fallback routes to the fused dense core; e2e step
from gcm_tpu.rl.wrappers import GCMActorCritic
pol = GCMActorCritic(obs, 4, 4, core="auto", graph_size=N,
                     gnn_input_size=HID, gnn_output_size=HID,
                     edge_selectors=g.EuclideanEdge(max_distance=1.0))
assert pol.cfg["core"] == "dense", pol.cfg["core"]
pp = pol.init(jax.random.PRNGKey(4))
logits, values, _ = jax.jit(pol)(pp, xs, pol.initial_state(B))
assert logits.shape == (B, T, 4) and bool(jnp.all(jnp.isfinite(logits)))
print("auto->dense policy e2e ok", flush=True)

# NEW: SessionServer with donated pool on the real chip
from gcm_tpu.serve.sessions import SessionServer
import numpy as np
srv = SessionServer(gcm, params, capacity=8, obs_dim=obs)
rng = np.random.default_rng(0)
ref_state = gcm.initial_state(B, obs)
sid_obs = [rng.standard_normal(obs).astype(np.float32) for _ in range(5)]
for i, o in enumerate(sid_obs):
    out = srv.step({"a": o, "b": -o})
    rb, ref_state = step(params, jnp.stack([jnp.asarray(o)] * B), ref_state)
solo = float(jnp.max(jnp.abs(jnp.asarray(out["a"]) - rb[0])))
print(f"SessionServer donated-pool 5-tick drive ok; vs solo core diff {solo:.2e}", flush=True)
assert solo < 1e-5
snap = srv.snapshot()
srv2 = SessionServer(gcm, params, capacity=8, obs_dim=obs)
srv2.restore(snap)
o6 = srv.step({"a": sid_obs[0]}); o6b = srv2.step({"a": sid_obs[0]})
assert jnp.array_equal(jnp.asarray(o6["a"]), jnp.asarray(o6b["a"])), "failover"
print("snapshot/restore bit-exact after donation ok", flush=True)

# probes
try:
    step(params, jnp.ones((B, obs + 1)), gcm.initial_state(B, obs))
    raise SystemExit("FAIL: wrong feature dim accepted")
except (ValueError, TypeError) as e:
    print("wrong-dim probe ok:", str(e)[:60], flush=True)
sgcm.check_overflow(sstate, jnp.zeros((B,), jnp.int32))  # within capacity: no raise
try:
    sgcm.check_overflow(sstate, taus + 1)  # t + taus = 129 > 128
    raise SystemExit("FAIL: overflow not raised")
except Exception as e:
    print("overflow probe ok:", str(e)[:40], flush=True)
print("ALL DRIVE CHECKS PASSED", flush=True)
