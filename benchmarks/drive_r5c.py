"""Round-5 verify drive C (real TPU): the post-drive-A changes —
usage-aware auto core, mesh adapter path (single-device degenerate),
reversible scans, prefetch kernel, trajectory-step dispatch."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)
jax.config.update("jax_default_matmul_precision", "highest")

from gcm_tpu import config
from gcm_tpu.edges.distance import EuclideanEdge
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.rl.wrappers import GCMActorCritic

# 1. auto-core rules on-chip (construction is host-side but e2e runs here)
pol = GCMActorCritic(8, 3, 3, core="auto", graph_size=512,
                     gnn_input_size=32, gnn_output_size=32,
                     edge_selectors=EuclideanEdge(max_distance=1.0,
                                                  window=32))
assert pol.cfg["core"] == "dense", pol.cfg["core"]
pol_t = GCMActorCritic(8, 3, 3, core="auto", graph_size=512,
                       gnn_input_size=32, gnn_output_size=32,
                       usage="trajectory_train",
                       edge_selectors=EuclideanEdge(max_distance=1.0,
                                                    window=32))
assert pol_t.cfg["core"] == "banded_scored", pol_t.cfg["core"]
pol_b = GCMActorCritic(8, 3, 3, core="auto", graph_size=128,
                       gnn_input_size=32, gnn_output_size=32,
                       edge_selectors=TemporalBackedge([1]))
assert pol_b.cfg["core"] == "banded"
params = pol.init(jax.random.PRNGKey(0))
obs = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8))
lo, va, _ = jax.jit(lambda p, o: pol(p, o, pol.initial_state(2)))(params, obs)
assert np.all(np.isfinite(np.asarray(lo)))
print("auto-core usage routing on-chip OK", flush=True)

# 2. reversible scans on the real chip: forward bitwise + grads finite
from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.models.ring_gcm import RingDenseGCM
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import MLP, Linear

for cls, name in ((DenseGCM, "dense"), (RingDenseGCM, "ring")):
    gnn = DenseGNN([DenseGraphConv(32, 32), jnp.tanh,
                    DenseGraphConv(32, 32), jnp.tanh])
    m = cls(gnn, preprocessor=MLP([Linear(8, 32)]),
            edge_selectors=TemporalBackedge([1]), graph_size=16)
    p = m.init(jax.random.PRNGKey(2))
    xs = jax.random.normal(jax.random.PRNGKey(3), (2, 40, 8))
    st = m.initial_state(2, 8)
    o_s, _ = jax.jit(lambda p, x: m.scan(p, x, st))(p, xs)
    o_r, _ = jax.jit(lambda p, x: m.scan(p, x, st, remat="reverse"))(p, xs)
    d = float(jnp.max(jnp.abs(o_s - o_r)))
    g = jax.jit(jax.grad(lambda p: jnp.sum(
        m.scan(p, xs, st, remat="reverse")[0] ** 2)))(p)
    gn = sum(float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(g))
    print(f"{name} reversible on-chip: fwd max diff {d:.2e}, "
          f"grad |sum| {gn:.3e}", flush=True)
    assert d == 0.0 and np.isfinite(gn) and gn > 0

# 3. prefetch kernel on the real chip (exactness at a small shape)
from gcm_tpu.ops.pallas.spmm_prefetch import spmm_prefetch
from gcm_tpu.ops.scatter import edge_scatter_add

x = jax.random.normal(jax.random.PRNGKey(4), (4, 32, 128))
sink = jax.random.randint(jax.random.PRNGKey(5), (4, 64), 0, 32)
src = jax.random.randint(jax.random.PRNGKey(6), (4, 64), 0, 32)
edges = jnp.stack([sink, src], 1).astype(jnp.int32)
w = jax.random.uniform(jax.random.PRNGKey(7), (4, 64))
want = edge_scatter_add(x, edges, w)
got = spmm_prefetch(x, edges, w, n_blocks=4)
err = float(jnp.max(jnp.abs(want - got)))
print(f"spmm_prefetch real-Mosaic max err: {err:.2e}", flush=True)
assert err < 1e-4

# 4. trajectory-step dispatch at a gated N on-chip
import optax
from gcm_tpu.train.train_step import make_trajectory_supervised_step

ring = RingDenseGCM(DenseGNN([DenseGraphConv(32, 32), jnp.tanh,
                              DenseGraphConv(32, 32), jnp.tanh]),
                    preprocessor=MLP([Linear(8, 32)]),
                    edge_selectors=EuclideanEdge(max_distance=1.0),
                    graph_size=512)
opt = optax.adam(1e-3)
step = make_trajectory_supervised_step(ring, opt)
rp = ring.init(jax.random.PRNGKey(8))
xs = jax.random.normal(jax.random.PRNGKey(9), (2, 32, 8))
tg = jax.random.normal(jax.random.PRNGKey(10), (2, 32, 32))
_, _, loss = jax.jit(step)(rp, opt.init(rp), xs, tg)
print(f"trajectory step @N=512 (window-dispatched) loss {float(loss):.4f}",
      flush=True)
assert np.isfinite(float(loss))
print("DRIVE C: ALL OK", flush=True)
