"""Train a graph memory LARGER than one chip: ShardedSparseGCM demo.

The whole SparseGCM step — node buffer, selector grid, compaction, edge
append, convolution — runs 1/d per device under one shard_map
(parallel/sharded_sparse.py), so graph_size can exceed a single chip's HBM.
This demo runs on the CPU virtual mesh; on a real pod slice the same code
shards over the physical devices.

Run:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/train_sharded.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_req = os.environ.get("JAX_PLATFORMS", "")
if _req and "axon" not in _req:
    jax.config.update("jax_platforms", _req)

import jax.numpy as jnp
import optax

from gcm_tpu import ShardedSparseGCM, TemporalEdge
from gcm_tpu.nn.module import MLP, Linear
from gcm_tpu.nn.sparse_conv import GraphConv
from gcm_tpu.parallel.mesh import make_mesh


def main():
    d = len(jax.devices())
    B, OBS, HID, Tw = 8, 12, 32, 16
    N = 64 * d          # graph memory scales WITH the mesh
    mesh = make_mesh(dp=d, tp=1)
    print(f"devices={d}  graph_size={N}  ({N // d} rows/device)")

    model = ShardedSparseGCM(
        [GraphConv(HID, HID), jnp.tanh, GraphConv(HID, HID), jnp.tanh],
        mesh, axis="dp",
        preprocessor=MLP([Linear(OBS, HID)]),
        edge_selectors=TemporalEdge([1, 2]),
        graph_size=N, max_edges=4 * N)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    taus = jnp.full((B,), Tw, jnp.int32)

    # place the state sharded so per-device HBM is 1/d from the start
    state = jax.device_put(model.initial_state(B, OBS),
                           model.state_shardings())

    def loss_fn(p, xs, targets, st):
        outs, st2 = model(p, xs, taus, st)
        return jnp.mean((outs - targets) ** 2), st2

    @jax.jit
    def step(p, o, st, xs, targets):
        (l, st2), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, xs, targets, st)
        updates, o = opt.update(g, o, p)
        return optax.apply_updates(p, updates), o, st2, l

    key = jax.random.PRNGKey(1)
    windows = N // Tw
    for i in range(windows):
        key, k1, k2 = jax.random.split(key, 3)
        xs = jax.random.normal(k1, (B, Tw, OBS))
        tg = jax.random.normal(k2, (B, Tw, HID)) * 0.1
        params, opt_state, state, loss = step(params, opt_state, state,
                                              xs, tg)
        print(f"window {i}: loss={float(loss):.4f} "
              f"t={int(state.t[0])}/{N}")
    print("done — the memory graph filled", int(state.t[0]),
          "rows across", d, "devices")


if __name__ == "__main__":
    main()
