"""Shared model/update definition for the multi-host test: imported both by
the in-test single-process reference and by the 2-process workers, so the
computation is identical by construction."""

import jax
import jax.numpy as jnp

B_GLOBAL, T, OBS, HID, N = 4, 6, 4, 8, 8
LR = 0.1


def build_model_and_data():
    from gcm_tpu.models.banded_gcm import BandedRingGCM
    from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
    from gcm_tpu.nn.module import MLP, Linear

    gnn = DenseGNN([DenseGraphConv(HID, HID), jnp.tanh,
                    DenseGraphConv(HID, HID), jnp.tanh])
    model = BandedRingGCM(gnn, preprocessor=MLP([Linear(OBS, HID)]),
                          hops=(1,), graph_size=N)
    params = model.init(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (B_GLOBAL, T, OBS))
    ys = jax.random.normal(jax.random.PRNGKey(2), (B_GLOBAL, T, HID))
    return model, params, xs, ys


def updated_param_checksum(model, params, xs, ys, mesh=None):
    """One supervised SGD step on the window() forward; returns
    (sum of |updated params|, grad norm). With a mesh, params/outputs are
    replicated and the batch is dp-sharded — XLA inserts the cross-process
    gradient psum (the DCN path)."""

    def loss_fn(p, xs, ys):
        outs, _ = model.window(p, xs, model.initial_state(xs.shape[0], OBS))
        return jnp.mean((outs - ys) ** 2)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        grads_fn = jax.jit(jax.grad(loss_fn), out_shardings=jax.tree.map(
            lambda _: rep, params))
    else:
        grads_fn = jax.jit(jax.grad(loss_fn))
    grads = grads_fn(params, xs, ys)
    new_params = jax.tree.map(lambda p, g: p - LR * g, params, grads)
    checksum = sum(float(jnp.sum(jnp.abs(l)))
                   for l in jax.tree.leaves(new_params))
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                               for g in jax.tree.leaves(grads))))
    return checksum, gnorm


def sharded_sparse_checksum(mesh=None):
    """Forward one SparseGCM window; with a mesh, the END-TO-END sharded
    core (parallel/sharded_sparse.py) runs with its node axis spanning the
    mesh — in the 2-process test the halo ppermute / softmax psum / output
    psum cross the process boundary (the DCN analog for a graph memory
    larger than one host). Returns (output checksum, total edge count) —
    must match the replicated single-process core exactly (to float
    reassociation)."""
    import numpy as np

    from gcm_tpu.edges.sparse_learned import LearnedEdge
    from gcm_tpu.models.sparse_gcm import SparseGCM
    from gcm_tpu.nn.module import MLP, Linear
    from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN

    NS, ES, TW = 32, 128, 5
    stack = [GraphConv(HID, HID), jnp.tanh, GraphConv(HID, HID), jnp.tanh]

    def sel():
        return LearnedEdge(input_size=OBS, deterministic=True,
                           num_edge_samples=3, window=6)

    ref = SparseGCM(SparseGNN(stack), preprocessor=MLP([Linear(OBS, HID)]),
                    edge_selectors=sel(), graph_size=NS, max_edges=ES)
    params = ref.init(jax.random.PRNGKey(3))
    xs_np = np.asarray(
        jax.random.normal(jax.random.PRNGKey(4), (B_GLOBAL, TW, OBS)))
    taus_np = np.full((B_GLOBAL,), TW, np.int32)

    if mesh is None:
        mx, st = ref(params, jnp.asarray(xs_np), jnp.asarray(taus_np),
                     ref.initial_state(B_GLOBAL, OBS))
        n_edges = int(jnp.sum(st.num_edges))
        return float(jnp.sum(jnp.abs(mx))), n_edges

    from jax.sharding import NamedSharding, PartitionSpec as P

    from gcm_tpu.parallel.sharded_sparse import ShardedSparseGCM

    model = ShardedSparseGCM(stack, mesh, axis="dp",
                             preprocessor=MLP([Linear(OBS, HID)]),
                             edge_selectors=sel(), graph_size=NS,
                             max_edges=ES)

    def globalize(np_arr, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            np_arr.shape, sh, lambda idx: np_arr[idx])

    st0 = jax.tree.map(np.asarray, model.initial_state(B_GLOBAL, OBS))
    shardings = model.state_shardings()
    state = type(shardings)(*[
        globalize(a, s.spec) for a, s in zip(st0, shardings)])
    xs_g = globalize(xs_np, P())
    taus_g = globalize(taus_np, P())
    params_g = jax.tree.map(lambda a: globalize(np.asarray(a), P()), params)

    # reduce to replicated scalars INSIDE jit: sharded leaves of the new
    # state are not fully addressable per process
    def run(p, x, t, s):
        mx, st = model(p, x, t, s)
        return jnp.sum(jnp.abs(mx)), jnp.sum(st.num_edges)

    ssum, n_edges = jax.jit(run)(params_g, xs_g, taus_g, state)
    return float(ssum), int(n_edges)
