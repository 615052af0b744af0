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
