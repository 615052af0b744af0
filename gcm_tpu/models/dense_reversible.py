"""Reversible backward for the fused DENSE scan — the dense-core mirror of
models/ring_reversible.py (which see for the full rationale: the training
scan saves the [B,N,N] adjacency carry per step; an invertible step lets
the backward reconstruct it in the reverse pass instead).

The fused dense step (dense_gcm.py::_call_fused) is shift-then-rewrite:

    over   = num_nodes + 1 > N;  num2 = num_nodes − over
    nodes' = (shift-up-if-over nodes) with row num2          <- x
    adj'   = (shift-up-left-if-over adj) with row/col num2   <- selector
             values where written, else the post-shift base

Both phases are invertible given what they destroy:

    rewrite:  row/col num2 of the post-shift base — for over batches the
              shift pads them to ZERO (num2 = N−1 lands on the pad), for
              non-over batches they are the pre-state's row/col num2 —
              saved as base_row/base_col ([B,N] each; node row num2 as
              node_ev [B,F]).
    shift:    row 0 / column 0 of the pre-state — saved as
              node_row0 [B,F], adj_row0/adj_col0 ([B,N] each) — plus the
              one `over` bit; the shifted-out TAIL (index N−1) was filled
              with zeros by the forward, so dropping it back is lossless.

Residuals per step: O(B·(4N + 2F)) instead of the autodiff scan's
O(B·N²) carry copy. The reverse scan restores row/col num2, un-shifts, and
re-runs the step under jax.vjp (activation remat; per-step PRNG keys are
threaded and replayed bitwise exactly as in ring_reversible).

Scope: DENSE_FUSED_STEP-eligible selectors (dense_fused_supported), no
dones, no edge_weights. Forward bit-identical to the fused scan; grads
match autodiff to reassociation (tests/test_dense_reversible.py).

Reference context: the same whole-trajectory replay the rllib adapter
backprops through (ray_gcm.py:200-209).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_reversible_supported(model, key=None, dones=None) -> bool:
    del key  # per-step keys are threaded + replayed bitwise
    from gcm_tpu.models.dense_gcm import DenseGCM, dense_fused_supported

    return (isinstance(model, DenseGCM) and dones is None
            and not model.edge_weights and dense_fused_supported(model))


def dense_reversible_scan(model, params, xs, state, key=None):
    """Fused dense scan with the reversible backward. Returns
    (outs [B,T,F'], final DenseGraphState)."""
    from gcm_tpu.core.graph_state import DenseGraphState

    assert dense_reversible_supported(model), "see dense_reversible_supported"
    nodes0, adj0, weights0, n0 = state
    assert weights0.size == 0
    B, T, _ = xs.shape
    N = model.graph_size
    b_idx = jnp.arange(B)
    n0f = n0.astype(jnp.float32)  # int-in-float through custom_vjp (< 2^24)
    typed_key = False
    if key is not None:
        ks = jax.random.split(key, T)
        typed_key = jnp.issubdtype(ks.dtype, jax.dtypes.prng_key)
        kdata = jax.random.key_data(ks) if typed_key else ks
        keys_f = jax.lax.bitcast_convert_type(kdata, jnp.float32)
    else:
        keys_f = jnp.zeros((T, 0), jnp.float32)

    def step_key(kf):
        if kf.shape[-1] == 0:
            return None
        kd = jax.lax.bitcast_convert_type(kf, jnp.uint32)
        return jax.random.wrap_key_data(kd) if typed_key else kd

    def fused(p, x, kf, nodes, adj, num):
        w = jnp.zeros((0,), nodes.dtype)
        out, st = model._call_fused(
            p, x, DenseGraphState(nodes, adj, w, num), step_key(kf))
        return out, st.nodes, st.adj

    def residuals(nodes, adj, num):
        """What this step will destroy (see module docstring)."""
        over = num + 1 > N
        num2 = jnp.where(over, num - 1, num)
        safe = jnp.clip(num2, 0, N - 1)
        ovf = over[:, None]
        node_row0 = nodes[:, 0, :]
        node_ev = jnp.where(ovf, 0.0, nodes[b_idx, safe, :])
        adj_row0 = adj[:, 0, :]
        adj_col0 = adj[:, :, 0]
        base_row = jnp.where(ovf, 0.0, adj[b_idx, safe, :])
        base_col = jnp.where(ovf, 0.0, adj[b_idx, :, safe])
        return over, node_row0, node_ev, adj_row0, adj_col0, base_row, \
            base_col

    @jax.custom_vjp
    def run(p, xs_in, kf_in, nodes_in, adj_in, n0f_in):
        (outs, nodesF, adjF, _), _ = _fwd_core(p, xs_in, kf_in, nodes_in,
                                               adj_in, n0f_in)
        return outs, nodesF, adjF

    def _fwd_core(p, xs_in, kf_in, nodes_in, adj_in, n0f_in):
        n_start = n0f_in.astype(jnp.int32)

        def step(carry, inp):
            x, kf = inp
            nodes, adj, num = carry
            res = residuals(nodes, adj, num)
            out, nodes2, adj2 = fused(p, x, kf, nodes, adj, num)
            over = res[0]
            num2 = jnp.where(over, num - 1, num)
            return (nodes2, adj2, num2 + 1), (out,) + res

        (nodesF, adjF, nF), ys = jax.lax.scan(
            step, (nodes_in, adj_in, n_start),
            (jnp.swapaxes(xs_in, 0, 1), kf_in))
        outs = jnp.swapaxes(ys[0], 0, 1)
        return (outs, nodesF, adjF, nF), ys[1:]

    def run_fwd(p, xs_in, kf_in, nodes_in, adj_in, n0f_in):
        (outs, nodesF, adjF, nF), res = _fwd_core(p, xs_in, kf_in, nodes_in,
                                                  adj_in, n0f_in)
        return (outs, nodesF, adjF), (p, xs_in, kf_in, res, nodesF, adjF, nF)

    def run_bwd(resid, cot):
        p, xs_in, kf_in, res, nodesF, adjF, nF = resid
        (ov_s, nr0_s, nev_s, ar0_s, ac0_s, br_s, bc_s) = res
        g_outs, g_nodesF, g_adjF = cot
        g_p0 = jax.tree_util.tree_map(jnp.zeros_like, p)
        iarr = jnp.arange(N)

        def rstep(carry, per):
            nodes_post, adj_post, n_post, g_nodes, g_adj, g_p = carry
            x, kf, g_out, over, nr0, nev, ar0, ac0, br, bc = per
            num2 = n_post - 1
            num_pre = num2 + over.astype(num2.dtype)
            i_eq = iarr[None, :] == num2[:, None]          # [B, N]
            ovm = over[:, None, None]
            # un-rewrite: restore row/col num2 to the post-shift base
            nodes_sh = jnp.where(i_eq[..., None], nev[:, None, :],
                                 nodes_post)
            adj_sh = jnp.where(i_eq[:, :, None], br[:, None, :],
                               jnp.where(i_eq[:, None, :], bc[:, :, None],
                                         adj_post))
            # un-shift (over batches): rows/cols move down-right by one,
            # row/col 0 restored from the saved pre-state content
            nodes_dn = jnp.concatenate([nr0[:, None, :], nodes_sh[:, :-1]],
                                       axis=1)
            nodes_pre = jnp.where(ovm[..., 0][..., None], nodes_dn, nodes_sh)
            adj_dn = jnp.pad(adj_sh[:, :-1, :-1],
                             ((0, 0), (1, 0), (1, 0)))
            adj_dn = jnp.where(iarr[None, :, None] == 0,
                               ar0[:, None, :], adj_dn)
            adj_dn = jnp.where(iarr[None, None, :] == 0,
                               jnp.where(iarr[None, :, None] == 0,
                                         ar0[:, 0][:, None, None],
                                         ac0[:, :, None]), adj_dn)
            adj_pre = jnp.where(ovm, adj_dn, adj_sh)
            _, vjp = jax.vjp(
                lambda pp, xx, nn, aa: fused(pp, xx, kf, nn, aa, num_pre),
                p, x, nodes_pre, adj_pre)
            gp, gx, g_nodes_pre, g_adj_pre = vjp((g_out, g_nodes, g_adj))
            g_p = jax.tree_util.tree_map(jnp.add, g_p, gp)
            return (nodes_pre, adj_pre, num_pre, g_nodes_pre, g_adj_pre,
                    g_p), gx

        per = (jnp.swapaxes(xs_in, 0, 1), kf_in,
               jnp.swapaxes(g_outs, 0, 1), ov_s, nr0_s, nev_s, ar0_s, ac0_s,
               br_s, bc_s)
        (_, _, _, g_nodes0, g_adj0, g_p), gx = jax.lax.scan(
            rstep, (nodesF, adjF, nF, g_nodesF, g_adjF, g_p0), per,
            reverse=True)
        g_xs = jnp.swapaxes(gx, 0, 1)
        return (g_p, g_xs, jnp.zeros_like(kf_in), g_nodes0, g_adj0,
                jnp.zeros(nF.shape, jnp.float32))

    run.defvjp(run_fwd, run_bwd)

    outs, nodesF, adjF = run(params, xs, keys_f, nodes0, adj0, n0f)
    nF = jnp.minimum(n0 + jnp.asarray(T, n0.dtype),
                     jnp.full_like(n0, N))
    return outs, DenseGraphState(nodesF, adjF, weights0, nF)
