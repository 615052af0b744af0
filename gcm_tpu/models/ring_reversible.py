"""Reversible backward for the fused ring scan (VERDICT r4 weak #2).

The general-core training gap is structural: a lax.scan backward saves the
[B, N, N] adjacency carry as a residual EVERY step (bwd_breakdown r4: the
~18 us/step save/restore interaction term dominates fwd+bwd). Chunked remat
(train_remat_for) only thins the copies to one per chunk.

The FUSED step (ring_gcm.py::_call_fused) removes the residual entirely,
because its state update is an invertible pointwise rewrite:

    nodes' = nodes with row p           <- x
    adj'   = adj   with row p <- row, column p <- col   ((p,p) from row)

Knowing the EVICTED contents — nodes[p] ([B,F]), adj[p,:] and adj[:,p]
([B,N] each) — the pre-step state is reconstructed EXACTLY (pure element
replacement, no float arithmetic) from the post-step state:

    nodes = nodes' with row p           <- evicted_node
    adj   = adj'   with row p <- ev_row, column p <- ev_col  (same (p,p)
            precedence as the rewrite)

So the backward runs as a REVERSE scan carrying (nodes, adj) backwards:
undo the rewrite, re-run the step under jax.vjp (activation remat — any
selector works, including the spardmax/STE custom VJPs), and accumulate
cotangents. Residuals per step shrink from O(B·N²) to O(B·(2N + F)) — the
forward stashes only the evicted row/column/node-row.

Scope: the deterministic, no-dones, no-edge-weights ring configurations
(resets destroy information, so a done step is not invertible; stochastic
selectors would need per-step keys replayed — threaded through `keys` is
possible but unmeasured). Forward output is the plain fused scan's,
bit-identical; backward gradients equal the autodiff scan's to float
reassociation (tests/test_ring_reversible.py pins both).

Reference context: the training path this accelerates is the adapter's
whole-trajectory replay (reference ray_gcm.py:200-209 — rllib backprops
through the same per-step loop; torch also saves per-step graph tensors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reversible_supported(model, key=None, dones=None) -> bool:
    """key IS supported (per-step keys are threaded and replayed bitwise in
    the backward's re-execution); dones are not (a reset destroys the
    information the reverse reconstruction needs), nor is edge_weights (the
    [B,N,N] weights buffer would need its own evicted-row residuals)."""
    del key
    from gcm_tpu.models.ring_gcm import RingDenseGCM

    return (isinstance(model, RingDenseGCM)
            and dones is None and not model.edge_weights)


def reversible_scan(model, params, xs, state, key=None):
    """Fused ring scan whose backward reconstructs the adjacency carry in
    reverse instead of saving it per step. Returns (outs [B,T,F'], state').
    key: optional PRNG key for stochastic selectors — split into per-step
    keys, threaded through the scan (bitcast to f32 so the custom_vjp sees
    a differentiable dtype; zero cotangent), and replayed BITWISE when the
    backward re-executes each step, so stochastic forward outputs are
    identical to model.scan(key=...) and grads flow through the same
    gumbel/STE custom VJPs."""
    from gcm_tpu.models.ring_gcm import RingGraphState

    assert reversible_supported(model), "see reversible_supported"
    nodes0, adj0, weights0, t0 = state
    assert weights0.size == 0
    B, T, _ = xs.shape
    N = model.graph_size
    b_idx = jnp.arange(B)
    # t is int32; custom_vjp wants differentiable-typed inputs, and t < 2^24
    # is exact in f32
    t0f = t0.astype(jnp.float32)
    typed_key = False
    if key is not None:
        ks = jax.random.split(key, T)
        typed_key = jnp.issubdtype(ks.dtype, jax.dtypes.prng_key)
        kdata = jax.random.key_data(ks) if typed_key else ks  # [T, 2] u32
        keys_f = jax.lax.bitcast_convert_type(kdata, jnp.float32)
    else:
        keys_f = jnp.zeros((T, 0), jnp.float32)  # no-key sentinel (empty)

    def step_key(kf):
        if kf.shape[-1] == 0:
            return None
        kd = jax.lax.bitcast_convert_type(kf, jnp.uint32)
        return jax.random.wrap_key_data(kd) if typed_key else kd

    def fused(p, x, kf, nodes, adj, t):
        # edge_weights is off (asserted above), so the weights leaf is an
        # empty placeholder — build it fresh rather than closing over a
        # possibly-traced value inside the custom_vjp body
        w = jnp.zeros((0,), nodes.dtype)
        out, st = model._call_fused(
            p, x, RingGraphState(nodes, adj, w, t), step_key(kf))
        return out, st.nodes, st.adj

    @jax.custom_vjp
    def run(p, xs_in, kf_in, nodes_in, adj_in, t0f_in):
        (outs, nodesF, adjF, _), _ = _fwd_core(p, xs_in, kf_in, nodes_in,
                                               adj_in, t0f_in)
        return outs, nodesF, adjF

    def _fwd_core(p, xs_in, kf_in, nodes_in, adj_in, t0f_in):
        t_start = t0f_in.astype(jnp.int32)

        def step(carry, inp):
            x, kf = inp
            nodes, adj, t = carry
            pc = jnp.mod(t, N)
            ev_node = nodes[b_idx, pc]
            ev_row = adj[b_idx, pc, :]
            ev_col = adj[b_idx, :, pc]
            out, nodes2, adj2 = fused(p, x, kf, nodes, adj, t)
            return (nodes2, adj2, t + 1), (out, ev_node, ev_row, ev_col)

        (nodesF, adjF, tF), (outs, ev_n, ev_r, ev_c) = jax.lax.scan(
            step, (nodes_in, adj_in, t_start),
            (jnp.swapaxes(xs_in, 0, 1), kf_in))
        outs = jnp.swapaxes(outs, 0, 1)
        return (outs, nodesF, adjF, tF), (ev_n, ev_r, ev_c)

    def run_fwd(p, xs_in, kf_in, nodes_in, adj_in, t0f_in):
        (outs, nodesF, adjF, tF), evs = _fwd_core(p, xs_in, kf_in, nodes_in,
                                                  adj_in, t0f_in)
        return (outs, nodesF, adjF), (p, xs_in, kf_in, evs, nodesF, adjF, tF)

    def run_bwd(res, cot):
        p, xs_in, kf_in, (ev_n, ev_r, ev_c), nodesF, adjF, tF = res
        g_outs, g_nodesF, g_adjF = cot
        g_p0 = jax.tree_util.tree_map(jnp.zeros_like, p)
        iarr = jnp.arange(N)

        def rstep(carry, per):
            nodes_post, adj_post, t_post, g_nodes, g_adj, g_p = carry
            x, kf, evn, evr, evc, g_out = per
            t_pre = t_post - 1
            pc = jnp.mod(t_pre, N)
            i_eq_p = iarr[None, :] == pc[:, None]  # [B, N]
            nodes_pre = nodes_post.at[b_idx, pc].set(evn)
            # same (p,p) precedence as the forward rewrite: row wins
            adj_pre = jnp.where(i_eq_p[:, :, None], evr[:, None, :],
                                jnp.where(i_eq_p[:, None, :],
                                          evc[:, :, None], adj_post))
            _, vjp = jax.vjp(
                lambda pp, xx, nn, aa: fused(pp, xx, kf, nn, aa, t_pre),
                p, x, nodes_pre, adj_pre)
            gp, gx, g_nodes_pre, g_adj_pre = vjp((g_out, g_nodes, g_adj))
            g_p = jax.tree_util.tree_map(jnp.add, g_p, gp)
            return (nodes_pre, adj_pre, t_pre, g_nodes_pre, g_adj_pre,
                    g_p), gx

        per = (jnp.swapaxes(xs_in, 0, 1), kf_in, ev_n, ev_r, ev_c,
               jnp.swapaxes(g_outs, 0, 1))
        (nodes0r, adj0r, _, g_nodes0, g_adj0, g_p), gx = jax.lax.scan(
            rstep, (nodesF, adjF, tF, g_nodesF, g_adjF, g_p0), per,
            reverse=True)
        g_xs = jnp.swapaxes(gx, 0, 1)
        return (g_p, g_xs, jnp.zeros_like(kf_in), g_nodes0, g_adj0,
                jnp.zeros(tF.shape, jnp.float32))

    run.defvjp(run_fwd, run_bwd)

    outs, nodesF, adjF = run(params, xs, keys_f, nodes0, adj0, t0f)
    return outs, RingGraphState(nodesF, adjF, weights0,
                                t0 + jnp.asarray(T, t0.dtype))

