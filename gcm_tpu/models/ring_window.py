"""Scan-free trajectory forward for RingDenseGCM — scored/learned selectors.

Extends the `window()` family (the trick that made the banded core 20x its
scan) to the GENERAL ring core: Distance / LearnedEdge / TemporalBackedge
rows with an UNWINDOWED candidate set, where the banded stencil does not
apply because the conv's receptive field is unbounded.

The observation that makes it possible: with row-only selectors (forward
temporal, non-bidirectional distance, learned), every memory cell the
trajectory ever touches has a FIXED value and a KNOWN lifetime —

- the N initial slots hold `nodes0[k]` until step kill(k) = (k - t0) mod N
  overwrites them (never, if kill >= T),
- the T window inserts hold `x_j` from step j onward (T <= N per chunk, so
  none is re-evicted in-window),

so scoring and aggregation run over a static EXTENDED source space of
M = N + T candidates with per-step validity masks, instead of a mutating
[B, N, N] adjacency carried through a scan:

1. selector rows for ALL steps at once: R [B, T, M] (one batched dist_fn /
   pair-MLP call — the SDDMM shape the MXU wants),
2. layer-1 features for every entity at every step via the KILL-CUMSUM:
   agg1[i, e] = base[e] - sum_{l <= i} R_all[e, p_l] * v_old(p_l) — edges
   only ever *disappear* (eviction), so the time axis is a prefix sum, not
   a recurrence,
3. layer-2 only at the output nodes (belief = the just-inserted row).

O(B*T*M*F) total instead of the scan's O(T * B*N^2*F) conv work — N x fewer
FLOPs — and zero sequential dependencies. Exact semantics of
RingDenseGCM.__call__ steps (which are parity-pinned against DenseGCM /
reference gcm.py:213-321); outputs match the scan to float-accumulation
order (tests/test_ring_window.py pins allclose at 1e-5 plus exact edge-set
checks on the final adjacency).

Supported: 1- or 2-conv DenseGraphConv('add'|'mean') stacks, EdgeChain of
{TemporalBackedge(forward, unlearned), Distance(non-bidirectional,
window=None, incl. learned scale), LearnedEdge(deterministic)}, optional
preprocessor. Not supported (callers fall back to scan): bidirectional /
stochastic selectors, aux selectors, positional encoding, pooled output,
edge_weights, dones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcm_tpu.edges.chain import EdgeChain
from gcm_tpu.edges.distance import Distance
from gcm_tpu.edges.learned import LearnedEdge
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.utils.ste import spardmax, ste


def window_supported(model) -> bool:
    """Can ring_window run this model? (static structure check)"""
    from gcm_tpu.nn.dense_conv import plan_conv_stack

    if (model.aux_edge_selectors is not None or model.pooled
            or model.positional_encoder is not None or model.edge_weights):
        return False
    layers = getattr(model.gnn, "layers", None)
    if layers is None:  # custom GNN callable — general scan only
        return False
    plan = plan_conv_stack(layers, allowed_aggrs=("add", "mean"))
    if plan is None or len(plan[0]) > 2:
        return False

    def sel_ok(sel):
        if isinstance(sel, EdgeChain):
            return all(sel_ok(s) for s in sel.selectors)
        if isinstance(sel, TemporalBackedge):
            return not sel.learned and sel.direction == "forward"
        if isinstance(sel, Distance):
            return not sel.bidirectional and sel.window is None
        if isinstance(sel, LearnedEdge):
            return bool(sel.deterministic)
        return False

    return model.edge_selectors is None or sel_ok(model.edge_selectors)


def _selector_rows(model, sel, params, row, xs, cand, valid_ext, p, t0,
                   pastcap):
    """Selector rows for every step at once: row [B, T, M] over the extended
    source space. Same values RingDenseGCM._selector_row_col produces
    step-by-step (minus the column — row-only selectors)."""
    B, T, _ = xs.shape
    N = model.graph_size
    M = N + T
    iarr = jnp.arange(T)

    if isinstance(sel, EdgeChain):
        for s, sp in zip(sel.selectors, params):
            row = _selector_rows(model, s, sp, row, xs, cand, valid_ext, p,
                                 t0, pastcap)
        return row

    if isinstance(sel, TemporalBackedge):
        for hop in sel.hops:
            ok = pastcap >= hop  # [B, T] (ring past_count >= hop)
            # source at age `hop` from step i: window insert i-hop if the
            # hop lands in-window, else the old slot (p_i - hop) mod N
            idx_ext = jnp.where(iarr[None, :] >= hop,
                                N + (iarr[None, :] - hop),
                                jnp.mod(p - hop, N))  # [B, T]
            hit = (jnp.arange(M)[None, None, :] == idx_ext[:, :, None]) \
                & ok[:, :, None]
            row = jnp.where(hit, 1.0, row)
        return row

    if isinstance(sel, Distance):
        curr, srcs = xs, cand
        if sel.learned:
            scale = params["dist_param"]
            curr, srcs = curr / scale, srcs / scale
        # dist_fn(curr [B,F], nodes [B,M,F]) -> [B,M]; vmap over time with
        # the candidate array FIXED reproduces the per-step broadcast
        # semantics exactly (incl. EuclideanEdge's cross-batch mean) —
        # candidate VALUES never change, only validity does.
        dists = jax.vmap(sel.dist_fn, in_axes=(1, None), out_axes=1)(
            curr, srcs)  # [B, T, M]
        mask = (dists < sel.max_distance) & valid_ext
        return jnp.where(mask, 1.0, row)

    if isinstance(sel, LearnedEdge):
        net_in = jnp.concatenate(
            [jnp.broadcast_to(xs[:, :, None, :], (B, T, M, xs.shape[-1])),
             jnp.broadcast_to(cand[:, None, :, :], (B, T, M, cand.shape[-1]))],
            axis=-1)
        logits = sel.edge_network(params["edge_network"], net_in)[..., 0]
        shaped = jnp.where(valid_ext, logits, -1e10)
        edges = spardmax(shaped, axis=-1)
        return jnp.where(valid_ext, ste(edges + row), row)

    raise NotImplementedError(f"ring window: unsupported selector {sel}")


def _time_cumsum(P, block):
    """Inclusive cumsum of P [B, T, M, F] along axis 1.

    block=None: plain jnp.cumsum — XLA lowers it as log-doubling shifted
    adds, i.e. ~log2(T) full-tensor HBM passes (at T=640 that is ~10
    passes over the window's largest buffer, and the measured window
    throughput sits almost exactly at the roofline divided by that pass
    count — BASELINE.md round-5 cumsum note).

    block=K: two-level scan — intra-block cumsum (log2(K) passes over the
    full tensor) + an exclusive cumsum of the T/K block totals (log-passes
    over 1/K of the data, negligible) + one broadcast add: ~log2(K)+2 full
    passes instead of log2(T). Same values to float reassociation."""
    if block is None:
        return jnp.cumsum(P, axis=1)
    B, T, M, F = P.shape
    if T % block:
        pad = block - T % block
        P = jnp.pad(P, ((0, 0), (0, pad), (0, 0), (0, 0)))
        out = _time_cumsum(P, block)
        return out[:, :T]
    nb = T // block
    Pb = P.reshape(B, nb, block, M, F)
    intra = jnp.cumsum(Pb, axis=2)
    totals = intra[:, :, -1]                       # [B, nb, M, F]
    offs = jnp.cumsum(totals, axis=1) - totals     # exclusive block offsets
    return (intra + offs[:, :, None]).reshape(B, T, M, F)


def _window_chunk(model, params, xs, state):
    """One T <= N chunk. Returns (outs [B,T,F_out], new RingGraphState)."""
    from gcm_tpu.models.ring_gcm import RingGraphState
    from gcm_tpu.nn.dense_conv import conv_project, plan_conv_stack

    nodes0, adj0, weights, t0 = state
    B, T, F = xs.shape
    N = model.graph_size
    M = N + T
    conv_idx, acts, aggrs = plan_conv_stack(model.gnn.layers,
                                            allowed_aggrs=("add", "mean"))

    iarr = jnp.arange(T)
    karr = jnp.arange(N)
    p = jnp.mod(t0[:, None] + iarr[None, :], N)              # [B, T] cursor
    pastcap = jnp.minimum(t0[:, None] + iarr[None, :], N - 1)
    # step at which old slot k is overwritten (>= T: survives the chunk)
    kill = jnp.mod(karr[None, :] - t0[:, None], N)           # [B, N]
    age_old = jnp.mod(p[:, :, None] - karr[None, None, :], N)  # [B, T, N]
    m_old = (age_old > iarr[None, :, None]) \
        & (age_old <= pastcap[:, :, None])
    m_new = jnp.broadcast_to(
        (jnp.arange(T)[None, :] < iarr[:, None])[None], (B, T, T))
    valid_ext = jnp.concatenate([m_old, m_new], axis=2)      # [B, T, M]

    cand = jnp.concatenate([nodes0, xs.astype(nodes0.dtype)], axis=1)

    row = jnp.zeros((B, T, M), adj0.dtype)
    if model.edge_selectors is not None:
        row = _selector_rows(model, model.edge_selectors,
                             params.get("edge_selectors"), row, xs, cand,
                             valid_ext, p, t0, pastcap)

    dirty = cand
    if model.preprocessor is not None:
        dirty = model.preprocessor(params["preprocessor"], cand)
    dirty_new = dirty[:, N:]                                  # [B, T, Fh]

    gnn_params = params["gnn"]
    if len(conv_idx) == 2:
        # --- layer 1 at every (step, entity): kill-cumsum ------------------
        # rows of ALL entities: old slot rows = adj0 (zero on new sources —
        # row-only selectors never add to them), insert rows = `row`
        R_all = jnp.concatenate(
            [jnp.pad(adj0, ((0, 0), (0, 0), (0, T))), row], axis=1)  # [B,M,M]
        base = jnp.einsum("bes,bsf->bef", R_all, dirty)       # [B, M, Fh]
        # step l kills old slot p_l: every row loses entry (e, p_l) with the
        # OLD value dirty[:, p_l] from step l on (inclusive: the eviction
        # precedes the GNN inside a step)
        G = jnp.take_along_axis(R_all, p[:, None, :], axis=2)  # [B, M, T]
        v_kill = jnp.take_along_axis(
            dirty[:, :N], p[..., None], axis=1)               # [B, T, Fh]
        from gcm_tpu import config

        P = G.transpose(0, 2, 1)[..., None] * v_kill[:, :, None, :]
        Kcum = _time_cumsum(P, config.RING_WINDOW_CUMSUM_BLOCK)  # [B,T,M,Fh]
        agg1 = base[:, None] - Kcum
        h_in = jnp.broadcast_to(dirty[:, None], agg1.shape)
        if aggrs[0] == "mean":
            degb = jnp.sum(R_all, axis=2)                     # [B, M]
            degc = _time_cumsum(
                G.transpose(0, 2, 1)[..., None],
                config.RING_WINDOW_CUMSUM_BLOCK)[..., 0]      # [B, T, M]
            deg1 = degb[:, None] - degc
            agg1 = agg1 / jnp.maximum(deg1, 1.0)[..., None]
        H1 = conv_project(gnn_params[conv_idx[0]], agg1, h_in, acts[0])
        # --- layer 2 at the output nodes only ------------------------------
        agg2 = jnp.einsum("btm,btmf->btf", row, H1)
        if aggrs[1] == "mean":
            deg2 = jnp.sum(row, axis=2)
            agg2 = agg2 / jnp.maximum(deg2, 1.0)[..., None]
        self_idx = jnp.broadcast_to((N + iarr)[None, :, None, None],
                                    (B, T, 1, H1.shape[-1]))
        root2 = jnp.take_along_axis(H1, self_idx, axis=2)[:, :, 0]
        outs = conv_project(gnn_params[conv_idx[1]], agg2, root2, acts[1])
    else:
        agg = jnp.einsum("btm,bmf->btf", row, dirty)
        if aggrs[0] == "mean":
            deg = jnp.sum(row, axis=2)
            agg = agg / jnp.maximum(deg, 1.0)[..., None]
        outs = conv_project(gnn_params[conv_idx[0]], agg, dirty_new, acts[0])

    # --- final state (must match the scan's exactly) ------------------------
    killc = jnp.clip(kill, 0, T - 1)
    written = kill < T                                        # [B, N]
    xs_at_kill = jnp.take_along_axis(xs.astype(nodes0.dtype),
                                     killc[..., None], axis=1)
    nodes_F = jnp.where(written[..., None], xs_at_kill, nodes0)

    colmask = (~written).astype(adj0.dtype)                   # [B, N]
    # slot-space content of the row written at step l, as it survives to
    # the end of the chunk: old-source entries live iff their column is
    # never overwritten; new-source entries (column k holds insert kill(k))
    # are never re-evicted in-chunk
    newpart = jnp.where(
        written[:, None, :],
        jnp.take_along_axis(row[:, :, N:], killc[:, None, :], axis=2),
        0.0)                                                  # [B, T, N]
    F_rows = row[:, :, :N] * colmask[:, None, :] + newpart
    written_rows = jnp.take_along_axis(F_rows, killc[:, :, None], axis=1)
    adj_F = jnp.where(written[:, :, None], written_rows,
                      adj0 * colmask[:, None, :])
    return outs, RingGraphState(nodes_F, adj_F, weights, t0 + T)


def max_chunk_len(model, B: int, obs_dim: int) -> int:
    """Largest chunk length c such that the biggest per-chunk intermediate
    ([B, c, N+c, Fwide] — the kill-cumsum's P/Kcum, or the learned
    selector's pair concat) stays under config.RING_WINDOW_CHUNK_BYTES.
    Unbounded c = N OOMed a 16 GB chip at N=1024 on a single 40 GB buffer
    (MEASURE_r4b/ring_window_n1024.log); exactness is chunk-size-independent
    so this only trades a little batching for a hard memory ceiling."""
    import math

    from gcm_tpu import config
    from gcm_tpu.nn.dense_conv import plan_conv_stack

    N = model.graph_size
    plan = plan_conv_stack(model.gnn.layers, allowed_aggrs=("add", "mean"))
    fwide = model.gnn.layers[plan[0][0]].in_dim if plan else obs_dim

    def has_learned(sel):
        if isinstance(sel, EdgeChain):
            return any(has_learned(s) for s in sel.selectors)
        return isinstance(sel, LearnedEdge)

    if model.edge_selectors is not None and has_learned(model.edge_selectors):
        fwide = max(fwide, 2 * obs_dim)
    K = config.RING_WINDOW_CHUNK_BYTES / (B * fwide * 4)
    # c * (N + c) <= K
    c = int((math.sqrt(N * N + 4 * K) - N) / 2)
    if c >= 16:
        c -= c % 8  # sublane-friendly
    return max(1, min(N, c))


def ring_window(model, params, xs, state, dones=None, chunk=None):
    """Whole-trajectory forward without the scan (see module docstring).
    Chunks T into windows of length <= min(N, memory bound): each slot is
    overwritten at most once per chunk (what makes the kill-cumsum exact —
    any chunk length <= N qualifies), and the chunk length is capped so the
    [B, c, N+c, F] intermediates respect config.RING_WINDOW_CHUNK_BYTES
    (max_chunk_len). chunk= overrides the automatic choice."""
    assert dones is None, "ring window(): dones not supported — use scan"
    assert window_supported(model), (
        "ring window(): unsupported model structure — use scan "
        "(see ring_window.window_supported)")
    B, T, F = xs.shape
    N = model.graph_size
    if chunk is None:
        chunk = max_chunk_len(model, B, F)
    chunk = max(1, min(chunk, N))
    outs = []
    for s in range(0, T, chunk):
        o, state = _window_chunk(model, params, xs[:, s:s + chunk], state)
        outs.append(o)
    return (outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1),
            state)
