"""DenseGCM — dense-graph associative memory core.

TPU-native re-design of reference DenseGCM (src/gcm/gcm.py:151-355). One step:

1. ring-buffer wraparound (masked, batch-selective — gcm.py:323-355),
2. insert the observation at row num_nodes[b] (gcm.py:274),
3. edge selectors run on the *raw* (pre-preprocessor) nodes (gcm.py:284-287),
4. optional preprocessor MLP on a dirty copy (gcm.py:290-291),
5. optional aux selectors after positional encoding (gcm.py:294-306),
6. user GNN over the dense graph (gcm.py:308),
7. belief = features of the just-inserted node (or pooled) (gcm.py:309-314),
8. num_nodes += 1.

The graph state always stores raw observations; preprocessing happens on a
separate value each step, exactly preserving the reference's aliasing
discipline (gcm.py:262-291). The whole step is jittable; `scan` runs the
recurrence over a trajectory with lax.scan (replacing the Python loop in the
reference Ray adapter, ray_gcm.py:200-202).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jaxtyping import Array, Bool, Float

from gcm_tpu.utils.contracts import checked
from gcm_tpu.core.graph_state import (
    DenseGraphState,
    dense_initial_state,
    dense_insert,
    dense_wrap_overflow,
    reset_where,
)


def _scan_with_resets(core, params, xs, state, key=None, dones=None,
                      remat=False, unroll=None):
    """Shared lax.scan recurrence over [B, T, F] with optional per-step
    episode-boundary resets (dones [B, T]); used by every stepwise core.
    remat=True rematerializes each step in the backward pass
    (jax.checkpoint): less activation traffic, more recompute. Measured on
    TPU v5e (flagship config): +13% training throughput on the banded core
    (cheap recompute, no adjacency), but −32% on the ring core (recompute
    rebuilds the [B,N,N] adjacency) — use it for memory headroom, not
    speed, on the dense/ring cores.
    remat may also name a selective policy instead of all-or-nothing:
    'dots' (jax.checkpoint_policies.dots_saveable — save matmul results,
    recompute elementwise/selector work) or 'dots_no_batch'
    (dots_with_no_batch_dims_saveable — save only the weight-matmul
    results, recompute the [B,·,·] products too). Measured in
    benchmarks/bwd_breakdown.py.
    remat may also be an int K: CHUNKED (sqrt-T) checkpointing — an outer
    scan over T/K chunks with the K-step inner scan rematerialized. The
    backward's dominant cost is saving the [B,N,N] carry per step as a
    residual (bwd_breakdown: the ~18 us/step interaction term; per-step
    jax.checkpoint does NOT remove it because the carry input must still
    be saved to recompute). Chunking saves the carry only at chunk
    boundaries — T/K copies instead of T — at one extra in-chunk forward.
    Forward is bit-identical to the plain scan (same step math and order).
    unroll=K unrolls K loop iterations per XLA while-loop step (lax.scan
    unroll=) — bit-identical recurrence, lets XLA fuse across steps and
    amortize per-op overhead in the loop body (the scan_breakdown.py
    overhead-dominated regime). unroll=None takes config.SCAN_UNROLL (the
    measured default; tunable via GCM_TUNE_FILE)."""
    from gcm_tpu import config

    if unroll is None:
        unroll = config.SCAN_UNROLL
    T = xs.shape[1]
    keys = None if key is None else jax.random.split(key, T)
    xs_t = jnp.swapaxes(xs, 0, 1)  # [T, B, F]
    dones_t = None if dones is None else jnp.swapaxes(dones, 0, 1)

    def step(carry, inp):
        x, k, d = inp
        out, new_state = core(params, x, carry, key=k)
        if d is not None:
            new_state = reset_where(new_state, d)
        return new_state, out

    # pack per-step inputs once (lax.scan can't scan None leaves)
    legs = [xs_t]
    if keys is not None:
        legs.append(keys)
    if dones_t is not None:
        legs.append(dones_t)

    def body(carry, inp):
        it = iter(inp)
        x = next(it)
        k = next(it) if keys is not None else None
        d = next(it) if dones_t is not None else None
        return step(carry, (x, k, d))

    if isinstance(remat, int) and not isinstance(remat, bool):
        K = remat
        assert T % K == 0, (
            f"chunked remat: T={T} must be divisible by chunk size K={K}")

        def chunk_body(carry, chunk):
            return jax.lax.scan(body, carry, chunk, unroll=unroll)

        # prevent_cse=False: safe under lax.scan (the loop already isolates
        # iterations) and avoids the anti-CSE overhead jax.checkpoint adds
        chunk_body = jax.checkpoint(chunk_body, prevent_cse=False)
        legs_c = tuple(leg.reshape((T // K, K) + leg.shape[1:])
                       for leg in legs)
        final_state, outs = jax.lax.scan(chunk_body, state, legs_c)
        outs = outs.reshape((T,) + outs.shape[2:])
        return jnp.swapaxes(outs, 0, 1), final_state

    if remat:
        if remat is True:
            body = jax.checkpoint(body, prevent_cse=False)
        else:
            policies = {
                "dots": jax.checkpoint_policies.dots_saveable,
                "dots_no_batch":
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            }
            body = jax.checkpoint(body, policy=policies[remat],
                                  prevent_cse=False)
    final_state, outs = jax.lax.scan(body, state, tuple(legs),
                                     unroll=unroll)
    return jnp.swapaxes(outs, 0, 1), final_state


class _RowColAcc:
    """Accumulates the fused dense step's row/column updates at index
    num_nodes[b] as (value, written-mask) pairs, so the final rewrite can
    fall back to the POST-WRAP base pointwise — no base gathers for the
    constant-valued selectors (temporal/dense/distance). Selectors that
    read old values (LearnedEdge's ste-of-sum, learned temporal's add)
    materialize the base row lazily via `base_row_fn`, exactly once."""

    def __init__(self, B, N, dtype, base_row_fn):
        self.row = jnp.zeros((B, N), dtype)
        self.col = jnp.zeros((B, N), dtype)
        self.row_m = jnp.zeros((B, N), bool)
        self.col_m = jnp.zeros((B, N), bool)
        self._base_row_fn = base_row_fn
        self._base_row = None

    def cur_row(self):
        """Current content of row num_nodes[b] (base where unwritten)."""
        if self._base_row is None:
            self._base_row = self._base_row_fn()
        return jnp.where(self.row_m, self.row, self._base_row)

    def set_row(self, mask, value):
        self.row = jnp.where(mask, value, self.row)
        self.row_m = self.row_m | mask

    def set_col(self, mask, value):
        self.col = jnp.where(mask, value, self.col)
        self.col_m = self.col_m | mask

    def set_row_full(self, value):
        self.row = value
        self.row_m = jnp.ones_like(self.row_m)


def _dense_selector_row_col(sel, params, nodes, acc, num_nodes, key):
    """Row/column-vector form of the dense edge selectors: records into
    `acc` the writes `sel` would make to adjacency row/column num_nodes[b]
    — the dense core's fused step (config.DENSE_FUSED_STEP) materializes
    them in ONE pointwise rewrite over the post-wrap base. Pinned bitwise
    against the selectors' .at writes, including hand-built states with
    pre-existing content at row/col num_nodes
    (tests/test_dense_gcm.py::TestFusedDenseStep). The logical-index mirror
    of RingDenseGCM._selector_row_col."""
    from gcm_tpu.edges.chain import EdgeChain
    from gcm_tpu.edges.dense import DenseEdge
    from gcm_tpu.edges.distance import Distance
    from gcm_tpu.edges.learned import LearnedEdge
    from gcm_tpu.edges.temporal import TemporalBackedge
    from gcm_tpu.utils.ste import gumbel_softmax, spardmax, ste

    B, N = nodes.shape[0], nodes.shape[1]
    b_idx = jnp.arange(B)
    iota = jnp.arange(N)[None, :]
    past = iota < num_nodes[:, None]  # [B, N]

    if isinstance(sel, EdgeChain):
        for s, sp in zip(sel.selectors, params):
            sub = None
            if key is not None:
                key, sub = jax.random.split(key)
            _dense_selector_row_col(s, sp, nodes, acc, num_nodes, sub)
        return

    if isinstance(sel, TemporalBackedge):
        if sel.learned:
            # .at[row].add(update): rewrites the WHOLE row with old+update
            acc.set_row_full(acc.cur_row()
                             + sel._learned_update(params, num_nodes, N,
                                                   key))
            return
        for hop in sel.hops:
            ok = num_nodes >= hop
            hit = (iota == jnp.clip(num_nodes - hop, 0, N - 1)[:, None]) \
                & ok[:, None]
            if sel.direction in ("forward", "both"):
                acc.set_row(hit, 1.0)
            if sel.direction in ("backward", "both"):
                acc.set_col(hit, 1.0)
        return

    if isinstance(sel, DenseEdge):
        acc.set_row(iota <= num_nodes[:, None], 1.0)  # incl. self
        acc.set_col(past, 1.0)
        return

    if isinstance(sel, Distance):
        scored = nodes / params["dist_param"] if sel.learned else nodes
        curr = scored[b_idx, jnp.clip(num_nodes, 0, N - 1)]
        mask = (sel.dist_fn(curr, scored) < sel.max_distance) & past
        if sel.window is not None:
            mask = mask & (iota >= num_nodes[:, None] - sel.window)
        acc.set_row(mask, 1.0)
        if sel.bidirectional:
            acc.set_col(mask, 1.0)
        return

    if isinstance(sel, LearnedEdge):
        curr = nodes[b_idx, jnp.clip(num_nodes, 0, N - 1)]
        net_in = jnp.concatenate(
            [jnp.broadcast_to(curr[:, None, :], nodes.shape), nodes],
            axis=-1)
        logits = sel.edge_network(params["edge_network"], net_in)[..., 0]
        shaped = jnp.where(past, logits, -1e10)
        if sel.deterministic:
            edges = spardmax(shaped, axis=-1)
        else:
            cutoff = 1.0 / (1 + sel.num_edge_samples)
            soft = gumbel_softmax(key, shaped, axis=-1)
            edges = ste(soft - cutoff)
        old_row = acc.cur_row()
        # .at[row].set(...): rewrites the whole row
        acc.set_row_full(jnp.where(past, ste(edges + old_row), old_row))
        return

    raise NotImplementedError(
        f"dense fused step: unsupported selector {sel}")


def dense_fused_supported(model) -> bool:
    """Can the fused dense step run this model's selectors? (The GNN and
    aux/PE/pooled machinery are all orthogonal to the adjacency rewrite and
    always supported.)"""
    from gcm_tpu.edges.chain import EdgeChain
    from gcm_tpu.edges.dense import DenseEdge
    from gcm_tpu.edges.distance import Distance
    from gcm_tpu.edges.learned import LearnedEdge
    from gcm_tpu.edges.temporal import TemporalBackedge

    def ok(sel):
        if isinstance(sel, EdgeChain):
            return all(ok(s) for s in sel.selectors)
        return isinstance(sel, (TemporalBackedge, DenseEdge, Distance,
                                LearnedEdge))

    return all(s is None or ok(s)
               for s in (model.edge_selectors, model.aux_edge_selectors))


class DenseGCM:
    def __init__(
        self,
        gnn,
        preprocessor=None,
        edge_selectors=None,
        aux_edge_selectors=None,
        graph_size: int = 128,
        pooled: bool = False,
        positional_encoder=None,
        edge_weights: bool = False,
        validate: bool = False,
    ):
        self.gnn = gnn
        self.preprocessor = preprocessor
        self.edge_selectors = edge_selectors
        self.aux_edge_selectors = aux_edge_selectors
        self.graph_size = graph_size
        self.pooled = pooled
        self.positional_encoder = positional_encoder
        self.edge_weights = edge_weights
        self.validate = validate

    # -- params ------------------------------------------------------------
    def init(self, key):
        params = {}
        key, sub = jax.random.split(key)
        params["gnn"] = self.gnn.init(sub)
        for name in ("preprocessor", "edge_selectors", "aux_edge_selectors",
                     "positional_encoder"):
            mod = getattr(self, name)
            if mod is not None:
                key, sub = jax.random.split(key)
                params[name] = mod.init(sub)
        return params

    # -- state -------------------------------------------------------------
    def initial_state(self, B: int, feat: int, dtype=jnp.float32) -> DenseGraphState:
        """Zero hidden state (reference get_initial_hidden_state, gcm.py:194-211)."""
        return dense_initial_state(B, self.graph_size, feat,
                                   edge_weights=self.edge_weights, dtype=dtype)

    # -- one timestep ------------------------------------------------------
    @checked
    def __call__(self, params, x: Float[Array, "B F"],
                 state: DenseGraphState, key=None):
        """x: [B, F] observation. Returns (belief [B, F_out], new state)."""
        if self.validate:
            from gcm_tpu.utils.validation import check_dense_inputs

            check_dense_inputs(x, state, self.graph_size)
        from gcm_tpu import config

        if config.DENSE_FUSED_STEP and dense_fused_supported(self):
            return self._call_fused(params, x, state, key)
        B = x.shape[0]
        b_idx = jnp.arange(B)

        state = dense_wrap_overflow(state)
        state = dense_insert(state, x)
        nodes, adj, weights, num_nodes = state

        dirty_nodes = nodes

        if self.edge_selectors is not None:
            sub = None
            if key is not None:
                key, sub = jax.random.split(key)
            adj, weights = self.edge_selectors(
                params["edge_selectors"], dirty_nodes, adj, weights, num_nodes,
                key=sub,
            )

        if self.preprocessor is not None:
            dirty_nodes = self.preprocessor(params["preprocessor"], dirty_nodes)

        if self.aux_edge_selectors is not None:
            sub = None
            if key is not None:
                key, sub = jax.random.split(key)
            enc = dirty_nodes
            if self.positional_encoder is not None:
                enc = self.positional_encoder(
                    params["positional_encoder"], dirty_nodes, num_nodes
                )
            adj, weights = self.aux_edge_selectors(
                params["aux_edge_selectors"], enc, adj, weights, num_nodes,
                key=sub,
            )

        node_feats = self.gnn(params["gnn"], dirty_nodes, adj, weights)
        if self.pooled:
            mx = node_feats
        else:
            mx = node_feats[b_idx, num_nodes]

        return mx, DenseGraphState(nodes, adj, weights, num_nodes + 1)

    def _call_fused(self, params, x, state: DenseGraphState, key=None):
        """Single-rewrite step (config.DENSE_FUSED_STEP): wraparound shift,
        node insert, and every selector write compose into one select per
        array — the dense-core mirror of RingDenseGCM._call_fused, at the
        logical index num_nodes[b] instead of the ring cursor. The selector
        row/col vectors are seeded from the post-wrap base content at that
        index, so composition is exactly write-equivalent — bitwise
        identical to the unfused step even for hand-constructed states
        with content at row/col num_nodes
        (tests/test_dense_gcm.py::TestFusedDenseStep)."""
        nodes, adj, weights, num_nodes = state
        B = x.shape[0]
        N = self.graph_size
        b_idx = jnp.arange(B)

        over = num_nodes + 1 > N
        num2 = jnp.where(over, num_nodes - 1, num_nodes)
        om = over[:, None, None]
        i_eq = jnp.arange(N)[None, :] == num2[:, None]  # [B, N]

        # wrap shift + insert: one select over [B, N, F]
        nodes_w = jnp.pad(nodes[:, 1:], ((0, 0), (0, 1), (0, 0)))
        nodes = jnp.where(om, nodes_w, nodes)
        nodes = jnp.where(i_eq[..., None], x[:, None, :].astype(nodes.dtype),
                          nodes)
        dirty_nodes = nodes

        # accumulate selector writes as (value, written-mask) pairs; the
        # final rewrite falls back to the POST-WRAP base pointwise, so
        # hand-constructed states with content at row/col num_nodes (legal
        # API input — the reference wrap test builds one) round-trip
        # bit-exactly WITHOUT base gathers on the constant-valued selector
        # paths (the zero-seed version cleared such content; the
        # base-seeded version cost 2x in gathers — MEASURE_r4/dense_fused).
        ov = over[:, None]
        safe = jnp.clip(num2, 0, N - 1)

        def base_row_fn():
            # only materialized for selectors that read old row values
            return jnp.where(ov, 0.0, adj[b_idx, safe, :])

        acc = _RowColAcc(B, N, adj.dtype, base_row_fn)
        if self.edge_selectors is not None:
            sub = None
            if key is not None:
                key, sub = jax.random.split(key)
            _dense_selector_row_col(
                self.edge_selectors, params.get("edge_selectors"),
                dirty_nodes, acc, num2, sub)

        if self.preprocessor is not None:
            dirty_nodes = self.preprocessor(params["preprocessor"],
                                            dirty_nodes)

        if self.aux_edge_selectors is not None:
            sub = None
            if key is not None:
                key, sub = jax.random.split(key)
            enc = dirty_nodes
            if self.positional_encoder is not None:
                enc = self.positional_encoder(
                    params["positional_encoder"], dirty_nodes, num2)
            _dense_selector_row_col(
                self.aux_edge_selectors, params.get("aux_edge_selectors"),
                enc, acc, num2, sub)

        # ONE adjacency rewrite: wrap shift + masked row/col writes at num2
        adj_w = jnp.pad(adj[:, 1:, 1:], ((0, 0), (0, 1), (0, 1)))
        base = jnp.where(om, adj_w, adj)
        adj = jnp.where(i_eq[:, :, None] & acc.row_m[:, None, :],
                        acc.row[:, None, :],
                        jnp.where(i_eq[:, None, :] & acc.col_m[:, :, None],
                                  acc.col[:, :, None], base))
        if weights.size > 0:
            w_w = jnp.pad(weights[:, 1:, 1:], ((0, 0), (0, 1), (0, 1)))
            weights = jnp.where(om, w_w, weights)

        node_feats = self.gnn(params["gnn"], dirty_nodes, adj, weights)
        mx = node_feats if self.pooled else node_feats[b_idx, num2]
        return mx, DenseGraphState(nodes, adj, weights, num2 + 1)

    # -- trajectory --------------------------------------------------------
    @checked
    def scan(self, params, xs: Float[Array, "B T F"],
             state: DenseGraphState, key=None,
             dones: Bool[Array, "B T"] | None = None, remat: bool = False,
             unroll: int | None = None):
        """Run the recurrence over a whole trajectory with lax.scan.

        xs: [B, T, F] (time axis scanned). Returns (beliefs [B, T, F_out],
        final state). The per-step Python loop of the reference RL adapter
        (ray_gcm.py:200-202) compiled into a single XLA while loop.

        dones: optional [B, T] episode terminations. When given, the memory of
        batch b is wiped AFTER the step where dones[b, t] is True — the same
        reset a rollout collector applies at episode boundaries, so
        training-time replay reproduces collect-time beliefs exactly (the
        rllib seq_lens semantics of the reference adapter, ray_gcm.py:188-202
        / ray_sparse_gcm.py:195-200).

        remat: rematerialize steps in the backward pass; unroll: XLA loop
        unrolling factor (bit-identical, see _scan_with_resets);
        remat='reverse' selects the REVERSIBLE backward
        (models/dense_reversible.py: the [B,N,N] carry is reconstructed in
        the reverse pass by inverting the fused step's shift+rewrite —
        requires dones=None, no edge_weights, fused-eligible selectors).
        """
        if remat == "reverse":
            from gcm_tpu.models.dense_reversible import (
                dense_reversible_scan, dense_reversible_supported)

            assert dense_reversible_supported(self, key, dones), (
                "remat='reverse' needs dones=None, edge_weights off and "
                "fused-eligible selectors (dense_reversible_supported)")
            return dense_reversible_scan(self, params, xs, state, key=key)
        from gcm_tpu import config

        if (unroll is None and config.DENSE_FUSED_STEP
                and dense_fused_supported(self)):
            # forward-path default (trainers pass SCAN_UNROLL explicitly;
            # the fused step's u8>u4 ordering reproduced 4/4 same-pass
            # seed-pairs, round-5 fused_unroll sweep)
            unroll = config.DENSE_SCAN_UNROLL
        return _scan_with_resets(self, params, xs, state, key, dones, remat,
                                 unroll)
