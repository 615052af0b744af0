"""RingDenseGCM — the steady-state-optimized dense memory core.

Produces EXACTLY the same belief sequence as DenseGCM (permutation
equivariance of graph convolution), but stores nodes at a rotating cursor
instead of physically shifting the ring buffer: the reference's wraparound
(gcm.py:323-355) rolls the whole [B, N, N] adjacency every step once the
memory is full — O(N²) HBM traffic per step and the dominant steady-state
cost — while here eviction just zeroes one row and one column, O(N).

Slot geometry: after t steps the cursor is p = t mod N. The slot holding the
observation from step τ is τ mod N; a slot s currently holds age
a(s) = (p − s) mod N (0 = the node being inserted this step). Valid past
slots are 1 ≤ a(s) ≤ min(t, N−1). DenseGCM's logical row index of slot s is
r(s) = count − 1 − a(s) with count = min(t+1, N) — used only by the
positional encoder, which must see logical positions.

Edge selectors are evaluated natively in slot space (supported:
TemporalBackedge (deterministic), DenseEdge, Distance family, LearnedEdge,
EdgeChain). Sparsemax/softmax scoring is permutation-invariant, so learned
selection matches DenseGCM exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jaxtyping import Array, Bool, Float

from gcm_tpu.utils.contracts import checked
from gcm_tpu.edges.chain import EdgeChain
from gcm_tpu.edges.dense import DenseEdge
from gcm_tpu.edges.distance import Distance
from gcm_tpu.edges.learned import LearnedEdge
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.utils.ste import gumbel_softmax, spardmax, ste


class RingGraphState(NamedTuple):
    nodes: jax.Array    # [B, N, F] slot-indexed
    adj: jax.Array      # [B, N, N] slot-indexed
    weights: jax.Array  # [B, N, N] or (0,)
    t: jax.Array        # [B] int32 — total steps taken


from gcm_tpu.core.graph_state import register_reset, zero_reset  # noqa: E402


@register_reset(RingGraphState)
def _reset_ring(state, mask_for):
    return zero_reset(state, mask_for)


class RingDenseGCM:
    """Drop-in DenseGCM with ring-pointer storage. Same constructor and
    params; state is RingGraphState (slot-permuted relative to
    DenseGraphState)."""

    def __init__(self, gnn, preprocessor=None, edge_selectors=None,
                 aux_edge_selectors=None, graph_size: int = 128,
                 pooled: bool = False, positional_encoder=None,
                 edge_weights: bool = False, validate: bool = False,
                 adj_dtype=None):
        self.gnn = gnn
        self.preprocessor = preprocessor
        self.edge_selectors = edge_selectors
        self.aux_edge_selectors = aux_edge_selectors
        self.graph_size = graph_size
        self.pooled = pooled
        self.positional_encoder = positional_encoder
        self.edge_weights = edge_weights
        self.validate = validate
        # adj_dtype=jnp.bfloat16 halves the scan-carry HBM traffic of the
        # dominant [B,N,N] buffer. For selectors whose edge values are
        # exactly 0/1 (TemporalBackedge unlearned, DenseEdge, Distance,
        # LearnedEdge via STE) bf16 storage is VALUE-EXACT — 0.0 and 1.0
        # are representable, and the conv upcasts to the node dtype before
        # the matmul — so beliefs are bitwise-unchanged
        # (tests/test_ring_gcm.py::TestAdjDtype). Learned-temporal rows are
        # fractional (spardmax probabilities) and would round: keep f32
        # there.
        self.adj_dtype = adj_dtype
        if adj_dtype is not None:
            def frac(sel):
                if isinstance(sel, EdgeChain):
                    return any(frac(s) for s in sel.selectors)
                return isinstance(sel, TemporalBackedge) and sel.learned

            for s in (edge_selectors, aux_edge_selectors):
                if s is not None and frac(s):
                    raise ValueError(
                        "adj_dtype: learned TemporalBackedge writes "
                        "fractional (spardmax) edge values — a narrow "
                        "adjacency dtype would silently round them; "
                        "keep the default f32")

    # params identical to DenseGCM
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

    def initial_state(self, B: int, feat: int, dtype=jnp.float32):
        N = self.graph_size
        adt = self.adj_dtype or dtype
        return RingGraphState(
            nodes=jnp.zeros((B, N, feat), dtype),
            adj=jnp.zeros((B, N, N), adt),
            weights=(jnp.zeros((B, N, N), dtype) if self.edge_weights
                     else jnp.zeros((0,), dtype)),
            t=jnp.zeros((B,), jnp.int32),
        )

    # -- slot geometry -----------------------------------------------------
    def _geometry(self, t):
        N = self.graph_size
        p = jnp.mod(t, N)                       # [B] cursor
        past_count = jnp.minimum(t, N - 1)      # valid past nodes
        slots = jnp.arange(N)[None, :]
        age = jnp.mod(p[:, None] - slots, N)    # [B, N]
        valid_past = (age >= 1) & (age <= past_count[:, None])
        return p, past_count, age, valid_past

    # -- selector dispatch (slot space) ------------------------------------
    def _apply_selector(self, sel, params, nodes, adj, weights, p, t, key):
        B, N = adj.shape[0], adj.shape[1]
        b_idx = jnp.arange(B)
        _, past_count, age, valid_past = self._geometry(t)

        if isinstance(sel, EdgeChain):
            for s, sp in zip(sel.selectors, params):
                sub = None
                if key is not None:
                    key, sub = jax.random.split(key)
                adj, weights = self._apply_selector(s, sp, nodes, adj,
                                                    weights, p, t, sub)
            return adj, weights

        if isinstance(sel, TemporalBackedge):
            if sel.learned:
                return self._learned_temporal(sel, params, adj, p, t, key), \
                    weights
            for hop in sel.hops:
                ok = past_count >= hop
                src = jnp.mod(p - hop, N)
                if sel.direction in ("forward", "both"):
                    old = adj[b_idx, p, src]
                    adj = adj.at[b_idx, p, src].set(jnp.where(ok, 1.0, old))
                if sel.direction in ("backward", "both"):
                    old = adj[b_idx, src, p]
                    adj = adj.at[b_idx, src, p].set(jnp.where(ok, 1.0, old))
            return adj, weights

        if isinstance(sel, DenseEdge):
            row_mask = valid_past | (age == 0)  # incl. self edge
            cur_row = jnp.where(row_mask, 1.0, adj[b_idx, p])
            adj = adj.at[b_idx, p, :].set(cur_row)
            cur_col = jnp.where(valid_past, 1.0, adj[b_idx, :, p])
            adj = adj.at[b_idx, :, p].set(cur_col)
            return adj, weights

        if isinstance(sel, Distance):
            scored_nodes = nodes
            if sel.learned:
                scored_nodes = nodes / params["dist_param"]
            curr = scored_nodes[b_idx, p]
            dists = sel.dist_fn(curr, scored_nodes)  # [B, N]
            mask = (dists < sel.max_distance) & valid_past
            cur_row = jnp.where(mask, 1.0, adj[b_idx, p])
            adj = adj.at[b_idx, p, :].set(cur_row)
            if sel.bidirectional:
                cur_col = jnp.where(mask, 1.0, adj[b_idx, :, p])
                adj = adj.at[b_idx, :, p].set(cur_col)
            return adj, weights

        if isinstance(sel, LearnedEdge):
            curr = nodes[b_idx, p]
            net_in = jnp.concatenate(
                [jnp.broadcast_to(curr[:, None, :], nodes.shape), nodes],
                axis=-1,
            )
            logits = sel.edge_network(params["edge_network"], net_in)[..., 0]
            shaped = jnp.where(valid_past, logits, -1e10)
            if sel.deterministic:
                edges = spardmax(shaped, axis=-1)
            else:
                cutoff = 1.0 / (1 + sel.num_edge_samples)
                soft = gumbel_softmax(key, shaped, axis=-1)
                edges = ste(soft - cutoff)
            old_row = adj[b_idx, p]
            new_row = jnp.where(valid_past, ste(edges + old_row), old_row)
            adj = adj.at[b_idx, p].set(new_row)
            return adj, weights

        raise NotImplementedError(f"ring mode: unsupported selector {sel}")

    # -- selector dispatch, row/column-vector form (fused step) -------------
    def _selector_row_col(self, sel, params, nodes, row, col, p, t, key):
        """Row/column form of _apply_selector: returns the [B, N] contents
        of adjacency row p and column p after applying `sel` on top of the
        running (row, col). Same values _apply_selector writes into the
        [B, N, N] adjacency — the fused step (config.RING_FUSED_STEP)
        materializes them in ONE pointwise rewrite instead of per-selector
        scatters."""
        B, N = nodes.shape[0], nodes.shape[1]
        b_idx = jnp.arange(B)
        iota = jnp.arange(N)[None, :]
        _, past_count, age, valid_past = self._geometry(t)

        if isinstance(sel, EdgeChain):
            for s, sp in zip(sel.selectors, params):
                sub = None
                if key is not None:
                    key, sub = jax.random.split(key)
                row, col = self._selector_row_col(s, sp, nodes, row, col,
                                                  p, t, sub)
            return row, col

        if isinstance(sel, TemporalBackedge):
            if sel.learned:
                row = row + self._learned_temporal_update(sel, params, p, t,
                                                          key)
                return row, col
            for hop in sel.hops:
                ok = past_count >= hop
                hit = (iota == jnp.mod(p - hop, N)[:, None]) & ok[:, None]
                if sel.direction in ("forward", "both"):
                    row = jnp.where(hit, 1.0, row)
                if sel.direction in ("backward", "both"):
                    col = jnp.where(hit, 1.0, col)
            return row, col

        if isinstance(sel, DenseEdge):
            row = jnp.where(valid_past | (age == 0), 1.0, row)
            col = jnp.where(valid_past, 1.0, col)
            return row, col

        if isinstance(sel, Distance):
            scored = nodes / params["dist_param"] if sel.learned else nodes
            dists = sel.dist_fn(scored[b_idx, p], scored)  # [B, N]
            mask = (dists < sel.max_distance) & valid_past
            row = jnp.where(mask, 1.0, row)
            if sel.bidirectional:
                col = jnp.where(mask, 1.0, col)
            return row, col

        if isinstance(sel, LearnedEdge):
            curr = nodes[b_idx, p]
            net_in = jnp.concatenate(
                [jnp.broadcast_to(curr[:, None, :], nodes.shape), nodes],
                axis=-1,
            )
            logits = sel.edge_network(params["edge_network"], net_in)[..., 0]
            shaped = jnp.where(valid_past, logits, -1e10)
            if sel.deterministic:
                edges = spardmax(shaped, axis=-1)
            else:
                cutoff = 1.0 / (1 + sel.num_edge_samples)
                soft = gumbel_softmax(key, shaped, axis=-1)
                edges = ste(soft - cutoff)
            row = jnp.where(valid_past, ste(edges + row), row)
            return row, col

        raise NotImplementedError(
            f"ring fused mode: unsupported selector {sel}")

    def _learned_temporal(self, sel, params, adj, p, t, key):
        """Learned TemporalBackedge in slot space; .at-write form (see
        _learned_temporal_update for the math)."""
        b_idx = jnp.arange(adj.shape[0])
        update = self._learned_temporal_update(sel, params, p, t, key)
        return adj.at[b_idx, p, :].add(update)

    def _learned_temporal_update(self, sel, params, p, t, key):
        """Learned TemporalBackedge in slot space (reference
        temporal.py:51-70): the window parameter is indexed by the LOGICAL
        row (0 = oldest in buffer), so slot s reads window[r(s)] where
        r(s) = count-1-age(s); mask to r(s) < min(past_count, W). Returns
        the [B, N] additive update to adjacency row p."""
        N = self.graph_size
        _, past_count, age, valid_past = self._geometry(t)
        W = sel.learning_window
        window = params["window"]  # [W]
        count = jnp.minimum(t + 1, N)
        r = count[:, None] - 1 - age  # [B, N] logical index
        cand = valid_past & (r < jnp.minimum(past_count, W)[:, None]) & (r >= 0)
        neg = jnp.finfo(window.dtype).min
        logits = jnp.where(cand, window[jnp.clip(r, 0, W - 1)], neg)
        if sel.deterministic:
            mask = spardmax(logits, axis=-1)
        else:
            keys = jax.random.split(key, sel.num_samples)
            from gcm_tpu.utils.ste import diff_or

            mask = diff_or([gumbel_softmax(k, logits, hard=True)
                            for k in keys])
        mask = mask * cand.astype(mask.dtype)
        has_nodes = (past_count > 0)[:, None]
        return jnp.where(has_nodes, mask, 0.0)

    # -- positional encoding with logical indices --------------------------
    def _positional(self, params, x, t):
        """PE sees DenseGCM's logical row index r(s) = count-1 - age(s)."""
        pe_params = params["positional_encoder"]
        enc = self.positional_encoder
        N = self.graph_size
        _, _, age, valid_past = self._geometry(t)
        count = jnp.minimum(t + 1, N)
        r = count[:, None] - 1 - age  # [B, N] logical index; current slot ->
        # count-1; invalid slots get junk but are masked below
        valid = valid_past | (age == 0)
        table = pe_params["pe"]  # [max_len, d_model]
        F = x.shape[-1]
        if enc.mode == "add":
            pe_rows = table[jnp.clip(r, 0, table.shape[0] - 1), :F]
            return jnp.where(valid[..., None], x + pe_rows, x)
        # 'cat' mode (reference gcm.py:132-140): reproject features to
        # F - cat_dim and prepend cat_dim PE dims at the logical index
        from gcm_tpu.nn.module import Linear

        cat = enc.cat_dim
        reproj = Linear(F, F - cat)
        x_re = reproj(pe_params["reproject"], x)
        pe_rows = table[jnp.clip(r, 0, table.shape[0] - 1), :cat]
        out = jnp.concatenate([pe_rows, x_re], axis=-1)
        return jnp.where(valid[..., None], out, x)

    # -- one timestep ------------------------------------------------------
    @checked
    def __call__(self, params, x: Float[Array, "B F"],
                 state: RingGraphState, key=None):
        if self.validate:
            from gcm_tpu.utils.validation import check_ring_inputs

            check_ring_inputs(x, state, self.graph_size)
        from gcm_tpu import config

        if config.RING_FUSED_STEP:
            return self._call_fused(params, x, state, key)
        nodes, adj, weights, t = state
        B = x.shape[0]
        b_idx = jnp.arange(B)
        p, _, _, _ = self._geometry(t)

        # evict slot p (O(N): one row + one column) and insert
        adj = adj.at[b_idx, p, :].set(0.0)
        adj = adj.at[b_idx, :, p].set(0.0)
        if weights.size > 0:
            weights = weights.at[b_idx, p, :].set(0.0)
            weights = weights.at[b_idx, :, p].set(0.0)
        nodes = nodes.at[b_idx, p].set(x.astype(nodes.dtype))
        dirty_nodes = nodes

        if self.edge_selectors is not None:
            sub = None
            if key is not None:
                key, sub = jax.random.split(key)
            adj, weights = self._apply_selector(
                self.edge_selectors, params.get("edge_selectors"),
                dirty_nodes, adj, weights, p, t, sub)

        if self.preprocessor is not None:
            dirty_nodes = self.preprocessor(params["preprocessor"], dirty_nodes)

        if self.aux_edge_selectors is not None:
            sub = None
            if key is not None:
                key, sub = jax.random.split(key)
            enc = dirty_nodes
            if self.positional_encoder is not None:
                enc = self._positional(params, dirty_nodes, t)
            adj, weights = self._apply_selector(
                self.aux_edge_selectors, params.get("aux_edge_selectors"),
                enc, adj, weights, p, t, sub)

        node_feats = self.gnn(params["gnn"], dirty_nodes, adj, weights)
        mx = node_feats if self.pooled else node_feats[b_idx, p]
        return mx, RingGraphState(nodes, adj, weights, t + 1)

    def _call_fused(self, params, x, state: RingGraphState, key=None):
        """Single-rewrite step (config.RING_FUSED_STEP): the insert is one
        pointwise [B,N,F] select and the eviction + every selector write is
        ONE pointwise [B,N,N] select — adj_new[b,i,j] depends only on
        adj[b,i,j] and the [B,N] row/col vectors, so XLA can update the
        scan-carry buffer in place (the round-3 trace showed the unfused
        step's repeated rewrites defeating that aliasing). Bit-identical to
        the unfused step."""
        nodes, adj, weights, t = state
        B = x.shape[0]
        N = self.graph_size
        b_idx = jnp.arange(B)
        p, _, _, _ = self._geometry(t)
        i_eq_p = jnp.arange(N)[None, :] == p[:, None]  # [B, N]

        nodes = jnp.where(i_eq_p[..., None], x[:, None, :].astype(nodes.dtype),
                          nodes)
        dirty_nodes = nodes

        row = jnp.zeros((B, N), adj.dtype)  # evicted row p content
        col = jnp.zeros((B, N), adj.dtype)  # evicted column p content
        if self.edge_selectors is not None:
            sub = None
            if key is not None:
                key, sub = jax.random.split(key)
            row, col = self._selector_row_col(
                self.edge_selectors, params.get("edge_selectors"),
                dirty_nodes, row, col, p, t, sub)

        if self.preprocessor is not None:
            dirty_nodes = self.preprocessor(params["preprocessor"],
                                            dirty_nodes)

        if self.aux_edge_selectors is not None:
            sub = None
            if key is not None:
                key, sub = jax.random.split(key)
            enc = dirty_nodes
            if self.positional_encoder is not None:
                enc = self._positional(params, dirty_nodes, t)
            row, col = self._selector_row_col(
                self.aux_edge_selectors, params.get("aux_edge_selectors"),
                enc, row, col, p, t, sub)

        # the ONE adjacency rewrite: row p <- row, column p <- col ((p,p)
        # comes from row, matching _apply_selector's row-write-then-col-read
        # order), everything else unchanged. Cast keeps a narrow adj_dtype
        # carry (0/1 values: exact).
        row = row.astype(adj.dtype)
        col = col.astype(adj.dtype)
        adj = jnp.where(i_eq_p[:, :, None], row[:, None, :],
                        jnp.where(i_eq_p[:, None, :], col[:, :, None], adj))
        if weights.size > 0:
            wz = jnp.zeros((), weights.dtype)
            weights = jnp.where(i_eq_p[:, :, None] | i_eq_p[:, None, :], wz,
                                weights)

        node_feats = self.gnn(params["gnn"], dirty_nodes, adj, weights)
        mx = node_feats if self.pooled else node_feats[b_idx, p]
        return mx, RingGraphState(nodes, adj, weights, t + 1)

    def scan(self, params, xs, state: RingGraphState, key=None, dones=None,
             remat=False, unroll=None):
        """dones: optional [B, T] episode terminations — wipes the memory of
        finished episodes after each step (see DenseGCM.scan). remat/unroll:
        see DenseGCM.scan; remat='reverse' additionally selects the
        REVERSIBLE backward (models/ring_reversible.py: the [B,N,N] carry
        residual is reconstructed in the reverse pass instead of saved per
        step — requires key=None, dones=None, no edge_weights). With the
        fused step, unroll=None takes the ring-specific measured default
        (config.RING_SCAN_UNROLL=1: the in-place carry rewrite is what
        unrolling breaks)."""
        from gcm_tpu import config
        from gcm_tpu.models.dense_gcm import _scan_with_resets

        if remat == "reverse":
            from gcm_tpu.models.ring_reversible import (reversible_scan,
                                                        reversible_supported)

            assert reversible_supported(self, key, dones), (
                "remat='reverse' needs dones=None and edge_weights off "
                "(see ring_reversible.reversible_supported)")
            return reversible_scan(self, params, xs, state, key=key)
        if unroll is None and config.RING_FUSED_STEP:
            unroll = config.RING_SCAN_UNROLL
        return _scan_with_resets(self, params, xs, state, key, dones, remat,
                                 unroll)

    def window(self, params, xs, state: RingGraphState, dones=None,
               chunk=None):
        """Scan-free whole-trajectory forward for row-only scored/learned
        selectors (models/ring_window.py: extended-source scoring + the
        kill-cumsum — N x fewer conv FLOPs than the scan). Output matches
        scan to float-accumulation order (tests/test_ring_window.py).
        Falls back to scan when the structure is unsupported (bidirectional
        or stochastic selectors, >2 conv layers, PE/aux/pooled/weights) or
        dones are given. chunk= overrides the memory-bounded chunk length
        (config.RING_WINDOW_CHUNK_BYTES)."""
        from gcm_tpu.models.ring_window import ring_window, window_supported

        if dones is not None or not window_supported(self):
            return self.scan(params, xs, state, dones=dones)
        return ring_window(self, params, xs, state, chunk=chunk)

    def window_profitable(self, mode: str = "forward") -> bool:
        """Measured (N, mode) dispatch gate for the wrappers'
        whole-trajectory call (TPU v5e, MEASURE_r4b ring_window_n512/
        n1024b, euclidean B=32): forward crosses over at N=1024 (window
        500k vs scan 221k ts/s; at N=512 the scan still wins 643k vs 487k),
        TRAINING crosses earlier at N=512 (224k vs 169k; N=1024: 217k vs
        49k, 4.4x) because the window's backward has no per-step [B,N,N]
        carry residual to save. Thresholds are config tunables
        (RING_WINDOW_FWD_MIN_N / RING_WINDOW_TRAIN_MIN_N)."""
        from gcm_tpu import config

        min_n = (config.RING_WINDOW_TRAIN_MIN_N if mode == "train"
                 else config.RING_WINDOW_FWD_MIN_N)
        return self.graph_size >= min_n

    def window_applicable(self, dones=None) -> bool:
        """Structural check the wrappers consult BEFORE dispatching to
        window(): the ring window supports neither dones (mid-trajectory
        resets break the kill-cumsum's fixed slot lifetimes) nor the
        structures window_supported rejects. Falling through window()'s
        internal scan fallback would drop the caller's unroll/remat args,
        so the wrapper needs this answer up front."""
        from gcm_tpu.models.ring_window import window_supported

        return dones is None and window_supported(self)
