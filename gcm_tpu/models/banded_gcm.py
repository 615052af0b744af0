"""BandedRingGCM — temporal-backedge fast path with implicit adjacency.

For the (very common) case where the only edge selector is a deterministic
forward TemporalBackedge, the memory graph is a banded matrix: slot s has
in-edges exactly from slots (s − h) mod N. This core never materializes the
[B, N, N] adjacency — neighborhood aggregation is a masked roll of the layer
input, O(hops·N·F) per layer instead of the O(N²F) adj @ x matmul, and the
state is just (nodes, t).

Produces EXACTLY DenseGCM's belief sequence for
edge_selectors=TemporalBackedge(hops, direction='forward') and a
DenseGraphConv('add') + activation GNN stack (pinned by
tests/test_banded_gcm.py).

Edge-existence rule in slot space: the edge (sink s, source (s−h) mod N)
exists iff (a) the sink had ≥ h predecessors when it was inserted —
min(t_insert, N−1) ≥ h with t_insert = t − age(s) — and (b) the source is
still alive: age(s) + h ≤ min(t, N−1).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jaxtyping import Array, Float

from gcm_tpu.utils.contracts import checked
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv, conv_project


class BandedState(NamedTuple):
    nodes: jax.Array  # [B, N, F] slot-indexed raw observations
    t: jax.Array      # [B] int32


from gcm_tpu.core.graph_state import register_reset, zero_reset  # noqa: E402


@register_reset(BandedState)
def _reset_banded(state, mask_for):
    return zero_reset(state, mask_for)


def _window_time(t0, T, dones):
    """Within-episode step count t_eff [B, T] (== state.t inside the scan,
    which dones reset to 0) and the last reset step r_last [B] (-1 if none,
    None when dones is None)."""
    B = t0.shape[0]
    i = jnp.arange(T)[None, :]
    if dones is None:
        return t0[:, None] + i, None
    d = dones.astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), d[:, :-1]],
                             axis=1)
    cand = jnp.where(starts > 0, i, -1)
    last_start = jax.lax.cummax(cand, axis=1)
    t_eff = jnp.where(last_start >= 0, i - last_start, t0[:, None] + i)
    r_last = jnp.max(jnp.where(dones, i, -1), axis=1)
    return t_eff, r_last


def _ring_final(buf0, rows_seq, t0, N, r_last):
    """Final ring-buffer contents after writing rows_seq[:, i] at the slot
    the step-i insert lands on. Slot s holds the NEWEST write; a done at
    step r (reset runs after the insert) wipes everything written at steps
    <= r and restarts the slot counter at 0. Returns (buf_F, t_F)."""
    B, T, _ = rows_seq.shape
    s_iota = jnp.arange(N)[None, :]
    if r_last is None:
        t_F = t0 + T
        o = jnp.mod(t_F[:, None] - 1 - s_iota, N)
        tau = t_F[:, None] - 1 - o  # [B, N] global time of slot content
        idx = jnp.clip(tau - t0[:, None], 0, T - 1)
        gathered = jnp.take_along_axis(rows_seq, idx[..., None], axis=1)
        buf_F = jnp.where((tau >= t0[:, None])[..., None],
                          gathered.astype(buf0.dtype), buf0)
        return buf_F, t_F
    had_reset = r_last >= 0
    t_F = jnp.where(had_reset, T - 1 - r_last, t0 + T)
    # counter value carried at window step j: start_ctr + j
    start_ctr = jnp.where(had_reset, -(r_last + 1), t0)
    o = jnp.mod(t_F[:, None] - 1 - s_iota, N)
    ctr = t_F[:, None] - 1 - o  # counter value of the slot's newest write
    j = ctr - start_ctr[:, None]  # window step that wrote it
    written = (ctr >= 0) & (j >= 0)
    idx = jnp.clip(j, 0, T - 1)
    gathered = jnp.take_along_axis(rows_seq, idx[..., None], axis=1)
    buf_F = jnp.where(written[..., None], gathered.astype(buf0.dtype),
                      jnp.where(had_reset[:, None, None],
                                jnp.zeros_like(buf0), buf0))
    return buf_F, t_F


def _raw_at_age(a, xs, buf0, t0, N):
    """Step-i view of the ring content at age a: xs[i-a] inside the window,
    the pre-existing buffer row (slot (t0+i-a) mod N) before it. Only valid
    where the caller's alive mask (a <= t_eff) holds."""
    B, T, D = xs.shape
    if a == 0:
        return xs
    i = jnp.arange(T)[None, :]
    shifted = (jnp.concatenate(
        [jnp.zeros((B, a, D), xs.dtype), xs[:, :T - a]], axis=1)
        if a < T else jnp.zeros((B, T, D), xs.dtype))
    slot = jnp.mod(t0[:, None] + i - a, N)
    old = jnp.take_along_axis(buf0, slot[..., None], axis=1)
    return jnp.where((i >= a)[..., None], shifted, old.astype(xs.dtype))


class BandedRingGCM:
    def __init__(self, gnn: DenseGNN, preprocessor=None,
                 hops: Sequence[int] = (1,), graph_size: int = 128,
                 direction: str = "forward"):
        from gcm_tpu.nn.dense_conv import plan_conv_stack

        assert direction in ("forward", "backward", "both")
        self.direction = direction
        assert isinstance(gnn, DenseGNN), "BandedRingGCM needs a DenseGNN"
        plan = plan_conv_stack(gnn.layers, allowed_aggrs=("add", "mean"))
        assert plan is not None, (
            "BandedRingGCM supports DenseGraphConv('add'|'mean') + "
            "tanh/relu stacks")
        self._conv_idx, self._acts, self._aggrs = plan
        self.gnn = gnn
        self.preprocessor = preprocessor
        self.hops = tuple(hops)
        self.graph_size = graph_size

    def init(self, key):
        params = {}
        key, sub = jax.random.split(key)
        params["gnn"] = self.gnn.init(sub)
        if self.preprocessor is not None:
            key, sub = jax.random.split(key)
            params["preprocessor"] = self.preprocessor.init(sub)
        return params

    def initial_state(self, B: int, feat: int, dtype=jnp.float32):
        return BandedState(
            nodes=jnp.zeros((B, self.graph_size, feat), dtype),
            t=jnp.zeros((B,), jnp.int32),
        )

    def _hop_masks(self, t):
        """[B, N] edge-validity mask per hop (see module docstring)."""
        N = self.graph_size
        p = jnp.mod(t, N)
        slots = jnp.arange(N)[None, :]
        age = jnp.mod(p[:, None] - slots, N)  # age AFTER this insert: 0 = new
        alive = age <= jnp.minimum(t, N - 1)[:, None]
        t_insert = t[:, None] - age
        masks = []
        for h in self.hops:
            had_pred = jnp.minimum(t_insert, N - 1) >= h
            src_alive = age + h <= jnp.minimum(t, N - 1)[:, None]
            masks.append((alive & had_pred & src_alive).astype(jnp.float32))
        return masks

    @checked
    def __call__(self, params, x: Float[Array, "B F"],
                 state: BandedState, key=None):
        del key
        nodes, t = state
        B = x.shape[0]
        N = self.graph_size
        b_idx = jnp.arange(B)
        p = jnp.mod(t, N)
        nodes = nodes.at[b_idx, p].set(x.astype(nodes.dtype))

        h_feats = nodes
        if self.preprocessor is not None:
            h_feats = self.preprocessor(params["preprocessor"], h_feats)

        hop_masks = self._hop_masks(t)  # list of [B, N]
        gnn_params = params["gnn"]
        for ci, act, aggr in zip(self._conv_idx, self._acts, self._aggrs):
            conv: DenseGraphConv = self.gnn.layers[ci]
            cp = gnn_params[ci]
            agg = jnp.zeros_like(h_feats)
            deg = jnp.zeros(h_feats.shape[:2], h_feats.dtype)
            for h, m in zip(self.hops, hop_masks):
                if self.direction in ("forward", "both"):
                    # in-edge of slot s from slot s-h -> shift sources down
                    agg = agg + jnp.roll(h_feats, h, axis=1) * m[..., None]
                    deg = deg + m
                if self.direction in ("backward", "both"):
                    # the backward edge (sink s-h <- source s): slot s-h
                    # aggregates from s, i.e. shift sources up and apply the
                    # same (sink s) mask rolled to the s-h position
                    m_b = jnp.roll(m, -h, axis=1)
                    agg = agg + jnp.roll(h_feats, -h, axis=1) * m_b[..., None]
                    deg = deg + m_b
            if aggr == "mean":
                agg = agg / jnp.maximum(deg, 1.0)[..., None]
            h_feats = conv_project(cp, agg, h_feats, act)

        mx = h_feats[b_idx, p]
        return mx, BandedState(nodes, t + 1)

    def window_profitable(self, mode: str = "forward") -> bool:
        """Measured dispatch gate for the wrappers' whole-trajectory call:
        the banded stencil `window()` beats its scan on every backend, shape
        and mode measured (BASELINE.md round-4 reconciliation: 44M +- 4M
        ts/s chained Tw=128 windows vs ~5M scan on TPU v5e at B=32/N=128,
        ~66M asymptotic in-window; train 38-40M) -- always profitable."""
        return True

    # -- whole-trajectory parallel forward -----------------------------------
    def _stencil_ages(self):
        """Ages of raw observations the output (age 0) depends on, layer by
        layer: need[l] = node ages whose layer-l features are required.
        need[-1] = {0} (the belief is read at the current node only);
        each conv layer pulls in sources at age + hop."""
        need = [{0}]
        for _ in self._conv_idx:
            prev = set(need[0])
            for a in need[0]:
                for h in self.hops:
                    prev.add(a + h)
            need.insert(0, prev)
        return [sorted(s) for s in need]

    def window(self, params, xs, state: BandedState, dones=None):
        """Whole-trajectory forward WITHOUT the scan: output-identical to
        `scan` (pinned by tests/test_banded_gcm.py::TestWindowParity).

        The banded core's recurrence is storage-only — node features are raw
        observations, so the belief at step i is a fixed temporal STENCIL of
        the inputs: out[i] = f(x[i], x[i-h], x[i-h-h'], ...) with masks that
        depend only on (t_eff, age). This computes every step at once as
        batched [B,T,F] matmuls over the stencil ages — O(|hops|^L) conv
        applications total instead of the scan's T x L x [B,N,F] work (the
        scan recomputes all N slots every step; the stencil only touches the
        ages the output can see). The same trick is unavailable to DenseGCM
        (data-dependent selector edges); it is exactly why the banded core
        exists (BASELINE.md roofline section).

        dones: optional [B, T] — same episode-reset semantics as scan
        (memory wiped after a done step; masks and the final state follow
        the within-episode step count).
        """
        assert self.direction == "forward", "window() is forward-only"
        nodes0, t0 = state
        B, T, F = xs.shape
        N = self.graph_size

        t_eff, r_last = _window_time(t0, T, dones)
        horizon = jnp.minimum(t_eff, N - 1)  # [B, T]

        need = self._stencil_ages()
        feats = {a: _raw_at_age(a, xs, nodes0, t0, N) for a in need[0]}
        if self.preprocessor is not None:
            feats = {a: self.preprocessor(params["preprocessor"], v)
                     for a, v in feats.items()}

        def edge_mask(a, h):
            """Mask [B, T] for edge (sink age a <- source age a+h) at step i
            — the same algebra as _hop_masks with t := t_eff."""
            alive = a <= horizon
            had_pred = jnp.minimum(t_eff - a, N - 1) >= h
            src_alive = a + h <= horizon
            return (alive & had_pred & src_alive).astype(xs.dtype)

        gnn_params = params["gnn"]
        for li, (ci, act) in enumerate(zip(self._conv_idx, self._acts)):
            cp = gnn_params[ci]
            new_feats = {}
            for a in need[li + 1]:
                agg = jnp.zeros_like(feats[a])
                deg = jnp.zeros(agg.shape[:2], agg.dtype)
                for h in self.hops:
                    m = edge_mask(a, h)
                    agg = agg + feats[a + h] * m[..., None]
                    deg = deg + m
                if self._aggrs[li] == "mean":
                    agg = agg / jnp.maximum(deg, 1.0)[..., None]
                new_feats[a] = conv_project(cp, agg, feats[a], act)
            feats = new_feats
        outs = feats[0]

        nodes_F, t_F = _ring_final(nodes0, xs, t0, N, r_last)
        return outs, BandedState(nodes_F, t_F)

    def scan(self, params, xs, state: BandedState, key=None,
             remat: bool = False, dones=None, unroll: int | None = None):
        """remat=True rematerializes each step in the backward pass
        (jax.checkpoint) — measured +13% training throughput at the flagship
        config (less activation traffic than storing per-step residuals).
        dones: optional [B, T] episode terminations — wipes the memory of
        finished episodes after each step (see DenseGCM.scan).
        unroll: XLA loop unrolling factor (bit-identical recurrence)."""
        del key
        from gcm_tpu import config
        from gcm_tpu.core.graph_state import reset_where

        if unroll is None:
            unroll = config.SCAN_UNROLL

        def step(carry, inp):
            x, d = inp
            out, new_state = self(params, x, carry)
            if d is not None:
                new_state = reset_where(new_state, d)
            return new_state, out

        if remat:
            step = jax.checkpoint(step)
        xs_t = jnp.swapaxes(xs, 0, 1)
        if dones is None:
            final_state, outs = jax.lax.scan(
                lambda c, x: step(c, (x, None)), state, xs_t, unroll=unroll)
        else:
            final_state, outs = jax.lax.scan(
                step, state, (xs_t, jnp.swapaxes(dones, 0, 1)),
                unroll=unroll)
        return jnp.swapaxes(outs, 0, 1), final_state


class BandedScoredState(NamedTuple):
    nodes: jax.Array  # [B, N, F] slot-indexed raw observations
    band: jax.Array   # [B, N, w] stored edge values per (sink slot, offset)
    t: jax.Array      # [B] int32


@register_reset(BandedScoredState)
def _reset_banded_scored(state, mask_for):
    return zero_reset(state, mask_for)


class BandedScoredGCM:
    """Banded fast path for *scored* selectors (ROADMAP item 1's second
    half): the adjacency is a band of stored values [B, N, w] — band[b, s,
    k−1] is the edge value (sink slot s ← source slot (s−k) mod N) recorded
    when s was inserted — instead of a materialized [B, N, N] matrix.

    Each step scores the new node against the last `window` nodes with a
    dense-API Distance selector (reference edge_selectors/distance.py:42-81)
    and/or writes 1.0 at fixed temporal hop offsets (TemporalBackedge,
    temporal.py:72-88). Aggregation per conv layer is w masked rolls —
    O(w·N·F) vs the dense core's O(N²·F) adj @ x.

    EXACT DenseGCM parity for
      edge_selectors = [TemporalBackedge(hops)] + [Distance(..., window=w)]
    with forward-only, non-bidirectional selectors and a DenseGraphConv
    ('add') + tanh/relu GNN stack (pinned by tests/test_banded_gcm.py).
    The reference's unwindowed Distance selectors correspond to w ≥ N−1;
    the win of this core is the windowed regime (the same candidate-window
    concept the reference applies in its sparse selectors, util.py:252-259).

    Eviction semantics match DenseGCM's wraparound (gcm.py:323-355) exactly
    like BandedRingGCM: band values persist per slot; edges whose source has
    been evicted are killed at aggregation time by the age-based alive mask;
    a reused sink slot overwrites its row at insert.
    """

    def __init__(self, gnn: DenseGNN, distance=None, preprocessor=None,
                 hops: Sequence[int] = (), window: int | None = None,
                 graph_size: int = 128):
        from gcm_tpu.nn.dense_conv import plan_conv_stack

        assert isinstance(gnn, DenseGNN), "BandedScoredGCM needs a DenseGNN"
        plan = plan_conv_stack(gnn.layers, allowed_aggrs=("add", "mean"))
        assert plan is not None, (
            "BandedScoredGCM supports DenseGraphConv('add'|'mean') + "
            "tanh/relu stacks")
        self._conv_idx, self._acts, self._aggrs = plan
        self.gnn = gnn
        self.preprocessor = preprocessor
        self.distance = distance
        if distance is not None:
            assert not getattr(distance, "bidirectional", False), (
                "banded fast path is forward-only")
            w = window if window is not None else distance.window
            assert w is not None, (
                "BandedScoredGCM needs a candidate window (set window= here "
                "or on the Distance selector)")
        else:
            assert hops, "need a distance selector and/or temporal hops"
            w = window if window is not None else max(hops)
        assert all(h <= w for h in hops), "hops must fit in the window"
        self.hops = tuple(hops)
        self.window_size = int(w)
        self.graph_size = graph_size

    def init(self, key):
        params = {}
        key, sub = jax.random.split(key)
        params["gnn"] = self.gnn.init(sub)
        if self.preprocessor is not None:
            key, sub = jax.random.split(key)
            params["preprocessor"] = self.preprocessor.init(sub)
        if self.distance is not None:
            key, sub = jax.random.split(key)
            params["distance"] = self.distance.init(sub)
        return params

    def initial_state(self, B: int, feat: int, dtype=jnp.float32):
        return BandedScoredState(
            nodes=jnp.zeros((B, self.graph_size, feat), dtype),
            band=jnp.zeros((B, self.graph_size, self.window_size), dtype),
            t=jnp.zeros((B,), jnp.int32),
        )

    def _score_row(self, params, x, nodes, p, t):
        """Edge values [B, w] for the row being inserted at slot p: offset
        k−1 holds the value of edge (sink p ← source (p−k) mod N)."""
        B = x.shape[0]
        N = self.graph_size
        w = self.window_size
        ks = jnp.arange(1, w + 1)
        # source k exists iff the sink had ≥ k predecessors at insert:
        # k ≤ min(t, N−1) (= num_nodes at the dense core's insert point)
        valid = ks[None, :] <= jnp.minimum(t, N - 1)[:, None]  # [B, w]
        row = jnp.zeros((B, w), nodes.dtype)
        if self.distance is not None:
            src_slots = jnp.mod(p[:, None] - ks[None, :], N)  # [B, w]
            wnodes = jnp.take_along_axis(
                nodes, src_slots[..., None], axis=1)  # [B, w, F]
            curr = x
            if self.distance.learned:
                scale = params["distance"]["dist_param"]
                curr = curr / scale
                wnodes = wnodes / scale
            dists = self.distance.dist_fn(curr, wnodes)  # [B, w]
            row = jnp.where(
                (dists < self.distance.max_distance) & valid, 1.0, row)
        for h in self.hops:
            row = row.at[:, h - 1].set(
                jnp.where(valid[:, h - 1], 1.0, row[:, h - 1]))
        return row

    @checked
    def __call__(self, params, x: Float[Array, "B F"],
                 state: BandedScoredState, key=None):
        del key
        nodes, band, t = state
        B = x.shape[0]
        N = self.graph_size
        w = self.window_size
        b_idx = jnp.arange(B)
        p = jnp.mod(t, N)
        nodes = nodes.at[b_idx, p].set(x.astype(nodes.dtype))
        band = band.at[b_idx, p].set(
            self._score_row(params, x, nodes, p, t))

        h_feats = nodes
        if self.preprocessor is not None:
            h_feats = self.preprocessor(params["preprocessor"], h_feats)

        # aggregation-time validity per offset k (same age algebra as
        # BandedRingGCM._hop_masks; had_pred is baked into the band row)
        slots = jnp.arange(N)[None, :]
        age = jnp.mod(p[:, None] - slots, N)
        horizon = jnp.minimum(t, N - 1)[:, None]
        sink_alive = age <= horizon  # [B, N]

        gnn_params = params["gnn"]
        for ci, act, aggr in zip(self._conv_idx, self._acts, self._aggrs):
            cp = gnn_params[ci]
            agg = jnp.zeros_like(h_feats)
            deg = jnp.zeros(h_feats.shape[:2], h_feats.dtype)
            for k in range(1, w + 1):
                src_alive = age + k <= horizon
                m = (band[:, :, k - 1]
                     * (sink_alive & src_alive).astype(h_feats.dtype))
                agg = agg + jnp.roll(h_feats, k, axis=1) * m[..., None]
                deg = deg + m
            if aggr == "mean":
                agg = agg / jnp.maximum(deg, 1.0)[..., None]
            h_feats = conv_project(cp, agg, h_feats, act)

        mx = h_feats[b_idx, p]
        return mx, BandedScoredState(nodes, band, t + 1)

    def scan(self, params, xs, state: BandedScoredState, key=None,
             remat: bool = False, dones=None, unroll: int | None = None):
        del key
        from gcm_tpu import config
        from gcm_tpu.core.graph_state import reset_where

        if unroll is None:
            unroll = config.SCAN_UNROLL

        def step(carry, inp):
            x, d = inp
            out, new_state = self(params, x, carry)
            if d is not None:
                new_state = reset_where(new_state, d)
            return new_state, out

        if remat:
            step = jax.checkpoint(step)
        xs_t = jnp.swapaxes(xs, 0, 1)
        if dones is None:
            final_state, outs = jax.lax.scan(
                lambda c, x: step(c, (x, None)), state, xs_t, unroll=unroll)
        else:
            final_state, outs = jax.lax.scan(
                step, state, (xs_t, jnp.swapaxes(dones, 0, 1)),
                unroll=unroll)
        return jnp.swapaxes(outs, 0, 1), final_state

    def window_profitable(self, mode: str = "forward") -> bool:
        """Measured dispatch gate for the wrappers' whole-trajectory call:
        the banded stencil `window()` beats its scan on every backend, shape
        and mode measured (BASELINE.md round-4 reconciliation: 44M +- 4M
        ts/s chained Tw=128 windows vs ~5M scan on TPU v5e at B=32/N=128,
        ~66M asymptotic in-window; train 38-40M) -- always profitable."""
        return True

    # -- whole-trajectory parallel forward -----------------------------------
    def _stencil_ages(self):
        """Output-stencil ages (see BandedRingGCM._stencil_ages) with every
        band offset 1..window as a potential hop."""
        need = [{0}]
        for _ in self._conv_idx:
            prev = set(need[0])
            for a in need[0]:
                for k in range(1, self.window_size + 1):
                    prev.add(a + k)
            need.insert(0, prev)
        return [sorted(s) for s in need]

    def window(self, params, xs, state: BandedScoredState, dones=None):
        """Whole-trajectory forward WITHOUT the scan — the scored-band analog
        of BandedRingGCM.window, output-identical to scan() (pinned by
        tests/test_banded_gcm.py::TestScoredWindowParity).

        The band row a sink records at insert depends only on raw
        observations (distance of x_i to the last `window` nodes, reference
        edge_selectors/distance.py:42-81), so the whole scan collapses to:
        score all T band rows at once (S [B, T, w]), then run the same
        temporal-stencil conv recursion as the ring core with S (shifted by
        sink age, falling back to the stored band for pre-window sinks) as
        the per-offset edge weights.
        """
        nodes0, band0, t0 = state
        B, T, F = xs.shape
        N = self.graph_size
        w = self.window_size
        i = jnp.arange(T)[None, :]

        t_eff, r_last = _window_time(t0, T, dones)
        horizon = jnp.minimum(t_eff, N - 1)

        need = self._stencil_ages()
        raw = {a: _raw_at_age(a, xs, nodes0, t0, N) for a in need[0]}

        # --- band rows for every in-window sink: S [B, T, w] ---------------
        # (the vectorized _score_row: offset k's source is the raw node at
        # age k; valid iff the sink had >= k predecessors at insert)
        ks = jnp.arange(1, w + 1)
        valid_k = ks[None, None, :] <= horizon[..., None]  # [B, T, w]
        S = jnp.zeros((B, T, w), nodes0.dtype)
        if self.distance is not None:
            srcs = jnp.stack([raw[k] for k in range(1, w + 1)],
                             axis=2)  # [B, T, w, F]
            curr = xs
            if self.distance.learned:
                scale = params["distance"]["dist_param"]
                curr = curr / scale
                srcs = srcs / scale
            # dist_fn signature is (curr [B,F], nodes [B,w,F]) -> [B,w];
            # vmap over the time axis reproduces the reference broadcast
            # semantics (incl. EuclideanEdge's cross-batch mean) exactly
            dists = jax.vmap(self.distance.dist_fn, in_axes=(1, 1),
                             out_axes=1)(curr, srcs)  # [B, T, w]
            S = jnp.where((dists < self.distance.max_distance) & valid_k,
                          1.0, S)
        for h in self.hops:
            S = S.at[:, :, h - 1].set(
                jnp.where(valid_k[:, :, h - 1], 1.0, S[:, :, h - 1]))

        def band_at_age(a):
            """Band row of the sink at age `a` as seen from step i: S[i-a]
            inside the window, else the stored band row (same ring lookup as
            the raw features)."""
            return _raw_at_age(a, S, band0, t0, N)

        feats = dict(raw)
        if self.preprocessor is not None:
            feats = {a: self.preprocessor(params["preprocessor"], v)
                     for a, v in feats.items()}

        gnn_params = params["gnn"]
        for li, (ci, act) in enumerate(zip(self._conv_idx, self._acts)):
            cp = gnn_params[ci]
            new_feats = {}
            for a in need[li + 1]:
                band_a = band_at_age(a)  # [B, T, w]
                sink_alive = (a <= horizon).astype(xs.dtype)
                agg = jnp.zeros_like(feats[a])
                deg = jnp.zeros(agg.shape[:2], agg.dtype)
                for k in range(1, w + 1):
                    src_alive = (a + k <= horizon).astype(xs.dtype)
                    m = band_a[:, :, k - 1] * sink_alive * src_alive
                    agg = agg + feats[a + k] * m[..., None]
                    deg = deg + m
                if self._aggrs[li] == "mean":
                    agg = agg / jnp.maximum(deg, 1.0)[..., None]
                new_feats[a] = conv_project(cp, agg, feats[a], act)
            feats = new_feats
        outs = feats[0]

        nodes_F, t_F = _ring_final(nodes0, xs, t0, N, r_last)
        band_F, _ = _ring_final(band0, S, t0, N, r_last)
        return outs, BandedScoredState(nodes_F, band_F, t_F)
