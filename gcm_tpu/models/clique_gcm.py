"""CliqueGCM — fully-connected-past (DenseEdge) fast path.

The reference's DenseEdge selector (src/gcm/edge_selectors/dense.py:4-23)
connects every inserted node bidirectionally to all existing nodes plus a
self edge, and DenseGCM's wraparound clears the evicted node's row/column
(gcm.py:323-355) — so the adjacency is ALWAYS a complete graph with
self-loops over the alive nodes. That makes the per-sink GraphConv('add')
aggregate identical for every sink: one masked sum S = sum of alive
preprocessed nodes. This core exploits that structure:

- per step: O(N·F·F') root matmul + O(N·F) masked sum, vs DenseGCM's
  O(N²·F) adj @ x — the [B, N, N] adjacency is never materialized and the
  state is just (nodes, t), exactly like BandedRingGCM.
- `window()`: whole-trajectory scan-free forward. Because the shared
  aggregate at step i depends only on which writes are alive (pure age
  algebra), every step's full slot-feature tensor is computable at once as
  batched [B, T, N, F] ops — no lax.scan, no step serialization.

Produces EXACTLY DenseGCM's belief sequence for
edge_selectors=DenseEdge() and a DenseGraphConv('add') + tanh/relu GNN
stack (pinned by tests/test_clique_gcm.py), including ring-buffer
wraparound and episode resets. pooled / edge_weights / PE are not
supported (use DenseGCM for those).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jaxtyping import Array, Float

from gcm_tpu.utils.contracts import checked
from gcm_tpu.nn.dense_conv import DenseGNN
from gcm_tpu.models.banded_gcm import (
    BandedState,
    _ring_final,
    _window_time,
)


class CliqueGCM:
    """DenseEdge fast path: implicit complete-graph adjacency over alive
    nodes. State is `BandedState` (nodes [B,N,F], t [B]) — same ring-pointer
    model (slot = t mod N) whose eviction algebra is pinned against
    DenseGCM's shift-based wraparound by the banded-core parity tests."""

    def __init__(self, gnn: DenseGNN, preprocessor=None,
                 graph_size: int = 128):
        from gcm_tpu.nn.dense_conv import plan_conv_stack

        assert isinstance(gnn, DenseGNN), "CliqueGCM needs a DenseGNN"
        plan = plan_conv_stack(gnn.layers, allowed_aggrs=("add", "mean"))
        assert plan is not None, (
            "CliqueGCM supports DenseGraphConv('add'|'mean') + tanh/relu "
            "stacks")
        self._conv_idx, self._acts, self._aggrs = plan
        self.gnn = gnn
        self.preprocessor = preprocessor
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

    def _apply_layer(self, cp, act, root_term, rel_term):
        out = root_term + rel_term
        if "bias" in cp["lin_rel"]:
            out = out + cp["lin_rel"]["bias"]
        if act == "tanh":
            out = jnp.tanh(out)
        elif act == "relu":
            out = jnp.maximum(out, 0.0)
        return out

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

        h = nodes
        if self.preprocessor is not None:
            h = self.preprocessor(params["preprocessor"], h)

        slots = jnp.arange(N)[None, :]
        age = jnp.mod(p[:, None] - slots, N)  # age AFTER this insert
        alive = (age <= jnp.minimum(t, N - 1)[:, None]).astype(h.dtype)

        # alive count = every alive sink's in-degree (complete graph with
        # self-loops; DenseGraphConv mean divides by max(deg, 1))
        cnt = (jnp.minimum(t, N - 1) + 1).astype(h.dtype)[:, None]  # [B, 1]
        gnn_params = params["gnn"]
        for ci, act, aggr in zip(self._conv_idx, self._acts, self._aggrs):
            cp = gnn_params[ci]
            # every alive sink aggregates from ALL alive nodes (incl. self)
            agg = jnp.sum(h * alive[..., None], axis=1)  # [B, F]
            if aggr == "mean":
                agg = agg / cnt
            root = jnp.einsum("bnf,fo->bno", h, cp["lin_root"]["kernel"])
            rel = jnp.einsum("bf,fo->bo", agg,
                             cp["lin_rel"]["kernel"])[:, None, :]
            h = self._apply_layer(cp, act, root, rel)

        mx = h[b_idx, p]
        return mx, BandedState(nodes, t + 1)

    def scan(self, params, xs, state: BandedState, key=None,
             remat: bool = False, dones=None, unroll: int | None = None):
        """Stepwise recurrence (see DenseGCM.scan for dones/unroll
        semantics)."""
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
        """Measured dispatch gate for the wrappers' whole-trajectory call.

        Unlike the banded stencil, the clique `window()` must materialize a
        [B*T, N, F] slot-content tensor (the receptive field is ALL alive
        nodes, not a bounded hop set), so its HBM traffic is T x the scan's
        working set. Measured on TPU v5e it LOSES to its own scan at every
        point (MEASURE_r3/clique_window.log: 949k-1.36M vs 4.62M ts/s at
        N=128; 209-302k vs 2.35M at N=512), while on the CPU backend the
        batched form wins (scan dispatch overhead dominates there). Dispatch
        accordingly: scan on TPU, window elsewhere."""
        return jax.default_backend() != "tpu"

    # -- whole-trajectory parallel forward -----------------------------------
    def _prefix_agg(self, feats_seq, feats_old, t0, t_eff, horizon, N):
        """Layer-0 alive-masked aggregate A0 [B, T, F] via prefix sums —
        no [B,T,N,F] tensor. Alive window nodes at step i are the
        CONTIGUOUS counter range [i-horizon_i, i] (each maps to a distinct
        slot since horizon < N), so their sum is a cumsum difference; alive
        pre-window slots are ages 1..min(t0, N-1-i) in age order (and none
        once an episode reset occurred), a cumsum over the age-sorted old
        rows."""
        B, T, F = feats_seq.shape
        i = jnp.arange(T)[None, :]
        C = jnp.cumsum(feats_seq, axis=1)  # [B, T, F]
        lo = i - horizon  # [B, T] first alive window index
        gather_lo = jnp.take_along_axis(
            C, jnp.clip(lo - 1, 0, T - 1)[..., None], axis=1)
        A_win = C - jnp.where((lo >= 1)[..., None], gather_lo, 0.0)
        # old rows sorted by age: age a lives at slot (t0 - a) mod N
        ages = jnp.arange(1, N + 1)[None, :]  # [1, N]
        slot_of_age = jnp.mod(t0[:, None] - ages, N)  # [B, N]
        old_sorted = jnp.take_along_axis(
            feats_old, slot_of_age[..., None], axis=1)  # [B, N, F]
        D = jnp.cumsum(old_sorted, axis=1)  # D[:, m-1] = sum of ages 1..m
        no_reset = t_eff == t0[:, None] + i
        m = jnp.where(no_reset,
                      jnp.clip(jnp.minimum(t0[:, None], N - 1 - i), 0, N),
                      0)  # [B, T] max alive old age
        gather_m = jnp.take_along_axis(
            D, jnp.clip(m - 1, 0, N - 1)[..., None], axis=1)
        A_old = jnp.where((m >= 1)[..., None], gather_m, 0.0)
        return A_win + A_old

    def _window_proj(self, params, xs, state: BandedState, dones=None):
        """`window(impl='proj')` — same outputs as the gather variant up to
        float reassociation (the alive sum becomes a cumsum difference),
        but the first conv layer never runs a matmul over the [B·T, N, F]
        content tensor: the root projections are computed per ROW
        ([B,T,F]@W and [B,N,F]@W) and gathered, the layer-0 aggregate comes
        from prefix sums (`_prefix_agg`), and the final layer runs on the
        diagonal only (the inserted slot's content is exactly x_i, so its
        projected root term is R_seq[i] — no gather). For 1-layer stacks no
        [B·T,N,*] tensor exists at all; for 2-layer stacks the only one is
        the elementwise act(R_g + Q) feeding a masked reduce, which XLA can
        fuse without materializing the matmul input the gather variant
        forces. Dispatch between the variants is by TPU measurement
        (bench_clique)."""
        nodes0, t0 = state
        B, T, F = xs.shape
        N = self.graph_size
        b_idx = jnp.arange(B)

        t_eff, r_last = _window_time(t0, T, dones)
        horizon = jnp.minimum(t_eff, N - 1)  # [B, T]
        p = jnp.mod(t_eff, N)  # [B, T]

        feats_seq = xs
        feats_old = nodes0
        if self.preprocessor is not None:
            feats_seq = self.preprocessor(params["preprocessor"], xs)
            feats_old = self.preprocessor(params["preprocessor"], nodes0)

        gnn_params = params["gnn"]
        L = len(self._conv_idx)
        cp0 = gnn_params[self._conv_idx[0]]
        act0 = self._acts[0]

        cnt = (horizon + 1).astype(xs.dtype)[..., None]  # [B, T, 1]
        A0 = self._prefix_agg(feats_seq, feats_old, t0, t_eff, horizon, N)
        if self._aggrs[0] == "mean":
            A0 = A0 / cnt
        rel0 = jnp.einsum("btf,fo->bto", A0, cp0["lin_rel"]["kernel"])
        R_seq = jnp.einsum("btf,fo->bto", feats_seq,
                           cp0["lin_root"]["kernel"])
        diag0 = self._apply_layer(
            cp0, act0, R_seq, rel0)  # layer-1 features of the inserted slot

        if L == 1:
            outs = diag0
        else:
            i_iota = jnp.arange(T)[None, :, None]
            slots = jnp.arange(N)[None, None, :]
            age = jnp.mod(p[..., None] - slots, N)  # [B, T, N]
            alive = age <= horizon[..., None]
            in_window = age <= i_iota
            j_idx = jnp.clip(i_iota - age, 0, T - 1)
            R_old = jnp.einsum("bnf,fo->bno", feats_old,
                               cp0["lin_root"]["kernel"])
            R_g = jnp.where(in_window[..., None],
                            R_seq[b_idx[:, None, None], j_idx],
                            R_old[:, None, :, :])  # [B, T, N, O]
            feats = self._apply_layer(cp0, act0, R_g,
                                      rel0[:, :, None, :])
            feats = feats.reshape(B * T, N, -1)
            aliveF = alive.astype(xs.dtype).reshape(B * T, N)
            p_flat = p.reshape(B * T)
            cnt_flat = cnt.reshape(B * T, 1)
            diag_prev = diag0.reshape(B * T, -1)
            for li in range(1, L):
                ci, act = self._conv_idx[li], self._acts[li]
                cp = gnn_params[ci]
                last = li == L - 1
                agg = jnp.sum(feats * aliveF[..., None], axis=1)
                if self._aggrs[li] == "mean":
                    agg = agg / cnt_flat
                rel = jnp.einsum("bf,fo->bo", agg, cp["lin_rel"]["kernel"])
                if last:
                    root = jnp.einsum("bf,fo->bo", diag_prev,
                                      cp["lin_root"]["kernel"])
                    outs = self._apply_layer(cp, act, root, rel)
                    outs = outs.reshape(B, T, -1)
                else:
                    root = jnp.einsum("bnf,fo->bno", feats,
                                      cp["lin_root"]["kernel"])
                    feats = self._apply_layer(cp, act, root, rel[:, None, :])
                    diag_prev = feats[jnp.arange(B * T), p_flat]

        nodes_F, t_F = _ring_final(nodes0, xs, t0, N, r_last)
        return outs, BandedState(nodes_F, t_F)

    def window(self, params, xs, state: BandedState, dones=None,
               impl: str = "gather"):
        """Whole-trajectory forward WITHOUT the scan: same outputs as
        `scan` up to float reassociation — a few ULP of the pre-activation
        scale, because backend GEMMs accumulate in a row-count-dependent
        order (measured on the CPU backend) — and the SAME final state
        bitwise (it is pure gathers). Pinned by
        tests/test_clique_gcm.py::TestCliqueWindowParity.

        Unlike the banded cores' temporal stencil (bounded hop set), the
        clique's receptive field is ALL alive nodes — so instead of a
        stencil over ages this materializes, per step i, the full slot
        feature tensor [B, T, N, F]: entry (i, s) is what the buffer slot s
        holds at step i (the newest write ≤ i, via the same ring age
        algebra as the scan). Layers are then the scan step's ops with T
        folded into the batch axis ([B·T, N, F] matmuls + one masked
        slot-sum per step). The final layer only needs the inserted slot's
        features (the belief), so it runs on the [B·T, F] diagonal.

        dones: optional [B, T] — same episode-reset semantics as scan.
        Slots whose newest write is from a previous episode are dead under
        the within-episode age mask and contribute exactly 0 to the
        aggregate (their gathered content is masked, matching the scan's
        zeroed buffer).

        impl: 'gather' (this default path) or 'proj' (`_window_proj`:
        per-row root projections + prefix-sum aggregate, no big matmul —
        pick by TPU measurement, bench_clique)."""
        if impl == "proj":
            return self._window_proj(params, xs, state, dones=dones)
        assert impl == "gather", impl
        nodes0, t0 = state
        B, T, F = xs.shape
        N = self.graph_size
        b_idx = jnp.arange(B)

        t_eff, r_last = _window_time(t0, T, dones)
        horizon = jnp.minimum(t_eff, N - 1)  # [B, T]
        p = jnp.mod(t_eff, N)  # [B, T] insert slot per step

        i_iota = jnp.arange(T)[None, :, None]
        slots = jnp.arange(N)[None, None, :]
        age = jnp.mod(p[..., None] - slots, N)  # [B, T, N]
        alive = age <= horizon[..., None]  # [B, T, N]
        # alive slots were always written within the current episode (the
        # insert counter fills slots consecutively from each reset), so the
        # in-window gather below is exact wherever `alive` holds; dead-slot
        # content is arbitrary and masked to exactly 0 in the aggregate.
        in_window = age <= i_iota
        j_idx = jnp.clip(i_iota - age, 0, T - 1)  # [B, T, N]

        def content(seq, old):
            """[B,T,N,D]: slot s's content at step i (newest write <= i)."""
            g = seq[b_idx[:, None, None], j_idx]  # [B, T, N, D]
            return jnp.where(in_window[..., None], g,
                             old[:, None, :, :].astype(seq.dtype))

        feats_seq = xs
        feats_old = nodes0
        if self.preprocessor is not None:
            feats_seq = self.preprocessor(params["preprocessor"], xs)
            feats_old = self.preprocessor(params["preprocessor"], nodes0)

        # Fold T into the batch axis: every op below then has the same
        # rank/axes as the scan step's ops ([B·T, N, F] vs [B, N, F]), and
        # the per-step GEMMs fuse into a few large ones.
        aliveF = alive.astype(xs.dtype).reshape(B * T, N)
        p_flat = p.reshape(B * T)
        cnt_flat = (horizon + 1).astype(xs.dtype).reshape(B * T, 1)
        gnn_params = params["gnn"]
        L = len(self._conv_idx)

        feats = None  # [B·T, N, F] — built lazily
        for li, (ci, act) in enumerate(zip(self._conv_idx, self._acts)):
            cp = gnn_params[ci]
            last = li == L - 1
            if feats is None:
                feats = content(feats_seq, feats_old)
                feats = feats.reshape(B * T, N, feats.shape[-1])
            agg = jnp.sum(feats * aliveF[..., None], axis=1)  # [B·T, F]
            if self._aggrs[li] == "mean":
                agg = agg / cnt_flat
            rel = jnp.einsum("bf,fo->bo", agg, cp["lin_rel"]["kernel"])
            if last:
                diag = feats[jnp.arange(B * T), p_flat]  # [B·T, F]
                root = jnp.einsum("bf,fo->bo", diag,
                                  cp["lin_root"]["kernel"])
                outs = self._apply_layer(cp, act, root, rel)
                outs = outs.reshape(B, T, -1)
            else:
                root = jnp.einsum("bnf,fo->bno", feats,
                                  cp["lin_root"]["kernel"])
                feats = self._apply_layer(cp, act, root, rel[:, None, :])

        nodes_F, t_F = _ring_final(nodes0, xs, t0, N, r_last)
        return outs, BandedState(nodes_F, t_F)
