"""Learned edge selector, sparse (time-batched) API.

TPU-native sparse LearnedEdge (reference
src/gcm/sparse_edge_selectors/learned.py:12-160): an MLP scores all *causal*
(sink ≥ T, source < sink) node pairs, optionally windowed; logits pass through
a sparse gumbel softmax (stochastic) or tempered softmax (deterministic) over
the source dimension with a learnable, clamped temperature; entries above the
cutoff 1/(1+num_edge_samples) become edges.

The reference's ragged candidate list (util.get_causal_edges, util.py:270-282)
becomes the dense candidate grid [B, t, N] with a causal mask — one batched
MLP over the pair grid (the SDDMM-style hot path, SURVEY.md N3). The sparse
softmax over COO dim=2 is exactly a masked softmax over the grid's source
axis. Per-call stats (edges_per_node, edge_density, logits mean/var,
temperature — reference learned.py:153-159) are returned as an aux dict.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gcm_tpu.edges.learned import default_edge_network
from gcm_tpu.nn.module import MLP, Linear
from gcm_tpu.utils.ste import masked_gumbel_softmax, masked_tempered_softmax


class LearnedEdge:
    def __init__(
        self,
        input_size: int = 0,
        model: MLP | None = None,
        num_edge_samples: int = 5,
        deterministic: bool = False,
        window: int | None = None,
        softmax_temp: float = 1.0,
        learn_softmax_temp: bool = True,
        temp_bounds: Tuple[float, float] = (0.001, 5.0),
    ):
        assert input_size or model, "Must specify either input_size or model"
        self.deterministic = deterministic
        self.num_edge_samples = num_edge_samples
        self.window = window
        self.softmax_temp = softmax_temp
        self.learn_softmax_temp = learn_softmax_temp
        self.temp_bounds = temp_bounds
        self.edge_network = (
            model if model is not None
            else default_edge_network(input_size, init="orthogonal")
        )

    def init(self, key):
        params = {"edge_network": self.edge_network.init(key)}
        if self.learn_softmax_temp:
            params["tau"] = jnp.asarray([self.softmax_temp], jnp.float32)
        return params

    def _score_pairs(self, net_params, sink_feats, nodes):
        """Pair logits [B, t, N] for (sink ‖ source) inputs.

        When the scorer is the canonical MLP whose first layer is
        Linear(2F, H), that layer factors: W = [W_sink; W_src], so
        Linear(cat(s, r)) = s@W_sink + r@W_src + b — computed once per sink
        and once per source and broadcast-added, turning the widest matmul
        from O(t·N·F²) into O((t+N)·F²) (the SDDMM-style decomposition of
        SURVEY.md N3). Any other scorer falls back to the dense pair grid.
        """
        B, t, F = sink_feats.shape
        N = nodes.shape[1]
        net = self.edge_network
        first = net.layers[0] if isinstance(net, MLP) and net.layers else None
        if isinstance(first, Linear) and first.in_dim == 2 * F:
            W = net_params[0]["kernel"]  # [2F, H]
            h = (jnp.einsum("btf,fh->bth", sink_feats, W[:F])[:, :, None, :]
                 + jnp.einsum("bnf,fh->bnh", nodes, W[F:])[:, None, :, :])
            if "bias" in net_params[0]:
                h = h + net_params[0]["bias"]
            for layer, p in zip(net.layers[1:], net_params[1:]):
                if hasattr(layer, "init"):
                    h = layer(p, h)
                else:
                    h = layer(h)
            return h[..., 0]
        pair_in = jnp.concatenate(
            [
                jnp.broadcast_to(sink_feats[:, :, None, :], (B, t, N, F)),
                jnp.broadcast_to(nodes[:, None, :, :], (B, t, N, F)),
            ],
            axis=-1,
        )
        return net(net_params, pair_in)[..., 0]

    def _temperature(self, params):
        if self.learn_softmax_temp:
            return jnp.clip(params["tau"][0], *self.temp_bounds)
        return jnp.asarray(self.softmax_temp, jnp.float32)

    def __call__(self, params, nodes, T, taus, t, key=None, seg_mask=None):
        B, N, F = nodes.shape
        i = jnp.arange(t)[None, :]  # new-node offset
        sink = T[:, None] + i  # [B, t]
        j = jnp.arange(N)[None, None, :]  # source idx [1,1,N]
        cand = (
            (i < taus[:, None])[..., None]
            & (j < jnp.clip(sink, 0, N)[..., None])  # causal: source < sink
        )
        if self.window is not None:
            # reference windows sources to >= T - window (util.py:252-259)
            cand = cand & (j >= jnp.maximum(T[:, None, None] - self.window, 0))
        if seg_mask is not None:
            # episode-aware replay: candidates restricted to the sink's own
            # episode BEFORE the softmax, so scores match a fresh graph
            cand = cand & seg_mask

        sink_feats = jnp.take_along_axis(
            nodes, jnp.clip(sink, 0, N - 1)[..., None], axis=1
        )  # [B, t, F]
        logits = self._score_pairs(params["edge_network"], sink_feats, nodes)

        tau_temp = self._temperature(params)
        cutoff = 1.0 / (1 + self.num_edge_samples)
        if self.deterministic:
            soft = masked_tempered_softmax(logits, cand, axis=2, tau=tau_temp)
        else:
            soft = masked_gumbel_softmax(key, logits, cand, axis=2, tau=tau_temp)
        keep = soft > cutoff
        grid = jnp.where(keep & cand, soft, 0.0)

        n_edges = jnp.sum(keep & cand)
        n_cand = jnp.maximum(jnp.sum(cand), 1)
        lmask = cand
        lsum = jnp.sum(jnp.where(lmask, logits, 0.0))
        lmean = lsum / n_cand
        lvar = jnp.sum(jnp.where(lmask, (logits - lmean) ** 2, 0.0)) / n_cand
        aux = {
            "edges_per_node": n_edges / jnp.maximum(jnp.sum(taus), 1),
            "edge_density": n_edges / n_cand,
            "logits_mean": lmean,
            "logits_var": lvar,
            "temperature": tau_temp,
        }
        return grid, aux

    # -- grid-free window-space path ----------------------------------------
    @property
    def supports_emit(self):
        """emit_edges needs the candidate window to bound the score width."""
        return self.window is not None

    def emit_profitable(self, t, N):
        """Measured dispatch gate (TPU v5e, whole forward window, B=32
        Tw=32 window=16): window-space scoring wins 2.6x at N=512
        (w'/N ≈ 0.09) but LOSES 25% at N=128 (w'/N ≈ 0.38) — the extra
        window gather + wider append outweigh the saved scoring until the
        window is a small fraction of the graph. Gate at
        N ≥ EMIT_WINDOW_FACTOR·w' (config-tunable; gate_hygiene.py
        re-measures the crossover at other shapes)."""
        if self.window is None:
            return False
        from gcm_tpu import config

        wp = min(self.window + t, N)
        return N >= config.EMIT_WINDOW_FACTOR * wp

    def emit_edges(self, params, nodes, T, taus, t, key=None, seg_mask=None):
        """Window-space scoring + direct edge emission.

        With a candidate window, every sink T+i draws sources from
        [max(T−window, 0), T+i) — a band of width ≤ window + t independent
        of graph_size. Scoring/softmax run on the gathered [B, w', F] window
        instead of all N nodes (same pair MLP, same masked softmax over the
        same candidate set → same probabilities up to reduction order), and
        the kept entries are emitted as edges directly — no [B, t, N] grid,
        no compaction. The cutoff keeps at most num_edge_samples entries per
        sink (probabilities sum to 1), which also gives the slot-aggregation
        bound slot_k = num_edge_samples.

        Returns (new_edges [B, 2, t·w'], weights, valid, aux)."""
        B, N, F = nodes.shape
        wp = min(self.window + t, N)
        i = jnp.arange(t)[None, :]
        sink = T[:, None] + i  # [B, t]
        lo = jnp.maximum(T - self.window, 0)  # [B]
        src_abs = lo[:, None] + jnp.arange(wp)[None, :]  # [B, w']
        j = src_abs[:, None, :]  # [B, 1, w'] -> broadcast over t
        cand = (
            (i < taus[:, None])[..., None]
            & (j < jnp.clip(sink, 0, N)[..., None])
            & (j < N)
        )  # [B, t, w']
        if seg_mask is not None:
            safe = jnp.clip(src_abs, 0, N - 1)
            seg_w = jnp.take_along_axis(
                seg_mask, jnp.broadcast_to(safe[:, None, :], cand.shape),
                axis=2)
            cand = cand & seg_w

        win_nodes = jnp.take_along_axis(
            nodes, jnp.clip(src_abs, 0, N - 1)[..., None], axis=1
        )  # [B, w', F]
        sink_feats = jnp.take_along_axis(
            nodes, jnp.clip(sink, 0, N - 1)[..., None], axis=1
        )  # [B, t, F]
        logits = self._score_pairs(params["edge_network"], sink_feats,
                                   win_nodes)  # [B, t, w']

        tau_temp = self._temperature(params)
        cutoff = 1.0 / (1 + self.num_edge_samples)
        if self.deterministic:
            soft = masked_tempered_softmax(logits, cand, axis=2, tau=tau_temp)
        else:
            soft = masked_gumbel_softmax(key, logits, cand, axis=2,
                                         tau=tau_temp)
        keep = (soft > cutoff) & cand

        sinks_g = jnp.broadcast_to(sink[:, :, None], keep.shape)
        srcs_g = jnp.broadcast_to(j, keep.shape)
        flat = lambda a: a.reshape(B, -1)
        ok_ = flat(keep)
        new_e = jnp.stack([jnp.where(ok_, flat(sinks_g), -1),
                           jnp.where(ok_, flat(srcs_g), -1)], axis=1)
        vals = jnp.where(ok_, flat(soft), 0.0)

        n_edges = jnp.sum(keep)
        n_cand = jnp.maximum(jnp.sum(cand), 1)
        lsum = jnp.sum(jnp.where(cand, logits, 0.0))
        lmean = lsum / n_cand
        lvar = jnp.sum(jnp.where(cand, (logits - lmean) ** 2, 0.0)) / n_cand
        aux = {
            "edges_per_node": n_edges / jnp.maximum(jnp.sum(taus), 1),
            "edge_density": n_edges / n_cand,
            "logits_mean": lmean,
            "logits_var": lvar,
            "temperature": tau_temp,
        }
        return new_e, vals, ok_, aux
