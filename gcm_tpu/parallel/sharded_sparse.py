"""End-to-end node-sharded SparseGCM (SURVEY.md §2 N6, VERDICT r4 missing #3).

`PartitionedSparseGNN` scales the GNN aggregation 1/d but leaves the REST of
the SparseGCM step — node buffer, selector scoring grid, compaction, edge
append — replicated full-width on every device. This module shards the whole
step: state, selector, compaction, append, convolution, so per-device work
AND memory are 1/d and the graph memory itself can outgrow one chip
(graph-memory-larger-than-one-chip is the regime this framework exists for).

Sharding layout (mesh axis `axis`, d shards, block partition of the node
axis N into blocks of nb = N/d):

- nodes   [B, N, F]      → P(None, axis, None): shard s owns rows
                           [s·nb, (s+1)·nb).
- edges   [B, 2, d·Epl]  → P(None, None, axis): shard s owns the edges whose
                           SOURCE row falls in its block (global coords, −1
                           sentinels), with a per-shard append cursor — so
                           selector discovery, weight normalization, and the
                           append all stay local to the shard that scored
                           the pair. Epl = max_edges/d.
- weights [B, d·Epl]     → P(None, axis)
- num_edges [B, d]       → P(None, axis): per-shard cursors.
- t       [B]            → replicated.

Per-step pipeline inside ONE shard_map (shapes asserted 1/d in-place):

1. insert: the t new rows land in whichever shards own them (local
   rows_set; O(t·F) per shard).
2. selector: TemporalEdge emits its analytic (sink, source) pairs and each
   shard keeps the ones whose source it owns (O(t·hops)); LearnedEdge
   (deterministic) scores ONLY the shard's [B, t, nb] candidate columns —
   the pair-MLP grid work scales 1/d — with the tempered softmax's
   max/denominator combined across shards by one pmax + one psum of [B, t]
   (the reference softmax semantics over the full source axis,
   sparse_edge_selectors/learned.py:132-140, exactly).
3. compaction: nonzero_padded over the LOCAL [B, t·nb] grid (1/d), append
   at the LOCAL cursor (reference COO concat+coalesce replacement, same
   v/v.detach() weight normalization, sparse_gcm.py:154-164).
4. GNN (GraphConv('add') stack): messages are gathered from the shard's own
   source rows and scatter-added into an extended [B, nb + W, F] sink
   accumulator, where W is the selector's STRUCTURAL sink−source bound
   (max hop for TemporalEdge; window + t for the windowed learned
   selector — same structural-history assumption as hop_cap='auto'). One
   ppermute ring step hands the W-row tail to the right neighbor — comms
   O(B·W·F) per device per layer, CONSTANT in N and d (the halo design of
   parallel/edge_partition.py, now fed by shard-local state instead of
   replicated re-bucketing). Selectors with no structural bound (unwindowed
   learned) fall back to a full-width psum accumulator (comm="psum").
5. output: each shard contributes the new-node rows it owns; one psum of
   [B, t, F_out] assembles the replicated belief window.

Exact parity with the single-device SparseGCM (same params, same edge SET,
beliefs equal to float-reassociation order) is pinned in
tests/test_sharded_sparse.py on the virtual 8-device mesh.

Reference behaviors mirrored: multi-row insert sparse_gcm.py:113-123,
selector contract :130-139, weight norm :154-164, GNN aggregation :178,
output scatter :205-208.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gcm_tpu.edges.sparse_learned import LearnedEdge as SparseLearnedEdge
from gcm_tpu.edges.sparse_spatial import SparseEdgeChain
from gcm_tpu.edges.sparse_temporal import TemporalEdge
from gcm_tpu.ops.scatter import append_edges, nonzero_padded, rows_set
from gcm_tpu.utils.ste import grad_preserving_ones


class ShardedSparseState(NamedTuple):
    nodes: jax.Array      # [B, N, F]     node-sharded
    edges: jax.Array      # [B, 2, d*Epl] edge-sharded, source-owned, global
    weights: jax.Array    # [B, d*Epl]
    t: jax.Array          # [B]           replicated
    num_edges: jax.Array  # [B, d]        per-shard cursors


class ShardedSparseGCM:
    """Node-sharded SparseGCM for structurally-bounded selectors.

    layers: GraphConv('add') / activation callables (the SparseGNN stack).
    Supported selectors: TemporalEdge, LearnedEdge(deterministic=True)
    (stochastic sampling draws per-lane noise that cannot be reproduced
    shard-locally — use the replicated core for it). No aux selectors,
    positional encoding, max_hops, or dones (the replicated SparseGCM keeps
    full coverage; this core is the scale-out path).
    """

    def __init__(self, layers, mesh: Mesh, axis: str = "dp",
                 preprocessor=None, edge_selectors=None,
                 graph_size: int = 128, max_edges: int = 512,
                 comm: str = "auto"):
        from gcm_tpu.nn.sparse_conv import GraphConv

        for layer in layers:
            if hasattr(layer, "init"):
                assert isinstance(layer, GraphConv) and layer.aggr == "add", (
                    "ShardedSparseGCM supports GraphConv('add') layers")
        def sel_ok(s):
            if s is None or isinstance(s, TemporalEdge):
                return True
            if isinstance(s, SparseLearnedEdge):
                assert s.deterministic, (
                    "sharded learned selector: deterministic only (per-lane "
                    "gumbel noise is not reproducible shard-locally)")
                return True
            if isinstance(s, SparseEdgeChain):
                return all(sel_ok(m) for m in s.selectors)
            return False

        assert sel_ok(edge_selectors), (
            "ShardedSparseGCM supports TemporalEdge / deterministic "
            "LearnedEdge / SparseEdgeChain of those — got "
            + type(edge_selectors).__name__)
        d = mesh.shape[axis]
        assert graph_size % d == 0, (graph_size, d)
        assert max_edges % d == 0, (max_edges, d)
        assert comm in ("auto", "halo", "psum")
        self.layers = layers
        self.mesh = mesh
        self.axis = axis
        self.d = d
        self.nb = graph_size // d
        self.epl = max_edges // d
        self.preprocessor = preprocessor
        self.edge_selectors = edge_selectors
        self.graph_size = graph_size
        self.max_edges = max_edges
        self.comm = comm

    # -- params / state ----------------------------------------------------
    def init(self, key):
        params = {"gnn": []}
        for layer in self.layers:
            if hasattr(layer, "init"):
                key, sub = jax.random.split(key)
                params["gnn"].append(layer.init(sub))
            else:
                params["gnn"].append({})
        for name in ("preprocessor", "edge_selectors"):
            mod = getattr(self, name)
            if mod is not None:
                key, sub = jax.random.split(key)
                params[name] = mod.init(sub)
        return params

    def initial_state(self, B: int, feat: int,
                      dtype=jnp.float32) -> ShardedSparseState:
        return ShardedSparseState(
            nodes=jnp.zeros((B, self.graph_size, feat), dtype),
            edges=jnp.full((B, 2, self.max_edges), -1, jnp.int32),
            weights=jnp.full((B, self.max_edges), 1.0, dtype),
            t=jnp.zeros((B,), jnp.int32),
            num_edges=jnp.zeros((B, self.d), jnp.int32),
        )

    def state_shardings(self):
        """NamedShardings for device_put of a ShardedSparseState (optional —
        shard_map splits plain arrays too; placing them keeps HBM per
        device at 1/d)."""
        from jax.sharding import NamedSharding

        ax = self.axis
        return ShardedSparseState(
            nodes=NamedSharding(self.mesh, P(None, ax, None)),
            edges=NamedSharding(self.mesh, P(None, None, ax)),
            weights=NamedSharding(self.mesh, P(None, ax)),
            t=NamedSharding(self.mesh, P()),
            num_edges=NamedSharding(self.mesh, P(None, ax)),
        )

    # -- structural halo bound --------------------------------------------
    def _halo(self, t: int) -> int | None:
        """Max (sink − source) any edge in a same-selector history can have;
        None when unbounded (falls back to psum comm)."""
        def bound(sel):
            if sel is None:
                return 0
            if isinstance(sel, TemporalEdge):
                return max(sel.hops) if sel.hops else 0
            if isinstance(sel, SparseEdgeChain):
                bs = [bound(m) for m in sel.selectors]
                return None if any(b is None for b in bs) else max(bs, default=0)
            if sel.window is not None:  # windowed learned
                return sel.window + t
            return None

        return bound(self.edge_selectors)

    # -- forward -----------------------------------------------------------
    def __call__(self, params, x, taus, state: ShardedSparseState,
                 key=None, dones=None, return_aux: bool = False):
        """x [B, t, F] zero-padded window, taus [B] valid lengths →
        (mx [B, t, F_out] replicated, state'[, aux]). key/dones are
        accepted for adapter-signature compatibility and must be None
        (stochastic selectors and episode-aware replay stay on the
        replicated core)."""
        assert key is None, "sharded core: deterministic selectors only"
        assert dones is None, (
            "sharded core: episode-aware replay (dones) is not sharded — "
            "use the replicated SparseGCM")
        B, t, F = x.shape
        d, nb, epl = self.d, self.nb, self.epl
        ax = self.axis
        halo = self._halo(t)
        mode = self.comm
        if mode == "auto":
            mode = "halo" if halo is not None and halo <= nb else "psum"
        if mode == "halo":
            assert halo is not None and halo <= nb, (
                f"halo={halo} must fit one neighbor block nb={nb} "
                "(raise graph_size/d or use comm='psum')")
        sel = self.edge_selectors

        def local_step(x_in, taus_in, nodes_b, edges_b, w_b, T, ne_b):
            # ---- the 1/d contracts this design promises (VERDICT r4 #3) --
            assert nodes_b.shape[1] == nb, (nodes_b.shape, nb)
            assert edges_b.shape[-1] == epl, (edges_b.shape, epl)
            assert ne_b.shape == (B, 1), ne_b.shape
            s = jax.lax.axis_index(ax)
            base = s * nb
            ne = ne_b[:, 0]
            aux = {}

            # 1. insert new rows owned by this shard
            i = jnp.arange(t)[None, :]
            rows = T[:, None] + i                          # [B, t] global
            new_mask = (i < taus_in[:, None]) & (rows < self.graph_size)
            loc = rows - base
            mine = new_mask & (loc >= 0) & (loc < nb)
            nodes_b = rows_set(nodes_b, jnp.clip(loc, 0, nb - 1), x_in, mine)
            dirty_b = nodes_b

            # 2. selector → LOCAL [B, t, nb] grid slice. Chain members SUM
            # into the grid (the replicated SparseEdgeChain's COO
            # concat+coalesce analog, sparse_gcm.py:130-139); the weight
            # normalization below maps any positive sum to a weight-1 edge
            # exactly like the replicated append_grid.
            sink = rows                                        # [B, t]
            cols = base + jnp.arange(nb)[None, None, :]        # [1, 1, nb]

            def temporal_grid(tsel):
                g = jnp.zeros((B, t, nb), nodes_b.dtype)
                for hop in tsel.hops:
                    src = sink - hop                           # [B, t]
                    ok_h = new_mask & (src >= 0) & (sink > 0)
                    onehot = (cols == src[..., None]) & ok_h[..., None]
                    g = jnp.maximum(g, onehot.astype(g.dtype))
                return g

            def learned_grid(lsel, sp, prefix=""):
                cand = (new_mask[..., None]
                        & (cols < jnp.clip(sink, 0,
                                           self.graph_size)[..., None]))
                if lsel.window is not None:
                    cand = cand & (cols >= jnp.maximum(
                        T[:, None, None] - lsel.window, 0))
                # sink features are the raw inputs themselves (rows just
                # inserted hold x; the sink row may live on another shard)
                logits = lsel._score_pairs(sp["edge_network"],
                                           x_in.astype(nodes_b.dtype),
                                           dirty_b)            # [B, t, nb]
                assert logits.shape == (B, t, nb)
                tau_temp = lsel._temperature(sp)
                neg = jnp.finfo(logits.dtype).min
                z = jnp.where(cand, logits / tau_temp, neg)
                # the max subtraction is stop-gradient in the replicated
                # masked_softmax too; stopping BEFORE the collective also
                # sidesteps pmax's missing differentiation rule
                gmax = jax.lax.pmax(
                    jax.lax.stop_gradient(jnp.max(z, axis=2)), ax)  # [B, t]
                z = z - gmax[..., None]
                e = jnp.where(cand, jnp.exp(z), 0.0)
                denom = jax.lax.psum(jnp.sum(e, axis=2), ax)   # [B, t]
                soft = e / jnp.maximum(denom,
                                       jnp.finfo(e.dtype).tiny)[..., None]
                cutoff = 1.0 / (1 + lsel.num_edge_samples)
                keep = (soft > cutoff) & cand
                # reference stats dict, assembled across shards
                n_edges = jax.lax.psum(jnp.sum(keep), ax)
                n_cand = jnp.maximum(jax.lax.psum(jnp.sum(cand), ax), 1)
                aux.update({f"{prefix}edges_per_node":
                            n_edges / jnp.maximum(jnp.sum(taus_in), 1),
                            f"{prefix}edge_density": n_edges / n_cand,
                            f"{prefix}temperature": tau_temp})
                return jnp.where(keep, soft, 0.0)

            def grid_of(s_, sp, prefix=""):
                if isinstance(s_, TemporalEdge):
                    return temporal_grid(s_)
                return learned_grid(s_, sp, prefix)

            grid = None
            if isinstance(sel, SparseEdgeChain):
                for idx_s, (s_, sp) in enumerate(
                        zip(sel.selectors, params["edge_selectors"])):
                    g = grid_of(s_, sp, prefix=f"{idx_s}/")
                    grid = g if grid is None else grid + g
            elif sel is not None:
                grid = grid_of(sel, params.get("edge_selectors"))

            # 3. local compaction + append at the shard cursor (1/d work)
            if grid is not None:
                mask = grid > 0
                k = min(t * nb, epl)
                idx, ok, _ = nonzero_padded(mask.reshape(B, t * nb), k)
                ti = jnp.clip(idx // nb, 0, t - 1)
                sj = base + idx % nb
                sinks = jnp.take_along_axis(rows, ti, axis=1)
                vals = jnp.take_along_axis(grid.reshape(B, t * nb), idx,
                                           axis=1)
                vals = jnp.where(ok, grad_preserving_ones(
                    jnp.where(ok, vals, 1.0)), 1.0)
                new_e = jnp.stack([jnp.where(ok, sinks, -1),
                                   jnp.where(ok, sj, -1)], axis=1)
                edges_b, w_b, ne, _ = append_edges(
                    edges_b, w_b, ne, new_e, vals, ok)

            # 4. preprocessor on the local block (1/d)
            if self.preprocessor is not None:
                dirty_b = self.preprocessor(params["preprocessor"], dirty_b)

            # 5. conv stack over shard-local edges
            valid = (edges_b[:, 0, :] >= 0) & (edges_b[:, 1, :] >= 0)
            src_l = jnp.clip(edges_b[:, 1, :] - base, 0, nb - 1)
            wv = jnp.where(valid, w_b, 0.0)
            h = dirty_b
            gi = 0
            for layer in self.layers:
                if hasattr(layer, "init"):
                    p = params["gnn"][gi]
                    msgs = jnp.take_along_axis(h, src_l[..., None], axis=1)
                    msgs = msgs * wv[..., None]
                    if mode == "halo":
                        sink_l = edges_b[:, 0, :] - base
                        sink_l = jnp.where(
                            valid & (sink_l >= 0) & (sink_l < nb + halo),
                            sink_l, nb + halo).astype(jnp.int32)
                        acc = jnp.zeros((B, nb + halo + 1, h.shape[-1]), h.dtype)
                        acc = acc.at[jnp.arange(B)[:, None], sink_l].add(msgs)
                        if halo > 0:
                            perm = [(j, (j + 1) % d) for j in range(d)]
                            tail = jax.lax.ppermute(acc[:, nb:nb + halo],
                                                    ax, perm)
                            agg = acc[:, :nb] + jnp.pad(
                                tail, ((0, 0), (0, nb - halo), (0, 0)))
                        else:
                            agg = acc[:, :nb]
                    else:  # psum fallback: full-width accumulator
                        sink_g = jnp.where(valid, edges_b[:, 0, :],
                                           self.graph_size).astype(jnp.int32)
                        accf = jnp.zeros((B, self.graph_size + 1, h.shape[-1]),
                                         h.dtype)
                        accf = accf.at[jnp.arange(B)[:, None], sink_g].add(msgs)
                        accf = jax.lax.psum(accf[:, :self.graph_size], ax)
                        agg = jax.lax.dynamic_slice_in_dim(accf, base, nb,
                                                           axis=1)
                    h = (layer.lin_rel(p["lin_rel"], agg)
                         + layer.lin_root(p["lin_root"], h))
                    gi += 1
                else:
                    h = layer(h)
                    gi += 1

            # 6. assemble outputs at the new rows (each owned by one shard)
            out_loc = jnp.where(mine, loc, nb).astype(jnp.int32)
            padded = jnp.concatenate(
                [h, jnp.zeros((B, 1, h.shape[-1]), h.dtype)], axis=1)
            mx = jnp.take_along_axis(padded, out_loc[..., None], axis=1)
            mx = jax.lax.psum(jnp.where(mine[..., None], mx, 0.0), ax)
            return (mx, nodes_b, edges_b, w_b, T + taus_in, ne[:, None], aux)

        sharded = shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(P(), P(), P(None, ax, None), P(None, None, ax),
                      P(None, ax), P(), P(None, ax)),
            out_specs=(P(), P(None, ax, None), P(None, None, ax),
                       P(None, ax), P(), P(None, ax), P()),
            check_vma=False,
        )
        mx, nodes, edges, weights, T2, ne, aux = sharded(
            x, taus, state.nodes, state.edges, state.weights, state.t,
            state.num_edges)
        new_state = ShardedSparseState(nodes, edges, weights, T2, ne)
        if return_aux:
            return mx, new_state, aux
        return mx, new_state

    def check_overflow(self, state: ShardedSparseState, taus) -> None:
        """Outside-jit capacity guard (reference sparse_gcm.py:120-121)."""
        import numpy as np

        if np.any(np.asarray(state.t + taus) > self.graph_size):
            raise Exception("Overflow")


from gcm_tpu.core.graph_state import register_reset  # noqa: E402


@register_reset(ShardedSparseState)
def _reset_sharded_sparse(state, mask_for):
    """Episode reset (rollout collectors call reset_where after dones):
    same fills as the replicated SparseGraphState — edge sentinel -1,
    weight fill 1.0, zeroed counters. All leaves are batch-leading, so the
    masked select preserves each leaf's sharding (pointwise)."""
    return ShardedSparseState(
        nodes=jnp.where(mask_for(state.nodes), 0.0, state.nodes),
        edges=jnp.where(mask_for(state.edges), -1, state.edges),
        weights=jnp.where(mask_for(state.weights),
                          jnp.ones_like(state.weights), state.weights),
        t=jnp.where(mask_for(state.t), 0, state.t),
        num_edges=jnp.where(mask_for(state.num_edges), 0, state.num_edges),
    )
