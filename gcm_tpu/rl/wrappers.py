"""RL policy wrappers — the adapter layer over the memory cores.

TPU-native equivalent of RayDenseGCM / RaySparseGCM (reference
src/gcm/ray_gcm.py:21-212, src/gcm/ray_sparse_gcm.py:19-213): a config-dict
driven actor-critic wrapper with obs preprocessor, optional prev-action
one-hot concat, the GCM memory core, and logit/value heads (normc 0.01 init,
matching rllib's SlimFC defaults). The reference's per-timestep Python loop
(ray_gcm.py:200-202) is the scanned recurrence; state crosses the trainer
boundary as fixed-shape pytrees (the packed edge-list form is native here, so
no pack/unpack is needed — but utils.packing provides the codec for external
frameworks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.models.positional import PositionalEncoding
from gcm_tpu.models.sparse_gcm import SparseGCM
from gcm_tpu.nn.dense_conv import DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import Linear, MLP
from gcm_tpu.nn.sparse_conv import GraphConv, SparseGNN

# reference ray_gcm.py:22-79 — the de-facto config system, key-validated
DENSE_DEFAULT_CONFIG = {
    # "ring" = RingDenseGCM (default: identical outputs to DenseGCM with
    # O(N) steady-state eviction, measured 1.43x faster per step and ~2x
    # faster full A2C updates; soak round 2: dense/ring/banded reach
    # identical returns on recall+tmaze on TPU). "dense" = roll-based
    # DenseGCM; "banded" = BandedRingGCM (temporal-only fast path);
    # "clique" = CliqueGCM (DenseEdge fully-connected-past fast path);
    # "banded_scored" = BandedScoredGCM (windowed-distance fast path);
    # "auto" = pick the fastest parity core the selector structure supports
    # (banded/clique/banded_scored per the BASELINE.md measurements, else
    # ring).
    "core": "ring",
    "graph_size": 32,
    "gnn_input_size": 64,
    "gnn_output_size": 64,
    "gnn": None,  # built from sizes when None (2-layer conv + tanh)
    "edge_selectors": None,
    "aux_edge_selectors": None,
    "pooled": False,
    "edge_weights": False,
    "preprocessor": None,
    "preprocessor_frozen": False,
    "use_prev_action": False,
    # None | 'add' | 'cat' | 'relative' ('relative' wires the reference's
    # RelativePositionalEncoding, gcm.py:56-89, which the reference imports
    # but never exposes in a config path; dense core only)
    "positional_encoding": None,
    "positional_encoding_dim": 4,
    # how core='auto' weighs its measured crossovers when stepwise and
    # whole-trajectory modes disagree (the reference's per-step rollout vs
    # whole-window training split, ray_gcm.py:200-202 vs
    # ray_sparse_gcm.py:201-213):
    #   'rl'               — collection steps + training replay (default)
    #   'inference'        — stepwise forward only
    #   'trajectory_train' — whole-trajectory window training dominates
    # Only the windowed-distance rule currently differs by usage
    # (BASELINE.md round-5 structured re-pin).
    "usage": "rl",
}

SPARSE_DEFAULT_CONFIG = {
    **DENSE_DEFAULT_CONFIG,
    # mesh: a jax.sharding.Mesh routes the memory core to ShardedSparseGCM
    # (parallel/sharded_sparse.py): the WHOLE step — node buffer, selector
    # grid, compaction, edge append, conv — runs 1/d per device, for graph
    # memories larger than one chip. Requires a supported selector
    # (TemporalEdge / deterministic LearnedEdge), no aux/PE/max_hops, and
    # no stochastic keys or dones at call time; graph_size and max_edges
    # must divide the mesh axis.
    "mesh": None,
    "mesh_axis": "dp",
    "max_edges": 512,
    "max_hops": None,
    # gather-compact the k-hop subgraph to this many nodes (the reference
    # k_hop_subgraph's work reduction; requires max_hops; overflow counts
    # surface as aux["hop_overflow"])
    "hop_cap": None,
    # GNN aggregation backend: "auto" (dispatched SpMM) | "slots" (the
    # degree-bounded sink-slot kernel, measured 4.3x on temporal graphs —
    # BASELINE.md). slot_k = per-(sink, src-window) degree bound; None
    # derives it from the selector's structure (TemporalEdge: len(hops);
    # sparse LearnedEdge: num_edge_samples).
    "aggregation": "auto",
    "slot_k": None,
    # grid-free edge emission: "auto" (selector's measured crossover gate) |
    # True (force on) | False (force off)
    "emit": "auto",
}


class _FrozenMLP:
    """Wraps a module so its params get stop_gradient on apply
    (preprocessor_frozen, ray_gcm.py:127-130)."""

    def __init__(self, inner):
        self.inner = inner

    def init(self, key):
        return self.inner.init(key)

    def __call__(self, params, x):
        frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
        return self.inner(frozen, x)


def train_remat_for(core, T: int, dones=None, key=None):
    """Measured training-side remat choice for a whole-trajectory update:
    chunked checkpointing (scan remat=K) on the ring core — +50-85% fwd+bwd
    across 3 TPU passes (MEASURE_r4) because the per-step [B,N,N] carry
    residual is saved only at chunk boundaries. False elsewhere: dense
    measured a wash; the fast cores train through window(). K = largest
    divisor of T up to config.TRAIN_REMAT_CHUNK (chunking needs T % K == 0;
    forward stays bit-identical for any K).

    With config.RING_REVERSE_BWD and a reversible-capable call (no dones/
    key/edge_weights), returns 'reverse' instead: the r5 reversible
    backward reconstructs the carry in the reverse scan and saves NO
    per-step [B,N,N] residual (models/ring_reversible.py)."""
    from gcm_tpu import config
    from gcm_tpu.models.dense_gcm import DenseGCM
    from gcm_tpu.models.ring_gcm import RingDenseGCM

    if isinstance(core, DenseGCM):
        if config.DENSE_REVERSE_BWD:
            from gcm_tpu.models.dense_reversible import (
                dense_reversible_supported)

            if dense_reversible_supported(core, key=key, dones=dones):
                return "reverse"
        return False
    if not isinstance(core, RingDenseGCM):
        return False
    if config.RING_REVERSE_BWD:
        from gcm_tpu.models.ring_reversible import reversible_supported

        if reversible_supported(core, key=key, dones=dones):
            return "reverse"
    K = min(config.TRAIN_REMAT_CHUNK, T)
    while K > 1 and T % K:
        K -= 1
    # K == T would be one chunk = whole-trajectory remat (a different,
    # unmeasured trade); chunking needs at least 2 chunks to save residuals
    return K if 4 <= K < T else False


def _derive_slot_k(sel):
    """Structural per-(sink, src-window) degree bound for the slot
    aggregation, when the selector's construction guarantees one:
    TemporalEdge emits ≤ len(hops) edges per sink; the learned selector's
    cutoff keeps ≤ num_edge_samples per sink (probabilities sum to 1)."""
    from gcm_tpu.edges.sparse_learned import LearnedEdge as SparseLearnedEdge
    from gcm_tpu.edges.sparse_temporal import TemporalEdge

    if isinstance(sel, TemporalEdge):
        return len(sel.hops)
    if isinstance(sel, SparseLearnedEdge):
        return sel.num_edge_samples
    return None


def _build_preprocessor(input_dim, cfg):
    pp = Linear(input_dim, cfg["gnn_input_size"])
    user = cfg["preprocessor"]
    if user is None:
        return MLP([pp])
    if cfg["preprocessor_frozen"]:
        user = _FrozenMLP(user)
    return MLP([pp, user])


class GCMActorCritic:
    """Dense-core actor-critic (reference RayDenseGCM)."""

    CONFIG = DENSE_DEFAULT_CONFIG

    def __init__(self, obs_dim: int, num_actions: int, num_outputs: int,
                 **cfg):
        for k in cfg:
            assert k in self.CONFIG, f"Invalid config key {k}"
        self.cfg = dict(self.CONFIG, **cfg)
        self.obs_dim = obs_dim
        self.num_actions = num_actions
        self.num_outputs = num_outputs
        self.input_dim = obs_dim + (num_actions if self.cfg["use_prev_action"]
                                    else 0)
        self.core = self._build_core()
        h = self.cfg["gnn_output_size"]
        self.logit_branch = Linear(h, num_outputs, init=("normc", 0.01))
        self.value_branch = Linear(h, 1, init=("normc", 0.01))

    def _gnn(self):
        if self.cfg["gnn"] is not None:
            return self.cfg["gnn"]
        gi, go = self.cfg["gnn_input_size"], self.cfg["gnn_output_size"]
        return DenseGNN([DenseGraphConv(gi, go), jnp.tanh,
                         DenseGraphConv(go, go), jnp.tanh],
                        use_weights=self.cfg["edge_weights"])

    def _resolve_auto_core(self):
        """core='auto': pick the fastest parity core the selector structure
        provably supports (dispatch-by-measurement: each rule below is
        backed by a BASELINE.md measurement), else 'dense'. Conservative —
        any aux machinery or custom GNN falls back to the general core.
        The general-core fallback is 'dense' (not 'ring') since round 4's
        fused dense step: head-to-head at per-core default unrolls the
        dense core wins or ties every family — temporal fwd 4.0 vs 3.9M /
        train 1.38 vs 1.09M, euclid fwd wash / train 1.20 vs 0.98M,
        learned fwd 2.5 vs 2.1M / train wash (MEASURE_r4/head2head2.log;
        the bench pass agrees on all three)."""
        cfg = self.cfg
        if (cfg["aux_edge_selectors"] or cfg["positional_encoding"]
                or cfg["pooled"] or cfg["edge_weights"]):
            return "dense"
        if cfg["gnn"] is not None:
            # custom GNNs qualify when they fit the fast cores' analytic
            # pattern (DenseGraphConv add/mean + tanh/relu)
            from gcm_tpu.nn.dense_conv import plan_conv_stack

            if not (isinstance(cfg["gnn"], DenseGNN) and plan_conv_stack(
                    cfg["gnn"].layers, allowed_aggrs=("add", "mean"))):
                return "dense"
        sel = cfg["edge_selectors"]
        from gcm_tpu.edges.chain import EdgeChain
        from gcm_tpu.edges.dense import DenseEdge as DenseEdgeSel
        from gcm_tpu.edges.distance import Distance
        from gcm_tpu.edges.temporal import TemporalBackedge

        if isinstance(sel, TemporalBackedge) and not sel.learned:
            # round-5 same-pass re-pin vs the FUSED dense core
            # (MEASURE_r5/structured_n128/n256): banded wins stepwise
            # forward at both N (5.66M vs 3.63M / 3.90M vs 1.45M) and its
            # window-train is 15-64x the dense scan train (21-40M)
            return "banded"
        if isinstance(sel, DenseEdgeSel):
            return "clique"  # O(N·F·F') step vs O(N²·F)
        dist = None
        if isinstance(sel, Distance):
            dist = sel
        elif (isinstance(sel, EdgeChain) and len(sel.selectors) == 2
              and isinstance(sel.selectors[0], TemporalBackedge)
              and not sel.selectors[0].learned
              and sel.selectors[0].direction == "forward"
              and isinstance(sel.selectors[1], Distance)):
            dist = sel.selectors[1]
        if (dist is not None and dist.window is not None
                and not getattr(dist, "bidirectional", False)
                # round-5 same-pass re-pin KILLED the old "graph_size >=
                # 256" rule: post-fusion the dense core beats the scored
                # band 8-13x stepwise fwd and 5-6x scan-train at every
                # measured N (128/256/512, MEASURE_r5/structured_n*). The
                # scored band's one remaining win is whole-trajectory
                # WINDOW training (1.6-3.2x the dense scan train) — an RL
                # update that also collects stepwise loses more on
                # collection than the window saves, so only the
                # trajectory-train usage routes here.
                and cfg["usage"] == "trajectory_train"):
            return "banded_scored"
        return "dense"

    def _build_core(self):
        if self.cfg["core"] == "auto":
            self.cfg["core"] = self._resolve_auto_core()
        pe = None
        if self.cfg["positional_encoding"] == "relative":
            from gcm_tpu.models.positional import RelativePositionalEncoding

            assert self.cfg["core"] == "dense", (
                "positional_encoding='relative' rolls the table by logical "
                "position — supported on the dense core only")
            pe = RelativePositionalEncoding(
                max_len=self.cfg["graph_size"],
                feat_dim=self.cfg["gnn_input_size"],
            )
        elif self.cfg["positional_encoding"]:
            pe = PositionalEncoding(
                max_len=self.cfg["graph_size"],
                mode=self.cfg["positional_encoding"],
                cat_dim=self.cfg["positional_encoding_dim"],
                feat_dim=self.cfg["gnn_input_size"],
            )
        if self.cfg["core"] == "banded_scored":
            # windowed-distance fast path (BASELINE.md: wins at large
            # graph_size; exact DenseGCM parity)
            from gcm_tpu.edges.chain import EdgeChain
            from gcm_tpu.edges.distance import Distance
            from gcm_tpu.edges.temporal import TemporalBackedge
            from gcm_tpu.models.banded_gcm import BandedScoredGCM

            sel = self.cfg["edge_selectors"]
            hops = ()
            if isinstance(sel, EdgeChain):
                assert (len(sel.selectors) == 2
                        and isinstance(sel.selectors[0], TemporalBackedge)
                        and isinstance(sel.selectors[1], Distance)), (
                    "core='banded_scored' accepts a Distance selector or an "
                    "EdgeChain([TemporalBackedge, Distance])")
                hops = tuple(sel.selectors[0].hops)
                dist = sel.selectors[1]
            else:
                assert isinstance(sel, Distance), (
                    "core='banded_scored' needs a Distance edge selector "
                    "(with window=) — got " + type(sel).__name__)
                dist = sel
            assert not (self.cfg["aux_edge_selectors"]
                        or self.cfg["positional_encoding"]
                        or self.cfg["pooled"] or self.cfg["edge_weights"]), (
                "core='banded_scored' supports only the plain "
                "distance(+temporal) configuration")
            return BandedScoredGCM(
                self._gnn(),
                distance=dist,
                preprocessor=_build_preprocessor(self.input_dim, self.cfg),
                hops=hops,
                graph_size=self.cfg["graph_size"],
            )
        if self.cfg["core"] == "clique":
            # fully-connected-past fast path (DenseEdge): implicit complete-
            # graph adjacency, O(N·F·F') per step vs DenseGCM's O(N²·F),
            # scan-free window() in whole-trajectory mode
            from gcm_tpu.edges.dense import DenseEdge as DenseEdgeSel
            from gcm_tpu.models.clique_gcm import CliqueGCM

            sel = self.cfg["edge_selectors"]
            assert sel is None or isinstance(sel, DenseEdgeSel), (
                "core='clique' implements the DenseEdge (fully-connected-"
                "past) graph — pass edge_selectors=DenseEdge() or None")
            assert not (self.cfg["aux_edge_selectors"]
                        or self.cfg["positional_encoding"]
                        or self.cfg["pooled"] or self.cfg["edge_weights"]), (
                "core='clique' supports only the plain DenseEdge "
                "configuration")
            return CliqueGCM(
                self._gnn(),
                preprocessor=_build_preprocessor(self.input_dim, self.cfg),
                graph_size=self.cfg["graph_size"],
            )
        if self.cfg["core"] == "banded":
            # temporal fast path: requires a deterministic forward
            # TemporalBackedge selector and no aux/PE machinery
            from gcm_tpu.edges.temporal import TemporalBackedge
            from gcm_tpu.models.banded_gcm import BandedRingGCM

            sel = self.cfg["edge_selectors"]
            assert isinstance(sel, TemporalBackedge) and not sel.learned, (
                "core='banded' needs a deterministic TemporalBackedge "
                "selector")
            assert not (self.cfg["aux_edge_selectors"]
                        or self.cfg["positional_encoding"]
                        or self.cfg["pooled"] or self.cfg["edge_weights"]), (
                "core='banded' supports only the plain temporal configuration")
            return BandedRingGCM(
                self._gnn(),
                preprocessor=_build_preprocessor(self.input_dim, self.cfg),
                hops=sel.hops,
                graph_size=self.cfg["graph_size"],
                direction=sel.direction,
            )
        if self.cfg["core"] == "ring":
            from gcm_tpu.models.ring_gcm import RingDenseGCM

            core_cls = RingDenseGCM
        else:
            core_cls = DenseGCM
        return core_cls(
            gnn=self._gnn(),
            preprocessor=_build_preprocessor(self.input_dim, self.cfg),
            edge_selectors=self.cfg["edge_selectors"],
            aux_edge_selectors=self.cfg["aux_edge_selectors"],
            graph_size=self.cfg["graph_size"],
            pooled=self.cfg["pooled"],
            positional_encoder=pe,
            edge_weights=self.cfg["edge_weights"],
        )

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "core": self.core.init(k1),
            "logit": self.logit_branch.init(k2),
            "value": self.value_branch.init(k3),
        }

    def initial_state(self, B: int, dtype=jnp.float32):
        return self.core.initial_state(B, self.input_dim, dtype=dtype)

    def _concat_prev_action(self, obs, prev_actions):
        if not self.cfg["use_prev_action"]:
            return obs
        onehot = jax.nn.one_hot(prev_actions, self.num_actions, dtype=obs.dtype)
        return jnp.concatenate([obs, onehot], axis=-1)

    def step(self, params, obs, state, prev_action=None, key=None):
        """One timestep: obs [B, obs_dim] -> (logits [B, A], value [B], state)."""
        x = self._concat_prev_action(
            obs, prev_action if prev_action is not None
            else jnp.zeros(obs.shape[:1], jnp.int32))
        belief, state = self.core(params["core"], x, state, key=key)
        logits = self.logit_branch(params["logit"], belief)
        value = self.value_branch(params["value"], belief)[..., 0]
        return logits, value, state

    def __call__(self, params, obs_seq, state, prev_actions=None, key=None,
                 dones=None, unroll=None, remat=False, train=False):
        """Whole trajectory: obs_seq [B, T, obs_dim] ->
        (logits [B, T, A], values [B, T], state).

        dones: optional [B, T] episode terminations — resets the memory of
        finished episodes inside the scan, so training-time replay matches
        collect-time beliefs for rollouts with mid-window episode ends (the
        reference adapter's rllib seq_lens semantics, ray_gcm.py:188-202).

        unroll: lax.scan unroll override for the scan path (window path
        ignores it). Trainers pass the measured training default — the
        fused ring core prefers unroll=1 forward but unroll=4 under grad
        (MEASURE_r4/state_churn2: 1.28M vs 1.09M fwd+bwd).

        train: True when this call sits under jax.grad (trainers set it) —
        the window-vs-scan gates are MODE-dependent (the reference's own
        per-step rollout vs whole-window training split, ray_gcm.py:200-202
        vs ray_sparse_gcm.py:201-213): the ring window's training crossover
        (N=512) comes earlier than its forward one (N=1024) because the
        scan backward saves a [B,N,N] carry residual per step
        (BASELINE.md round-4b ring_window rows)."""
        B, T, _ = obs_seq.shape
        x = self._concat_prev_action(
            obs_seq, prev_actions if prev_actions is not None
            else jnp.zeros((B, T), jnp.int32))
        use_window = (key is None
                      and getattr(self.core, "window", None) is not None
                      and getattr(self.core, "direction", "forward")
                      == "forward")
        if use_window and hasattr(self.core, "window_profitable"):
            # measured per-core/backend/mode dispatch (BASELINE.md round 3:
            # the clique window LOSES to its scan on TPU while winning on
            # CPU; the banded window wins everywhere; the ring window wins
            # above its measured N crossovers, earlier under grad)
            use_window = self.core.window_profitable(
                mode="train" if train else "forward")
        if use_window and hasattr(self.core, "window_applicable"):
            # structural pre-check (ring core: dones / unsupported selector
            # structures must take the scan path WITH the caller's
            # unroll/remat, not window()'s bare internal fallback)
            use_window = self.core.window_applicable(dones=dones)
        if use_window:
            # fast cores (banded/clique): scan-free whole-trajectory
            # forward, output-identical to scan (bitwise for the banded
            # stencils, test_banded_gcm.py::TestWindowParity; within float-
            # reassociation ULPs for the clique, test_clique_gcm.py) and
            # measured faster where dispatched — the training-side win of
            # these designs
            beliefs, state = self.core.window(params["core"], x, state,
                                              dones=dones)
        else:
            beliefs, state = self.core.scan(params["core"], x, state,
                                            key=key, dones=dones,
                                            unroll=unroll, remat=remat)
        logits = self.logit_branch(params["logit"], beliefs)
        values = self.value_branch(params["value"], beliefs)[..., 0]
        return logits, values, state


class SparseGCMActorCritic(GCMActorCritic):
    """Sparse-core actor-critic (reference RaySparseGCM): the whole window is
    processed in ONE time-batched SparseGCM call (ray_sparse_gcm.py:201-213),
    no per-step loop."""

    CONFIG = SPARSE_DEFAULT_CONFIG

    def _gnn(self):
        if self.cfg["gnn"] is not None:
            return self.cfg["gnn"]
        gi, go = self.cfg["gnn_input_size"], self.cfg["gnn_output_size"]
        return SparseGNN([GraphConv(gi, go), jnp.tanh,
                          GraphConv(go, go), jnp.tanh])

    def _build_core(self):
        if self.cfg["mesh"] is not None:
            from gcm_tpu.parallel.sharded_sparse import ShardedSparseGCM

            assert not (self.cfg["aux_edge_selectors"]
                        or self.cfg["positional_encoding"]
                        or self.cfg["max_hops"] or self.cfg["pooled"]
                        or self.cfg["edge_weights"]
                        or self.cfg["aggregation"] == "slots"), (
                "mesh= (end-to-end sharded core) supports only the plain "
                "selector configuration — see ShardedSparseGCM")
            gnn = self._gnn()
            return ShardedSparseGCM(
                gnn.layers, self.cfg["mesh"], axis=self.cfg["mesh_axis"],
                preprocessor=_build_preprocessor(self.input_dim, self.cfg),
                edge_selectors=self.cfg["edge_selectors"],
                graph_size=self.cfg["graph_size"],
                max_edges=self.cfg["max_edges"])
        pe = None
        if self.cfg["positional_encoding"]:
            pe = PositionalEncoding(
                max_len=self.cfg["graph_size"],
                mode=self.cfg["positional_encoding"],
                cat_dim=self.cfg["positional_encoding_dim"],
                feat_dim=self.cfg["gnn_input_size"],
            )
        slot_k = self.cfg["slot_k"]
        if self.cfg["aggregation"] == "slots" and slot_k is None:
            # aux selectors add edges to the same sinks, so a bound derived
            # from the primary selector alone would under-count
            if self.cfg["aux_edge_selectors"] is None:
                slot_k = _derive_slot_k(self.cfg["edge_selectors"])
            assert slot_k is not None, (
                "aggregation='slots': slot_k could not be derived from the "
                "edge selector — pass slot_k explicitly")
        return SparseGCM(
            gnn=self._gnn(),
            preprocessor=_build_preprocessor(self.input_dim, self.cfg),
            edge_selectors=self.cfg["edge_selectors"],
            aux_edge_selectors=self.cfg["aux_edge_selectors"],
            graph_size=self.cfg["graph_size"],
            max_edges=self.cfg["max_edges"],
            max_hops=self.cfg["max_hops"],
            hop_cap=self.cfg["hop_cap"],
            positional_encoder=pe,
            aggregation=self.cfg["aggregation"],
            slot_k=slot_k,
            emit=self.cfg["emit"],
        )

    def step(self, params, obs, state, prev_action=None, key=None):
        logits, values, state = self.__call__(
            params, obs[:, None, :], state,
            None if prev_action is None else prev_action[:, None], key=key)
        return logits[:, 0], values[:, 0], state

    def __call__(self, params, obs_seq, state, prev_actions=None, key=None,
                 taus=None, dones=None, unroll=None, remat=False,
                 train=False):
        """dones: optional [B, T] episode terminations — restricts edges and
        positional encoding to within-episode pairs in the single whole-window
        SparseGCM call (reference ray_sparse_gcm.py:195-200 seq_lens
        semantics). unroll/train are accepted for trainer-signature
        compatibility and ignored: the sparse core has no per-step scan to
        unroll (one time-batched call in both modes)."""
        del unroll, remat, train
        B, T, _ = obs_seq.shape
        x = self._concat_prev_action(
            obs_seq, prev_actions if prev_actions is not None
            else jnp.zeros((B, T), jnp.int32))
        if taus is None:
            taus = jnp.full((B,), T, jnp.int32)
        beliefs, state = self.core(params["core"], x, taus, state, key=key,
                                   dones=dones)
        logits = self.logit_branch(params["logit"], beliefs)
        values = self.value_branch(params["value"], beliefs)[..., 0]
        return logits, values, state
