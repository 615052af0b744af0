"""Batched streaming inference with per-session recurrent graph memory.

The reference serves its memory models through rllib policy workers (one
recurrent state per env, ray_gcm.py:173-212); a production TPU serving
process wants the same thing for request streams: each client session owns
a persistent graph memory, requests arrive in arbitrary interleavings, and
the chip should always step ONE fixed-shape batch (XLA static shapes; a
masked no-op row costs the same as a live one and compiles once).

`SessionServer` keeps a fixed `capacity`-row state pool resident on device:

- requests are (session_id, obs) pairs; unknown ids are allocated a free
  row with freshly-zeroed memory (LRU-evicting an idle session when full),
- one jitted masked step advances exactly the rows with a request this
  call (inactive rows' state is passed through untouched),
- `end_session` frees a row immediately.

The pool never changes shape, so the jitted step compiles once per
(capacity, obs_dim) and every call costs the same regardless of how many
sessions are live.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.core.graph_state import reset_where


class SessionServer:
    def __init__(self, model, params, capacity: int, obs_dim: int,
                 dtype=jnp.float32, step_fn=None, initial_state=None,
                 mesh=None, axis: str = "dp"):
        """model/params back the server directly; alternatively pass
        step_fn(params, obs, state) -> (belief, state) plus an
        `initial_state` pytree (see `from_step`) and `model` may be None —
        the artifact-serving mode, where the step came from a deserialized
        jax.export blob and no model-building Python exists in the
        process.

        mesh: optional jax.sharding.Mesh — shards the session pool's
        capacity axis over `axis`, so total live-session state scales with
        the number of chips instead of one chip's HBM (sessions never
        interact, so the masked step needs ZERO collectives; GSPMD keeps
        every row's graph wholly on its shard). The axis size must divide
        capacity. Bookkeeping stays host-side and identical; outputs are
        parity-tested against the unsharded server on the virtual mesh."""
        self.model = model
        self.params = params
        self.capacity = capacity
        self.obs_dim = obs_dim
        if initial_state is not None:
            self.state = initial_state
        else:
            self.state = model.initial_state(capacity, obs_dim, dtype=dtype)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_shard = mesh.shape[axis]
            assert capacity % n_shard == 0, (
                f"mesh axis '{axis}' size {n_shard} must divide "
                f"capacity {capacity}")

            def shard(a):
                if a.ndim == 0 or a.shape[0] != capacity:
                    spec = P()
                else:
                    spec = P(axis, *([None] * (a.ndim - 1)))
                return jax.device_put(a, NamedSharding(mesh, spec))

            self.state = jax.tree_util.tree_map(shard, self.state)
            self._place = shard
        else:
            self._place = jnp.asarray
        model_step = step_fn if step_fn is not None else (
            lambda p, x, s: model(p, x, s))
        self._row_of: dict = {}          # session_id -> row
        self._free = list(range(capacity - 1, -1, -1))  # pop() -> row 0 first
        self._clock = itertools.count()
        self._last_used: dict = {}       # session_id -> clock tick
        # observability counters (returned by .stats; the serving analog of
        # the selector aux dicts — production monitors eviction pressure)
        self._counters = {"ticks": 0, "requests": 0, "allocations": 0,
                          "evictions": 0}

        def masked_step(params, obs, state, active):
            beliefs, new_state = model_step(params, obs, state)

            def merge(n, o):
                # leaves without a per-session leading axis (e.g. the
                # size-0 placeholder weights) pass through unchanged —
                # same guard as graph_state.reset_where
                if n.ndim == 0 or n.shape[0] != capacity:
                    return n
                m = active.reshape((-1,) + (1,) * (n.ndim - 1))
                return jnp.where(m, n, o)

            merged = jax.tree_util.tree_map(merge, new_state, state)
            return beliefs, merged

        # Donate the pool: the server always adopts the returned state and
        # never re-reads the previous buffer (snapshot() copies to host), so
        # XLA may update the [capacity, N, ...] pool in place — halves the
        # pool's HBM high-water and lets the masked merge alias its output.
        # Backends that cannot donate just ignore the hint.
        self._step = jax.jit(masked_step, donate_argnums=(2,))
        self._reset_rows = jax.jit(reset_where, donate_argnums=(0,))

    @classmethod
    def from_policy(cls, policy, params, capacity: int):
        """Serve a full actor-critic policy (rl.wrappers.GCMActorCritic):
        each step returns {"logits": [A], "value": scalar} per session —
        the online-inference role of the reference's rllib policy server
        (ray_gcm.py:173-212)."""

        assert not policy.cfg.get("use_prev_action", False), (
            "serving tracks no per-session action history; build the "
            "policy with use_prev_action=False (or extend requests to "
            "carry the previous action)")

        def step_fn(p, obs, state):
            logits, value, state = policy.step(p, obs, state)
            return {"logits": logits, "value": value}, state

        return cls(None, params, capacity, policy.obs_dim,
                   step_fn=step_fn,
                   initial_state=policy.initial_state(capacity))

    @classmethod
    def from_step(cls, step_fn, initial_state, params, obs_dim: int):
        """Build a server around a bare step callable — e.g. one returned
        by serve.export.load_step(blob) — and the matching capacity-sized
        initial state pytree. The serving process needs no model code."""
        capacity = initial_state[0].shape[0]
        return cls(None, params, capacity, obs_dim,
                   step_fn=step_fn, initial_state=initial_state)

    # -- row management ------------------------------------------------------
    def _allocate(self, sid):
        """Assign a free row (LRU-evicting if full). The caller wipes the
        row's memory — step() batches all of a tick's new rows into ONE
        masked reset (a per-allocation jitted reset measured 6× slower on
        the all-new-sessions churn path, benchmarks/serve_latency.py)."""
        if not self._free:
            # evict the least-recently-used session that holds a row
            # (requesters are recency-bumped before allocation, so a session
            # in the current batch is never the victim)
            victim = min((s for s in self._last_used if s in self._row_of),
                         key=self._last_used.get)
            self.end_session(victim)
            self._counters["evictions"] += 1
        row = self._free.pop()
        self._row_of[sid] = row
        self._counters["allocations"] += 1
        return row

    def end_session(self, sid) -> None:
        """Free a session's row (its memory is wiped on reuse)."""
        row = self._row_of.pop(sid, None)
        self._last_used.pop(sid, None)
        if row is not None:
            self._free.append(row)

    @property
    def num_active(self) -> int:
        return len(self._row_of)

    @property
    def stats(self) -> dict:
        """Lifetime counters + pool occupancy. `evictions` rising means
        capacity pressure (sessions losing memory before their streams
        end) — resize the pool or shard it over a mesh."""
        return {**self._counters, "active": len(self._row_of),
                "capacity": self.capacity}

    # -- failover ------------------------------------------------------------
    def snapshot(self) -> dict:
        """Serializable server state: the device pool as host arrays plus
        the session bookkeeping. The reference designs its recurrent state
        to be externally owned and shipped between workers (fixed-shape
        tensors + pack/unpack codec, ray_gcm.py:156-167 / util.py:323-382);
        this is the serving-process version — save it with any pytree
        checkpointer (train.checkpoint works) and `restore` into a fresh
        process. Sessions continue bit-exactly (tested)."""
        return {
            "state": jax.tree_util.tree_map(np.asarray, self.state),
            "row_of": dict(self._row_of),
            "last_used": dict(self._last_used),
            "free": list(self._free),
            "clock": next(self._clock),  # consumes one tick; monotonic
        }

    def restore(self, snap: dict) -> None:
        """Adopt a snapshot() from another (identically-built) server.
        The pool is re-placed under THIS server's sharding (a snapshot from
        an unsharded server restores fine onto a mesh one and vice versa)."""
        state = jax.tree_util.tree_map(
            lambda a: self._place(jnp.asarray(a)), snap["state"])
        assert jax.tree_util.tree_structure(state) == \
            jax.tree_util.tree_structure(self.state), (
            "snapshot state pytree does not match this server's model")
        self.state = state
        self._row_of = dict(snap["row_of"])
        self._last_used = dict(snap["last_used"])
        self._free = list(snap["free"])
        self._clock = itertools.count(snap["clock"])

    # -- inference -----------------------------------------------------------
    def step(self, requests: dict) -> dict:
        """requests: {session_id: obs [obs_dim] array-like}. Steps every
        requesting session's memory one tick in a single device call and
        returns {session_id: belief}. Sessions not in `requests` are
        untouched."""
        if not requests:
            return {}
        assert len(requests) <= self.capacity, (
            f"{len(requests)} requests > capacity {self.capacity}")
        # bump recency for every requester FIRST so a session in this very
        # batch can never be the LRU-eviction victim of another's allocation
        for sid in requests:
            self._last_used[sid] = next(self._clock)
        self._counters["ticks"] += 1
        self._counters["requests"] += len(requests)
        rows, sids, new_rows = [], [], []
        for sid in requests:
            row = self._row_of.get(sid)
            if row is None:
                row = self._allocate(sid)
                new_rows.append(row)
            rows.append(row)
            sids.append(sid)
        if new_rows:
            # fresh memory for every newly-allocated row, in one device call
            mask = np.zeros((self.capacity,), bool)
            mask[new_rows] = True
            self.state = self._reset_rows(self.state, self._place(mask))

        obs = np.zeros((self.capacity, self.obs_dim), np.float32)
        active = np.zeros((self.capacity,), bool)
        for sid, row in zip(sids, rows):
            obs[row] = np.asarray(requests[sid], np.float32)
            active[row] = True

        # _place lands per-tick inputs directly under the pool's sharding
        # (on a mesh server jnp.asarray would put them whole on the default
        # device and force a reshard inside every jitted call)
        out, self.state = self._step(self.params, self._place(obs),
                                     self.state, self._place(active))
        # out may be any pytree with a leading capacity axis (a belief
        # array, or e.g. {"logits": ..., "value": ...} from a policy step)
        out = jax.tree_util.tree_map(np.asarray, out)
        return {sid: jax.tree_util.tree_map(lambda a: a[row], out)
                for sid, row in zip(sids, rows)}
