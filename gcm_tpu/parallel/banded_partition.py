"""Node-sharded BandedRingGCM scan — graph memory larger than one chip.

SURVEY.md N6 names the CP analog for graph memory: "ring-style neighbor
exchange over the edge partition" when graph_size outgrows per-chip HBM.
The banded core is the natural vehicle: its aggregation is a set of
hop-shifted rolls over the slot axis, so sharding the node axis N across a
mesh axis turns each roll into ONE ppermute of the `h` boundary rows from
the left ring neighbor — comms is O(B·h·F) per hop per layer, independent
of both N and the number of shards (the same constant-halo property
measured for `spmm_halo`, BASELINE.md scaling section).

The whole trajectory scan runs inside a single shard_map (the lax.scan is
inside, so there is one collective program, not one shard_map per step).
Output parity with the unsharded `BandedRingGCM.scan` is exact (pinned in
tests/test_parallel.py on the virtual mesh).

Layout: nodes [B, N, F] sharded on axis 1; t and params replicated; xs
replicated (every step's observation is a [B, F] broadcast — negligible
next to the node state this exists to shard). The belief extract is a
masked local gather + psum (one [B, F] all-reduce per step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcm_tpu.models.banded_gcm import (BandedRingGCM, BandedScoredState,
                                       BandedState)


def shard_banded_state(state: BandedState, mesh: Mesh, axis: str = "sp"):
    """Place a BandedState with nodes sharded over `axis` (slot dim)."""
    return BandedState(
        nodes=jax.device_put(
            state.nodes, NamedSharding(mesh, P(None, axis, None))),
        t=jax.device_put(state.t, NamedSharding(mesh, P())),
    )


def shard_banded_scored_state(state: BandedScoredState, mesh: Mesh,
                              axis: str = "sp"):
    """Place a BandedScoredState with nodes AND band sharded over `axis`."""
    sh = NamedSharding(mesh, P(None, axis, None))
    return BandedScoredState(
        nodes=jax.device_put(state.nodes, sh),
        band=jax.device_put(state.band, sh),
        t=jax.device_put(state.t, NamedSharding(mesh, P())),
    )


def banded_scan_sharded(model: BandedRingGCM, mesh: Mesh, axis: str = "sp"):
    """Returns scan(params, xs, state) -> (outs [B,T,F], state') with
    state.nodes sharded over `axis`. Forward direction only (the backward
    band would need a right-neighbor halo; add when a workload wants it)."""
    assert model.direction == "forward", "sharded path is forward-only"
    assert all(a == "add" for a in getattr(model, "_aggrs", ("add",))), (
        "sharded scans implement aggr='add' only")
    d = mesh.shape[axis]
    N = model.graph_size
    assert N % d == 0, f"graph_size={N} must divide over {d} shards"
    nb = N // d
    assert max(model.hops) <= nb, "halo (max hop) must fit in one shard"
    hops = model.hops
    perm = [(j, (j + 1) % d) for j in range(d)]  # left neighbor -> me

    def local_scan(params, xs_t, nodes_blk, t0):
        i = jax.lax.axis_index(axis)
        B = nodes_blk.shape[0]
        b_idx = jnp.arange(B)
        slots = i * nb + jnp.arange(nb)  # my global slot indices [nb]

        def hop_masks(t):
            """Local slice of BandedRingGCM._hop_masks (same age algebra)."""
            p = jnp.mod(t, N)
            age = jnp.mod(p[:, None] - slots[None, :], N)  # [B, nb]
            horizon = jnp.minimum(t, N - 1)[:, None]
            alive = age <= horizon
            t_insert = t[:, None] - age
            masks = []
            for h in hops:
                had_pred = jnp.minimum(t_insert, N - 1) >= h
                src_alive = age + h <= horizon
                masks.append((alive & had_pred & src_alive
                              ).astype(nodes_blk.dtype))
            return masks

        def step(carry, x):
            nodes_blk, t = carry
            p = jnp.mod(t, N)
            local_r = p - i * nb
            in_range = (local_r >= 0) & (local_r < nb)
            safe = jnp.clip(local_r, 0, nb - 1)
            cur = nodes_blk[b_idx, safe]
            nodes_blk = nodes_blk.at[b_idx, safe].set(
                jnp.where(in_range[:, None], x.astype(cur.dtype), cur))

            h_feats = nodes_blk
            if model.preprocessor is not None:
                h_feats = model.preprocessor(params["preprocessor"], h_feats)

            masks = hop_masks(t)
            gnn_params = params["gnn"]
            for ci, act in zip(model._conv_idx, model._acts):
                cp = gnn_params[ci]
                agg = jnp.zeros_like(h_feats)
                for h, m in zip(hops, masks):
                    # global roll(h_feats, h)[s] = h_feats[s−h]: my first h
                    # rolled rows live in my LEFT neighbor's last h rows
                    halo = jax.lax.ppermute(h_feats[:, nb - h:, :],
                                            axis, perm)
                    ext = jnp.concatenate([halo, h_feats], axis=1)
                    agg = agg + ext[:, :nb, :] * m[..., None]
                out = (jnp.einsum("bnf,fo->bno", agg,
                                  cp["lin_rel"]["kernel"])
                       + jnp.einsum("bnf,fo->bno", h_feats,
                                    cp["lin_root"]["kernel"]))
                if "bias" in cp["lin_rel"]:
                    out = out + cp["lin_rel"]["bias"]
                if act == "tanh":
                    out = jnp.tanh(out)
                elif act == "relu":
                    out = jnp.maximum(out, 0.0)
                h_feats = out

            mine = h_feats[b_idx, safe] * in_range[:, None]
            mx = jax.lax.psum(mine, axis)
            return (nodes_blk, t + 1), mx

        (nodes_blk, tF), outs = jax.lax.scan(step, (nodes_blk, t0), xs_t)
        return outs, nodes_blk, tF

    sharded = shard_map(
        local_scan, mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None), P()),
        out_specs=(P(), P(None, axis, None), P()),
        check_vma=False,
    )

    def scan(params, xs, state: BandedState):
        xs_t = jnp.swapaxes(xs, 0, 1)  # [T, B, F]
        outs, nodes, t = sharded(params, xs_t, state.nodes, state.t)
        return jnp.swapaxes(outs, 0, 1), BandedState(nodes, t)

    return scan


def banded_scored_scan_sharded(model, mesh: Mesh, axis: str = "sp"):
    """Node-sharded BandedScoredGCM scan — windowed-distance memory larger
    than one chip. Two collectives per step, both O(B·w·F) and independent
    of N and shard count: one ppermute of the left neighbor's last w RAW
    rows (the insert scores the new node against the previous w slots,
    which may straddle the shard boundary), and one ppermute of the last w
    post-preprocessor rows per conv layer (the banded halo). Parity with
    the unsharded scan pinned in tests/test_parallel.py.

    Requires window_size <= graph_size // num_shards (halo fits in one
    neighbor block)."""
    from gcm_tpu.models.banded_gcm import BandedScoredGCM

    assert isinstance(model, BandedScoredGCM), (
        "banded_scored_scan_sharded needs BandedScoredGCM")
    assert all(a == "add" for a in getattr(model, "_aggrs", ("add",))), (
        "sharded scans implement aggr='add' only")
    d = mesh.shape[axis]
    N = model.graph_size
    w = model.window_size
    assert N % d == 0, f"graph_size={N} must divide over {d} shards"
    nb = N // d
    assert w <= nb, "window (halo) must fit in one shard block"
    perm = [(j, (j + 1) % d) for j in range(d)]  # left neighbor -> me

    def local_scan(params, xs_t, nodes_blk, band_blk, t0):
        i = jax.lax.axis_index(axis)
        B = nodes_blk.shape[0]
        b_idx = jnp.arange(B)
        slots = i * nb + jnp.arange(nb)  # my global slot indices [nb]
        ks = jnp.arange(1, w + 1)

        def step(carry, x):
            nodes_blk, band_blk, t = carry
            p = jnp.mod(t, N)
            local_r = p - i * nb
            in_range = (local_r >= 0) & (local_r < nb)
            safe = jnp.clip(local_r, 0, nb - 1)
            cur = nodes_blk[b_idx, safe]
            nodes_blk = nodes_blk.at[b_idx, safe].set(
                jnp.where(in_range[:, None], x.astype(cur.dtype), cur))

            # ---- score the inserted row against the previous w slots ----
            # ext[m] = raw node at global slot (i*nb + m - w) mod N; source
            # slot p-k sits at ext index w + local_r - k (ring ppermute
            # covers both the shard boundary and the mod-N wrap)
            halo_raw = jax.lax.ppermute(nodes_blk[:, nb - w:, :], axis, perm)
            ext_raw = jnp.concatenate([halo_raw, nodes_blk], axis=1)
            src_idx = jnp.clip(w + local_r[:, None] - ks[None, :],
                               0, nb + w - 1)  # [B, w]
            wnodes = jnp.take_along_axis(
                ext_raw, src_idx[..., None], axis=1)  # [B, w, F]
            valid = ks[None, :] <= jnp.minimum(t, N - 1)[:, None]
            row = jnp.zeros((B, w), nodes_blk.dtype)
            if model.distance is not None:
                curr = x
                wn = wnodes
                if model.distance.learned:
                    scale = params["distance"]["dist_param"]
                    curr = curr / scale
                    wn = wn / scale
                dists = model.distance.dist_fn(curr, wn)  # [B, w]
                row = jnp.where(
                    (dists < model.distance.max_distance) & valid, 1.0, row)
            for h in model.hops:
                row = row.at[:, h - 1].set(
                    jnp.where(valid[:, h - 1], 1.0, row[:, h - 1]))
            bcur = band_blk[b_idx, safe]
            band_blk = band_blk.at[b_idx, safe].set(
                jnp.where(in_range[:, None], row.astype(bcur.dtype), bcur))

            # ---- aggregation: w masked rolls via one halo per layer ----
            h_feats = nodes_blk
            if model.preprocessor is not None:
                h_feats = model.preprocessor(params["preprocessor"], h_feats)

            age = jnp.mod(p[:, None] - slots[None, :], N)  # [B, nb]
            horizon = jnp.minimum(t, N - 1)[:, None]
            sink_alive = age <= horizon

            gnn_params = params["gnn"]
            for ci, act in zip(model._conv_idx, model._acts):
                cp = gnn_params[ci]
                halo_h = jax.lax.ppermute(h_feats[:, nb - w:, :], axis, perm)
                ext_h = jnp.concatenate([halo_h, h_feats], axis=1)
                agg = jnp.zeros_like(h_feats)
                for k in range(1, w + 1):
                    src_alive = age + k <= horizon
                    m = (band_blk[:, :, k - 1]
                         * (sink_alive & src_alive).astype(h_feats.dtype))
                    agg = agg + ext_h[:, w - k:w - k + nb, :] * m[..., None]
                out = (jnp.einsum("bnf,fo->bno", agg,
                                  cp["lin_rel"]["kernel"])
                       + jnp.einsum("bnf,fo->bno", h_feats,
                                    cp["lin_root"]["kernel"]))
                if "bias" in cp["lin_rel"]:
                    out = out + cp["lin_rel"]["bias"]
                if act == "tanh":
                    out = jnp.tanh(out)
                elif act == "relu":
                    out = jnp.maximum(out, 0.0)
                h_feats = out

            mine = h_feats[b_idx, safe] * in_range[:, None]
            mx = jax.lax.psum(mine, axis)
            return (nodes_blk, band_blk, t + 1), mx

        (nodes_blk, band_blk, tF), outs = jax.lax.scan(
            step, (nodes_blk, band_blk, t0), xs_t)
        return outs, nodes_blk, band_blk, tF

    sharded = shard_map(
        local_scan, mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None), P(None, axis, None), P()),
        out_specs=(P(), P(None, axis, None), P(None, axis, None), P()),
        check_vma=False,
    )

    def scan(params, xs, state: BandedScoredState):
        xs_t = jnp.swapaxes(xs, 0, 1)  # [T, B, F]
        outs, nodes, band, t = sharded(params, xs_t, state.nodes,
                                       state.band, state.t)
        return jnp.swapaxes(outs, 0, 1), BandedScoredState(nodes, band, t)

    return scan


def clique_scan_sharded(model, mesh: Mesh, axis: str = "sp"):
    """Node-sharded CliqueGCM scan — the DenseEdge (complete-graph) memory
    sharded over a mesh axis. Because every sink's aggregate is the same
    masked sum (clique_gcm.py), the ONLY collective per conv layer is one
    [B, F] psum of the local partial sums — comms O(B·F·L) per step,
    independent of graph_size AND shard count (cheaper still than the
    banded halo's O(B·h·F) ppermute). Parity with the unsharded
    CliqueGCM.scan is pinned in tests/test_parallel.py.

    Layout matches banded_scan_sharded: nodes sharded on the slot axis,
    t/params/xs replicated; use `shard_banded_state` to place the state."""
    from gcm_tpu.models.clique_gcm import CliqueGCM

    assert isinstance(model, CliqueGCM), "clique_scan_sharded needs CliqueGCM"
    assert all(a == "add" for a in getattr(model, "_aggrs", ("add",))), (
        "sharded scans implement aggr='add' only")
    d = mesh.shape[axis]
    N = model.graph_size
    assert N % d == 0, f"graph_size={N} must divide over {d} shards"
    nb = N // d

    def local_scan(params, xs_t, nodes_blk, t0):
        i = jax.lax.axis_index(axis)
        B = nodes_blk.shape[0]
        b_idx = jnp.arange(B)
        slots = i * nb + jnp.arange(nb)  # my global slot indices [nb]

        def step(carry, x):
            nodes_blk, t = carry
            p = jnp.mod(t, N)
            local_r = p - i * nb
            in_range = (local_r >= 0) & (local_r < nb)
            safe = jnp.clip(local_r, 0, nb - 1)
            cur = nodes_blk[b_idx, safe]
            nodes_blk = nodes_blk.at[b_idx, safe].set(
                jnp.where(in_range[:, None], x.astype(cur.dtype), cur))

            h_feats = nodes_blk
            if model.preprocessor is not None:
                h_feats = model.preprocessor(params["preprocessor"], h_feats)

            age = jnp.mod(p[:, None] - slots[None, :], N)  # [B, nb]
            alive = (age <= jnp.minimum(t, N - 1)[:, None]
                     ).astype(h_feats.dtype)

            gnn_params = params["gnn"]
            for ci, act in zip(model._conv_idx, model._acts):
                cp = gnn_params[ci]
                agg = jax.lax.psum(
                    jnp.sum(h_feats * alive[..., None], axis=1), axis)
                out = (jnp.einsum("bnf,fo->bno", h_feats,
                                  cp["lin_root"]["kernel"])
                       + jnp.einsum("bf,fo->bo", agg,
                                    cp["lin_rel"]["kernel"])[:, None, :])
                if "bias" in cp["lin_rel"]:
                    out = out + cp["lin_rel"]["bias"]
                if act == "tanh":
                    out = jnp.tanh(out)
                elif act == "relu":
                    out = jnp.maximum(out, 0.0)
                h_feats = out

            mine = h_feats[b_idx, safe] * in_range[:, None]
            mx = jax.lax.psum(mine, axis)
            return (nodes_blk, t + 1), mx

        (nodes_blk, tF), outs = jax.lax.scan(step, (nodes_blk, t0), xs_t)
        return outs, nodes_blk, tF

    sharded = shard_map(
        local_scan, mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None), P()),
        out_specs=(P(), P(None, axis, None), P()),
        check_vma=False,
    )

    def scan(params, xs, state: BandedState):
        xs_t = jnp.swapaxes(xs, 0, 1)  # [T, B, F]
        outs, nodes, t = sharded(params, xs_t, state.nodes, state.t)
        return jnp.swapaxes(outs, 0, 1), BandedState(nodes, t)

    return scan
