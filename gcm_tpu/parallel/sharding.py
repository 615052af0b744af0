"""Sharding rules for gcm_tpu pytrees.

Parameter sharding (tp): Linear kernels are [in, out]; conv layers alternate
column-parallel (shard out) and row-parallel (shard in) like Megatron so the
activation stays sharded across the pair with one psum — expressed entirely
through PartitionSpecs; XLA GSPMD inserts the collectives.

State sharding (dp): every array in a graph state has leading batch dim →
P('dp', ...). This is the natural axis of the model family: memory graphs are
per-batch-element and never interact (SURVEY.md §2 N6).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _kernel_spec(path: str, arr, alt: int) -> P:
    """alt switches col-parallel (shard out dim) / row-parallel (shard in)."""
    if arr.ndim == 2:
        return P(None, "tp") if alt % 2 == 0 else P("tp", None)
    if arr.ndim == 1:
        return P("tp") if alt % 2 == 0 else P(None)
    return P()


def param_specs(params) -> object:
    """PartitionSpec pytree for a gcm_tpu param tree: alternate col/row
    parallel per Linear encountered (depth-first order)."""
    counter = {"i": 0}

    def spec_for(path, arr):
        names = [getattr(p, "key", getattr(p, "idx", "")) for p in path]
        is_kernel = "kernel" in names
        is_bias = "bias" in names or "scale" in names
        if is_kernel:
            alt = counter["i"]
            counter["i"] += 1
            return _kernel_spec(str(names), arr, alt)
        if is_bias and arr.ndim == 1:
            # bias of a col-parallel layer is sharded; for simplicity (and
            # because biases are tiny) replicate all biases
            return P()
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def state_specs(state) -> object:
    """P('dp', ...) for every leaf (all state arrays are batch-leading),
    except size-0 placeholder arrays (dense weights when unused)."""

    def spec_for(arr):
        if arr.ndim == 0 or arr.shape[0] == 0:
            return P()
        return P(*(["dp"] + [None] * (arr.ndim - 1)))

    return jax.tree_util.tree_map(spec_for, state)


def to_named(mesh: Mesh, specs):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_pytree(mesh: Mesh, tree, specs):
    """Device-put a pytree with the given PartitionSpecs."""
    shardings = to_named(mesh, specs)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
