"""Runtime guards and observability helpers.

TPU-native replacements for the reference's scattered runtime checks
(SURVEY.md §5): the NaN guard (gcm.py:316-318), shape/dtype asserts
(gcm.py:246-260), causality assert (sparse_gcm.py:171), and the cProfile /
torch.profiler harnesses (tests/profile_sparse.py) become checkify checks,
mask-based validators, and jax.profiler traces.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def nan_guard(fn):
    """Wrap a function with checkify so NaN/Inf in its output raises a
    checked error outside jit (the reference asserts isfinite on the belief,
    gcm.py:316-318: 'try using tanh activation')."""

    def checked(*args, **kwargs):
        out = fn(*args, **kwargs)
        flat = jax.tree_util.tree_leaves(out)
        for leaf in flat:
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                checkify.check(
                    jnp.all(jnp.isfinite(leaf)),
                    "Got NaN in returned memory, try using tanh activation",
                )
        return out

    return checkify.checkify(checked)


def assert_causal_edges(edges: jax.Array) -> jax.Array:
    """True iff every valid edge has source < sink (the reference's
    'Causality violated' assert, sparse_gcm.py:171). Returns a bool scalar
    usable inside jit; combine with checkify or host assert outside."""
    valid = (edges[:, 0, :] >= 0) & (edges[:, 1, :] >= 0)
    ok = jnp.where(valid, edges[:, 1, :] < edges[:, 0, :], True)
    return jnp.all(ok)


def grad_norms(grads, prefix: str = "grad_norm") -> dict:
    """Per-parameter L2 gradient norms as a flat {path: scalar} dict — the
    TPU-native form of the reference's per-parameter grad-norm backward hooks
    (sparse_edge_selectors/learned.py:67-68,85-87, intended for an external
    logger). Works on any grad pytree; jit-safe (returns traced scalars)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]

    def name(path):
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path)

    return {f"{prefix}/{name(p)}": jnp.sqrt(jnp.sum(jnp.square(g)))
            for p, g in flat}


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context — the TPU-native profiling harness
    (replaces tests/profile_sparse.py's cProfile)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
