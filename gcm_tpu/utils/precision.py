"""Mixed-precision helpers + the measured guidance for using them.

TPU MXUs natively prefer bf16; whether casting HELPS a GCM core depends on
what the core moves (BASELINE.md, measured on TPU v5e):

- DenseGCM flagship scan: bf16 params+state+scan measured +12% — the win
  comes from halving the [B,N,N] adjacency traffic, the roofline term.
- BandedRingGCM: bf16 measured 6.2M vs 8.7M f32 timesteps/s — it HURTS:
  the banded core never moves an adjacency, so bf16 only adds convert
  traffic around the mask algebra and tanh.

So: cast the dense/ring cores' state+params when memory-bound, keep the
banded/clique cores in f32, and always keep optimizer state and loss
accumulation in f32 (`cast_pytree` is for inference/forward replicas, not
the optimizer tree).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_pytree(tree, dtype=jnp.bfloat16):
    """Cast every float leaf of a pytree to `dtype` (int/bool leaves — node
    counters, edge indices, masks — are left untouched)."""

    def leaf(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(dtype)
        return a

    return jax.tree_util.tree_map(leaf, tree)


def param_count(params) -> int:
    """Total number of scalar parameters in a params pytree."""
    return sum(int(a.size) for a in jax.tree_util.tree_leaves(params))


def summarize(params, prefix: str = "") -> str:
    """Human-readable per-leaf shape/dtype/size table + total."""
    lines = []
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        name = prefix + jax.tree_util.keystr(path)
        lines.append(f"{name:<60} {str(leaf.shape):<16} "
                     f"{str(leaf.dtype):<10} {leaf.size:>10,}")
    lines.append(f"{'TOTAL':<60} {'':<16} {'':<10} "
                 f"{param_count(params):>10,}")
    return "\n".join(lines)
