"""Checkpoint / resume for (params, opt_state, memory-graph state) pytrees.

The reference has no checkpointing beyond implicit state_dict (SURVEY.md §5);
its recurrent state is deliberately fixed-shape and externally owned so a
framework can serialize it (ray_gcm.py:156-167, util.py:323-382). Here that
design carries over directly: everything is a pytree of fixed-shape arrays,
checkpointed with orbax. Works for sharded (multi-chip) arrays too — orbax
records and restores shardings.

Zero-size placeholder arrays (e.g. DenseGraphState.weights when
edge_weights=False, mirroring the reference's numel-0 tensor, gcm.py:208) are
skipped on save and refilled from the restore template — orbax cannot
serialize empty arrays.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def _split_empty(tree):
    """Return (savable tree with empty leaves replaced by 0-d sentinel,
    mask tree of which leaves were empty)."""
    import jax.numpy as jnp

    def repl(x):
        return jnp.zeros((1,), x.dtype) if x.size == 0 else x

    mask = jax.tree_util.tree_map(lambda x: x.size == 0, tree)
    return jax.tree_util.tree_map(repl, tree), mask


def make_manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save(manager: ocp.CheckpointManager, step: int, tree) -> None:
    savable, _ = _split_empty(tree)
    manager.save(step, args=ocp.args.StandardSave(savable))
    manager.wait_until_finished()


def restore(manager: ocp.CheckpointManager, step: int | None = None,
            template=None):
    """Restore the given (or latest) step. `template` is an example pytree
    with the desired shapes/dtypes/shardings; its zero-size leaves pass
    through unchanged."""
    if step is None:
        step = manager.latest_step()
    if template is None:
        return manager.restore(step)
    savable_tpl, _ = _split_empty(template)
    got = manager.restore(step, args=ocp.args.StandardRestore(savable_tpl))
    return jax.tree_util.tree_map(
        lambda orig, restored: orig if orig.size == 0 else restored,
        template, got,
    )
