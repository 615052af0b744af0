"""Crash-resilient training loop: periodic checkpoint + resume-on-restart.

The reference has no failure handling at all (SURVEY.md §5 — "failure
detection / elastic recovery: entirely absent"); its only recovery primitive
is that the recurrent state is fixed-shape and serializable. This module is
the TPU-native completion of that design: a training driver that

  1. checkpoints (params, opt_state, update counter, PRNG key) every
     `checkpoint_every` updates through the orbax manager
     (train/checkpoint.py — sharded-array aware, so the same loop covers
     multi-chip pjit'd training), and
  2. on (re)start, restores the latest checkpoint if one exists and
     continues from the recorded update counter — a process crash or
     preemption costs at most `checkpoint_every` updates of work.

Works with any trainer exposing the A2C/PPO protocol
(init(key) -> (params, opt_state); update(params, opt_state, key, B) ->
(params, opt_state, metrics)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcm_tpu.train.checkpoint import make_manager, restore, save


def train_resilient(trainer, directory: str, updates: int, B: int = 16,
                    key=None, checkpoint_every: int = 50,
                    on_update=None):
    """Run `updates` total updates, checkpointing every `checkpoint_every`;
    resumes from the latest checkpoint in `directory` if one exists.

    Returns (params, history) where history is the per-update return metric
    since (re)start. `on_update(step, metrics)` is an optional callback.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    params, opt_state = trainer.init(key)
    start = 0
    mgr = make_manager(directory)
    tree = {"params": params, "opt_state": opt_state,
            "step": jnp.zeros((), jnp.int32), "key": key}
    if mgr.latest_step() is not None:
        tree = restore(mgr, template=tree)
        params, opt_state = tree["params"], tree["opt_state"]
        start = int(tree["step"])
        key = tree["key"]

    history = []
    for step in range(start, updates):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = trainer.update(params, opt_state, sub, B)
        history.append(float(metrics.get("return", metrics["loss"])))
        if on_update is not None:
            on_update(step, metrics)
        if (step + 1) % checkpoint_every == 0 or step + 1 == updates:
            save(mgr, step + 1, {
                "params": params, "opt_state": opt_state,
                "step": jnp.asarray(step + 1, jnp.int32), "key": key,
            })
    return params, history
