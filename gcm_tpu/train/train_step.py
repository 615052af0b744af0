"""Jittable training-step factories.

The reference trains through rllib; here the training loop is a first-class
jitted function: loss over a scanned trajectory, grads, optax update. Used by
the multi-chip dry run, benchmarks, and the RL harness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def make_dense_supervised_step(model, opt):
    """Regression-style step over a scanned trajectory: predict targets from
    beliefs. Returns step(params, opt_state, xs [B,T,obs], targets [B,T,H])."""

    def loss_fn(params, xs, targets):
        B = xs.shape[0]
        state = model.initial_state(B, xs.shape[-1], dtype=xs.dtype)
        outs, _ = model.scan(params, xs, state)
        return jnp.mean((outs - targets) ** 2)

    def step(params, opt_state, xs, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, xs, targets)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_window_supervised_step(model, opt, **window_kwargs):
    """Supervised step through a window-capable core's scan-free
    whole-trajectory forward (BandedRingGCM / BandedScoredGCM / CliqueGCM
    .window()) — the training-side fast path with no lax.scan in either
    direction of the program. window_kwargs (e.g. impl='proj' for
    CliqueGCM) are forwarded."""

    def loss_fn(params, xs, targets, dones):
        B = xs.shape[0]
        state = model.initial_state(B, xs.shape[-1], dtype=xs.dtype)
        outs, _ = model.window(params, xs, state, dones=dones,
                               **window_kwargs)
        return jnp.mean((outs - targets) ** 2)

    def step(params, opt_state, xs, targets, dones=None):
        loss, grads = jax.value_and_grad(loss_fn)(params, xs, targets,
                                                  dones)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_trajectory_supervised_step(model, opt, unroll=None, remat=False):
    """Mode-aware supervised step: dispatches the whole-trajectory forward
    to the core's scan-free window() when its measured TRAINING gate says so
    (window_profitable(mode='train') — e.g. the ring core above
    config.RING_WINDOW_TRAIN_MIN_N), else the scan with the caller's
    unroll/remat knobs. The reference's per-step-rollout vs whole-window-
    training split (ray_gcm.py:200-202 vs ray_sparse_gcm.py:201-213) as a
    first-class training-step factory."""

    use_window = (getattr(model, "window", None) is not None
                  and getattr(model, "direction", "forward") == "forward")
    if use_window and hasattr(model, "window_profitable"):
        use_window = model.window_profitable(mode="train")
    if use_window and hasattr(model, "window_applicable"):
        use_window = model.window_applicable(dones=None)

    def loss_fn(params, xs, targets):
        B = xs.shape[0]
        state = model.initial_state(B, xs.shape[-1], dtype=xs.dtype)
        if use_window:
            outs, _ = model.window(params, xs, state)
        else:
            outs, _ = model.scan(params, xs, state, unroll=unroll,
                                 remat=remat)
        return jnp.mean((outs - targets) ** 2)

    def step(params, opt_state, xs, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, xs, targets)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sparse_supervised_step(model, opt):
    """Whole-rollout step through SparseGCM (time-batched training)."""

    def loss_fn(params, xs, targets, taus):
        B = xs.shape[0]
        state = model.initial_state(B, xs.shape[-1], dtype=xs.dtype)
        outs, _ = model(params, xs, taus, state)
        return jnp.mean((outs - targets) ** 2)

    def step(params, opt_state, xs, targets, taus):
        loss, grads = jax.value_and_grad(loss_fn)(params, xs, targets, taus)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
