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
