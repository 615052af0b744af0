"""Straight-through estimators and sparse/hard softmax activations.

TPU-native re-design of the reference's straight-through machinery
(reference: src/gcm/util.py:9-56 — STEFunction/StraightThroughEstimator,
Spardmax, Hardmax). Everything here is a pure function; gradient rewiring is
done with `jax.custom_vjp` / `lax.stop_gradient` identities instead of
torch.autograd.Function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def ste(x: jax.Array) -> jax.Array:
    """Binary step with a straight-through (identity) gradient.

    Forward: (x > 0) as float. Backward: identity.
    Matches reference STEFunction (src/gcm/util.py:9-17).
    """
    return (x > 0).astype(x.dtype)


def _ste_fwd(x):
    return ste(x), None


def _ste_bwd(_, g):
    return (g,)


ste.defvjp(_ste_fwd, _ste_bwd)


def straight_through(y_hard: jax.Array, y_soft: jax.Array) -> jax.Array:
    """`y_hard` in the forward pass, `y_soft`'s gradient in the backward pass."""
    return y_hard - jax.lax.stop_gradient(y_soft) + y_soft


def sparsemax(logits: jax.Array, axis: int = -1) -> jax.Array:
    """Sparsemax (Martins & Astudillo 2016): Euclidean projection onto the simplex.

    Replaces the pip `sparsemax` package the reference depends on
    (setup.cfg:25, src/gcm/util.py:29-42). Sort-based, fixed-shape, fully
    vectorized — maps onto TPU sort + cumsum.
    """
    logits = jnp.moveaxis(logits, axis, -1)
    d = logits.shape[-1]
    z_sorted = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
    z_cumsum = jnp.cumsum(z_sorted, axis=-1)
    k = jnp.arange(1, d + 1, dtype=logits.dtype)
    support = 1.0 + k * z_sorted > z_cumsum
    k_z = jnp.sum(support, axis=-1, keepdims=True).astype(logits.dtype)
    # cumsum at the support boundary
    tau_sum = jnp.take_along_axis(
        z_cumsum, jnp.maximum(k_z.astype(jnp.int32) - 1, 0), axis=-1
    )
    tau = (tau_sum - 1.0) / jnp.maximum(k_z, 1.0)
    out = jnp.maximum(logits - tau, 0.0)
    return jnp.moveaxis(out, -1, axis)


def spardmax(logits: jax.Array, axis: int = -1, cutoff: float = 0.0) -> jax.Array:
    """Hard sparsemax with straight-through gradient (reference util.py:29-42)."""
    y_soft = sparsemax(logits, axis=axis)
    y_hard = (y_soft > cutoff).astype(logits.dtype)
    return straight_through(y_hard, y_soft)


def hardmax(logits: jax.Array, axis: int = -1, cutoff: float = 0.2) -> jax.Array:
    """Hard softmax with straight-through gradient (reference util.py:45-56)."""
    y_soft = jax.nn.softmax(logits, axis=axis)
    y_hard = (y_soft > cutoff).astype(logits.dtype)
    return straight_through(y_hard, y_soft)


def sample_gumbel(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Standard Gumbel(0, 1) noise."""
    return jax.random.gumbel(key, shape, dtype)


def gumbel_softmax(
    key: jax.Array,
    logits: jax.Array,
    tau: float | jax.Array = 1.0,
    hard: bool = False,
    axis: int = -1,
) -> jax.Array:
    """torch.nn.functional.gumbel_softmax semantics in JAX.

    Soft: softmax((logits + gumbel) / tau). Hard: one-hot argmax with
    straight-through gradient.
    """
    g = sample_gumbel(key, logits.shape, logits.dtype)
    y = (logits + g) / tau
    y_soft = jax.nn.softmax(y, axis=axis)
    if not hard:
        return y_soft
    idx = jnp.argmax(y_soft, axis=axis, keepdims=True)
    y_hard = jnp.zeros_like(y_soft)
    y_hard = jnp.put_along_axis(
        y_hard, idx, jnp.ones_like(idx, dtype=y_soft.dtype), axis=axis, inplace=False
    )
    return straight_through(y_hard, y_soft)


def masked_softmax(
    logits: jax.Array,
    mask: jax.Array,
    axis: int = -1,
    tau: float | jax.Array = 1.0,
) -> jax.Array:
    """Softmax over entries where `mask` is True; masked entries get probability 0.

    TPU-native equivalent of `torch.sparse.softmax` over COO values
    (reference util.py:89-172): softmax is taken only over present (masked-in)
    entries along `axis`. Rows with no valid entries return all zeros (the
    sparse softmax simply has no entries there).
    """
    neg = jnp.finfo(logits.dtype).min
    z = jnp.where(mask, logits / tau, neg)
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=axis, keepdims=True))
    e = jnp.where(mask, jnp.exp(z), 0.0)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, jnp.finfo(logits.dtype).tiny)


def masked_gumbel_softmax(
    key: jax.Array,
    logits: jax.Array,
    mask: jax.Array,
    axis: int = -1,
    tau: float | jax.Array = 1.0,
    hard: bool = False,
) -> jax.Array:
    """Gumbel-softmax over masked-in entries; the padded-edge-list analog of
    reference `sparse_gumbel_softmax` (util.py:89-130)."""
    # reference adds gumbel noise to logits, then divides the sum by tau
    # (util.py:97-98)
    g = sample_gumbel(key, logits.shape, logits.dtype)
    y_soft = masked_softmax(logits + g, mask, axis=axis, tau=tau)
    if not hard:
        return y_soft
    idx = jnp.argmax(y_soft, axis=axis, keepdims=True)
    y_hard = jnp.zeros_like(y_soft)
    y_hard = jnp.put_along_axis(
        y_hard, idx, jnp.ones_like(idx, dtype=y_soft.dtype), axis=axis, inplace=False
    )
    y_hard = y_hard * mask.astype(y_soft.dtype)
    return straight_through(y_hard, y_soft)


def masked_tempered_softmax(
    logits: jax.Array,
    mask: jax.Array,
    axis: int = -1,
    tau: float | jax.Array = 1.0,
    hard: bool = False,
) -> jax.Array:
    """Deterministic tempered softmax over masked entries
    (reference `sparse_tempered_softmax`, util.py:132-172)."""
    y_soft = masked_softmax(logits, mask, axis=axis, tau=tau)
    if not hard:
        return y_soft
    idx = jnp.argmax(y_soft, axis=axis, keepdims=True)
    y_hard = jnp.zeros_like(y_soft)
    y_hard = jnp.put_along_axis(
        y_hard, idx, jnp.ones_like(idx, dtype=y_soft.dtype), axis=axis, inplace=False
    )
    y_hard = y_hard * mask.astype(y_soft.dtype)
    return straight_through(y_hard, y_soft)


def diff_or(tensors: list[jax.Array]) -> jax.Array:
    """Differentiable OR over {0,1} tensors (reference util.py:455-465)."""
    res = jnp.zeros_like(tensors[0])
    for t in tensors:
        res = res + t - res * t
    return res


def grad_preserving_ones(values: jax.Array) -> jax.Array:
    """`v / stop_grad(v)`: forward 1.0, backward d/dv = 1/v.

    The reference's weight-normalization trick (src/gcm/sparse_gcm.py:160-164)
    that sets edge weights to exactly 1.0 while keeping gradient flow into the
    edge-selector logits.
    """
    return values / jax.lax.stop_gradient(values)
