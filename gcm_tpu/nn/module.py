"""Minimal functional module convention for gcm_tpu.

A "module" is a plain Python object holding *static* configuration with two
methods:

- ``init(key) -> params``: build a parameter pytree (dict of jnp arrays).
- ``__call__(params, *args) -> out``: pure apply.

Parameters are ordinary pytrees, so modules compose with jax.jit / grad /
vmap / pjit without a framework. Torch-compatible initializers are provided so
training dynamics are comparable with the PyTorch reference.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_uniform(key, shape, fan_in, a=math.sqrt(5), dtype=jnp.float32):
    """torch.nn.Linear's default weight init (kaiming uniform, a=sqrt(5))."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def bias_uniform(key, shape, fan_in, dtype=jnp.float32):
    """torch.nn.Linear's default bias init."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def orthogonal(key, shape, dtype=jnp.float32):
    """Orthogonal init (used by the reference sparse LearnedEdge,
    sparse_edge_selectors/learned.py:63-65)."""
    return jax.nn.initializers.orthogonal()(key, shape, dtype)


def normc(key, shape, std=0.01, dtype=jnp.float32):
    """rllib's normc initializer (used for logit/value heads, ray_gcm.py:144-153):
    sample normal then normalize each output column to `std` L2 norm."""
    w = jax.random.normal(key, shape, dtype)
    norm = jnp.sqrt(jnp.sum(jnp.square(w), axis=0, keepdims=True))
    return w * std / jnp.maximum(norm, 1e-12)


class Linear:
    """y = x @ kernel + bias; kernel stored [in, out] (JAX convention)."""

    def __init__(self, in_dim: int, out_dim: int, use_bias: bool = True,
                 init: str = "torch", dtype=jnp.float32):
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.use_bias = use_bias
        self.init_scheme = init
        self.dtype = dtype

    def init(self, key):
        wk, bk = jax.random.split(key)
        shape = (self.in_dim, self.out_dim)
        if self.init_scheme == "torch":
            kernel = kaiming_uniform(wk, shape, self.in_dim, dtype=self.dtype)
        elif self.init_scheme == "glorot":
            kernel = glorot_uniform(wk, shape, dtype=self.dtype)
        elif self.init_scheme == "orthogonal":
            kernel = orthogonal(wk, shape, dtype=self.dtype)
        elif isinstance(self.init_scheme, tuple) and self.init_scheme[0] == "normc":
            kernel = normc(wk, shape, std=self.init_scheme[1], dtype=self.dtype)
        else:
            raise ValueError(f"unknown init {self.init_scheme}")
        params = {"kernel": kernel}
        if self.use_bias:
            params["bias"] = bias_uniform(bk, (self.out_dim,), self.in_dim,
                                          dtype=self.dtype)
        return params

    def __call__(self, params, x):
        y = jnp.einsum("...i,io->...o", x, params["kernel"])
        if self.use_bias:
            y = y + params["bias"]
        return y


class LayerNorm:
    """torch.nn.LayerNorm over the last dim (eps, elementwise affine)."""

    def __init__(self, dim: int, eps: float = 1e-5, dtype=jnp.float32):
        self.dim = dim
        self.eps = eps
        self.dtype = dtype

    def init(self, key):
        del key
        return {"scale": jnp.ones((self.dim,), self.dtype),
                "bias": jnp.zeros((self.dim,), self.dtype)}

    def __call__(self, params, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * params["scale"] + params["bias"]


class MLP:
    """Sequential of Linear / LayerNorm / activation callables.

    `layers` is a list whose elements are modules (with init/apply) or plain
    activation callables (applied to the running value, no params — their
    params slot is an empty dict)."""

    def __init__(self, layers):
        self.layers = layers

    def init(self, key):
        params = []
        for layer in self.layers:
            if hasattr(layer, "init"):
                key, sub = jax.random.split(key)
                params.append(layer.init(sub))
            else:
                params.append({})
        return params

    def __call__(self, params, x):
        for layer, p in zip(self.layers, params):
            if hasattr(layer, "init"):
                x = layer(p, x)
            else:
                x = layer(x)
        return x
