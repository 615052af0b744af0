"""Pose-aware graph convolution for navigation GNNs.

The reference NavGCM hands its GNN the node positions/rotations alongside
the edges (nav_gcm.py:191-193) precisely so message passing can condition on
relative geometry; the reference itself only ships a test GNN that
concatenates pose into the features (tests/test_nav_gcm.py:13-28). This
layer does it properly: messages are conditioned on the relative pose of
source w.r.t. sink,

    m[i] = Σ_j adj[i, j] · MLP(x_j ‖ (pos_j − pos_i) ‖ (rot_j − rot_i))
    out[i] = lin_root(x_i) + m[i]

All dense masked ops — one broadcasted pairwise geometry tensor plus batched
matmuls, which XLA fuses onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcm_tpu.nn.module import Linear


class NavRelPosConv:
    def __init__(self, in_dim: int, out_dim: int, pos_dim: int = 2,
                 rot_dim: int = 1, hidden: int | None = None,
                 dtype=jnp.float32):
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.pos_dim = pos_dim
        self.rot_dim = rot_dim
        h = hidden or out_dim
        self.msg1 = Linear(in_dim + pos_dim + rot_dim, h, dtype=dtype)
        self.msg2 = Linear(h, out_dim, dtype=dtype)
        self.lin_root = Linear(in_dim, out_dim, use_bias=False, dtype=dtype)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"msg1": self.msg1.init(k1), "msg2": self.msg2.init(k2),
                "lin_root": self.lin_root.init(k3)}

    def __call__(self, params, x, adj_mask, pos, rot):
        """x: [B, V, F], adj_mask: [B, V, V] (j -> i), pos: [B, V, P],
        rot: [B, V, R] -> [B, V, out]."""
        B, V, F = x.shape
        rel_pos = pos[:, None, :, :] - pos[:, :, None, :]  # [B, i, j, P]
        rel_rot = rot[:, None, :, :] - rot[:, :, None, :]  # [B, i, j, R]
        x_j = jnp.broadcast_to(x[:, None, :, :], (B, V, V, F))
        msg_in = jnp.concatenate([x_j, rel_pos, rel_rot], axis=-1)
        m = self.msg2(params["msg2"],
                      jax.nn.relu(self.msg1(params["msg1"], msg_in)))
        m = m * adj_mask[..., None].astype(m.dtype)
        agg = jnp.sum(m, axis=2)  # sum over sources j
        return agg + self.lin_root(params["lin_root"], x)


class NavPoseGNN:
    """Stack of NavRelPosConv layers + activations with the NavGCM GNN
    signature gnn(params, x, adj_mask, pos, rot, valid, T, taus)."""

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

    def __call__(self, params, x, adj_mask, pos, rot, valid, T, taus):
        for layer, p in zip(self.layers, params):
            if hasattr(layer, "init"):
                x = layer(p, x, adj_mask, pos, rot)
            else:
                x = layer(x)
        return x
