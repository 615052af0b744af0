"""Distance-threshold edge selectors (dense API) — the SDDMM scoring path.

TPU-native Euclidean/Cosine/Spatial edge selectors (reference
src/gcm/edge_selectors/distance.py): score the current node against all memory
nodes, threshold, and wire edges. The scoring is one batched pairwise-distance
computation (ops.distance) that XLA fuses onto the MXU; the reference's
`torch.where` + index_put becomes a broadcasted mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcm_tpu.ops.distance import cosine_score, euclidean_score, spatial_score


class Distance:
    """Base: edge where dist_fn(curr, nodes) < max_distance, masked to past
    nodes (no self edge), optionally bidirectional. With learned=True, node
    features are divided by a learnable scale and the threshold is fixed at
    1.0 (reference distance.py:13-22)."""

    def __init__(self, max_distance: float, bidirectional: bool = False,
                 learned: bool = False, window: int | None = None):
        self.max_distance = 1.0 if learned else max_distance
        self.init_distance = max_distance
        self.bidirectional = bidirectional
        self.learned = learned
        # window: restrict candidate sources to the last `window` nodes —
        # the dense analog of the sparse selectors' candidate window
        # (reference util.py:252-259, sparse_edge_selectors/learned.py:28-31;
        # the reference's dense Distance has no window, so None replicates
        # it exactly). Enables the banded fast path (models/banded_gcm.py).
        self.window = window

    def init(self, key):
        del key
        if self.learned:
            return {"dist_param": jnp.asarray([self.init_distance], jnp.float32)}
        return {}

    def dist_fn(self, curr, nodes):  # pragma: no cover - abstract
        raise NotImplementedError

    def __call__(self, params, nodes, adj, weights, num_nodes, key=None):
        del key
        B, N = adj.shape[0], adj.shape[1]
        if self.learned:
            nodes = nodes / params["dist_param"]
        b_idx = jnp.arange(B)
        curr = nodes[b_idx, jnp.clip(num_nodes, 0, N - 1)]  # [B, F]
        dists = self.dist_fn(curr, nodes)  # [B, N]
        mask = (dists < self.max_distance) & (
            jnp.arange(N)[None, :] < num_nodes[:, None]
        )  # [B, N] — excludes the current node (no self edge)
        if self.window is not None:
            mask = mask & (
                jnp.arange(N)[None, :] >= num_nodes[:, None] - self.window)
        r = jnp.arange(N)[None, :, None]
        c = jnp.arange(N)[None, None, :]
        i = num_nodes[:, None, None]
        fwd = (r == i) & mask[:, None, :]
        adj = jnp.where(fwd, 1.0, adj)
        if self.bidirectional:
            bwd = (c == i) & mask[:, :, None]
            adj = jnp.where(bwd, 1.0, adj)
        return adj, weights


class EuclideanEdge(Distance):
    """Reference EuclideanEdge (distance.py:42-49); see
    ops.distance.euclidean_score for the faithfully-replicated batch-mean
    broadcast."""

    def __init__(self, max_distance: float, learned: bool = False,
                 window: int | None = None):
        super().__init__(max_distance, learned=learned, window=window)

    def dist_fn(self, curr, nodes):
        return euclidean_score(curr, nodes)


class CosineEdge(Distance):
    """Reference CosineEdge (distance.py:52-61): cosine *similarity* compared
    against the threshold."""

    def __init__(self, max_distance: float, learned: bool = False,
                 window: int | None = None):
        super().__init__(max_distance, learned=learned, window=window)

    def dist_fn(self, curr, nodes):
        return cosine_score(curr, nodes)


class SpatialEdge(Distance):
    """Reference SpatialEdge (distance.py:64-81): euclidean distance between
    pose sub-slices."""

    def __init__(self, max_distance: float, a_pose_slice: slice,
                 b_pose_slice: slice | None = None, learned: bool = False,
                 window: int | None = None):
        super().__init__(max_distance, learned=learned, window=window)
        self.a_pose_slice = a_pose_slice
        self.b_pose_slice = b_pose_slice or a_pose_slice

    def dist_fn(self, curr, nodes):
        return spatial_score(curr, nodes, self.a_pose_slice, self.b_pose_slice)
