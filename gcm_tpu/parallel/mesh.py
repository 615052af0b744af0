"""Device mesh construction for multi-chip execution.

The reference has no distributed support (SURVEY.md §5.8); this is the
TPU-native design: a named `jax.sharding.Mesh` with axes

- ``dp``: data parallel over the batch. Every reference op is batched over
  leading dim B and memory graphs never interact across batch, so DP is the
  natural, communication-free axis (collectives only for gradient psum).
- ``tp``: tensor parallel over GNN feature dims (shards the conv linears).

Shardings are expressed with NamedSharding/PartitionSpec and applied via jit
in/out shardings — XLA GSPMD inserts the collectives over ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. dp defaults to n_devices // tp."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp <= n, f"dp*tp={dp*tp} exceeds {n} devices"
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
