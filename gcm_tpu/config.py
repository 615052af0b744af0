"""Global backend knobs for gcm_tpu."""

from __future__ import annotations

import jax

# "auto": Pallas kernels on TPU, XLA fallbacks elsewhere.
# True/False force the choice (tests force False to pin fallback parity).
USE_PALLAS: bool | str = "auto"

# Heuristic bounds: the one-hot-matmul SpMM trades FLOPs for MXU residency;
# beyond these sizes the scatter fallback wins.
PALLAS_SPMM_MAX_NODES = 1024
PALLAS_SPMM_MAX_EDGES = 16384


def use_pallas() -> bool:
    if USE_PALLAS == "auto":
        return jax.default_backend() == "tpu"
    return bool(USE_PALLAS)
