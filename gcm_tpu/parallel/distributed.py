"""Multi-host initialization helpers.

The reference has no communication backend at all (SURVEY.md §5.8); the
TPU-native answer is jax.distributed + a global mesh whose dp axis spans
hosts (DCN) and whose tp/ep axes stay within a slice (ICI)."""

from __future__ import annotations

import jax

from gcm_tpu.parallel.mesh import make_mesh


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Initialize jax.distributed. With no arguments, relies on the TPU
    environment's auto-configuration; explicit args support CPU/GPU fleets.
    Idempotent."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def global_mesh(tp: int = 1):
    """Mesh over every device across all hosts: dp spans hosts (gradients
    ride DCN), tp stays device-local within a host's slice (ICI)."""
    return make_mesh(tp=tp, devices=jax.devices())
