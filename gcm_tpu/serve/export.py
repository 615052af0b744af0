"""Serving export: serialize the single-step inference function.

Production serving wants the per-step belief update as a self-contained,
versioned artifact: jax.export serializes the lowered StableHLO of
`step(params, obs, state) -> (belief, state)` together with its calling
convention, so a serving process can run it without the model-building Python
(the state is already a fixed-shape pytree, and the packed edge-list codec
crosses process boundaries — reference util.py:323-353 semantics).
"""

from __future__ import annotations

import jax
from jax import export as jax_export

from gcm_tpu.core.graph_state import (
    DenseGraphState,
    SparseGraphState,
)
from gcm_tpu.models.banded_gcm import BandedScoredState, BandedState
from gcm_tpu.models.nav_gcm import NavState
from gcm_tpu.models.ring_gcm import RingGraphState

for _nt in (DenseGraphState, SparseGraphState, RingGraphState, BandedState,
            BandedScoredState, NavState):
    try:
        jax_export.register_namedtuple_serialization(
            _nt, serialized_name=f"gcm_tpu.{_nt.__name__}")
    except ValueError:
        pass  # already registered


def export_step(model, params, example_obs, example_state):
    """Serialize one GCM step to bytes. Returns (blob, exported) where
    `blob` is the portable serialization and `exported` the in-process
    Exported object."""

    def step(params, x, state):
        return model(params, x, state)

    exported = jax_export.export(jax.jit(step))(params, example_obs,
                                                example_state)
    return exported.serialize(), exported


def load_step(blob: bytes):
    """Deserialize an exported step; returns a callable
    f(params, obs, state) -> (belief, state)."""
    exported = jax_export.deserialize(blob)

    def call(params, x, state):
        return exported.call(params, x, state)

    return call
