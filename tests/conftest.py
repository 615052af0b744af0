"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (mirrors SURVEY.md §4's multi-host fake strategy)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# A sitecustomize may pin jax_platforms to the TPU plugin; force CPU for tests
# (must happen before any backend initialization).
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against float64-ish numpy oracles; force full-precision
# matmuls (this environment defaults matmul precision to bf16).
jax.config.update("jax_default_matmul_precision", "highest")
