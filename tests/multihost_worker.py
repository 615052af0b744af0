"""Worker process for tests/test_multihost.py (not a test module).

Each of the 2 processes owns 2 virtual CPU devices (a fake host), connects
through jax.distributed (the DCN analog: cross-process collectives ride the
gloo CPU backend), builds the library's `global_mesh`, and runs ONE
dp-sharded supervised update of a BandedRingGCM over the 4-device global
mesh. It prints the updated-parameter checksum; the parent test asserts both
processes agree and match the single-process value.

Usage: python multihost_worker.py <coordinator> <num_procs> <process_id>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gcm_tpu.parallel.distributed import global_mesh, initialize_multihost
from tests.multihost_common import (
    B_GLOBAL, build_model_and_data, sharded_sparse_checksum,
    updated_param_checksum)


def main():
    coordinator, num_procs, pid = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    initialize_multihost(coordinator_address=coordinator,
                         num_processes=num_procs, process_id=pid)
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 2 * num_procs  # global device view

    mesh = global_mesh()
    assert mesh.devices.size == 2 * num_procs

    model, params, xs, ys = build_model_and_data()

    # each process feeds its local shard of the global batch; the global
    # array spans processes (the rllib state-crossing analog, but sharded)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("dp"))
    n_local = B_GLOBAL // num_procs
    lo = pid * n_local
    xs_g = jax.make_array_from_process_local_data(
        sharding, np.asarray(xs[lo:lo + n_local]), xs.shape)
    ys_g = jax.make_array_from_process_local_data(
        sharding, np.asarray(ys[lo:lo + n_local]), ys.shape)

    checksum, grad_norm = updated_param_checksum(
        model, params, xs_g, ys_g, mesh)
    # end-to-end sharded SparseGCM with the NODE axis spanning processes
    ss_sum, ss_edges = sharded_sparse_checksum(mesh)
    print(json.dumps({"pid": pid, "checksum": float(checksum),
                      "grad_norm": float(grad_norm),
                      "sharded_sparse_sum": ss_sum,
                      "sharded_sparse_edges": ss_edges}), flush=True)


if __name__ == "__main__":
    main()
