"""Multi-host (DCN) distribution layer.

On TPU pods, per-host JAX processes join one global runtime via
``jax.distributed.initialize``; the single "batch" mesh axis (mesh.py) then
spans every chip in the pod and the same shard_map programs (api.py) run
unchanged — in-host reductions ride ICI, cross-host segments ride DCN, with
XLA inserting the hierarchical collectives.  This mirrors SURVEY.md §5's
distributed-backend requirement; the reference's only parallelism is
single-host rayon (Cargo.toml:67).

The CPU path (N processes x M virtual host devices over localhost, gloo
collectives) is used by tests/test_distributed.py so the cross-process
code path is exercised in CI without a pod.
"""

from __future__ import annotations

import jax


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_count: int | None = None,
) -> None:
    """Join this process to the global distributed runtime.

    Call ONCE per process, before any jax backend probe — NOTE that
    importing the ops/ modules stages device constants and initializes the
    backend, so launchers must call this before importing anything else
    from this package (tools/dcn_smoke.py inlines the same sequence for
    that reason).  On TPU pods the three arguments are discovered from the
    pod environment and callers can simply use
    ``jax.distributed.initialize()``; this explicit form is for
    CPU/DCN-over-localhost runs (tests) and custom launchers.

    local_device_count: for CPU processes, the number of virtual host
    devices this process contributes (sets
    --xla_force_host_platform_device_count before backend init).
    """
    if local_device_count is not None:
        import os

        flags = [
            f
            for f in os.environ.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        flags.append(
            f"--xla_force_host_platform_device_count={local_device_count}"
        )
        os.environ["XLA_FLAGS"] = " ".join(flags)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_local_to_global(mesh, spec, tree):
    """Per-process local shards (numpy / device arrays) -> global arrays
    sharded over `mesh` by `spec`, leaf-wise over a pytree.  The local leaf
    is this process's contiguous slab of the global batch axis."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)

    def mk(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(mk, tree)
