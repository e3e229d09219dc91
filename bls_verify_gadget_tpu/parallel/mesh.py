"""Mesh construction.

One logical axis ("batch") is all this workload needs: BLS verification is
embarrassingly parallel over signatures, and the only cross-chip reductions
are point sums (aggregation) and pairing-product accumulators, both of which
ride ICI collectives.  Multi-host (DCN) extends the same mesh via
jax.distributed.initialize before calling make_mesh.
"""

import jax
import numpy as np
from jax.sharding import Mesh

batch_axis = "batch"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the given (or all) devices.

    Raises if fewer than ``n_devices`` devices exist — a silently smaller
    "mesh" would make every multi-chip test vacuous."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"make_mesh: requested {n_devices} devices but the "
                    f"{devices[0].platform} backend has only {len(devices)}; "
                    "set XLA_FLAGS=--xla_force_host_platform_device_count=N "
                    "with JAX_PLATFORMS=cpu for a virtual mesh"
                )
            devices = devices[:n_devices]
    elif n_devices is not None and len(devices) != n_devices:
        raise ValueError(
            f"make_mesh: {len(devices)} devices passed but n_devices={n_devices}"
        )
    return Mesh(np.array(devices), (batch_axis,))
