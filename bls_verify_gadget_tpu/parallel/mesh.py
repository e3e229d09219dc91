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
    """1-D mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (batch_axis,))
