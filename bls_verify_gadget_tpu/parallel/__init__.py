"""Distribution layer: device meshes, sharded batch verification, and
cross-chip aggregation collectives (SURVEY.md sec 5 'distributed communication
backend' — net-new surface relative to the reference, whose only parallelism
is single-host rayon, Cargo.toml:67)."""

from .mesh import make_mesh, batch_axis  # noqa: F401
from .api import (  # noqa: F401
    make_sharded_verify,
    make_sharded_verify_staged,
    sharded_verify,
    sharded_aggregate_pubkeys,
    sharded_aggregate_signatures,
    sharded_masked_aggregate,
    sharded_masked_aggregate_verify,
)
