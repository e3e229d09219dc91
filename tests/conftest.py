"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding path
(parallel/) is exercised without TPU hardware, per the driver contract.
Must run before jax is imported anywhere.
"""

import os
import sys
import pathlib

# NOTE: the environment's sitecustomize pins JAX_PLATFORMS=axon (the TPU
# tunnel); the config-level update below is what actually forces CPU here.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("BLS_TPU_CACHE_DIR", "/tmp/bls_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

VECTOR_DIR = pathlib.Path(__file__).resolve().parent / "vectors"
