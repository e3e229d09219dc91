"""Fused Pallas TPU kernels for the hot field ops.

The jnp path in ops/fp.py is the portable reference; these kernels replace
its scan pipelines with single fused VMEM-resident kernels (one dispatch per
field-multiply group instead of ~50 sequential scan steps)."""
