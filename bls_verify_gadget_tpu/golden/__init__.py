"""Golden (pure-python, arbitrary-precision) BLS12-381 implementation.

This subpackage is the host-side oracle for the TPU device path: every JAX /
Pallas kernel is differential-tested against these functions, mirroring the
reference's pattern of testing its circuit path against the arkworks native
path (reference src/hasher.rs:888-1026).  It is also the production host-side
codec/validation path (deserialization happens at the host I/O boundary, as it
does in the reference's Rust crate).
"""

from . import field, curve  # noqa: F401
