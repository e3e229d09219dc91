"""Scheme-level APIs ("models" of this framework): the batched BLS signature
scheme over the device kernel stack."""

from .bls import BatchedBLS, Params  # noqa: F401
