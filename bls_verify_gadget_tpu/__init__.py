"""bls_verify_gadget_tpu: TPU-native BLS12-381 signature verification and
constraint-gadget framework (JAX / XLA / Pallas).

Brand-new implementation with the capability surface of
lightec-xyz/bls-verify-gadget (see SURVEY.md), designed batch-first for TPU.
"""

__version__ = "0.1.0"
