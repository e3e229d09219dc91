"""R1CS constraint/witness layer over the BLS12-381 base field Fq.

The critical design fact mirrored from the reference (SURVEY.md sec 2.1):
all circuit variables live in Fq = Fp (the 381-bit base field), so every
Fp/Fp2 curve operation in-circuit is native field arithmetic
(reference src/hasher.rs:32, src/constraints.rs:18).

Modules:
  system.py     ConstraintSystem: allocation, sparse A/B/C rows, accounting
  gadgets.py    FpVar / Boolean / UInt8 / UInt32 vocabulary
  fields.py     Fp2Var tower gadgets
  curve.py      G1Var/G2Var affine point gadgets
  sha256.py     in-circuit SHA-256 (Sha256Gadget parity)
  hasher.py     in-circuit hash-to-G2 (DefaultFieldHasherWithCons parity)
  pairing.py    in-circuit Miller loop + final exponentiation (PairingVar parity)
  verify.py     BlsSignatureVerifyGadget: verify / aggregate_verify
  evaluator.py  TPU-batched sparse <A,w>*<B,w>=<C,w> checking
"""

from .system import ConstraintSystem, AllocationMode  # noqa: F401
