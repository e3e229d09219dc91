"""Device-path compute kernels (JAX/XLA/Pallas), batch-first.

Layer map (SURVEY.md sec 7):
  limbs.py    host <-> device limb conversion helpers
  fp.py       L0: modular limb arithmetic (Fp 381-bit, Fr 255-bit)
  tower.py    L0: Fp2/Fp6/Fp12 extension towers
  curve.py    L1: G1/G2 Jacobian point kernels
  sha256.py   L3: batched SHA-256
  hash_to_g2.py L3: XMD + hash_to_field + SSWU + isogeny + cofactor
  pairing.py  L2: Miller loop + final exponentiation
  pallas/     fused TPU kernels for the hot ops
"""
