"""ToBytesGadget semantics: byte order, length, and infinity behavior
(reference src/constraints.rs:281-297 → arkworks affine to_bytes =
x LE bytes ‖ y LE bytes ‖ infinity byte).  VERDICT r1 missing #4."""

from bls_verify_gadget_tpu import constants as C
from bls_verify_gadget_tpu.r1cs.system import ConstraintSystem
from bls_verify_gadget_tpu.r1cs.verify import PublicKeyVar


def _bytes_of(pk):
    cs = ConstraintSystem()
    out = PublicKeyVar.alloc(cs, pk).to_bytes_le()
    assert cs.is_satisfied()
    return bytes(b.value for b in out)


def test_to_bytes_le_finite_point():
    x, y = C.G1_GEN
    got = _bytes_of((x, y))
    assert len(got) == 97
    assert got == x.to_bytes(48, "little") + y.to_bytes(48, "little") + b"\x00"


def test_to_bytes_le_infinity():
    got = _bytes_of(None)
    assert got == b"\x00" * 96 + b"\x01"
