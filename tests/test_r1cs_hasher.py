"""In-circuit hash-to-G2 differential tests vs golden (the reference's
hasher test tier, src/hasher.rs:888-1026): hash_to_field, sswu+isogeny,
and the full hash gadget on a short message."""

from bls_verify_gadget_tpu.r1cs.system import ConstraintSystem
from bls_verify_gadget_tpu.r1cs.gadgets import UInt8
from bls_verify_gadget_tpu.r1cs import hasher as RH
from bls_verify_gadget_tpu.golden import hash_to_curve as gh


MSG = b"abc"


def _alloc(cs, msg):
    return [UInt8.alloc(cs, b) for b in msg]


def test_hash_to_field_gadget():
    cs = ConstraintSystem()
    u = RH.hash_to_field_gadget(cs, _alloc(cs, MSG))
    want = gh.hash_to_field_fp2(MSG)
    assert [x.value for x in u] == list(want)
    assert cs.is_satisfied()


def test_map_to_curve_gadget():
    cs = ConstraintSystem()
    u = RH.hash_to_field_gadget(cs, _alloc(cs, MSG))
    q0 = RH.map_to_curve_gadget(u[0])
    assert q0.value() == gh.map_to_curve_g2(gh.hash_to_field_fp2(MSG)[0])
    assert cs.is_satisfied()


def test_full_hash_gadget():
    cs = ConstraintSystem()
    pt = RH.hash_to_g2_gadget(cs, _alloc(cs, MSG))
    assert pt.value() == gh.hash_to_g2(MSG)
    assert cs.is_satisfied()
    print(f"\nhash_to_g2 gadget constraints: {cs.num_constraints}")
