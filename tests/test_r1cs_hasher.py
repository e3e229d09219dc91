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


RFC_DST = b"QUUX-V01-CS02-with-expander-SHA256-128"


def test_xmd_gadget_rfc_vectors():
    """Circuit-path expand_message_xmd against the RFC 9380 K.1 vectors —
    the reference checks the same vectors on its gadget
    (src/hasher.rs:819-886)."""
    vectors = [
        (b"", 0x20,
         "68a985b87eb6b46952128911f2a4412bbc302a9d759667f87f7a21d803f07235"),
        (b"abc", 0x20,
         "d8ccab23b5985ccea865c6c97b6e5b8350e794e603b4b97902f53a8a0d605615"),
        (b"abc", 0x80,
         "abba86a6129e366fc877aab32fc4ffc70120d8996c88aee2fe4b32d6c7b6437a"
         "647e6c3163d40b76a73cf6a5674ef1d890f95b664ee0afa5359a5c4e07985635"
         "bbecbac65d747d3d2da7ec2b8221b17b0ca9dc8a1ac1c07ea6a1e60583e2cb00"
         "058e77b7b72a298425cd1b941ad4ec65e8afc50303a22c0f99b0509b4c895f40"),
    ]
    for msg, n, want in vectors:
        cs = ConstraintSystem()
        out = RH.expand_message_xmd_gadget(cs, _alloc(cs, msg), RFC_DST, n)
        got = bytes(b.value for b in out)
        assert got.hex() == want, (msg, n)
        assert cs.is_satisfied()


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
