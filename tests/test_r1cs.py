"""R1CS gadget layer tests: vocabulary, curve gadgets, SHA-256, pairing,
differential vs golden, and the TPU-batched evaluator (mirrors the
reference's circuit test tiers, src/hasher.rs:742-1073 and
src/constraints.rs:299-522)."""

import hashlib
import random

import jax
import pytest

from bls_verify_gadget_tpu.r1cs.system import ConstraintSystem
from bls_verify_gadget_tpu.r1cs.gadgets import FpVar, Boolean, UInt8, UInt32
from bls_verify_gadget_tpu.r1cs.fields import Fp2Var, fp12_value
from bls_verify_gadget_tpu.r1cs import curve as RC
from bls_verify_gadget_tpu.r1cs import pairing as RP
from bls_verify_gadget_tpu.r1cs.sha256 import sha256_gadget
from bls_verify_gadget_tpu.golden import curve as gc, field as GF, pairing as gp
from bls_verify_gadget_tpu import constants as C

rng = random.Random(21)


def test_fp_vocabulary():
    cs = ConstraintSystem()
    a = FpVar.alloc(cs, 1234567)
    b = FpVar.alloc(cs, 7654321)
    assert (a * b).value == 1234567 * 7654321 % C.P
    assert (a * b).inverse().value == pow(1234567 * 7654321, -1, C.P)
    assert (a - a).is_zero().value == 1
    assert a.is_zero().value == 0
    u = UInt32.alloc(cs, 0xDEADBEEF)
    v = UInt32.alloc(cs, 0x12345678)
    assert UInt32.addmany([u, v]).value == (0xDEADBEEF + 0x12345678) & 0xFFFFFFFF
    assert u.xor(v).value == 0xDEADBEEF ^ 0x12345678
    assert cs.is_satisfied()
    # corrupt a witness -> unsatisfied
    cs.assignments[2] = 42
    assert not cs.is_satisfied()


def test_fp2_gadget_vs_golden():
    cs = ConstraintSystem()
    av = (rng.randrange(C.P), rng.randrange(C.P))
    bv = (rng.randrange(C.P), rng.randrange(C.P))
    a = Fp2Var.alloc(cs, av)
    b = Fp2Var.alloc(cs, bv)
    assert (a * b).value == GF.fp2_mul(av, bv)
    assert a.square().value == GF.fp2_sqr(av)
    assert a.inverse().value == GF.fp2_inv(av)
    assert a.mul_xi().value == GF.fp2_mul_xi(av)
    assert cs.is_satisfied()


def test_curve_gadgets_vs_golden():
    cs = ConstraintSystem()
    P1 = gc.g1_mul(C.G1_GEN, 123)
    P2 = gc.g1_mul(C.G1_GEN, 456)
    v1, v2 = RC.alloc_g1(cs, P1), RC.alloc_g1(cs, P2)
    assert RC.pt_add(v1, v2).value() == gc.g1_add(P1, P2)
    assert RC.pt_add(v1, v1).value() == gc.g1_add(P1, P1)
    assert RC.pt_add(v1, v1.negate()).value() is None
    inf = RC.pt_infinity(v1.x)
    assert RC.pt_add(inf, v1).value() == P1
    k = 0b1011001
    bits = [Boolean.alloc(cs, int(b)) for b in bin(k)[2:]]
    assert RC.pt_scalar_mul_bits(v1, bits).value() == gc.g1_mul(P1, k)
    Q1 = gc.g2_mul(C.G2_GEN, 777)
    w1 = RC.alloc_g2(cs, Q1)
    assert RC.g2_psi(w1).value() == gc.g2_psi(Q1)
    assert cs.is_satisfied()


def test_sha256_gadget():
    for msg in (b"", b"abc"):
        cs = ConstraintSystem()
        out = sha256_gadget(cs, [UInt8.alloc(cs, b) for b in msg])
        assert bytes(b.value for b in out) == hashlib.sha256(msg).digest()
        assert cs.is_satisfied()


def test_pairing_gadget_vs_golden():
    cs = ConstraintSystem()
    P1 = gc.g1_mul(C.G1_GEN, 7)
    Q1 = gc.g2_mul(C.G2_GEN, 11)
    pv = (FpVar.alloc(cs, P1[0]), FpVar.alloc(cs, P1[1]))
    qv = (Fp2Var.alloc(cs, Q1[0]), Fp2Var.alloc(cs, Q1[1]))
    f = RP.multi_pairing_gadget(cs, [(pv, qv, Boolean.constant(cs, 1))])
    assert fp12_value(f) == gp.pairing(P1, Q1)
    assert cs.is_satisfied()
    print(f"\npairing gadget constraints: {cs.num_constraints}")


def test_pairing_product_verify_equation():
    sk = 424242
    H = gc.g2_mul(C.G2_GEN, 999)
    sig = gc.g2_mul(H, sk)
    pk = gc.g1_mul(C.G1_GEN, sk)
    ng = gc.g1_neg(C.G1_GEN)
    cs = ConstraintSystem()
    pairs = [
        (
            (FpVar.constant(cs, ng[0]), FpVar.constant(cs, ng[1])),
            (Fp2Var.alloc(cs, sig[0]), Fp2Var.alloc(cs, sig[1])),
            Boolean.constant(cs, 1),
        ),
        (
            (FpVar.alloc(cs, pk[0]), FpVar.alloc(cs, pk[1])),
            (Fp2Var.alloc(cs, H[0]), Fp2Var.alloc(cs, H[1])),
            Boolean.constant(cs, 1),
        ),
    ]
    f = RP.multi_pairing_gadget(cs, pairs)
    assert RP.fp12_is_one_gadget(f).value == 1
    assert cs.is_satisfied()


def test_evaluator_device_check():
    """TPU-batched constraint checking on a small pairing circuit:
    good witness passes, corrupted witness fails."""
    from bls_verify_gadget_tpu.r1cs import evaluator as EV

    cs = ConstraintSystem()
    a = FpVar.alloc(cs, 111)
    b = FpVar.alloc(cs, 222)
    c = a * b
    d = c.inverse()
    _ = (a - b).is_zero()
    x = Fp2Var.alloc(cs, (5, 7))
    _ = x.inverse()
    assert cs.is_satisfied()
    prep = EV.prepare(cs.to_arrays())
    good = list(cs.assignments)
    bad = list(cs.assignments)
    bad[3] = (bad[3] + 1) % C.P
    w = EV.encode_witness_batch([good, bad])
    ok = EV.check_satisfied(prep, w, chunk=8)
    assert [bool(v) for v in jax.device_get(ok)] == [True, False]


def test_mapped_aggregate_gadget():
    """Bitmap fold + count (reference src/constraints.rs:378-521 pattern,
    smaller n for test speed)."""
    from bls_verify_gadget_tpu.r1cs.verify import PublicKeyVar, BlsSignatureVerifyGadget

    cs = ConstraintSystem()
    n = 8
    pts = [gc.g1_mul(C.G1_GEN, rng.randrange(1, C.R)) for _ in range(n)]
    bits = [1, 0, 1, 1, 0, 0, 1, 0]
    pkvs = [PublicKeyVar.alloc(cs, p) for p in pts]
    bvs = [Boolean.alloc(cs, b) for b in bits]
    apk, count = BlsSignatureVerifyGadget.mapped_aggregate(cs, pkvs, bvs)
    want = None
    for p, b in zip(pts, bits):
        if b:
            want = gc.g1_add(want, p)
    assert apk.pt.value() == want
    assert count.value == sum(bits)
    assert cs.is_satisfied()


def test_parameters_var_alloc_modes():
    """ParametersVar full AllocVar surface (reference src/constraints.rs:
    194-212): the generator allocates as constant, input, or witness; the
    witness-mode allocation is satisfiable (on-curve check holds for the
    generator) and composes with a pairing-free gadget use (negate)."""
    from bls_verify_gadget_tpu.r1cs.system import AllocationMode
    from bls_verify_gadget_tpu.r1cs.verify import ParametersVar

    for mode in (AllocationMode.CONSTANT, AllocationMode.INPUT,
                 AllocationMode.WITNESS):
        cs = ConstraintSystem()
        base = cs.num_constraints
        pv = ParametersVar.alloc(cs, mode=mode)
        assert pv.g1.x.value == C.G1_GEN[0]
        assert pv.g1.y.value == C.G1_GEN[1]
        neg = pv.g1.negate()
        assert neg.y.value == (-C.G1_GEN[1]) % C.P
        assert cs.is_satisfied(), (mode, cs.which_unsatisfied())
        if mode == AllocationMode.CONSTANT:
            assert cs.num_constraints == base  # no rows for constants
        else:
            # non-constant allocations carry the on-curve enforcement
            assert cs.num_constraints > base

    # witness-mode with a non-generator (but on-curve) parameter point
    cs = ConstraintSystem()
    p2 = gc.g1_add(C.G1_GEN, C.G1_GEN)
    pv = ParametersVar.alloc(cs, p2, AllocationMode.WITNESS)
    assert (pv.g1.x.value, pv.g1.y.value) == p2
    assert cs.is_satisfied(), cs.which_unsatisfied()

    # an off-curve parameter point must NOT satisfy the on-curve row
    cs = ConstraintSystem()
    ParametersVar.alloc(cs, (C.G1_GEN[0], C.G1_GEN[1] + 1),
                        AllocationMode.WITNESS)
    assert not cs.is_satisfied()
