"""Full in-circuit BLS verify gadget: true/false agreement with golden and
satisfiability — the reference's src/constraints.rs:299-376 test pattern.
Heavy (two ~790k-row circuit builds); kept in one module so -x ordering
runs the cheap suites first."""

import pytest

from bls_verify_gadget_tpu.r1cs.system import ConstraintSystem
from bls_verify_gadget_tpu.r1cs.gadgets import UInt8
from bls_verify_gadget_tpu.r1cs.verify import (
    ParametersVar,
    PublicKeyVar,
    SignatureVar,
    BlsSignatureVerifyGadget as G,
)
from bls_verify_gadget_tpu.golden import bls as gbls


SK = 0x1234567
MSG = b"hello bls circuit verify"


def _build(msg, pk, sig):
    cs = ConstraintSystem()
    ok = G.verify(
        cs,
        ParametersVar.constant(cs),
        PublicKeyVar.alloc(cs, pk),
        [UInt8.alloc(cs, b) for b in msg],
        SignatureVar.alloc(cs, sig),
    )
    return cs, ok


def test_aggregate_verify_circuit():
    """Bitmap aggregate + in-circuit verify (reference's 512-key test at
    src/constraints.rs:394-419; n=32 here for CI speed — the 512-key config
    is recorded in BASELINE.md)."""
    import random

    from bls_verify_gadget_tpu.r1cs.gadgets import Boolean

    rng = random.Random(5)
    n = 32
    sks = [rng.randrange(1, 2**200) for _ in range(n)]
    pks = [gbls.sk_to_pk(s) for s in sks]
    bits = [1, 1] + [0] * (n - 2)
    agg_sig = gbls.sign(sks[0] + sks[1], MSG)
    cs = ConstraintSystem()
    pkvs = [PublicKeyVar.alloc(cs, p) for p in pks]
    bvs = [Boolean.alloc(cs, b) for b in bits]
    ok, count = G.aggregate_verify(
        cs,
        ParametersVar.constant(cs),
        pkvs,
        bvs,
        [UInt8.alloc(cs, b) for b in MSG],
        SignatureVar.alloc(cs, agg_sig),
    )
    assert ok.value == 1
    assert count.value == 2
    assert cs.is_satisfied(), cs.which_unsatisfied()


def test_verify_circuit_true_and_false():
    pk = gbls.sk_to_pk(SK)
    sig = gbls.sign(SK, MSG)
    cs, ok = _build(MSG, pk, sig)
    assert ok.value == 1
    assert cs.is_satisfied(), cs.which_unsatisfied()
    print(f"\nverify circuit constraints: {cs.num_constraints}")

    tampered = b"Hello bls circuit verify"
    cs2, ok2 = _build(tampered, pk, sig)
    assert ok2.value == 0
    assert cs2.is_satisfied(), cs2.which_unsatisfied()
