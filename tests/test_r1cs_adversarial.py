"""Adversarial-witness soundness tests for every hinted gadget (VERDICT r1
weak #6): forged witnesses must make the constraint system unsatisfiable.

The hint pattern trades an in-circuit computation for an allocated witness
plus an enforcement; soundness rests on the enforcement having no second
solution.  Each test either (a) mutates `cs.assignments` directly to the
forged value — the honest build already picks satisfying assignments, so
mutation is the only way to model a cheating prover — or (b) proves the
no-second-solution side condition with golden (python-int) arithmetic.
"""

import pytest

from bls_verify_gadget_tpu import constants as C
from bls_verify_gadget_tpu.golden import field as GF
from bls_verify_gadget_tpu.golden import curve as GC
from bls_verify_gadget_tpu.r1cs.system import ConstraintSystem
from bls_verify_gadget_tpu.r1cs.gadgets import FpVar, Boolean, UInt32
from bls_verify_gadget_tpu.r1cs.fields import Fp2Var
from bls_verify_gadget_tpu.r1cs import curve as RC


# ----------------------------------------------------------------------------
# hinted slope (r1cs/pairing.py:_hinted_slope): lambda * denom == numer
# ----------------------------------------------------------------------------

def test_hinted_slope_zero_denominator_unsatisfiable():
    """denom == 0 with numer != 0: the enforcement reads lambda*0 == numer,
    which no lambda satisfies — the hint cannot be abused to invent a slope."""
    from bls_verify_gadget_tpu.r1cs.pairing import _hinted_slope

    cs = ConstraintSystem()
    numer = Fp2Var.alloc(cs, (7, 11))
    denom = Fp2Var.alloc(cs, (0, 0))
    lam = _hinted_slope(cs, numer, denom)
    assert not cs.is_satisfied()
    # and for forged lambda witnesses too: lambda*0 == numer != 0 can never
    # hold, whatever the prover writes into the lambda (and product) slots
    for forged in (1, 12345):
        cs.assignments[lam.c0.lc[0][0]] = forged
        cs.assignments[lam.c1.lc[0][0]] = forged * 3
        assert not cs.is_satisfied()


def test_add_step_t_equals_q_unsatisfiable_when_live():
    """A small-order twist point (on-curve, outside the r-subgroup — the
    circuit skips subgroup checks like the reference) can drive the Miller
    accumulator back to T == Q at an addition step, zeroing BOTH slope sides
    and freeing lambda.  The strict enforcement denom * inv == valid closes
    it: with valid=1 and denom=0 the row reads 0 == 1 for every inv/lambda
    the prover writes."""
    from bls_verify_gadget_tpu.r1cs.pairing import _add_step

    q_val = ((5, 6), (7, 8))  # exact point irrelevant: only denom = 0 matters
    cs = ConstraintSystem()
    x = Fp2Var.alloc(cs, q_val[0])
    y = Fp2Var.alloc(cs, q_val[1])
    xp = FpVar.alloc(cs, 3)
    yp = FpVar.alloc(cs, 4)
    live = Boolean.constant(cs, 1)
    base = cs.num_constraints
    _add_step(cs, (x, y), (x, y), xp, yp, valid=live)  # T == Q
    assert not cs.is_satisfied()
    # forging the inverse / lambda witnesses (the last four allocations)
    # cannot help: denom is structurally 0 while valid is the constant 1
    for forged in (1, 999):
        for slot in range(len(cs.assignments) - 4, len(cs.assignments)):
            cs.assignments[slot] = forged
        assert not cs.is_satisfied()


def test_add_step_infinity_masked_pair_stays_satisfiable():
    """Completeness side: an infinity-masked pair (valid=0) walks the same
    ladder with (0,0) coordinates and T == Q at add steps; denom * inv == 0
    is satisfiable (inv = 0) and the free lambda only feeds lines that
    _neutral() replaces."""
    from bls_verify_gadget_tpu.r1cs.pairing import _add_step

    cs = ConstraintSystem()
    zero = Fp2Var.alloc(cs, (0, 0))
    xp = FpVar.alloc(cs, 3)
    yp = FpVar.alloc(cs, 4)
    dead = Boolean.constant(cs, 0)
    _add_step(cs, (zero, zero), (zero, zero), xp, yp, valid=dead)
    assert cs.is_satisfied()


def test_alloc_rejects_off_curve_points():
    """Witness allocation enforces the curve equation (arkworks parity), so
    the (0,0)-signature attack that would zero every doubling denominator in
    the Miller loop is unsatisfiable at allocation time."""
    cs = ConstraintSystem()
    RC.alloc_g2(cs, ((0, 0), (0, 0)))
    assert not cs.is_satisfied()

    cs = ConstraintSystem()
    RC.alloc_g1(cs, (5, 7))  # random non-point
    assert not cs.is_satisfied()

    # honest points still pass
    cs = ConstraintSystem()
    RC.alloc_g1(cs, C.G1_GEN)
    RC.alloc_g2(cs, C.G2_GEN)
    assert cs.is_satisfied()


def test_doubling_denominator_never_zero_on_curve():
    """Side condition for _dbl_step: on-curve implies y != 0, because the
    (twisted) curve group order is odd so there is no 2-torsion; equivalently
    x^3 + B has no root.  Checked for both curves via the golden order
    constants: gcd(order, 2) == 1."""
    # group orders: |E(Fp)| = h1 * r, |E'(Fp2)| = h2 * r — all odd factors
    assert (C.H_G1 * C.R) % 2 == 1
    assert (C.H_G2 * C.R) % 2 == 1


# ----------------------------------------------------------------------------
# hinted sqrt in SSWU (r1cs/hasher.py): y^2 == select(e_sq, gx1, gx2)
# ----------------------------------------------------------------------------

def test_sswu_exactly_one_branch_square():
    """The branch bit e_sq is a free witness; soundness needs exactly one of
    gx1, gx2 to be square so the wrong branch has no y.  gx2 = Z^3 u^6 gx1
    with Z non-square, so this holds whenever gx1 != 0; and gx1 = 0 is
    impossible because the iso-curve has odd order (no y=0 point).  Verify
    the non-square ratio on sample field elements via golden arithmetic."""
    Z = C.SSWU_Z
    assert not GF.fp2_is_square(Z)
    z3 = GF.fp2_mul(GF.fp2_sqr(Z), Z)
    for seed in range(1, 6):
        u = (seed, seed * seed + 3)
        u2 = GF.fp2_sqr(u)
        u6 = GF.fp2_mul(GF.fp2_sqr(u2), u2)
        ratio = GF.fp2_mul(z3, u6)  # gx2/gx1
        assert not GF.fp2_is_square(ratio)


def test_sswu_wrong_branch_witness_fails():
    """Concrete forgery: replicate the hint pattern, force the wrong branch
    bit, try a witness y — unsatisfiable (the selected target is non-square,
    so y^2 == target has no solution; spot-check plus the golden proof
    above)."""
    # pick gx1 square, gx2 = non-square (scaled by Z)
    gx1_val = GF.fp2_sqr((3, 8))
    gx2_val = GF.fp2_mul(C.SSWU_Z, gx1_val)
    assert not GF.fp2_is_square(gx2_val)

    cs = ConstraintSystem()
    gx1 = Fp2Var.alloc(cs, gx1_val)
    gx2 = Fp2Var.alloc(cs, gx2_val)
    e_sq = Boolean.alloc(cs, 0)  # forged: claims gx2 is the square branch
    y = Fp2Var.alloc(cs, (3, 8))  # any attempted witness
    target = gx1.select(e_sq, gx2)
    y.square().enforce_equal(target)
    assert not cs.is_satisfied()


# ----------------------------------------------------------------------------
# inverse_or_zero (r1cs/gadgets.py): a*i == 1 - z ; a*z == 0
# ----------------------------------------------------------------------------

def test_inverse_or_zero_cheat_nonzero_claimed_zero():
    cs = ConstraintSystem()
    a = FpVar.alloc(cs, 42)
    inv, z = a.inverse_or_zero()
    assert cs.is_satisfied()
    # forge: claim is_zero=1 (and zero out the inverse witness)
    cs.assignments[z.lc[0][0]] = 1
    cs.assignments[inv.lc[0][0]] = 0
    assert not cs.is_satisfied()


def test_inverse_or_zero_cheat_zero_claimed_nonzero():
    cs = ConstraintSystem()
    a = FpVar.alloc(cs, 0)
    inv, z = a.inverse_or_zero()
    assert cs.is_satisfied()
    # forge: claim is_zero=0 with an arbitrary "inverse"; a*i == 1-z becomes
    # 0 == 1, unsatisfiable for every inverse witness
    cs.assignments[z.lc[0][0]] = 0
    for forged in (0, 1, 17):
        cs.assignments[inv.lc[0][0]] = forged
        assert not cs.is_satisfied()


# ----------------------------------------------------------------------------
# UInt32.addmany (r1cs/gadgets.py): sum == out + sum carry_j 2^(32+j)
# ----------------------------------------------------------------------------

def test_addmany_wrong_sum_fails():
    cs = ConstraintSystem()
    x = UInt32.alloc(cs, 0xFFFFFFF0)
    y = UInt32.alloc(cs, 0x20)
    out = UInt32.addmany([x, y])
    assert out.value == 0x10 and cs.is_satisfied()
    # forge the low output bit: out bits are the last-allocated booleans
    # before the carry; flipping any one breaks the linear sum because the
    # carry terms have weight 2^32 and cannot compensate a low-bit delta
    idx = out.bits[0].lc[0][0]
    cs.assignments[idx] ^= 1
    assert not cs.is_satisfied()


def test_addmany_carry_cheat_fails():
    """Flipping a carry bit changes the RHS by 2^(32+j); no boolean output
    adjustment inside [0, 2^32) can compensate, so claiming a phantom carry
    (or dropping a real one) is unsatisfiable."""
    cs = ConstraintSystem()
    x = UInt32.alloc(cs, 5)
    y = UInt32.alloc(cs, 6)
    out = UInt32.addmany([x, y])
    assert out.value == 11 and cs.is_satisfied()
    carry_idx = len(cs.assignments) - 1  # single carry bit, allocated last
    assert cs.assignments[carry_idx] == 0
    cs.assignments[carry_idx] = 1  # phantom carry
    assert not cs.is_satisfied()
