"""Differential tests: JAX curve kernels (ops/curve.py) vs python golden,
covering complete-addition edge cases, scalar mul, endomorphisms, subgroup
checks, cofactor clearing and point sums (reference `.check()` and
aggregation semantics, src/bls.rs:182-196, :438-447)."""

import random

import jax
import jax.numpy as jnp
import pytest

from bls_verify_gadget_tpu.ops import curve as CV
from bls_verify_gadget_tpu.ops.limbs import ints_to_limbs
from bls_verify_gadget_tpu.golden import curve as gc, field as GF
from bls_verify_gadget_tpu import constants as C

rng = random.Random(3)
KS = [rng.randrange(1, C.R) for _ in range(4)]
G1_PTS = [gc.g1_mul(C.G1_GEN, k) for k in KS]
G2_PTS = [gc.g2_mul(C.G2_GEN, k) for k in KS]
D1 = CV.g1_encode_batch(G1_PTS)
D2 = CV.g2_encode_batch(G2_PTS)


def rand_g2_curve_pt():
    """Random point on E'(Fp2), generally NOT in the r-subgroup."""
    while True:
        x = (rng.randrange(C.P), rng.randrange(C.P))
        y2 = GF.fp2_add(GF.fp2_mul(GF.fp2_sqr(x), x), C.B_G2)
        y = GF.fp2_sqrt(y2)
        if y is not None:
            return (x, y)


def test_g1_add_double():
    out = jax.jit(lambda p: CV.pt_add(CV.FP_OPS, p, CV.pt_double(CV.FP_OPS, p)))(D1)
    assert CV.g1_decode(out) == [gc.g1_mul(p, 3) for p in G1_PTS]


def test_g1_identity_and_inverse_cases():
    a = [None, None, G1_PTS[0], G1_PTS[1]]
    b = [G1_PTS[0], None, None, gc.g1_neg(G1_PTS[1])]
    out = jax.jit(lambda x, y: CV.pt_add(CV.FP_OPS, x, y))(
        CV.g1_encode_batch(a), CV.g1_encode_batch(b)
    )
    assert CV.g1_decode(out) == [gc.g1_add(x, y) for x, y in zip(a, b)]


def test_g2_add_double():
    out = jax.jit(lambda p: CV.pt_add(CV.FP2_OPS, p, CV.pt_double(CV.FP2_OPS, p)))(D2)
    assert CV.g2_decode(out) == [gc.g2_mul(p, 3) for p in G2_PTS]


def test_scalar_mul_const():
    out = jax.jit(lambda p: CV.pt_mul_const(CV.FP_OPS, p, 12345))(D1)
    assert CV.g1_decode(out) == [gc.g1_mul(p, 12345) for p in G1_PTS]


def test_scalar_mul_var():
    sc = [rng.randrange(C.R) for _ in range(4)]
    limbs = jnp.asarray(ints_to_limbs(sc, 16))
    out = jax.jit(lambda p, s: CV.pt_mul_var(CV.FP_OPS, p, s, 255))(D1, limbs)
    assert CV.g1_decode(out) == [gc.g1_mul(p, k) for p, k in zip(G1_PTS, sc)]


def test_psi_endomorphisms():
    assert CV.g2_decode(jax.jit(CV.g2_psi)(D2)) == [gc.g2_psi(p) for p in G2_PTS]
    assert CV.g2_decode(jax.jit(CV.g2_psi2)(D2)) == [gc.g2_psi2(p) for p in G2_PTS]


def test_clear_cofactor():
    raw = [rand_g2_curve_pt() for _ in range(4)]
    out = jax.jit(CV.g2_clear_cofactor)(CV.g2_encode_batch(raw))
    assert CV.g2_decode(out) == [gc.g2_clear_cofactor(p) for p in raw]


def test_subgroup_checks():
    ok2 = jax.jit(CV.g2_in_subgroup)(D2)
    assert all(bool(b) for b in ok2)
    raw = [rand_g2_curve_pt() for _ in range(4)]
    bad = jax.jit(CV.g2_in_subgroup)(CV.g2_encode_batch(raw))
    assert [bool(b) for b in bad] == [gc.g2_in_subgroup_slow(p) for p in raw]
    ok1 = jax.jit(CV.g1_in_subgroup)(D1)
    assert all(bool(b) for b in ok1)


def test_point_sum():
    out = jax.jit(lambda p: CV.pt_sum(CV.FP_OPS, p, axis=0))(D1)
    want = None
    for p in G1_PTS:
        want = gc.g1_add(want, p)
    assert CV.g1_decode(out) == want
