"""Differential tests: JAX tower (ops/tower.py) vs python golden."""

import random

import jax
import pytest

from bls_verify_gadget_tpu.ops import tower as T
from bls_verify_gadget_tpu.golden import field as GF
from bls_verify_gadget_tpu import constants as C

rng = random.Random(7)
B = 4


def rfp2_list():
    return [(rng.randrange(C.P), rng.randrange(C.P)) for _ in range(B)]


def enc6(xs):
    return tuple(T.fp2_encode_batch([x[i] for x in xs]) for i in range(3))


def dec6(d):
    cols = [list(zip(*T.fp2_decode(d[i]))) for i in range(3)]
    return [tuple(cols[i][j] for i in range(3)) for j in range(B)]


def rfp6_list():
    return [
        tuple((rng.randrange(C.P), rng.randrange(C.P)) for _ in range(3))
        for _ in range(B)
    ]


def rfp12_list():
    return [
        (
            tuple((rng.randrange(C.P), rng.randrange(C.P)) for _ in range(3)),
            tuple((rng.randrange(C.P), rng.randrange(C.P)) for _ in range(3)),
        )
        for _ in range(B)
    ]


def enc12(xs):
    return (enc6([x[0] for x in xs]), enc6([x[1] for x in xs]))


def dec12(d):
    return [(x, y) for x, y in zip(dec6(d[0]), dec6(d[1]))]


A2, B2 = rfp2_list(), rfp2_list()
DA, DB = T.fp2_encode_batch(A2), T.fp2_encode_batch(B2)


def _fp2_got(dev):
    return list(zip(*T.fp2_decode(dev)))


def test_fp2_ops():
    assert _fp2_got(jax.jit(T.fp2_mul)(DA, DB)) == [GF.fp2_mul(x, y) for x, y in zip(A2, B2)]
    assert _fp2_got(jax.jit(T.fp2_sqr)(DA)) == [GF.fp2_sqr(x) for x in A2]
    assert _fp2_got(jax.jit(T.fp2_inv)(DA)) == [GF.fp2_inv(x) for x in A2]
    assert _fp2_got(jax.jit(T.fp2_mul_xi)(DA)) == [GF.fp2_mul_xi(x) for x in A2]
    assert [int(s) for s in jax.jit(T.fp2_sgn0)(DA)] == [GF.fp2_sgn0(x) for x in A2]


def test_fp6_ops():
    a6, b6 = rfp6_list(), rfp6_list()
    da6, db6 = enc6(a6), enc6(b6)
    assert dec6(jax.jit(T.fp6_mul)(da6, db6)) == [GF.fp6_mul(x, y) for x, y in zip(a6, b6)]
    assert dec6(jax.jit(T.fp6_inv)(da6)) == [GF.fp6_inv(x) for x in a6]
    assert dec6(jax.jit(lambda a: T.fp6_frob(a, 1))(da6)) == [GF.fp6_frob(x, 1) for x in a6]


def test_fp12_ops():
    a12, b12 = rfp12_list(), rfp12_list()
    da12, db12 = enc12(a12), enc12(b12)
    assert dec12(jax.jit(T.fp12_mul)(da12, db12)) == [GF.fp12_mul(x, y) for x, y in zip(a12, b12)]
    assert dec12(jax.jit(T.fp12_sqr)(da12)) == [GF.fp12_sqr(x) for x in a12]
    assert dec12(jax.jit(T.fp12_inv)(da12)) == [GF.fp12_inv(x) for x in a12]
    for p in (1, 2, 6):
        got = dec12(jax.jit(lambda a, p=p: T.fp12_frob(a, p))(da12))
        assert got == [GF.fp12_frob(x, p) for x in a12], f"frob {p}"


def test_fp12_cyclotomic_sqr():
    """GS squaring == generic squaring on cyclotomic-subgroup elements."""
    fs = []
    for _ in range(B):
        f = (
            tuple((rng.randrange(C.P), rng.randrange(C.P)) for _ in range(3)),
            tuple((rng.randrange(C.P), rng.randrange(C.P)) for _ in range(3)),
        )
        f1 = GF.fp12_mul(GF.fp12_frob(f, 6), GF.fp12_inv(f))
        fs.append(GF.fp12_mul(GF.fp12_frob(f1, 2), f1))
    da = enc12(fs)
    got = dec12(jax.jit(T.fp12_cyclotomic_sqr)(da))
    assert got == [GF.fp12_sqr(f) for f in fs]
    assert [GF.fp12_cyclotomic_sqr(f) for f in fs] == [GF.fp12_sqr(f) for f in fs]


def test_fp12_sparse_mul_by_014():
    from bls_verify_gadget_tpu.ops.pairing import fp12_mul_by_014

    a12 = rfp12_list()
    c0g, c1g, c4g = rfp2_list(), rfp2_list(), rfp2_list()
    da12 = enc12(a12)
    dc0, dc1, dc4 = (
        T.fp2_encode_batch(c0g),
        T.fp2_encode_batch(c1g),
        T.fp2_encode_batch(c4g),
    )
    got = dec12(jax.jit(fp12_mul_by_014)(da12, dc0, dc1, dc4))
    Z2 = (0, 0)
    for i in range(B):
        g = ((c0g[i], c1g[i], Z2), (Z2, c4g[i], Z2))
        want = GF.fp12_mul(a12[i], g)
        assert got[i] == want, i
