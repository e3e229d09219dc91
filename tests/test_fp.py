"""Tier-2 differential tests: JAX limb field (ops/fp.py) vs python golden.
Mirrors the reference's native-vs-gadget differential pattern
(reference src/hasher.rs:888-1026)."""

import random

import jax
import jax.numpy as jnp
import pytest

from bls_verify_gadget_tpu.ops.fp import FP, FR
from bls_verify_gadget_tpu import constants as C

rng = random.Random(0)
B = 16
XS = [rng.randrange(C.P) for _ in range(B)]
YS = [rng.randrange(C.P) for _ in range(B)]
AX = jnp.asarray(FP.encode(XS))
AY = jnp.asarray(FP.encode(YS))


def test_add_sub_mul_neg():
    assert FP.decode(jax.jit(FP.add)(AX, AY)) == [(x + y) % C.P for x, y in zip(XS, YS)]
    assert FP.decode(jax.jit(FP.sub)(AX, AY)) == [(x - y) % C.P for x, y in zip(XS, YS)]
    assert FP.decode(jax.jit(FP.mul)(AX, AY)) == [(x * y) % C.P for x, y in zip(XS, YS)]
    assert FP.decode(jax.jit(FP.neg)(AX)) == [(-x) % C.P for x in XS]


def test_edge_values():
    es = [0, 1, C.P - 1, C.P - 2]
    ae = jnp.asarray(FP.encode(es))
    assert FP.decode(jax.jit(FP.mul)(ae, ae)) == [(e * e) % C.P for e in es]
    assert FP.decode(jax.jit(FP.add)(ae, ae)) == [(2 * e) % C.P for e in es]
    assert FP.decode(jax.jit(FP.neg)(ae)) == [(-e) % C.P for e in es]


def test_inverse():
    got = FP.decode(jax.jit(FP.inv)(AX))
    assert got == [pow(x, -1, C.P) for x in XS]
    # 0 -> 0 semantics
    z = jnp.asarray(FP.encode([0]))
    assert FP.decode(jax.jit(FP.inv)(z)) == [0]


def test_sqrt():
    sq = [x * x % C.P for x in XS]
    got = FP.decode(jax.jit(FP.sqrt_3mod4)(jnp.asarray(FP.encode(sq))))
    assert all(s * s % C.P == q for s, q in zip(got, sq))


def test_mont_roundtrip():
    fm = jax.jit(FP.from_mont)(AX)
    assert FP.decode(jax.jit(FP.to_mont)(fm)) == XS


def test_fr_field():
    xr = [rng.randrange(C.R) for _ in range(B)]
    yr = [rng.randrange(C.R) for _ in range(B)]
    got = FR.decode(jax.jit(FR.mul)(jnp.asarray(FR.encode(xr)), jnp.asarray(FR.encode(yr))))
    assert got == [(x * y) % C.R for x, y in zip(xr, yr)]


def test_mul_small():
    assert FP.decode(jax.jit(lambda a: FP.mul_small(a, 3))(AX)) == [3 * x % C.P for x in XS]


def test_half():
    from bls_verify_gadget_tpu.ops.pairing import fp_half

    got = FP.decode(jax.jit(fp_half)(AX))
    inv2 = pow(2, -1, C.P)
    assert got == [x * inv2 % C.P for x in XS]
