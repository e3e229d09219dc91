"""Device pairing vs golden (after final exponentiation — line
normalisations differ by subfield factors the easy part kills).

Heavy tier: each jitted multi_pairing is a multi-minute XLA CPU compile;
the default tier's pairing coverage is the staged smoke pipeline
(test_verify_smoke.py) plus the golden differentials."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy

from bls_verify_gadget_tpu.ops import pairing as PR, tower as T
from bls_verify_gadget_tpu.ops.fp import FP
from bls_verify_gadget_tpu.golden import pairing as gp, curve as gc
from bls_verify_gadget_tpu import constants as C

rng = random.Random(5)


def _enc1(ps):
    return (
        jnp.asarray(FP.encode([p[0] for p in ps])),
        jnp.asarray(FP.encode([p[1] for p in ps])),
    )


def _enc2(qs):
    return (
        T.fp2_encode_batch([q[0] for q in qs]),
        T.fp2_encode_batch([q[1] for q in qs]),
    )


def _rows(fdev, i):
    got = T.fp12_decode(jax.tree.map(np.asarray, fdev))
    return tuple(tuple((c2[0][i], c2[1][i]) for c2 in c6) for c6 in got)


def test_single_pairing_matches_golden():
    B = 2
    ks1 = [rng.randrange(1, C.R) for _ in range(B)]
    ks2 = [rng.randrange(1, C.R) for _ in range(B)]
    ps = [gc.g1_mul(C.G1_GEN, k) for k in ks1]
    qs = [gc.g2_mul(C.G2_GEN, k) for k in ks2]
    px, py = _enc1(ps)
    qx, qy = _enc2(qs)
    valid = jnp.ones((B,), bool)
    f = jax.jit(
        lambda px, py, qx, qy, v: PR.multi_pairing([((px, py), (qx, qy), v)])
    )(px, py, qx, qy, valid)
    for i in range(B):
        assert _rows(f, i) == gp.pairing(ps[i], qs[i]), i


def test_two_pair_product_and_masks():
    sk = 12345
    h = gc.g2_mul(C.G2_GEN, 777)
    sig = gc.g2_mul(h, sk)
    pk = gc.g1_mul(C.G1_GEN, sk)
    ng = gc.g1_neg(C.G1_GEN)
    B = 2
    p1 = _enc1([ng] * B)
    q1 = _enc2([sig, sig])
    p2 = _enc1([pk, pk])
    q2 = _enc2([h, gc.g2_mul(C.G2_GEN, 778)])  # second element: wrong h
    v = jnp.ones((B,), bool)
    fn = jax.jit(
        lambda a, b, c, d, v1, v2: PR.multi_pairing([(a, b, v1), (c, d, v2)])
    )
    f = fn(p1, q1, p2, q2, v, v)
    ones = np.asarray(T.fp12_is_one(f))
    assert ones.tolist() == [True, False]
    # masked-out first pair leaves only e(pk, .)
    f2 = fn(p1, q1, p2, q2, jnp.zeros((B,), bool), v)
    for i, qq in enumerate([h, gc.g2_mul(C.G2_GEN, 778)]):
        assert _rows(f2, i) == gp.multi_pairing([pk], [qq]), i
