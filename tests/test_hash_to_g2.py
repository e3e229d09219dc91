"""Differential tests: device hash-to-G2 pipeline vs golden, stage by stage
(mirrors the reference's circuit-vs-native tests src/hasher.rs:888-1026)."""

import numpy as np
import jax
import jax.numpy as jnp

from bls_verify_gadget_tpu.ops import hash_to_g2 as H
from bls_verify_gadget_tpu.ops import tower as T, curve as CV
from bls_verify_gadget_tpu.golden import hash_to_curve as gh
from bls_verify_gadget_tpu import constants as C

MSGS = [b"abc", b"def", b"xyz", b"\x00\x00\x00"]
L = 3
MU = jnp.asarray(
    np.stack([np.frombuffer(m, np.uint8).astype(np.uint32) for m in MSGS])
)


def _fp2_rows(dev):
    return list(zip(*T.fp2_decode(dev)))


def test_hash_to_field():
    u = jax.jit(lambda m: H.hash_to_field_fp2(m, L))(MU)
    for i, m in enumerate(MSGS):
        want = gh.hash_to_field_fp2(m)
        for j in range(2):
            assert _fp2_rows(u[j])[i] == want[j], (i, j)


def test_sqrt_candidates():
    import random

    rng = random.Random(11)
    from bls_verify_gadget_tpu.golden import field as GF

    sqs = []
    non_sqs = []
    while len(sqs) < 3 or len(non_sqs) < 3:
        a = (rng.randrange(C.P), rng.randrange(C.P))
        (sqs if GF.fp2_is_square(a) else non_sqs).append(a)
    vals = sqs[:3] + non_sqs[:3]
    da = T.fp2_encode_batch(vals)
    root, ok = jax.jit(H.fp2_sqrt_candidates)(da)
    oks = [bool(b) for b in ok]
    assert oks == [True] * 3 + [False] * 3
    roots = _fp2_rows(root)
    from bls_verify_gadget_tpu.golden.field import fp2_sqr

    for i in range(3):
        assert fp2_sqr(roots[i]) == vals[i]


def test_sswu_and_isogeny():
    u = jax.jit(lambda m: H.hash_to_field_fp2(m, L))(MU)
    s = jax.jit(H.sswu_map)(u[0])
    for i, m in enumerate(MSGS):
        uw = gh.hash_to_field_fp2(m)[0]
        want = gh.sswu_map_fp2(uw)
        got = (_fp2_rows(s[0])[i], _fp2_rows(s[1])[i])
        assert got == want, i
    pt = jax.jit(H.map_to_curve_g2)(u[0])
    got_aff = CV.g2_decode(pt)
    for i, m in enumerate(MSGS):
        uw = gh.hash_to_field_fp2(m)[0]
        assert got_aff[i] == gh.map_to_curve_g2(uw), i


def test_full_hash_to_g2(staged_fns):
    """Full device hash-to-G2 vs golden at the session smoke shapes:
    reuses the staged_fns hash executable (conftest) so the default tier
    compiles the full hash pipeline exactly ONCE.  The short-message
    (padding-edge) variant lives in the heavy tier below."""
    _, hash_fn, _, _ = staged_fns
    msgs32 = [bytes([i]) * 32 for i in range(4)]
    mu = jnp.asarray(
        np.stack(
            [np.frombuffer(m, np.uint8).astype(np.uint32) for m in msgs32]
        )
    )
    x, y, inf = hash_fn(mu)
    assert not any(bool(b) for b in np.asarray(inf))
    xs, ys = _fp2_rows(x), _fp2_rows(y)
    for i, m in enumerate(msgs32):
        assert (xs[i], ys[i]) == gh.hash_to_g2(m), i


import pytest  # noqa: E402


@pytest.mark.heavy
def test_full_hash_to_g2_short_msgs():
    """Short (3-byte) messages: exercises the xmd padding edge through the
    whole pipeline (the default tier covers it stage-by-stage above)."""
    pt = jax.jit(lambda m: H.hash_to_g2(m, L))(MU)
    got = CV.g2_decode(pt)
    for i, m in enumerate(MSGS):
        assert got[i] == gh.hash_to_g2(m), i
