"""Tier-1 unit tests on the golden path, mirroring the reference's inline
native tests (src/bls.rs:495-653): codec roundtrips, pk-from-sk, aggregation,
hash_to_g2 stability, subgroup-check agreement, cofactor-clearing agreement."""

import random

from bls_verify_gadget_tpu.golden import bls, curve as gc, field as GF, hash_to_curve as gh
from bls_verify_gadget_tpu.golden import pairing as gp
from bls_verify_gadget_tpu import constants as C

rng = random.Random(99)


def test_sk_codec_roundtrip():
    sk = rng.randrange(1, C.R)
    assert bls.sk_from_bytes(bls.sk_to_bytes(sk)) == sk


def test_point_codec_roundtrips():
    for k in (1, 2, 12345):
        pk = bls.sk_to_pk(k)
        assert bls.g1_decompress(bls.g1_compress(pk)) == pk
        sig = gc.g2_mul(C.G2_GEN, k)
        assert bls.g2_decompress(bls.g2_compress(sig)) == sig
    # infinity encodings
    assert bls.g1_decompress(bls.g1_compress(None)) is None
    assert bls.g2_decompress(bls.g2_compress(None)) is None


def test_sign_verify_roundtrip():
    sk, pk = bls.keygen(rng)
    msg = b"roundtrip"
    sig = bls.sign(sk, msg)
    assert bls.verify(pk, msg, sig)
    assert not bls.verify(pk, b"other", sig)


def test_aggregation_linearity():
    sks = [rng.randrange(1, C.R) for _ in range(4)]
    pks = [bls.sk_to_pk(s) for s in sks]
    msg = b"agg"
    sigs = [bls.sign(s, msg) for s in sks]
    agg_sig = bls.aggregate_signatures(sigs)
    assert bls.fast_aggregate_verify(pks, msg, agg_sig)
    # aggregate of empty input is None
    assert bls.aggregate_signatures([]) is None
    assert bls.aggregate_pubkeys([]) is None


def test_subgroup_check_agreement():
    """Fast endomorphism checks vs slow r*P == inf on random curve points."""
    for _ in range(3):
        while True:
            x = rng.randrange(C.P)
            y = GF.fp_sqrt((x * x % C.P * x + C.B_G1) % C.P)
            if y is not None:
                break
        p = (x, y)
        assert gc.g1_in_subgroup(p) == gc.g1_in_subgroup_slow(p)
    for _ in range(2):
        while True:
            x2 = (rng.randrange(C.P), rng.randrange(C.P))
            y2 = GF.fp2_sqrt(GF.fp2_add(GF.fp2_mul(GF.fp2_sqr(x2), x2), C.B_G2))
            if y2 is not None:
                break
        q = (x2, y2)
        assert gc.g2_in_subgroup(q) == gc.g2_in_subgroup_slow(q)


def test_cofactor_clearing_agreement():
    """Budroni-Pintore == h_eff scalar mul (the reference's slow method,
    src/hasher.rs:663-673)."""
    while True:
        x2 = (rng.randrange(C.P), rng.randrange(C.P))
        y2 = GF.fp2_sqrt(GF.fp2_add(GF.fp2_mul(GF.fp2_sqr(x2), x2), C.B_G2))
        if y2 is not None:
            break
    p = (x2, y2)
    assert gc.g2_clear_cofactor(p) == gc.g2_clear_cofactor_slow(p)


def test_final_exponentiation_identity():
    """Structured hard part == f^(3 (p^12-1)/r) on a random element."""
    f = (
        tuple((rng.randrange(C.P), rng.randrange(C.P)) for _ in range(3)),
        tuple((rng.randrange(C.P), rng.randrange(C.P)) for _ in range(3)),
    )
    d = (C.P**12 - 1) // C.R
    assert gp.final_exponentiation(f) == GF.fp12_pow(f, 3 * d)


def test_pairing_bilinearity():
    e = gp.pairing(gc.g1_mul(C.G1_GEN, 7), gc.g2_mul(C.G2_GEN, 11))
    base = gp.pairing(C.G1_GEN, C.G2_GEN)
    assert e == GF.fp12_pow(base, 77)
    assert not GF.fp12_is_one(base)
    assert GF.fp12_is_one(GF.fp12_pow(base, C.R))


def test_gt_serialization_roundtrip():
    e = gp.pairing(C.G1_GEN, gc.g2_mul(C.G2_GEN, 5))
    data = bls.gt_to_bytes(e)
    assert len(data) == 576
    assert bls.gt_from_bytes(data) == e
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bls.gt_from_bytes(data[:-1])
    bad = (C.P).to_bytes(48, "big") + data[48:]
    with _pytest.raises(ValueError):
        bls.gt_from_bytes(bad)


def test_hex_codecs():
    sk, pk = bls.keygen(random.Random(123))
    assert bls.sk_from_hex(bls.sk_to_hex(sk)) == sk
    assert bls.pk_from_hex(bls.pk_to_hex(pk)) == pk
    sig = bls.sign(sk, b"hex")
    assert bls.sig_from_hex(bls.sig_to_hex(sig)) == sig
    assert bls.pk_from_hex("0x" + bls.pk_to_hex(pk)) == pk
