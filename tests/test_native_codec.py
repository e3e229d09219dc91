"""Native C++ batch codec vs golden: all deserialization vectors + random
roundtrips.  Skips cleanly when no toolchain is available."""

import random

import pytest

from vector_loader import load_suite, unhex
from bls_verify_gadget_tpu import native_codec as NC
from bls_verify_gadget_tpu.golden import bls as gbls, curve as gc
from bls_verify_gadget_tpu import constants as C

pytestmark = pytest.mark.skipif(not NC.available(), reason="no native toolchain")


@pytest.mark.parametrize(
    "suite,field,dec_native,dec_golden",
    [
        ("deserialization_G1", "pubkey", NC.g1_decompress_batch, gbls.g1_decompress),
        ("deserialization_G2", "signature", NC.g2_decompress_batch, gbls.g2_decompress),
    ],
)
def test_native_deserialization_vectors(suite, field, dec_native, dec_golden):
    blobs, expected = [], []
    for name, vec in load_suite(suite):
        data = unhex(vec["input"][field])
        try:
            exp = ("ok", dec_golden(data))
        except ValueError:
            exp = ("reject", None)
        if len(data) in (48, 96):
            blobs.append(data)
            expected.append((name, exp))
    outs = dec_native(blobs)
    for (name, (kind, g)), got in zip(expected, outs):
        if kind == "ok":
            assert not isinstance(got, str), (name, got)
            assert got == g, name
        else:
            assert isinstance(got, str), (name, got)


def test_native_roundtrips():
    rng = random.Random(0)
    pts = [gbls.sk_to_pk(rng.randrange(1, C.R)) for _ in range(8)] + [None]
    comp = NC.g1_compress_batch(pts)
    assert comp == [gbls.g1_compress(p) for p in pts]
    assert NC.g1_decompress_batch(comp) == pts
    sigs = [gc.g2_mul(C.G2_GEN, rng.randrange(1, C.R)) for _ in range(4)] + [None]
    comp2 = NC.g2_compress_batch(sigs)
    assert comp2 == [gbls.g2_compress(p) for p in sigs]
    assert NC.g2_decompress_batch(comp2) == sigs
