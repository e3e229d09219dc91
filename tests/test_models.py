"""End-to-end device batched verify against the conformance verify vectors
(every case whose wire bytes decode; codec-level rejects are host-boundary
concerns covered by test_conformance_golden.py).

Heavy tier: each test cold-compiles a full device pipeline (mixed-length
hash + pairing + subgroup checks) on the CPU host — multi-minute XLA
compiles.  The default tier's device end-to-end coverage is
test_verify_smoke.py (one compile-lean staged pipeline)."""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.heavy

from vector_loader import load_suite, unhex
from bls_verify_gadget_tpu.golden import bls as gbls
from bls_verify_gadget_tpu.models.bls import (
    BatchedBLS,
    encode_pubkeys,
    encode_signatures,
    encode_messages,
)


def test_device_verify_conformance_all_vectors():
    """The FULL verify suite (29 vectors) through the device path, mirroring
    the reference driver (tests/tests.rs:239-268): deserialization failures
    map to False at the host boundary; every decodable case — any message
    length — runs in ONE mixed-length device batch (encode_messages_var)."""
    from bls_verify_gadget_tpu.models.bls import encode_messages_var

    results = {}
    cases = []
    total = 0
    for name, vec in load_suite("verify"):
        total += 1
        try:
            pk = gbls.g1_decompress(unhex(vec["input"]["pubkey"]), check_subgroup=False)
            sig = gbls.g2_decompress(unhex(vec["input"]["signature"]), check_subgroup=False)
        except ValueError:
            results[name] = False  # reference maps decode errors to false
            continue
        cases.append((name, pk, sig, unhex(vec["input"]["message"]), vec["output"]))
    assert total >= 29 and len(cases) >= 20
    bls = BatchedBLS()
    pk_b = encode_pubkeys([c[1] for c in cases])
    sig_b = encode_signatures([c[2] for c in cases])
    msg_b, lens, L = encode_messages_var([c[3] for c in cases])
    out = jax.jit(
        lambda p, s, m, l: bls.verify(p, s, m, L, msg_lens=l)
    )(pk_b, sig_b, msg_b, lens)
    for c, g in zip(cases, np.asarray(out)):
        results[c[0]] = bool(g)
    expected = {name: vec["output"] for name, vec in load_suite("verify")}
    bad = {k: (results[k], expected[k]) for k in expected if results[k] != expected[k]}
    assert not bad, bad


def test_device_sign_matches_vectors():
    """Batched device sign (hash + G2 scalar mul) against the FULL sign
    suite (all non-error vectors, mixed message lengths in one batch)."""
    from bls_verify_gadget_tpu.models.bls import encode_scalars, encode_messages_var
    from bls_verify_gadget_tpu.ops import curve as CV

    cases = []
    for name, vec in load_suite("sign"):
        if vec["output"] is None:
            continue
        sk = int.from_bytes(unhex(vec["input"]["privkey"]), "big")
        msg = unhex(vec["input"]["message"])
        cases.append((sk, msg, unhex(vec["output"])))
    assert len(cases) >= 9
    bls = BatchedBLS()
    sks = encode_scalars([c[0] for c in cases])
    msgs, lens, L = encode_messages_var([c[1] for c in cases])
    sig, ok = jax.jit(lambda s, m, l: bls.sign(s, m, L, msg_lens=l))(sks, msgs, lens)
    assert all(bool(b) for b in np.asarray(ok))
    pts = CV.g2_decode(sig)
    for (sk, msg, want), pt in zip(cases, pts):
        assert gbls.g2_compress(pt) == want


def test_device_sign_edge_scalars():
    """Zero key flagged invalid; sk = r-1 matches golden."""
    from bls_verify_gadget_tpu.models.bls import encode_scalars
    from bls_verify_gadget_tpu.ops import curve as CV
    from bls_verify_gadget_tpu import constants as C

    msg = b"\xab" * 32
    sks = [0, C.R - 1, 12345]
    bls_m = BatchedBLS()
    sig, ok = jax.jit(lambda s, m: bls_m.sign(s, m, 32))(
        encode_scalars(sks), encode_messages([msg] * 3)
    )
    oks = [bool(b) for b in np.asarray(ok)]
    assert oks == [False, True, True]
    pts = CV.g2_decode(sig)
    for sk, pt in zip(sks[1:], pts[1:]):
        assert pt == gbls.sign(sk, msg)
