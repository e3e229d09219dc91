"""End-to-end device batched verify against the conformance verify vectors
(every case whose wire bytes decode; codec-level rejects are host-boundary
concerns covered by test_conformance_golden.py)."""

import numpy as np
import jax
import pytest

from vector_loader import load_suite, unhex
from bls_verify_gadget_tpu.golden import bls as gbls
from bls_verify_gadget_tpu.models.bls import (
    BatchedBLS,
    encode_pubkeys,
    encode_signatures,
    encode_messages,
)


def _device_cases():
    cases = []
    for name, vec in load_suite("verify"):
        try:
            pk = gbls.g1_decompress(unhex(vec["input"]["pubkey"]), check_subgroup=False)
            sig = gbls.g2_decompress(unhex(vec["input"]["signature"]), check_subgroup=False)
        except ValueError:
            continue
        msg = unhex(vec["input"]["message"])
        if len(msg) != 32:
            continue
        cases.append((name, pk, sig, msg, vec["output"]))
    return cases


def test_device_verify_conformance():
    cases = _device_cases()
    assert len(cases) >= 20
    bls = BatchedBLS()
    pk_b = encode_pubkeys([c[1] for c in cases])
    sig_b = encode_signatures([c[2] for c in cases])
    msg_b = encode_messages([c[3] for c in cases])
    out = jax.jit(lambda p, s, m: bls.verify(p, s, m, 32))(pk_b, sig_b, msg_b)
    got = [bool(b) for b in np.asarray(out)]
    bad = [(c[0], g, c[4]) for c, g in zip(cases, got) if g != c[4]]
    assert not bad, bad


def test_device_sign_matches_vectors():
    """Batched device sign (hash + G2 scalar mul) against the sign suite."""
    from bls_verify_gadget_tpu.models.bls import encode_scalars
    from bls_verify_gadget_tpu.ops import curve as CV

    cases = []
    for name, vec in load_suite("sign"):
        if vec["output"] is None:
            continue
        sk = int.from_bytes(unhex(vec["input"]["privkey"]), "big")
        msg = unhex(vec["input"]["message"])
        cases.append((sk, msg, unhex(vec["output"])))
    L = len(cases[0][1])
    cases = [c for c in cases if len(c[1]) == L]
    bls = BatchedBLS()
    sks = encode_scalars([c[0] for c in cases])
    msgs = encode_messages([c[1] for c in cases])
    sig, ok = jax.jit(lambda s, m: bls.sign(s, m, L))(sks, msgs)
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
