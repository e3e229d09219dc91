"""Default-tier end-to-end device smoke: ONE compile of the staged verify
pipeline (hash_to_g2 / Miller loop / final exponentiation — the same three
programs bench.py compiles) at batch 4, driven against a real conformance
vector plus negative probes.

This is the fast tier's only full device-pipeline compile; the exhaustive
device conformance sweeps (all 29 verify vectors, mixed lengths, sign
suite) live in the heavy tier (test_models.py), and the pairing-vs-golden
differentials in test_pairing.py."""

import json
import pathlib

import jax
import numpy as np

from bls_verify_gadget_tpu.golden import bls as gbls
from bls_verify_gadget_tpu.models.bls import (
    encode_messages,
    encode_pubkeys,
    encode_signatures,
)


def test_staged_verify_smoke(staged_fns):
    vec_dir = pathlib.Path(__file__).parent / "vectors" / "verify"
    case = json.loads(
        (vec_dir / "verify_valid_case_195246ee3bd3b6ec.json").read_text()
    )["input"]

    def unhex(s):
        return bytes.fromhex(s[2:] if s.startswith("0x") else s)

    pk = gbls.g1_decompress(unhex(case["pubkey"]), check_subgroup=False)
    sig = gbls.g2_decompress(unhex(case["signature"]), check_subgroup=False)
    msg = unhex(case["message"])

    # batch of 4: [valid, tampered message, identity pk, valid]
    tampered = bytes([msg[0] ^ 1]) + msg[1:]
    pk_b = encode_pubkeys([pk, pk, None, pk])
    sig_b = encode_signatures([sig] * 4)
    msg_b = encode_messages([msg, tampered, msg, msg])

    # session-shared compiled stages (tests/conftest.py staged_fns)
    bls, hash_fn, miller_fn, fexp_fn = staged_fns

    # (bls.verify is finalexp_stage(miller_stage(.., hash_stage(..))) by
    # construction — models/bls.py — so the staged drive covers the
    # composed API's semantics without a second full-pipeline compile)
    f, ok = miller_fn(pk_b, sig_b, hash_fn(msg_b))
    got = [bool(b) for b in np.asarray(jax.device_get(fexp_fn(f, ok)))]
    assert got == [True, False, False, True]
