"""Distinct-message aggregate verification (IETF AggregateVerify): golden
and device paths, positive and negative cases.  Net-new API surface vs the
reference."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from bls_verify_gadget_tpu.golden import bls as gbls
from bls_verify_gadget_tpu.models.bls import (
    BatchedBLS,
    encode_pubkeys,
    encode_signatures,
    encode_messages,
)

rng = random.Random(7)
N = 3
PAIRS = [gbls.keygen(rng) for _ in range(N)]
MSGS = [bytes([i]) * 32 for i in range(N)]
SIGS = [gbls.sign(sk, m) for (sk, _), m in zip(PAIRS, MSGS)]
AGG = gbls.aggregate_signatures(SIGS)


def test_golden_aggregate_verify_distinct():
    pks = [pk for _, pk in PAIRS]
    assert gbls.aggregate_verify(pks, MSGS, AGG)
    # permuted messages must fail
    assert not gbls.aggregate_verify(pks, [MSGS[1], MSGS[0], MSGS[2]], AGG)
    # wrong signature must fail
    assert not gbls.aggregate_verify(pks, MSGS, SIGS[0])


def test_device_aggregate_verify_distinct():
    bls = BatchedBLS()
    pks = encode_pubkeys([pk for _, pk in PAIRS])
    sig = encode_signatures([AGG])
    good = encode_messages(MSGS)
    bad = encode_messages([MSGS[1], MSGS[0], MSGS[2]])
    fn = jax.jit(lambda p, s, m: bls.aggregate_verify_distinct(p, s, m, 32))
    assert bool(np.asarray(fn(pks, sig, good)))
    assert not bool(np.asarray(fn(pks, sig, bad)))
