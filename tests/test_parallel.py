"""Multi-chip sharding tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8).  Net-new surface vs the reference
(whose only parallelism is single-host rayon, SURVEY.md sec 5)."""

import random

import jax
import jax.numpy as jnp
import pytest

from bls_verify_gadget_tpu.ops import curve as CV
from bls_verify_gadget_tpu.parallel import (
    make_mesh,
    sharded_aggregate_pubkeys,
    sharded_aggregate_signatures,
    sharded_masked_aggregate,
)
from bls_verify_gadget_tpu.golden import curve as gc
from bls_verify_gadget_tpu import constants as C

rng = random.Random(9)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_pubkey_aggregation():
    mesh = make_mesh()
    n = 16
    pts = [gc.g1_mul(C.G1_GEN, rng.randrange(1, C.R)) for _ in range(n)]
    d = CV.g1_encode_batch(pts)
    total = sharded_aggregate_pubkeys(mesh, d)
    want = None
    for p in pts:
        want = gc.g1_add(want, p)
    assert CV.g1_decode(total) == want


def test_sharded_signature_aggregation():
    mesh = make_mesh()
    n = 8
    pts = [gc.g2_mul(C.G2_GEN, rng.randrange(1, C.R)) for _ in range(n)]
    d = CV.g2_encode_batch(pts)
    total = sharded_aggregate_signatures(mesh, d)
    want = None
    for p in pts:
        want = gc.g2_add(want, p)
    assert CV.g2_decode(total) == want


def test_sharded_masked_aggregate():
    mesh = make_mesh()
    n = 16
    pts = [gc.g1_mul(C.G1_GEN, rng.randrange(1, C.R)) for _ in range(n)]
    bits = [rng.randrange(2) for _ in range(n)]
    d = CV.g1_encode_batch(pts)
    total, count = sharded_masked_aggregate(mesh, d, jnp.asarray(bits, jnp.uint32))
    assert int(count) == sum(bits)
    want = None
    for p, b in zip(pts, bits):
        if b:
            want = gc.g1_add(want, p)
    assert CV.g1_decode(total) == want
