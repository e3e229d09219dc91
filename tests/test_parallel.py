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
    make_sharded_verify,
    make_sharded_verify_staged,
    sharded_aggregate_pubkeys,
    sharded_aggregate_signatures,
    sharded_masked_aggregate,
    sharded_masked_aggregate_verify,
)
from bls_verify_gadget_tpu.golden import bls as gbls
from bls_verify_gadget_tpu.golden import curve as gc
from bls_verify_gadget_tpu import constants as C

rng = random.Random(9)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.heavy
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


@pytest.mark.heavy
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


@pytest.mark.heavy
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


# ---------------------------------------------------------------------------
# sharded verify APIs (heavy: full verify pipeline compiles on the CPU mesh;
# subgroup checks are disabled to keep the graphs compile-lean — the
# subgroup-check ladders run under shard_map in the driver dryrun every
# round, __graft_entry__.dryrun_multichip)
# ---------------------------------------------------------------------------

MSG = b"sharded verify test msg."  # 24 bytes


def _verify_batch(n):
    """n triples: slots 0..n-3 valid, slot n-2 tampered message (pairing
    fails), slot n-1 identity pk (must be rejected)."""
    from bls_verify_gadget_tpu.models.bls import (
        encode_messages,
        encode_pubkeys,
        encode_signatures,
    )

    sks = [rng.randrange(1, C.R) for _ in range(n)]
    pks = [gbls.sk_to_pk(sk) for sk in sks]
    sigs = [gbls.sign(sk, MSG) for sk in sks]
    msgs = [MSG] * n
    msgs[n - 2] = b"Sharded verify test msg."  # tampered
    pks[n - 1] = None  # identity pk -> False (src/bls.rs:433-437)
    want = [True] * (n - 2) + [False, False]
    return (
        encode_pubkeys(pks),
        encode_signatures(sigs),
        encode_messages(msgs),
        want,
    )


@pytest.fixture()
def no_subgroup_checks():
    from bls_verify_gadget_tpu.utils.config import config

    old = config.check_subgroups
    config.check_subgroups = False
    try:
        yield
    finally:
        config.check_subgroups = old


@pytest.mark.heavy
def test_make_sharded_verify(no_subgroup_checks):
    from bls_verify_gadget_tpu.models.bls import BatchedBLS

    mesh = make_mesh()
    pk, sig, msg, want = _verify_batch(8)
    run = make_sharded_verify(BatchedBLS(), mesh, len(MSG))
    got = [bool(b) for b in jax.device_get(run(pk, sig, msg))]
    assert got == want


@pytest.mark.heavy
def test_make_sharded_verify_staged(no_subgroup_checks):
    """Both stages individually + chained; must match the unstaged API's
    semantics on the same mixed-validity batch."""
    from bls_verify_gadget_tpu.models.bls import BatchedBLS

    mesh = make_mesh()
    pk, sig, msg, want = _verify_batch(8)
    run = make_sharded_verify_staged(BatchedBLS(), mesh, len(MSG))
    hash_fn, pair_fn = run.stages
    h = hash_fn(msg)
    got_stages = [bool(b) for b in jax.device_get(pair_fn(pk, sig, h))]
    assert got_stages == want
    got_chained = [bool(b) for b in jax.device_get(run(pk, sig, msg))]
    assert got_chained == want


@pytest.mark.heavy
def test_sharded_masked_aggregate_verify(no_subgroup_checks):
    """Bitmap-gated aggregate + verify across the mesh: an uneven bitmap
    that passes, then a corrupted bitmap that must fail
    (src/constraints.rs:153-191 semantics scaled out)."""
    from bls_verify_gadget_tpu.models.bls import (
        BatchedBLS,
        encode_messages,
        encode_pubkeys,
        encode_signatures,
    )

    bls = BatchedBLS()
    mesh = make_mesh()
    n = 8
    sks = [rng.randrange(1, C.R) for _ in range(n)]
    pks = [gbls.sk_to_pk(sk) for sk in sks]
    bits = [1, 0, 1, 1, 0, 0, 0, 1]  # uneven: 4 signers, not block-aligned
    agg_sig = gbls.sign(sum(sk for sk, b in zip(sks, bits) if b) % C.R, MSG)

    pk_aff = encode_pubkeys(pks)
    pk_jac = CV.pt_from_affine(CV.FP_OPS, *pk_aff)
    sig_aff = encode_signatures([agg_sig])
    msg = encode_messages([MSG])

    ok, count = sharded_masked_aggregate_verify(
        bls, mesh, pk_jac, jnp.asarray(bits, jnp.uint32), sig_aff, msg, len(MSG)
    )
    assert bool(jax.device_get(ok)) and int(count) == sum(bits)

    bad_bits = list(bits)
    bad_bits[1] = 1  # extra pk the aggregate signature doesn't cover
    ok2, count2 = sharded_masked_aggregate_verify(
        bls, mesh, pk_jac, jnp.asarray(bad_bits, jnp.uint32), sig_aff, msg,
        len(MSG),
    )
    assert not bool(jax.device_get(ok2)) and int(count2) == sum(bad_bits)
