"""Device-side SHA-256 witness generation vs the gadget's own (host,
python-int) allocation stream: exact per-witness agreement, in order
(r1cs/device_witness.py contract)."""

import random

import numpy as np
import jax.numpy as jnp

from bls_verify_gadget_tpu import constants as C
from bls_verify_gadget_tpu.r1cs.system import ConstraintSystem
from bls_verify_gadget_tpu.r1cs.gadgets import UInt8
from bls_verify_gadget_tpu.r1cs.sha256 import sha256_gadget
from bls_verify_gadget_tpu.r1cs import device_witness as DW

rng = random.Random(7)


def _host_segment(msg: bytes):
    """Build the gadget, return its witness segment as table indices."""
    cs = ConstraintSystem()
    msg_vars = [UInt8.alloc(cs, b) for b in msg]
    start = len(cs.assignments)
    out = sha256_gadget(cs, msg_vars)
    assert cs.is_satisfied()
    seg = cs.assignments[start:]
    lut = {0: 0, 1: 1, C.P - 1: 2}
    assert all(v in lut for v in seg), "unexpected witness value in SHA segment"
    return [lut[v] for v in seg], bytes(b.value for b in out)


def _check_length(L: int, batch: int = 3):
    msgs = [bytes(rng.randrange(256) for _ in range(L)) for _ in range(batch)]
    host = [_host_segment(m) for m in msgs]
    import hashlib

    for (seg, digest), m in zip(host, msgs):
        assert digest == hashlib.sha256(m).digest()
    arr = np.zeros((batch, L), np.uint32)
    for i, m in enumerate(msgs):
        arr[i, :L] = np.frombuffer(m, np.uint8)
    idx = np.asarray(DW.sha256_gadget_witness_indices(jnp.asarray(arr), L))
    assert idx.shape == (batch, len(host[0][0])), (idx.shape, len(host[0][0]))
    for i, (seg, _) in enumerate(host):
        assert idx[i].tolist() == seg, f"witness mismatch for element {i} (L={L})"


def test_single_block_message():
    _check_length(24)


def test_two_block_message():
    _check_length(100)


def test_xmd_b0_length_three_blocks():
    # the 64 + msg + 3 + 44-byte DST' buffer hash_to_g2's XMD b0 uses
    _check_length(135, batch=2)


def test_limbs_variant_matches_encoded_assignments():
    from bls_verify_gadget_tpu.r1cs import evaluator as EV

    msg = bytes(rng.randrange(256) for _ in range(24))
    cs = ConstraintSystem()
    msg_vars = [UInt8.alloc(cs, b) for b in msg]
    start = len(cs.assignments)
    sha256_gadget(cs, msg_vars)
    arr = np.frombuffer(msg, np.uint8).astype(np.uint32)[None, :]
    got = np.asarray(DW.sha256_gadget_witness_limbs(jnp.asarray(arr), 24))[0]
    want = EV.encode_witness_batch([cs.assignments[start:]])[0]
    assert got.shape == want.shape
    assert (got == np.asarray(want)).all()


def test_complete_witness_aux_splits():
    """evaluator.complete_witness fills the LC-split partial sums exactly
    as the host capping did (reverse-order dependency chain), and the
    completed device witness satisfies the exported circuit."""
    from bls_verify_gadget_tpu.r1cs import evaluator as EV
    from bls_verify_gadget_tpu.ops.fp import FP

    msg = bytes(rng.randrange(256) for _ in range(24))
    cs = ConstraintSystem()
    msg_vars = [UInt8.alloc(cs, b) for b in msg]
    sha256_gadget(cs, msg_vars)
    n_base = len(cs.assignments)
    prepared = EV.prepare(cs.to_arrays())
    assert len(prepared["aux_var"]) > 0, "SHA LCs must have split"
    assert cs.is_satisfied()

    host_full = EV.encode_witness_batch([cs.assignments])  # (1, W, L)
    base = jnp.asarray(host_full[:, :n_base])
    padded = jnp.pad(
        base, ((0, 0), (0, prepared["num_vars"] - n_base), (0, 0))
    )
    dev_full = np.asarray(EV.complete_witness(prepared, padded))
    assert (dev_full == np.asarray(host_full)).all()
    ok = np.asarray(EV.check_satisfied(prepared, dev_full))
    assert ok.all()


def test_xmd_witness_segment():
    """Device XMD witness mirror vs the expand_message_xmd gadget's own
    allocation stream (b0/b1 SHA segments + per-block xor bits), at the
    hash_to_field length (ell=8, 256 bytes) and a short 1-extra-block
    length."""
    from bls_verify_gadget_tpu.r1cs.hasher import expand_message_xmd_gadget
    from bls_verify_gadget_tpu.r1cs import device_witness as DW

    for lib in (64, 256):
        msgs = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(2)]
        host = []
        for m in msgs:
            cs = ConstraintSystem()
            mv = [UInt8.alloc(cs, b) for b in m]
            start = len(cs.assignments)
            expand_message_xmd_gadget(cs, mv, C.DST_G2, lib)
            assert cs.is_satisfied()
            seg = cs.assignments[start:]
            lut = {0: 0, 1: 1, C.P - 1: 2}
            host.append([lut[v] for v in seg])
        arr = np.stack([np.frombuffer(m, np.uint8) for m in msgs]).astype(np.uint32)
        idx = np.asarray(
            DW.xmd_witness_indices(jnp.asarray(arr), 32, C.DST_G2, lib)
        )
        assert idx.shape == (2, len(host[0])), (idx.shape, len(host[0]))
        for i in range(2):
            assert idx[i].tolist() == host[i], f"xmd mismatch elem {i} lib={lib}"
