"""Batched SHA-256 kernel vs hashlib, plus RFC 9380 expand_message_xmd
vectors (the reference checks the same vectors in-circuit,
src/hasher.rs:819-886)."""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from bls_verify_gadget_tpu.ops.sha256 import sha256_bytes
from bls_verify_gadget_tpu.ops.hash_to_g2 import expand_message_xmd
from bls_verify_gadget_tpu.golden.hash_to_curve import expand_message_xmd as xmd_golden


def test_sha256_vs_hashlib():
    rng = np.random.default_rng(0)
    for L in (0, 3, 32, 55, 56, 64, 143):
        msgs = rng.integers(0, 256, size=(4, L), dtype=np.uint32)
        out = np.asarray(jax.jit(lambda d, L=L: sha256_bytes(d, L))(jnp.asarray(msgs)))
        for i in range(msgs.shape[0]):
            want = hashlib.sha256(bytes(msgs[i].astype(np.uint8))).digest()
            assert bytes(out[i].astype(np.uint8)) == want, (L, i)


RFC_DST = b"QUUX-V01-CS02-with-expander-SHA256-128"
RFC_VECTORS = [
    (b"", 0x20, "68a985b87eb6b46952128911f2a4412bbc302a9d759667f87f7a21d803f07235"),
    (b"abc", 0x20, "d8ccab23b5985ccea865c6c97b6e5b8350e794e603b4b97902f53a8a0d605615"),
    (b"abcdef0123456789", 0x20, "eff31487c770a893cfb36f912fbfcbff40d5661771ca4b2cb4eafe524333f5c1"),
]


def test_xmd_rfc_vectors_golden():
    for msg, n, want in RFC_VECTORS:
        assert xmd_golden(msg, RFC_DST, n).hex() == want


def test_xmd_device_vs_golden():
    msgs = [b"abc", b"def", b"xyz", b"\x00\x00\x00"]
    mu = jnp.asarray(np.stack([np.frombuffer(m, np.uint8).astype(np.uint32) for m in msgs]))
    out = np.asarray(jax.jit(lambda m: expand_message_xmd(m, 3, RFC_DST, 128))(mu))
    for i, m in enumerate(msgs):
        assert bytes(out[i].astype(np.uint8)) == xmd_golden(m, RFC_DST, 128)
