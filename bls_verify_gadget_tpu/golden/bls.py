"""Golden BLS scheme (ETH2 min-pubkey-size: pk in G1, sig in G2) + ZCash
compressed codecs.

This is the host-side scheme API and the oracle for the batched device path
(models/bls.py).  Semantics mirror the reference crate:

  * keygen: uniform random scalar, no HKDF (reference src/bls.rs:395-409)
  * sign:  H(m) * sk, zero-sk rejected (reference src/bls.rs:411-425)
  * verify: identity-pk check, on-curve + subgroup checks for pk and sig,
    then e(-g1, sig) * e(pk, H(m)) == 1 (reference src/bls.rs:427-458)
  * aggregate: projective sums, None for empty input
    (reference src/bls.rs:183-196, :288-301)
  * codecs: 48B G1 / 96B G2 ZCash compressed with c/b/a flag bits, scalar
    little-endian 32B (reference src/bls.rs:79-121, :218-260, :315-357)
"""

import secrets

from ..constants import P, R, B_G1, B_G2, G1_GEN
from . import field as F
from . import curve as cv
from .hash_to_curve import hash_to_g2


class BLSError(Exception):
    """Mirrors the reference BLSError enum (src/bls.rs:359-377)."""


class InvalidSecretKey(BLSError):
    pass


class InvalidPublicKey(BLSError):
    pass


class InvalidSignature(BLSError):
    pass


HALF_P = (P - 1) // 2


# ----------------------------------------------------------------------------
# scalar codec (little-endian 32 bytes, reference src/bls.rs:79-121)
# ----------------------------------------------------------------------------

def sk_to_bytes(sk: int) -> bytes:
    return int(sk % R).to_bytes(32, "little")


def sk_from_bytes(data: bytes) -> int:
    if len(data) != 32:
        raise InvalidSecretKey("secret key must be 32 bytes")
    v = int.from_bytes(data, "little")
    if v >= R:
        raise InvalidSecretKey("scalar out of range")
    return v


def sk_from_hex(s: str) -> int:
    """Hex codec for the little-endian scalar encoding (reference
    TryFrom<&str> for PrivateKey, src/bls.rs:79-86)."""
    return sk_from_bytes(bytes.fromhex(s.removeprefix("0x")))


def sk_to_hex(sk: int) -> str:
    return sk_to_bytes(sk).hex()


def pk_from_hex(s: str):
    """48-byte compressed hex -> G1 point (reference src/bls.rs:218-236)."""
    return g1_decompress(bytes.fromhex(s.removeprefix("0x")))


def pk_to_hex(pt) -> str:
    return g1_compress(pt).hex()


def sig_from_hex(s: str):
    """96-byte compressed hex -> G2 point (reference src/bls.rs:315-333)."""
    return g2_decompress(bytes.fromhex(s.removeprefix("0x")))


def sig_to_hex(pt) -> str:
    return g2_compress(pt).hex()


# ----------------------------------------------------------------------------
# point compression (ZCash/ETH2 format)
# ----------------------------------------------------------------------------

def _fp_is_largest(y: int) -> bool:
    return y > HALF_P


def _fp2_is_largest(y) -> bool:
    """Lexicographic order with the u coefficient taking priority."""
    if y[1] != 0:
        return _fp_is_largest(y[1])
    return _fp_is_largest(y[0])


def g1_compress(pt) -> bytes:
    if pt is None:
        return bytes([0xC0]) + bytes(47)
    x, y = pt
    flags = 0x80 | (0x20 if _fp_is_largest(y) else 0)
    raw = bytearray(x.to_bytes(48, "big"))
    raw[0] |= flags
    return bytes(raw)


def g2_compress(pt) -> bytes:
    if pt is None:
        return bytes([0xC0]) + bytes(95)
    (x0, x1), y = pt
    flags = 0x80 | (0x20 if _fp2_is_largest(y) else 0)
    raw = bytearray(x1.to_bytes(48, "big") + x0.to_bytes(48, "big"))
    raw[0] |= flags
    return bytes(raw)


def _decompress_flags(data: bytes, nbytes: int):
    if len(data) != nbytes:
        raise ValueError(f"expected {nbytes} bytes, got {len(data)}")
    c_flag = (data[0] >> 7) & 1
    b_flag = (data[0] >> 6) & 1
    a_flag = (data[0] >> 5) & 1
    if c_flag != 1:
        raise ValueError("compression flag must be set")
    return b_flag, a_flag


def g1_decompress(data: bytes, check_subgroup: bool = True):
    """48-byte compressed G1 -> affine point or None (infinity).

    Raises ValueError on every reject case of the deserialization_G1 vectors
    (flag bits, padding, out-of-range x, not on curve, not in subgroup)."""
    b_flag, a_flag = _decompress_flags(data, 48)
    body = bytes([data[0] & 0x1F]) + data[1:]
    x = int.from_bytes(body, "big")
    if b_flag:
        if a_flag or x != 0:
            raise ValueError("malformed infinity encoding")
        return None
    if x >= P:
        raise ValueError("x out of range")
    y2 = (x * x % P * x + B_G1) % P
    y = F.fp_sqrt(y2)
    if y is None:
        raise ValueError("not on curve")
    if _fp_is_largest(y) != bool(a_flag):
        y = P - y
    pt = (x, y)
    if check_subgroup and not cv.g1_in_subgroup(pt):
        raise ValueError("not in subgroup")
    return pt


def g2_decompress(data: bytes, check_subgroup: bool = True):
    """96-byte compressed G2 -> affine point or None (infinity)."""
    b_flag, a_flag = _decompress_flags(data, 96)
    x1 = int.from_bytes(bytes([data[0] & 0x1F]) + data[1:48], "big")
    x0 = int.from_bytes(data[48:96], "big")
    if b_flag:
        if a_flag or x1 != 0 or x0 != 0:
            raise ValueError("malformed infinity encoding")
        return None
    if x0 >= P or x1 >= P:
        raise ValueError("x out of range")
    x = (x0, x1)
    y2 = F.fp2_add(F.fp2_mul(F.fp2_sqr(x), x), B_G2)
    y = F.fp2_sqrt(y2)
    if y is None:
        raise ValueError("not on curve")
    if _fp2_is_largest(y) != bool(a_flag):
        y = F.fp2_neg(y)
    pt = (x, y)
    if check_subgroup and not cv.g2_in_subgroup(pt):
        raise ValueError("not in subgroup")
    return pt


# ----------------------------------------------------------------------------
# scheme
# ----------------------------------------------------------------------------

def keygen(rng=None):
    """Uniform random nonzero scalar (the reference notes it skips RFC 5869
    HKDF, src/bls.rs:399-401)."""
    while True:
        sk = (secrets.randbits(256) if rng is None else rng.getrandbits(256)) % R
        if sk != 0:
            return sk, sk_to_pk(sk)


def sk_to_pk(sk: int):
    """pk = g1 * sk (reference src/bls.rs:210-216)."""
    return cv.g1_mul(G1_GEN, sk % R)


def sign(sk: int, msg: bytes):
    """sig = H(m) * sk; zero sk rejected (reference src/bls.rs:411-425)."""
    if sk % R == 0:
        raise InvalidSecretKey("zero secret key")
    return cv.g2_mul(hash_to_g2(msg), sk % R)


def verify(pk, msg: bytes, sig) -> bool:
    """Pairing-product verification (reference src/bls.rs:427-458).

    Raises BLSError subclasses for invalid inputs, mirroring the reference's
    Err paths; the conformance driver maps errors to False the way
    tests/tests.rs:247-262 does."""
    from . import pairing as pr

    if pk is None:
        raise InvalidPublicKey("identity public key")
    if not (cv.g1_is_on_curve(pk) and cv.g1_in_subgroup(pk)):
        raise InvalidPublicKey("pk fails curve/subgroup check")
    if sig is not None and not (cv.g2_is_on_curve(sig) and cv.g2_in_subgroup(sig)):
        raise InvalidSignature("sig fails curve/subgroup check")
    h = hash_to_g2(msg)
    prod = pr.multi_pairing([cv.g1_neg(G1_GEN), pk], [sig, h])
    return F.fp12_is_one(prod)


def aggregate_pubkeys(pks):
    """Projective sum; None for empty input (reference src/bls.rs:182-196)."""
    if not pks:
        return None
    acc = None
    for pk in pks:
        acc = cv.g1_add(acc, pk)
    return acc


def aggregate_signatures(sigs):
    """Projective sum; None for empty input (reference src/bls.rs:287-301)."""
    if not sigs:
        return None
    acc = None
    for s in sigs:
        acc = cv.g2_add(acc, s)
    return acc


def fast_aggregate_verify(pks, msg: bytes, sig) -> bool:
    """Aggregate pubkeys, then ordinary verify (reference
    tests/tests.rs:296-334 semantics)."""
    apk = aggregate_pubkeys(pks)
    if apk is None:
        raise InvalidPublicKey("empty pubkey set")
    return verify(apk, msg, sig)


def gt_to_bytes(f) -> bytes:
    """Serialize a pairing output (Fp12 element) as 12 x 48 big-endian bytes
    (coefficients in tower order c0.c0.c0, c0.c0.c1, ..., c1.c2.c1)."""
    out = bytearray()
    for c6 in f:
        for c2 in c6:
            for c in c2:
                out += int(c).to_bytes(48, "big")
    return bytes(out)


def gt_from_bytes(data: bytes):
    """Inverse of gt_to_bytes; validates field-element ranges."""
    if len(data) != 576:
        raise ValueError("GT encoding must be 576 bytes")
    vals = []
    for i in range(12):
        v = int.from_bytes(data[48 * i : 48 * i + 48], "big")
        if v >= P:
            raise ValueError("coefficient out of range")
        vals.append(v)
    return (
        ((vals[0], vals[1]), (vals[2], vals[3]), (vals[4], vals[5])),
        ((vals[6], vals[7]), (vals[8], vals[9]), (vals[10], vals[11])),
    )


def aggregate_verify(pks, msgs, sig) -> bool:
    """Distinct-message aggregate verification (IETF BLS AggregateVerify):
    e(-g1, sig) * prod_i e(pk_i, H(m_i)) == 1.  Net-new API surface vs the
    reference (which only has the same-message fast aggregate)."""
    from . import pairing as pr

    if not pks or len(pks) != len(msgs):
        raise InvalidPublicKey("empty or mismatched pubkey/message sets")
    for pk in pks:
        if pk is None:
            raise InvalidPublicKey("identity public key")
        if not (cv.g1_is_on_curve(pk) and cv.g1_in_subgroup(pk)):
            raise InvalidPublicKey("pk fails curve/subgroup check")
    if sig is not None and not (cv.g2_is_on_curve(sig) and cv.g2_in_subgroup(sig)):
        raise InvalidSignature("sig fails curve/subgroup check")
    g1s = [cv.g1_neg(G1_GEN)] + list(pks)
    g2s = [sig] + [hash_to_g2(m) for m in msgs]
    return F.fp12_is_one(pr.multi_pairing(g1s, g2s))
