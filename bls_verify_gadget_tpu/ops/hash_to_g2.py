"""L3: batched hash-to-G2 on device (jnp path), branch-free.

Pipeline (identical math to golden/hash_to_curve.py, RFC 9380):
  expand_message_xmd (batched SHA-256) -> hash_to_field (512-bit -> Fp via
  Montgomery folding) -> simplified SWU (9 mod 16 sqrt with candidate
  multipliers) -> 3-isogeny -> Budroni-Pintore cofactor clearing.

Static-shape contract: all messages in a batch share one byte length
(known at trace time); the DST is a host constant.

Parity: value-level equivalent of the reference's circuit hasher
(src/hasher.rs:26-740) and native hash_to_g2 (src/bls.rs:477-493).
"""

import functools

import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..golden import field as GF
from .fp import FP
from . import tower as T
from . import curve as CV
from .sha256 import sha256_bytes

# ----------------------------------------------------------------------------
# sqrt in Fp2 for q == 9 mod 16: candidate multipliers
# ----------------------------------------------------------------------------

EXP_SQRT = (C.Q2 + 7) // 16  # z = a^((q+7)/16); true sqrt is z * one of CANDS

# Frobenius split of the sqrt exponent.  With p == 11 (mod 16) and
# k = (p - 11)/16:
#
#   k*p + (11k + 8) = k(p + 11) + 8 = (p^2 - 121)/16 + 8 = (p^2 + 7)/16
#
# and a^p is the Fp2 Frobenius — conjugation, free — so
#
#   a^((p^2+7)/16) = (a^p)^k * a^(11k+8) = (conj(a) * a^11)^k * a^8.
#
# The 764-bit pow chain becomes one 377-bit chain plus ~7 cheap muls
# (~48% fewer multiplies in the dominant SSWU step).  No reference
# counterpart: hasher.rs:243-258 delegates sqrt to arkworks' generic
# Tonelli-Shanks; this split exploits q == p^2 specifically.
_SQRT_K = (C.P - 11) // 16
assert C.P % 16 == 11 and _SQRT_K * C.P + 11 * _SQRT_K + 8 == EXP_SQRT


def _compute_sqrt_candidates():
    """1, sqrt(-1) = u, sqrt(u), sqrt(-u) — computed via the golden sqrt and
    verified; these are the reference's C2..C5 role (src/hasher.rs:243-258)."""
    one = (1, 0)
    i_ = (0, 1)
    sq_i = GF.fp2_sqrt(i_)
    sq_mi = GF.fp2_sqrt(GF.fp2_neg(i_))
    assert sq_i is not None and sq_mi is not None
    assert GF.fp2_sqr(sq_i) == i_ and GF.fp2_sqr(sq_mi) == GF.fp2_neg(i_)
    return (one, i_, sq_i, sq_mi)


SQRT_CANDS = tuple(T.fp2_encode(c) for c in _compute_sqrt_candidates())


def _sqrt_from_candidate(z, target):
    """Given z with z^2 = target * w for w an 8th root of unity, try the 4
    candidate multipliers; returns (sqrt, found) branch-free."""
    best = T.fp2_zero_like(target)
    found = FP.is_zero(target[0]) & FP.is_zero(target[1])  # sqrt(0) = 0
    for cand in SQRT_CANDS:
        c = T._bcast(cand, target)
        (t,) = T.fp2_mul_pairs([(z, c)])
        ok = T.fp2_eq(T.fp2_sqr(t), target)
        best = T.fp2_cmov(ok & ~found, t, best)
        found = found | ok
    return best, found


def fp2_sqrt_candidates(a):
    """Returns (sqrt, is_square) branch-free: one (Frobenius-split) pow
    then 4 candidate square checks."""
    z = _fp2_pow_sqrt(a)
    return _sqrt_from_candidate(z, a)


def _fp2_pow_sqrt(a):
    """a^EXP_SQRT via the Frobenius split (see _SQRT_K above):
    (conj(a) * a^11)^k * a^8 — one 377-bit windowed chain (95 windows
    instead of 191) plus 7 multiplies."""
    a2 = T.fp2_sqr(a)
    a4 = T.fp2_sqr(a2)
    a8 = T.fp2_sqr(a4)
    (a3,) = T.fp2_mul_pairs([(a2, a)])
    (a11,) = T.fp2_mul_pairs([(a8, a3)])
    (b,) = T.fp2_mul_pairs([(T.fp2_conj(a), a11)])
    bk = _fp2_pow_const(b, _SQRT_K)
    (z,) = T.fp2_mul_pairs([(bk, a8)])
    return z


def _fp2_pow_const(a, exponent: int):
    """a^exponent for a host-constant exponent: 4-bit windowed scan
    (4 squarings + one table-selected multiply per window)."""
    import jax

    w = 4
    nwin = (exponent.bit_length() + w - 1) // w
    digits = [(exponent >> (w * i)) & 15 for i in range(nwin)][::-1]

    from ..utils.config import config

    if T.FP._use_pallas() and config.fuse_pow:
        # ENTIRE chain (in-kernel table build + all windows) in ONE
        # launch; window count rounded up to a multiple of 8 so exponents
        # of similar width share a Mosaic payload
        o = T.FP.kernels.pow_win(
            [a[0], a[1]], 2, digits, nwin=-(-len(digits) // 8) * 8
        )
        return (o[0], o[1])

    tab = [T.fp2_one_like(a), a]
    for i in range(2, 16):
        tab.append(T.fp2_mul(tab[i - 1], a))
    t0 = jnp.stack([t[0] for t in tab])
    t1 = jnp.stack([t[1] for t in tab])
    dig_arr = jnp.asarray(np.array(digits, np.uint32))
    one = T.fp2_one_like(a)

    def body(f, d):
        for _ in range(w):
            f = T.fp2_sqr(f)
        f = T.fp2_mul(f, (t0[d], t1[d]))
        return f, None

    f, _ = jax.lax.scan(body, one, dig_arr)
    return f


# ----------------------------------------------------------------------------
# expand_message_xmd + hash_to_field (device)
# ----------------------------------------------------------------------------

def expand_message_xmd(msg_u8, msg_len: int, dst: bytes, len_in_bytes: int,
                       lens=None):
    """msg_u8: (..., msg_len) byte tensor -> (..., len_in_bytes) byte tensor
    (RFC 9380 sec 5.3.1; reference circuit version src/hasher.rs:109-173).

    With `lens` (a (...,) uint32 tensor of per-element byte lengths <=
    msg_len), messages of DIFFERENT lengths batch together: only the b0
    digest depends on the message, so the Z_pad||msg||lib_str||0||DST'
    buffer is built with masked/gathered bytes and hashed by the
    variable-length SHA (every element pays the max block count — the
    static-shape TPU idiom).  The b1..b_ell XOR chain is fixed-size."""
    ell = -(-len_in_bytes // 32)
    assert ell <= 255 and len(dst) <= 255
    dst_prime = dst + bytes([len(dst)])
    batch = msg_u8.shape[:-1]

    def const_bytes(bs):
        return jnp.broadcast_to(
            jnp.asarray(np.frombuffer(bs, np.uint8).astype(np.uint32)),
            batch + (len(bs),),
        )

    z_pad = const_bytes(bytes(64))
    tail_bytes = len_in_bytes.to_bytes(2, "big") + b"\x00" + dst_prime
    tail0 = const_bytes(tail_bytes)
    if lens is None:
        msg_prime = jnp.concatenate(
            [z_pad, msg_u8.astype(jnp.uint32), tail0], axis=-1
        )
        b0 = sha256_bytes(msg_prime, 64 + msg_len + 3 + len(dst_prime))
    else:
        from .sha256 import sha256_bytes_var

        lens = jnp.asarray(lens, jnp.uint32)
        tlen = len(tail_bytes)
        total = 64 + msg_len + tlen
        buf = jnp.concatenate(
            [z_pad, msg_u8.astype(jnp.uint32),
             jnp.zeros(batch + (tlen,), jnp.uint32)],
            axis=-1,
        )
        iota = jnp.broadcast_to(
            jnp.arange(total, dtype=jnp.uint32), batch + (total,)
        )
        # the tail starts right after each element's live message bytes
        t_idx = jnp.clip(
            iota.astype(jnp.int32) - 64 - lens[..., None].astype(jnp.int32),
            0, tlen - 1,
        )
        tail_vals = jnp.asarray(
            np.frombuffer(tail_bytes, np.uint8).astype(np.uint32)
        )[t_idx]
        in_msg = iota < (64 + lens[..., None])
        buf = jnp.where(in_msg | (iota < 64), buf, tail_vals)
        b0 = sha256_bytes_var(buf, 64 + lens + tlen, total)

    tail_dst = const_bytes(dst_prime)
    blen = 32 + 1 + len(dst_prime)

    def block_input(prev_xor, ctr):
        ctr_b = const_bytes(bytes([ctr]))
        return jnp.concatenate([prev_xor, ctr_b, tail_dst], axis=-1)

    b1 = sha256_bytes(block_input(b0, 1), blen)
    blocks = [b1]
    prev = b1
    for i in range(2, ell + 1):
        prev = sha256_bytes(block_input(b0 ^ prev, i), blen)
        blocks.append(prev)
    return jnp.concatenate(blocks, axis=-1)[..., :len_in_bytes]


def _bytes_be_to_fp(tv):
    """(..., 64) big-endian bytes -> Fp Montgomery limbs.

    v = hi*2^384 + lo (lo: low 48 bytes, hi: top 16 bytes);
    v*R = mont_mul(lo, R^2) + mont_mul(hi, R^3)."""
    rev = tv[..., ::-1]  # little-endian bytes
    limbs = rev[..., 0::2] + (rev[..., 1::2] << 8)  # (..., 32) 16-bit limbs
    lo = limbs[..., :24]
    hi = jnp.concatenate(
        [limbs[..., 24:], jnp.zeros(limbs.shape[:-1] + (16,), jnp.uint32)], axis=-1
    )
    stacked = jnp.stack([lo, hi])
    consts = jnp.stack([
        jnp.broadcast_to(FP.R2, lo.shape),
        jnp.broadcast_to(FP.R3, hi.shape),
    ])
    prods = FP.mul(stacked, consts)
    return FP.add(prods[0], prods[1])


def hash_to_field_fp2(msg_u8, msg_len: int, count: int = 2, dst: bytes = C.DST_G2,
                      lens=None):
    """-> list of count Fp2 elements (device, Montgomery form)
    (reference src/hasher.rs:58-107 semantics, 64 bytes per base element)."""
    m = 2
    lib = count * m * C.L_FIELD
    uniform = expand_message_xmd(msg_u8, msg_len, dst, lib, lens=lens)
    out = []
    for i in range(count):
        coords = []
        for j in range(m):
            off = C.L_FIELD * (j + i * m)
            coords.append(_bytes_be_to_fp(uniform[..., off : off + C.L_FIELD]))
        out.append((coords[0], coords[1]))
    return out


# ----------------------------------------------------------------------------
# simplified SWU for AB != 0 (9 mod 16), then 3-isogeny
# ----------------------------------------------------------------------------

SSWU_A = T.fp2_encode(C.SSWU_A)
SSWU_B = T.fp2_encode(C.SSWU_B)
SSWU_Z = T.fp2_encode(C.SSWU_Z)
# c1 = -B/A, c2 = -1/Z (host-precomputed)
_C1_HOST = GF.fp2_mul(GF.fp2_neg(C.SSWU_B), GF.fp2_inv(C.SSWU_A))
_C2_HOST = GF.fp2_neg(GF.fp2_inv(C.SSWU_Z))
SSWU_C1 = T.fp2_encode(_C1_HOST)
SSWU_C2 = T.fp2_encode(_C2_HOST)
# Cz3 = (Z^3)^((q+7)/16): lets sqrt(gx2) reuse the gx1 exponentiation
# (gx2 = gx1 Z^3 u^6, and Z^3 is a non-residue, so gx1 non-square implies
# gx1 Z^3 square; sqrt(gx2) = sqrt(gx1 Z^3) * u^3).
_Z3_HOST = GF.fp2_mul(GF.fp2_mul(C.SSWU_Z, C.SSWU_Z), C.SSWU_Z)
assert not GF.fp2_is_square(_Z3_HOST), "Z^3 must be a non-residue"
SSWU_CZ3 = T.fp2_encode(GF.fp2_pow(_Z3_HOST, (C.Q2 + 7) // 16))


def sswu_map(u):
    """u (Fp2) -> affine point on E2' (branch-free; RFC 9380 F.2.1.2 shape).
    Value-level twin of the reference's map_to_curve_9mod16
    (src/hasher.rs:352-502)."""
    A = T._bcast(SSWU_A, u)
    B = T._bcast(SSWU_B, u)
    Z = T._bcast(SSWU_Z, u)
    c1 = T._bcast(SSWU_C1, u)
    c2 = T._bcast(SSWU_C2, u)

    u2 = T.fp2_sqr(u)
    (tv1,) = T.fp2_mul_pairs([(Z, u2)])
    tv2 = T.fp2_add(T.fp2_sqr(tv1), tv1)
    inv_tv2 = T.fp2_inv(tv2)  # 0 -> 0
    e1 = T.fp2_is_zero(tv2)
    x1f = T.fp2_add(T.fp2_one_like(u), inv_tv2)
    x1f = T.fp2_cmov(e1, c2, x1f)
    (x1,) = T.fp2_mul_pairs([(c1, x1f)])
    # gx1 = x1^3 + A x1 + B
    x1sq = T.fp2_sqr(x1)
    gx1_a, ax1 = T.fp2_mul_pairs([(x1sq, x1), (A, x1)])
    gx1 = T.fp2_add(T.fp2_add(gx1_a, ax1), B)
    # x2 = tv1 * x1 ; gx2 evaluated directly (exact for all u)
    (x2,) = T.fp2_mul_pairs([(tv1, x1)])
    x2sq = T.fp2_sqr(x2)
    gx2_a, ax2 = T.fp2_mul_pairs([(x2sq, x2), (A, x2)])
    gx2 = T.fp2_add(T.fp2_add(gx2_a, ax2), B)

    # ONE shared exponentiation: z1 = gx1^((q+7)/16) gives the sqrt(gx1)
    # candidates; z1 * Cz3 * u^3 gives the sqrt(gx2) candidates
    # (gx2 = gx1 Z^3 u^6 away from the measure-zero u == 0 case).  The
    # pow itself runs Frobenius-split (_fp2_pow_sqrt): half the chain.
    z1 = _fp2_pow_sqrt(gx1)
    y1, ok1 = _sqrt_from_candidate(z1, gx1)
    (u3,) = T.fp2_mul_pairs([(u2, u)])
    cz3 = T._bcast(SSWU_CZ3, u)
    (zc,) = T.fp2_mul_pairs([(z1, cz3)])
    (z2,) = T.fp2_mul_pairs([(zc, u3)])
    y2, _ = _sqrt_from_candidate(z2, gx2)
    x = T.fp2_cmov(ok1, x1, x2)
    y = T.fp2_cmov(ok1, y1, y2)
    # fix sign: sgn0(y) == sgn0(u)
    flip = T.fp2_sgn0(u) != T.fp2_sgn0(y)
    y = T.fp2_cmov(flip, T.fp2_neg(y), y)
    return x, y


ISO_XNUM = tuple(T.fp2_encode(c) for c in C.ISO3_XNUM)
ISO_XDEN = tuple(T.fp2_encode(c) for c in C.ISO3_XDEN)
ISO_YNUM = tuple(T.fp2_encode(c) for c in C.ISO3_YNUM)
ISO_YDEN = tuple(T.fp2_encode(c) for c in C.ISO3_YDEN)


def _horner(coeffs, x):
    acc = T._bcast(coeffs[-1], x)
    for c in reversed(coeffs[:-1]):
        (ax,) = T.fp2_mul_pairs([(acc, x)])
        acc = T.fp2_add(ax, T._bcast(c, x))
    return acc


def iso3_map_jacobian(x, y):
    """3-isogeny E2' -> E2 returning Jacobian coords (no inversion).

    Packing with Z = xd*yd:
      X = xn*yd*Z    so X/Z^2 = xn*yd/(xd*yd) = xn/xd        (affine x')
      Y = y*yn*xd*Z^2 so Y/Z^3 = y*yn*xd/(xd*yd) = y*yn/yd   (affine y')
    xd == 0 or yd == 0 gives Z = 0 (infinity), matching the golden path.
    (reference isogeny_map src/hasher.rs:294-348)."""
    xn = _horner(ISO_XNUM, x)
    xd = _horner(ISO_XDEN, x)
    yn = _horner(ISO_YNUM, x)
    yd = _horner(ISO_YDEN, x)
    (z,) = T.fp2_mul_pairs([(xd, yd)])
    xnyd, yxd = T.fp2_mul_pairs([(xn, yd), (y, xd)])
    (X,) = T.fp2_mul_pairs([(xnyd, z)])
    z2 = T.fp2_sqr(z)
    (ynyxd,) = T.fp2_mul_pairs([(yn, yxd)])
    (Y,) = T.fp2_mul_pairs([(ynyxd, z2)])
    return (X, Y, z)


def map_to_curve_g2(u):
    """SSWU + isogeny -> G2 Jacobian point."""
    x, y = sswu_map(u)
    return iso3_map_jacobian(x, y)


# ----------------------------------------------------------------------------
# fused whole-map kernel wiring (TPU): constant block + chain digits
# ----------------------------------------------------------------------------

def _digits4(e: int):
    """MSB-first 4-bit digits of a host integer."""
    d = []
    while e:
        d.append(e & 15)
        e >>= 4
    return d[::-1]


SQRT_DIGITS = tuple(_digits4(_SQRT_K))
INV_DIGITS = tuple(_digits4(C.P - 2))

_SSWU_CONST_BLOCK = None


def _sswu_const_block():
    """(nlimb, SSWU_CONST_COLS) uint32 Montgomery column table for the
    fused kernel (kernels._sswu_kernel's c2() indexing contract)."""
    global _SSWU_CONST_BLOCK
    if _SSWU_CONST_BLOCK is None:
        za = GF.fp2_mul(C.SSWU_Z, C.SSWU_A)
        cz3 = GF.fp2_pow(_Z3_HOST, (C.Q2 + 7) // 16)
        _, _, sq_i, sq_mi = _compute_sqrt_candidates()
        vals = [C.SSWU_A, C.SSWU_B, C.SSWU_Z, za, _Z3_HOST, cz3, sq_i, sq_mi]
        vals += list(C.ISO3_XNUM) + list(C.ISO3_XDEN)
        vals += list(C.ISO3_YNUM) + list(C.ISO3_YDEN)
        cols = []
        for v in vals:
            cols.append(FP.encode(v[0]))
            cols.append(FP.encode(v[1]))
        block = np.stack([np.asarray(c, np.uint32) for c in cols], axis=1)
        from .pallas.kernels import SSWU_CONST_COLS

        assert block.shape == (C.NLIMB, SSWU_CONST_COLS), block.shape
        _SSWU_CONST_BLOCK = block
    return _SSWU_CONST_BLOCK


def _fused_map2(u0, u1):
    """Both SSWU maps + isogeny + q0 + q1 in ONE kernel launch."""
    o = FP.kernels.sswu_map2(
        [u0[0], u0[1], u1[0], u1[1]],
        _sswu_const_block(), list(SQRT_DIGITS), list(INV_DIGITS),
    )
    return ((o[0], o[1]), (o[2], o[3]), (o[4], o[5]))


def hash_to_g2(msg_u8, msg_len: int, dst: bytes = C.DST_G2, lens=None):
    """Full batched hash-to-G2 -> Jacobian G2 point (in E2, subgroup).
    `lens` enables mixed-length message batches (see expand_message_xmd)."""
    from ..utils.config import config

    u0, u1 = hash_to_field_fp2(msg_u8, msg_len, 2, dst, lens=lens)
    if FP._use_pallas() and config.fuse_sswu:
        r = _fused_map2(u0, u1)
    else:
        q0 = map_to_curve_g2(u0)
        q1 = map_to_curve_g2(u1)
        r = CV.pt_add(CV.FP2_OPS, q0, q1)
    return CV.g2_clear_cofactor(r)
