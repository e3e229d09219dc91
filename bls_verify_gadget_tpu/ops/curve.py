"""L1: G1/G2 Jacobian point kernels (jnp path), batch-first and branch-free.

Points are Jacobian (X, Y, Z) with Z == 0 encoding infinity; coordinates are
Fp limb tensors for G1 and Fp2 pairs for G2.  All ops are complete
(exceptional cases resolved with cmov), so they are safe under jit/vmap/scan
for arbitrary batched inputs.

Note: neither E(Fp) nor E'(Fp2) has 2-torsion (both group orders are odd),
so Y != 0 for every finite point and the doubling formula is complete.

Parity: replaces ark-ec projective point ops, scalar mul and `.check()`
(reference src/bls.rs:3,191,214,296,438-447).
"""

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .fp import FP
from . import tower as T


class _FpOps:
    """Coordinate-field adapter: Fp."""
    name = "fp"

    add = staticmethod(FP.add)
    sub = staticmethod(FP.sub)
    neg = staticmethod(FP.neg)
    sqr = staticmethod(FP.sqr)
    cmov = staticmethod(FP.cmov)
    is_zero = staticmethod(FP.is_zero)
    eq = staticmethod(FP.eq)
    inv = staticmethod(FP.inv)

    @staticmethod
    def mul_pairs(pairs):
        from .tower import _mul_many
        return _mul_many(pairs)

    @staticmethod
    def zero_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def one_like(a):
        return jnp.broadcast_to(FP.ONE, a.shape)

    B_CONST = C.B_G1  # curve b as host int


class _Fp2Ops:
    """Coordinate-field adapter: Fp2."""
    name = "fp2"

    add = staticmethod(T.fp2_add)
    sub = staticmethod(T.fp2_sub)
    neg = staticmethod(T.fp2_neg)
    sqr = staticmethod(T.fp2_sqr)
    cmov = staticmethod(T.fp2_cmov)
    is_zero = staticmethod(T.fp2_is_zero)
    eq = staticmethod(T.fp2_eq)
    inv = staticmethod(T.fp2_inv)
    mul_pairs = staticmethod(T.fp2_mul_pairs)
    zero_like = staticmethod(T.fp2_zero_like)
    one_like = staticmethod(T.fp2_one_like)

    B_CONST = C.B_G2


FP_OPS = _FpOps()
FP2_OPS = _Fp2Ops()


# ----------------------------------------------------------------------------
# generic Jacobian ops
# ----------------------------------------------------------------------------

def pt_infinity_like(ops, p):
    x, y, z = p
    return (ops.one_like(x), ops.one_like(y), ops.zero_like(z))


def pt_is_infinity(ops, p):
    return ops.is_zero(p[2])


def pt_neg(ops, p):
    return (p[0], ops.neg(p[1]), p[2])


def pt_cmov(ops, cond, p, q):
    return tuple(ops.cmov(cond, a, b) for a, b in zip(p, q))


def _fused_pt_coords(ops, pts):
    """Flatten points into the kernel coord list (component-major Fp2)."""
    out = []
    for pt in pts:
        for c in pt:
            if ops.name == "fp2":
                out += [c[0], c[1]]
            else:
                out.append(c)
    return out


def _fused_pt_unflat(ops, o):
    if ops.name == "fp2":
        return ((o[0], o[1]), (o[2], o[3]), (o[4], o[5]))
    return (o[0], o[1], o[2])


def _use_fused_pt():
    from ..utils.config import config

    return FP._use_pallas() and config.fuse_pt


def pt_double(ops, p):
    """Complete Jacobian doubling for a = 0 curves (2007 Bernstein-Lange
    style).  Infinity stays infinity because Z3 = 2 Y Z.  On TPU the whole
    doubling runs as ONE fused Pallas launch (config.fuse_pt)."""
    if _use_fused_pt():
        return _fused_pt_unflat(
            ops, FP.kernels.pt_dbl(_fused_pt_coords(ops, [p]), ops.name)
        )
    x, y, z = p
    a_, b_, c_ = ops.mul_pairs([(x, x), (y, y), (z, z)])   # XX, YY, ZZ
    (d_,) = ops.mul_pairs([(b_, b_)])                      # YYYY
    # S = 2*((X+YY)^2 - XX - YYYY)
    t = ops.sqr(ops.add(x, b_))
    s = ops.sub(ops.sub(t, a_), d_)
    s = ops.add(s, s)
    # M = 3*XX (a = 0)
    m = ops.add(ops.add(a_, a_), a_)
    # X3 = M^2 - 2S
    x3 = ops.sub(ops.sqr(m), ops.add(s, s))
    # Y3 = M*(S - X3) - 8*YYYY
    d8 = ops.add(d_, d_)
    d8 = ops.add(d8, d8)
    d8 = ops.add(d8, d8)
    (my,) = ops.mul_pairs([(m, ops.sub(s, x3))])
    y3 = ops.sub(my, d8)
    # Z3 = (Y+Z)^2 - YY - ZZ  (= 2YZ)
    z3 = ops.sub(ops.sub(ops.sqr(ops.add(y, z)), b_), c_)
    return (x3, y3, z3)


def pt_add(ops, p, q):
    """Complete Jacobian addition: generic add, with doubling / infinity /
    inverse cases resolved by cmov.  On TPU the whole addition (including
    the edge-case resolution) runs as ONE fused Pallas launch
    (config.fuse_pt)."""
    if _use_fused_pt():
        return _fused_pt_unflat(
            ops, FP.kernels.pt_add(_fused_pt_coords(ops, [p, q]), ops.name)
        )
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1z1, z2z2 = ops.mul_pairs([(z1, z1), (z2, z2)])
    u1, u2, t1, t2 = ops.mul_pairs([
        (x1, z2z2), (x2, z1z1), (y1, z2z2), (y2, z1z1),
    ])
    s1, s2 = ops.mul_pairs([(t1, z2), (t2, z1)])
    h = ops.sub(u2, u1)
    r = ops.sub(s2, s1)
    hh = ops.sqr(h)
    hhh, v = ops.mul_pairs([(h, hh), (u1, hh)])
    rr = ops.sqr(r)
    x3 = ops.sub(ops.sub(rr, hhh), ops.add(v, v))
    (ry,) = ops.mul_pairs([(r, ops.sub(v, x3))])
    (s1hhh,) = ops.mul_pairs([(s1, hhh)])
    y3 = ops.sub(ry, s1hhh)
    (z1z2,) = ops.mul_pairs([(z1, z2)])
    (z3,) = ops.mul_pairs([(z1z2, h)])
    res = (x3, y3, z3)

    h_zero = ops.is_zero(h)
    r_zero = ops.is_zero(r)
    # P == Q -> double; P == -Q -> infinity
    res = pt_cmov(ops, h_zero & r_zero, pt_double(ops, p), res)
    res = pt_cmov(ops, h_zero & ~r_zero, pt_infinity_like(ops, p), res)
    # identity cases
    p_inf = pt_is_infinity(ops, p)
    q_inf = pt_is_infinity(ops, q)
    res = pt_cmov(ops, p_inf, q, res)
    res = pt_cmov(ops, q_inf & ~p_inf, p, res)
    # both infinity: q selected above via p_inf -> fine
    return res


def pt_to_affine(ops, p):
    """Jacobian -> affine (x, y, is_infinity).  Infinity maps to (0, 0)."""
    x, y, z = p
    zi = ops.inv(z)  # 0 -> 0
    zi2 = ops.sqr(zi)
    (zi3,) = ops.mul_pairs([(zi2, zi)])
    ax, ay = ops.mul_pairs([(x, zi2), (y, zi3)])
    return ax, ay, pt_is_infinity(ops, p)


def pt_from_affine(ops, x, y, is_inf=None):
    """Affine -> Jacobian; optional is_inf mask selects Z = 0."""
    z = ops.one_like(x)
    if is_inf is not None:
        z = ops.cmov(is_inf, ops.zero_like(x), z)
    return (x, y, z)


def pt_on_curve_affine(ops, x, y, b_mont):
    """y^2 == x^3 + b for affine coordinates (b in Montgomery form)."""
    yy, xx = ops.mul_pairs([(y, y), (x, x)])
    (xxx,) = ops.mul_pairs([(xx, x)])
    return ops.eq(yy, ops.add(xxx, b_mont))


def pt_eq(ops, p, q):
    """Projective equality: X1 Z2^2 == X2 Z1^2 and Y1 Z2^3 == Y2 Z1^3,
    plus matching infinity flags."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1z1, z2z2 = ops.mul_pairs([(z1, z1), (z2, z2)])
    a_, b_ = ops.mul_pairs([(x1, z2z2), (x2, z1z1)])
    t1, t2 = ops.mul_pairs([(y1, z2z2), (y2, z1z1)])
    c_, d_ = ops.mul_pairs([(t1, z2), (t2, z1)])
    p_inf = pt_is_infinity(ops, p)
    q_inf = pt_is_infinity(ops, q)
    finite_eq = ops.eq(a_, b_) & ops.eq(c_, d_) & ~p_inf & ~q_inf
    return finite_eq | (p_inf & q_inf)


# ----------------------------------------------------------------------------
# scalar multiplication
# ----------------------------------------------------------------------------

def pt_mul_const(ops, p, scalar: int):
    """p * scalar for a host-constant non-negative scalar.

    TPU backends: the bit pattern is static, so the ladder is structured as
    runs — a doubling-only scan per run of zero bits plus one real addition
    per set bit (for the sparse BLS scalars this cuts kernel launches ~2.5x
    vs bitwise double-and-cmov).  CPU/test backends keep the compact
    cmov-in-scan form, whose XLA compile is far cheaper.
    """
    if scalar == 0:
        return pt_infinity_like(ops, p)
    from ..utils.config import use_static_ladders

    if not use_static_ladders():
        bits_arr = jnp.asarray(
            np.array([(scalar >> i) & 1 for i in range(scalar.bit_length())][::-1], np.uint32)
        )
        acc0 = pt_infinity_like(ops, p)

        def body(acc, bit):
            acc = pt_double(ops, acc)
            acc = pt_cmov(ops, bit > 0, pt_add(ops, acc, p), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, acc0, bits_arr)
        return acc

    bits = bin(scalar)[2:]  # MSB first

    if _use_fused_pt():
        # ENTIRE ladder in ONE launch (kernels.pt_mul_const): doubling
        # runs + set-bit additions with the run structure in SMEM
        segs, run = [], 0
        for bit in bits[1:]:
            run += 1
            if bit == "1":
                segs.append((run, 1))
                run = 0
        if run:
            segs.append((run, 0))
        if segs:
            return _fused_pt_unflat(
                ops,
                FP.kernels.pt_mul_const(
                    _fused_pt_coords(ops, [p]), ops.name, segs
                ),
            )
        return p  # scalar == 1

    def dbl_scan(pt, count):
        if count == 0:
            return pt
        if _use_fused_pt():
            # whole static doubling run inside ONE launch (fori_loop)
            return _fused_pt_unflat(
                ops,
                FP.kernels.pt_dbl(
                    _fused_pt_coords(ops, [pt]), ops.name, count=count
                ),
            )
        if count <= 2:
            for _ in range(count):
                pt = pt_double(ops, pt)
            return pt

        def body(acc, _):
            return pt_double(ops, acc), None

        acc, _ = jax.lax.scan(body, pt, None, length=count)
        return acc

    acc = p  # top set bit
    run = 0
    for bit in bits[1:]:
        run += 1
        if bit == "1":
            acc = dbl_scan(acc, run)
            acc = pt_add(ops, acc, p)
            run = 0
    acc = dbl_scan(acc, run)
    return acc


def pt_mul_var(ops, p, scalar_limbs, nbits: int):
    """p * scalar for per-element variable scalars given as 16-bit limb
    tensors (..., nlimb) (NOT Montgomery form), MSB-first scan over nbits.
    On TPU the entire ladder is ONE fused launch (kernels.pt_mul_var)."""
    if _use_fused_pt():
        return _fused_pt_unflat(
            ops,
            FP.kernels.pt_mul_var(
                _fused_pt_coords(ops, [p]), ops.name, scalar_limbs, nbits
            ),
        )
    idx = jnp.arange(nbits - 1, -1, -1, dtype=jnp.uint32)
    acc0 = pt_infinity_like(ops, p)

    def body(acc, i):
        limb = scalar_limbs[..., i // 16]
        bit = (limb >> (i % 16)) & 1
        acc = pt_double(ops, acc)
        acc = pt_cmov(ops, bit > 0, pt_add(ops, acc, p), acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, idx)
    return acc


def pt_sum(ops, p, axis: int = 0):
    """Sum points along a leading batch axis with a pairwise halving tree
    (log depth; the cross-chip variant reduces partial sums with psum in
    parallel/collectives.py)."""
    n = p[0].shape[axis] if ops.name == "fp" else p[0][0].shape[axis]

    def take(pt, sl):
        if ops.name == "fp":
            return tuple(c[sl] for c in pt)
        return tuple(tuple(cc[sl] for cc in c) for c in pt)

    cur = p
    m = n
    while m > 1:
        half = m // 2
        a = take(cur, (slice(None),) * axis + (slice(0, half),))
        b = take(cur, (slice(None),) * axis + (slice(half, 2 * half),))
        s = pt_add(ops, a, b)
        if m % 2:
            tail = take(cur, (slice(None),) * axis + (slice(2 * half, m),))
            s = _concat_pts(ops, s, tail, axis)
            m = half + 1
        else:
            m = half
        cur = s
    return take(cur, (slice(None),) * axis + (0,))


def _concat_pts(ops, a, b, axis):
    if ops.name == "fp":
        return tuple(jnp.concatenate([x, y], axis=axis) for x, y in zip(a, b))
    return tuple(
        tuple(jnp.concatenate([xx, yy], axis=axis) for xx, yy in zip(x, y))
        for x, y in zip(a, b)
    )


# ----------------------------------------------------------------------------
# G1/G2 specific: constants, endomorphisms, subgroup checks
# ----------------------------------------------------------------------------

B_G1_MONT = jnp.asarray(FP.encode(C.B_G1))
B_G2_MONT = (jnp.asarray(FP.encode(C.B_G2[0])), jnp.asarray(FP.encode(C.B_G2[1])))
BETA_G1_MONT = jnp.asarray(FP.encode(C.BETA_G1))
PSI_X_MONT = (jnp.asarray(FP.encode(C.PSI_X[0])), jnp.asarray(FP.encode(C.PSI_X[1])))
PSI_Y_MONT = (jnp.asarray(FP.encode(C.PSI_Y[0])), jnp.asarray(FP.encode(C.PSI_Y[1])))
PSI2_X_MONT = jnp.asarray(FP.encode(C.PSI2_X_C0))


def g1_encode_batch(points):
    """Host affine points (int tuples, None = infinity) -> device Jacobian."""
    xs = [0 if p is None else p[0] for p in points]
    ys = [1 if p is None else p[1] for p in points]
    zs = [0 if p is None else 1 for p in points]
    return (
        jnp.asarray(FP.encode(xs)),
        jnp.asarray(FP.encode(ys)),
        jnp.asarray(FP.encode(zs)),
    )


def g1_decode(p):
    """Device Jacobian -> list of host affine points (None = infinity)."""
    ax, ay, inf = pt_to_affine(FP_OPS, p)
    xs, ys = FP.decode(ax), FP.decode(ay)
    infs = np.asarray(inf)
    if not isinstance(xs, list):
        return None if bool(infs) else (xs, ys)
    return [None if bool(i) else (x, y) for x, y, i in zip(xs, ys, infs)]


def g2_encode_batch(points):
    xs0 = [0 if p is None else p[0][0] for p in points]
    xs1 = [0 if p is None else p[0][1] for p in points]
    ys0 = [1 if p is None else p[1][0] for p in points]
    ys1 = [0 if p is None else p[1][1] for p in points]
    zs = [0 if p is None else 1 for p in points]
    zero = [0] * len(points)
    return (
        (jnp.asarray(FP.encode(xs0)), jnp.asarray(FP.encode(xs1))),
        (jnp.asarray(FP.encode(ys0)), jnp.asarray(FP.encode(ys1))),
        (jnp.asarray(FP.encode(zs)), jnp.asarray(FP.encode(zero))),
    )


def g2_decode(p):
    ax, ay, inf = pt_to_affine(FP2_OPS, p)
    (x0, x1), (y0, y1) = ax, ay
    xs0, xs1, ys0, ys1 = FP.decode(x0), FP.decode(x1), FP.decode(y0), FP.decode(y1)
    infs = np.asarray(inf)
    if not isinstance(xs0, list):
        return None if bool(infs) else ((xs0, xs1), (ys0, ys1))
    return [
        None if bool(i) else ((a, b), (c, d))
        for a, b, c, d, i in zip(xs0, xs1, ys0, ys1, infs)
    ]


def g1_phi(p):
    """GLV endomorphism (beta x, y) on Jacobian coords: scales X only."""
    x, y, z = p
    (bx,) = FP_OPS.mul_pairs([(x, jnp.broadcast_to(BETA_G1_MONT, x.shape))])
    return (bx, y, z)


def g2_psi(p):
    """psi(x, y) = (PSI_X conj(x), PSI_Y conj(y)) lifted to Jacobian coords:
    conj(Z) and scale X, Y by the appropriate twist constants.

    In Jacobian form (X, Y, Z) ~ (X/Z^2, Y/Z^3): applying conj everywhere and
    multiplying affine x by cx, y by cy is realised as
    X' = cx conj(X), Y' = cy conj(Y), Z' = conj(Z)."""
    x, y, z = p
    cx = T._bcast(PSI_X_MONT, x)
    cy = T._bcast(PSI_Y_MONT, y)
    rx, ry = T.fp2_mul_pairs([(T.fp2_conj(x), cx), (T.fp2_conj(y), cy)])
    return (rx, ry, T.fp2_conj(z))


def g2_psi2(p):
    """psi^2 (x, y) = (PSI2_X x, -y)."""
    x, y, z = p
    k = jnp.broadcast_to(PSI2_X_MONT, x[0].shape)
    rx = T.fp2_muls(x, k)
    return (rx, T.fp2_neg(y), z)


def g1_in_subgroup(p):
    """[|x|]([|x|]P) == -phi(P) (validated against golden in tests)."""
    xxp = pt_mul_const(FP_OPS, pt_mul_const(FP_OPS, p, C.ABS_X), C.ABS_X)
    return pt_eq(FP_OPS, xxp, pt_neg(FP_OPS, g1_phi(p)))


def g2_in_subgroup(p):
    """psi(Q) == [x]Q, i.e. psi(Q) == -[|x|]Q."""
    xq = pt_mul_const(FP2_OPS, p, C.ABS_X)
    return pt_eq(FP2_OPS, g2_psi(p), pt_neg(FP2_OPS, xq))


_COF_CONST_BLOCK = None


def _cof_const_block():
    """(nlimb, COF_CONST_COLS) psi-constant column table for the fused
    cofactor kernel."""
    global _COF_CONST_BLOCK
    if _COF_CONST_BLOCK is None:
        cols = [
            FP.encode(C.PSI_X[0]), FP.encode(C.PSI_X[1]),
            FP.encode(C.PSI_Y[0]), FP.encode(C.PSI_Y[1]),
            FP.encode(C.PSI2_X_C0),
        ]
        _COF_CONST_BLOCK = np.stack(
            [np.asarray(c, np.uint32) for c in cols], axis=1
        )
    return _COF_CONST_BLOCK


def _absx_segs():
    """ABS_X's MSB-first [(run_len, ends_on_set_bit), ...] after the top
    bit — the same seg structure pt_mul_const builds."""
    segs, run = [], 0
    for bit in bin(C.ABS_X)[3:]:
        run += 1
        if bit == "1":
            segs.append((run, 1))
            run = 0
    if run:
        segs.append((run, 0))
    return segs


def g2_clear_cofactor(p):
    """Budroni-Pintore: [x^2 - x - 1]P + [x - 1]psi(P) + psi2(2P)
    (fast version of reference src/hasher.rs:663-673; validated against the
    h_eff golden path in tests).  On TPU the ENTIRE chain — both
    |x|-ladders, psi maps and all additions — is ONE fused launch."""
    from ..utils.config import config

    if _use_fused_pt() and config.fuse_cofactor:
        o = FP.kernels.g2_cofactor(
            _fused_pt_coords(FP2_OPS, [p]), _cof_const_block(), _absx_segs()
        )
        return _fused_pt_unflat(FP2_OPS, o)
    xp = pt_neg(FP2_OPS, pt_mul_const(FP2_OPS, p, C.ABS_X))       # [x]P
    xxp = pt_neg(FP2_OPS, pt_mul_const(FP2_OPS, xp, C.ABS_X))     # [x^2]P
    t = pt_add(FP2_OPS, xxp, pt_neg(FP2_OPS, xp))
    t = pt_add(FP2_OPS, t, pt_neg(FP2_OPS, p))                    # [x^2-x-1]P
    t2 = g2_psi(pt_add(FP2_OPS, xp, pt_neg(FP2_OPS, p)))          # psi([x-1]P)
    t3 = g2_psi2(pt_double(FP2_OPS, p))                           # psi2(2P)
    return pt_add(FP2_OPS, pt_add(FP2_OPS, t, t2), t3)


G1_GEN_JAC = (
    jnp.asarray(FP.encode(C.G1_GEN[0])),
    jnp.asarray(FP.encode(C.G1_GEN[1])),
    jnp.asarray(FP.encode(1)),
)
G2_GEN_JAC = (
    (jnp.asarray(FP.encode(C.G2_GEN[0][0])), jnp.asarray(FP.encode(C.G2_GEN[0][1]))),
    (jnp.asarray(FP.encode(C.G2_GEN[1][0])), jnp.asarray(FP.encode(C.G2_GEN[1][1]))),
    (jnp.asarray(FP.encode(1)), jnp.asarray(FP.encode(0))),
)
