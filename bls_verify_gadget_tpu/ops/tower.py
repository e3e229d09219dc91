"""L0: Fp2 / Fp6 / Fp12 extension towers over the limb field (jnp path).

Representation (pytree-friendly tuples of limb tensors):
  Fp2  : (c0, c1)               each (..., 24) uint32 Montgomery limbs
  Fp6  : (x0, x1, x2)           each Fp2
  Fp12 : (y0, y1)               each Fp6

Tower: Fp2 = Fp[u]/(u^2+1), Fp6 = Fp2[v]/(v^3 - (1+u)), Fp12 = Fp6[w]/(w^2 - v).

TPU-first design: tower ops are written in a stacked (structure-of-arrays)
style — every group of independent Fp multiplies OR adds/subs is issued as a
single batched FP op with a stacked leading axis.  A full Fp12 multiply is
one FP.mul (54 products) plus ~10 stacked add/sub calls, which keeps both
the XLA graph small (compile time) and the VPU wide (runtime).

Parity: replaces ark-ff Fp2/Fp6/Fp12 (reference src/hasher.rs:7,787-803).
"""

import jax.numpy as jnp

from .. import constants as C
from .fp import FP


# ----------------------------------------------------------------------------
# stacked low-level helpers
# ----------------------------------------------------------------------------

def _stack2(pairs):
    """Broadcast all operands to a common shape, then stack both sides:
    returns (A, B) with leading dim len(pairs)."""
    shape = pairs[0][0].shape
    for a, b in pairs:
        shape = jnp.broadcast_shapes(shape, a.shape, b.shape)
    a = jnp.stack([jnp.broadcast_to(p[0], shape) for p in pairs])
    b = jnp.stack([jnp.broadcast_to(p[1], shape) for p in pairs])
    return a, b


def _mul_many(pairs):
    """pairs: list of (a, b) limb tensors -> list of products via one
    stacked FP.mul."""
    k = len(pairs)
    if k == 1:
        return [FP.mul(pairs[0][0], pairs[0][1])]
    a, b = _stack2(pairs)
    out = FP.mul(a, b)
    return [out[i] for i in range(k)]


def _add_many(pairs):
    """Stacked modular adds: list of (a, b) -> list of sums, one FP.add."""
    k = len(pairs)
    if k == 1:
        return [FP.add(pairs[0][0], pairs[0][1])]
    a, b = _stack2(pairs)
    out = FP.add(a, b)
    return [out[i] for i in range(k)]


def _sub_many(pairs):
    k = len(pairs)
    if k == 1:
        return [FP.sub(pairs[0][0], pairs[0][1])]
    a, b = _stack2(pairs)
    out = FP.sub(a, b)
    return [out[i] for i in range(k)]


# ----------------------------------------------------------------------------
# Fp2
# ----------------------------------------------------------------------------

def fp2_encode(x):
    return (jnp.asarray(FP.encode(x[0])), jnp.asarray(FP.encode(x[1])))

def fp2_encode_batch(xs):
    return (
        jnp.asarray(FP.encode([x[0] for x in xs])),
        jnp.asarray(FP.encode([x[1] for x in xs])),
    )

def fp2_decode(a):
    return (FP.decode(a[0]), FP.decode(a[1]))

def fp2_zero_like(a):
    return (jnp.zeros_like(a[0]), jnp.zeros_like(a[1]))

def fp2_one_like(a):
    one = jnp.broadcast_to(FP.ONE, a[0].shape)
    return (one, jnp.zeros_like(a[1]))

def fp2_add(a, b):
    r = _add_many([(a[0], b[0]), (a[1], b[1])])
    return (r[0], r[1])

def fp2_sub(a, b):
    r = _sub_many([(a[0], b[0]), (a[1], b[1])])
    return (r[0], r[1])

def fp2_add_many(pairs):
    """k independent Fp2 adds in one stacked FP.add."""
    flat = [(x, y) for (a, b) in pairs for x, y in ((a[0], b[0]), (a[1], b[1]))]
    r = _add_many(flat)
    return [(r[2 * i], r[2 * i + 1]) for i in range(len(pairs))]

def fp2_sub_many(pairs):
    flat = [(x, y) for (a, b) in pairs for x, y in ((a[0], b[0]), (a[1], b[1]))]
    r = _sub_many(flat)
    return [(r[2 * i], r[2 * i + 1]) for i in range(len(pairs))]

def fp2_neg(a):
    z = jnp.zeros_like(a[0])
    r = _sub_many([(z, a[0]), (z, a[1])])
    return (r[0], r[1])

def fp2_conj(a):
    return (a[0], FP.neg(a[1]))

def fp2_mul_pairs(pairs):
    """k independent Fp2 products (Karatsuba).  On TPU this is ONE fused
    Pallas kernel; the portable path is one stacked FP.mul of 3k limb
    products plus 4 stacked add/sub calls."""
    k = len(pairs)
    if FP._use_pallas():
        shape = pairs[0][0][0].shape
        for a, b in pairs:
            shape = jnp.broadcast_shapes(
                shape, a[0].shape, a[1].shape, b[0].shape, b[1].shape
            )
        def stk(sel):
            return jnp.stack([jnp.broadcast_to(sel(p), shape) for p in pairs])
        a0 = stk(lambda p: p[0][0])
        a1 = stk(lambda p: p[0][1])
        b0 = stk(lambda p: p[1][0])
        b1 = stk(lambda p: p[1][1])
        c0, c1 = FP.kernels.fp2_mul(a0, a1, b0, b1)
        return [(c0[i], c1[i]) for i in range(k)]
    shape = pairs[0][0][0].shape
    for a, b in pairs:
        shape = jnp.broadcast_shapes(shape, a[0].shape, a[1].shape, b[0].shape, b[1].shape)
    a0 = jnp.stack([jnp.broadcast_to(a[0], shape) for a, _ in pairs])
    a1 = jnp.stack([jnp.broadcast_to(a[1], shape) for a, _ in pairs])
    b0 = jnp.stack([jnp.broadcast_to(b[0], shape) for _, b in pairs])
    b1 = jnp.stack([jnp.broadcast_to(b[1], shape) for _, b in pairs])
    asum = FP.add(a0, a1)
    bsum = FP.add(b0, b1)
    A = jnp.concatenate([a0, a1, asum], axis=0)
    B = jnp.concatenate([b0, b1, bsum], axis=0)
    V = FP.mul(A, B)
    v0, v1, v2 = V[:k], V[k : 2 * k], V[2 * k :]
    c0 = FP.sub(v0, v1)
    c1 = FP.sub(FP.sub(v2, v0), v1)
    return [(c0[i], c1[i]) for i in range(k)]

def fp2_mul(a, b):
    return fp2_mul_pairs([(a, b)])[0]

def fp2_sqr_many(elems):
    """k independent Fp2 squares: one fused Pallas launch on TPU, else one
    stacked FP.mul of 2k products."""
    k = len(elems)
    shape = elems[0][0].shape
    for a in elems:
        shape = jnp.broadcast_shapes(shape, a[0].shape, a[1].shape)
    a0 = jnp.stack([jnp.broadcast_to(a[0], shape) for a in elems])
    a1 = jnp.stack([jnp.broadcast_to(a[1], shape) for a in elems])
    if FP._use_pallas():
        c0, c1 = FP.kernels.fp2_sqr(a0, a1)
        return [(c0[i], c1[i]) for i in range(k)]
    s = FP.add(a0, a1)
    d = FP.sub(a0, a1)
    A = jnp.concatenate([s, a0], axis=0)
    B = jnp.concatenate([d, a1], axis=0)
    V = FP.mul(A, B)
    re, m = V[:k], V[k:]
    im = FP.add(m, m)
    return [(re[i], im[i]) for i in range(k)]

def fp2_sqr(a):
    return fp2_sqr_many([a])[0]

def fp2_muls(a, s):
    """Multiply by an Fp scalar (limb tensor)."""
    vs = _mul_many([(a[0], s), (a[1], s)])
    return (vs[0], vs[1])

def fp2_mul_xi(a):
    return (FP.sub(a[0], a[1]), FP.add(a[0], a[1]))

def fp2_mul_xi_many(elems):
    k = len(elems)
    shape = elems[0][0].shape
    for a in elems:
        shape = jnp.broadcast_shapes(shape, a[0].shape, a[1].shape)
    a0 = jnp.stack([jnp.broadcast_to(a[0], shape) for a in elems])
    a1 = jnp.stack([jnp.broadcast_to(a[1], shape) for a in elems])
    re = FP.sub(a0, a1)
    im = FP.add(a0, a1)
    return [(re[i], im[i]) for i in range(k)]

def fp2_inv(a):
    """1 / (a0 + a1 u) = conj(a) / (a0^2 + a1^2); 0 -> 0."""
    vs = _mul_many([(a[0], a[0]), (a[1], a[1])])
    n = FP.add(vs[0], vs[1])
    ni = FP.inv(n)
    vs = _mul_many([(a[0], ni), (a[1], ni)])
    return (vs[0], FP.neg(vs[1]))

def fp2_cmov(cond, a, b):
    return (FP.cmov(cond, a[0], b[0]), FP.cmov(cond, a[1], b[1]))

def fp2_is_zero(a):
    return FP.is_zero(a[0]) & FP.is_zero(a[1])

def fp2_eq(a, b):
    return FP.eq(a[0], b[0]) & FP.eq(a[1], b[1])

def fp2_sgn0(a):
    """RFC 9380 sgn0, m=2 (reference src/hasher.rs:520-530); converts out of
    Montgomery form for canonical parity."""
    both = FP.from_mont(jnp.stack([a[0], a[1]]))
    r0, r1 = both[0], both[1]
    s0 = r0[..., 0] & 1
    z0 = FP.is_zero(r0)
    s1 = r1[..., 0] & 1
    return jnp.where(z0, s1, s0)


# tower/frobenius constants in Montgomery form ------------------------------

def _const_fp2(c):
    return (jnp.asarray(FP.encode(c[0])), jnp.asarray(FP.encode(c[1])))

FROB6_C1 = tuple(_const_fp2(c) for c in C.FROB6_C1)
FROB6_C2 = tuple(_const_fp2(c) for c in C.FROB6_C2)
FROB12_C1 = tuple(_const_fp2(c) for c in C.FROB12_C1)


def _bcast(const_fp2, like_fp2):
    return (
        jnp.broadcast_to(const_fp2[0], like_fp2[0].shape),
        jnp.broadcast_to(const_fp2[1], like_fp2[1].shape),
    )


# ----------------------------------------------------------------------------
# Fp6
# ----------------------------------------------------------------------------

def fp6_add(a, b):
    r = fp2_add_many(list(zip(a, b)))
    return tuple(r)

def fp6_sub(a, b):
    r = fp2_sub_many(list(zip(a, b)))
    return tuple(r)

def fp6_neg(a):
    z = fp2_zero_like(a[0])
    r = fp2_sub_many([(z, x) for x in a])
    return tuple(r)

def fp6_mul_pairs(pairs):
    """k independent Fp6 products (Toom-style 6-mul schedule).  On TPU this
    is ONE fused Pallas launch (18 Montgomery products + combination); the
    portable path stacks into 1 FP.mul of 18k products + ~8 stacked
    add/sub calls."""
    k = len(pairs)
    from ..utils.config import config

    # The loop-form kernel rewrite (ops/pallas/kernels.py) keeps each
    # pallas_call site's Mosaic IR small enough that ~10 sites in the Miller
    # scan body no longer blow the remote compile helper's memory budget
    # (the unrolled form hit SIGKILL at a 26.7 MB module), so this is on by
    # default (utils/config.py fuse_fp6).
    if FP._use_pallas() and config.fuse_fp6:
        shape = pairs[0][0][0][0].shape
        for a, b in pairs:
            for e in (*a, *b):
                shape = jnp.broadcast_shapes(shape, e[0].shape, e[1].shape)

        def stk(sel):
            return jnp.stack([jnp.broadcast_to(sel(p), shape) for p in pairs])

        a_coords = [stk(lambda p, i=i, j=j: p[0][i][j]) for i in range(3) for j in range(2)]
        b_coords = [stk(lambda p, i=i, j=j: p[1][i][j]) for i in range(3) for j in range(2)]
        o = FP.kernels.fp6_mul(a_coords, b_coords)
        return [
            ((o[0][i], o[1][i]), (o[2][i], o[3][i]), (o[4][i], o[5][i]))
            for i in range(k)
        ]
    # operand sums: per pair, [a1+a2, a0+a1, a0+a2] and same for b
    sum_jobs = []
    for a, b in pairs:
        sum_jobs += [(a[1], a[2]), (a[0], a[1]), (a[0], a[2]),
                     (b[1], b[2]), (b[0], b[1]), (b[0], b[2])]
    sums = fp2_add_many(sum_jobs)
    mul_jobs = []
    for i, (a, b) in enumerate(pairs):
        sa12, sa01, sa02, sb12, sb01, sb02 = sums[6 * i : 6 * i + 6]
        mul_jobs += [
            (a[0], b[0]), (a[1], b[1]), (a[2], b[2]),
            (sa12, sb12), (sa01, sb01), (sa02, sb02),
        ]
    vs = fp2_mul_pairs(mul_jobs)
    # combination phase, stacked across pairs
    s_jobs = []
    for i in range(k):
        v0, v1, v2 = vs[6 * i : 6 * i + 3]
        s_jobs += [(v1, v2), (v0, v1), (v0, v2)]
    ssum = fp2_add_many(s_jobs)
    d_jobs = []
    for i in range(k):
        _, _, _, t12, t01, t02 = vs[6 * i : 6 * i + 6]
        s12, s01, s02 = ssum[3 * i : 3 * i + 3]
        d_jobs += [(t12, s12), (t01, s01), (t02, s02)]
    ds = fp2_sub_many(d_jobs)
    xi_jobs = []
    for i in range(k):
        d12 = ds[3 * i]
        v2 = vs[6 * i + 2]
        xi_jobs += [d12, v2]
    xis = fp2_mul_xi_many(xi_jobs)
    out_jobs = []
    for i in range(k):
        v0, v1 = vs[6 * i], vs[6 * i + 1]
        d01, d02 = ds[3 * i + 1], ds[3 * i + 2]
        xi12, xiv2 = xis[2 * i], xis[2 * i + 1]
        out_jobs += [(v0, xi12), (d01, xiv2), (d02, v1)]
    outs = fp2_add_many(out_jobs)
    return [tuple(outs[3 * i : 3 * i + 3]) for i in range(k)]

def fp6_mul(a, b):
    return fp6_mul_pairs([(a, b)])[0]

def fp6_mul_v(a):
    return (fp2_mul_xi(a[2]), a[0], a[1])

def fp6_inv(a):
    a0, a1, a2 = a
    vs = fp2_mul_pairs([(a0, a0), (a1, a2), (a2, a2), (a0, a1), (a1, a1), (a0, a2)])
    sq0, m12, sq2, m01, sq1, m02 = vs
    xis = fp2_mul_xi_many([m12, sq2])
    subs = fp2_sub_many([(sq0, xis[0]), (xis[1], m01), (sq1, m02)])
    c0, c1, c2 = subs
    vs = fp2_mul_pairs([(a2, c1), (a1, c2), (a0, c0)])
    t = fp2_add(fp2_mul_xi(fp2_add(vs[0], vs[1])), vs[2])
    ti = fp2_inv(t)
    vs = fp2_mul_pairs([(c0, ti), (c1, ti), (c2, ti)])
    return (vs[0], vs[1], vs[2])

def fp6_frob(a, power):
    def cj(x):
        return fp2_conj(x) if power % 2 else x
    i = power % 6
    r1, r2 = fp2_mul_pairs([
        (cj(a[1]), _bcast(FROB6_C1[i], a[1])),
        (cj(a[2]), _bcast(FROB6_C2[i], a[2])),
    ])
    return (cj(a[0]), r1, r2)

def fp6_cmov(cond, a, b):
    return tuple(fp2_cmov(cond, x, y) for x, y in zip(a, b))


# ----------------------------------------------------------------------------
# Fp12
# ----------------------------------------------------------------------------

def fp12_one_like(a):
    f2 = a[0][0]
    one2 = fp2_one_like(f2)
    z2 = fp2_zero_like(f2)
    return ((one2, z2, z2), (z2, z2, z2))

def fp12_add(a, b):
    r = fp2_add_many(list(zip(a[0], b[0])) + list(zip(a[1], b[1])))
    return ((r[0], r[1], r[2]), (r[3], r[4], r[5]))

def _flat12(f):
    """fp12 ((c0,c1,c2),(c3,c4,c5)) -> 12 coord tensors, coefficient-major."""
    return [c for f6 in f for f2c in f6 for c in f2c]


def _unflat12(o):
    f = [(o[2 * i], o[2 * i + 1]) for i in range(6)]
    return ((f[0], f[1], f[2]), (f[3], f[4], f[5]))


def fp12_mul(a, b):
    """Karatsuba over Fp6: 3 Fp6 products in one stacked schedule; on TPU
    one fused Pallas launch (config.fuse_fp12)."""
    from ..utils.config import config

    if FP._use_pallas() and config.fuse_fp12:
        return _unflat12(FP.kernels.fp12_mul(_flat12(a) + _flat12(b)))
    a0, a1 = a
    b0, b1 = b
    pre = fp2_add_many(list(zip(a0, a1)) + list(zip(b0, b1)))
    asum, bsum = tuple(pre[:3]), tuple(pre[3:])
    v0, v1, v2 = fp6_mul_pairs([(a0, b0), (a1, b1), (asum, bsum)])
    c0 = fp6_add(v0, fp6_mul_v(v1))
    c1 = fp6_sub(v2, fp6_add(v0, v1))
    return (c0, c1)

def fp12_sqr(a):
    from ..utils.config import config

    if FP._use_pallas() and config.fuse_fp12:
        return _unflat12(FP.kernels.fp12_sqr(_flat12(a)))
    a0, a1 = a
    pre = fp2_add_many(list(zip(a0, a1)) + list(zip(a0, fp6_mul_v(a1))))
    s, t_in = tuple(pre[:3]), tuple(pre[3:])
    v0, t = fp6_mul_pairs([(a0, a1), (s, t_in)])
    c0 = fp6_sub(fp6_sub(t, v0), fp6_mul_v(v0))
    c1 = fp6_add(v0, v0)
    return (c0, c1)

def fp12_cyclotomic_sqr_k(f, count: int):
    """count successive Granger-Scott squares.  On TPU they run inside ONE
    Pallas launch (fori_loop in-kernel), so a static squaring run of the
    final-exp x-chain costs one launch + one HBM round-trip total."""
    from ..utils.config import config

    if FP._use_pallas() and config.fuse_cyclo and count > 0:
        a, b = f
        z = (a[0], b[1], b[0], a[2], a[1], b[2])
        o = FP.kernels.cyclo_sqr([c for zz in z for c in zz], count=count)
        zn = [(o[2 * i], o[2 * i + 1]) for i in range(6)]
        return ((zn[0], zn[4], zn[3]), (zn[2], zn[1], zn[5]))
    for _ in range(count):
        f = fp12_cyclotomic_sqr(f)
    return f


def fp12_expx(m, bits_msb):
    """m^|x| for cyclotomic-subgroup m via ONE fused Pallas launch
    (kernels.exp_x): the whole final-exp x-chain — Granger-Scott squaring
    runs + multiplies by m at the set bits — costs one kernel dispatch.
    bits_msb: the MSB-first bit list of |x|.  The caller conjugates for
    x < 0.  TPU-only (callers gate on config.fuse_expx + _use_pallas)."""
    segs = []
    run = 0
    for bit in bits_msb[1:]:
        run += 1
        if bit:
            segs.append((run, 1))
            run = 0
    if run:
        segs.append((run, 0))
    return _unflat12(FP.kernels.exp_x(_flat12(m), segs))


def fp12_cyclotomic_sqr(f):
    """Granger-Scott squaring for cyclotomic-subgroup elements: 9 Fp2
    squares (one stacked call) + stacked combinations — half the multiplies
    of a generic fp12_sqr.  Mirrors golden fp12_cyclotomic_sqr.

    On TPU the whole square (18 Montgomery muls + every xi/combination
    add) runs as ONE fused Pallas launch (config.fuse_cyclo) — the
    final-exponentiation x-chains are squaring-latency-bound, so keeping
    the combination arithmetic inside the kernel removes the inter-launch
    HBM round-trips the stacked jnp path pays."""
    from ..utils.config import config

    a, b = f
    z = (a[0], b[1], b[0], a[2], a[1], b[2])
    if FP._use_pallas() and config.fuse_cyclo:
        o = FP.kernels.cyclo_sqr([c for zz in z for c in zz])
        zn = [(o[2 * i], o[2 * i + 1]) for i in range(6)]
        return ((zn[0], zn[4], zn[3]), (zn[2], zn[1], zn[5]))
    sums = fp2_add_many([(z[0], z[1]), (z[2], z[3]), (z[4], z[5])])
    sq = fp2_sqr_many([z[0], z[1], z[2], z[3], z[4], z[5]] + sums)
    # fp4 squares: c0 = t0 + xi t1, c1 = (a+b)^2 - t0 - t1
    xi_t1 = fp2_mul_xi_many([sq[1], sq[3], sq[5]])
    t00 = fp2_add(sq[0], xi_t1[0])
    t20 = fp2_add(sq[2], xi_t1[1])
    t40 = fp2_add(sq[4], xi_t1[2])
    subs = fp2_sub_many([
        (sq[6], fp2_add(sq[0], sq[1])),
        (sq[7], fp2_add(sq[2], sq[3])),
        (sq[8], fp2_add(sq[4], sq[5])),
    ])
    t01, t21, t41 = subs

    def m3m2(t, zz):  # 3t - 2z
        r = fp2_sub(t, zz)
        r = fp2_add(r, r)
        return fp2_add(r, t)

    def p3p2(t, zz):  # 3t + 2z
        r = fp2_add(t, zz)
        r = fp2_add(r, r)
        return fp2_add(r, t)

    z0n = m3m2(t00, z[0])
    z1n = p3p2(t01, z[1])
    z2n = p3p2(fp2_mul_xi(t41), z[2])
    z3n = m3m2(t40, z[3])
    z4n = m3m2(t20, z[4])
    z5n = p3p2(t21, z[5])
    return ((z0n, z4n, z3n), (z2n, z1n, z5n))


def fp12_conj(a):
    return (a[0], fp6_neg(a[1]))

def fp12_inv(a):
    a0, a1 = a
    s0, s1 = fp6_mul_pairs([(a0, a0), (a1, a1)])
    t = fp6_sub(s0, fp6_mul_v(s1))
    ti = fp6_inv(t)
    r0, r1 = fp6_mul_pairs([(a0, ti), (a1, ti)])
    return (r0, fp6_neg(r1))

def fp12_frob(a, power):
    i = power % 12
    c0 = fp6_frob(a[0], power)
    c1 = fp6_frob(a[1], power)
    k = _bcast(FROB12_C1[i], c1[0])
    r = fp2_mul_pairs([(x, k) for x in c1])
    return (c0, (r[0], r[1], r[2]))

def fp12_cmov(cond, a, b):
    return (fp6_cmov(cond, a[0], b[0]), fp6_cmov(cond, a[1], b[1]))


def fp12_prod(f, axis: int = 0):
    """Product of Fp12 elements along a leading batch axis (halving tree),
    used by distinct-message aggregate verification to combine per-pair
    Miller accumulators before one shared final exponentiation."""
    def take(x, sl):
        return jax.tree.map(lambda c: c[sl], x)

    import jax

    n = f[0][0][0].shape[axis]
    cur = f
    m = n
    while m > 1:
        half = m // 2
        sl_a = (slice(None),) * axis + (slice(0, half),)
        sl_b = (slice(None),) * axis + (slice(half, 2 * half),)
        prod = fp12_mul(take(cur, sl_a), take(cur, sl_b))
        if m % 2:
            tail = take(cur, (slice(None),) * axis + (slice(2 * half, m),))
            prod = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=axis), prod, tail
            )
            m = half + 1
        else:
            m = half
        cur = prod
    return take(cur, (slice(None),) * axis + (0,))

def fp12_is_one(a):
    one = fp12_one_like(a)
    ok = fp2_eq(a[0][0], one[0][0])
    for i in range(3):
        if i:
            ok &= fp2_is_zero(a[0][i])
        ok &= fp2_is_zero(a[1][i])
    return ok


# host conversions -----------------------------------------------------------

def fp6_encode(x):
    return tuple(fp2_encode(c) for c in x)

def fp12_encode(x):
    return tuple(fp6_encode(c) for c in x)

def fp12_decode(a):
    return tuple(tuple(fp2_decode(c2) for c2 in c6) for c6 in a)
