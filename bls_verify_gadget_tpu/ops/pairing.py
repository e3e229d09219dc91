"""L2: batched optimal-ate pairing (jnp path).

Miller loop in homogeneous projective coordinates on the M-twist with sparse
mul_by_014 line application (Costello-Lange-Naehrig step formulas); the
negative BLS parameter is handled by a final conjugation.  Supports shared
multi-pairing (one f accumulator, one final exponentiation) with per-pair
validity masks so infinity points contribute the neutral line.

Differential-tested against golden/pairing.py (the transparent untwisted
implementation) after final exponentiation — line normalisations differ by
Fp2 factors which the easy part kills.

Parity: replaces ark-ec Bls12::multi_pairing (reference src/bls.rs:454-457).
"""

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .fp import FP
from . import tower as T

# The twist curve coefficient b' = 4(1+u) is folded into the doubling
# step as shift/adds (b'*c = 4*xi(c)); no device constant is needed.

_ABS_X_BITS_MSB = C.ABS_X_BITS[::-1]  # MSB first


def fp_half(a):
    """a/2 mod p: add p if odd, then shift right one bit across limbs."""
    odd = (a[..., 0] & 1) > 0
    ap = FP._propagate(a + FP.P_LIMBS)  # may be 25 bits total? p+a < 2^382 fits
    s = jnp.where(odd[..., None], ap, a)
    down = s >> 1
    up = (s << 15) & jnp.uint32(0x8000)
    carry = jnp.concatenate([up[..., 1:], jnp.zeros_like(up[..., :1])], axis=-1)
    return down | carry


def fp2_half(a):
    return (fp_half(a[0]), fp_half(a[1]))


# ----------------------------------------------------------------------------
# sparse Fp12 multiplication by a line value c0 + c1 v + c4 vw
# ----------------------------------------------------------------------------

def fp12_mul_by_014(f, c0, c1, c4):
    """f * (g0 + g1 w) with g0 = (c0, c1, 0), g1 = (0, c4, 0).  On TPU the
    15 Fp2 products + combinations run as ONE fused Pallas launch
    (config.fuse_fp12)."""
    from ..utils.config import config

    if T.FP._use_pallas() and config.fuse_fp12:
        o = T.FP.kernels.mul014(
            T._flat12(f) + [c0[0], c0[1], c1[0], c1[1], c4[0], c4[1]]
        )
        return T._unflat12(o)
    a, b = f
    v0 = _fp6_mul_by_01(a, c0, c1)
    v1 = _fp6_mul_by_1(b, c4)
    c1c4 = T.fp2_add(c1, c4)
    t = _fp6_mul_by_01(T.fp6_add(a, b), c0, c1c4)
    out0 = T.fp6_add(v0, T.fp6_mul_v(v1))
    out1 = T.fp6_sub(t, T.fp6_add(v0, v1))
    return (out0, out1)


def _fp6_mul_by_01(a, d0, d1):
    """(a0,a1,a2) * (d0 + d1 v) =
    (a0 d0 + xi a2 d1, a0 d1 + a1 d0, a1 d1 + a2 d0)."""
    p = T.fp2_mul_pairs([
        (a[0], d0), (a[2], d1), (a[0], d1), (a[1], d0), (a[1], d1), (a[2], d0),
    ])
    return (
        T.fp2_add(p[0], T.fp2_mul_xi(p[1])),
        T.fp2_add(p[2], p[3]),
        T.fp2_add(p[4], p[5]),
    )


def _fp6_mul_by_1(a, d1):
    """(a0,a1,a2) * (d1 v) = (xi a2 d1, a0 d1, a1 d1)."""
    p = T.fp2_mul_pairs([(a[2], d1), (a[0], d1), (a[1], d1)])
    return (T.fp2_mul_xi(p[0]), p[1], p[2])


# ----------------------------------------------------------------------------
# Miller loop steps (CLN homogeneous projective, M-twist)
# ----------------------------------------------------------------------------

def _dbl_step(t, xp, yp):
    """Doubling step: returns (new T, line coeffs (c0, c1, c4)).  On TPU
    the whole step (10 Fp2 mul/sqr + line scalings + halvings) is ONE
    fused Pallas launch (config.fuse_steps)."""
    from ..utils.config import config

    X, Y, Z = t
    if T.FP._use_pallas() and config.fuse_steps:
        o = T.FP.kernels.dbl_step(
            [X[0], X[1], Y[0], Y[1], Z[0], Z[1], xp, yp]
        )
        return ((o[0], o[1]), (o[2], o[3]), (o[4], o[5])), (
            (o[6], o[7]), (o[8], o[9]), (o[10], o[11]),
        )
    a_, b_, c_ = T.fp2_mul_pairs([(X, Y), (Y, Y), (Z, Z)])
    a_ = fp2_half(a_)
    c3 = T.fp2_add(T.fp2_add(c_, c_), c_)
    # e = 3 b' Z^2 with b' = 4(1+u): b'*c = 4*xi(c) — multiplication-free
    e_ = T.fp2_mul_xi(c3)
    e_ = T.fp2_add(e_, e_)
    e_ = T.fp2_add(e_, e_)
    f_ = T.fp2_add(T.fp2_add(e_, e_), e_)           # 3e
    g_ = fp2_half(T.fp2_add(b_, f_))
    h_ = T.fp2_sub(T.fp2_sqr(T.fp2_add(Y, Z)), T.fp2_add(b_, c_))  # 2YZ
    i_ = T.fp2_sub(e_, b_)
    j_ = T.fp2_sqr(X)
    e2 = T.fp2_sqr(e_)
    x3, z3 = T.fp2_mul_pairs([(a_, T.fp2_sub(b_, f_)), (b_, h_)])
    y3 = T.fp2_sub(T.fp2_sqr(g_), T.fp2_add(T.fp2_add(e2, e2), e2))
    # line: c0 = e - b, c1 = 3 X^2 * xp, c4 = -h * yp
    j3 = T.fp2_add(T.fp2_add(j_, j_), j_)
    c1l = T.fp2_muls(j3, xp)
    c4l = T.fp2_muls(T.fp2_neg(h_), yp)
    return (x3, y3, z3), (i_, c1l, c4l)


def _add_step(t, q, xp, yp):
    """Mixed addition step with affine q = (xq, yq):
    returns (new T, line coeffs).  On TPU one fused Pallas launch
    (config.fuse_steps)."""
    from ..utils.config import config

    X, Y, Z = t
    xq, yq = q
    if T.FP._use_pallas() and config.fuse_steps:
        o = T.FP.kernels.add_step(
            [X[0], X[1], Y[0], Y[1], Z[0], Z[1],
             xq[0], xq[1], yq[0], yq[1], xp, yp]
        )
        return ((o[0], o[1]), (o[2], o[3]), (o[4], o[5])), (
            (o[6], o[7]), (o[8], o[9]), (o[10], o[11]),
        )
    yqz, xqz = T.fp2_mul_pairs([(yq, Z), (xq, Z)])
    th = T.fp2_sub(Y, yqz)        # theta
    lm = T.fp2_sub(X, xqz)        # lambda
    cc = T.fp2_sqr(th)
    dd = T.fp2_sqr(lm)
    e_, f_, g_ = T.fp2_mul_pairs([(lm, dd), (Z, cc), (X, dd)])
    h_ = T.fp2_sub(T.fp2_add(e_, f_), T.fp2_add(g_, g_))
    x3, z3 = T.fp2_mul_pairs([(lm, h_), (Z, e_)])
    t1, t2 = T.fp2_mul_pairs([(th, T.fp2_sub(g_, h_)), (e_, Y)])
    y3 = T.fp2_sub(t1, t2)
    # line: c0 = theta xq - lambda yq, c1 = -theta xp, c4 = lambda yp
    p1, p2 = T.fp2_mul_pairs([(th, xq), (lm, yq)])
    c0l = T.fp2_sub(p1, p2)
    c1l = T.fp2_muls(T.fp2_neg(th), xp)
    c4l = T.fp2_muls(lm, yp)
    return (x3, y3, z3), (c0l, c1l, c4l)


def _neutral_line(c0, c1, c4, valid):
    one = T.fp2_one_like(c0)
    zero = T.fp2_zero_like(c0)
    return (
        T.fp2_cmov(valid, c0, one),
        T.fp2_cmov(valid, c1, zero),
        T.fp2_cmov(valid, c4, zero),
    )


def _cat1(ts):
    return jnp.concatenate(ts, axis=0)


def _cat2(f2s):
    return (_cat1([a[0] for a in f2s]), _cat1([a[1] for a in f2s]))


def _slice2(a, lo, hi):
    return (a[0][lo:hi], a[1][lo:hi])


def _fused_miller_loop(xps, yps, qs, valids, f0):
    """Whole Miller loop through the fused RUN kernels
    (kernels.miller_dbl_run / miller_add, config.fuse_miller): one launch
    per doubling run + one per set bit of |x| — ~11 kernel dispatches for
    the entire loop.  The verify pipeline is launch-latency-bound on v5e,
    so this is the first-order cost of the pairing stage."""
    k = len(xps)
    K = T.FP.kernels
    v_u32 = [v.astype(jnp.uint32)[..., None] for v in valids]
    f = f0
    Ts = [(q[0], q[1], T.fp2_one_like(q[0])) for q in qs]

    def unpack(o):
        f = T._unflat12(o[:12])
        ts = []
        for i in range(k):
            b = 12 + 6 * i
            ts.append(
                ((o[b], o[b + 1]), (o[b + 2], o[b + 3]), (o[b + 4], o[b + 5]))
            )
        return f, ts

    def dbl_run(f, ts, count):
        coords = T._flat12(f)
        for i in range(k):
            X, Y, Z = ts[i]
            coords += [X[0], X[1], Y[0], Y[1], Z[0], Z[1],
                       xps[i], yps[i], v_u32[i]]
        return unpack(K.miller_dbl_run(coords, k, count))

    def add_block(f, ts):
        coords = T._flat12(f)
        for i in range(k):
            X, Y, Z = ts[i]
            xq, yq = qs[i]
            coords += [X[0], X[1], Y[0], Y[1], Z[0], Z[1],
                       xq[0], xq[1], yq[0], yq[1],
                       xps[i], yps[i], v_u32[i]]
        return unpack(K.miller_add(coords, k))

    run = 0
    for bit in _ABS_X_BITS_MSB[1:]:
        run += 1
        if bit:
            f, Ts = dbl_run(f, Ts, run)
            f, Ts = add_block(f, Ts)
            run = 0
    if run:
        f, Ts = dbl_run(f, Ts, run)
    return T.fp12_conj(f)  # x < 0


def multi_miller_loop(pairs):
    """pairs: list of (p_aff, q_aff, valid) with p_aff = (xp, yp) Fp limb
    tensors, q_aff = (xq, yq) Fp2 pairs, valid a boolean mask (...,).
    Returns the shared Miller accumulator f (Fp12), conjugated for x < 0.

    On TPU with config.fuse_miller, homogeneous-shape pairs go through the
    fused RUN kernels (_fused_miller_loop): the whole loop is ~11 kernel
    dispatches.  Otherwise, when every pair shares one 1-D batch shape,
    the k pairs are STACKED along the batch axis so each Miller step
    (dbl/add + line coefficients) is ONE kernel launch at k*B instead of k
    launches at B — the line applications (sparse 014 multiplies into the
    shared f) stay sequential as required.  The per-pair path below
    remains for heterogeneous shapes."""
    from ..utils.config import config

    xps = [p[0] for p, _, _ in pairs]
    yps = [p[1] for p, _, _ in pairs]
    qs = [q for _, q, _ in pairs]
    valids = [v for _, _, v in pairs]
    k = len(pairs)

    lead = xps[0].shape[:-1]
    homogeneous = all(x.shape[:-1] == lead for x in xps + yps) and all(
        q[0][0].shape[:-1] == lead for q in qs
    )
    if T.FP._use_pallas() and config.fuse_miller and homogeneous:
        return _fused_miller_loop(
            xps, yps, qs, valids, _fp12_one_like_from(qs[0][0])
        )
    stacked = (
        k > 1
        and len(lead) == 1
        and all(x.shape[:-1] == lead for x in xps + yps)
        and all(q[0][0].shape[:-1] == lead for q in qs)
    )
    f0 = _fp12_one_like_from(qs[0][0])

    if stacked:
        B = lead[0]
        xp_s, yp_s = _cat1(xps), _cat1(yps)
        q_s = (_cat2([q[0] for q in qs]), _cat2([q[1] for q in qs]))
        t_s = (q_s[0], q_s[1], T.fp2_one_like(q_s[0]))

        def split_lines(c0, c1, c4):
            for i in range(k):
                lo, hi = i * B, (i + 1) * B
                yield _slice2(c0, lo, hi), _slice2(c1, lo, hi), _slice2(c4, lo, hi)

        def dbl_body(state, _):
            f, ts = state
            f = T.fp12_sqr(f)
            tnew, (c0, c1, c4) = _dbl_step(ts, xp_s, yp_s)
            for i, (l0, l1, l4) in enumerate(split_lines(c0, c1, c4)):
                l0, l1, l4 = _neutral_line(l0, l1, l4, valids[i])
                f = fp12_mul_by_014(f, l0, l1, l4)
            return (f, tnew), None

        def add_block(state):
            f, ts = state
            tadd, (a0, a1, a4) = _add_step(ts, q_s, xp_s, yp_s)
            for i, (l0, l1, l4) in enumerate(split_lines(a0, a1, a4)):
                l0, l1, l4 = _neutral_line(l0, l1, l4, valids[i])
                f = fp12_mul_by_014(f, l0, l1, l4)
            return (f, tadd)

        def add_cmov(st, bit):
            f, ts = st
            tadd, (a0, a1, a4) = _add_step(ts, q_s, xp_s, yp_s)
            for i, (l0, l1, l4) in enumerate(split_lines(a0, a1, a4)):
                l0, l1, l4 = _neutral_line(l0, l1, l4, valids[i] & (bit > 0))
                f = fp12_mul_by_014(f, l0, l1, l4)
            return (f, _pt2_cmov(bit > 0, tadd, ts))

        state = (f0, t_s)
    else:
        def dbl_body(state, _):
            f, ts = state
            f = T.fp12_sqr(f)
            new_ts = []
            for i in range(len(ts)):
                tnew, (c0, c1, c4) = _dbl_step(ts[i], xps[i], yps[i])
                c0, c1, c4 = _neutral_line(c0, c1, c4, valids[i])
                f = fp12_mul_by_014(f, c0, c1, c4)
                new_ts.append(tnew)
            return (f, tuple(new_ts)), None

        def add_block(state):
            f, ts = state
            new_ts = []
            for i in range(len(ts)):
                tadd, (a0, a1, a4) = _add_step(ts[i], qs[i], xps[i], yps[i])
                a0, a1, a4 = _neutral_line(a0, a1, a4, valids[i])
                f = fp12_mul_by_014(f, a0, a1, a4)
                new_ts.append(tadd)
            return (f, tuple(new_ts))

        def add_cmov(st, bit):
            f, ts = st
            new_ts = []
            for i, (p, q, valid) in enumerate(pairs):
                tadd, line = _add_step(ts[i], q, p[0], p[1])
                a0, a1, a4 = _neutral_line(*line, valid & (bit > 0))
                f = fp12_mul_by_014(f, a0, a1, a4)
                new_ts.append(_pt2_cmov(bit > 0, tadd, ts[i]))
            return (f, tuple(new_ts))

        state = (f0, tuple((q[0], q[1], T.fp2_one_like(q[0])) for q in qs))

    from ..utils.config import use_static_ladders

    if use_static_ladders():
        # TPU: runs of doubling-only scan segments + one real addition block
        # per set bit (static bit pattern, no cmov work)
        run = 0
        for bit in _ABS_X_BITS_MSB[1:]:
            run += 1
            if bit:
                state, _ = jax.lax.scan(dbl_body, state, None, length=run)
                state = add_block(state)
                run = 0
        if run:
            state, _ = jax.lax.scan(dbl_body, state, None, length=run)
        return T.fp12_conj(state[0])  # x < 0

    # CPU/test backends: compact uniform body with cmov'd add steps
    bits = jnp.asarray(np.array(_ABS_X_BITS_MSB[1:], np.uint32))

    def body(st, bit):
        st, _ = dbl_body(st, None)
        st = add_cmov(st, bit)
        return st, None

    state, _ = jax.lax.scan(body, state, bits)
    return T.fp12_conj(state[0])  # x < 0


def _pt2_cmov(cond, a, b):
    return tuple(T.fp2_cmov(cond, x, y) for x, y in zip(a, b))


def _fp12_one_like_from(fp2_sample):
    one2 = T.fp2_one_like(fp2_sample)
    z2 = T.fp2_zero_like(fp2_sample)
    return ((one2, z2, z2), (z2, z2, z2))


# ----------------------------------------------------------------------------
# final exponentiation
# ----------------------------------------------------------------------------

def _exp_by_neg_x(m):
    """m^x (x the negative BLS parameter) for m in the cyclotomic subgroup:
    Granger-Scott squarings; ONE fused launch on TPU (config.fuse_expx),
    else static run-structure on TPU, compact cmov scan on CPU/test
    backends (see config.static_ladders)."""
    from ..utils.config import config, use_static_ladders

    if T.FP._use_pallas() and config.fuse_expx:
        return T.fp12_conj(T.fp12_expx(m, _ABS_X_BITS_MSB))

    if not use_static_ladders():
        bits = jnp.asarray(np.array(_ABS_X_BITS_MSB, np.uint32))
        one = _fp12_one_like_from(m[0][0])

        def body(f, bit):
            f = T.fp12_cyclotomic_sqr(f)
            fm = T.fp12_mul(f, m)
            f = T.fp12_cmov(bit > 0, fm, f)
            return f, None

        f, _ = jax.lax.scan(body, one, bits)
        return T.fp12_conj(f)

    def sqr_scan(f, count):
        # Granger-Scott cyclotomic squaring: valid because _exp_by_neg_x is
        # only ever applied after the easy part
        if count == 0:
            return f
        from ..utils.config import config

        if T.FP._use_pallas() and config.fuse_cyclo:
            # whole static run inside ONE launch (fori_loop in-kernel)
            return T.fp12_cyclotomic_sqr_k(f, count)
        if count <= 2:
            for _ in range(count):
                f = T.fp12_cyclotomic_sqr(f)
            return f

        def body(acc, _):
            return T.fp12_cyclotomic_sqr(acc), None

        f, _ = jax.lax.scan(body, f, None, length=count)
        return f

    f = m  # top set bit
    run = 0
    for bit in _ABS_X_BITS_MSB[1:]:
        run += 1
        if bit:
            f = sqr_scan(f, run)
            f = T.fp12_mul(f, m)
            run = 0
    f = sqr_scan(f, run)
    return T.fp12_conj(f)


def final_exponentiation(f):
    """Same structure as golden/pairing.py: easy part, then hard part via
    3(p^4-p^2+1)/r = (x-1)^2 (x+p) (x^2+p^2-1) + 3."""
    f1 = T.fp12_mul(T.fp12_frob(f, 6), T.fp12_inv(f))
    m = T.fp12_mul(T.fp12_frob(f1, 2), f1)
    t0 = T.fp12_mul(_exp_by_neg_x(m), T.fp12_conj(m))
    t1 = T.fp12_mul(_exp_by_neg_x(t0), T.fp12_conj(t0))
    t2 = T.fp12_mul(_exp_by_neg_x(t1), T.fp12_frob(t1, 1))
    t3 = T.fp12_mul(
        T.fp12_mul(_exp_by_neg_x(_exp_by_neg_x(t2)), T.fp12_frob(t2, 2)),
        T.fp12_conj(t2),
    )
    m3 = T.fp12_mul(T.fp12_sqr(m), m)
    return T.fp12_mul(t3, m3)


def multi_pairing(pairs):
    """Full shared multi-pairing: product of Miller loops then one final
    exponentiation (reference src/bls.rs:454-457 semantics)."""
    return final_exponentiation(multi_miller_loop(pairs))
