"""Fused Pallas TPU kernels for modular limb arithmetic (mul/add/sub and
fused Fp2/Fp6 tower products), parameterised over the field (Fp 24 limbs /
Fr 16 limbs).

Structure (round-2 rewrite, loop-form):
  * The Montgomery convolution runs as ONE lax.fori_loop whose body slides
    the accumulator window with pltpu.roll — the emitted Mosaic IR is O(1)
    in the limb count instead of O(n^2) unrolled statements.  This keeps
    per-call-site kernel payloads ~20x smaller, which is what makes the
    fused Fp6 kernel deployable (the unrolled form blew the XLA module past
    the remote compile helper's memory budget) and cuts TPU compile time.
  * Carry/borrow chains (tails, modular add/sub) use a Kogge-Stone
    generate/propagate parallel prefix over the limb rows: 5 doubling steps
    of full-width vector ops instead of a 24-step serial chain.  All-uint32
    arithmetic — Mosaic rejects i1 vector register casts.
  * Measured on TPU v5e: the loop-form Montgomery multiply matches the
    unrolled kernel's throughput (29M Fp-muls/s at batch 4k, >100M at 16k
    chained) at a fraction of the IR size.

Layout contract: operands in the framework's natural (..., nlimb) layout;
kernels transpose to limb-major (nlimb, TB) inside VMEM.  All kernels
preserve exact canonical semantics (inputs/outputs < m, limbs < 2^16), so
they are drop-in replacements for the ModField ops.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

MASK = 0xFFFF


# ----------------------------------------------------------------------------
# Kogge-Stone carry machinery on (n, tb) limb rows (axis 0 = limb index)
# ----------------------------------------------------------------------------

def _shift_down_rows(x, d, fill):
    """row i of result = row i-d of x; top d rows = fill (u32 scalar)."""
    top = jnp.full((d,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([top, x[:-d]], axis=0)


def _ks_prefix_rows(g, p):
    """Parallel prefix over (generate, propagate); g, p (n, tb) u32 in {0,1}.
    Returns (carry_in per row, total carry out of the top row)."""
    n = g.shape[0]
    d = 1
    while d < n:
        gs = _shift_down_rows(g, d, 0)
        ps = _shift_down_rows(p, d, 1)
        g = g | (p * gs)
        p = p * ps
        d *= 2
    return _shift_down_rows(g, 1, 0), g[-1:, :]


def _u32_nonzero(d):
    return (d | (jnp.uint32(0) - d)) >> 31


def _sel_rows(sel, a, b):
    """sel: (1, tb) u32 0/1 -> a where sel==1 else b (broadcast over rows)."""
    return b + (a - b) * sel


def _ks_carry_rows(s, n):
    """(n, tb) lazy rows (< 2^23, value fits n limbs) -> canonical rows."""
    lo = s & MASK
    hi = s >> 16
    s2 = lo + _shift_down_rows(hi, 1, 0)
    g = s2 >> 16
    p = ((s2 & MASK) + 1) >> 16
    c, _ = _ks_prefix_rows(g, p)
    return (s2 + c) & MASK


def _cond_sub_rows(r, p_limbs, n):
    """(n, tb) canonical rows in [0, 2m) -> [0, m)."""
    d = r - p_limbs
    g = d >> 31
    pz = 1 - _u32_nonzero(d)
    bin_, btot = _ks_prefix_rows(g, pz)
    out = (d - bin_) & MASK
    return _sel_rows(btot, r, out)


def _add_rows(a, b, p_limbs, n, tb):
    """(n, tb) canonical + canonical -> canonical."""
    s = a + b
    g = s >> 16
    p = ((s & MASK) + 1) >> 16
    c, _ = _ks_prefix_rows(g, p)
    return _cond_sub_rows((s + c) & MASK, p_limbs, n)


def _sub_rows(a, b, p_limbs, n, tb):
    d = a - b
    g = d >> 31
    pz = 1 - _u32_nonzero(d)
    bin_, btot = _ks_prefix_rows(g, pz)
    raw = (d - bin_) & MASK
    s = raw + p_limbs
    g2 = s >> 16
    p2 = ((s & MASK) + 1) >> 16
    c2, _ = _ks_prefix_rows(g2, p2)
    added = (s + c2) & MASK
    return _sel_rows(btot, added, raw)


def _propagate_rows(a, n, tb):
    """(n, tb) lazy rows (< 2^23) -> canonical limb rows (value preserved,
    must fit n limbs)."""
    return _ks_carry_rows(a, n)


# ----------------------------------------------------------------------------
# loop-form Montgomery convolution (merged CIOS under ONE fori_loop)
# ----------------------------------------------------------------------------

def _conv_reduce(a, b, p_limbs, n, tb, n0):
    """Montgomery product of transposed (n, TB) canonical-limb operands.

    Merged CIOS: per limb i of a, accumulate a_i*b and the reduction step
    q = ((t0 * n0) mod 2^16) * p into a sliding window held in registers;
    the window slides via pltpu.roll so the loop body is fully static.
    Columns stay < 2^23 (uint32-safe).  Returns canonical (n, TB) rows;
    output < 2m is conditionally reduced, valid for inputs < 2m each."""
    from jax.experimental.pallas import tpu as pltpu

    nw = n + 8  # window rows: n+1 used, padded to a sublane multiple

    def padz(x, lo, hi):
        parts = []
        if lo:
            parts.append(jnp.zeros((lo, tb), jnp.uint32))
        parts.append(x)
        if hi:
            parts.append(jnp.zeros((hi, tb), jnp.uint32))
        return jnp.concatenate(parts, axis=0)

    t0 = jnp.zeros((nw, tb), jnp.uint32)

    def body(i, carry):
        t, a_rot = carry
        ai = a_rot[0:1, :]
        prod = ai * b                         # exact: both < 2^16
        t = t + padz(prod & MASK, 0, nw - n) + padz(prod >> 16, 1, nw - n - 1)
        m = (t[0:1, :] * n0) & MASK
        q = m * p_limbs
        t = t + padz(q & MASK, 0, nw - n) + padz(q >> 16, 1, nw - n - 1)
        c0 = t[0:1, :] >> 16                  # column 0 is 0 mod 2^16 now
        t = pltpu.roll(t, nw - 1, axis=0)     # drop column 0
        t = jnp.concatenate(
            [t[0:1] + c0, t[1 : nw - 1], jnp.zeros((1, tb), jnp.uint32)],
            axis=0,
        )
        a_rot = pltpu.roll(a_rot, n - 1, axis=0)
        return (t, a_rot)

    t, _ = jax.lax.fori_loop(0, n, body, (t0, a), unroll=False)
    rows = _ks_carry_rows(t[0:n], n)
    return _cond_sub_rows(rows, p_limbs, n)


def _conv_reduce_v3(a, b, p_limbs, n, tb, n0):
    """Merged CIOS with a two-accumulator window (v3).

    Same algorithm as _conv_reduce, restructured so every accumulation is
    ALIGNED: the lo parts of a_i*b and q*p land on Lr (row k = column i+k)
    directly, the hi parts collect in a per-step H (row k = column i+k+1),
    and the window advance merges H + the column-i carry in one shot.  This
    removes the per-step zero-pad concats and shrinks the window from
    nw = n+8 padded rows to exactly n, cutting full-width VPU ops per limb
    step from ~19x(n+8 rows) to ~13x(n rows).  Bit-exact same contract as
    _conv_reduce: canonical (n, tb) inputs < 2m, canonical output < m."""
    from jax.experimental.pallas import tpu as pltpu

    zero1 = jnp.zeros((1, tb), jnp.uint32)
    zt = jnp.zeros((n - 1, tb), jnp.uint32)

    def body(i, carry):
        Lr, a_rot = carry
        ai = a_rot[0:1, :]
        prod = ai * b
        Lr = Lr + (prod & MASK)
        t0 = Lr[0:1, :]
        m = (t0 * n0) & MASK
        q = m * p_limbs
        Lr = Lr + (q & MASK)
        c0 = Lr[0:1, :] >> 16            # column i is 0 mod 2^16 now
        H = (prod >> 16) + (q >> 16)     # row k -> column i+k+1
        Lr = (
            jnp.concatenate([Lr[1:], zero1], axis=0)
            + H
            + jnp.concatenate([c0, zt], axis=0)
        )
        a_rot = pltpu.roll(a_rot, n - 1, axis=0)
        return (Lr, a_rot)

    # Lazy bound: Lr rows accumulate <= 2 lo-terms (< 2^16) + 2 hi-terms
    # (< 2^16) per step across n steps plus carries; every row stays far
    # below 2^32 because each column is live for only n steps of < 2^18
    # increments (same bound argument as _conv_reduce's nw window).
    Lr0 = jnp.zeros((n, tb), jnp.uint32)
    Lr, _ = jax.lax.fori_loop(0, n, body, (Lr0, a), unroll=False)
    rows = _ks_carry_rows(Lr, n)
    return _cond_sub_rows(rows, p_limbs, n)


# ----------------------------------------------------------------------------
# kernels
# ----------------------------------------------------------------------------

def _make_mont(p_ref, *, n, tb, n0, variant):
    """Montgomery-product closure over (n, tb) rows for the kernel bodies.
    `variant` selects the merged-CIOS form: "cios3" = two-accumulator
    (_conv_reduce_v3, the promoted default), anything else = the original
    padded-window loop (_conv_reduce, kept as the conservative fallback)."""
    p_limbs = p_ref[:]
    if variant == "cios3":
        return p_limbs, lambda a, b: _conv_reduce_v3(a, b, p_limbs, n, tb, n0)
    return p_limbs, lambda a, b: _conv_reduce(a, b, p_limbs, n, tb, n0)


def _mul_kernel(a_ref, b_ref, p_ref, o_ref, *, n, tb, n0, variant):
    a = jnp.transpose(a_ref[:], (1, 0))  # (n, TB)
    b = jnp.transpose(b_ref[:], (1, 0))
    _, mont = _make_mont(p_ref, n=n, tb=tb, n0=n0, variant=variant)
    o_ref[:] = jnp.transpose(mont(a, b), (1, 0))


def _add_kernel(a_ref, b_ref, p_ref, o_ref, *, n, tb):
    a = jnp.transpose(a_ref[:], (1, 0))
    b = jnp.transpose(b_ref[:], (1, 0))
    out = _add_rows(a, b, p_ref[:], n, tb)
    o_ref[:] = jnp.transpose(out, (1, 0))


def _sub_kernel(a_ref, b_ref, p_ref, o_ref, *, n, tb):
    a = jnp.transpose(a_ref[:], (1, 0))
    b = jnp.transpose(b_ref[:], (1, 0))
    out = _sub_rows(a, b, p_ref[:], n, tb)
    o_ref[:] = jnp.transpose(out, (1, 0))


def _fp2_mul_rows(a0, a1, b0, b1, p_limbs, mont, n, tb):
    """Karatsuba Fp2 product on transposed (n, TB) rows -> (c0, c1).
    Operand sums (< 2m) feed the Montgomery product, whose bound covers
    them."""
    asum = _propagate_rows(a0 + a1, n, tb)
    bsum = _propagate_rows(b0 + b1, n, tb)
    v0 = mont(a0, b0)
    v1 = mont(a1, b1)
    v2 = mont(asum, bsum)
    c0 = _sub_rows(v0, v1, p_limbs, n, tb)
    c1 = _sub_rows(_sub_rows(v2, v0, p_limbs, n, tb), v1, p_limbs, n, tb)
    return c0, c1


def _fp2mul_kernel(a0_ref, a1_ref, b0_ref, b1_ref, p_ref,
                   c0_ref, c1_ref, *, n, tb, n0, variant):
    """Fused Karatsuba Fp2 multiply: 3 Montgomery products + combination in
    ONE kernel launch."""
    a0 = jnp.transpose(a0_ref[:], (1, 0))
    a1 = jnp.transpose(a1_ref[:], (1, 0))
    b0 = jnp.transpose(b0_ref[:], (1, 0))
    b1 = jnp.transpose(b1_ref[:], (1, 0))
    p_limbs, mont = _make_mont(p_ref, n=n, tb=tb, n0=n0, variant=variant)
    c0, c1 = _fp2_mul_rows(a0, a1, b0, b1, p_limbs, mont, n, tb)
    c0_ref[:] = jnp.transpose(c0, (1, 0))
    c1_ref[:] = jnp.transpose(c1, (1, 0))


def _fp2sqr_kernel(a0_ref, a1_ref, p_ref, c0_ref, c1_ref,
                   *, n, tb, n0, variant):
    """Fused Fp2 square: (a0+a1)(a0-a1) and 2 a0 a1 in ONE launch."""
    a0 = jnp.transpose(a0_ref[:], (1, 0))
    a1 = jnp.transpose(a1_ref[:], (1, 0))
    p_limbs, mont = _make_mont(p_ref, n=n, tb=tb, n0=n0, variant=variant)
    s = _propagate_rows(a0 + a1, n, tb)          # < 2m, limbs canonical
    d = _sub_rows(a0, a1, p_limbs, n, tb)        # canonical
    re = mont(s, d)
    m = mont(a0, a1)
    im = _add_rows(m, m, p_limbs, n, tb)
    c0_ref[:] = jnp.transpose(re, (1, 0))
    c1_ref[:] = jnp.transpose(im, (1, 0))


def _fp6mul_kernel(*refs, n, tb, n0, variant):
    """Fused Fp6 product: 6 Fp2 Karatsuba products (18 Montgomery muls) +
    the Toom combination, ONE launch.

    refs: a00,a01,a10,a11,a20,a21, b00,b01,b10,b11,b20,b21, p,
          c00,c01,c10,c11,c20,c21
    (aIJ = Fp6 coefficient I, Fp2 coordinate J)."""
    ins = refs[:12]
    outs = refs[13:19]
    A = [jnp.transpose(r[:], (1, 0)) for r in ins[:6]]
    B = [jnp.transpose(r[:], (1, 0)) for r in ins[6:12]]
    p_limbs, mont = _make_mont(refs[12], n=n, tb=tb, n0=n0, variant=variant)

    def f2mul(ai, bi):
        return _fp2_mul_rows(
            A[2 * ai], A[2 * ai + 1], B[2 * bi], B[2 * bi + 1],
            p_limbs, mont, n, tb,
        )

    def f2mul_sum(ai, aj, bi, bj):
        # (a_i + a_j) * (b_i + b_j) with lazy sums normalised first
        s0 = _propagate_rows(A[2 * ai] + A[2 * aj], n, tb)
        s1 = _propagate_rows(A[2 * ai + 1] + A[2 * aj + 1], n, tb)
        u0 = _propagate_rows(B[2 * bi] + B[2 * bj], n, tb)
        u1 = _propagate_rows(B[2 * bi + 1] + B[2 * bj + 1], n, tb)
        return _fp2_mul_rows(s0, s1, u0, u1, p_limbs, mont, n, tb)

    def add2(x, y):
        return (_add_rows(x[0], y[0], p_limbs, n, tb), _add_rows(x[1], y[1], p_limbs, n, tb))

    def sub2(x, y):
        return (_sub_rows(x[0], y[0], p_limbs, n, tb), _sub_rows(x[1], y[1], p_limbs, n, tb))

    def xi2(x):
        return (_sub_rows(x[0], x[1], p_limbs, n, tb), _add_rows(x[0], x[1], p_limbs, n, tb))

    v0 = f2mul(0, 0)
    v1 = f2mul(1, 1)
    v2 = f2mul(2, 2)
    t12 = f2mul_sum(1, 2, 1, 2)
    t01 = f2mul_sum(0, 1, 0, 1)
    t02 = f2mul_sum(0, 2, 0, 2)
    c0 = add2(v0, xi2(sub2(t12, add2(v1, v2))))
    c1 = add2(sub2(t01, add2(v0, v1)), xi2(v2))
    c2 = add2(sub2(t02, add2(v0, v2)), v1)
    for out_ref, rows in zip(outs, [c0[0], c0[1], c1[0], c1[1], c2[0], c2[1]]):
        out_ref[:] = jnp.transpose(rows, (1, 0))


def _half_rows(a, p_limbs, n, tb):
    """a/2 mod p on canonical (n, tb) rows: add p when odd, then shift the
    384-bit value right one bit across limb rows (row i gets row i+1's low
    bit as its bit 15).  Mirrors ops/pairing.fp_half."""
    odd = a[0:1, :] & 1
    s = _ks_carry_rows(a + odd * p_limbs, n)
    up = jnp.concatenate([s[1:], jnp.zeros((1, tb), jnp.uint32)], axis=0)
    return (s >> 1) | ((up << 15) & jnp.uint32(0x8000))


class _F2Rows:
    """Fp2 arithmetic on transposed (n, tb) limb rows inside a kernel body.
    Elements are (c0, c1) row pairs, canonical [0, m); every op returns
    canonical rows, so bodies compose exactly like the stacked jnp tower
    ops they replace."""

    def __init__(self, p_limbs, mont, n, tb):
        self.p, self.mont, self.n, self.tb = p_limbs, mont, n, tb

    def add(self, a, b):
        return (
            _add_rows(a[0], b[0], self.p, self.n, self.tb),
            _add_rows(a[1], b[1], self.p, self.n, self.tb),
        )

    def sub(self, a, b):
        return (
            _sub_rows(a[0], b[0], self.p, self.n, self.tb),
            _sub_rows(a[1], b[1], self.p, self.n, self.tb),
        )

    def neg(self, a):
        z = jnp.zeros_like(a[0])
        return (
            _sub_rows(z, a[0], self.p, self.n, self.tb),
            _sub_rows(z, a[1], self.p, self.n, self.tb),
        )

    def mul(self, a, b):
        return _fp2_mul_rows(
            a[0], a[1], b[0], b[1], self.p, self.mont, self.n, self.tb
        )

    def sqr(self, a):
        a0, a1 = a
        s = _propagate_rows(a0 + a1, self.n, self.tb)
        d = _sub_rows(a0, a1, self.p, self.n, self.tb)
        re = self.mont(s, d)
        m = self.mont(a0, a1)
        return (re, _add_rows(m, m, self.p, self.n, self.tb))

    def xi(self, a):  # * (1 + u)
        return (
            _sub_rows(a[0], a[1], self.p, self.n, self.tb),
            _add_rows(a[0], a[1], self.p, self.n, self.tb),
        )

    def conj(self, a):  # a0 - a1 u
        z = jnp.zeros_like(a[1])
        return (a[0], _sub_rows(z, a[1], self.p, self.n, self.tb))

    def muli(self, a):  # * u (sqrt(-1)): (a0 + a1 u) u = -a1 + a0 u
        z = jnp.zeros_like(a[1])
        return (_sub_rows(z, a[1], self.p, self.n, self.tb), a[0])

    def eq(self, a, b):  # -> (1, tb) bool; canonical-limb equality
        d = (a[0] ^ b[0]) | (a[1] ^ b[1])
        return jnp.sum(d.astype(jnp.int32), axis=0, keepdims=True) == 0

    def muls(self, a, s):  # * Fp scalar (s canonical rows)
        return (self.mont(a[0], s), self.mont(a[1], s))

    def half(self, a):
        return (
            _half_rows(a[0], self.p, self.n, self.tb),
            _half_rows(a[1], self.p, self.n, self.tb),
        )

    def is_zero(self, a):  # -> (1, tb) bool (canonical zero test)
        # int32 reduction: Mosaic has no unsigned-reduce lowering, and the
        # sum of 48 canonical 16-bit limbs is exact in int32.
        s = jnp.sum(a[0].astype(jnp.int32), axis=0, keepdims=True) + jnp.sum(
            a[1].astype(jnp.int32), axis=0, keepdims=True
        )
        return s == 0

    def cmov(self, m, a, b):  # m: (1, tb) bool; a where m else b
        return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]))


class _F1Rows:
    """Fp arithmetic on transposed (n, tb) limb rows inside a kernel body
    (the scalar-coordinate sibling of _F2Rows, for G1 point kernels).
    Elements are single row arrays, canonical [0, m)."""

    def __init__(self, p_limbs, mont, n, tb):
        self.p, self.mont, self.n, self.tb = p_limbs, mont, n, tb

    def add(self, a, b):
        return _add_rows(a, b, self.p, self.n, self.tb)

    def sub(self, a, b):
        return _sub_rows(a, b, self.p, self.n, self.tb)

    def neg(self, a):
        return _sub_rows(jnp.zeros_like(a), a, self.p, self.n, self.tb)

    def mul(self, a, b):
        return self.mont(a, b)

    def sqr(self, a):
        return self.mont(a, a)

    def is_zero(self, a):
        # int32: Mosaic cannot lower unsigned reductions (sum of 24
        # canonical 16-bit limbs is exact in int32)
        return jnp.sum(a.astype(jnp.int32), axis=0, keepdims=True) == 0

    def cmov(self, m, a, b):
        return jnp.where(m, a, b)


# Fp6/Fp12 bodies over _F2Rows elements (tuples of f2 pairs). These mirror
# ops/tower.py's stacked formulas term for term so the fused kernels remain
# bit-exact drop-ins for the jnp paths they replace.

def _f6_add(f2, a, b):
    return tuple(f2.add(x, y) for x, y in zip(a, b))


def _f6_sub(f2, a, b):
    return tuple(f2.sub(x, y) for x, y in zip(a, b))


def _f6_mul_v_rows(f2, a):  # * v (cyclic shift with xi)
    return (f2.xi(a[2]), a[0], a[1])


def _f6_mul(f2, a, b):
    """Toom/Karatsuba Fp6 product (6 Fp2 muls), as in tower.fp6_mul_pairs."""
    v0 = f2.mul(a[0], b[0])
    v1 = f2.mul(a[1], b[1])
    v2 = f2.mul(a[2], b[2])
    t12 = f2.mul(f2.add(a[1], a[2]), f2.add(b[1], b[2]))
    t01 = f2.mul(f2.add(a[0], a[1]), f2.add(b[0], b[1]))
    t02 = f2.mul(f2.add(a[0], a[2]), f2.add(b[0], b[2]))
    c0 = f2.add(v0, f2.xi(f2.sub(t12, f2.add(v1, v2))))
    c1 = f2.add(f2.sub(t01, f2.add(v0, v1)), f2.xi(v2))
    c2 = f2.add(f2.sub(t02, f2.add(v0, v2)), v1)
    return (c0, c1, c2)


def _f12_mul(f2, a, b):
    """Karatsuba over Fp6 (tower.fp12_mul)."""
    a0, a1 = a
    b0, b1 = b
    asum = _f6_add(f2, a0, a1)
    bsum = _f6_add(f2, b0, b1)
    v0 = _f6_mul(f2, a0, b0)
    v1 = _f6_mul(f2, a1, b1)
    v2 = _f6_mul(f2, asum, bsum)
    c0 = _f6_add(f2, v0, _f6_mul_v_rows(f2, v1))
    c1 = _f6_sub(f2, v2, _f6_add(f2, v0, v1))
    return (c0, c1)


def _f12_sqr(f2, a):
    """tower.fp12_sqr: 2 Fp6 products."""
    a0, a1 = a
    s = _f6_add(f2, a0, a1)
    t_in = _f6_add(f2, a0, _f6_mul_v_rows(f2, a1))
    v0 = _f6_mul(f2, a0, a1)
    t = _f6_mul(f2, s, t_in)
    c0 = _f6_sub(f2, _f6_sub(f2, t, v0), _f6_mul_v_rows(f2, v0))
    c1 = _f6_add(f2, v0, v0)
    return (c0, c1)


def _f6_mul_by_01(f2, a, d0, d1):
    p0 = f2.mul(a[0], d0)
    p1 = f2.mul(a[2], d1)
    p2 = f2.mul(a[0], d1)
    p3 = f2.mul(a[1], d0)
    p4 = f2.mul(a[1], d1)
    p5 = f2.mul(a[2], d0)
    return (f2.add(p0, f2.xi(p1)), f2.add(p2, p3), f2.add(p4, p5))


def _f6_mul_by_1(f2, a, d1):
    p0 = f2.mul(a[2], d1)
    p1 = f2.mul(a[0], d1)
    p2 = f2.mul(a[1], d1)
    return (f2.xi(p0), p1, p2)


def _f12_mul_014(f2, f, c0, c1, c4):
    """pairing.fp12_mul_by_014: sparse line multiply (15 Fp2 muls)."""
    a, b = f
    v0 = _f6_mul_by_01(f2, a, c0, c1)
    v1 = _f6_mul_by_1(f2, b, c4)
    c1c4 = f2.add(c1, c4)
    t = _f6_mul_by_01(f2, _f6_add(f2, a, b), c0, c1c4)
    out0 = _f6_add(f2, v0, _f6_mul_v_rows(f2, v1))
    out1 = _f6_sub(f2, t, _f6_add(f2, v0, v1))
    return (out0, out1)


def _load_rows(refs):
    return [jnp.transpose(r[:], (1, 0)) for r in refs]


def _mat_rows(x):
    """Force a lane-materialized vector layout on a broadcast constant.

    A (n, 1) -> (n, tb) broadcast_to keeps a lane-REPLICATED Mosaic layout,
    and elementwise ops propagate it; when such a value later meets a
    sublane concat/slice (Karatsuba's _propagate_rows, the CIOS sliding
    window), ApplyVectorLayoutPass aborts the remote compile helper with
    `Check failed: limits[i] <= dim(i)` (probed on v5e; bare mont with a
    replicated SECOND operand is fine, f2.mul is not).  OR-ing with a
    masked lane iota is numerically a no-op (iota < 2^31, mask 2^31) but
    its lane-varying operand forces the laned layout."""
    lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 1)
    return x | (lane & jnp.uint32(0x80000000))


def _store_rows(refs, rows):
    for r, x in zip(refs, rows):
        r[:] = jnp.transpose(x, (1, 0))


def _group_f2(rows):
    return [(rows[2 * i], rows[2 * i + 1]) for i in range(len(rows) // 2)]


def _group_f12(rows):
    f = _group_f2(rows)
    return ((f[0], f[1], f[2]), (f[3], f[4], f[5]))


def _flat_f12(f):
    return [c for f6 in f for f2c in f6 for c in f2c]


def _fp12mul_kernel(*refs, n, tb, n0, variant):
    """Fused full Fp12 product (Karatsuba over Fp6: 18 Fp2 muls = 54
    Montgomery muls) + every combination add, ONE launch.  refs: 12 a
    coords + 12 b coords (coefficient-major c0.c0.r .. c1.c2.i), p, 12 outputs."""
    ins, outs = refs[:24], refs[25:37]
    p_limbs, mont = _make_mont(refs[24], n=n, tb=tb, n0=n0, variant=variant)
    f2 = _F2Rows(p_limbs, mont, n, tb)
    rows = _load_rows(ins)
    out = _f12_mul(f2, _group_f12(rows[:12]), _group_f12(rows[12:]))
    _store_rows(outs, _flat_f12(out))


def _fp12sqr_kernel(*refs, n, tb, n0, variant):
    """Fused generic Fp12 square (2 Fp6 products = 36 Montgomery muls),
    ONE launch.  refs: 12 coords, p, 12 outputs."""
    ins, outs = refs[:12], refs[13:25]
    p_limbs, mont = _make_mont(refs[12], n=n, tb=tb, n0=n0, variant=variant)
    f2 = _F2Rows(p_limbs, mont, n, tb)
    out = _f12_sqr(f2, _group_f12(_load_rows(ins)))
    _store_rows(outs, _flat_f12(out))


def _mul014_kernel(*refs, n, tb, n0, variant):
    """Fused sparse Fp12 x line multiply (pairing.fp12_mul_by_014, 15 Fp2
    muls), ONE launch.  refs: 12 f coords + c0 (2) + c1 (2) + c4 (2), p,
    12 outputs."""
    ins, outs = refs[:18], refs[19:31]
    p_limbs, mont = _make_mont(refs[18], n=n, tb=tb, n0=n0, variant=variant)
    f2 = _F2Rows(p_limbs, mont, n, tb)
    rows = _load_rows(ins)
    f = _group_f12(rows[:12])
    c0, c1, c4 = _group_f2(rows[12:18])
    out = _f12_mul_014(f2, f, c0, c1, c4)
    _store_rows(outs, _flat_f12(out))


def _miller_dbl_rows(f2, X, Y, Z, xp, yp):
    """CLN doubling step (pairing._dbl_step) on row elements:
    -> ((X', Y', Z'), (i_, c1l, c4l)).  The twist coefficient b' = 4(1+u),
    so e = b'*(3Z^2) is computed multiplication-free as 4*xi(3Z^2)."""
    a_ = f2.half(f2.mul(X, Y))
    b_ = f2.sqr(Y)
    c_ = f2.sqr(Z)
    c3 = f2.add(f2.add(c_, c_), c_)
    e_ = f2.xi(c3)
    e_ = f2.add(e_, e_)
    e_ = f2.add(e_, e_)
    f_ = f2.add(f2.add(e_, e_), e_)
    g_ = f2.half(f2.add(b_, f_))
    h_ = f2.sub(f2.sqr(f2.add(Y, Z)), f2.add(b_, c_))
    i_ = f2.sub(e_, b_)
    j_ = f2.sqr(X)
    e2 = f2.sqr(e_)
    x3 = f2.mul(a_, f2.sub(b_, f_))
    z3 = f2.mul(b_, h_)
    y3 = f2.sub(f2.sqr(g_), f2.add(f2.add(e2, e2), e2))
    j3 = f2.add(f2.add(j_, j_), j_)
    c1l = f2.muls(j3, xp)
    c4l = f2.muls(f2.neg(h_), yp)
    return (x3, y3, z3), (i_, c1l, c4l)


def _dblstep_kernel(*refs, n, tb, n0, variant):
    """Fused Miller doubling step (pairing._dbl_step: CLN homogeneous
    projective, M-twist): the full T update + line coefficients in ONE
    launch.  refs: X (2), Y (2), Z (2), xp, yp (Fp rows), p, then
    outputs X' Y' Z' (6) + line i_, c1l, c4l (6)."""
    ins, outs = refs[:8], refs[9:21]
    p_limbs, mont = _make_mont(refs[8], n=n, tb=tb, n0=n0, variant=variant)
    f2 = _F2Rows(p_limbs, mont, n, tb)
    rows = _load_rows(ins)
    X, Y, Z = _group_f2(rows[:6])
    xp, yp = rows[6], rows[7]
    (x3, y3, z3), (i_, c1l, c4l) = _miller_dbl_rows(f2, X, Y, Z, xp, yp)
    _store_rows(outs, [x3[0], x3[1], y3[0], y3[1], z3[0], z3[1],
                       i_[0], i_[1], c1l[0], c1l[1], c4l[0], c4l[1]])


def _miller_add_rows(f2, X, Y, Z, xq, yq, xp, yp):
    """CLN mixed-addition step (pairing._add_step) on row elements:
    -> ((X', Y', Z'), (c0l, c1l, c4l))."""
    yqz = f2.mul(yq, Z)
    xqz = f2.mul(xq, Z)
    th = f2.sub(Y, yqz)
    lm = f2.sub(X, xqz)
    cc = f2.sqr(th)
    dd = f2.sqr(lm)
    e_ = f2.mul(lm, dd)
    f_ = f2.mul(Z, cc)
    g_ = f2.mul(X, dd)
    h_ = f2.sub(f2.add(e_, f_), f2.add(g_, g_))
    x3 = f2.mul(lm, h_)
    z3 = f2.mul(Z, e_)
    t1 = f2.mul(th, f2.sub(g_, h_))
    t2 = f2.mul(e_, Y)
    y3 = f2.sub(t1, t2)
    p1 = f2.mul(th, xq)
    p2 = f2.mul(lm, yq)
    c0l = f2.sub(p1, p2)
    c1l = f2.muls(f2.neg(th), xp)
    c4l = f2.muls(lm, yp)
    return (x3, y3, z3), (c0l, c1l, c4l)


def _addstep_kernel(*refs, n, tb, n0, variant):
    """Fused Miller mixed-addition step (pairing._add_step) in ONE launch.
    refs: X (2), Y (2), Z (2), xq (2), yq (2), xp, yp, p, then
    outputs X' Y' Z' (6) + line c0l, c1l, c4l (6)."""
    ins, outs = refs[:12], refs[13:25]
    p_limbs, mont = _make_mont(refs[12], n=n, tb=tb, n0=n0, variant=variant)
    f2 = _F2Rows(p_limbs, mont, n, tb)
    rows = _load_rows(ins)
    X, Y, Z, xq, yq = _group_f2(rows[:10])
    xp, yp = rows[10], rows[11]
    (x3, y3, z3), (c0l, c1l, c4l) = _miller_add_rows(f2, X, Y, Z, xq, yq, xp, yp)
    _store_rows(outs, [x3[0], x3[1], y3[0], y3[1], z3[0], z3[1],
                       c0l[0], c0l[1], c1l[0], c1l[1], c4l[0], c4l[1]])


def _pt_dbl_body(F, x, y, z):
    """Complete Jacobian doubling for a = 0 curves on row elements —
    mirrors curve.pt_double term for term (canonical [0, m) everywhere, so
    sqr-vs-mul differences cannot change bits)."""
    a_ = F.sqr(x)
    b_ = F.sqr(y)
    c_ = F.sqr(z)
    d_ = F.sqr(b_)
    t = F.sqr(F.add(x, b_))
    s = F.sub(F.sub(t, a_), d_)
    s = F.add(s, s)
    m = F.add(F.add(a_, a_), a_)
    x3 = F.sub(F.sqr(m), F.add(s, s))
    d8 = F.add(d_, d_)
    d8 = F.add(d8, d8)
    d8 = F.add(d8, d8)
    y3 = F.sub(F.mul(m, F.sub(s, x3)), d8)
    z3 = F.sub(F.sub(F.sqr(F.add(y, z)), b_), c_)
    return (x3, y3, z3)


def _pt_add_body(F, p, q, inf):
    """Complete Jacobian addition on row elements — mirrors curve.pt_add
    including the doubling / infinity / inverse cmov resolution order."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1z1 = F.sqr(z1)
    z2z2 = F.sqr(z2)
    u1 = F.mul(x1, z2z2)
    u2 = F.mul(x2, z1z1)
    t1 = F.mul(y1, z2z2)
    t2 = F.mul(y2, z1z1)
    s1 = F.mul(t1, z2)
    s2 = F.mul(t2, z1)
    h = F.sub(u2, u1)
    r = F.sub(s2, s1)
    hh = F.sqr(h)
    hhh = F.mul(h, hh)
    v = F.mul(u1, hh)
    rr = F.sqr(r)
    x3 = F.sub(F.sub(rr, hhh), F.add(v, v))
    y3 = F.sub(F.mul(r, F.sub(v, x3)), F.mul(s1, hhh))
    z3 = F.mul(F.mul(z1, z2), h)
    res = (x3, y3, z3)
    h0 = F.is_zero(h)
    r0 = F.is_zero(r)
    dbl = _pt_dbl_body(F, x1, y1, z1)
    res = tuple(F.cmov(h0 & r0, a, b) for a, b in zip(dbl, res))
    res = tuple(F.cmov(h0 & (~r0), a, b) for a, b in zip(inf, res))
    p_inf = F.is_zero(z1)
    q_inf = F.is_zero(z2)
    res = tuple(F.cmov(p_inf, a, b) for a, b in zip(q, res))
    res = tuple(F.cmov(q_inf & (~p_inf), a, b) for a, b in zip(p, res))
    return res


def _rows_to_elems(F, rows, coord):
    if coord == "fp2":
        return _group_f2(rows)
    return rows


def _elems_to_rows(elems, coord):
    if coord == "fp2":
        return [c for e in elems for c in e]
    return list(elems)


def _ptdbl_kernel(cnt_ref, *refs, n, tb, n0, variant, coord):
    """Fused Jacobian point doubling (curve.pt_double), ONE launch.
    coord 'fp' (G1): refs = X, Y, Z, p, 3 outputs.
    coord 'fp2' (G2): refs = X (2), Y (2), Z (2), p, 6 outputs.
    The doubling iterates cnt times in-kernel (fori_loop over the SMEM
    run-length scalar, so every ladder run shares one Mosaic payload) — a
    doubling run costs one launch + one HBM round-trip total."""
    nc = 2 if coord == "fp2" else 1
    nin = 3 * nc
    ins, outs = refs[:nin], refs[nin + 1:]
    p_limbs, mont = _make_mont(refs[nin], n=n, tb=tb, n0=n0, variant=variant)
    F = (_F2Rows if coord == "fp2" else _F1Rows)(p_limbs, mont, n, tb)
    elems = _rows_to_elems(F, _load_rows(ins), coord)

    def body(_, flat):
        o = _pt_dbl_body(F, *_rows_to_elems(F, list(flat), coord))
        return tuple(_elems_to_rows(o, coord))

    flat = jax.lax.fori_loop(
        0, cnt_ref[0], body, tuple(_elems_to_rows(elems, coord))
    )
    _store_rows(outs, list(flat))


def _ptadd_kernel(*refs, n, tb, n0, variant, coord):
    """Fused complete Jacobian addition (curve.pt_add) with all cmov edge
    cases resolved in-kernel, ONE launch.
    coord 'fp': refs = P (3), Q (3), p, one-col, 3 outputs.
    coord 'fp2': refs = P (6), Q (6), p, one-col, 6 outputs."""
    nc = 2 if coord == "fp2" else 1
    nin = 6 * nc
    ins, outs = refs[:nin], refs[nin + 2:]
    p_limbs, mont = _make_mont(refs[nin], n=n, tb=tb, n0=n0, variant=variant)
    one_rows = jnp.broadcast_to(refs[nin + 1][:], (n, tb))
    zero_rows = jnp.zeros((n, tb), jnp.uint32)
    F = (_F2Rows if coord == "fp2" else _F1Rows)(p_limbs, mont, n, tb)
    rows = _load_rows(ins)
    elems = _rows_to_elems(F, rows, coord)
    p_pt, q_pt = tuple(elems[:3]), tuple(elems[3:])
    if coord == "fp2":
        one = (one_rows, zero_rows)
        zero = (zero_rows, zero_rows)
    else:
        one, zero = one_rows, zero_rows
    out = _pt_add_body(F, p_pt, q_pt, (one, one, zero))
    _store_rows(outs, _elems_to_rows(out, coord))


def _ptmulconst_kernel(seg_ref, *refs, n, tb, n0, variant, coord, nseg):
    """Fused constant-scalar point multiplication — the ENTIRE static
    double-and-add ladder in ONE launch.  Starting from acc = P (top set
    bit), for each MSB-first segment s < nseg:

        acc = [2^len_s] acc     (pt_dbl_body, len_s from SMEM)
        acc = acc + P           iff flag_s (segment ends on a set bit),
                                complete addition, applied via cmov

    seg_ref: (2, nseg) SMEM int32 [lens; flags] — every scalar with the
    same segment count shares one Mosaic payload.

    coord 'fp': refs = P (3), p, one_col, 3 outputs.
    coord 'fp2': refs = P (6), p, one_col, 6 outputs."""
    nc = 2 if coord == "fp2" else 1
    nin = 3 * nc
    ins, outs = refs[:nin], refs[nin + 2:]
    p_limbs, mont = _make_mont(refs[nin], n=n, tb=tb, n0=n0, variant=variant)
    one_rows = jnp.broadcast_to(refs[nin + 1][:], (n, tb))
    zero_rows = jnp.zeros((n, tb), jnp.uint32)
    F = (_F2Rows if coord == "fp2" else _F1Rows)(p_limbs, mont, n, tb)
    base_rows = _load_rows(ins)
    base = _rows_to_elems(F, base_rows, coord)
    if coord == "fp2":
        inf = ((one_rows, zero_rows), (one_rows, zero_rows),
               (zero_rows, zero_rows))
    else:
        inf = (one_rows, one_rows, zero_rows)

    def seg_body(s, flat):
        def dbl(_, fl):
            o = _pt_dbl_body(F, *_rows_to_elems(F, list(fl), coord))
            return tuple(_elems_to_rows(o, coord))

        flat = jax.lax.fori_loop(0, seg_ref[0, s], dbl, flat)
        acc = _rows_to_elems(F, list(flat), coord)
        added = _pt_add_body(F, tuple(acc), tuple(base), inf)
        do_add = seg_ref[1, s] > 0
        return tuple(
            jnp.where(do_add, a, b)
            for a, b in zip(_elems_to_rows(added, coord), flat)
        )

    flat = jax.lax.fori_loop(0, nseg, seg_body, tuple(base_rows))
    _store_rows(outs, list(flat))


def _powwin_kernel(dig_ref, *refs, n, tb, n0, variant, nc, nwin):
    """Fused windowed pow — a^exp for a host-constant exponent, the ENTIRE
    chain in ONE launch: the 16-entry window table is built in-kernel
    (14 multiplies), then nwin MSB-first 4-bit windows each do 4 squarings
    + one multiply by the 16-way-cmov-selected entry.  Digits ride in SMEM
    (dig_ref, (nwin,) int32, zero-padded at the FRONT — leading zero
    windows keep f == 1 exactly), so every exponent of a given width
    shares one Mosaic payload.

    nc=1 (Fp): refs = a, p, one_col, 1 output.
    nc=2 (Fp2): refs = a0, a1, p, one_col, 2 outputs."""
    ins, outs = refs[:nc], refs[nc + 2:]
    p_limbs, mont = _make_mont(refs[nc], n=n, tb=tb, n0=n0, variant=variant)
    one_rows = jnp.broadcast_to(refs[nc + 1][:], (n, tb))
    zero_rows = jnp.zeros((n, tb), jnp.uint32)
    rows = _load_rows(ins)
    if nc == 2:
        F = _F2Rows(p_limbs, mont, n, tb)
        a = (rows[0], rows[1])
        one = (one_rows, zero_rows)
        flat = lambda e: list(e)
    else:
        F = _F1Rows(p_limbs, mont, n, tb)
        a = rows[0]
        one = one_rows
        flat = lambda e: [e]
    tab = [one, a]
    for _ in range(14):
        tab.append(F.mul(tab[-1], a))

    def body(w, fl):
        f = (fl[0], fl[1]) if nc == 2 else fl[0]
        for _ in range(4):
            f = F.sqr(f)
        d = dig_ref[w]
        sel = tab[0]
        for t in range(1, 16):
            m = (d == t)
            if nc == 2:
                sel = (jnp.where(m, tab[t][0], sel[0]),
                       jnp.where(m, tab[t][1], sel[1]))
            else:
                sel = jnp.where(m, tab[t], sel)
        f = F.mul(f, sel)
        return tuple(flat(f))

    out = jax.lax.fori_loop(0, nwin, body, tuple(flat(one)))
    _store_rows(outs, list(out))


def _pow_win_rows(F, a, dig_ref, dig_row, nwin, one):
    """Shared in-kernel windowed pow on row elements: 16-entry table build
    (14 multiplies) + nwin MSB-first 4-bit windows of 4 squarings + one
    16-way-cmov table multiply.  `dig_ref` is a 2-D SMEM int32 ref indexed
    [dig_row, w]; digits are zero-padded at the FRONT (leading zero windows
    keep f == one exactly).  Element shape follows `a` (works at any lane
    width, including the lane-concatenated two-map SSWU chain)."""
    is_f2 = isinstance(a, tuple)
    flat = (lambda e: list(e)) if is_f2 else (lambda e: [e])
    n_r, w_l = flat(a)[0].shape
    # The 14 table multiplies are ROLLED into a fori_loop over a stacked
    # (16 n, w) table per component (Mosaic payload control: unrolled they
    # inlined 14 mont-mul bodies per instance, the largest single
    # contributor to the fused-SSWU kernel payload).  Pallas TPU has no
    # dynamic_update_slice lowering, so the running power rides in the
    # carry and lands in its row block via an iota-mask blend.
    zero_pad = jnp.zeros((14 * n_r, w_l), jnp.uint32)
    tabs = [
        jnp.concatenate([oc, ac, zero_pad], axis=0)
        for oc, ac in zip(flat(one), flat(a))
    ]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (16 * n_r, w_l), 0)

    def build(t, carry):
        ncomp = len(tabs)
        tbs, curc = carry[:ncomp], carry[ncomp:]
        cur = F.mul((curc[0], curc[1]) if is_f2 else curc[0], a)
        curf = flat(cur)
        mask = (row_ids >= t * n_r) & (row_ids < (t + 1) * n_r)
        tbs2 = [
            jnp.where(mask, jnp.tile(cc, (16, 1)), tb_)
            for tb_, cc in zip(tbs, curf)
        ]
        return tuple(tbs2) + tuple(curf)

    tabs = list(
        jax.lax.fori_loop(2, 16, build, tuple(tabs) + tuple(flat(a)))
    )[: len(tabs)]

    def body(w, fl):
        f = (fl[0], fl[1]) if is_f2 else fl[0]
        for _ in range(4):
            f = F.sqr(f)
        d = dig_ref[dig_row, w]
        selc = [tb_[0:n_r] for tb_ in tabs]
        for t in range(1, 16):
            m = (d == t)
            selc = [
                jnp.where(m, tb_[t * n_r : (t + 1) * n_r], s)
                for tb_, s in zip(tabs, selc)
            ]
        f = F.mul(f, (selc[0], selc[1]) if is_f2 else selc[0])
        return tuple(flat(f))

    out = jax.lax.fori_loop(0, nwin, body, tuple(flat(one)))
    return (out[0], out[1]) if is_f2 else out[0]


def _cand_select_rows(f2, z, X, R, sqi, sqmi, target_num, zero2):
    """Fraction-form sqrt candidate resolution (the in-kernel twin of
    hash_to_g2._sqrt_from_candidate): candidates y = z*c for c in
    (1, i, sqrt(i), sqrt(-i)); the check (z c)^2 gxd == gxn yd^2 becomes
    X * c^2 == R with X = z^2 gxd and c^2 in {1, -1, i, -i} — negation /
    coordinate swaps instead of multiply+square per candidate.  Returns
    (numerator, found); numerator is 0 when nothing passes, and `found`
    starts at target_num == 0 (sqrt(0) = 0), both mirroring the jnp path."""
    negX = f2.neg(X)
    checks = [
        (f2.eq(X, R), z),                      # c = 1,        c^2 = 1
        (f2.eq(negX, R), f2.muli(z)),          # c = i,        c^2 = -1
        (f2.eq(f2.muli(X), R), f2.mul(z, sqi)),    # c = sqrt(i),  c^2 = i
        (f2.eq((X[1], negX[0]), R), f2.mul(z, sqmi)),  # c^2 = -i
    ]
    found = f2.is_zero(target_num)
    best = zero2
    for ok, val in checks:
        best = f2.cmov(ok & ~found, val, best)
        found = found | ok
    return best, found


def _sgn0_rows(f1, e, one_raw):
    """RFC 9380 sgn0 (m = 2) on an Fp2 row element, matching
    tower.fp2_sgn0: convert out of Montgomery form (multiply by raw 1) for
    canonical parity; sign = sgn0(c1) if c0 == 0 else sgn0(c0)."""
    r0 = f1.mul(e[0], one_raw)
    r1 = f1.mul(e[1], one_raw)
    s0 = r0[0:1, :] & 1
    s1 = r1[0:1, :] & 1
    return jnp.where(f1.is_zero(r0), s1, s0)


def _horner_rows(f2, coeffs, x):
    acc = coeffs[-1]
    for c in reversed(coeffs[:-1]):
        acc = f2.add(f2.mul(acc, x), c)
    return acc


# SSWU constant-block column indices (component-major Fp2 pairs); the block
# itself is built by ops/hash_to_g2.py from the host constants
_SSWU_A, _SSWU_B, _SSWU_Z, _SSWU_ZA = 0, 2, 4, 6
_SSWU_Z3, _SSWU_CZ3, _SSWU_SQI, _SSWU_SQMI = 8, 10, 12, 14
_SSWU_XNUM, _SSWU_XDEN, _SSWU_YNUM, _SSWU_YDEN = 16, 24, 30, 38
SSWU_CONST_COLS = 46


def _sswu_kernel(dig_ref, *refs, n, tb, n0, variant, nws, nwi):
    """Fused hash map stage: BOTH SSWU maps + 3-isogeny + their point sum
    in ONE launch (the whole map_to_curve half of hash_to_g2).

    Design (TPU-first, no counterpart in the reference's per-step hasher,
    src/hasher.rs:352-502 — value-level semantics only):
      * inversion-free fraction-form SSWU: x = xn/xd and y = yn/yd ride as
        fractions; the sqrt exponentiation runs on W = gxn * gxd^15 with
        the same Frobenius split as the jnp path (one 377-bit chain), and
        candidate checks are cross-multiplied (X c^2 == R), so the per-map
        Fp2 inversion of the jnp path disappears;
      * the two maps (u0, u1) are lane-concatenated so the dominant sqrt
        chain is emitted ONCE and runs at double width;
      * the four denominators (xd, yd per map) are inverted by ONE batched
        Fermat chain (Montgomery's trick on their Fp norms);
      * affine x, y are then exact (identical to the jnp path: same
        canonical values after the sgn0 fix), and the isogeny + complete
        point addition mirror iso3_map_jacobian / curve.pt_add term for
        term, so the output Jacobian coordinates are bit-identical to the
        unfused device path.

    refs: u0 (2), u1 (2), p, one_col, const block (n, SSWU_CONST_COLS);
    outputs: X (2), Y (2), Z (2) of iso(map(u0)) + iso(map(u1)).
    dig_ref: (2, max(nws, nwi)) SMEM int32 — row 0 = sqrt-chain digits
    (front-padded to nws), row 1 = the Fp inversion chain (p - 2, nwi)."""
    ins, outs = refs[:4], refs[7:13]
    p_limbs, mont = _make_mont(refs[4], n=n, tb=tb, n0=n0, variant=variant)
    _, mont_w = _make_mont(refs[4], n=n, tb=2 * tb, n0=n0, variant=variant)
    one_rows = jnp.broadcast_to(refs[5][:], (n, tb))
    one_w = jnp.broadcast_to(refs[5][:], (n, 2 * tb))
    cst = refs[6][:]
    f2 = _F2Rows(p_limbs, mont, n, tb)
    f2w = _F2Rows(p_limbs, mont_w, n, 2 * tb)
    f1 = _F1Rows(p_limbs, mont, n, tb)
    rows = _load_rows(ins)
    u = (jnp.concatenate([rows[0], rows[2]], axis=1),
         jnp.concatenate([rows[1], rows[3]], axis=1))

    def c2(i, w):
        return (_mat_rows(jnp.broadcast_to(cst[:, i : i + 1], (n, w))),
                _mat_rows(jnp.broadcast_to(cst[:, i + 1 : i + 2], (n, w))))

    wz = jnp.zeros((n, 2 * tb), jnp.uint32)
    zero2_w = (wz, wz)
    one2_w = (one_w, wz)
    A = c2(_SSWU_A, 2 * tb)
    B = c2(_SSWU_B, 2 * tb)
    Z = c2(_SSWU_Z, 2 * tb)
    ZA = c2(_SSWU_ZA, 2 * tb)
    Z3 = c2(_SSWU_Z3, 2 * tb)  # noqa: F841 (kept for clarity; gx2 is direct)
    CZ3 = c2(_SSWU_CZ3, 2 * tb)
    SQI = c2(_SSWU_SQI, 2 * tb)
    SQMI = c2(_SSWU_SQMI, 2 * tb)

    # ---- fraction-form SSWU on the lane-concatenated double batch ----
    tv1 = f2w.sqr(u)                      # u^2
    tv3 = f2w.mul(Z, tv1)                 # Z u^2
    tv5 = f2w.sqr(tv3)
    t = f2w.add(tv5, tv3)
    e1 = f2w.is_zero(t)
    xn = f2w.neg(f2w.mul(B, f2w.add(t, one2_w)))   # -B (t + 1)
    xn = f2w.cmov(e1, B, xn)                        # t == 0: x1 = B/(Z A)
    xd = f2w.cmov(e1, ZA, f2w.mul(A, t))
    xd2 = f2w.sqr(xd)
    xd3 = f2w.mul(xd2, xd)

    def gx_of(num):  # gx numerator over gxd = xd^3
        n2 = f2w.sqr(num)
        n3 = f2w.mul(n2, num)
        return f2w.add(
            f2w.add(n3, f2w.mul(A, f2w.mul(num, xd2))), f2w.mul(B, xd3)
        )

    gxn = gx_of(xn)
    gxd = xd3
    g2_ = f2w.sqr(gxd)
    g4 = f2w.sqr(g2_)
    g8 = f2w.sqr(g4)
    W = f2w.mul(gxn, f2w.mul(f2w.mul(g8, g4), f2w.mul(g2_, gxd)))
    # z1 = W^((q+7)/16), Frobenius-split: (conj(W) W^11)^K * W^8
    w2 = f2w.sqr(W)
    w4 = f2w.sqr(w2)
    w8 = f2w.sqr(w4)
    w11 = f2w.mul(w8, f2w.mul(w2, W))
    bchain = f2w.mul(f2w.conj(W), w11)
    bk = _pow_win_rows(f2w, bchain, dig_ref, 0, nws, one2_w)
    z1 = f2w.mul(bk, w8)
    # y denominator (shared by both gx branches): gxd^(q+7) == gxd^8,
    # since x^q = x for x in Fp2
    yd = g8
    yd2 = f2w.sqr(yd)
    X1 = f2w.mul(f2w.sqr(z1), gxd)
    R1 = f2w.mul(gxn, yd2)
    yn1, found1 = _cand_select_rows(f2w, z1, X1, R1, SQI, SQMI, gxn, zero2_w)
    # branch 2: x2 = tv3 x1; gx2 evaluated directly (exact for all u);
    # z2 reuses the branch-1 exponentiation (z1 Cz3 u^3 — the error factor
    # is a 4th root of unity absorbed by the candidate set)
    x2n = f2w.mul(tv3, xn)
    gx2n = gx_of(x2n)
    u3 = f2w.mul(tv1, u)
    z2 = f2w.mul(f2w.mul(z1, CZ3), u3)
    X2 = f2w.mul(f2w.sqr(z2), gxd)
    R2 = f2w.mul(gx2n, yd2)
    yn2, _ = _cand_select_rows(f2w, z2, X2, R2, SQI, SQMI, gx2n, zero2_w)
    xn_f = f2w.cmov(found1, xn, x2n)
    yn_f = f2w.cmov(found1, yn1, yn2)

    # ---- split the two maps; ONE batched inversion for 4 denominators ----
    def half2(e, h):
        sl = slice(0, tb) if h == 0 else slice(tb, 2 * tb)
        return (e[0][:, sl], e[1][:, sl])

    xd_h = [half2(xd, h) for h in (0, 1)]
    yd_h = [half2(yd, h) for h in (0, 1)]

    def norm(e):  # Fp norm c0^2 + c1^2 (nonzero: xd, yd proven != 0)
        return f1.add(f1.sqr(e[0]), f1.sqr(e[1]))

    ns = [norm(xd_h[0]), norm(yd_h[0]), norm(xd_h[1]), norm(yd_h[1])]
    pre1 = f1.mul(ns[0], ns[1])
    pre2 = f1.mul(pre1, ns[2])
    pre3 = f1.mul(pre2, ns[3])
    tinv = _pow_win_rows(f1, pre3, dig_ref, 1, nwi, one_rows)  # Fermat
    inv4 = f1.mul(tinv, pre2)
    tinv = f1.mul(tinv, ns[3])
    inv3 = f1.mul(tinv, pre1)
    tinv = f1.mul(tinv, ns[2])
    inv2 = f1.mul(tinv, ns[0])
    inv1 = f1.mul(tinv, ns[1])
    invs = [inv1, inv2, inv3, inv4]

    # ---- per map: affine, sgn0 fix, isogeny, Jacobian packing ----
    one_raw = jnp.concatenate(
        [jnp.full((1, tb), 1, jnp.uint32),
         jnp.zeros((n - 1, tb), jnp.uint32)],
        axis=0,
    )
    XNUM = [c2(_SSWU_XNUM + 2 * i, tb) for i in range(4)]
    XDEN = [c2(_SSWU_XDEN + 2 * i, tb) for i in range(3)]
    YNUM = [c2(_SSWU_YNUM + 2 * i, tb) for i in range(4)]
    YDEN = [c2(_SSWU_YDEN + 2 * i, tb) for i in range(4)]
    pts = []
    for h in (0, 1):
        xnh = half2(xn_f, h)
        ynh = half2(yn_f, h)
        uh = half2(u, h)
        ixd = f2.muls(f2.conj(xd_h[h]), invs[2 * h])
        iyd = f2.muls(f2.conj(yd_h[h]), invs[2 * h + 1])
        x_aff = f2.mul(xnh, ixd)
        y_aff = f2.mul(ynh, iyd)
        flip = _sgn0_rows(f1, uh, one_raw) != _sgn0_rows(f1, y_aff, one_raw)
        y_aff = f2.cmov(flip, f2.neg(y_aff), y_aff)
        xn_p = _horner_rows(f2, XNUM, x_aff)
        xd_p = _horner_rows(f2, XDEN, x_aff)
        yn_p = _horner_rows(f2, YNUM, x_aff)
        yd_p = _horner_rows(f2, YDEN, x_aff)
        zP = f2.mul(xd_p, yd_p)
        XP = f2.mul(f2.mul(xn_p, yd_p), zP)
        YP = f2.mul(f2.mul(yn_p, f2.mul(y_aff, xd_p)), f2.sqr(zP))
        pts.append((XP, YP, zP))
    zr = jnp.zeros((n, tb), jnp.uint32)
    inf = ((one_rows, zr), (one_rows, zr), (zr, zr))
    out = _pt_add_body(f2, pts[0], pts[1], inf)
    _store_rows(outs, _elems_to_rows(out, "fp2"))


def _ladder_rows(F, seg_ref, seg_row0, nseg, base, inf, coord):
    """In-kernel seg-run scalar-mul ladder (the _ptmulconst_kernel body as
    a reusable helper): acc starts at the base point (top set bit), each
    MSB-first segment does len doublings + one cmov'd complete addition.
    seg_ref rows [seg_row0] = lens, [seg_row0 + 1] = flags."""
    def seg_body(s, flat):
        def dbl(_, fl):
            o = _pt_dbl_body(F, *_rows_to_elems(F, list(fl), coord))
            return tuple(_elems_to_rows(o, coord))

        flat = jax.lax.fori_loop(0, seg_ref[seg_row0, s], dbl, flat)
        acc = _rows_to_elems(F, list(flat), coord)
        added = _pt_add_body(F, tuple(acc), tuple(base), inf)
        do_add = seg_ref[seg_row0 + 1, s] > 0
        return tuple(
            jnp.where(do_add, a, b)
            for a, b in zip(_elems_to_rows(added, coord), flat)
        )

    flat = jax.lax.fori_loop(
        0, nseg, seg_body, tuple(_elems_to_rows(base, coord))
    )
    return _rows_to_elems(F, list(flat), coord)


# cofactor-kernel constant-block columns: psi twist constants
_COF_PSIX, _COF_PSIY, _COF_PSI2X = 0, 2, 4
COF_CONST_COLS = 5


def _g2cofactor_kernel(seg_ref, *refs, n, tb, n0, variant, nseg):
    """Fused Budroni-Pintore G2 cofactor clearing in ONE launch (the whole
    curve.g2_clear_cofactor chain: [x^2-x-1]P + [x-1]psi(P) + psi2(2P)):
    two |x|-ladders (seg structure in SMEM), six complete additions, one
    doubling and both psi endomorphisms.

    refs: P (6), p, one_col, const block (n, COF_CONST_COLS);
    outputs: cleared P (6).  seg_ref: (2, nseg) SMEM [lens; flags] of
    ABS_X's MSB-first run structure (shared by both ladders)."""
    ins, outs = refs[:6], refs[9:15]
    p_limbs, mont = _make_mont(refs[6], n=n, tb=tb, n0=n0, variant=variant)
    one_rows = jnp.broadcast_to(refs[7][:], (n, tb))
    cst = refs[8][:]
    f2 = _F2Rows(p_limbs, mont, n, tb)
    zr = jnp.zeros((n, tb), jnp.uint32)
    inf = ((one_rows, zr), (one_rows, zr), (zr, zr))

    def c2(i):
        return (_mat_rows(jnp.broadcast_to(cst[:, i : i + 1], (n, tb))),
                _mat_rows(jnp.broadcast_to(cst[:, i + 1 : i + 2], (n, tb))))

    cx = c2(_COF_PSIX)
    cy = c2(_COF_PSIY)
    psi2x = jnp.broadcast_to(cst[:, _COF_PSI2X : _COF_PSI2X + 1], (n, tb))
    P = _rows_to_elems(f2, _load_rows(ins), "fp2")

    def neg_pt(p):
        return (p[0], f2.neg(p[1]), p[2])

    def add(p, q):
        return _pt_add_body(f2, tuple(p), tuple(q), inf)

    def psi(p):
        return (f2.mul(f2.conj(p[0]), cx), f2.mul(f2.conj(p[1]), cy),
                f2.conj(p[2]))

    def psi2(p):
        return (f2.muls(p[0], psi2x), f2.neg(p[1]), p[2])

    # Mosaic payload control: naively inlining the chain (2 ladder
    # instances + 5 complete-add bodies + 1 doubling) produced a ~6.5 MB
    # kernel payload that SIGABRTs the remote compile helper.  Both
    # ladders share ONE inlined instance via a 2-iteration fori_loop, and
    # all five additions share ONE inlined _pt_add_body via a 5-iteration
    # routing loop — semantics are unchanged (complete formulas
    # everywhere), only the inlining count drops.
    def lad_body(i, carry):
        cur = _rows_to_elems(f2, list(carry[:6]), "fp2")
        res = neg_pt(
            _ladder_rows(f2, seg_ref, 0, nseg, tuple(cur), inf, "fp2")
        )
        rrows = _elems_to_rows(res, "fp2")
        first = i == 0
        xp_rows = [
            jnp.where(first, r, c) for r, c in zip(rrows, carry[6:])
        ]
        return tuple(rrows) + tuple(xp_rows)

    prow = tuple(_elems_to_rows(P, "fp2"))
    lad = jax.lax.fori_loop(0, 2, lad_body, prow + prow)
    # x < 0 for BLS12-381, so [x]P = -ladder(P): lad[:6] = [x^2]P,
    # lad[6:] = [x]P
    xxp_rows, xp_rows = list(lad[:6]), list(lad[6:])
    xp = _rows_to_elems(f2, xp_rows, "fp2")
    negP_rows = _elems_to_rows(neg_pt(P), "fp2")
    negxp_rows = _elems_to_rows(neg_pt(xp), "fp2")
    t3_rows = _elems_to_rows(psi2(_pt_dbl_body(f2, *P)), "fp2")

    # additions, one shared body.  acc starts at xxp; schedule:
    #   i=0: aux = xp + (-P)            (psi applied when consumed)
    #   i=1: acc = xxp + (-xp)
    #   i=2: acc = acc + (-P)           -> [x^2 - x - 1] P
    #   i=3: acc = acc + psi(aux)       -> + psi([x - 1] P)
    #   i=4: acc = acc + psi2(2P)
    def add_body(i, carry):
        acc_rows = list(carry[:6])
        aux = _rows_to_elems(f2, list(carry[6:]), "fp2")
        pa_rows = _elems_to_rows(psi(aux), "fp2")
        lhs_rows = [
            jnp.where(i == 0, a, b) for a, b in zip(xp_rows, acc_rows)
        ]
        rhs_rows = [
            jnp.where(
                i == 3,
                pa,
                jnp.where(i == 4, t3, jnp.where(i == 1, nxp, npr)),
            )
            for pa, t3, nxp, npr in zip(
                pa_rows, t3_rows, negxp_rows, negP_rows
            )
        ]
        res = _pt_add_body(
            f2,
            tuple(_rows_to_elems(f2, lhs_rows, "fp2")),
            tuple(_rows_to_elems(f2, rhs_rows, "fp2")),
            inf,
        )
        rrows = _elems_to_rows(res, "fp2")
        new_acc = [jnp.where(i == 0, a, r) for a, r in zip(acc_rows, rrows)]
        new_aux = [
            jnp.where(i == 0, r, c) for r, c in zip(rrows, carry[6:])
        ]
        return tuple(new_acc) + tuple(new_aux)

    fin = jax.lax.fori_loop(
        0, 5, add_body, tuple(xxp_rows) + tuple(xxp_rows)
    )
    _store_rows(outs, list(fin[:6]))


def _ptmulvar_kernel(nb_ref, *refs, n, tb, n0, variant, coord):
    """Fused variable-scalar point multiplication — the whole MSB-first
    double-and-cmov-add ladder in ONE launch.  The per-element scalars
    ride in as limb rows PRE-ALIGNED so the scan's first bit sits at
    row n-1 bit 15 (the caller shifts left by 16n - nbits); each iteration
    reads the top bit and shifts the scalar rows up one bit.

    nb_ref: (1,) SMEM int32 = number of bits to scan.
    coord 'fp': refs = P (3), s, p, one_col, 3 outputs.
    coord 'fp2': refs = P (6), s, p, one_col, 6 outputs."""
    nc = 2 if coord == "fp2" else 1
    nin = 3 * nc + 1
    ins, outs = refs[:nin], refs[nin + 2:]
    p_limbs, mont = _make_mont(refs[nin], n=n, tb=tb, n0=n0, variant=variant)
    one_rows = jnp.broadcast_to(refs[nin + 1][:], (n, tb))
    zero_rows = jnp.zeros((n, tb), jnp.uint32)
    F = (_F2Rows if coord == "fp2" else _F1Rows)(p_limbs, mont, n, tb)
    rows = _load_rows(ins)
    base = _rows_to_elems(F, rows[: 3 * nc], coord)
    if coord == "fp2":
        inf_elems = ((one_rows, zero_rows), (one_rows, zero_rows),
                     (zero_rows, zero_rows))
    else:
        inf_elems = (one_rows, one_rows, zero_rows)
    inf_rows = _elems_to_rows(inf_elems, coord)

    def body(_, carry):
        s = carry[0]
        flat = carry[1:]
        bit = (s[n - 1 : n, :] >> 15) & 1          # (1, tb)
        s = ((s << 1) & MASK) | (_shift_down_rows(s, 1, 0) >> 15)
        acc = _rows_to_elems(F, list(flat), coord)
        dbl = _pt_dbl_body(F, *acc)
        added = _pt_add_body(F, tuple(dbl), tuple(base), inf_elems)
        sel = tuple(
            _sel_rows(bit, a, d)
            for a, d in zip(
                _elems_to_rows(added, coord), _elems_to_rows(dbl, coord)
            )
        )
        return (s,) + sel

    carry = jax.lax.fori_loop(
        0, nb_ref[0], body, (rows[3 * nc],) + tuple(inf_rows)
    )
    _store_rows(outs, list(carry[1:]))


def _gs_body(f2, Z):
    """One Granger-Scott cyclotomic square on GS z-ordered _F2Rows
    elements (mirrors tower.fp12_cyclotomic_sqr's jnp fallback)."""
    f2add, f2sub, f2sqr, f2xi = f2.add, f2.sub, f2.sqr, f2.xi

    sums = [f2add(Z[0], Z[1]), f2add(Z[2], Z[3]), f2add(Z[4], Z[5])]
    sq = [f2sqr(z) for z in Z] + [f2sqr(s) for s in sums]
    xi_t1 = [f2xi(sq[1]), f2xi(sq[3]), f2xi(sq[5])]
    t00 = f2add(sq[0], xi_t1[0])
    t20 = f2add(sq[2], xi_t1[1])
    t40 = f2add(sq[4], xi_t1[2])
    t01 = f2sub(sq[6], f2add(sq[0], sq[1]))
    t21 = f2sub(sq[7], f2add(sq[2], sq[3]))
    t41 = f2sub(sq[8], f2add(sq[4], sq[5]))

    def m3m2(t, zz):  # 3t - 2z
        r = f2sub(t, zz)
        r = f2add(r, r)
        return f2add(r, t)

    def p3p2(t, zz):  # 3t + 2z
        r = f2add(t, zz)
        r = f2add(r, r)
        return f2add(r, t)

    return [
        m3m2(t00, Z[0]),
        p3p2(t01, Z[1]),
        p3p2(f2xi(t41), Z[2]),
        m3m2(t40, Z[3]),
        m3m2(t20, Z[4]),
        p3p2(t21, Z[5]),
    ]


def _cyclo_sqr_kernel(cnt_ref, *refs, n, tb, n0, variant):
    """Fused Granger-Scott cyclotomic square: 9 Fp2 squares (18 Montgomery
    muls) + all xi/combination arithmetic in ONE launch (mirrors
    tower.fp12_cyclotomic_sqr's jnp fallback / golden fp12_cyclotomic_sqr).

    The square iterates cnt times INSIDE the launch via fori_loop over the
    SMEM run-length scalar — the final-exp x-chains' squaring runs become
    one launch per run, and every run length shares ONE Mosaic payload.

    refs: z0c0, z0c1, ..., z5c0, z5c1 (12 inputs in the GS z-ordering —
    the caller does the fp12<->z coefficient permutation), p,
    then 12 outputs in the same z-ordering."""
    ins = refs[:12]
    outs = refs[13:25]
    p_limbs, mont = _make_mont(refs[12], n=n, tb=tb, n0=n0, variant=variant)
    f2 = _F2Rows(p_limbs, mont, n, tb)
    Z = _group_f2(_load_rows(ins))

    def body(_, flat):
        zz = _gs_body(f2, _group_f2(list(flat)))
        return tuple(c for z in zz for c in z)

    flat = jax.lax.fori_loop(
        0, cnt_ref[0], body, tuple(c for z in Z for c in z)
    )
    _store_rows(outs, list(flat))


# fp12 coefficient-major <-> Granger-Scott z ordering (self-inverse: it
# swaps a1<->b1 and a2<->b0; tower.fp12_cyclotomic_sqr_k does the same
# permutation outside the kernel)
_Z_PERM = [0, 1, 8, 9, 6, 7, 4, 5, 2, 3, 10, 11]


def _expx_kernel(seg_ref, *refs, n, tb, n0, variant, nseg):
    """Fused cyclotomic exp-by-|x| — the ENTIRE final-exp x-chain in ONE
    launch.  Starting from f = m (the top set bit), for each MSB-first
    segment s < nseg:

        f = f^(2^len_s)    Granger-Scott squares (len_s from SMEM)
        f = f * m          iff flag_s (the segment ends on a set bit),
                           applied branch-free via cmov

    seg_ref is a (2, nseg) SMEM int32 [lens; flags], so every exponent
    shares one Mosaic payload.  Valid only for m in the cyclotomic
    subgroup (as after the easy part); the caller applies the final
    conjugation for x < 0.

    refs: 12 m coords (fp12 coefficient-major), p; 12 outputs."""
    ins, outs = refs[:12], refs[13:25]
    p_limbs, mont = _make_mont(refs[12], n=n, tb=tb, n0=n0, variant=variant)
    f2 = _F2Rows(p_limbs, mont, n, tb)
    m_rows = _load_rows(ins)
    m12 = _group_f12(m_rows)

    def seg_body(s, flat):
        def sq(_, fl):
            zz = _gs_body(f2, _group_f2([fl[i] for i in _Z_PERM]))
            zr = [c for z in zz for c in z]
            out = [None] * 12
            for j, i in enumerate(_Z_PERM):
                out[i] = zr[j]
            return tuple(out)

        flat = jax.lax.fori_loop(0, seg_ref[0, s], sq, flat)
        fm = _flat_f12(_f12_mul(f2, _group_f12(list(flat)), m12))
        do_mul = seg_ref[1, s] > 0
        return tuple(jnp.where(do_mul, a, b) for a, b in zip(fm, flat))

    flat = jax.lax.fori_loop(0, nseg, seg_body, tuple(m_rows))
    _store_rows(outs, list(flat))


def _miller_line_apply(f2, f, line, valid, one2, zero2):
    """f * line with the line neutralised (1, 0, 0) where valid is False —
    the in-kernel form of pairing._neutral_line + fp12_mul_by_014."""
    c0 = f2.cmov(valid, line[0], one2)
    c1 = f2.cmov(valid, line[1], zero2)
    c4 = f2.cmov(valid, line[2], zero2)
    return _f12_mul_014(f2, f, c0, c1, c4)


def _millerdbl_kernel(cnt_ref, *refs, n, tb, n0, variant, k):
    """Fused Miller doubling RUN: `cnt` (a runtime SMEM scalar — one Mosaic
    payload covers every run length) iterations of

        f = f^2;  for each pair i: T_i, line_i = dbl_step(T_i);
                  f = f * line_i   (neutralised where pair i is invalid)

    in ONE launch — an entire doubling segment of the Miller loop costs one
    kernel dispatch + one HBM round-trip instead of (1 + 2k) * run.

    refs: 12 f coords; per pair i < k: X (2), Y (2), Z (2), xp, yp,
    valid (uint32 rows, row 0 is the mask); p, one_col; then
    outputs: 12 f' + per pair X' Y' Z' (6k)."""
    nin = 12 + 9 * k
    ins, outs = refs[:nin], refs[nin + 2:]
    p_limbs, mont = _make_mont(refs[nin], n=n, tb=tb, n0=n0, variant=variant)
    one_rows = jnp.broadcast_to(refs[nin + 1][:], (n, tb))
    zero_rows = jnp.zeros((n, tb), jnp.uint32)
    one2, zero2 = (one_rows, zero_rows), (zero_rows, zero_rows)
    f2 = _F2Rows(p_limbs, mont, n, tb)
    rows = _load_rows(ins)
    xps = [rows[12 + 9 * i + 6] for i in range(k)]
    yps = [rows[12 + 9 * i + 7] for i in range(k)]
    valids = [rows[12 + 9 * i + 8][0:1, :] > 0 for i in range(k)]

    def body(_, flat):
        f = _group_f12(list(flat[:12]))
        f = _f12_sqr(f2, f)
        out_t = []
        for i in range(k):
            X, Y, Z = _group_f2(list(flat[12 + 6 * i : 12 + 6 * i + 6]))
            Tn, line = _miller_dbl_rows(f2, X, Y, Z, xps[i], yps[i])
            f = _miller_line_apply(f2, f, line, valids[i], one2, zero2)
            out_t += [c for e in Tn for c in e]
        return tuple(_flat_f12(f)) + tuple(out_t)

    flat0 = tuple(rows[:12]) + tuple(
        c for i in range(k) for c in rows[12 + 9 * i : 12 + 9 * i + 6]
    )
    flat = jax.lax.fori_loop(0, cnt_ref[0], body, flat0)
    _store_rows(outs, list(flat))


def _milleradd_kernel(*refs, n, tb, n0, variant, k):
    """Fused Miller mixed-addition BLOCK: for each pair i,
    T_i, line_i = add_step(T_i, Q_i); f = f * line_i (neutralised where
    invalid) — one launch per set bit of the loop parameter.

    refs: 12 f coords; per pair: X (2), Y (2), Z (2), xq (2), yq (2),
    xp, yp, valid; p, one_col; outputs 12 f' + 6k T'."""
    nin = 12 + 13 * k
    ins, outs = refs[:nin], refs[nin + 2:]
    p_limbs, mont = _make_mont(refs[nin], n=n, tb=tb, n0=n0, variant=variant)
    one_rows = jnp.broadcast_to(refs[nin + 1][:], (n, tb))
    zero_rows = jnp.zeros((n, tb), jnp.uint32)
    one2, zero2 = (one_rows, zero_rows), (zero_rows, zero_rows)
    f2 = _F2Rows(p_limbs, mont, n, tb)
    rows = _load_rows(ins)
    f = _group_f12(rows[:12])
    out_t = []
    for i in range(k):
        o = 12 + 13 * i
        X, Y, Z, xq, yq = _group_f2(rows[o : o + 10])
        xp, yp = rows[o + 10], rows[o + 11]
        valid = rows[o + 12][0:1, :] > 0
        Tn, line = _miller_add_rows(f2, X, Y, Z, xq, yq, xp, yp)
        f = _miller_line_apply(f2, f, line, valid, one2, zero2)
        out_t += [c for e in Tn for c in e]
    _store_rows(outs, _flat_f12(f) + out_t)


class FieldKernels:
    """Pallas kernel set for one ModField."""

    def __init__(self, field, tile: int = 512):
        from ...utils.config import config

        self.n = field.nlimb
        self.tile = tile
        self.n0 = int(field.n0)
        self.p_col = np.asarray(field.P_LIMBS).reshape(self.n, 1)
        self.variant = "cios3" if config.cios_v3 else "cios"
        self.one_col = np.asarray(field.ONE, np.uint32).reshape(self.n, 1)

    @staticmethod
    def _compiler_params():
        """Raise the 16 MB default scoped-VMEM cap: the fused tower kernels'
        stack crests it at large batches (measured 16.52 MB for the Fp6
        kernel at batch 16384); v5e has 128 MB of VMEM, so 64 MB leaves both
        headroom and a runaway guard."""
        from jax.experimental.pallas import tpu as pltpu

        return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    def _mont_inputs(self):
        """The constant operand every mul-type kernel takes after the
        vector inputs: the modulus limb column."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n = self.n
        specs = [
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        vals = [jnp.asarray(self.p_col)]
        return specs, vals

    def _rec(self, muls, addsubs, shape):
        """Trace-time roofline accounting for the fused tower kernels in
        scalar Fp-op equivalents (utils/profiling.count_ops)."""
        from ...utils import profiling

        if profiling._active_counter is not None:
            k = int(np.prod(shape[:-1], dtype=np.int64))
            profiling.record(f"mul_{self.n}", muls * k)
            profiling.record(f"add_{self.n}", addsubs * k)

    def _call(self, kernel_fn, a, b, mont_consts=False):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n = self.n
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        lead = shape[:-1]
        aa = a.reshape(-1, n)
        bb = b.reshape(-1, n)
        bsz = aa.shape[0]
        tile = (
            self.tile
            if bsz >= self.tile
            else max(8, 1 << max(bsz - 1, 0).bit_length())
        )
        pad = (-bsz) % tile
        if pad:
            aa = jnp.pad(aa, ((0, pad), (0, 0)))
            bb = jnp.pad(bb, ((0, pad), (0, 0)))
        total = aa.shape[0]
        if mont_consts:
            const_specs, const_vals = self._mont_inputs()
        else:
            const_specs = [
                pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
            ]
            const_vals = [jnp.asarray(self.p_col)]
        out = pl.pallas_call(
            kernel_fn(tile),
            grid=(total // tile,),
            compiler_params=self._compiler_params(),
            in_specs=[
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ] + const_specs,
            out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((total, n), jnp.uint32),
        )(aa, bb, *const_vals)
        if pad:
            out = out[:bsz]
        return out.reshape(lead + (n,))

    def mul(self, a, b):
        return self._call(
            lambda tile: functools.partial(
                _mul_kernel, n=self.n, tb=tile, n0=self.n0, variant=self.variant
            ),
            a, b, mont_consts=True,
        )

    def add(self, a, b):
        return self._call(
            lambda tile: functools.partial(_add_kernel, n=self.n, tb=tile),
            a, b,
        )

    def sub(self, a, b):
        return self._call(
            lambda tile: functools.partial(_sub_kernel, n=self.n, tb=tile),
            a, b,
        )

    def fp2_sqr(self, a0, a1):
        """Fused Fp2 square -> (c0, c1)."""
        self._rec(2, 3, jnp.broadcast_shapes(a0.shape, a1.shape))
        return self._fp2_call(_fp2sqr_kernel, [a0, a1])

    def _tower_call(self, kernel_fn, operands, n_out, extra=None,
                    extra_consts=None, max_tile=None, count_scalar=None):
        """Generic multi-in/multi-out fused tower kernel plumbing:
        broadcast + flatten + tile/pad the operands, launch, unflatten.
        `extra`: additional static kwargs for the kernel body.
        `extra_consts`: per-launch-uniform (n, 1) uint32 columns appended
        as inputs after p (Mosaic rejects captured array constants,
        so curve constants ride in as operands).
        `max_tile`: per-kernel tile cap overriding self.tile (grid grows to
        cover the batch; total work and semantics are unchanged).
        `count_scalar`: in-kernel iteration count(s), passed as a leading
        SMEM int32 ref (the kernel's first positional arg) — RUNTIME
        values, so every run structure shares one Mosaic payload.  A python
        int becomes a (1,) scalar; a list/array rides in with its own
        shape."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n = self.n
        shape = jnp.broadcast_shapes(*[x.shape for x in operands])
        ops = [jnp.broadcast_to(x, shape).reshape(-1, n) for x in operands]
        lead = shape[:-1]
        bsz = ops[0].shape[0]
        self_tile = (
            self.tile if max_tile is None else min(self.tile, max_tile)
        )
        tile = (
            self_tile
            if bsz >= self_tile
            else max(8, 1 << max(bsz - 1, 0).bit_length())
        )
        pad = (-bsz) % tile
        if pad:
            ops = [jnp.pad(x, ((0, pad), (0, 0))) for x in ops]
        total = ops[0].shape[0]
        vec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        lead_specs, lead_vals = [], []
        if count_scalar is not None:
            cnt = np.atleast_1d(np.asarray(count_scalar, np.int32))
            lead_specs.append(
                pl.BlockSpec(
                    cnt.shape,
                    # early-bind the rank: `arr` below rebinds in the
                    # extra_consts loop and a late-binding closure here
                    # returned the WRONG index arity on real hardware
                    # (interpret mode does not check index-map arity)
                    lambda i, nd=cnt.ndim: (0,) * nd,
                    memory_space=pltpu.SMEM,
                )
            )
            lead_vals.append(jnp.asarray(cnt))
        const_specs, const_vals = self._mont_inputs()
        for col in extra_consts or []:
            arr = np.asarray(col)
            const_specs.append(
                pl.BlockSpec(
                    arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
                )
            )
            const_vals.append(jnp.asarray(arr, jnp.uint32))
        outs = pl.pallas_call(
            functools.partial(
                kernel_fn, n=n, tb=tile, n0=self.n0, variant=self.variant,
                **(extra or {}),
            ),
            grid=(total // tile,),
            compiler_params=self._compiler_params(),
            in_specs=lead_specs + [vec] * len(ops) + const_specs,
            out_specs=tuple([vec] * n_out),
            out_shape=tuple(
                jax.ShapeDtypeStruct((total, n), jnp.uint32)
                for _ in range(n_out)
            ),
        )(*lead_vals, *ops, *const_vals)
        if pad:
            outs = [o[:bsz] for o in outs]
        return [o.reshape(lead + (n,)) for o in outs]

    def fp6_mul(self, a_coords, b_coords):
        """Fused Fp6 product: a_coords/b_coords are 6 limb tensors each
        (coefficient-major (c0.c0, c0.c1, c1.c0, c1.c1, c2.c0, c2.c1));
        returns 6 output tensors in the same layout."""
        operands = list(a_coords) + list(b_coords)
        shape = jnp.broadcast_shapes(*[x.shape for x in operands])
        self._rec(18, 46, shape)  # 6 fp2-muls (Toom) + combination adds
        return self._tower_call(_fp6mul_kernel, operands, 6)

    def fp12_mul(self, coords):
        """Fused full Fp12 product: coords = 12 a tensors + 12 b tensors
        (coefficient-major c0.c0.r .. c1.c2.i); returns 12 outputs."""
        self._rec(54, 152, jnp.broadcast_shapes(*[x.shape for x in coords]))
        return self._tower_call(_fp12mul_kernel, list(coords), 12)

    def fp12_sqr(self, coords):
        """Fused generic Fp12 square: 12 coord tensors in -> 12 out."""
        self._rec(36, 112, jnp.broadcast_shapes(*[x.shape for x in coords]))
        return self._tower_call(_fp12sqr_kernel, list(coords), 12)

    def mul014(self, coords):
        """Fused sparse Fp12 x line product: coords = 12 f tensors +
        c0 (2) + c1 (2) + c4 (2); returns 12 outputs."""
        self._rec(45, 120, jnp.broadcast_shapes(*[x.shape for x in coords]))
        return self._tower_call(_mul014_kernel, list(coords), 12)

    def dbl_step(self, coords):
        """Fused Miller doubling step: coords = X (2), Y (2), Z (2), xp,
        yp.  Returns X' Y' Z' (6) + line i_, c1l, c4l (6).  The twist
        coefficient (b' = 4(1+u)) is folded into the body as shift/adds,
        so no constant operands ride along."""
        self._rec(25, 102, jnp.broadcast_shapes(*[x.shape for x in coords]))
        return self._tower_call(_dblstep_kernel, list(coords), 12)

    def add_step(self, coords):
        """Fused Miller mixed-addition step: coords = X (2), Y (2), Z (2),
        xq (2), yq (2), xp, yp.  Returns X' Y' Z' (6) + line (6)."""
        self._rec(38, 84, jnp.broadcast_shapes(*[x.shape for x in coords]))
        return self._tower_call(_addstep_kernel, list(coords), 12)

    def pt_dbl(self, coords, coord, count=1):
        """Fused Jacobian doubling (curve.pt_double): coords = the point's
        limb tensors (3 for coord='fp', 6 component-major for 'fp2').
        `count` repeats the doubling inside the launch (static run
        length)."""
        nc = 2 if coord == "fp2" else 1
        self._rec(
            (17 if nc == 2 else 8) * count,
            (40 if nc == 2 else 20) * count,
            jnp.broadcast_shapes(*[x.shape for x in coords]),
        )
        return self._tower_call(
            _ptdbl_kernel, list(coords), 3 * nc, extra={"coord": coord},
            count_scalar=count,
        )

    def pt_add(self, coords, coord):
        """Fused complete Jacobian addition (curve.pt_add): coords = P's
        then Q's limb tensors (6 total for 'fp', 12 for 'fp2')."""
        nc = 2 if coord == "fp2" else 1
        self._rec(
            58 if nc == 2 else 23,
            110 if nc == 2 else 50,
            jnp.broadcast_shapes(*[x.shape for x in coords]),
        )
        return self._tower_call(
            _ptadd_kernel, list(coords), 3 * nc, extra={"coord": coord},
            extra_consts=[self.one_col],
        )

    def miller_dbl_run(self, coords, k, count):
        """Fused Miller doubling run: `count` iterations of [f = f^2; per
        pair dbl_step + neutralised line multiply] in ONE launch.

        coords: 12 f limb tensors + per pair (k total) X (2), Y (2), Z (2),
        xp, yp, valid (uint32, any (..., 1)-broadcastable shape).  `count`
        is a python int — it rides into the kernel as an SMEM scalar, so
        every run length shares one Mosaic payload.  Returns 12 f' + 6k T'
        tensors."""
        self._rec(
            (36 + 70 * k) * count,
            (112 + 150 * k) * count,
            jnp.broadcast_shapes(*[x.shape for x in coords]),
        )
        return self._tower_call(
            _millerdbl_kernel, list(coords), 12 + 6 * k,
            extra={"k": k}, extra_consts=[self.one_col],
            count_scalar=count,
        )

    def miller_add(self, coords, k):
        """Fused Miller mixed-addition block: per pair add_step +
        neutralised line multiply, ONE launch.  coords: 12 f + per pair
        X (2), Y (2), Z (2), xq (2), yq (2), xp, yp, valid.  Returns
        12 f' + 6k T'."""
        self._rec(
            83 * k, 40 + 204 * k,
            jnp.broadcast_shapes(*[x.shape for x in coords]),
        )
        return self._tower_call(
            _milleradd_kernel, list(coords), 12 + 6 * k,
            extra={"k": k}, extra_consts=[self.one_col],
        )

    def pt_mul_const(self, coords, coord, segs):
        """Fused constant-scalar point multiply: the whole static ladder
        (doubling runs + set-bit additions, from acc = P at the top bit)
        in ONE launch.  coords: the base point's limb tensors (3 for
        coord='fp', 6 component-major for 'fp2'); segs: static
        [(run_len, ends_on_set_bit), ...] MSB-first after the top bit.
        Returns the 3 (or 6) accumulator tensors."""
        nc = 2 if coord == "fp2" else 1
        nseg = len(segs)
        ndbl = sum(s[0] for s in segs)
        self._rec(
            (17 if nc == 2 else 8) * ndbl + (58 if nc == 2 else 23) * nseg,
            (40 if nc == 2 else 20) * ndbl + (110 if nc == 2 else 50) * nseg,
            jnp.broadcast_shapes(*[x.shape for x in coords]),
        )
        arr = np.array(
            [[s[0] for s in segs], [1 if s[1] else 0 for s in segs]],
            np.int32,
        )
        return self._tower_call(
            _ptmulconst_kernel, list(coords), 3 * nc,
            extra={"coord": coord, "nseg": nseg},
            extra_consts=[self.one_col], count_scalar=arr,
        )

    # fixed window counts per coordinate degree so every exponent shares
    # one Mosaic payload (Fp exponents <= 384 bits, Fp2 <= 768; leading
    # zero digits are exact: f stays one through them)
    _POW_NWIN = {1: 96, 2: 192}

    def pow_win(self, coords, nc, digits, nwin=None):
        """Fused windowed pow: a^exp for a host-constant exponent — table
        build + every 4-bit window (4 squarings + table multiply) in ONE
        launch.  coords: a's limb tensors (1 for Fp, 2 for Fp2); digits:
        MSB-first 4-bit digits of the exponent.  Returns nc tensors.
        `nwin` overrides the shared fixed window count (a caller whose
        exponents are structurally shorter — e.g. the Frobenius-split
        SSWU sqrt's 377-bit chain — picks its own payload width rather
        than paying for 768 bits of leading zeros)."""
        if nwin is None:
            nwin = self._POW_NWIN[nc]
        assert len(digits) <= nwin, (len(digits), nwin)
        digs = np.array([0] * (nwin - len(digits)) + list(digits), np.int32)
        self._rec(
            (42 + 11 * nwin) if nc == 2 else (14 + 5 * nwin),
            (28 + 5 * nwin) if nc == 2 else 0,
            jnp.broadcast_shapes(*[x.shape for x in coords]),
        )
        return self._tower_call(
            _powwin_kernel, list(coords), nc,
            extra={"nc": nc, "nwin": nwin}, extra_consts=[self.one_col],
            count_scalar=digs,
        )

    def pt_mul_var(self, coords, coord, scalar_limbs, nbits):
        """Fused variable-scalar point multiply: the whole nbits-long
        double-and-cmov-add ladder in ONE launch.  coords: base point limb
        tensors (3 for 'fp', 6 for 'fp2'); scalar_limbs: (..., m) uint32
        16-bit limbs (raw, NOT Montgomery).  Returns the accumulator
        tensors ([scalar] P from infinity — matches curve.pt_mul_var)."""
        nc = 2 if coord == "fp2" else 1
        n = self.n
        self._rec(
            (17 + 58 if nc == 2 else 8 + 23) * nbits,
            (40 + 110 if nc == 2 else 20 + 50) * nbits,
            jnp.broadcast_shapes(*[x.shape for x in coords]),
        )
        # pad the scalar to n limbs and pre-align so the scan's first bit
        # (bit nbits-1) sits at row n-1 bit 15
        s = scalar_limbs.astype(jnp.uint32)
        m = s.shape[-1]
        assert nbits <= 16 * m <= 16 * n
        s = jnp.pad(s, [(0, 0)] * (s.ndim - 1) + [(0, n - m)])
        limb_sh, bit_sh = divmod(16 * n - nbits, 16)
        if limb_sh:
            s = jnp.concatenate(
                [jnp.zeros_like(s[..., :limb_sh]), s[..., : n - limb_sh]],
                axis=-1,
            )
        if bit_sh:
            lo = jnp.concatenate(
                [jnp.zeros_like(s[..., :1]), s[..., :-1]], axis=-1
            ) >> (16 - bit_sh)
            s = ((s << bit_sh) & 0xFFFF) | lo
        return self._tower_call(
            _ptmulvar_kernel, list(coords) + [s], 3 * nc,
            extra={"coord": coord}, extra_consts=[self.one_col],
            count_scalar=nbits,
        )

    def sswu_map2(self, coords, const_block, sqrt_digits, inv_digits):
        """Fused map_to_curve for BOTH hash field elements: SSWU (fraction
        form, shared Frobenius-split sqrt chain at double lane width) +
        3-isogeny + the q0 + q1 complete addition, ONE launch.

        coords: u0 (2 tensors) + u1 (2); const_block: the (n,
        SSWU_CONST_COLS) column table from ops/hash_to_g2.py; digit lists
        are MSB-first 4-bit (sqrt chain and p-2 Fermat chain).  Returns
        X (2), Y (2), Z (2) of the summed Jacobian point."""
        nws = -(-len(sqrt_digits) // 8) * 8
        nwi = -(-len(inv_digits) // 8) * 8
        width = max(nws, nwi)

        def pad(d, w):
            return [0] * (w - len(d)) + list(d)

        digs = np.array([pad(sqrt_digits, width), pad(inv_digits, width)],
                        np.int32)
        shape = jnp.broadcast_shapes(*[x.shape for x in coords])
        # per output element: 2 maps x (sqrt chain + table + straight-line
        # fraction SSWU + iso + affine) + one shared Fermat chain + pt_add
        self._rec(2 * (11 * nws + 42 + 160) + (5 * nwi + 14) + 36 + 58,
                  2 * (5 * nws + 300) + (60) + 110, shape)
        return self._tower_call(
            _sswu_kernel, list(coords), 6,
            extra={"nws": nws, "nwi": nwi},
            extra_consts=[self.one_col, const_block],
            count_scalar=digs, max_tile=512,
        )

    def g2_cofactor(self, coords, const_block, segs):
        """Fused Budroni-Pintore cofactor clearing (curve.g2_clear_cofactor
        whole chain), ONE launch.  coords: P's 6 limb tensors; const_block:
        (n, COF_CONST_COLS) psi constants; segs: ABS_X's static MSB-first
        [(run_len, ends_on_set_bit), ...]."""
        nseg = len(segs)
        ndbl = sum(s[0] for s in segs)
        self._rec(2 * (17 * ndbl + 58 * nseg) + 58 * 6 + 17 + 8,
                  2 * (40 * ndbl + 110 * nseg) + 110 * 6 + 40 + 10,
                  jnp.broadcast_shapes(*[x.shape for x in coords]))
        arr = np.array(
            [[s[0] for s in segs], [1 if s[1] else 0 for s in segs]],
            np.int32,
        )
        return self._tower_call(
            _g2cofactor_kernel, list(coords), 6,
            extra={"nseg": nseg},
            extra_consts=[self.one_col, const_block],
            count_scalar=arr, max_tile=512,
        )

    def cyclo_sqr(self, z_coords, count=1):
        """Fused Granger-Scott cyclotomic square: z_coords are the 12 limb
        tensors of the GS z-ordering (z0.c0, z0.c1, ..., z5.c1); returns 12
        output tensors in the same layout.  `count` repeats the square
        inside the launch (static run length)."""
        operands = list(z_coords)
        shape = jnp.broadcast_shapes(*[x.shape for x in operands])
        self._rec(18 * count, 70 * count, shape)
        return self._tower_call(
            _cyclo_sqr_kernel, operands, 12, count_scalar=count,
        )

    def exp_x(self, coords, segs):
        """Fused cyclotomic exp-by-|x| (the whole final-exp x-chain, ONE
        launch).  coords: 12 m limb tensors (coefficient-major); segs:
        static [(run_len, ends_on_set_bit), ...] MSB-first after the top
        bit.  Returns 12 tensors = m^|x| (un-conjugated).  Requires m in
        the cyclotomic subgroup."""
        nseg = len(segs)
        nsq = sum(s[0] for s in segs)
        self._rec(
            18 * nsq + 54 * nseg, 70 * nsq + 152 * nseg,
            jnp.broadcast_shapes(*[x.shape for x in coords]),
        )
        arr = np.array(
            [[s[0] for s in segs], [1 if s[1] else 0 for s in segs]],
            np.int32,
        )
        return self._tower_call(
            _expx_kernel, list(coords), 12, extra={"nseg": nseg},
            count_scalar=arr,
        )

    def fp2_mul(self, a0, a1, b0, b1):
        """Fused Karatsuba Fp2 product -> (c0, c1); operands (..., n) with a
        common broadcastable shape."""
        self._rec(
            3, 5, jnp.broadcast_shapes(a0.shape, a1.shape, b0.shape, b1.shape)
        )
        return self._fp2_call(_fp2mul_kernel, [a0, a1, b0, b1])

    def _fp2_call(self, kernel, operands):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n = self.n
        shape = jnp.broadcast_shapes(*[x.shape for x in operands])
        ops = [jnp.broadcast_to(x, shape).reshape(-1, n) for x in operands]
        lead = shape[:-1]
        bsz = ops[0].shape[0]
        tile = (
            self.tile
            if bsz >= self.tile
            else max(8, 1 << max(bsz - 1, 0).bit_length())
        )
        pad = (-bsz) % tile
        if pad:
            ops = [jnp.pad(x, ((0, pad), (0, 0))) for x in ops]
        total = ops[0].shape[0]
        vec_spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        const_specs, const_vals = self._mont_inputs()
        c0, c1 = pl.pallas_call(
            functools.partial(kernel, n=n, tb=tile, n0=self.n0, variant=self.variant),
            grid=(total // tile,),
            compiler_params=self._compiler_params(),
            in_specs=[vec_spec] * len(ops) + const_specs,
            out_specs=(vec_spec, vec_spec),
            out_shape=(
                jax.ShapeDtypeStruct((total, n), jnp.uint32),
                jax.ShapeDtypeStruct((total, n), jnp.uint32),
            ),
        )(*ops, *const_vals)
        if pad:
            c0, c1 = c0[:bsz], c1[:bsz]
        return c0.reshape(lead + (n,)), c1.reshape(lead + (n,))
