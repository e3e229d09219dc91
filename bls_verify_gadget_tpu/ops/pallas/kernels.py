"""Fused Pallas TPU kernels for modular limb arithmetic (mul/add/sub),
parameterised over the field (Fp 24 limbs / Fr 16 limbs).

Measured on TPU v5e: chained inside one jit, the fused multiply sustains
>100M Fp-muls/s at batch 16k vs ~9M for the jnp scan path — the win is
eliminating ~100 sequential tiny scan steps per multiply.

Layout contract: operands in the framework's natural (..., nlimb) layout;
the mul kernel transposes to limb-major (nlimb, TB) inside VMEM.  All
kernels preserve exact canonical semantics (inputs/outputs < m, limbs
< 2^16), so they are drop-in replacements for the ModField ops.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _mul_kernel(a_ref, b_ref, p_ref, o_ref, t_ref, *, n, tb, n0):
    a = jnp.transpose(a_ref[:], (1, 0))  # (n, TB)
    b = jnp.transpose(b_ref[:], (1, 0))
    p_limbs = p_ref[:]  # (n, 1)

    # phase 1: convolution columns (each < 2^22), static offsets, in-place
    t_ref[:] = jnp.zeros_like(t_ref)
    for i in range(n):
        prod = a[i : i + 1, :] * b  # exact: both < 2^16
        t_ref[i : i + n, :] = t_ref[i : i + n, :] + (prod & 0xFFFF)
        t_ref[i + 1 : i + n + 1, :] = t_ref[i + 1 : i + n + 1, :] + (prod >> 16)
    # phase 2: 16-bit-radix Montgomery reduction
    for i in range(n):
        m = (t_ref[i : i + 1, :] * n0) & 0xFFFF
        q = m * p_limbs
        t_ref[i : i + n, :] = t_ref[i : i + n, :] + (q & 0xFFFF)
        t_ref[i + 1 : i + n + 1, :] = t_ref[i + 1 : i + n + 1, :] + (
            q >> 16
        )
        t_ref[i + 1 : i + 2, :] = t_ref[i + 1 : i + 2, :] + (
            t_ref[i : i + 1, :] >> 16
        )
    # phase 3: carry propagation over rows n..2n
    res = []
    carry = jnp.zeros((1, tb), jnp.uint32)
    for i in range(n, 2 * n + 1):
        s = t_ref[i : i + 1, :] + carry
        res.append(s & 0xFFFF)
        carry = s >> 16
    # phase 4: conditional subtract (value < 2m)
    borrow = jnp.zeros((1, tb), jnp.uint32)
    d = []
    for i in range(n):
        di = res[i] - p_limbs[i : i + 1, :] - borrow
        d.append(di & 0xFFFF)
        borrow = di >> 31
    rr = jnp.concatenate(res[:n], axis=0)
    dd = jnp.concatenate(d, axis=0)
    o_ref[:] = jnp.transpose(jnp.where(borrow == 0, dd, rr), (1, 0))


def _add_kernel(a_ref, b_ref, p_ref, o_ref, *, n, tb):
    a = jnp.transpose(a_ref[:], (1, 0))
    b = jnp.transpose(b_ref[:], (1, 0))
    p_limbs = p_ref[:]
    carry = jnp.zeros((1, tb), jnp.uint32)
    borrow = jnp.zeros((1, tb), jnp.uint32)
    s_rows, d_rows = [], []
    for i in range(n):
        s = a[i : i + 1, :] + b[i : i + 1, :] + carry
        limb = s & 0xFFFF
        carry = s >> 16
        di = limb - p_limbs[i : i + 1, :] - borrow
        d_rows.append(di & 0xFFFF)
        borrow = di >> 31
        s_rows.append(limb)
    ss = jnp.concatenate(s_rows, axis=0)
    dd = jnp.concatenate(d_rows, axis=0)
    o_ref[:] = jnp.transpose(jnp.where(borrow == 0, dd, ss), (1, 0))


def _sub_kernel(a_ref, b_ref, p_ref, o_ref, *, n, tb):
    a = jnp.transpose(a_ref[:], (1, 0))
    b = jnp.transpose(b_ref[:], (1, 0))
    p_limbs = p_ref[:]
    carry = jnp.zeros((1, tb), jnp.uint32)
    borrow = jnp.zeros((1, tb), jnp.uint32)
    d_rows, s_rows = [], []
    for i in range(n):
        di = a[i : i + 1, :] - b[i : i + 1, :] - borrow
        dl = di & 0xFFFF
        borrow = di >> 31
        s = dl + p_limbs[i : i + 1, :] + carry
        s_rows.append(s & 0xFFFF)
        carry = s >> 16
        d_rows.append(dl)
    dd = jnp.concatenate(d_rows, axis=0)
    ss = jnp.concatenate(s_rows, axis=0)
    o_ref[:] = jnp.transpose(jnp.where(borrow == 1, ss, dd), (1, 0))


def _conv_reduce(t_ref, a, b, p_limbs, n, tb, n0):
    """Montgomery product of transposed (n, TB) operands via the scratch
    ref; returns the canonical (n, TB) result rows as a value."""
    t_ref[:] = jnp.zeros_like(t_ref)
    for i in range(n):
        prod = a[i : i + 1, :] * b
        t_ref[i : i + n, :] = t_ref[i : i + n, :] + (prod & 0xFFFF)
        t_ref[i + 1 : i + n + 1, :] = t_ref[i + 1 : i + n + 1, :] + (prod >> 16)
    for i in range(n):
        m = (t_ref[i : i + 1, :] * n0) & 0xFFFF
        q = m * p_limbs
        t_ref[i : i + n, :] = t_ref[i : i + n, :] + (q & 0xFFFF)
        t_ref[i + 1 : i + n + 1, :] = t_ref[i + 1 : i + n + 1, :] + (q >> 16)
        t_ref[i + 1 : i + 2, :] = t_ref[i + 1 : i + 2, :] + (
            t_ref[i : i + 1, :] >> 16
        )
    res = []
    carry = jnp.zeros((1, tb), jnp.uint32)
    for i in range(n, 2 * n + 1):
        s = t_ref[i : i + 1, :] + carry
        res.append(s & 0xFFFF)
        carry = s >> 16
    return _cond_sub_rows(res[:n], p_limbs, n)


def _cond_sub_rows(rows, p_limbs, n):
    borrow = jnp.zeros_like(rows[0])
    d = []
    for i in range(n):
        di = rows[i] - p_limbs[i : i + 1, :] - borrow
        d.append(di & 0xFFFF)
        borrow = di >> 31
    rr = jnp.concatenate(rows, axis=0)
    dd = jnp.concatenate(d, axis=0)
    return jnp.where(borrow == 0, dd, rr)


def _add_rows(a, b, p_limbs, n, tb):
    """(n, TB) canonical + canonical -> canonical."""
    carry = jnp.zeros((1, tb), jnp.uint32)
    rows = []
    for i in range(n):
        s = a[i : i + 1, :] + b[i : i + 1, :] + carry
        rows.append(s & 0xFFFF)
        carry = s >> 16
    return _cond_sub_rows(rows, p_limbs, n)


def _sub_rows(a, b, p_limbs, n, tb):
    borrow = jnp.zeros((1, tb), jnp.uint32)
    carry = jnp.zeros((1, tb), jnp.uint32)
    d_rows, s_rows = [], []
    for i in range(n):
        di = a[i : i + 1, :] - b[i : i + 1, :] - borrow
        dl = di & 0xFFFF
        borrow = di >> 31
        s = dl + p_limbs[i : i + 1, :] + carry
        s_rows.append(s & 0xFFFF)
        carry = s >> 16
        d_rows.append(dl)
    dd = jnp.concatenate(d_rows, axis=0)
    ss = jnp.concatenate(s_rows, axis=0)
    return jnp.where(borrow == 1, ss, dd)


def _propagate_rows(a, n, tb):
    """(n, TB) lazy rows (< 2^17) -> canonical limb rows (value preserved,
    must fit n limbs)."""
    carry = jnp.zeros((1, tb), jnp.uint32)
    rows = []
    for i in range(n):
        s = a[i : i + 1, :] + carry
        rows.append(s & 0xFFFF)
        carry = s >> 16
    return jnp.concatenate(rows, axis=0)


def _fp2mul_kernel(a0_ref, a1_ref, b0_ref, b1_ref, p_ref, c0_ref, c1_ref,
                   t_ref, *, n, tb, n0):
    """Fused Karatsuba Fp2 multiply: 3 Montgomery products + combination in
    ONE kernel launch (replaces 2 adds + 1 stacked mul + 3 subs)."""
    a0 = jnp.transpose(a0_ref[:], (1, 0))
    a1 = jnp.transpose(a1_ref[:], (1, 0))
    b0 = jnp.transpose(b0_ref[:], (1, 0))
    b1 = jnp.transpose(b1_ref[:], (1, 0))
    p_limbs = p_ref[:]
    # operand sums: lazy a0+a1 has limbs < 2^17 -> normalize so conv products
    # stay exact (value < 2m < R is fine for the Montgomery bound)
    asum = _propagate_rows(a0 + a1, n, tb)
    bsum = _propagate_rows(b0 + b1, n, tb)
    v0 = _conv_reduce(t_ref, a0, b0, p_limbs, n, tb, n0)
    v1 = _conv_reduce(t_ref, a1, b1, p_limbs, n, tb, n0)
    v2 = _conv_reduce(t_ref, asum, bsum, p_limbs, n, tb, n0)
    c0 = _sub_rows(v0, v1, p_limbs, n, tb)
    c1 = _sub_rows(_sub_rows(v2, v0, p_limbs, n, tb), v1, p_limbs, n, tb)
    c0_ref[:] = jnp.transpose(c0, (1, 0))
    c1_ref[:] = jnp.transpose(c1, (1, 0))


def _fp2_mul_rows(t_ref, a0, a1, b0, b1, p_limbs, n, tb, n0):
    """Karatsuba Fp2 product on transposed (n, TB) rows -> (c0, c1)."""
    asum = _propagate_rows(a0 + a1, n, tb)
    bsum = _propagate_rows(b0 + b1, n, tb)
    v0 = _conv_reduce(t_ref, a0, b0, p_limbs, n, tb, n0)
    v1 = _conv_reduce(t_ref, a1, b1, p_limbs, n, tb, n0)
    v2 = _conv_reduce(t_ref, asum, bsum, p_limbs, n, tb, n0)
    c0 = _sub_rows(v0, v1, p_limbs, n, tb)
    c1 = _sub_rows(_sub_rows(v2, v0, p_limbs, n, tb), v1, p_limbs, n, tb)
    return c0, c1


def _fp6mul_kernel(*refs, n, tb, n0):
    """Fused Fp6 product: 6 Fp2 Karatsuba products (18 Montgomery muls) +
    the Toom combination, ONE launch.

    refs: a00,a01,a10,a11,a20,a21, b00,b01,b10,b11,b20,b21, p,
          c00,c01,c10,c11,c20,c21, scratch
    (aIJ = Fp6 coefficient I, Fp2 coordinate J)."""
    ins = refs[:12]
    p_ref = refs[12]
    outs = refs[13:19]
    t_ref = refs[19]
    A = [jnp.transpose(r[:], (1, 0)) for r in ins[:6]]
    B = [jnp.transpose(r[:], (1, 0)) for r in ins[6:12]]
    p_limbs = p_ref[:]

    def f2mul(ai, bi):
        return _fp2_mul_rows(
            t_ref, A[2 * ai], A[2 * ai + 1], B[2 * bi], B[2 * bi + 1],
            p_limbs, n, tb, n0,
        )

    def f2mul_sum(ai, aj, bi, bj):
        # (a_i + a_j) * (b_i + b_j) with lazy sums normalised first
        s0 = _propagate_rows(A[2 * ai] + A[2 * aj], n, tb)
        s1 = _propagate_rows(A[2 * ai + 1] + A[2 * aj + 1], n, tb)
        u0 = _propagate_rows(B[2 * bi] + B[2 * bj], n, tb)
        u1 = _propagate_rows(B[2 * bi + 1] + B[2 * bj + 1], n, tb)
        return _fp2_mul_rows(t_ref, s0, s1, u0, u1, p_limbs, n, tb, n0)

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


def _fp2sqr_kernel(a0_ref, a1_ref, p_ref, c0_ref, c1_ref, t_ref, *, n, tb, n0):
    """Fused Fp2 square: (a0+a1)(a0-a1) and 2 a0 a1 in ONE launch."""
    a0 = jnp.transpose(a0_ref[:], (1, 0))
    a1 = jnp.transpose(a1_ref[:], (1, 0))
    p_limbs = p_ref[:]
    s = _propagate_rows(a0 + a1, n, tb)          # < 2m, limbs canonical
    d = _sub_rows(a0, a1, p_limbs, n, tb)        # canonical
    re = _conv_reduce(t_ref, s, d, p_limbs, n, tb, n0)
    m = _conv_reduce(t_ref, a0, a1, p_limbs, n, tb, n0)
    im = _add_rows(m, m, p_limbs, n, tb)
    c0_ref[:] = jnp.transpose(re, (1, 0))
    c1_ref[:] = jnp.transpose(im, (1, 0))


class FieldKernels:
    """Pallas kernel set for one ModField."""

    def __init__(self, field, tile: int = 512):
        self.n = field.nlimb
        self.tile = tile
        self.n0 = int(field.n0)
        self.p_col = np.asarray(field.P_LIMBS).reshape(self.n, 1)

    def _call(self, kernel_fn, a, b, scratch: bool):
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
        out = pl.pallas_call(
            kernel_fn(tile),
            grid=(total // tile,),
            in_specs=[
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((total, n), jnp.uint32),
            scratch_shapes=(
                [pltpu.VMEM((2 * n + 8, tile), jnp.uint32)] if scratch else []
            ),
        )(aa, bb, jnp.asarray(self.p_col))
        if pad:
            out = out[:bsz]
        return out.reshape(lead + (n,))

    def mul(self, a, b):
        return self._call(
            lambda tile: functools.partial(_mul_kernel, n=self.n, tb=tile, n0=self.n0),
            a, b, scratch=True,
        )

    def add(self, a, b):
        return self._call(
            lambda tile: functools.partial(_add_kernel, n=self.n, tb=tile),
            a, b, scratch=False,
        )

    def sub(self, a, b):
        return self._call(
            lambda tile: functools.partial(_sub_kernel, n=self.n, tb=tile),
            a, b, scratch=False,
        )

    def fp2_sqr(self, a0, a1):
        """Fused Fp2 square -> (c0, c1)."""
        return self._fp2_call(
            _fp2sqr_kernel, [a0, a1]
        )

    def fp6_mul(self, a_coords, b_coords):
        """Fused Fp6 product: a_coords/b_coords are 6 limb tensors each
        (coefficient-major (c0.c0, c0.c1, c1.c0, c1.c1, c2.c0, c2.c1));
        returns 6 output tensors in the same layout."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n = self.n
        operands = list(a_coords) + list(b_coords)
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
        vec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            functools.partial(_fp6mul_kernel, n=n, tb=tile, n0=self.n0),
            grid=(total // tile,),
            in_specs=[vec] * 12
            + [pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=tuple([vec] * 6),
            out_shape=tuple(
                jax.ShapeDtypeStruct((total, n), jnp.uint32) for _ in range(6)
            ),
            scratch_shapes=[pltpu.VMEM((2 * n + 8, tile), jnp.uint32)],
        )(*ops, jnp.asarray(self.p_col))
        if pad:
            outs = [o[:bsz] for o in outs]
        return [o.reshape(lead + (n,)) for o in outs]

    def fp2_mul(self, a0, a1, b0, b1):
        """Fused Karatsuba Fp2 product -> (c0, c1); operands (..., n) with a
        common broadcastable shape."""
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
        c0, c1 = pl.pallas_call(
            functools.partial(kernel, n=n, tb=tile, n0=self.n0),
            grid=(total // tile,),
            in_specs=[vec_spec] * len(ops)
            + [pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=(vec_spec, vec_spec),
            out_shape=(
                jax.ShapeDtypeStruct((total, n), jnp.uint32),
                jax.ShapeDtypeStruct((total, n), jnp.uint32),
            ),
            scratch_shapes=[pltpu.VMEM((2 * n + 8, tile), jnp.uint32)],
        )(*ops, jnp.asarray(self.p_col))
        if pad:
            c0, c1 = c0[:bsz], c1[:bsz]
        return c0.reshape(lead + (n,)), c1.reshape(lead + (n,))
