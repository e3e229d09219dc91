"""L0: batched modular limb arithmetic for TPU (jnp/XLA path).

Every op is batch-first over arbitrary leading dims on uint32 limb tensors
(..., nlimb), limbs canonical in [0, 2^16), values canonical in [0, m).
Field elements are kept in Montgomery form.  The same code serves Fp
(24 limbs) and Fr (16 limbs) via the ModField instances FP and FR.

Design notes (TPU-first):
  * 16-bit limbs make every 32x32 VPU multiply exact (products < 2^32) and
    column accumulations stay < 2^23, so no 64-bit integers are ever needed
    (TPUs have no vector u64).
  * The sequential per-limb chains (convolution, Montgomery reduction, carry
    propagation) run under lax.scan so the traced graph per field-mul is a
    few dozen equations — a full pairing stays traceable.  The batch axis
    keeps the VPU wide regardless.
  * Fused Pallas kernels (mul/add/sub) live in ops/pallas/kernels.py and
    are dispatched automatically on TPU backends; this module is the
    portable fallback, the CPU test path, and the reference the kernels are
    differential-tested against.

Parity: replaces ark-ff Fp384/Fr Montgomery arithmetic
(reference Cargo.toml:17, src/bls.rs:10,60, src/hasher.rs:7).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import constants as C
from .limbs import int_to_limbs, ints_to_limbs, limbs_to_int

MASK = jnp.uint32(C.LIMB_MASK)
BITS = C.LIMB_BITS


def _pad_last(x, lo, hi):
    cfg = [(0, 0)] * (x.ndim - 1) + [(lo, hi)]
    return jnp.pad(x, cfg)


class ModField:
    """Montgomery arithmetic mod `modulus` with nlimb 16-bit limbs."""

    def __init__(self, modulus: int, nlimb: int):
        self.modulus = modulus
        self.nlimb = nlimb
        self.mont_r = 1 << (BITS * nlimb)
        # R > m gives the mont_mul output bound < 2m for canonical inputs.
        assert self.mont_r > modulus
        self.n0 = jnp.uint32((-pow(modulus, -1, 1 << BITS)) % (1 << BITS))
        self.P_LIMBS = jnp.asarray(int_to_limbs(modulus, nlimb))
        self.R_MOD = jnp.asarray(int_to_limbs(self.mont_r % modulus, nlimb))
        self.R2 = jnp.asarray(int_to_limbs(self.mont_r**2 % modulus, nlimb))
        self.R3 = jnp.asarray(int_to_limbs(self.mont_r**3 % modulus, nlimb))
        self.ZERO = jnp.zeros((nlimb,), jnp.uint32)
        self.ONE = self.R_MOD  # Montgomery form of 1
        self._kernels = None

    # ------------------------------------------------------------------
    # fused Pallas kernels (TPU backends): drop-in replacements for
    # mul/add/sub with identical canonical semantics
    # ------------------------------------------------------------------

    @property
    def kernels(self):
        if self._kernels is None:
            from .pallas.kernels import FieldKernels
            from ..utils.config import config

            self._kernels = FieldKernels(self, tile=config.pallas_tile)
        return self._kernels

    def _use_pallas(self) -> bool:
        from ..utils.config import config

        if not config.use_pallas:
            return False
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False

    def _record(self, kind: str, a, b):
        """Trace-time op accounting (utils/profiling.count_ops): counts the
        number of logical scalar field ops = broadcasted batch elements."""
        from ..utils import profiling

        if profiling._active_counter is not None:
            shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
            profiling.record(
                f"{kind}_{self.nlimb}", int(np.prod(shape, dtype=np.int64))
            )

    # ------------------------------------------------------------------
    # host conversions
    # ------------------------------------------------------------------

    def encode(self, xs):
        """Host ints -> Montgomery limb tensor (numpy, device-ready)."""
        if isinstance(xs, int):
            return int_to_limbs(xs % self.modulus * self.mont_r % self.modulus, self.nlimb)
        return ints_to_limbs(
            [x % self.modulus * self.mont_r % self.modulus for x in xs], self.nlimb
        )

    def decode(self, limbs):
        """Montgomery limb tensor -> host ints (nested lists)."""
        arr = np.asarray(limbs)
        rinv = pow(self.mont_r, -1, self.modulus)

        def rec(a):
            if a.ndim == 1:
                return limbs_to_int(a) * rinv % self.modulus
            return [rec(row) for row in a]

        return rec(arr)

    # ------------------------------------------------------------------
    # carry machinery (lax.scan over the limb axis)
    # ------------------------------------------------------------------

    def _propagate(self, cols):
        """(..., k) columns possibly >= 2^16 -> canonical limbs (same k).
        Caller guarantees the represented value fits in k limbs."""
        xs = jnp.moveaxis(cols, -1, 0)
        carry0 = jnp.zeros(cols.shape[:-1], jnp.uint32)

        def body(carry, col):
            s = col + carry
            return s >> BITS, s & MASK

        _, out = lax.scan(body, carry0, xs)
        return jnp.moveaxis(out, 0, -1)

    def _sub_borrow(self, a, b):
        """a - b limbwise; returns (limbs mod 2^(16k), final borrow 0/1)."""
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        xs = (jnp.moveaxis(a, -1, 0), jnp.moveaxis(b, -1, 0))
        borrow0 = jnp.zeros(shape[:-1], jnp.uint32)

        def body(borrow, ab):
            ai, bi = ab
            d = ai - bi - borrow
            return d >> 31, d & MASK  # sign bit is the borrow (|d| < 2^31)

        borrow, out = lax.scan(body, borrow0, xs)
        return jnp.moveaxis(out, 0, -1), borrow

    def _cond_sub_mod(self, s):
        """Reduce s in [0, 2m) to [0, m) with one conditional subtract."""
        d, borrow = self._sub_borrow(s, self.P_LIMBS)
        return jnp.where((borrow == 0)[..., None], d, s)

    # ------------------------------------------------------------------
    # ring ops
    # ------------------------------------------------------------------

    def add(self, a, b):
        """a + b mod m in ONE fused scan: carry-propagate the sum and
        subtract m with borrow in the same pass, then select."""
        self._record("add", a, b)
        if self._use_pallas():
            return self.kernels.add(a, b)
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        xs = (jnp.moveaxis(a, -1, 0), jnp.moveaxis(b, -1, 0), self.P_LIMBS)
        zero = jnp.zeros(shape[:-1], jnp.uint32)

        def body(cb, x):
            c, br = cb
            ai, bi, pi = x
            s = ai + bi + c
            limb = s & MASK
            d = limb - pi - br
            return (s >> BITS, d >> 31), (limb, d & MASK)

        (_, borrow), (limbs, dls) = lax.scan(body, (zero, zero), xs)
        limbs = jnp.moveaxis(limbs, 0, -1)
        dls = jnp.moveaxis(dls, 0, -1)
        return jnp.where((borrow == 0)[..., None], dls, limbs)

    def sub(self, a, b):
        """a - b mod m in ONE fused scan: subtract with borrow and add m
        with carry in the same pass, then select on the final borrow."""
        self._record("sub", a, b)
        if self._use_pallas():
            return self.kernels.sub(a, b)
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        xs = (jnp.moveaxis(a, -1, 0), jnp.moveaxis(b, -1, 0), self.P_LIMBS)
        zero = jnp.zeros(shape[:-1], jnp.uint32)

        def body(bc, x):
            br, c = bc
            ai, bi, pi = x
            d = ai - bi - br
            dl = d & MASK
            s = dl + pi + c
            return (d >> 31, s >> BITS), (dl, s & MASK)

        (borrow, _), (dls, sls) = lax.scan(body, (zero, zero), xs)
        dls = jnp.moveaxis(dls, 0, -1)
        sls = jnp.moveaxis(sls, 0, -1)
        return jnp.where((borrow == 1)[..., None], sls, dls)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def mul(self, a, b):
        """Montgomery product a*b*R^-1 mod m; canonical in/out.  TWO scans:

        1. merged CIOS: per limb i of a, accumulate a_i*b and the Montgomery
           reduction step into a sliding (n+1)-column window (columns stay
           < 2^23, so uint32 never overflows);
        2. fused tail: carry-propagate and conditional-subtract in one pass.

        On TPU backends the fused Pallas kernel replaces this whole pipeline
        with a single dispatch (ops/pallas/kernels.py).
        """
        self._record("mul", a, b)
        if self._use_pallas():
            return self.kernels.mul(a, b)
        n = self.nlimb
        shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.broadcast_to(a, shape + (n,))
        b = jnp.broadcast_to(b, shape + (n,))
        t0 = jnp.zeros(shape + (n + 1,), jnp.uint32)
        a_t = jnp.moveaxis(a, -1, 0)

        def cios_body(t, ai):
            prod = ai[..., None] * b  # exact: both < 2^16
            t = t + _pad_last(prod & MASK, 0, 1) + _pad_last(prod >> BITS, 1, 0)
            m = (t[..., 0] * self.n0) & MASK
            q = m[..., None] * self.P_LIMBS
            t = t + _pad_last(q & MASK, 0, 1) + _pad_last(q >> BITS, 1, 0)
            carry = t[..., 0] >> BITS  # column 0 is now 0 mod 2^16
            t = jnp.concatenate(
                [t[..., 1:], jnp.zeros_like(t[..., :1])], axis=-1
            )
            t = t.at[..., 0].add(carry)
            return t, None

        t, _ = lax.scan(cios_body, t0, a_t)

        # fused propagate + conditional subtract over n+1 columns (p padded
        # with a zero top limb; the top column always propagates to 0)
        p_pad = jnp.concatenate([self.P_LIMBS, jnp.zeros((1,), jnp.uint32)])
        zero = jnp.zeros(shape, jnp.uint32)

        def tail_body(cb, x):
            c, br = cb
            ti, pi = x
            s = ti + c
            limb = s & MASK
            d = limb - pi - br
            return (s >> BITS, d >> 31), (limb, d & MASK)

        (_, borrow), (limbs, dls) = lax.scan(
            tail_body, (zero, zero), (jnp.moveaxis(t, -1, 0), p_pad)
        )
        limbs = jnp.moveaxis(limbs, 0, -1)[..., :n]
        dls = jnp.moveaxis(dls, 0, -1)[..., :n]
        return jnp.where((borrow == 0)[..., None], dls, limbs)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        """a * k for a small host constant (0 < k < 8, so a*k < 2^384)."""
        assert 0 < k < 8
        r = self._propagate(a * jnp.uint32(k))
        for _ in range(k - 1):
            r = self._cond_sub_mod(r)
        return r

    def cmov(self, cond, a, b):
        return jnp.where(cond[..., None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def to_mont(self, x):
        return self.mul(x, self.R2)

    def from_mont(self, x):
        one = jnp.zeros_like(x).at[..., 0].set(1)
        return self.mul(x, one)

    # ------------------------------------------------------------------
    # exponentiation over constant exponents
    # ------------------------------------------------------------------

    def pow_const(self, a, exponent: int):
        """a^exponent (Montgomery in/out) for a host-constant exponent.

        4-bit windowed: precompute a^0..a^15, then scan windows MSB-first
        with 4 squarings + one table-selected multiply — ~2x fewer multiplies
        and kernel launches than bitwise square-and-cmov-multiply."""
        if exponent == 0:
            return jnp.broadcast_to(self.ONE, a.shape)
        w = 4
        nwin = (exponent.bit_length() + w - 1) // w
        digits = [(exponent >> (w * i)) & 15 for i in range(nwin)][::-1]

        from ..utils.config import config

        if self._use_pallas() and config.fuse_pow:
            # whole chain (table build + all windows) in ONE launch
            return self.kernels.pow_win([a], 1, digits)[0]
        # table[i] = a^i, stacked (16, ..., n)
        tab = [jnp.broadcast_to(self.ONE, a.shape), a]
        for i in range(2, 16):
            tab.append(self.mul(tab[i - 1], a))
        table = jnp.stack(tab)
        dig_arr = jnp.asarray(np.array(digits, np.uint32))
        one = jnp.broadcast_to(self.ONE, a.shape)

        def body(f, d):
            for _ in range(w):
                f = self.mul(f, f)
            sel = table[d]  # dynamic gather over the leading table axis
            f = self.mul(f, sel)
            return f, None

        f, _ = jax.lax.scan(body, one, dig_arr)
        return f

    def inv(self, a):
        """a^-1 via Fermat; 0 -> 0 (gadget-friendly semantics)."""
        return self.pow_const(a, self.modulus - 2)

    def sqrt_3mod4(self, a):
        """Candidate sqrt a^((m+1)/4); valid iff its square equals a."""
        return self.pow_const(a, (self.modulus + 1) // 4)


FP = ModField(C.P, C.NLIMB)
FR = ModField(C.R, C.NLIMB_FR)
