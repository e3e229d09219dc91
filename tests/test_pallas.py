"""Pallas fused-kernel correctness in interpreter mode (CPU CI); the real
TPU integration is exercised by bench.py and the kernels are drop-in
replacements for ModField mul/add/sub on TPU backends."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from bls_verify_gadget_tpu.ops.pallas.kernels import FieldKernels
from bls_verify_gadget_tpu.ops.fp import FP, FR
from bls_verify_gadget_tpu import constants as C

rng = random.Random(0)
KFP = FieldKernels(FP, tile=128)
KFR = FieldKernels(FR, tile=128)


def _vals(n, mod):
    return [rng.randrange(mod) for _ in range(n)]


def test_mul_kernel_interpret():
    B = 130  # exercises the padding path
    xs, ys = _vals(B, C.P), _vals(B, C.P)
    ax, ay = jnp.asarray(FP.encode(xs)), jnp.asarray(FP.encode(ys))
    with pltpu.force_tpu_interpret_mode():
        out = KFP.mul(ax, ay)
    assert FP.decode(np.asarray(out)) == [(x * y) % C.P for x, y in zip(xs, ys)]


def test_add_sub_kernels_interpret():
    B = 64
    xs, ys = _vals(B, C.P), _vals(B, C.P)
    ax, ay = jnp.asarray(FP.encode(xs)), jnp.asarray(FP.encode(ys))
    with pltpu.force_tpu_interpret_mode():
        s = KFP.add(ax, ay)
        d = KFP.sub(ax, ay)
    assert FP.decode(np.asarray(s)) == [(x + y) % C.P for x, y in zip(xs, ys)]
    assert FP.decode(np.asarray(d)) == [(x - y) % C.P for x, y in zip(xs, ys)]


def test_edge_values_and_fr():
    es = [0, 1, C.P - 1, C.P - 2] * 32
    ae = jnp.asarray(FP.encode(es))
    with pltpu.force_tpu_interpret_mode():
        out = KFP.mul(ae, ae)
        s = KFP.add(ae, ae)
    assert FP.decode(np.asarray(out)) == [(e * e) % C.P for e in es]
    assert FP.decode(np.asarray(s)) == [(2 * e) % C.P for e in es]
    xr, yr = _vals(64, C.R), _vals(64, C.R)
    axr, ayr = jnp.asarray(FR.encode(xr)), jnp.asarray(FR.encode(yr))
    with pltpu.force_tpu_interpret_mode():
        out = KFR.mul(axr, ayr)
    assert FR.decode(np.asarray(out)) == [(x * y) % C.R for x, y in zip(xr, yr)]


def test_stacked_shapes():
    """(k, B, nlimb) stacked operands (the tower's layout)."""
    k, B = 3, 64
    xs = _vals(k * B, C.P)
    ys = _vals(k * B, C.P)
    ax = jnp.asarray(FP.encode(xs)).reshape(k, B, C.NLIMB)
    ay = jnp.asarray(FP.encode(ys)).reshape(k, B, C.NLIMB)
    with pltpu.force_tpu_interpret_mode():
        out = KFP.mul(ax, ay)
    got = FP.decode(np.asarray(out).reshape(k * B, C.NLIMB))
    assert got == [(x * y) % C.P for x, y in zip(xs, ys)]


def test_cyclo_sqr_kernel_interpret():
    """Fused Granger-Scott cyclotomic-square kernel vs golden, on genuine
    cyclotomic-subgroup elements (GS squaring is only valid there).  Uses
    the same fp12 <-> z coefficient permutation as tower.fp12_cyclotomic_sqr."""
    from bls_verify_gadget_tpu.golden import field as GF

    B = 6
    elems = []
    for _ in range(B):
        f = tuple(
            tuple((rng.randrange(1, C.P), rng.randrange(C.P)) for _ in range(3))
            for _ in range(2)
        )
        # project into the cyclotomic subgroup: g = f^((p^6-1)(p^2+1))
        g = GF.fp12_mul(GF.fp12_frob(f, 6), GF.fp12_inv(f))
        g = GF.fp12_mul(GF.fp12_frob(g, 2), g)
        elems.append(g)
    want = [GF.fp12_cyclotomic_sqr(g) for g in elems]

    def enc(sel):
        return jnp.asarray(FP.encode([sel(g) for g in elems]))

    # z-ordering from tower.fp12_cyclotomic_sqr: (a0, b1, b0, a2, a1, b2)
    zsel = [(0, 0), (1, 1), (1, 0), (0, 2), (0, 1), (1, 2)]
    coords = []
    for (i, j) in zsel:
        coords.append(enc(lambda g, i=i, j=j: g[i][j][0]))
        coords.append(enc(lambda g, i=i, j=j: g[i][j][1]))

    K = FieldKernels(FP, tile=128)
    with pltpu.force_tpu_interpret_mode():
        o = K.cyclo_sqr(coords)
    zn = [(FP.decode(np.asarray(o[2 * i])), FP.decode(np.asarray(o[2 * i + 1])))
          for i in range(6)]

    def fp2_at(zi, k):
        return (zn[zi][0][k], zn[zi][1][k])

    got = [
        ((fp2_at(0, k), fp2_at(4, k), fp2_at(3, k)),
         (fp2_at(2, k), fp2_at(1, k), fp2_at(5, k)))
        for k in range(B)
    ]
    assert got == want


def test_mxu_reduction_interpret():
    """The flag-gated MXU Montgomery reduction (config.mxu_reduce, default
    off — see utils/config.py for the v5e latency-wall measurements) stays
    semantically identical to merged CIOS."""
    K = FieldKernels(FP, tile=128)
    K.mxu = True
    B = 66
    xs, ys = _vals(B, C.P), _vals(B, C.P)
    edge = [0, 1, C.P - 1, C.P - 2]
    xs[:4], ys[:4] = edge, [C.P - 1] * 4
    ax, ay = jnp.asarray(FP.encode(xs)), jnp.asarray(FP.encode(ys))
    with pltpu.force_tpu_interpret_mode():
        out = K.mul(ax, ay)
        c0, c1 = K.fp2_sqr(ax, ay)
    assert FP.decode(np.asarray(out)) == [(x * y) % C.P for x, y in zip(xs, ys)]
    from bls_verify_gadget_tpu.golden import field as GF

    gots = list(zip(FP.decode(np.asarray(c0)), FP.decode(np.asarray(c1))))
    assert gots == [GF.fp2_sqr((x, y)) for x, y in zip(xs, ys)]


def test_fp2_kernels_interpret():
    """Fused fp2 mul/sqr kernels vs golden."""
    from bls_verify_gadget_tpu.golden import field as GF

    B = 66
    a2 = [(rng.randrange(C.P), rng.randrange(C.P)) for _ in range(B)]
    b2 = [(rng.randrange(C.P), rng.randrange(C.P)) for _ in range(B)]
    a0 = jnp.asarray(FP.encode([x[0] for x in a2]))
    a1 = jnp.asarray(FP.encode([x[1] for x in a2]))
    b0 = jnp.asarray(FP.encode([x[0] for x in b2]))
    b1 = jnp.asarray(FP.encode([x[1] for x in b2]))
    with pltpu.force_tpu_interpret_mode():
        c0, c1 = KFP.fp2_mul(a0, a1, b0, b1)
        s0, s1 = KFP.fp2_sqr(a0, a1)
    got = list(zip(FP.decode(np.asarray(c0)), FP.decode(np.asarray(c1))))
    assert got == [GF.fp2_mul(x, y) for x, y in zip(a2, b2)]
    gots = list(zip(FP.decode(np.asarray(s0)), FP.decode(np.asarray(s1))))
    assert gots == [GF.fp2_sqr(x) for x in a2]
