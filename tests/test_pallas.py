"""Pallas fused-kernel correctness in interpreter mode (CPU CI); the real
TPU integration is exercised by bench.py and the kernels are drop-in
replacements for ModField mul/add/sub on TPU backends.

Tiering: interpret-mode kernels compile as full CPU XLA programs, and the
big fused bodies (fp12 products, Miller runs, whole ladders/pow chains)
are multi-minute compiles on a 4-vCPU host — those carry
@pytest.mark.heavy.  The default tier keeps the cheap scalar/fp2 kernel
differentials; full fused-kernel coverage runs in the heavy tier and in
the on-hardware battery (tools/tpu_selftest.py)."""

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


@pytest.mark.heavy
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


def test_cios_fallback_interpret():
    """The original padded-window merged CIOS (the conservative fallback
    behind the promoted cios_v3 default, BLS_TPU_CIOS_V3=0) stays
    semantically identical to the default variant."""
    K = FieldKernels(FP, tile=128)
    K.variant = "cios"
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


def _rand_fp12(b):
    return [
        tuple(
            tuple((rng.randrange(C.P), rng.randrange(C.P)) for _ in range(3))
            for _ in range(2)
        )
        for _ in range(b)
    ]


def _enc12(elems):
    """fp12 python elements -> 12 coord tensors (coefficient-major)."""
    out = []
    for i in range(2):
        for j in range(3):
            for k in range(2):
                out.append(
                    jnp.asarray(FP.encode([g[i][j][k] for g in elems]))
                )
    return out


def _dec12(o, b):
    cols = [FP.decode(np.asarray(x)) for x in o]
    return [
        tuple(
            tuple((cols[6 * i + 2 * j][t], cols[6 * i + 2 * j + 1][t]) for j in range(3))
            for i in range(2)
        )
        for t in range(b)
    ]


@pytest.mark.heavy
def test_fp12_mul_sqr_kernels_interpret():
    """Fused full Fp12 product / generic square kernels vs golden."""
    from bls_verify_gadget_tpu.golden import field as GF

    B = 6
    xs, ys = _rand_fp12(B), _rand_fp12(B)
    K = FieldKernels(FP, tile=128)
    with pltpu.force_tpu_interpret_mode():
        om = K.fp12_mul(_enc12(xs) + _enc12(ys))
        os_ = K.fp12_sqr(_enc12(xs))
    assert _dec12(om, B) == [GF.fp12_mul(x, y) for x, y in zip(xs, ys)]
    assert _dec12(os_, B) == [GF.fp12_sqr(x) for x in xs]


@pytest.mark.heavy
def test_mul014_kernel_interpret():
    """Fused sparse 014 multiply vs golden full fp12 product against the
    materialised sparse element (c0 + c1 v + c4 v w)."""
    from bls_verify_gadget_tpu.golden import field as GF

    B = 5
    fs = _rand_fp12(B)
    lines = [
        tuple(tuple(rng.randrange(C.P) for _ in range(2)) for _ in range(3))
        for _ in range(B)
    ]
    want = []
    for f, (c0, c1, c4) in zip(fs, lines):
        z2 = (0, 0)
        sparse = ((c0, c1, z2), (z2, c4, z2))
        want.append(GF.fp12_mul(f, sparse))
    coords = _enc12(fs)
    for j in range(3):  # c0, c1, c4
        for k in range(2):
            coords.append(
                jnp.asarray(FP.encode([ln[j][k] for ln in lines]))
            )
    K = FieldKernels(FP, tile=128)
    with pltpu.force_tpu_interpret_mode():
        o = K.mul014(coords)
    assert _dec12(o, B) == want


@pytest.mark.heavy
def test_miller_step_kernels_interpret():
    """Fused Miller dbl/add step kernels vs the stacked jnp steps
    (pairing._dbl_step/_add_step with fusion off), on genuine G2 points."""
    from bls_verify_gadget_tpu.golden import bls as gbls
    from bls_verify_gadget_tpu.ops import pairing as PR
    from bls_verify_gadget_tpu.utils.config import config

    B = 4
    sks = [rng.randrange(1, C.R) for _ in range(B)]
    qs = [gbls.sign(sk, b"step kernel test") for sk in sks]  # affine G2
    pks = [gbls.sk_to_pk(sk) for sk in sks]  # affine G1

    def enc2(sel):
        return jnp.asarray(FP.encode([sel(q) for q in qs]))

    xq = (enc2(lambda q: q[0][0]), enc2(lambda q: q[0][1]))
    yq = (enc2(lambda q: q[1][0]), enc2(lambda q: q[1][1]))
    one2 = (
        jnp.asarray(FP.encode([1] * B)),
        jnp.asarray(FP.encode([0] * B)),
    )
    xp = jnp.asarray(FP.encode([p[0] for p in pks]))
    yp = jnp.asarray(FP.encode([p[1] for p in pks]))
    t0 = (xq, yq, one2)

    old = config.fuse_steps
    config.fuse_steps = False
    try:
        (tj, linej) = PR._dbl_step(t0, xp, yp)
        (taj, lineaj) = PR._add_step(tj, (xq, yq), xp, yp)
    finally:
        config.fuse_steps = old

    K = FieldKernels(FP, tile=128)
    with pltpu.force_tpu_interpret_mode():
        o = K.dbl_step(
            [xq[0], xq[1], yq[0], yq[1], one2[0], one2[1], xp, yp]
        )
        tk = ((o[0], o[1]), (o[2], o[3]), (o[4], o[5]))
        oa = K.add_step(
            [tk[0][0], tk[0][1], tk[1][0], tk[1][1], tk[2][0], tk[2][1],
             xq[0], xq[1], yq[0], yq[1], xp, yp]
        )

    def flat(t, line):
        xs = []
        for f2 in list(t) + list(line):
            xs += [f2[0], f2[1]]
        return xs

    want_d = flat(tj, linej)
    for got, want in zip(o, want_d):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    want_a = flat(taj, lineaj)
    for got, want in zip(oa, want_a):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.heavy
def test_pt_kernels_interpret():
    """Fused Jacobian double/add kernels (G1 fp and G2 fp2 coords) vs the
    jnp curve ops, covering the generic case plus every cmov edge case
    (P==Q doubling, P==-Q infinity, P or Q at infinity)."""
    from bls_verify_gadget_tpu.golden import bls as gbls
    from bls_verify_gadget_tpu.ops import curve as CV

    sks = [rng.randrange(1, C.R) for _ in range(4)]
    g1s = [gbls.sk_to_pk(sk) for sk in sks]
    g2s = [gbls.sign(sk, b"pt kernel test") for sk in sks]

    for name, ops, enc, pts in (
        ("fp", CV.FP_OPS, CV.g1_encode_batch, g1s),
        ("fp2", CV.FP2_OPS, CV.g2_encode_batch, g2s),
    ):
        # P rows: [P0, P1, P2, inf, P3]; Q rows: [P1, P1, -P1, P0, inf]
        if name == "fp":
            neg = lambda p: (p[0], C.P - p[1])
        else:
            neg = lambda p: (p[0], (C.P - p[1][0], (C.P - p[1][1]) % C.P))
        P = enc([pts[0], pts[1], pts[2], None, pts[3]])
        Q = enc([pts[1], pts[1], neg(pts[2]), pts[0], None])
        # make Z non-trivial on the P side: double via the jnp path
        P = CV.pt_double(ops, P)
        Qd = CV.pt_double(ops, Q)
        want_d = CV.pt_double(ops, P)
        want_a = CV.pt_add(ops, P, Qd)

        K = FieldKernels(FP, tile=128)
        with pltpu.force_tpu_interpret_mode():
            od = K.pt_dbl(CV._fused_pt_coords(ops, [P]), name)
            oa = K.pt_add(CV._fused_pt_coords(ops, [P, Qd]), name)
        got_d = CV._fused_pt_unflat(ops, od)
        got_a = CV._fused_pt_unflat(ops, oa)

        for got, want in ((got_d, want_d), (got_a, want_a)):
            gf = CV._fused_pt_coords(ops, [got])
            wf = CV._fused_pt_coords(ops, [want])
            for g, w in zip(gf, wf):
                np.testing.assert_array_equal(
                    np.asarray(g), np.asarray(w), err_msg=name
                )

@pytest.mark.heavy
def test_cyclo_sqr_multi_interpret():
    """cyclo_sqr with count > 1 (fori_loop inside the kernel) == count
    successive golden Granger-Scott squares, on genuine cyclotomic
    elements."""
    from bls_verify_gadget_tpu.golden import field as GF

    elems = []
    for _ in range(2):
        f = tuple(
            tuple((rng.randrange(1, C.P), rng.randrange(C.P)) for _ in range(3))
            for _ in range(2)
        )
        g = GF.fp12_mul(GF.fp12_frob(f, 6), GF.fp12_inv(f))
        g = GF.fp12_mul(GF.fp12_frob(g, 2), g)
        elems.append(g)
    zsel = [(0, 0), (1, 1), (1, 0), (0, 2), (0, 1), (1, 2)]
    zc = []
    for (i, j) in zsel:
        zc.append(jnp.asarray(FP.encode([g[i][j][0] for g in elems])))
        zc.append(jnp.asarray(FP.encode([g[i][j][1] for g in elems])))
    K = FieldKernels(FP, tile=128)
    with pltpu.force_tpu_interpret_mode():
        o = K.cyclo_sqr(zc, count=3)
    zn = [
        (FP.decode(np.asarray(o[2 * i])), FP.decode(np.asarray(o[2 * i + 1])))
        for i in range(6)
    ]

    def fp2_at(zi, k):
        return (zn[zi][0][k], zn[zi][1][k])

    got = [
        ((fp2_at(0, k), fp2_at(4, k), fp2_at(3, k)),
         (fp2_at(2, k), fp2_at(1, k), fp2_at(5, k)))
        for k in range(len(elems))
    ]
    want = []
    for g in elems:
        for _ in range(3):
            g = GF.fp12_cyclotomic_sqr(g)
        want.append(g)
    assert got == want


@pytest.mark.heavy
def test_pt_dbl_multi_interpret():
    """pt_dbl with count > 1 (fori_loop in-kernel) == count successive jnp
    pt_double calls."""
    from bls_verify_gadget_tpu.golden import bls as gbls
    from bls_verify_gadget_tpu.ops import curve as CV

    g2s = [gbls.sign(rng.randrange(1, C.R), b"pt run test") for _ in range(3)]
    P = CV.g2_encode_batch(g2s + [None])
    want = P
    for _ in range(4):
        want = CV.pt_double(CV.FP2_OPS, want)
    K = FieldKernels(FP, tile=128)
    with pltpu.force_tpu_interpret_mode():
        o = K.pt_dbl(CV._fused_pt_coords(CV.FP2_OPS, [P]), "fp2", count=4)
    got = CV._fused_pt_unflat(CV.FP2_OPS, o)
    for g, w in zip(
        CV._fused_pt_coords(CV.FP2_OPS, [got]),
        CV._fused_pt_coords(CV.FP2_OPS, [want]),
    ):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.heavy
def test_miller_run_kernels_interpret():
    """Fused Miller RUN kernels (miller_dbl_run with an SMEM run length +
    miller_add) vs the jnp path: count iterations of [f = f^2; per-pair
    dbl_step + neutralised mul_by_014], then one addition block — on
    genuine points, with a mixed valid mask exercising neutralisation."""
    from bls_verify_gadget_tpu.golden import bls as gbls
    from bls_verify_gadget_tpu.ops import pairing as PR, tower as T
    from bls_verify_gadget_tpu.utils.config import config

    B, k, count = 4, 2, 3
    sks = [rng.randrange(1, C.R) for _ in range(B)]
    g2s = [gbls.sign(sk, b"miller run test") for sk in sks]
    g1s = [gbls.sk_to_pk(sk) for sk in sks]

    def enc_fp2(sel):
        return (
            jnp.asarray(FP.encode([sel(q)[0] for q in g2s])),
            jnp.asarray(FP.encode([sel(q)[1] for q in g2s])),
        )

    qs, xps, yps, valids = [], [], [], []
    for i in range(k):
        qs.append((enc_fp2(lambda q: q[0]), enc_fp2(lambda q: q[1])))
        xps.append(jnp.asarray(FP.encode([p[0] for p in g1s])))
        yps.append(jnp.asarray(FP.encode([p[1] for p in g1s])))
        valids.append(jnp.asarray([(j + i) % 3 != 0 for j in range(B)]))

    f0 = T._unflat12(
        [jnp.asarray(FP.encode([rng.randrange(C.P) for _ in range(B)]))
         for _ in range(12)]
    )

    # jnp reference (fusion off on CPU by default)
    old = config.fuse_steps
    config.fuse_steps = False
    try:
        f = f0
        ts = [(q[0], q[1], T.fp2_one_like(q[0])) for q in qs]
        for _ in range(count):
            f = T.fp12_sqr(f)
            for i in range(k):
                tn, line = PR._dbl_step(ts[i], xps[i], yps[i])
                l0, l1, l4 = PR._neutral_line(*line, valids[i])
                f = PR.fp12_mul_by_014(f, l0, l1, l4)
                ts[i] = tn
        for i in range(k):
            tn, line = PR._add_step(ts[i], qs[i], xps[i], yps[i])
            l0, l1, l4 = PR._neutral_line(*line, valids[i])
            f = PR.fp12_mul_by_014(f, l0, l1, l4)
            ts[i] = tn
    finally:
        config.fuse_steps = old

    K = FieldKernels(FP, tile=128)
    v_u32 = [v.astype(jnp.uint32)[..., None] for v in valids]
    with pltpu.force_tpu_interpret_mode():
        coords = T._flat12(f0)
        tk = [(q[0], q[1], T.fp2_one_like(q[0])) for q in qs]
        for i in range(k):
            X, Y, Z = tk[i]
            coords += [X[0], X[1], Y[0], Y[1], Z[0], Z[1],
                       xps[i], yps[i], v_u32[i]]
        o = K.miller_dbl_run(coords, k, count)
        fk, tks = o[:12], o[12:]
        coords = list(fk)
        for i in range(k):
            coords += list(tks[6 * i : 6 * i + 6])
            coords += [qs[i][0][0], qs[i][0][1], qs[i][1][0], qs[i][1][1],
                       xps[i], yps[i], v_u32[i]]
        oa = K.miller_add(coords, k)

    want = T._flat12(f)
    for i in range(k):
        X, Y, Z = ts[i]
        want += [X[0], X[1], Y[0], Y[1], Z[0], Z[1]]
    for got_a, want_a in zip(oa, want):
        np.testing.assert_array_equal(np.asarray(got_a), np.asarray(want_a))


@pytest.mark.heavy
def test_expx_kernel_interpret():
    """Fused exp-by-|x| kernel vs the jnp squaring/multiply sequence —
    both compute the identical operation sequence from f = m over the
    MSB-first bits, so the comparison is bit-exact."""
    from bls_verify_gadget_tpu.ops import pairing as PR, tower as T

    B = 4
    m = T._unflat12(
        [jnp.asarray(FP.encode([rng.randrange(C.P) for _ in range(B)]))
         for _ in range(12)]
    )
    bits = PR._ABS_X_BITS_MSB

    # jnp reference (CPU fallback paths)
    f = m
    for bit in bits[1:]:
        f = T.fp12_cyclotomic_sqr(f)
        if bit:
            f = T.fp12_mul(f, m)

    segs, run = [], 0
    for bit in bits[1:]:
        run += 1
        if bit:
            segs.append((run, 1))
            run = 0
    if run:
        segs.append((run, 0))
    K = FieldKernels(FP, tile=128)
    with pltpu.force_tpu_interpret_mode():
        o = K.exp_x(T._flat12(m), segs)
    for got, want in zip(o, T._flat12(f)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.heavy
def test_pt_mul_const_kernel_interpret():
    """Fused whole-ladder constant-scalar multiply vs golden, including an
    infinity input riding through the complete add/dbl bodies."""
    from bls_verify_gadget_tpu.golden import bls as gbls, curve as gc
    from bls_verify_gadget_tpu.ops import curve as CV

    g2s = [gbls.sign(rng.randrange(1, C.R), b"ladder kernel test")
           for _ in range(3)]
    P = CV.g2_encode_batch(g2s + [None])
    scalar = C.ABS_X
    bits = bin(scalar)[2:]
    segs, run = [], 0
    for bit in bits[1:]:
        run += 1
        if bit == "1":
            segs.append((run, 1))
            run = 0
    if run:
        segs.append((run, 0))
    K = FieldKernels(FP, tile=128)
    with pltpu.force_tpu_interpret_mode():
        o = K.pt_mul_const(CV._fused_pt_coords(CV.FP2_OPS, [P]), "fp2", segs)
    got = CV.g2_decode(CV._fused_pt_unflat(CV.FP2_OPS, o))
    want = [gc.g2_mul(q, scalar) for q in g2s] + [None]
    assert got == want


@pytest.mark.heavy
def test_pt_mul_var_kernel_interpret():
    """Fused whole-ladder variable-scalar multiply vs golden: per-element
    scalars including 0 (infinity result) and 1."""
    from bls_verify_gadget_tpu.golden import bls as gbls, curve as gc
    from bls_verify_gadget_tpu.ops import curve as CV
    from bls_verify_gadget_tpu.ops.limbs import ints_to_limbs

    g1s = [gbls.sk_to_pk(rng.randrange(1, C.R)) for _ in range(4)]
    P = CV.g1_encode_batch(g1s)
    ks = [0, 1, rng.randrange(C.R), C.R - 1]
    s = jnp.asarray(ints_to_limbs(ks, C.NLIMB_FR))
    K = FieldKernels(FP, tile=128)
    with pltpu.force_tpu_interpret_mode():
        o = K.pt_mul_var(
            CV._fused_pt_coords(CV.FP_OPS, [P]), "fp", s, 255
        )
    got = CV.g1_decode(CV._fused_pt_unflat(CV.FP_OPS, o))
    want = [gc.g1_mul(p, k) if k else None for p, k in zip(g1s, ks)]
    assert got == want


@pytest.mark.heavy
def test_pow_win_kernel_interpret():
    """Fused whole-chain windowed pow vs python pow, Fp and Fp2."""
    from bls_verify_gadget_tpu.golden import field as GF

    B = 4
    xs = [0, 1, rng.randrange(C.P), C.P - 1]
    exp = (C.P + 1) // 4
    digits = []
    e = exp
    while e:
        digits.append(e & 15)
        e >>= 4
    digits = digits[::-1]
    K = FieldKernels(FP, tile=128)
    ax = jnp.asarray(FP.encode(xs))
    with pltpu.force_tpu_interpret_mode():
        o = K.pow_win([ax], 1, digits)
    assert FP.decode(np.asarray(o[0])) == [pow(x, exp, C.P) for x in xs]

    a2 = [(rng.randrange(C.P), rng.randrange(C.P)) for _ in range(B)]
    exp2 = (C.P * C.P + 7) // 16
    dig2, e = [], exp2
    while e:
        dig2.append(e & 15)
        e >>= 4
    dig2 = dig2[::-1]
    a0 = jnp.asarray(FP.encode([x[0] for x in a2]))
    a1 = jnp.asarray(FP.encode([x[1] for x in a2]))
    with pltpu.force_tpu_interpret_mode():
        o = K.pow_win([a0, a1], 2, dig2)
    got = list(zip(FP.decode(np.asarray(o[0])), FP.decode(np.asarray(o[1]))))
    want = []
    for x in a2:
        r = (1, 0)
        for bit in bin(exp2)[2:]:
            r = GF.fp2_sqr(r)
            if bit == "1":
                r = GF.fp2_mul(r, x)
        want.append(r)
    assert got == want


def test_fused_chain_smoke_default_tier():
    """Default-tier smoke for the whole-chain kernel family (ADVICE r4 #2):
    one SHORT pow chain (nwin=8 override, the production-default fused path)
    and one 2-iteration cyclo-free doubling run differential — so the cheap
    tier exercises the SMEM-run-structure machinery, while full-width
    coverage stays in the heavy tier and the hardware battery."""
    B = 8
    xs = [0, 1, C.P - 1] + _vals(B - 3, C.P)
    exp = 0xDEADBEEF12345  # 52-bit: 13 digits, padded to 16 windows
    digits = []
    e = exp
    while e:
        digits.append(e & 15)
        e >>= 4
    digits = digits[::-1]
    K = FieldKernels(FP, tile=128)
    ax = jnp.asarray(FP.encode(xs))
    with pltpu.force_tpu_interpret_mode():
        o = K.pow_win([ax], 1, digits, nwin=16)
    assert FP.decode(np.asarray(o[0])) == [pow(x, exp, C.P) for x in xs]

    # 2-iteration G1 doubling run: the count_scalar SMEM fori_loop path
    from bls_verify_gadget_tpu.golden import curve as gc

    pts = [gc.g1_mul(C.G1_GEN, k + 1) for k in range(B)]
    coords = [
        jnp.asarray(FP.encode([p[0] for p in pts])),
        jnp.asarray(FP.encode([p[1] for p in pts])),
        jnp.asarray(FP.encode([1] * B)),
    ]
    with pltpu.force_tpu_interpret_mode():
        o = K.pt_dbl(coords, "fp", count=2)
    got_x = FP.decode(np.asarray(o[0]))
    got_y = FP.decode(np.asarray(o[1]))
    got_z = FP.decode(np.asarray(o[2]))
    for k, p in enumerate(pts):
        want = gc.g1_mul(p, 4)
        zi = pow(got_z[k], -1, C.P)
        assert (got_x[k] * zi * zi % C.P,
                got_y[k] * zi * zi * zi % C.P) == want


@pytest.mark.heavy
def test_sswu_map2_kernel_interpret():
    """Fused whole-map hash kernel (both SSWU maps + isogeny + point sum)
    vs the jnp device path, LIMB-EXACT: the kernel mirrors the unfused
    formulas (fraction-form SSWU resolves to the same canonical affine
    x, y after the sgn0 fix, and the isogeny/addition packing is
    identical), so the output Jacobian coordinates must match bit for bit."""
    from bls_verify_gadget_tpu.ops import hash_to_g2 as H
    from bls_verify_gadget_tpu.ops import curve as CV
    from bls_verify_gadget_tpu.golden import field as GF

    B = 4
    us = []
    for k in range(2):
        us.append([(rng.randrange(C.P), rng.randrange(C.P)) for _ in range(B)])
    # include the u = 0 edge and a u whose gx1 is non-square on map0
    us[0][0] = (0, 0)
    u0 = (jnp.asarray(FP.encode([u[0] for u in us[0]])),
          jnp.asarray(FP.encode([u[1] for u in us[0]])))
    u1 = (jnp.asarray(FP.encode([u[0] for u in us[1]])),
          jnp.asarray(FP.encode([u[1] for u in us[1]])))

    # jnp reference path (identical semantics contract)
    q0 = H.map_to_curve_g2(u0)
    q1 = H.map_to_curve_g2(u1)
    want = CV.pt_add(CV.FP2_OPS, q0, q1)

    with pltpu.force_tpu_interpret_mode():
        o = FP.kernels.sswu_map2(
            [u0[0], u0[1], u1[0], u1[1]],
            H._sswu_const_block(), list(H.SQRT_DIGITS), list(H.INV_DIGITS),
        )
    got = [np.asarray(x) for x in o]
    wantl = []
    for comp in want:
        wantl.append(np.asarray(comp[0]))
        wantl.append(np.asarray(comp[1]))
    for i, (g, w) in enumerate(zip(got, wantl)):
        assert np.array_equal(g, w), f"coord {i} mismatch"

    # cross-check against golden affine too (independent oracle)
    from bls_verify_gadget_tpu.golden import curve as gcv
    from bls_verify_gadget_tpu.golden import hash_to_curve as gh

    dec = CV.g2_decode(((o[0], o[1]), (o[2], o[3]), (o[4], o[5])))
    for k in range(B):
        w0 = gh.map_to_curve_g2(us[0][k])
        w1 = gh.map_to_curve_g2(us[1][k])
        assert dec[k] == gcv.g2_add(w0, w1)


@pytest.mark.heavy
def test_g2_cofactor_kernel_interpret():
    """Fused Budroni-Pintore cofactor kernel vs golden affine (the jnp CPU
    path uses a different ladder structure, so the Jacobian representative
    differs; the cleared POINT must agree)."""
    from bls_verify_gadget_tpu.ops import curve as CV
    from bls_verify_gadget_tpu.golden import curve as gcv

    B = 4
    pts = [gcv.g2_mul(C.G2_GEN, rng.randrange(2, 2**100)) for _ in range(B)]
    # feed NON-subgroup points: random E2 points from hashing-like x search
    # are expensive host-side; scalar multiples of the generator are in
    # the subgroup already, which still exercises the full chain
    enc = CV.g2_encode_batch(pts)
    with pltpu.force_tpu_interpret_mode():
        o = FP.kernels.g2_cofactor(
            CV._fused_pt_coords(CV.FP2_OPS, [enc]),
            CV._cof_const_block(), CV._absx_segs(),
        )
    dec = CV.g2_decode(CV._fused_pt_unflat(CV.FP2_OPS, o))
    for k in range(B):
        assert dec[k] == gcv.g2_clear_cofactor(pts[k])
