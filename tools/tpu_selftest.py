"""On-TPU pallas kernel differential selftest (consolidated battery).

Runs EVERY fused kernel in ops/pallas/kernels.py on the real device
(non-interpret Mosaic compilation) against the golden python-int oracle,
closing the gap that tests/test_pallas.py (interpret-mode, CPU CI) leaves:
Mosaic lowering, real tiling/padding, and VMEM behavior are only observable
on hardware.  Parameterised over tile / batch / in-kernel run length so it
can be pointed at the EXACT shapes bench.py uses (tile 1024, batch 4096,
doubling runs up to 31, pow-window k=4) — the configuration where the
round-2 Mosaic ApplyVectorLayoutPass crash lived.

Each case runs in its own subprocess by default (--isolate), so a Mosaic
compile-time fatal (SIGABRT of the remote compile helper) is recorded as a
per-kernel CRASH instead of killing the battery — this is the bisect
instrument for compile regressions.

Usage (serialize with any other TPU client — one client at a time):
    timeout 3600 python tools/tpu_selftest.py --tile 1024 --batch 4096 \
        --json-out SELFTEST.json

Prints one PASS/FAIL/CRASH line per kernel and a final JSON summary; exits
non-zero on any failure.
"""

import argparse
import json
import os
import random
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = {}


def case(name):
    def deco(fn):
        CASES[name] = fn
        return fn

    return deco


def _tile_list(vals, batch):
    """Cycle a short list of distinct python values out to `batch` entries —
    oracle cost stays O(len(vals)), device coverage is the full batch (every
    lane / tile position exercised)."""
    return [vals[i % len(vals)] for i in range(batch)]


class Ctx:
    def __init__(self, tile, batch):
        import jax.numpy as jnp  # noqa: F401 (device init)

        from bls_verify_gadget_tpu import constants as C
        from bls_verify_gadget_tpu.ops.fp import FP, FR
        from bls_verify_gadget_tpu.ops.pallas.kernels import FieldKernels

        self.C = C
        self.FP, self.FR = FP, FR
        self.K = FieldKernels(FP, tile=tile)
        self.KR = FieldKernels(FR, tile=tile)
        self.tile, self.B = tile, batch
        self.rng = random.Random(0xB15)

    # --- random value helpers (distinct-count kept small, tiled to batch) ---
    def vals(self, mod, distinct=64, edges=()):
        vs = list(edges) + [
            self.rng.randrange(mod) for _ in range(distinct - len(edges))
        ]
        return _tile_list(vs, self.B)

    def fp2s(self, distinct=32):
        vs = [
            (self.rng.randrange(self.C.P), self.rng.randrange(self.C.P))
            for _ in range(distinct)
        ]
        return _tile_list(vs, self.B)

    def fp6s(self, distinct=8):
        vs = [
            tuple(
                (self.rng.randrange(self.C.P), self.rng.randrange(self.C.P))
                for _ in range(3)
            )
            for _ in range(distinct)
        ]
        return _tile_list(vs, self.B)

    def fp12s(self, distinct=8):
        vs = [
            tuple(
                tuple(
                    (self.rng.randrange(self.C.P), self.rng.randrange(self.C.P))
                    for _ in range(3)
                )
                for _ in range(2)
            )
            for _ in range(distinct)
        ]
        return _tile_list(vs, self.B)

    def enc(self, vs, fld=None):
        import jax.numpy as jnp

        return jnp.asarray((fld or self.FP).encode(vs))

    def enc12(self, elems):
        out = []
        for i in range(2):
            for j in range(3):
                for k in range(2):
                    out.append(self.enc([g[i][j][k] for g in elems]))
        return out

    def dec12(self, o, b):
        import numpy as np

        cols = [self.FP.decode(np.asarray(x)) for x in o]
        return [
            tuple(
                tuple(
                    (cols[6 * i + 2 * j][t], cols[6 * i + 2 * j + 1][t])
                    for j in range(3)
                )
                for i in range(2)
            )
            for t in range(b)
        ]


# ---------------------------------------------------------------------------
# scalar-field kernels
# ---------------------------------------------------------------------------

@case("mul")
def t_mul(cx):
    import numpy as np

    C = cx.C
    xs = cx.vals(C.P, edges=[0, 1, C.P - 1, C.P - 2])
    ys = cx.vals(C.P, edges=[C.P - 1, C.P - 1, C.P - 1, C.P - 1])
    got = cx.FP.decode(np.asarray(cx.K.mul(cx.enc(xs), cx.enc(ys))))
    assert got == [x * y % C.P for x, y in zip(xs, ys)]


@case("add_sub")
def t_add_sub(cx):
    import numpy as np

    C = cx.C
    xs = cx.vals(C.P, edges=[0, 1, C.P - 1, C.P - 2])
    ys = cx.vals(C.P, edges=[C.P - 1, 0, C.P - 1, 1])
    ax, ay = cx.enc(xs), cx.enc(ys)
    assert cx.FP.decode(np.asarray(cx.K.add(ax, ay))) == [
        (x + y) % C.P for x, y in zip(xs, ys)
    ]
    assert cx.FP.decode(np.asarray(cx.K.sub(ax, ay))) == [
        (x - y) % C.P for x, y in zip(xs, ys)
    ]


@case("fr_mul")
def t_fr_mul(cx):
    import numpy as np

    C = cx.C
    xr, yr = cx.vals(C.R), cx.vals(C.R)
    got = cx.FR.decode(
        np.asarray(cx.KR.mul(cx.enc(xr, cx.FR), cx.enc(yr, cx.FR)))
    )
    assert got == [x * y % C.R for x, y in zip(xr, yr)]


@case("stacked_mul")
def t_stacked(cx):
    import numpy as np

    C = cx.C
    k = 3
    vs = _tile_list([cx.rng.randrange(C.P) for _ in range(64)], k * cx.B)
    ws = _tile_list([cx.rng.randrange(C.P) for _ in range(64)], k * cx.B)
    av = cx.enc(vs).reshape(k, cx.B, C.NLIMB)
    aw = cx.enc(ws).reshape(k, cx.B, C.NLIMB)
    got = cx.FP.decode(np.asarray(cx.K.mul(av, aw)).reshape(k * cx.B, C.NLIMB))
    assert got == [v * w % C.P for v, w in zip(vs, ws)]


# ---------------------------------------------------------------------------
# tower kernels
# ---------------------------------------------------------------------------

@case("fp2_mul_sqr")
def t_fp2(cx):
    import numpy as np

    from bls_verify_gadget_tpu.golden import field as GF

    a2, b2 = cx.fp2s(), cx.fp2s()
    a0, a1 = cx.enc([v[0] for v in a2]), cx.enc([v[1] for v in a2])
    b0, b1 = cx.enc([v[0] for v in b2]), cx.enc([v[1] for v in b2])
    c0, c1 = cx.K.fp2_mul(a0, a1, b0, b1)
    got = list(zip(cx.FP.decode(np.asarray(c0)), cx.FP.decode(np.asarray(c1))))
    assert got == [GF.fp2_mul(x, y) for x, y in zip(a2, b2)]
    s0, s1 = cx.K.fp2_sqr(a0, a1)
    gots = list(zip(cx.FP.decode(np.asarray(s0)), cx.FP.decode(np.asarray(s1))))
    assert gots == [GF.fp2_sqr(x) for x in a2]


@case("fp6_mul")
def t_fp6(cx):
    import numpy as np

    from bls_verify_gadget_tpu.golden import field as GF

    x6, y6 = cx.fp6s(), cx.fp6s()
    xc = [cx.enc([v[j][k] for v in x6]) for j in range(3) for k in range(2)]
    yc = [cx.enc([v[j][k] for v in y6]) for j in range(3) for k in range(2)]
    o = cx.K.fp6_mul(xc, yc)
    cols = [cx.FP.decode(np.asarray(t)) for t in o]
    got = [
        tuple((cols[2 * j][t], cols[2 * j + 1][t]) for j in range(3))
        for t in range(cx.B)
    ]
    assert got == [GF.fp6_mul(x, y) for x, y in zip(x6, y6)]


@case("fp12_mul_sqr")
def t_fp12(cx):
    from bls_verify_gadget_tpu.golden import field as GF

    xs12, ys12 = cx.fp12s(), cx.fp12s()
    om = cx.K.fp12_mul(cx.enc12(xs12) + cx.enc12(ys12))
    assert cx.dec12(om, cx.B) == [
        GF.fp12_mul(x, y) for x, y in zip(xs12, ys12)
    ]
    os_ = cx.K.fp12_sqr(cx.enc12(xs12))
    assert cx.dec12(os_, cx.B) == [GF.fp12_sqr(x) for x in xs12]


@case("mul014")
def t_mul014(cx):
    from bls_verify_gadget_tpu.golden import field as GF

    C = cx.C
    fs = cx.fp12s()
    lines = _tile_list(
        [
            tuple(
                (cx.rng.randrange(C.P), cx.rng.randrange(C.P)) for _ in range(3)
            )
            for _ in range(8)
        ],
        cx.B,
    )
    want = []
    for f, (c0, c1, c4) in zip(fs, lines):
        z2 = (0, 0)
        want.append(GF.fp12_mul(f, ((c0, c1, z2), (z2, c4, z2))))
    coords = cx.enc12(fs)
    for j in range(3):
        for k in range(2):
            coords.append(cx.enc([ln[j][k] for ln in lines]))
    assert cx.dec12(cx.K.mul014(coords), cx.B) == want


# ---------------------------------------------------------------------------
# cyclotomic squaring (genuine subgroup elements; count = in-kernel run)
# ---------------------------------------------------------------------------

def _cyclo_elems(cx, distinct=4):
    from bls_verify_gadget_tpu.golden import field as GF

    elems = []
    for _ in range(distinct):
        f = cx.fp12s(1)[0]
        g = GF.fp12_mul(GF.fp12_frob(f, 6), GF.fp12_inv(f))
        g = GF.fp12_mul(GF.fp12_frob(g, 2), g)
        elems.append(g)
    return _tile_list(elems, cx.B)


def _cyclo_case(cx, count):
    import numpy as np

    from bls_verify_gadget_tpu.golden import field as GF

    elems = _cyclo_elems(cx)
    zsel = [(0, 0), (1, 1), (1, 0), (0, 2), (0, 1), (1, 2)]
    zc = []
    for (i, j) in zsel:
        zc.append(cx.enc([g[i][j][0] for g in elems]))
        zc.append(cx.enc([g[i][j][1] for g in elems]))
    o = cx.K.cyclo_sqr(zc, count=count)
    zn = [
        (cx.FP.decode(np.asarray(o[2 * i])), cx.FP.decode(np.asarray(o[2 * i + 1])))
        for i in range(6)
    ]

    def fp2_at(zi, t):
        return (zn[zi][0][t], zn[zi][1][t])

    got = [
        ((fp2_at(0, t), fp2_at(4, t), fp2_at(3, t)),
         (fp2_at(2, t), fp2_at(1, t), fp2_at(5, t)))
        for t in range(len(elems))
    ]
    # oracle on the 4 distinct elements only, tiled out
    want4 = []
    for g in elems[:4]:
        h = g
        for _ in range(count):
            h = GF.fp12_cyclotomic_sqr(h)
        want4.append(h)
    assert got == _tile_list(want4, cx.B), f"count={count}"


@case("cyclo_sqr")
def t_cyclo1(cx):
    _cyclo_case(cx, 1)


@case("cyclo_sqr_k3")
def t_cyclo3(cx):
    _cyclo_case(cx, 3)


@case("cyclo_sqr_k15")
def t_cyclo15(cx):
    _cyclo_case(cx, 15)


@case("cyclo_sqr_k31")
def t_cyclo31(cx):
    _cyclo_case(cx, 31)


# ---------------------------------------------------------------------------
# Miller step kernels (reference = stacked jnp path with fusion OFF)
# ---------------------------------------------------------------------------

def _pairing_points(cx, distinct=4):
    from bls_verify_gadget_tpu.golden import bls as gbls

    sks = [cx.rng.randrange(1, cx.C.R) for _ in range(distinct)]
    qs = _tile_list([gbls.sign(sk, b"tpu selftest") for sk in sks], cx.B)
    pks = _tile_list([gbls.sk_to_pk(sk) for sk in sks], cx.B)
    return pks, qs


@case("miller_steps")
def t_steps(cx):
    import numpy as np

    from bls_verify_gadget_tpu.ops import pairing as PR
    from bls_verify_gadget_tpu.utils.config import config

    pks, qs = _pairing_points(cx)
    xq = (cx.enc([q[0][0] for q in qs]), cx.enc([q[0][1] for q in qs]))
    yq = (cx.enc([q[1][0] for q in qs]), cx.enc([q[1][1] for q in qs]))
    one2 = (cx.enc([1] * cx.B), cx.enc([0] * cx.B))
    xp = cx.enc([p[0] for p in pks])
    yp = cx.enc([p[1] for p in pks])
    old = config.fuse_steps
    config.fuse_steps = False
    try:
        tj, linej = PR._dbl_step((xq, yq, one2), xp, yp)
        taj, lineaj = PR._add_step(tj, (xq, yq), xp, yp)
    finally:
        config.fuse_steps = old
    o = cx.K.dbl_step(
        [xq[0], xq[1], yq[0], yq[1], one2[0], one2[1], xp, yp]
    )
    tk = ((o[0], o[1]), (o[2], o[3]), (o[4], o[5]))
    oa = cx.K.add_step(
        [tk[0][0], tk[0][1], tk[1][0], tk[1][1], tk[2][0], tk[2][1],
         xq[0], xq[1], yq[0], yq[1], xp, yp]
    )

    def flat(t, line):
        out = []
        for f2 in list(t) + list(line):
            out += [f2[0], f2[1]]
        return out

    for got, want in zip(list(o) + list(oa),
                         flat(tj, linej) + flat(taj, lineaj)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# ---------------------------------------------------------------------------
# fused Jacobian point kernels (reference = stacked jnp path, fuse_pt OFF)
# ---------------------------------------------------------------------------

def _pt_batches(cx):
    from bls_verify_gadget_tpu.golden import bls as gbls

    sks = [cx.rng.randrange(1, cx.C.R) for _ in range(4)]
    g1s = [gbls.sk_to_pk(sk) for sk in sks]
    g2s = [gbls.sign(sk, b"tpu pt selftest") for sk in sks]
    return g1s, g2s


@case("pt_dbl_add")
def t_pt(cx):
    import numpy as np

    from bls_verify_gadget_tpu.ops import curve as CV
    from bls_verify_gadget_tpu.utils.config import config

    C = cx.C
    g1s, g2s = _pt_batches(cx)
    for name, ops, enc, pts in (
        ("fp", CV.FP_OPS, CV.g1_encode_batch, g1s),
        ("fp2", CV.FP2_OPS, CV.g2_encode_batch, g2s),
    ):
        if name == "fp":
            neg = lambda p: (p[0], (C.P - p[1]) % C.P)
        else:
            neg = lambda p: (
                p[0], ((C.P - p[1][0]) % C.P, (C.P - p[1][1]) % C.P)
            )
        # edge cases (dbl / add / P+(-P) / inf+Q / P+inf) tiled to batch
        Pv = _tile_list([pts[0], pts[1], pts[2], None, pts[3]], cx.B)
        Qv = _tile_list([pts[1], pts[1], neg(pts[2]), pts[0], None], cx.B)
        P, Q = enc(Pv), enc(Qv)
        # reference path: stacked jnp ops with the fused pt kernels OFF
        # (with fuse_pt on, CV.pt_double/pt_add route through the very
        # kernels under test and the differential is tautological) — run it
        # jitted on the 5-row distinct prefix (one small compile instead of
        # an eager full-batch compile storm) and compare cyclically
        import jax

        old = config.fuse_pt
        config.fuse_pt = False
        try:
            def ref(Ps, Qs):
                Pd = CV.pt_double(ops, Ps)
                Qd = CV.pt_double(ops, Qs)
                return Pd, Qd, CV.pt_double(ops, Pd), CV.pt_add(ops, Pd, Qd)
            take = lambda pt, k: jax.tree.map(lambda x: x[:k], pt)
            _, Qd5, want_d, want_a = jax.jit(ref)(take(P, 5), take(Q, 5))
        finally:
            config.fuse_pt = old
        P1 = CV.pt_double(ops, P)     # fused kernel (under test) at full B
        Qd = CV.pt_double(ops, Q)
        np.testing.assert_array_equal(
            np.asarray(CV._fused_pt_coords(ops, [Qd])[0])[:5],
            np.asarray(CV._fused_pt_coords(ops, [Qd5])[0]), err_msg=name,
        )
        od = cx.K.pt_dbl(CV._fused_pt_coords(ops, [P1]), name)
        oa = cx.K.pt_add(CV._fused_pt_coords(ops, [P1, Qd]), name)
        for got, want in (
            (CV._fused_pt_unflat(ops, od), want_d),
            (CV._fused_pt_unflat(ops, oa), want_a),
        ):
            for g, w in zip(
                CV._fused_pt_coords(ops, [got]),
                CV._fused_pt_coords(ops, [want]),
            ):
                g = np.asarray(g)
                w = np.asarray(w)
                idx = np.arange(g.shape[0]) % w.shape[0]
                np.testing.assert_array_equal(g, w[idx], err_msg=name)


def _pt_run_case(cx, count):
    import numpy as np

    from bls_verify_gadget_tpu.ops import curve as CV
    from bls_verify_gadget_tpu.utils.config import config

    import jax

    _, g2s = _pt_batches(cx)
    P = CV.g2_encode_batch(_tile_list(g2s[:3] + [None], cx.B))
    old = config.fuse_pt
    config.fuse_pt = False
    try:
        # jitted reference on the 4-row distinct prefix (compare cyclically)
        def ref(Ps):
            for _ in range(count):
                Ps = CV.pt_double(CV.FP2_OPS, Ps)
            return Ps
        want = jax.jit(ref)(jax.tree.map(lambda x: x[:4], P))
    finally:
        config.fuse_pt = old
    o = cx.K.pt_dbl(CV._fused_pt_coords(CV.FP2_OPS, [P]), "fp2", count=count)
    got = CV._fused_pt_unflat(CV.FP2_OPS, o)
    for g, w in zip(
        CV._fused_pt_coords(CV.FP2_OPS, [got]),
        CV._fused_pt_coords(CV.FP2_OPS, [want]),
    ):
        g = np.asarray(g)
        w = np.asarray(w)
        idx = np.arange(g.shape[0]) % w.shape[0]
        np.testing.assert_array_equal(g, w[idx])


@case("pt_dbl_run4")
def t_pt_run4(cx):
    _pt_run_case(cx, 4)


@case("pt_dbl_run31")
def t_pt_run31(cx):
    # longest doubling run in the static |x|-ladders (bits of 0xd201...)
    _pt_run_case(cx, 31)


# ---------------------------------------------------------------------------
# whole-chain fused kernels: pow, ladders, Miller runs, exp-by-x
# ---------------------------------------------------------------------------

def _digits4(exp):
    ds = []
    while exp:
        ds.append(exp & 15)
        exp >>= 4
    return ds[::-1]


@case("pow_win")
def t_pow_win(cx):
    """Whole windowed-pow chains vs python pow: Fp sqrt exponent and the
    Fp2 SSWU sqrt exponent (the two verify-path pow shapes)."""
    import numpy as np

    from bls_verify_gadget_tpu.golden import field as GF
    from bls_verify_gadget_tpu.ops.hash_to_g2 import EXP_SQRT

    C = cx.C
    xs = cx.vals(C.P, 16, edges=[0, 1, C.P - 1])
    exp = (C.P + 1) // 4
    o = cx.K.pow_win([cx.enc(xs)], 1, _digits4(exp))
    assert cx.FP.decode(np.asarray(o[0])) == [pow(x, exp, C.P) for x in xs]

    f2s = cx.fp2s(4)
    o = cx.K.pow_win(
        [cx.enc([v[0] for v in f2s]), cx.enc([v[1] for v in f2s])],
        2, _digits4(EXP_SQRT),
    )
    got = list(
        zip(cx.FP.decode(np.asarray(o[0])), cx.FP.decode(np.asarray(o[1])))
    )
    assert got == [GF.fp2_pow(v, EXP_SQRT) for v in f2s]


@case("pt_mul_const")
def t_pt_mul_const(cx):
    """Whole |x|-ladder (SMEM run structure) vs golden scalar mul, G2 with
    an infinity rider."""
    import numpy as np

    from bls_verify_gadget_tpu.golden import curve as gc
    from bls_verify_gadget_tpu.ops import curve as CV

    _, g2s = _pt_batches(cx)
    pts = _tile_list(g2s[:3] + [None], cx.B)
    P = CV.g2_encode_batch(pts)
    bits = bin(cx.C.ABS_X)[2:]
    segs, run = [], 0
    for bit in bits[1:]:
        run += 1
        if bit == "1":
            segs.append((run, 1))
            run = 0
    if run:
        segs.append((run, 0))
    o = cx.K.pt_mul_const(CV._fused_pt_coords(CV.FP2_OPS, [P]), "fp2", segs)
    got = CV.g2_decode(CV._fused_pt_unflat(CV.FP2_OPS, o))
    want = [None if p is None else gc.g2_mul(p, cx.C.ABS_X) for p in pts]
    assert got == want


@case("pt_mul_var")
def t_pt_mul_var(cx):
    """Whole variable-scalar ladder vs golden, G1, scalars incl. 0 and 1."""
    import jax.numpy as jnp

    from bls_verify_gadget_tpu.golden import curve as gc
    from bls_verify_gadget_tpu.ops import curve as CV
    from bls_verify_gadget_tpu.ops.limbs import ints_to_limbs

    g1s, _ = _pt_batches(cx)
    pts = _tile_list(g1s[:4], cx.B)
    ks = _tile_list([0, 1, cx.rng.randrange(cx.C.R), cx.C.R - 1], cx.B)
    P = CV.g1_encode_batch(pts)
    s = jnp.asarray(ints_to_limbs(ks, cx.C.NLIMB_FR))
    o = cx.K.pt_mul_var(CV._fused_pt_coords(CV.FP_OPS, [P]), "fp", s, 255)
    got = CV.g1_decode(CV._fused_pt_unflat(CV.FP_OPS, o))
    want = [gc.g1_mul(p, k) if k else None for p, k in zip(pts, ks)]
    assert got == want


@case("exp_x")
def t_exp_x(cx):
    """Whole final-exp x-chain kernel vs golden (bit-exact: identical
    operation sequence on arbitrary fp12 inputs)."""
    from bls_verify_gadget_tpu.golden import field as GF
    from bls_verify_gadget_tpu.ops import tower as T

    C = cx.C
    elems = cx.fp12s(4)
    bits = bin(C.ABS_X)[2:]
    want = []
    for m in elems:
        f = m
        for bit in bits[1:]:
            f = GF.fp12_cyclotomic_sqr(f)
            if bit == "1":
                f = GF.fp12_mul(f, m)
        want.append(f)
    segs, run = [], 0
    for bit in bits[1:]:
        run += 1
        if bit == "1":
            segs.append((run, 1))
            run = 0
    if run:
        segs.append((run, 0))
    o = cx.K.exp_x(cx.enc12(elems), segs)
    assert cx.dec12(o, cx.B) == _tile_list(want, cx.B)


@case("miller_run")
def t_miller_run(cx):
    """Fused Miller dbl-run + add-block kernels vs the unfused jnp step
    path (bit-exact), with a mixed valid mask."""
    import jax.numpy as jnp
    import numpy as np

    from bls_verify_gadget_tpu.ops import pairing as PR, tower as T
    from bls_verify_gadget_tpu.utils.config import config

    k, count = 2, 3
    g1s, g2s = _pt_batches(cx)
    qs, xps, yps, valids = [], [], [], []
    for i in range(k):
        q2 = _tile_list(g2s[i : i + 3], cx.B)
        p1 = _tile_list(g1s[i : i + 3], cx.B)
        qs.append((
            (cx.enc([q[0][0] for q in q2]), cx.enc([q[0][1] for q in q2])),
            (cx.enc([q[1][0] for q in q2]), cx.enc([q[1][1] for q in q2])),
        ))
        xps.append(cx.enc([p[0] for p in p1]))
        yps.append(cx.enc([p[1] for p in p1]))
        valids.append(
            jnp.asarray([(j + i) % 3 != 0 for j in range(cx.B)])
        )
    f0 = T._unflat12(
        [cx.enc(cx.vals(cx.C.P, 8)) for _ in range(12)]
    )

    # jitted reference on the 24-row distinct prefix (inputs tile with
    # periods 3 and 8; compare cyclically) — one small compile instead of
    # an eager full-batch compile storm
    import jax

    d = 24
    old_steps, old_miller = config.fuse_steps, config.fuse_miller
    config.fuse_steps = False
    config.fuse_miller = False
    try:
        def ref(f0d, qsd, xpsd, ypsd, validsd):
            f = f0d
            ts = [(q[0], q[1], T.fp2_one_like(q[0])) for q in qsd]
            for _ in range(count):
                f = T.fp12_sqr(f)
                for i in range(k):
                    tn, line = PR._dbl_step(ts[i], xpsd[i], ypsd[i])
                    l0, l1, l4 = PR._neutral_line(*line, validsd[i])
                    f = PR.fp12_mul_by_014(f, l0, l1, l4)
                    ts[i] = tn
            for i in range(k):
                tn, line = PR._add_step(ts[i], qsd[i], xpsd[i], ypsd[i])
                l0, l1, l4 = PR._neutral_line(*line, validsd[i])
                f = PR.fp12_mul_by_014(f, l0, l1, l4)
                ts[i] = tn
            return f, ts

        cut = lambda t: jax.tree.map(lambda x: x[:d], t)
        f, ts = jax.jit(ref)(
            cut(f0), cut(qs), cut(xps), cut(yps), cut(valids)
        )
    finally:
        config.fuse_steps, config.fuse_miller = old_steps, old_miller

    v_u32 = [v.astype(jnp.uint32)[..., None] for v in valids]
    coords = T._flat12(f0)
    tk = [(q[0], q[1], T.fp2_one_like(q[0])) for q in qs]
    for i in range(k):
        X, Y, Z = tk[i]
        coords += [X[0], X[1], Y[0], Y[1], Z[0], Z[1],
                   xps[i], yps[i], v_u32[i]]
    o = cx.K.miller_dbl_run(coords, k, count)
    fk, tks = o[:12], o[12:]
    coords = list(fk)
    for i in range(k):
        coords += list(tks[6 * i : 6 * i + 6])
        coords += [qs[i][0][0], qs[i][0][1], qs[i][1][0], qs[i][1][1],
                   xps[i], yps[i], v_u32[i]]
    oa = cx.K.miller_add(coords, k)

    want = T._flat12(f)
    for i in range(k):
        X, Y, Z = ts[i]
        want += [X[0], X[1], Y[0], Y[1], Z[0], Z[1]]
    for got_a, want_a in zip(oa, want):
        g = np.asarray(got_a)
        w = np.asarray(want_a)
        idx = np.arange(g.shape[0]) % w.shape[0]
        np.testing.assert_array_equal(g, w[idx])


@case("sswu_map2")
def t_sswu_map2(cx):
    """Fused whole-map hash kernel (both SSWU maps, fraction form + shared
    chain + batched inversion + isogeny + point sum) vs golden affine."""
    from bls_verify_gadget_tpu.golden import curve as gcv
    from bls_verify_gadget_tpu.golden import hash_to_curve as gh
    from bls_verify_gadget_tpu.ops import curve as CV
    from bls_verify_gadget_tpu.ops import hash_to_g2 as H

    C = cx.C
    d = 4
    us0 = _tile_list([(0, 0)] + cx.fp2s(d - 1)[: d - 1], cx.B)
    us1 = _tile_list(cx.fp2s(d), cx.B)
    u0 = (cx.enc([u[0] for u in us0]), cx.enc([u[1] for u in us0]))
    u1 = (cx.enc([u[0] for u in us1]), cx.enc([u[1] for u in us1]))
    o = cx.K.sswu_map2(
        [u0[0], u0[1], u1[0], u1[1]],
        H._sswu_const_block(), list(H.SQRT_DIGITS), list(H.INV_DIGITS),
    )
    got = CV.g2_decode(((o[0], o[1]), (o[2], o[3]), (o[4], o[5])))
    want = [
        gcv.g2_add(gh.map_to_curve_g2(a), gh.map_to_curve_g2(b))
        for a, b in zip(us0, us1)
    ]
    assert got == want


@case("g2_cofactor")
def t_g2_cofactor(cx):
    """Fused Budroni-Pintore cofactor-clearing kernel vs golden affine."""
    from bls_verify_gadget_tpu.golden import curve as gcv
    from bls_verify_gadget_tpu.ops import curve as CV

    pts = _tile_list(
        [gcv.g2_mul(cx.C.G2_GEN, cx.rng.randrange(2, 2**100))
         for _ in range(4)],
        cx.B,
    )
    enc = CV.g2_encode_batch(pts)
    o = cx.K.g2_cofactor(
        CV._fused_pt_coords(CV.FP2_OPS, [enc]),
        CV._cof_const_block(), CV._absx_segs(),
    )
    got = CV.g2_decode(CV._fused_pt_unflat(CV.FP2_OPS, o))
    assert got == [gcv.g2_clear_cofactor(p) for p in pts]


@case("compile_budget")
def t_compile_budget(cx):
    """Trace-time compile-budget contract (VERDICT r4 weak #4): per-stage
    StableHLO module size and unique Mosaic payload count vs the committed
    COMPILE_BUDGET.json — catches a fusion change that would re-blow the
    ~600 s driver cold-compile envelope, without compiling anything."""
    import json as _json

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import compile_diag as CD

    rec = CD.trace_record(4096)
    with open(CD.budget_path()) as f:
        budget = _json.load(f)
    bad = CD.check_budget(rec, budget)
    assert not bad, "; ".join(bad)


# ---------------------------------------------------------------------------
# flag-gated Montgomery variants
# ---------------------------------------------------------------------------

def _variant_mul(cx, which):
    import numpy as np

    from bls_verify_gadget_tpu.ops.pallas.kernels import FieldKernels

    C = cx.C
    xs = cx.vals(C.P, edges=[0, 1, C.P - 1, C.P - 2])
    ys = cx.vals(C.P, edges=[C.P - 1, C.P - 1, C.P - 1, C.P - 1])
    Km = FieldKernels(cx.FP, tile=cx.tile)
    Km.variant = which
    got = cx.FP.decode(np.asarray(Km.mul(cx.enc(xs), cx.enc(ys))))
    assert got == [x * y % C.P for x, y in zip(xs, ys)]


@case("cios_mul")
def t_cios_fallback(cx):
    _variant_mul(cx, "cios")


@case("cios3_mul")
def t_cios3(cx):
    _variant_mul(cx, "cios3")


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def run_child(names, tile, batch):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/bls_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dev = jax.devices()[0]
    print(f"device: {dev} (platform={dev.platform})", flush=True)
    cx = Ctx(tile, batch)
    results = []
    for name in names:
        t0 = time.time()
        try:
            CASES[name](cx)
            ok, err = True, ""
        except Exception as e:  # noqa: BLE001 - report, don't abort
            ok, err = False, f"{type(e).__name__}: {e}"[:300]
        dt = time.time() - t0
        rec = {"kernel": name, "ok": ok, "s": round(dt, 1), "err": err}
        results.append(rec)
        print(f"CHILD_RESULT {json.dumps(rec)}", flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--batch", type=int, default=130)  # off-tile: padding path
    ap.add_argument("--cases", type=str, default="")
    ap.add_argument("--json-out", type=str, default="")
    ap.add_argument("--child", action="store_true")
    ap.add_argument(
        "--no-isolate", action="store_true",
        help="run all cases in-process (faster; a compile fatal kills the run)",
    )
    ap.add_argument("--timeout", type=int, default=1500,
                    help="per-case timeout in isolate mode (s)")
    args = ap.parse_args()

    names = [c for c in args.cases.split(",") if c] or list(CASES)
    for nm in names:
        if nm not in CASES:
            sys.exit(f"unknown case {nm!r}; have: {', '.join(CASES)}")

    if args.child or args.no_isolate:
        results = run_child(names, args.tile, args.batch)
    else:
        results = []
        for name in names:
            t0 = time.time()
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--child", "--cases", name,
                     "--tile", str(args.tile), "--batch", str(args.batch)],
                    capture_output=True, text=True, timeout=args.timeout + 120,
                )
                out, err_s, rc = proc.stdout, proc.stderr, proc.returncode
            except subprocess.TimeoutExpired as e:  # slow grant/compile
                out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
                err_s = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
                rc = "timeout"
            rec = None
            for line in out.splitlines():
                if line.startswith("CHILD_RESULT "):
                    rec = json.loads(line[len("CHILD_RESULT "):])
            if rec is None:  # compile fatal / crash before the result line
                tail = (out + err_s).strip().splitlines()
                rec = {
                    "kernel": name, "ok": False,
                    "s": round(time.time() - t0, 1),
                    "err": f"CRASH rc={rc}: "
                           + " | ".join(tail[-3:])[:400],
                }
            results.append(rec)
            status = "PASS" if rec["ok"] else (
                "CRASH" if rec["err"].startswith("CRASH") else "FAIL"
            )
            print(f"{status} {name} ({rec['s']}s) {rec['err']}", flush=True)

    n_fail = sum(1 for r in results if not r["ok"])
    summary = {
        "metric": "tpu_kernel_selftest",
        "tile": args.tile,
        "batch": args.batch,
        "kernels": len(results),
        "failed": n_fail,
        "results": results,
    }
    print(json.dumps(summary))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(summary, f, indent=1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
