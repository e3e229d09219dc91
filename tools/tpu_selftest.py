"""On-TPU pallas kernel differential selftest.

Runs EVERY fused kernel in ops/pallas/kernels.py on the real device
(non-interpret Mosaic compilation) against the golden python-int oracle,
closing the gap that tests/test_pallas.py (interpret-mode, CPU CI) leaves:
Mosaic lowering, real tiling/padding, and VMEM behavior are only observable
on hardware.  Mirrors the coverage of tests/test_pallas.py one-to-one.

Usage (serialize with any other TPU client — one client at a time):
    timeout 1800 python tools/tpu_selftest.py [--tile 128] [--batch 130]

Prints one PASS/FAIL line per kernel and a final JSON summary; exits
non-zero on any failure.
"""

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/bls_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bls_verify_gadget_tpu import constants as C
from bls_verify_gadget_tpu.golden import field as GF
from bls_verify_gadget_tpu.ops.fp import FP, FR

rng = random.Random(0xB15)

RESULTS = []


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        ok, err = True, ""
    except Exception as e:  # noqa: BLE001 - report, don't abort the battery
        ok, err = False, f"{type(e).__name__}: {e}"
    dt = time.time() - t0
    RESULTS.append({"kernel": name, "ok": ok, "s": round(dt, 1), "err": err})
    print(f"{'PASS' if ok else 'FAIL'} {name} ({dt:.1f}s) {err}", flush=True)


def _vals(n, mod):
    return [rng.randrange(mod) for _ in range(n)]


def _enc(vs, fld=FP):
    return jnp.asarray(fld.encode(vs))


def _rand_fp2(b):
    return [(rng.randrange(C.P), rng.randrange(C.P)) for _ in range(b)]


def _rand_fp6(b):
    return [tuple(_rand_fp2(1)[0] for _ in range(3)) for _ in range(b)]


def _rand_fp12(b):
    return [tuple(_rand_fp6(1)[0] for _ in range(2)) for _ in range(b)]


def _enc12(elems):
    out = []
    for i in range(2):
        for j in range(3):
            for k in range(2):
                out.append(_enc([g[i][j][k] for g in elems]))
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--batch", type=int, default=130)  # off-tile: padding path
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev} (platform={dev.platform})", flush=True)

    from bls_verify_gadget_tpu.ops.pallas.kernels import FieldKernels

    K = FieldKernels(FP, tile=args.tile)
    KR = FieldKernels(FR, tile=args.tile)
    B = args.batch

    # --- scalar field kernels -------------------------------------------
    xs, ys = _vals(B, C.P), _vals(B, C.P)
    xs[:4] = [0, 1, C.P - 1, C.P - 2]
    ys[:4] = [C.P - 1] * 4
    ax, ay = _enc(xs), _enc(ys)

    def t_mul():
        assert FP.decode(np.asarray(K.mul(ax, ay))) == [
            x * y % C.P for x, y in zip(xs, ys)
        ]

    def t_add_sub():
        assert FP.decode(np.asarray(K.add(ax, ay))) == [
            (x + y) % C.P for x, y in zip(xs, ys)
        ]
        assert FP.decode(np.asarray(K.sub(ax, ay))) == [
            (x - y) % C.P for x, y in zip(xs, ys)
        ]

    def t_fr_mul():
        xr, yr = _vals(B, C.R), _vals(B, C.R)
        assert FR.decode(np.asarray(KR.mul(_enc(xr, FR), _enc(yr, FR)))) == [
            x * y % C.R for x, y in zip(xr, yr)
        ]

    def t_stacked():
        k = 3
        vs, ws = _vals(k * B, C.P), _vals(k * B, C.P)
        av = _enc(vs).reshape(k, B, C.NLIMB)
        aw = _enc(ws).reshape(k, B, C.NLIMB)
        got = FP.decode(np.asarray(K.mul(av, aw)).reshape(k * B, C.NLIMB))
        assert got == [v * w % C.P for v, w in zip(vs, ws)]

    check("mul", t_mul)
    check("add_sub", t_add_sub)
    check("fr_mul", t_fr_mul)
    check("stacked_mul", t_stacked)

    # --- tower kernels ---------------------------------------------------
    a2, b2 = _rand_fp2(B), _rand_fp2(B)
    a0, a1 = _enc([v[0] for v in a2]), _enc([v[1] for v in a2])
    b0, b1 = _enc([v[0] for v in b2]), _enc([v[1] for v in b2])

    def t_fp2():
        c0, c1 = K.fp2_mul(a0, a1, b0, b1)
        got = list(zip(FP.decode(np.asarray(c0)), FP.decode(np.asarray(c1))))
        assert got == [GF.fp2_mul(x, y) for x, y in zip(a2, b2)]
        s0, s1 = K.fp2_sqr(a0, a1)
        gots = list(zip(FP.decode(np.asarray(s0)), FP.decode(np.asarray(s1))))
        assert gots == [GF.fp2_sqr(x) for x in a2]

    def t_fp6():
        x6, y6 = _rand_fp6(B), _rand_fp6(B)
        xc = [_enc([v[j][k] for v in x6]) for j in range(3) for k in range(2)]
        yc = [_enc([v[j][k] for v in y6]) for j in range(3) for k in range(2)]
        o = K.fp6_mul(xc, yc)
        cols = [FP.decode(np.asarray(t)) for t in o]
        got = [
            tuple((cols[2 * j][t], cols[2 * j + 1][t]) for j in range(3))
            for t in range(B)
        ]
        assert got == [GF.fp6_mul(x, y) for x, y in zip(x6, y6)]

    def t_fp12():
        b = 6
        xs12, ys12 = _rand_fp12(b), _rand_fp12(b)
        om = K.fp12_mul(_enc12(xs12) + _enc12(ys12))
        assert _dec12(om, b) == [GF.fp12_mul(x, y) for x, y in zip(xs12, ys12)]
        os_ = K.fp12_sqr(_enc12(xs12))
        assert _dec12(os_, b) == [GF.fp12_sqr(x) for x in xs12]

    def t_mul014():
        b = 5
        fs = _rand_fp12(b)
        lines = [tuple(tuple(_vals(2, C.P)) for _ in range(3)) for _ in range(b)]
        want = []
        for f, (c0, c1, c4) in zip(fs, lines):
            z2 = (0, 0)
            want.append(GF.fp12_mul(f, ((c0, c1, z2), (z2, c4, z2))))
        coords = _enc12(fs)
        for j in range(3):
            for k in range(2):
                coords.append(_enc([ln[j][k] for ln in lines]))
        assert _dec12(K.mul014(coords), b) == want

    check("fp2_mul_sqr", t_fp2)
    check("fp6_mul", t_fp6)
    check("fp12_mul_sqr", t_fp12)
    check("mul014", t_mul014)

    # --- cyclotomic squaring (genuine subgroup elements) ------------------
    def t_cyclo():
        elems = []
        for _ in range(4):
            f = _rand_fp12(1)[0]
            g = GF.fp12_mul(GF.fp12_frob(f, 6), GF.fp12_inv(f))
            g = GF.fp12_mul(GF.fp12_frob(g, 2), g)
            elems.append(g)
        zsel = [(0, 0), (1, 1), (1, 0), (0, 2), (0, 1), (1, 2)]
        zc = []
        for (i, j) in zsel:
            zc.append(_enc([g[i][j][0] for g in elems]))
            zc.append(_enc([g[i][j][1] for g in elems]))
        for count in (1, 3):
            o = K.cyclo_sqr(zc, count=count)
            zn = [
                (FP.decode(np.asarray(o[2 * i])), FP.decode(np.asarray(o[2 * i + 1])))
                for i in range(6)
            ]

            def fp2_at(zi, t):
                return (zn[zi][0][t], zn[zi][1][t])

            got = [
                ((fp2_at(0, t), fp2_at(4, t), fp2_at(3, t)),
                 (fp2_at(2, t), fp2_at(1, t), fp2_at(5, t)))
                for t in range(len(elems))
            ]
            want = []
            for g in elems:
                h = g
                for _ in range(count):
                    h = GF.fp12_cyclotomic_sqr(h)
                want.append(h)
            assert got == want, f"count={count}"

    check("cyclo_sqr", t_cyclo)

    # --- Miller step kernels (vs stacked jnp with fusion off) --------------
    def t_steps():
        from bls_verify_gadget_tpu.golden import bls as gbls
        from bls_verify_gadget_tpu.ops import pairing as PR
        from bls_verify_gadget_tpu.utils.config import config

        b = 4
        sks = [rng.randrange(1, C.R) for _ in range(b)]
        qs = [gbls.sign(sk, b"tpu selftest") for sk in sks]
        pks = [gbls.sk_to_pk(sk) for sk in sks]
        xq = (_enc([q[0][0] for q in qs]), _enc([q[0][1] for q in qs]))
        yq = (_enc([q[1][0] for q in qs]), _enc([q[1][1] for q in qs]))
        one2 = (_enc([1] * b), _enc([0] * b))
        xp = _enc([p[0] for p in pks])
        yp = _enc([p[1] for p in pks])
        old = config.fuse_steps
        config.fuse_steps = False
        try:
            tj, linej = PR._dbl_step((xq, yq, one2), xp, yp)
            taj, lineaj = PR._add_step(tj, (xq, yq), xp, yp)
        finally:
            config.fuse_steps = old
        o = K.dbl_step(
            [xq[0], xq[1], yq[0], yq[1], one2[0], one2[1], xp, yp],
            PR._TWIST_B_STATIC,
        )
        tk = ((o[0], o[1]), (o[2], o[3]), (o[4], o[5]))
        oa = K.add_step(
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

    check("miller_steps", t_steps)

    # --- fused Jacobian point kernels --------------------------------------
    def t_pt():
        from bls_verify_gadget_tpu.golden import bls as gbls
        from bls_verify_gadget_tpu.ops import curve as CV

        sks = [rng.randrange(1, C.R) for _ in range(4)]
        g1s = [gbls.sk_to_pk(sk) for sk in sks]
        g2s = [gbls.sign(sk, b"tpu pt selftest") for sk in sks]
        for name, ops, enc, pts in (
            ("fp", CV.FP_OPS, CV.g1_encode_batch, g1s),
            ("fp2", CV.FP2_OPS, CV.g2_encode_batch, g2s),
        ):
            if name == "fp":
                neg = lambda p: (p[0], C.P - p[1])
            else:
                neg = lambda p: (p[0], (C.P - p[1][0], (C.P - p[1][1]) % C.P))
            P = enc([pts[0], pts[1], pts[2], None, pts[3]])
            Q = enc([pts[1], pts[1], neg(pts[2]), pts[0], None])
            P = CV.pt_double(ops, P)
            Qd = CV.pt_double(ops, Q)
            want_d = CV.pt_double(ops, P)
            want_a = CV.pt_add(ops, P, Qd)
            od = K.pt_dbl(CV._fused_pt_coords(ops, [P]), name)
            oa = K.pt_add(CV._fused_pt_coords(ops, [P, Qd]), name)
            for got, want in (
                (CV._fused_pt_unflat(ops, od), want_d),
                (CV._fused_pt_unflat(ops, oa), want_a),
            ):
                for g, w in zip(
                    CV._fused_pt_coords(ops, [got]),
                    CV._fused_pt_coords(ops, [want]),
                ):
                    np.testing.assert_array_equal(
                        np.asarray(g), np.asarray(w), err_msg=name
                    )
        # multi-double run (count=4, fp2)
        P = CV.g2_encode_batch(g2s[:3] + [None])
        want = P
        for _ in range(4):
            want = CV.pt_double(CV.FP2_OPS, want)
        o = K.pt_dbl(CV._fused_pt_coords(CV.FP2_OPS, [P]), "fp2", count=4)
        got = CV._fused_pt_unflat(CV.FP2_OPS, o)
        for g, w in zip(
            CV._fused_pt_coords(CV.FP2_OPS, [got]),
            CV._fused_pt_coords(CV.FP2_OPS, [want]),
        ):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    check("pt_dbl_add", t_pt)

    # --- pow-window kernels -------------------------------------------------
    def t_sqr4():
        b = 6
        f2s, m2s = _rand_fp2(b), _rand_fp2(b)
        c = [_enc([v[k] for v in vs]) for vs in (f2s, m2s) for k in range(2)]
        o = K.sqr4_mul(c)
        got = list(zip(FP.decode(np.asarray(o[0])), FP.decode(np.asarray(o[1]))))
        assert got == [GF.fp2_mul(GF.fp2_pow(f, 16), m) for f, m in zip(f2s, m2s)]
        fs, ms = _vals(b, C.P), _vals(b, C.P)
        o = K.sqr4_mul_fp(_enc(fs), [_enc(ms)])
        assert FP.decode(np.asarray(o)) == [
            pow(f, 16, C.P) * m % C.P for f, m in zip(fs, ms)
        ]

    check("sqr4_mul", t_sqr4)

    # --- MXU reduction variant (flag-gated; still must be correct) ----------
    def t_mxu():
        Km = FieldKernels(FP, tile=args.tile)
        Km.mxu = True
        assert FP.decode(np.asarray(Km.mul(ax, ay))) == [
            x * y % C.P for x, y in zip(xs, ys)
        ]

    check("mxu_mul", t_mxu)

    def t_cios3():
        Kc = FieldKernels(FP, tile=args.tile)
        Kc.mxu = "cios3"
        assert FP.decode(np.asarray(Kc.mul(ax, ay))) == [
            x * y % C.P for x, y in zip(xs, ys)
        ]

    check("cios3_mul", t_cios3)

    n_fail = sum(1 for r in RESULTS if not r["ok"])
    print(json.dumps({
        "metric": "tpu_kernel_selftest",
        "kernels": len(RESULTS),
        "failed": n_fail,
        "device": str(dev),
        "results": RESULTS,
    }))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
