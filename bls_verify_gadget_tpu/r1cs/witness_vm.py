"""Batch-parallel device replay of a circuit's witness-generation tape.

ConstraintSystem.record() captures, at every allocation site, how the new
witnesses derive from LCs over earlier variables (9 kinds cover the whole
BLS verify circuit: input / mul / xor / bits / inv / inv0 / fp2inv0 /
fp2div0 / sqrt2).  compile_tape() wave-schedules the entries by data
dependency and groups same-kind/same-shape entries per wave; run_tape()
executes the groups on device, producing the full (B, num_vars, NLIMB)
Montgomery witness batch for B independent inputs — the host builds the
circuit once, the device generates every proof's assignment.

The reference has no equivalent: arkworks regenerates witnesses per proof
on the CPU (rayon, one element at a time).  This is the TPU-shaped
replacement: one tape, data-parallel replay.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as C
from ..ops.fp import FP, int_to_limbs
from ..ops import tower as T

NL = C.NLIMB
# plain (non-Montgomery) limbs of 1, kept as numpy so each trace lifts its
# own constant (a cached jnp array created inside a jit trace would leak
# the tracer)
_RAW_ONE = np.array(int_to_limbs(1, C.NLIMB), np.uint32)


def _raw_one():
    return jnp.asarray(_RAW_ONE)


class CompiledTape:
    __slots__ = ("groups", "num_vars", "input_vars", "bit_table")

    def __init__(self, groups, num_vars, input_vars):
        self.groups = groups
        self.num_vars = num_vars
        self.input_vars = input_vars  # var indices in tape order
        self.bit_table = jnp.asarray(FP.encode([0, 1]))  # (2, NL)


def _bucket(n):
    b = 1
    while b < n:
        b *= 2
    return b


def compile_tape(cs):
    """Wave-schedule cs.tape and pack each (wave, kind, meta, width-bucket)
    group into numpy arrays ready for device replay."""
    V = len(cs.assignments)
    wave_of = np.zeros(V, np.int64)  # availability wave per var (0 = start)
    groups_map = {}
    input_vars = []
    order = []

    for e in cs.tape:
        kind = e["kind"]
        if kind == "input":
            input_vars.extend(e["outs"])
            continue
        deps = [i for lc in e["lcs"] for i, _ in lc]
        w = (max((wave_of[d] for d in deps), default=0)) + 1
        width = _bucket(max(1, max(len(lc) for lc in e["lcs"])))
        key = (int(w), kind, e["meta"], width)
        g = groups_map.get(key)
        if g is None:
            g = {"kind": kind, "meta": e["meta"], "width": width,
                 "outs": [], "lcs": []}
            groups_map[key] = g
            order.append(key)
        g["outs"].append(e["outs"])
        g["lcs"].append(e["lcs"])
        for o in e["outs"]:
            wave_of[o] = w

    order.sort(key=lambda k: k[0])
    packed = []
    for key in order:
        g = groups_map[key]
        G = len(g["outs"])
        n_ops = len(g["lcs"][0])
        W = g["width"]
        idx = np.zeros((n_ops, G, W), np.int32)
        coeff_obj = np.zeros((n_ops, G, W), object)
        for gi, lcs in enumerate(g["lcs"]):
            for oi, lc in enumerate(lcs):
                for t, (v, co) in enumerate(lc):
                    idx[oi, gi, t] = v
                    coeff_obj[oi, gi, t] = co % C.P
        from .evaluator import _encode_coeffs

        coeff = np.stack(
            [_encode_coeffs(coeff_obj[oi]) for oi in range(n_ops)]
        )  # (n_ops, G, W, NL)
        packed.append(
            {
                "kind": g["kind"],
                "meta": g["meta"],
                "outs": np.asarray(g["outs"], np.int32),  # (G, n_outs)
                "idx": idx,
                "coeff": coeff,
                # staged device copies (one-time): replay then avoids a
                # host->device transfer per group per batch
                "outs_d": jnp.asarray(np.asarray(g["outs"], np.int32)),
                "idx_d": jnp.asarray(idx),
                "coeff_d": jnp.asarray(coeff),
            }
        )
    return CompiledTape(packed, V, input_vars)


def _eval_lcs(wit, idx, coeff):
    """wit (B, V, L); idx (n_ops, G, W); coeff (n_ops, G, W, L) ->
    (n_ops, B, G, L) LC evaluations."""
    outs = []
    for oi in range(idx.shape[0]):
        vals = wit[:, idx[oi], :]              # (B, G, W, L)
        prods = FP.mul(vals, coeff[oi])
        acc = prods[..., 0, :]
        for t in range(1, prods.shape[-2]):
            acc = FP.add(acc, prods[..., t, :])
        outs.append(acc)
    return outs


def _demont(x):
    """Montgomery -> standard-residue limbs (mont_mul by raw 1)."""
    return FP.mul(x, jnp.broadcast_to(_raw_one(), x.shape))


def _scatter(wit, outs_col, vals):
    """outs_col (G,) var indices; vals (B, G, L)."""
    return wit.at[:, outs_col, :].set(vals)


def _exec_group(kind, meta, bit_table, wit, idx, coeff, outs):
    """Execute one group functionally: returns the updated witness.  Pure
    in (wit, idx, coeff, outs) for a static (kind, meta) — jitted per kind
    with the witness buffer donated, so replay becomes one cached
    executable per (kind, shape) signature (SHA rounds, ladder steps and
    schedule words all reuse the same compiled programs)."""
    ev = _eval_lcs(wit, idx, coeff)
    if kind == "mul":
        return _scatter(wit, outs[:, 0], FP.mul(ev[0], ev[1]))
    if kind == "xor":
        ab = FP.mul(ev[0], ev[1])
        vals = FP.sub(FP.add(ev[0], ev[1]), FP.add(ab, ab))
        return _scatter(wit, outs[:, 0], vals)
    if kind == "bits":
        nbits = meta
        B = wit.shape[0]
        std = _demont(ev[0])  # (B, G, L) standard limbs
        pos = np.arange(nbits)
        limb_sel = std[..., pos // 16]            # (B, G, nbits)
        bits = (limb_sel >> jnp.asarray(pos % 16, jnp.uint32)) & 1
        mont_bits = bit_table[bits]               # (B, G, nbits, L)
        return wit.at[:, outs.reshape(-1), :].set(mont_bits.reshape(B, -1, NL))
    if kind == "inv":
        return _scatter(wit, outs[:, 0], FP.pow_const(ev[0], C.P - 2))
    if kind == "inv0":
        z = FP.is_zero(ev[0])                     # (B, G) bool
        wit = _scatter(wit, outs[:, 0], bit_table[z.astype(jnp.int32)])
        return _scatter(wit, outs[:, 1], FP.pow_const(ev[0], C.P - 2))
    if kind == "fp2inv0":
        i0, i1 = _fp2_inv0(ev[0], ev[1])
        wit = _scatter(wit, outs[:, 0], i0)
        return _scatter(wit, outs[:, 1], i1)
    if kind == "fp2inv0z":
        d0, d1 = ev
        i0, i1 = _fp2_inv0(d0, d1)
        z = FP.is_zero(d0) & FP.is_zero(d1)
        wit = _scatter(wit, outs[:, 0], i0)
        wit = _scatter(wit, outs[:, 1], i1)
        return _scatter(wit, outs[:, 2], bit_table[z.astype(jnp.int32)])
    if kind == "fp2div0":
        n0, n1, d0, d1 = ev
        i0, i1 = _fp2_inv0(d0, d1)
        (lam,) = T.fp2_mul_pairs([((n0, n1), (i0, i1))])
        wit = _scatter(wit, outs[:, 0], lam[0])
        return _scatter(wit, outs[:, 1], lam[1])
    if kind == "fp6inv":
        a6 = ((ev[0], ev[1]), (ev[2], ev[3]), (ev[4], ev[5]))
        flat = [c for f2 in T.fp6_inv(a6) for c in f2]
        for k in range(6):
            wit = _scatter(wit, outs[:, k], flat[k])
        return wit
    if kind == "fp12inv":
        a12 = (
            ((ev[0], ev[1]), (ev[2], ev[3]), (ev[4], ev[5])),
            ((ev[6], ev[7]), (ev[8], ev[9]), (ev[10], ev[11])),
        )
        flat = [c for c6 in T.fp12_inv(a12) for f2 in c6 for c in f2]
        for k in range(12):
            wit = _scatter(wit, outs[:, k], flat[k])
        return wit
    if kind == "sqrt2":
        from ..ops.hash_to_g2 import fp2_sqrt_candidates

        g10, g11, g20, g21 = ev
        s1, ok1 = fp2_sqrt_candidates((g10, g11))
        s2, _ = fp2_sqrt_candidates((g20, g21))
        y = T.fp2_cmov(ok1, s1, s2)
        wit = _scatter(wit, outs[:, 0], bit_table[ok1.astype(jnp.int32)])
        wit = _scatter(wit, outs[:, 1], y[0])
        return _scatter(wit, outs[:, 2], y[1])
    raise ValueError(f"unknown tape kind {kind}")  # pragma: no cover


_JITTED = {}


def _group_fn(kind, meta):
    key = (kind, meta)
    fn = _JITTED.get(key)
    if fn is None:
        import functools

        fn = jax.jit(
            functools.partial(_exec_group, kind, meta),
            donate_argnums=1,  # update the witness buffer in place
        )
        _JITTED[key] = fn
    return fn


def run_tape(ct: CompiledTape, input_limbs, batch: int):
    """input_limbs: (B, n_inputs, NLIMB) Montgomery values for
    ct.input_vars (in that order).  Returns (B, num_vars, NLIMB)."""
    B = batch
    wit = jnp.zeros((B, ct.num_vars, NL), jnp.uint32)
    wit = wit.at[:, 0, :].set(jnp.broadcast_to(jnp.asarray(FP.ONE), (B, NL)))
    if ct.input_vars:
        wit = wit.at[:, np.asarray(ct.input_vars, np.int32), :].set(
            jnp.asarray(input_limbs)
        )
    import os
    import sys

    progress = os.environ.get("BLS_VM_PROGRESS") == "1"
    for gi, g in enumerate(ct.groups):
        if progress and gi % 500 == 0:
            wit.block_until_ready()
            print(f"vm: group {gi}/{len(ct.groups)}", file=sys.stderr, flush=True)
        wit = _group_fn(g["kind"], g["meta"])(
            ct.bit_table,
            wit,
            g["idx_d"],
            g["coeff_d"],
            g["outs_d"],
        )
    return wit



def _fp2_inv0(d0, d1):
    """(d0 + d1 u)^-1 (or 0): conj / norm."""
    norm = FP.add(FP.mul(d0, d0), FP.mul(d1, d1))
    ninv = FP.pow_const(norm, C.P - 2)
    return FP.mul(d0, ninv), FP.neg(FP.mul(d1, ninv))
