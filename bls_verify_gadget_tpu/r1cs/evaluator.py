"""TPU-batched R1CS satisfiability checking.

Constraint rows are exported by ConstraintSystem.to_arrays as fixed-width
(row, W) index/coefficient tables; evaluation is a batched sparse dot over
the witness tensor in Montgomery limb form:

    <A_i, w> * <B_i, w> == <C_i, w>   for every row i, every batch element.

Correctness with Montgomery forms: with w and coefficients both in Montgomery
form, mont_mul gives the Montgomery form of the product, sums stay in
Montgomery form, and the final mont_mul(A, B) = (a*b)R compares directly
against C = cR.

Rows are processed in chunks under lax.scan to bound the gather footprint
(SURVEY.md sec 7: "witness evaluation = batched a*b=c verification over Fq",
the TPU replacement for ark-relations' host-side checking).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fp import FP
from .. import constants as C


def encode_witness(assignments) -> np.ndarray:
    """Python-int assignment vector -> (num_vars, 24) Montgomery limbs."""
    return FP.encode(list(assignments))


def encode_witness_batch(batch_assignments) -> np.ndarray:
    """List of assignment vectors -> (B, num_vars, 24)."""
    return np.stack([encode_witness(a) for a in batch_assignments])


def _encode_coeffs(coeff_obj: np.ndarray) -> np.ndarray:
    """(R, W) object array of python ints -> (R, W, 24) Montgomery limbs.
    Coefficient values repeat massively (0/1/-1, powers of two, 256^i), so
    encode each unique value once and scatter — ~1000x less bigint work on
    full-size circuits."""
    r, w = coeff_obj.shape
    flat = [int(x) if x else 0 for x in coeff_obj.reshape(-1)]
    uniq = sorted(set(flat))
    lut = {v: i for i, v in enumerate(uniq)}
    table = FP.encode(uniq)  # (U, 24)
    idx = np.fromiter((lut[v] for v in flat), np.int64, len(flat))
    return np.asarray(table)[idx].reshape(r, w, C.NLIMB)


def prepare(arrays):
    """to_arrays() output -> device-ready dict (pads rows to a chunkable
    multiple)."""
    out = {"num_vars": arrays["num_vars"]}
    for side in "abc":
        out[f"{side}_idx"] = np.asarray(arrays[f"{side}_idx"], np.int32)
        out[f"{side}_coeff"] = _encode_coeffs(arrays[f"{side}_coeff"])
    for k in ("aux_var", "aux_row"):
        if k in arrays:
            out[k] = np.asarray(arrays[k], np.int32)
    return out


def complete_witness(prepared, witness):
    """Materialise the LC-split auxiliary partial-sum variables ON DEVICE.

    witness: (B, num_vars, L) with the base (gadget-allocated) columns
    filled and the aux columns arbitrary (e.g. zero).  Each aux variable's
    value is the A-side dot of its binding constraint (tail * 1 = s,
    system._cap_row_widths); a tail may reference later-appended aux vars,
    so the scan runs in REVERSE append order (later rows never reference
    earlier aux vars).  Returns the fully populated witness."""
    aux_var = prepared.get("aux_var")
    if aux_var is None or len(aux_var) == 0:
        return witness
    rows = prepared["aux_row"]
    idx = jnp.asarray(prepared["a_idx"][rows][::-1])        # (N, W)
    coeff = jnp.asarray(prepared["a_coeff"][rows][::-1])    # (N, W, L)
    var = jnp.asarray(aux_var[::-1].astype(np.int32))       # (N,)

    def body(w, xs):
        vi, ri, rc = xs
        vals = w[:, ri, :]                   # (B, W, L)
        prods = FP.mul(vals, rc)
        acc = prods[:, 0, :]
        for j in range(1, prods.shape[1]):
            acc = FP.add(acc, prods[:, j, :])
        w = jax.lax.dynamic_update_slice(w, acc[:, None, :], (0, vi, 0))
        return w, None

    out, _ = jax.lax.scan(body, jnp.asarray(witness), (var, idx, coeff))
    return out


def _dot_rows(witness, idx, coeff):
    """witness (B, V, L); idx (R, W); coeff (R, W, L) -> (B, R, L) mod-p
    row dot products."""
    vals = witness[:, idx, :]  # (B, R, W, L)
    prods = FP.mul(vals, coeff)  # broadcast coeff over batch
    # tree-reduce the W terms with stacked adds
    w = prods.shape[-2]
    while w > 1:
        half = w // 2
        lo = prods[..., :half, :]
        hi = prods[..., half : 2 * half, :]
        s = FP.add(lo, hi)
        if w % 2:
            s = jnp.concatenate([s, prods[..., 2 * half :, :]], axis=-2)
            w = half + 1
        else:
            w = half
        prods = s
    return prods[..., 0, :]


def check_satisfied(prepared, witness_limbs, chunk: int = 8192):
    """-> (B,) bool: every constraint row holds for every batch element.
    Scans over row chunks to bound memory."""
    witness = jnp.asarray(witness_limbs)
    n_rows = prepared["a_idx"].shape[0]
    n_chunks = -(-n_rows // chunk)
    pad = n_chunks * chunk - n_rows

    def pad_rows(x, is_idx):
        if pad == 0:
            return x
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, cfg)  # zero rows: <0,w>*<0,w> == <0,w> holds

    data = {}
    for side in "abc":
        data[f"{side}_idx"] = jnp.asarray(
            pad_rows(prepared[f"{side}_idx"], True).reshape(n_chunks, chunk, -1)
        )
        co = pad_rows(prepared[f"{side}_coeff"], False)
        data[f"{side}_coeff"] = jnp.asarray(
            co.reshape(n_chunks, chunk, co.shape[-2], co.shape[-1])
        )

    def body(ok, xs):
        ai, ac, bi, bc, ci, cc = xs
        a = _dot_rows(witness, ai, ac)
        b = _dot_rows(witness, bi, bc)
        c = _dot_rows(witness, ci, cc)
        ab = FP.mul(a, b)
        row_ok = jnp.all(FP.eq(ab, c), axis=-1)  # (B,)
        return ok & row_ok, None

    ok0 = jnp.ones((witness.shape[0],), bool)
    ok, _ = jax.lax.scan(
        body,
        ok0,
        (
            data["a_idx"], data["a_coeff"],
            data["b_idx"], data["b_coeff"],
            data["c_idx"], data["c_coeff"],
        ),
    )
    return ok
