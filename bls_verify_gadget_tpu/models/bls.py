"""Batched BLS scheme on device (ETH2 min-pubkey-size: pk in G1, sig in G2).

This is the flagship "model": jittable batch-first keygen / sign / verify /
aggregate built on the ops/ kernel stack.  The host-side wire codecs live in
golden/bls.py (deserialization is an I/O-boundary concern, as in the
reference's Rust crate); this module consumes decoded affine points.

Semantics mirror the reference exactly:
  * verify = identity-pk rejection + on-curve/subgroup checks for pk and sig
    + e(-g1, sig) * e(pk, H(m)) == 1   (reference src/bls.rs:427-458)
  * sign = H(m) * sk with zero-sk rejection (src/bls.rs:411-425)
  * aggregation = projective sums (src/bls.rs:183-196, :288-301)
"""

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .. import constants as C
from ..ops.fp import FP, FR
from ..ops import tower as T
from ..ops import curve as CV
from ..ops import pairing as PR
from ..ops.hash_to_g2 import hash_to_g2
from ..utils.config import config
from ..utils.profiling import named_scope


@dataclasses.dataclass
class Params:
    """Scheme parameters (reference Parameters, src/bls.rs:25-50): the G1
    generator, as device affine coordinates."""

    g1_x: Any = None
    g1_y: Any = None

    def __post_init__(self):
        if self.g1_x is None:
            self.g1_x = jnp.asarray(FP.encode(C.G1_GEN[0]))
            self.g1_y = jnp.asarray(FP.encode(C.G1_GEN[1]))


class BatchedBLS:
    """Batch-first BLS over the device kernels.  All methods are jittable;
    batch shapes are leading dims."""

    def __init__(self, params: Params | None = None):
        self.params = params or Params()

    # ------------------------------------------------------------------
    # keygen / sign
    # ------------------------------------------------------------------

    def derive_pubkeys(self, sk_limbs):
        """sk_limbs: (..., 16) raw (non-Montgomery) Fr limbs ->
        G1 Jacobian pubkeys (reference src/bls.rs:210-216)."""
        gen = tuple(
            jnp.broadcast_to(c, sk_limbs.shape[:-1] + c.shape)
            for c in CV.G1_GEN_JAC
        )
        return CV.pt_mul_var(CV.FP_OPS, gen, sk_limbs, 255)

    def sign(self, sk_limbs, msg_u8, msg_len: int, msg_lens=None):
        """-> (sig Jacobian G2, valid mask).  Zero keys yield valid=False
        (reference rejects them, src/bls.rs:417-419)."""
        h = hash_to_g2(msg_u8, msg_len, lens=msg_lens)
        sig = CV.pt_mul_var(CV.FP2_OPS, h, sk_limbs, 255)
        nonzero = ~jnp.all(sk_limbs == 0, axis=-1)
        return sig, nonzero

    # ------------------------------------------------------------------
    # verify
    # ------------------------------------------------------------------

    def hash_stage(self, msg_u8, msg_len: int, msg_lens=None):
        """Stage 1 of verify: h = hash_to_g2(msg) as affine coordinates
        (for the mixed-addition Miller loop).  Split out so callers that
        need compile-lean programs (parallel/api.py staged sharding) can
        jit the stages separately.  `msg_lens` (per-element byte lengths)
        enables mixed-length batches; msg_len is then the padded width."""
        with named_scope("bls_hash_to_g2"):
            h_jac = hash_to_g2(msg_u8, msg_len, lens=msg_lens)
            return CV.pt_to_affine(CV.FP2_OPS, h_jac)

    def miller_stage(self, pk_aff, sig_aff, h_aff):
        """Stage 2a of verify: validity checks + the shared Miller loop for
        e(-g1, sig) * e(pk, h).  Returns (f, checks_ok) with f the
        un-final-exponentiated Fp12 accumulator — split out (like
        hash_stage) so compile-lean callers can jit the Miller loop and the
        final exponentiation as separate XLA programs."""
        pk_x, pk_y, pk_inf = pk_aff
        sig_x, sig_y, sig_inf = sig_aff
        h_x, h_y, h_inf = h_aff

        # validity checks (the reference errors; we mask to False)
        with named_scope("bls_validity_checks"):
            pk_jac = CV.pt_from_affine(CV.FP_OPS, pk_x, pk_y, pk_inf)
            sig_jac = CV.pt_from_affine(CV.FP2_OPS, sig_x, sig_y, sig_inf)
            pk_ok = ~pk_inf & CV.pt_on_curve_affine(
                CV.FP_OPS, pk_x, pk_y, CV.B_G1_MONT
            )
            sig_on_curve = CV.pt_on_curve_affine(
                CV.FP2_OPS, sig_x, sig_y, CV.B_G2_MONT
            )
            sig_ok = sig_inf | sig_on_curve
            if config.check_subgroups:
                pk_ok &= CV.g1_in_subgroup(pk_jac)
                sig_ok &= sig_inf | CV.g2_in_subgroup(sig_jac)

        with named_scope("bls_miller_loop"):
            neg_g1 = (
                jnp.broadcast_to(self.params.g1_x, pk_x.shape),
                FP.neg(jnp.broadcast_to(self.params.g1_y, pk_y.shape)),
            )
            f = PR.multi_miller_loop([
                (neg_g1, (sig_x, sig_y), ~sig_inf),
                ((pk_x, pk_y), (h_x, h_y), ~h_inf),
            ])
        return f, pk_ok & sig_ok

    def finalexp_stage(self, f, checks_ok):
        """Stage 2b of verify: final exponentiation + the is-one test,
        masked by the stage-2a validity checks."""
        with named_scope("bls_final_exp"):
            prod = PR.final_exponentiation(f)
            paired_one = T.fp12_is_one(prod)
        return paired_one & checks_ok

    def pairing_stage(self, pk_aff, sig_aff, h_aff):
        """Stage 2 of verify: validity checks + the pairing product test
        against a precomputed affine h = hash_to_g2(msg)."""
        f, checks_ok = self.miller_stage(pk_aff, sig_aff, h_aff)
        return self.finalexp_stage(f, checks_ok)

    def verify(self, pk_aff, sig_aff, msg_u8, msg_len: int, msg_lens=None):
        """Batched verification.

        pk_aff  = (x, y, is_inf): affine G1 limb tensors + infinity mask
        sig_aff = (x2, y2, is_inf): affine G2 (Fp2 pairs) + infinity mask
        msg_u8  = (..., msg_len) byte tensor
        msg_lens = optional (...,) per-element byte lengths for
        mixed-length batches (msg_u8 is then padded to msg_len)

        Returns a boolean tensor (...,).  Semantics (reference
        src/bls.rs:427-458): identity pk -> False; pk/sig failing
        on-curve/subgroup -> False; else the pairing product test.
        `config.check_subgroups=False` skips the (expensive) subgroup
        checks for callers that pre-validate inputs (the reference always
        checks natively, src/bls.rs:438-447)."""
        return self.pairing_stage(
            pk_aff, sig_aff, self.hash_stage(msg_u8, msg_len, msg_lens)
        )

    def aggregate_verify_distinct(self, pk_aff, sig_aff, msg_u8, msg_len: int):
        """Distinct-message aggregate verification (IETF AggregateVerify):
        n pubkeys sign n messages, one aggregated signature.

        pk_aff: (x, y, inf) batched over the n pubkeys;
        sig_aff: single aggregated G2 signature with leading dim 1;
        msg_u8: (n, msg_len).

        Uses the batch axis for the n+1 pairing pairs — ONE shared Miller
        loop over the batch, an fp12 product tree, one final exponentiation.
        Returns a scalar boolean."""
        pk_x, pk_y, pk_inf = pk_aff
        sig_x, sig_y, sig_inf = sig_aff

        pk_jac = CV.pt_from_affine(CV.FP_OPS, pk_x, pk_y, pk_inf)
        pk_ok = jnp.all(
            ~pk_inf
            & CV.pt_on_curve_affine(CV.FP_OPS, pk_x, pk_y, CV.B_G1_MONT)
            & CV.g1_in_subgroup(pk_jac)
        )
        sig_jac = CV.pt_from_affine(CV.FP2_OPS, sig_x, sig_y, sig_inf)
        sig_ok = jnp.all(
            sig_inf
            | (
                CV.pt_on_curve_affine(CV.FP2_OPS, sig_x, sig_y, CV.B_G2_MONT)
                & CV.g2_in_subgroup(sig_jac)
            )
        )

        h_jac = hash_to_g2(msg_u8, msg_len)
        h_x, h_y, h_inf = CV.pt_to_affine(CV.FP2_OPS, h_jac)

        # pairs: (pk_i, H(m_i)) for each i, plus (-g1, sig) appended
        def cat(a, b):
            return jnp.concatenate([a, jnp.broadcast_to(b, b.shape)], axis=0)

        neg_g1y = FP.neg(self.params.g1_y)
        p_all_x = cat(pk_x, self.params.g1_x[None])
        p_all_y = cat(pk_y, neg_g1y[None])
        q_all_x = (cat(h_x[0], sig_x[0][:1]), cat(h_x[1], sig_x[1][:1]))
        q_all_y = (cat(h_y[0], sig_y[0][:1]), cat(h_y[1], sig_y[1][:1]))
        valid = jnp.concatenate([~h_inf, ~sig_inf[:1]], axis=0)

        f = PR.multi_miller_loop([
            ((p_all_x, p_all_y), (q_all_x, q_all_y), valid)
        ])
        total = T.fp12_prod(f, axis=0)
        prod = PR.final_exponentiation(total)
        return T.fp12_is_one(prod) & pk_ok & sig_ok

    # ------------------------------------------------------------------
    # aggregation
    # ------------------------------------------------------------------

    def aggregate_pubkeys(self, pk_jac, axis: int = 0):
        """Projective sum over a batch axis (reference src/bls.rs:182-196).
        Empty-input handling (None) lives at the host API layer."""
        return CV.pt_sum(CV.FP_OPS, pk_jac, axis)

    def aggregate_signatures(self, sig_jac, axis: int = 0):
        return CV.pt_sum(CV.FP2_OPS, sig_jac, axis)

    def aggregate_pubkeys_masked(self, pk_jac, bitmap, axis: int = 0):
        """Bitmap-gated aggregation: sum of pk_i where bitmap_i == 1, plus
        the count of set bits — the device analogue of the reference's
        mapped_aggregate (src/constraints.rs:169-191)."""
        inf = CV.pt_infinity_like(CV.FP_OPS, pk_jac)
        masked = CV.pt_cmov(CV.FP_OPS, bitmap > 0, pk_jac, inf)
        count = jnp.sum(bitmap.astype(jnp.uint32), axis=axis)
        return CV.pt_sum(CV.FP_OPS, masked, axis), count


# ----------------------------------------------------------------------------
# host-side convenience: wire bytes -> device batches
# ----------------------------------------------------------------------------

def encode_pubkeys(points):
    """Host affine G1 points (int tuples / None) -> (x, y, is_inf) device."""
    import numpy as np

    xs = [0 if p is None else p[0] for p in points]
    ys = [1 if p is None else p[1] for p in points]
    inf = np.array([p is None for p in points])
    return (
        jnp.asarray(FP.encode(xs)),
        jnp.asarray(FP.encode(ys)),
        jnp.asarray(inf),
    )


def encode_signatures(points):
    """Host affine G2 points -> ((x0,x1),(y0,y1),is_inf) device."""
    import numpy as np

    x = [(0, 0) if p is None else p[0] for p in points]
    y = [(1, 0) if p is None else p[1] for p in points]
    inf = np.array([p is None for p in points])
    return (
        (jnp.asarray(FP.encode([c[0] for c in x])), jnp.asarray(FP.encode([c[1] for c in x]))),
        (jnp.asarray(FP.encode([c[0] for c in y])), jnp.asarray(FP.encode([c[1] for c in y]))),
        jnp.asarray(inf),
    )


def encode_messages(msgs):
    """Equal-length host byte strings -> (B, L) uint32 byte tensor."""
    import numpy as np

    L = len(msgs[0])
    assert all(len(m) == L for m in msgs), "batch messages must share a length"
    if L == 0:
        return jnp.zeros((len(msgs), 0), jnp.uint32)
    return jnp.asarray(
        np.stack([np.frombuffer(m, np.uint8).astype(np.uint32) for m in msgs])
    )


def encode_messages_var(msgs, pad_to: int | None = None):
    """Mixed-length host byte strings -> (msg_u8 (B, L), lens (B,), L):
    zero-padded to the batch max (or `pad_to`), with the per-element byte
    lengths that verify/sign/hash_stage take as `msg_lens`.  Bucketing
    batches by a few pad widths keeps jit signatures few."""
    import numpy as np

    L = max((len(m) for m in msgs), default=0) if pad_to is None else pad_to
    assert all(len(m) <= L for m in msgs)
    buf = np.zeros((len(msgs), L), np.uint32)
    for i, m in enumerate(msgs):
        buf[i, : len(m)] = np.frombuffer(m, np.uint8)
    lens = np.asarray([len(m) for m in msgs], np.uint32)
    return jnp.asarray(buf), jnp.asarray(lens), L


def encode_scalars(sks):
    """Host ints -> (B, 16) raw Fr limb tensor (non-Montgomery)."""
    from ..ops.limbs import ints_to_limbs

    return jnp.asarray(ints_to_limbs([s % C.R for s in sks], C.NLIMB_FR))
