"""BlsSignatureVerifyGadget: the in-circuit BLS verification surface
(reference src/constraints.rs).

  * ParametersVar / PublicKeyVar / SignatureVar wrappers with
    constant/input/witness allocation (reference src/constraints.rs:23-68,
    :194-249)
  * verify: enforce pk != identity, hash the message in-circuit, pairing
    product e(-g1, sig) * e(pk, H(m)) == 1 (reference src/constraints.rs:
    90-128; subgroup checks are intentionally NOT enforced in-circuit,
    mirroring the comment at src/constraints.rs:101-105)
  * aggregate_verify / mapped_aggregate: bitmap-gated pk fold + set-bit
    count via UInt32 addmany (reference src/constraints.rs:149-192)
"""

from __future__ import annotations

import dataclasses

from .. import constants as C
from .system import ConstraintSystem, AllocationMode
from .gadgets import FpVar, Boolean, UInt8, UInt32
from .fields import Fp2Var
from . import curve as RC
from . import pairing as RP
from .hasher import hash_to_g2_gadget


@dataclasses.dataclass
class ParametersVar:
    """G1 generator (reference ParametersVar, src/constraints.rs:23-30)."""

    g1: RC.AffinePointVar

    @staticmethod
    def constant(cs) -> "ParametersVar":
        return ParametersVar(
            RC.AffinePointVar(
                FpVar.constant(cs, C.G1_GEN[0]),
                FpVar.constant(cs, C.G1_GEN[1]),
                Boolean.constant(cs, 0),
            )
        )


@dataclasses.dataclass
class PublicKeyVar:
    """G1 point (reference PublicKeyVar, src/constraints.rs:33-44)."""

    pt: RC.AffinePointVar

    @staticmethod
    def alloc(cs, pk, mode=AllocationMode.WITNESS) -> "PublicKeyVar":
        return PublicKeyVar(RC.alloc_g1(cs, pk, mode))

    def is_eq(self, other: "PublicKeyVar") -> Boolean:
        """EqGadget parity (reference src/constraints.rs:251-279)."""
        both_fin = self.pt.inf.not_().and_(other.pt.inf.not_())
        eq_xy = self.pt.x.is_eq(other.pt.x).and_(self.pt.y.is_eq(other.pt.y))
        both_inf = self.pt.inf.and_(other.pt.inf)
        return both_inf.or_(both_fin.and_(eq_xy))

    def to_bytes_le(self) -> list[UInt8]:
        """ToBytesGadget flavour (reference src/constraints.rs:281-297,
        arkworks affine to_bytes): little-endian x bytes, then y bytes, then
        one infinity byte (0/1) — 97 bytes total."""
        cs = self.pt.cs
        out = []
        for coord in (self.pt.x, self.pt.y):
            bits = coord.to_bits_le(384)
            for i in range(48):
                byte_bits = bits[8 * i : 8 * i + 8]
                val = sum(b.value << j for j, b in enumerate(byte_bits))
                out.append(UInt8(cs, byte_bits, val))
        zero = Boolean.constant(cs, 0)
        inf = self.pt.inf
        out.append(UInt8(cs, [inf] + [zero] * 7, inf.value))
        return out


@dataclasses.dataclass
class SignatureVar:
    """G2 point (reference SignatureVar, src/constraints.rs:47-68)."""

    pt: RC.AffinePointVar

    @staticmethod
    def alloc(cs, sig, mode=AllocationMode.WITNESS) -> "SignatureVar":
        return SignatureVar(RC.alloc_g2(cs, sig, mode))


class BlsSignatureVerifyGadget:
    """Reference BlsSignatureVerifyGadget (src/constraints.rs:70-192)."""

    @staticmethod
    def verify(
        cs: ConstraintSystem,
        params: ParametersVar,
        pk: PublicKeyVar,
        msg: list[UInt8],
        sig: SignatureVar,
    ) -> Boolean:
        # enforce pk is not the identity (reference src/constraints.rs:96-99)
        cs.enforce(pk.pt.inf.lc, [(0, 1)], [])
        # (subgroup checks intentionally skipped in-circuit,
        #  reference src/constraints.rs:101-105)
        neg_g1 = params.g1.negate()
        h = hash_to_g2_gadget(cs, msg)
        pairs = [
            ((neg_g1.x, neg_g1.y), (sig.pt.x, sig.pt.y), sig.pt.inf.not_()),
            ((pk.pt.x, pk.pt.y), (h.x, h.y), h.inf.not_()),
        ]
        f = RP.multi_pairing_gadget(cs, pairs)
        return RP.fp12_is_one_gadget(f)

    @staticmethod
    def mapped_aggregate(
        cs: ConstraintSystem,
        pubkeys: list[PublicKeyVar],
        bitmap: list[Boolean],
    ) -> tuple[PublicKeyVar, UInt32]:
        """Bitmap-gated fold: ret += bit ? pk_i : 0 with set-bit counting
        (reference src/constraints.rs:169-191)."""
        assert len(pubkeys) == len(bitmap)
        acc = RC.pt_infinity(pubkeys[0].pt.x)
        count = UInt32.constant(cs, 0)
        for pk, bit in zip(pubkeys, bitmap):
            added = RC.pt_add(acc, pk.pt)
            acc = added.select(bit, acc)
            # increment is the bit itself in the LSB (select(bit, 1, 0))
            inc = UInt32(
                cs, [bit] + [Boolean.constant(cs, 0)] * 31, 1 if bit.value else 0
            )
            count = UInt32.addmany([count, inc])
        return PublicKeyVar(acc), count

    @staticmethod
    def aggregate_verify(
        cs: ConstraintSystem,
        params: ParametersVar,
        pubkeys: list[PublicKeyVar],
        bitmap: list[Boolean],
        msg: list[UInt8],
        sig: SignatureVar,
    ) -> tuple[Boolean, UInt32]:
        """(reference src/constraints.rs:153-167)."""
        assert len(pubkeys) == len(bitmap)
        apk, count = BlsSignatureVerifyGadget.mapped_aggregate(cs, pubkeys, bitmap)
        ok = BlsSignatureVerifyGadget.verify(cs, params, apk, msg, sig)
        return ok, count
