"""Quickstart: everything a user of the reference crate needs, end to end.

Run:  python examples/quickstart.py          (host flows run anywhere;
                                              the batched device flow uses
                                              whatever backend jax picks)
"""

import random
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bls_verify_gadget_tpu.golden import bls

rng = random.Random(42)

# --- 1. keys, signing, verification (reference SignatureScheme surface) ----
sk, pk = bls.keygen(rng)
msg = b"example message of exactly 32 b."
assert len(msg) == 32
sig = bls.sign(sk, msg)
assert bls.verify(pk, msg, sig)
assert not bls.verify(pk, b"Example message of exactly 32 b.", sig)
print("sign/verify: ok")

# --- 2. wire codecs (48B pk / 96B sig compressed, LE scalar) ---------------
pk2 = bls.g1_decompress(bls.g1_compress(pk))
sig2 = bls.g2_decompress(bls.g2_compress(sig))
assert bls.verify(pk2, msg, sig2)
sk2 = bls.sk_from_hex(bls.sk_to_hex(sk))
assert sk2 == sk
print("codecs: ok")

# --- 3. aggregation -----------------------------------------------------
others = [bls.keygen(rng) for _ in range(3)]
sigs = [sig] + [bls.sign(s, msg) for s, _ in others]
agg = bls.aggregate_signatures(sigs)
assert bls.fast_aggregate_verify([pk] + [p for _, p in others], msg, agg)
# distinct messages
msgs = [bytes([i]) * 32 for i in range(3)]
dsigs = [bls.sign(s, m) for (s, _), m in zip(others, msgs)]
assert bls.aggregate_verify([p for _, p in others], msgs, bls.aggregate_signatures(dsigs))
print("aggregation: ok")

# --- 4. batched device verification (the TPU path) -------------------------
import jax
from bls_verify_gadget_tpu.models.bls import (
    BatchedBLS, encode_pubkeys, encode_signatures, encode_messages,
)

B = 8
batched = BatchedBLS()
out = jax.jit(lambda p, s, m: batched.verify(p, s, m, 32))(
    encode_pubkeys([pk] * B),
    encode_signatures([sig] * B),
    encode_messages([msg] * B),
)
assert all(bool(b) for b in jax.device_get(out))
print(f"batched device verify (B={B}, backend={jax.default_backend()}): ok")

# --- 5. the constraint-gadget path (reference constraints.rs surface) ------
from bls_verify_gadget_tpu.r1cs.system import ConstraintSystem
from bls_verify_gadget_tpu.r1cs.gadgets import UInt8
from bls_verify_gadget_tpu.r1cs.verify import (
    ParametersVar, PublicKeyVar, SignatureVar, BlsSignatureVerifyGadget,
)

cs = ConstraintSystem()
ok = BlsSignatureVerifyGadget.verify(
    cs,
    ParametersVar.constant(cs),
    PublicKeyVar.alloc(cs, pk),
    [UInt8.alloc(cs, b) for b in msg],
    SignatureVar.alloc(cs, sig),
)
assert ok.value == 1 and cs.is_satisfied()
print(f"in-circuit verify: ok ({cs.num_constraints} constraints)")
print("quickstart complete")
