"""End-to-end device witness generation for the FULL BLS verify circuit.

Builds the 601k-row BlsSignatureVerifyGadget circuit ONCE on the host,
compiles its witness tape (r1cs/witness_vm.py), replays it on device for a
batch of (pk, msg, sig) triples, completes the LC-split aux variables
(evaluator.complete_witness), and checks the whole batch through the
TPU-batched satisfiability evaluator — good witnesses accepted, a
corrupted one rejected.

Prints ONE JSON line with tape/replay/eval timings.

Usage: python tools/witness_vm_verify.py [--batch 4] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/bls_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

MSG_LEN = 24


def run(B: int) -> dict:
    """Build the full verify circuit, replay its witness tape on device for
    a batch of B triples, check satisfiability (good accepted / corrupted
    rejected), and return the timing/throughput record.  Called by main()
    and by tests/test_witness_vm_full.py (marked heavy)."""
    import random

    from bls_verify_gadget_tpu.golden import bls as gbls
    from bls_verify_gadget_tpu.ops.fp import FP
    from bls_verify_gadget_tpu.r1cs.system import ConstraintSystem
    from bls_verify_gadget_tpu.r1cs.gadgets import UInt8
    from bls_verify_gadget_tpu.r1cs.verify import (
        BlsSignatureVerifyGadget as G,
        ParametersVar,
        PublicKeyVar,
        SignatureVar,
    )
    from bls_verify_gadget_tpu.r1cs import evaluator as EV
    from bls_verify_gadget_tpu.r1cs import witness_vm as VM

    rng = random.Random(0x5EED)

    # batch of independent (sk, msg) -> (pk, msg, sig)
    triples = []
    for _ in range(B):
        sk = rng.randrange(1, 1 << 250)
        pk = gbls.sk_to_pk(sk)
        msg = bytes(rng.randrange(256) for _ in range(MSG_LEN))
        sig = gbls.sign(sk, msg)
        triples.append((pk, msg, sig))

    # one host circuit (first triple) defines structure + tape
    t0 = time.time()
    cs = ConstraintSystem()
    ok = G.verify(
        cs,
        ParametersVar.constant(cs),
        PublicKeyVar.alloc(cs, triples[0][0]),
        [UInt8.alloc(cs, b) for b in triples[0][1]],
        SignatureVar.alloc(cs, triples[0][2]),
    )
    build_s = time.time() - t0
    assert ok.value == 1
    unc = cs.tape_uncovered()
    assert not unc, f"{len(unc)} uncovered vars"
    n_base = len(cs.assignments)

    t0 = time.time()
    ct = VM.compile_tape(cs)
    prepared = EV.prepare(cs.to_arrays())
    compile_tape_s = time.time() - t0

    # device inputs: every "input" var is a pk/sig coordinate or a message
    # bit; read their per-element values from per-triple host ALLOCATION
    # PREFIXES?  No — inputs are exactly the alloc-time leaves, whose
    # values we know directly from the triple: rebuild them cheaply.
    def input_values(pk, msg, sig):
        # the tape's "input" leaves are exactly the pk/sig coordinates and
        # message bits; rebuild just those allocations on a scratch system
        # (its on-curve-check products are recorded as mul entries, not
        # inputs) and read the input-tagged values in tape order
        scratch = ConstraintSystem()
        PublicKeyVar.alloc(scratch, pk)
        [UInt8.alloc(scratch, b) for b in msg]
        SignatureVar.alloc(scratch, sig)
        return [
            scratch.assignments[i]
            for e in scratch.tape
            if e["kind"] == "input"
            for i in e["outs"]
        ]

    proto_inputs = input_values(*triples[0])
    assert len(proto_inputs) == len(ct.input_vars), (
        len(proto_inputs),
        len(ct.input_vars),
    )
    t0 = time.time()
    all_inputs = np.stack(
        [FP.encode(input_values(*t)) for t in triples]
    )  # (B, n_inputs, NLIMB)
    inputs_s = time.time() - t0

    t0 = time.time()
    wit = VM.run_tape(ct, jnp.asarray(all_inputs), B)
    pad = prepared["num_vars"] - n_base
    if pad:
        wit = jnp.pad(wit, ((0, 0), (0, pad), (0, 0)))
    wit = EV.complete_witness(prepared, wit)
    wit = jax.block_until_ready(wit)
    replay_s = time.time() - t0

    chunk = max(64, (1 << 23) // max(B, 1))
    t0 = time.time()
    ok_b = jax.device_get(EV.check_satisfied(prepared, wit, chunk=chunk))
    eval_s = time.time() - t0
    assert ok_b.shape == (B,) and ok_b.all(), "device witnesses must satisfy"

    bad = wit.at[:, n_base - 5, :].set(wit[:, 1, :])
    ok_bad = jax.device_get(EV.check_satisfied(prepared, bad, chunk=chunk))
    assert not ok_bad.any(), "corrupted witnesses must fail"

    return {
                "metric": "verify_circuit_device_witness",
                "value": round(B / replay_s, 3),
                "unit": "witnesses/s",
                "rows": cs.num_constraints,
                "vars": prepared["num_vars"],
                "tape_entries": len(cs.tape),
                "tape_groups": len(ct.groups),
                "batch": B,
                "host_build_s": round(build_s, 1),
                "tape_compile_s": round(compile_tape_s, 1),
                "inputs_encode_s": round(inputs_s, 2),
                "replay_s": round(replay_s, 2),
                "eval_s": round(eval_s, 2),
                "device": str(jax.devices()[0]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()
    print(json.dumps(run(args.batch)))


if __name__ == "__main__":
    main()
