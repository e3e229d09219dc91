"""Compile-cost diagnosis: lower the verify stage programs for the current
backend (trace + StableHLO only — no XLA/Mosaic compilation) and report,
per stage:

  * module size (bytes of StableHLO text)
  * tpu_custom_call count: total Mosaic kernel launches in the graph
  * unique payloads: how many DISTINCT Mosaic kernels must be compiled —
    the gap between total and unique is what XLA's kernel cache dedupes;
    the unique count is the Mosaic compile bill (VERDICT r3 weak #2: cold
    compile 1368s vs <600s target; CLAUDE.md backlog "kernel IR dedup").

Budget contract (VERDICT r4 weak #4 / next-#10): --json-out writes the
per-stage record to COMPILE_BUDGET.json; --check re-traces and FAILS
(exit 1) if any stage's module size grew >30% or its unique-Mosaic-payload
count grew by more than 4 over the committed budget — the cheap trace-time
proxies for the cold-compile bill, so a fusion change that would re-blow
the ~600 s driver envelope fails loudly BEFORE a driver window.  The
on-hardware battery runs the check as its `compile_budget` case.

Usage: python tools/compile_diag.py [--batch 4096] [--cpu]
       python tools/compile_diag.py --json-out COMPILE_BUDGET.json  # record
       python tools/compile_diag.py --check                         # assert
"""

import argparse
import collections
import hashlib
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")


def payload_stats(hlo_text):
    """(total custom calls, unique payload hashes, per-kernel-name counts)."""
    total, uniq, names = 0, set(), collections.Counter()
    # stablehlo.custom_call @tpu_custom_call(...) {... backend_config = "..."}
    for m in re.finditer(r'custom_call[^\n]*', hlo_text):
        line = m.group(0)
        if "tpu_custom_call" not in line:
            continue
        total += 1
        uniq.add(hashlib.sha1(line.encode()).hexdigest())
        nm = re.search(r'kernel_name = "([^"]+)"', line)
        names[nm.group(1) if nm else "?"] += 1
    return total, uniq, names


def trace_record(batch):
    from __graft_entry__ import _example_batch, MSG_LEN
    from bls_verify_gadget_tpu.models.bls import BatchedBLS

    bls = BatchedBLS()
    pk, sig, msg = _example_batch(batch)

    hash_fn = jax.jit(lambda m: bls.hash_stage(m, MSG_LEN))
    miller_fn = jax.jit(bls.miller_stage)
    fexp_fn = jax.jit(bls.finalexp_stage)

    out = {}
    stages = []
    t0 = time.time()
    lo_h = hash_fn.lower(msg)
    stages.append(("hash", lo_h, time.time() - t0))
    t0 = time.time()
    lo_m = miller_fn.lower(pk, sig, lo_h.out_info)
    stages.append(("miller", lo_m, time.time() - t0))
    t0 = time.time()
    lo_f = fexp_fn.lower(*lo_m.out_info)
    stages.append(("final_exp", lo_f, time.time() - t0))

    all_uniq = set()
    for name, lo, trace_s in stages:
        txt = lo.as_text()
        total, uniq, names = payload_stats(txt)
        all_uniq |= uniq
        out[name] = {
            "trace_s": round(trace_s, 1),
            "module_bytes": len(txt),
            "custom_calls": total,
            "unique_payloads": len(uniq),
            "top_kernels": dict(names.most_common(12)),
        }
    out["all_stages_unique_payloads"] = len(all_uniq)
    out["batch"] = batch
    return out


# budget tolerances: trace-time proxies for the cold Mosaic/XLA compile
# bill.  Module bytes track XLA graph size; unique payloads track the
# number of distinct Mosaic kernels to compile.
BYTES_SLACK = 1.30
PAYLOAD_SLACK = 4
STAGES = ("hash", "miller", "final_exp")


def check_budget(rec, budget):
    """-> list of violation strings (empty = within budget)."""
    bad = []
    for s in STAGES:
        cur, ref = rec[s], budget[s]
        if cur["module_bytes"] > ref["module_bytes"] * BYTES_SLACK:
            bad.append(
                f"{s}: module_bytes {cur['module_bytes']} > "
                f"{BYTES_SLACK}x budget {ref['module_bytes']}"
            )
        if cur["unique_payloads"] > ref["unique_payloads"] + PAYLOAD_SLACK:
            bad.append(
                f"{s}: unique_payloads {cur['unique_payloads']} > budget "
                f"{ref['unique_payloads']} + {PAYLOAD_SLACK}"
            )
    return bad


def budget_path():
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COMPILE_BUDGET.json",
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--json-out", type=str, default="",
                    help="write the record (the committed budget)")
    ap.add_argument("--check", action="store_true",
                    help="compare against the committed COMPILE_BUDGET.json "
                         "and exit 1 on violation")
    args = ap.parse_args()

    rec = trace_record(args.batch)
    print(json.dumps(rec, indent=1))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rec, f, indent=1)
    if args.check:
        with open(budget_path()) as f:
            budget = json.load(f)
        bad = check_budget(rec, budget)
        for b in bad:
            print("BUDGET VIOLATION:", b, file=sys.stderr)
        sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
