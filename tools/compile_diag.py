"""Compile-cost diagnosis: lower the verify stage programs for the current
backend (trace + StableHLO only — no XLA/Mosaic compilation) and report,
per stage:

  * module size (bytes of StableHLO text)
  * tpu_custom_call count: total Mosaic kernel launches in the graph
  * unique payloads: how many DISTINCT Mosaic kernels must be compiled —
    the gap between total and unique is what XLA's kernel cache dedupes;
    the unique count is the Mosaic compile bill (VERDICT r3 weak #2: cold
    compile 1368s vs <600s target; CLAUDE.md backlog "kernel IR dedup").

Usage: python tools/compile_diag.py [--batch 4096] [--cpu]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    from __graft_entry__ import _example_batch, MSG_LEN
    from bls_verify_gadget_tpu.models.bls import BatchedBLS

    bls = BatchedBLS()
    pk, sig, msg = _example_batch(args.batch)

    hash_fn = jax.jit(lambda m: bls.hash_stage(m, MSG_LEN))
    miller_fn = jax.jit(bls.miller_stage)
    fexp_fn = jax.jit(bls.finalexp_stage)

    out = {}
    lo_prev = None
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
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
