"""Benchmark: batched BLS verification throughput on the current device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE.md north-star target of
5,000 verifications/s per chip (the reference publishes no numbers of its
own — BASELINE.md / reference Cargo.toml:69-73).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/bls_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_VERIFIES_PER_SEC = 5000.0
MSG_LEN = 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=int(os.environ.get("BLS_BENCH_BATCH", 4096)))
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from __graft_entry__ import _example_batch
    from bls_verify_gadget_tpu.models.bls import BatchedBLS

    bls = BatchedBLS()
    pk, sig, msg = _example_batch(args.batch)

    fn = jax.jit(lambda p, s, m: bls.verify(p, s, m, MSG_LEN))
    t0 = time.time()
    out = fn(pk, sig, msg)
    out.block_until_ready()
    compile_and_first = time.time() - t0
    assert all(jax.device_get(out[:2])), "bench vector must verify"

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        out = fn(pk, sig, msg)
        out.block_until_ready()
        times.append(time.time() - t0)
    best = min(times)
    throughput = args.batch / best

    # roofline: count logical field ops by abstract-tracing the pipeline
    # (utils/profiling.count_ops — no device work), then express the
    # measured throughput as sustained Fp-mul-equivalents/s.
    from bls_verify_gadget_tpu.utils.profiling import count_ops

    with count_ops() as ctr:
        jax.eval_shape(lambda p, s, m: bls.verify(p, s, m, MSG_LEN), pk, sig, msg)
    fpmul_per_verify = ctr.fp_mul_equivalent() / args.batch
    sustained_fpmul_s = fpmul_per_verify * throughput

    # weak-scaling record (tools/bench_scaling.py writes SCALING.json; the
    # virtual-mesh efficiencies ride along so the driver's BENCH_r{N}.json
    # carries the scaling field)
    scaling = None
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            scaling = json.load(f)

    print(
        json.dumps(
            {
                "metric": "bls_verify_throughput_per_chip",
                "value": round(throughput, 2),
                "unit": "verifies/s",
                "vs_baseline": round(throughput / BASELINE_VERIFIES_PER_SEC, 4),
                "batch": args.batch,
                "steady_state_s": round(best, 4),
                "compile_plus_first_run_s": round(compile_and_first, 1),
                "roofline_fpmul_per_verify": round(fpmul_per_verify),
                "roofline_sustained_fpmul_per_s": round(sustained_fpmul_s),
                "device": str(jax.devices()[0]),
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
