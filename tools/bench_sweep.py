"""Record the verify latency/throughput envelope across batch sizes into
BATCH_SWEEP.json (VERDICT r4 next-#9: the batch-256 latency figure and the
8192/16384 scaling lived only in commit messages).

Run on TPU hardware, OUTSIDE the driver window (each batch size is its own
set of XLA programs; the compiles land in the persistent cache):

    timeout 3600 python tools/bench_sweep.py --batches 256,4096,8192,16384

bench.py embeds the resulting artifact in its JSON line (latency_batch256_ms
and batch_sweep fields).
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("BLS_TPU_CACHE_DIR", "/tmp/bls_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

MSG_LEN = 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,4096,8192,16384")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--json-out", default=os.path.join(HERE, "BATCH_SWEEP.json"))
    args = ap.parse_args()

    from __graft_entry__ import _example_batch
    from bls_verify_gadget_tpu.models.bls import BatchedBLS

    bls = BatchedBLS()
    steady, vps, compile_s = {}, {}, {}
    for batch in [int(b) for b in args.batches.split(",")]:
        pk, sig, msg = _example_batch(batch)
        t0 = time.time()
        hash_exe = jax.jit(lambda m: bls.hash_stage(m, MSG_LEN)).lower(msg).compile()
        h_info = jax.eval_shape(lambda m: bls.hash_stage(m, MSG_LEN), msg)
        miller_exe = jax.jit(bls.miller_stage).lower(pk, sig, h_info).compile()
        m_info = jax.eval_shape(bls.miller_stage, pk, sig, h_info)
        fexp_exe = jax.jit(bls.finalexp_stage).lower(*m_info).compile()

        def step():
            f, ok = miller_exe(pk, sig, hash_exe(msg))
            return fexp_exe(f, ok)

        out = jax.block_until_ready(step())
        compile_s[str(batch)] = round(time.time() - t0, 1)
        assert all(jax.device_get(out[:2])), "sweep vector must verify"
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            jax.block_until_ready(step())
            times.append(time.time() - t0)
        steady[str(batch)] = round(min(times), 4)
        vps[str(batch)] = round(batch / min(times), 1)
        print(f"batch {batch}: steady {steady[str(batch)]}s = "
              f"{vps[str(batch)]} v/s (compile+first {compile_s[str(batch)]}s)",
              file=sys.stderr, flush=True)

    rec = {
        "metric": "verify_batch_sweep",
        "steady_state_s": steady,
        "verifies_per_s": vps,
        "compile_plus_first_s": compile_s,
        "device": str(jax.devices()[0]),
    }
    with open(args.json_out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
