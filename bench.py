"""Benchmark: batched BLS verification throughput on the current device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE.md north-star target of
5,000 verifications/s per chip (the reference publishes no numbers of its
own — BASELINE.md / reference Cargo.toml:69-73).

Structured to fit a cold ~30-minute driver window (VERDICT r3 weak #1):

  * The verify pipeline compiles as THREE stage programs — hash_to_g2,
    Miller loop (+ validity checks), final exponentiation — lowered in
    dependency order and compiled in parallel threads (XLA releases the
    GIL while compiling; single-program compile time is superlinear in
    graph size, so staged + parallel is several times faster cold).  Each
    lowering feeds the next stage's input shapes via `.out_info`, so every
    stage is traced exactly once.
  * The metric line prints IMMEDIATELY after the timed iterations.  The
    roofline op-count — a multi-minute abstract re-trace — is read from
    the precomputed ROOFLINE.json (tools/gen_roofline.py) instead of
    being re-derived inline; --live-roofline restores the old behaviour.
  * The weak-scaling and R1CS rows/s records ride along from SCALING.json
    / R1CS_BENCH.json (tools/bench_scaling.py / tools/bench_r1cs.py).
"""

import argparse
import concurrent.futures
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import jax

if "--cpu" in sys.argv:  # before any backend touch (sitecustomize pins TPU)
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("BLS_TPU_CACHE_DIR", "/tmp/bls_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_VERIFIES_PER_SEC = 5000.0
MSG_LEN = 32


def _embed(name):
    path = os.path.join(HERE, name)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=int(os.environ.get("BLS_BENCH_BATCH", 4096)))
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--single-program", action="store_true",
                    help="compile verify as one XLA program (the pre-r4 path)")
    ap.add_argument("--live-roofline", action="store_true",
                    help="re-derive the roofline op-count by abstract trace "
                         "instead of reading ROOFLINE.json (multi-minute)")
    args = ap.parse_args()

    from __graft_entry__ import _example_batch
    from bls_verify_gadget_tpu.models.bls import BatchedBLS

    bls = BatchedBLS()
    pk, sig, msg = _example_batch(args.batch)

    t0 = time.time()
    if args.single_program:
        fn = jax.jit(lambda p, s, m: bls.verify(p, s, m, MSG_LEN))
        exe = fn.lower(pk, sig, msg).compile()
        stage_compile_s = {"verify": round(time.time() - t0, 1)}

        def step(p, s, m):
            return exe(p, s, m)
    else:
        hash_fn = jax.jit(lambda m: bls.hash_stage(m, MSG_LEN))
        miller_fn = jax.jit(bls.miller_stage)
        fexp_fn = jax.jit(bls.finalexp_stage)

        # lower (trace) in dependency order, compile concurrently: each
        # stage starts compiling while the next one is still tracing
        done_at = {}
        with concurrent.futures.ThreadPoolExecutor(max_workers=3) as pool:
            def submit(name, lowered):
                def run():
                    c = lowered.compile()
                    done_at[name] = time.time() - t0
                    return c
                return pool.submit(run)

            lo_h = hash_fn.lower(msg)
            fh = submit("hash", lo_h)
            lo_m = miller_fn.lower(pk, sig, lo_h.out_info)
            fm = submit("miller", lo_m)
            lo_f = fexp_fn.lower(*lo_m.out_info)
            ff = submit("final_exp", lo_f)
            hash_exe, miller_exe, fexp_exe = fh.result(), fm.result(), ff.result()
        stage_compile_s = {k: round(v, 1) for k, v in done_at.items()}

        def step(p, s, m):
            f, ok = miller_exe(p, s, hash_exe(m))
            return fexp_exe(f, ok)

    out = step(pk, sig, msg)
    out.block_until_ready()
    compile_and_first = time.time() - t0
    print(f"compile+first {compile_and_first:.1f}s stages={stage_compile_s}",
          file=sys.stderr, flush=True)
    assert all(jax.device_get(out[:2])), "bench vector must verify"

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        out = step(pk, sig, msg)
        out.block_until_ready()
        times.append(time.time() - t0)
    best = min(times)
    throughput = args.batch / best

    # per-stage steady state: where the verify time goes (each stage timed
    # on its own warmed inputs; min over reps, mirroring the headline loop,
    # so the per-stage numbers are no noisier than steady_state_s)
    stage_times = None
    if not args.single_program:
        h = jax.block_until_ready(hash_exe(msg))
        fm = jax.block_until_ready(miller_exe(pk, sig, h))
        stage_times = {}
        for name, fn in (
            ("hash", lambda: hash_exe(msg)),
            ("miller", lambda: miller_exe(pk, sig, h)),
            ("final_exp", lambda: fexp_exe(*fm)),
        ):
            reps = []
            for _ in range(args.iters):
                t0 = time.time()
                jax.block_until_ready(fn())
                reps.append(time.time() - t0)
            stage_times[name] = round(min(reps), 4)

    # roofline: logical field-op count per verify, precomputed by
    # tools/gen_roofline.py (bench expresses the measured throughput as
    # sustained Fp-mul-equivalents/s)
    if args.live_roofline:
        from bls_verify_gadget_tpu.utils.profiling import count_ops

        with count_ops() as ctr:
            jax.eval_shape(lambda p, s, m: bls.verify(p, s, m, MSG_LEN), pk, sig, msg)
        fpmul_per_verify = ctr.fp_mul_equivalent() / args.batch
    else:
        roof = _embed("ROOFLINE.json")
        fpmul_per_verify = roof["fpmul_per_verify"] if roof else None

    rec = {
        "metric": "bls_verify_throughput_per_chip",
        "value": round(throughput, 2),
        "unit": "verifies/s",
        "vs_baseline": round(throughput / BASELINE_VERIFIES_PER_SEC, 4),
        "batch": args.batch,
        "steady_state_s": round(best, 4),
        "compile_plus_first_run_s": round(compile_and_first, 1),
        "compile_stages_s": stage_compile_s,
        "stage_steady_s": stage_times,
        "device": str(jax.devices()[0]),
        "scaling": _embed("SCALING.json"),
        "r1cs": _embed("R1CS_BENCH.json"),
        # latency/throughput envelope across batch sizes, recorded on
        # hardware by tools/bench_sweep.py (separate compiles; kept out of
        # the driver's cold-compile window)
        "batch_sweep": _embed("BATCH_SWEEP.json"),
    }
    sweep = rec["batch_sweep"]
    if sweep and "256" in sweep.get("steady_state_s", {}):
        rec["latency_batch256_ms"] = round(
            sweep["steady_state_s"]["256"] * 1000, 2
        )
    if fpmul_per_verify is not None:
        rec["roofline_fpmul_per_verify"] = round(fpmul_per_verify)
        rec["roofline_sustained_fpmul_per_s"] = round(fpmul_per_verify * throughput)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
