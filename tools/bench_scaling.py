"""Weak-scaling harness over a virtual device mesh (1 -> N devices).

Fixes the per-device work and grows the mesh; ideal weak scaling keeps the
step time flat, so efficiency(N) = t(1) / t(N).  Two workloads:

  * masked_aggregate — bitmap-gated cross-chip pk fold (gather-fold + psum),
    the collective-heavy path.
  * verify (--verify) — the staged sharded batch-verify (pure data
    parallelism; collectives-free, so it isolates sharding overhead).

On this CI image the mesh is N virtual CPU devices on a 4-vCPU host, so
N=8 oversubscribes physical cores and the numbers measure the sharding
machinery's structural overhead, not ICI — the TPU-pod run uses the same
harness unchanged (real chips: JAX_PLATFORMS unset, no re-exec).

Prints one JSON line; --json-out writes it to a file (bench.py embeds that
file as its "scaling" field).

Usage: python tools/bench_scaling.py [--devices 8] [--per-dev 8] [--verify]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--per-dev", type=int, default=8)
    ap.add_argument("--verify", action="store_true",
                    help="also weak-scale the staged sharded verify")
    ap.add_argument("--verify-per-dev", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--json-out", type=str, default="")
    args = ap.parse_args()

    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={args.devices}")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    if os.environ.get("BLS_SCALING_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/bls_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import random

    import jax.numpy as jnp
    import numpy as np

    from bls_verify_gadget_tpu import constants as C
    from bls_verify_gadget_tpu.golden import curve as gc
    from bls_verify_gadget_tpu.ops import curve as CV
    from bls_verify_gadget_tpu.parallel import (
        make_mesh,
        sharded_masked_aggregate,
    )

    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    rng = random.Random(11)

    def steady(fn, *a):
        out = fn(*a)  # compile + first run
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # --- masked aggregate (collective path) -------------------------------
    base_pts = [
        gc.g1_mul(C.G1_GEN, rng.randrange(1, C.R)) for _ in range(args.per_dev)
    ]
    agg_t = {}
    for n in sizes:
        mesh = make_mesh(devices=devices[:n])
        pts = [base_pts[i % args.per_dev] for i in range(args.per_dev * n)]
        bits = [(i * 7 + 1) % 2 for i in range(len(pts))]
        d = jax.tree.map(np.asarray, CV.g1_encode_batch(pts))
        bm = jnp.asarray(bits, jnp.uint32)
        # jit the whole collective step: an un-jitted shard_map call
        # re-traces on every invocation, which would time tracing, not
        # the sharded execution
        fn = jax.jit(lambda dd, bb, m=mesh: sharded_masked_aggregate(m, dd, bb))
        agg_t[n] = steady(fn, d, bm)
        print(f"masked_aggregate ndev={n} t={agg_t[n]*1e3:.1f} ms", flush=True)

    rec = {
        "metric": "weak_scaling",
        "platform": devices[0].platform,
        "physical_note": "virtual CPU mesh on 4 vCPUs (structural overhead"
                         " only)" if devices[0].platform == "cpu" else "",
        "per_device_batch": args.per_dev,
        "masked_aggregate_ms": {str(n): round(t * 1e3, 1) for n, t in agg_t.items()},
        "masked_aggregate_efficiency": {
            str(n): round(agg_t[sizes[0]] / t, 3) for n, t in agg_t.items()
        },
    }

    # --- staged sharded verify (data-parallel path) ------------------------
    if args.verify:
        from bls_verify_gadget_tpu.models.bls import BatchedBLS
        from bls_verify_gadget_tpu.parallel import make_sharded_verify_staged
        from __graft_entry__ import _example_batch, MSG_LEN

        bls = BatchedBLS()
        ver_t = {}
        for n in sizes:
            mesh = make_mesh(devices=devices[:n])
            pk, sig, msg = _example_batch(args.verify_per_dev * n)
            run = make_sharded_verify_staged(bls, mesh, MSG_LEN)
            ver_t[n] = steady(run, pk, sig, msg)
            print(f"verify ndev={n} t={ver_t[n]*1e3:.1f} ms", flush=True)
        rec["verify_ms"] = {str(n): round(t * 1e3, 1) for n, t in ver_t.items()}
        rec["verify_efficiency"] = {
            str(n): round(ver_t[sizes[0]] / t, 3) for n, t in ver_t.items()
        }
        rec["verify_per_device_batch"] = args.verify_per_dev

    print(json.dumps(rec))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
