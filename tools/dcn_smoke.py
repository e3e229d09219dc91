"""2-process DCN (cross-process) smoke worker: sharded masked aggregate
across process boundaries on CPU gloo collectives.

Each process contributes `--local-devices` virtual CPU devices; both build
the same deterministic pk/bitmap set, shard it over the GLOBAL mesh, run
sharded_masked_aggregate (gather-fold + psum across the process boundary),
and check the result against the golden host oracle.  Prints one JSON line
per process.

Spawned by tests/test_distributed.py; manual use:
    python tools/dcn_smoke.py --procs 2 --proc-id 0 --port 9911 &
    python tools/dcn_smoke.py --procs 2 --proc-id 1 --port 9911
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# force CPU before ANY backend probe (sitecustomize pins JAX_PLATFORMS=axon)
jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("BLS_TPU_CACHE_DIR", "/tmp/bls_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--proc-id", type=int, required=True)
    ap.add_argument("--port", type=int, default=9911)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--n", type=int, default=16, help="points in the batch")
    args = ap.parse_args()

    # initialize the distributed runtime BEFORE importing the package: the
    # ops modules stage device constants at import time, which initializes
    # the XLA backend (after which jax.distributed.initialize refuses to
    # run).  This inlines parallel/distributed.initialize.
    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(
        f"--xla_force_host_platform_device_count={args.local_devices}"
    )
    os.environ["XLA_FLAGS"] = " ".join(flags)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.procs,
        process_id=args.proc_id,
    )

    from bls_verify_gadget_tpu.parallel import distributed as D
    ndev = len(jax.devices())
    assert ndev == args.procs * args.local_devices, (
        f"global mesh has {ndev} devices"
    )

    import random

    import numpy as np
    from jax.sharding import PartitionSpec as P

    from bls_verify_gadget_tpu import constants as C
    from bls_verify_gadget_tpu.golden import curve as gc
    from bls_verify_gadget_tpu.ops import curve as CV
    from bls_verify_gadget_tpu.parallel import (
        batch_axis,
        make_mesh,
        sharded_masked_aggregate,
    )

    mesh = make_mesh()  # all global devices
    rng = random.Random(0xDC4)
    n = args.n
    assert n % ndev == 0
    pts = [gc.g1_mul(C.G1_GEN, rng.randrange(1, C.R)) for _ in range(n)]
    bits = [rng.randrange(2) for _ in range(n)]

    # this process's contiguous slab of the global batch
    per = n // args.procs
    lo, hi = args.proc_id * per, (args.proc_id + 1) * per
    local_pts = CV.g1_encode_batch(pts[lo:hi])
    local_bits = np.asarray(bits[lo:hi], np.uint32)

    spec_pt = ((P(batch_axis),) * 3)
    pk_jac = D.process_local_to_global(
        mesh, P(batch_axis), jax.tree.map(np.asarray, local_pts)
    )
    bitmap = D.process_local_to_global(mesh, P(batch_axis), local_bits)
    del spec_pt

    # Serialize the XLA compile across the workers with an flock: both
    # processes lower the SAME global SPMD program, so whoever compiles
    # first seeds the persistent cache and the other hits it (~1 s)
    # instead of duplicating a multi-minute CPU compile on shared cores.
    # Execution stays collective: both processes launch the compiled
    # program and rendezvous in the gloo all-gather as before.
    import fcntl

    fn = jax.jit(lambda d, b: sharded_masked_aggregate(mesh, d, b))
    with open("/tmp/bls_dcn_compile.lock", "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            compiled = fn.lower(pk_jac, bitmap).compile()
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)
    total, count = compiled(pk_jac, bitmap)

    want = None
    for p, b in zip(pts, bits):
        if b:
            want = gc.g1_add(want, p)
    got = CV.g1_decode(jax.tree.map(jax.device_get, total))
    ok = (got == want) and int(jax.device_get(count)) == sum(bits)
    print(
        json.dumps(
            {
                "metric": "dcn_smoke",
                "proc": args.proc_id,
                "procs": args.procs,
                "global_devices": ndev,
                "ok": bool(ok),
                "count": int(jax.device_get(count)),
            }
        ),
        flush=True,
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
