"""Tracing/profiling surface (SURVEY.md sec 5: the reference declares a
`tracing` dependency but never uses it; here profiling is first-class).

  * named_scope: jax.named_scope wrapper so kernels show up in TPU profiler
    traces (xprof) with framework-level names.
  * OpCounter: host-side counters for field-op accounting (the analogue of
    the reference's num_constraints printouts, src/constraints.rs:372) —
    used by the roofline estimates in bench.py.
  * profile_trace: context manager around jax.profiler for one-line capture.
"""

import contextlib
import collections

import jax


def named_scope(name: str):
    """Decorator/context: tags ops for the TPU profiler."""
    return jax.named_scope(name)


class OpCounter:
    """Counts logical field ops through an instrumented run (host side)."""

    def __init__(self):
        self.counts = collections.Counter()

    def add(self, kind: str, n: int = 1):
        self.counts[kind] += n

    def fp_mul_equivalent(self) -> int:
        """Rough roofline unit: everything in units of one Fp multiply."""
        w = {"fp_mul": 1, "fp_add": 0.05, "fp_inv": 450, "fp2_mul": 3, "fp12_mul": 54}
        return int(sum(w.get(k, 0) * v for k, v in self.counts.items()))

    def __repr__(self):
        return f"OpCounter({dict(self.counts)})"


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/bls_tpu_trace"):
    """Capture a TPU profiler trace around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
