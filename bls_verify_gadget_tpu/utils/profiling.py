"""Tracing/profiling surface (SURVEY.md sec 5: the reference declares a
`tracing` dependency but never uses it; here profiling is first-class).

  * named_scope: jax.named_scope wrapper so kernels show up in TPU profiler
    traces (xprof) with framework-level names.
  * OpCounter + count_ops: trace-time counters for field-op accounting (the
    analogue of the reference's num_constraints printouts,
    src/constraints.rs:372) — bench.py traces the verify pipeline under
    count_ops() and emits a roofline estimate from the totals.
  * profile_trace: context manager around jax.profiler for one-line capture.
"""

import contextlib
import collections

import jax


def named_scope(name: str):
    """Decorator/context: tags ops for the TPU profiler."""
    return jax.named_scope(name)


class OpCounter:
    """Counts logical field ops through an instrumented trace (host side).
    Keys are "<kind>_<nlimb>" (e.g. mul_24 = one batched Fp multiply,
    mul_16 = Fr); stacked SoA calls count once per stacked element via n."""

    def __init__(self):
        self.counts = collections.Counter()

    def add(self, kind: str, n: int = 1):
        self.counts[kind] += n

    def fp_mul_equivalent(self) -> float:
        """Roofline unit: everything in units of one 24-limb Fp multiply.
        add/sub are ~carry chains (~1/10 of a mul); Fr (16-limb) ops scale
        by (16/24)^2 for the quadratic convolution."""
        w = {
            "mul_24": 1.0, "add_24": 0.1, "sub_24": 0.1,
            "mul_16": (16 / 24) ** 2, "add_16": 0.07, "sub_16": 0.07,
        }
        return sum(w.get(k, 0.0) * v for k, v in self.counts.items())

    def __repr__(self):
        return f"OpCounter({dict(self.counts)})"


_active_counter: OpCounter | None = None


def record(kind: str, n: int = 1):
    """Called by the ops layer on every logical field op; no-op unless a
    count_ops() context is active (zero cost on the hot path — recording
    happens at trace time, not per batch element)."""
    if _active_counter is not None:
        _active_counter.add(kind, n)


@contextlib.contextmanager
def count_ops():
    """Activate an OpCounter for the duration of a trace:

        with count_ops() as c:
            jax.eval_shape(fn, *args)     # abstract trace, no compute
        print(c.fp_mul_equivalent())
    """
    global _active_counter
    prev, _active_counter = _active_counter, OpCounter()
    try:
        yield _active_counter
    finally:
        _active_counter = prev


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/bls_tpu_trace"):
    """Capture a TPU profiler trace around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
