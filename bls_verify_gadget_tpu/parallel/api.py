"""Sharded scheme operations via shard_map over a 1-D batch mesh.

Patterns:
  * sharded_verify: pure data parallelism — each chip verifies its slice of
    the (pk, msg, sig) batch; no communication.
  * sharded point aggregation: each chip folds its slice into one partial
    point sum, the ndev partials are all_gathered over ICI and folded — the
    point-sum analogue of psum (Jacobian addition is not elementwise, so the
    gather+fold of ndev points replaces a plain psum at negligible cost).
  * sharded_masked_aggregate_verify: the device analogue of the reference's
    aggregate_verify (src/constraints.rs:153-191): bitmap-gated pk fold
    across chips, then a single verification.
"""

import functools

import jax
import jax.numpy as jnp

try:  # jax >= 0.8 top-level API; experimental path for older versions
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..ops import curve as CV
from .mesh import batch_axis


def _pt_spec(ops):
    """PartitionSpec pytree for a Jacobian point batched on axis 0."""
    leaf = P(batch_axis)
    if ops.name == "fp":
        return (leaf, leaf, leaf)
    return ((leaf, leaf), (leaf, leaf), (leaf, leaf))


def _gather_fold(ops, partial):
    """partial: (1, ...) local partial sum point -> total over the mesh:
    all_gather the ndev partials and fold."""
    def ag(x):
        return jax.lax.all_gather(x, batch_axis, axis=0, tiled=True)

    gathered = jax.tree.map(ag, partial)
    return CV.pt_sum(ops, gathered, axis=0)


def make_sharded_verify(bls, mesh, msg_len: int):
    """One jit-compiled batch-verify sharded over the mesh; call it as many
    times as needed with same-shaped batches without recompiling.  All batch
    leading dims must be divisible by the mesh size."""
    specs_in = (
        (P(batch_axis), P(batch_axis), P(batch_axis)),
        ((P(batch_axis), P(batch_axis)), (P(batch_axis), P(batch_axis)), P(batch_axis)),
        P(batch_axis),
    )

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=specs_in,
        out_specs=P(batch_axis),
        check_vma=False,
    )
    def run(pk, sig, msg):
        return bls.verify(pk, sig, msg, msg_len)

    return run


def sharded_verify(bls, mesh, pk_aff, sig_aff, msg_u8, msg_len: int):
    """Batch-verify sharded over the mesh (one-shot convenience form)."""
    return make_sharded_verify(bls, mesh, msg_len)(pk_aff, sig_aff, msg_u8)


def make_sharded_verify_staged(bls, mesh, msg_len: int):
    """Stage-wise sharded batch-verify: hash_to_g2 and the pairing test as
    TWO shard_mapped programs chained through device arrays.

    Same semantics and shardings as make_sharded_verify, but each XLA
    program is less than half the size — single-program XLA CPU compile
    time is superlinear in graph size, so the staged form cold-compiles
    several times faster, and the returned callable's `.stages` tuple lets
    callers pre-compile both programs concurrently (XLA releases the GIL).
    Used by the driver dryrun (__graft_entry__.dryrun_multichip)."""
    coord = P(batch_axis)
    pk_spec = (coord, coord, coord)
    g2_spec = ((coord, coord), (coord, coord), coord)
    h_spec = ((coord, coord), (coord, coord), coord)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(coord,), out_specs=h_spec,
        check_vma=False,
    )
    def hash_fn(msg):
        return bls.hash_stage(msg, msg_len)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(pk_spec, g2_spec, h_spec),
        out_specs=coord, check_vma=False,
    )
    def pair_fn(pk, sig, h):
        return bls.pairing_stage(pk, sig, h)

    def run(pk_aff, sig_aff, msg_u8):
        return pair_fn(pk_aff, sig_aff, hash_fn(msg_u8))

    run.stages = (hash_fn, pair_fn)
    return run


def _sharded_point_sum(ops, mesh, pts):
    spec = _pt_spec(ops)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec,), out_specs=_pt_spec_unbatched(ops),
        check_vma=False,
    )
    def run(p):
        local = CV.pt_sum(ops, p, axis=0)
        keep = jax.tree.map(lambda x: x[None], local)
        return _gather_fold(ops, keep)

    return run(pts)


def _pt_spec_unbatched(ops):
    leaf = P()
    if ops.name == "fp":
        return (leaf, leaf, leaf)
    return ((leaf, leaf), (leaf, leaf), (leaf, leaf))


def sharded_aggregate_pubkeys(mesh, pk_jac):
    """Cross-chip G1 aggregation (reference src/bls.rs:182-196 scaled out)."""
    return _sharded_point_sum(CV.FP_OPS, mesh, pk_jac)


def sharded_aggregate_signatures(mesh, sig_jac):
    """Cross-chip G2 aggregation (reference src/bls.rs:287-301 scaled out)."""
    return _sharded_point_sum(CV.FP2_OPS, mesh, sig_jac)


def sharded_masked_aggregate(mesh, pk_jac, bitmap):
    """Bitmap-gated cross-chip pk fold + set-bit count (psum) — the
    distributed analogue of the reference's mapped_aggregate
    (src/constraints.rs:169-191).  Returns (aggregated point, count)."""
    pt_spec = _pt_spec(CV.FP_OPS)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(pt_spec, P(batch_axis)),
        out_specs=(_pt_spec_unbatched(CV.FP_OPS), P()),
        check_vma=False,
    )
    def fold(pk, bits):
        inf = CV.pt_infinity_like(CV.FP_OPS, pk)
        masked = CV.pt_cmov(CV.FP_OPS, bits > 0, pk, inf)
        local = CV.pt_sum(CV.FP_OPS, masked, axis=0)
        total = _gather_fold(CV.FP_OPS, jax.tree.map(lambda x: x[None], local))
        count = jax.lax.psum(jnp.sum(bits.astype(jnp.uint32)), batch_axis)
        return total, count

    return fold(pk_jac, bitmap)


def sharded_masked_aggregate_verify(bls, mesh, pk_jac, bitmap, sig_aff, msg_u8, msg_len: int):
    """Bitmap-gated aggregate + single verify, sharded over chips:
    the TPU-native analogue of the reference aggregate_verify
    (src/constraints.rs:153-167).  Returns (ok, signer_count)."""
    apk, count = sharded_masked_aggregate(mesh, pk_jac, bitmap)
    ax, ay, ainf = CV.pt_to_affine(CV.FP_OPS, apk)
    ok = bls.verify(
        (ax[None], ay[None], ainf[None]),
        sig_aff,
        msg_u8,
        msg_len,
    )
    return ok[0], count
