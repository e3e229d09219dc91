"""Device witness-VM replay vs host gadget assignments: the circuit is
built ONCE, the tape replayed batch-parallel, and every variable must
match the per-element host builds bit for bit."""

import random

import numpy as np
import jax.numpy as jnp

from bls_verify_gadget_tpu import constants as C
from bls_verify_gadget_tpu.ops.fp import FP
from bls_verify_gadget_tpu.r1cs.system import ConstraintSystem
from bls_verify_gadget_tpu.r1cs.fields import Fp2Var
from bls_verify_gadget_tpu.r1cs.hasher import map_to_curve_gadget
from bls_verify_gadget_tpu.r1cs import witness_vm as VM
from bls_verify_gadget_tpu.r1cs import evaluator as EV

rng = random.Random(0xBEEF)


def _build_map_circuit(u_val):
    cs = ConstraintSystem()
    u = Fp2Var.alloc(cs, u_val)
    map_to_curve_gadget(u)
    assert cs.is_satisfied()
    return cs


def test_map_to_curve_tape_replay():
    B = 3
    us = [(rng.randrange(C.P), rng.randrange(C.P)) for _ in range(B)]
    # one circuit defines the tape; per-element hosts give ground truth
    css = [_build_map_circuit(u) for u in us]
    cs = css[0]
    assert not cs.tape_uncovered()
    ct = VM.compile_tape(cs)
    # inputs: the two u coords per element, in tape order
    assert len(ct.input_vars) == 2
    inputs = np.stack(
        [FP.encode([u[0], u[1]]) for u in us]
    )  # (B, 2, NLIMB)
    wit = np.asarray(VM.run_tape(ct, jnp.asarray(inputs), B))
    want = EV.encode_witness_batch([c.assignments for c in css])
    assert wit.shape == want.shape
    neq = np.where((wit != want).any(axis=-1))
    assert neq[0].size == 0, (
        f"first mismatches: elem {neq[0][:5]}, var {neq[1][:5]}"
    )
