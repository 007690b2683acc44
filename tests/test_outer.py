"""Outer circuit proof: compile the recorded constraint system onto the
universal-gate STARK, prove + verify natively, and reject tampering.

Reference parity: plonky2 CircuitBuilder::build / prove / verify as used by
/root/reference/src/builder.rs:178-260 (the outer PLONK+FRI proof around the
BN254 gadget circuit).  The rebuild replaces plonky2's gate menu + sigma
permutation with one universal gate + LogUp wire binding (circuit/outer.py).
"""

import numpy as np
import pytest

from plonky2_bn254_tpu import circuit as ckt
from plonky2_bn254_tpu.bn254 import oracle, params
from plonky2_bn254_tpu.circuit import outer
from plonky2_bn254_tpu.circuit.biguint import range_check
from plonky2_bn254_tpu.field import goldilocks as gl
from plonky2_bn254_tpu.prover.config import TEST_CONFIG
from plonky2_bn254_tpu.prover.verify import VerificationError

RNG = np.random.default_rng(2024)


def _small_circuit():
    """c = a*b + d with a 12-bit range check on d; publics: a, c."""
    b = ckt.CircuitBuilder()
    a = b.add_virtual_target()
    x = b.add_virtual_target()
    d = b.add_virtual_target()
    c = b.mul_add(a, x, d)
    range_check(b, d, 12)
    b.register_public_input(a)
    b.register_public_input(c)
    circuit = b.build()
    return circuit, (a, x, d, c)


def test_outer_roundtrip_small():
    circuit, (a, x, d, c) = _small_circuit()
    pw = ckt.Witness()
    pw.set_target(a, 1234)
    pw.set_target(x, 5678)
    pw.set_target(d, 4095)
    values = circuit.generate_witness(pw)
    circuit.check(values)

    data = outer.compile_outer(circuit, table_bits=8)
    proof, publics = outer.prove_outer(data, values, TEST_CONFIG)
    assert publics == [1234, (1234 * 5678 + 4095) % gl.P]
    outer.verify_outer(data, proof, publics, TEST_CONFIG)

    # wrong public value -> CTL multiset mismatch
    with pytest.raises(VerificationError):
        outer.verify_outer(data, proof, [1234, 999], TEST_CONFIG)

    # tampered opening -> transcript/quotient mismatch
    from plonky2_bn254_tpu.field.extension import GLExt

    proof.openings.trace_zeta[0] = proof.openings.trace_zeta[0] + GLExt(1)
    with pytest.raises(VerificationError):
        outer.verify_outer(data, proof, publics, TEST_CONFIG)


def test_outer_rejects_bad_witness():
    """A witness violating the circuit (bad product or out-of-range wire)
    yields a proof the verifier rejects — the binding is the constraint
    system, not a host-side assert."""
    circuit, (a, x, d, c) = _small_circuit()
    pw = ckt.Witness()
    pw.set_target(a, 10)
    pw.set_target(x, 20)
    pw.set_target(d, 5)
    values = circuit.generate_witness(pw)
    data = outer.compile_outer(circuit, table_bits=8)

    # break the product: c != a*x + d
    bad = dict(values)
    bad[c.index] = (bad[c.index] + 1) % gl.P
    proof, publics = outer.prove_outer(data, bad, TEST_CONFIG)
    with pytest.raises(VerificationError):
        outer.verify_outer(data, proof, publics, TEST_CONFIG)

    # out-of-range d: honest limb decomposition can't satisfy the gate
    bad2 = dict(values)
    bad2[d.index] = 1 << 13
    bad2[c.index] = (bad2[a.index] * bad2[x.index] + bad2[d.index]) % gl.P
    proof2, publics2 = outer.prove_outer(data, bad2, TEST_CONFIG)
    with pytest.raises(VerificationError):
        outer.verify_outer(data, proof2, publics2, TEST_CONFIG)


def test_outer_vk_pins_constants():
    """A proof made from a DIFFERENT circuit (same shape family) must not
    verify against this circuit's verifier key: the constant-column
    openings at zeta pin gate coefficients and wire indices."""
    circuit, tgt = _small_circuit()
    pw = ckt.Witness()
    pw.set_target(tgt[0], 3)
    pw.set_target(tgt[1], 4)
    pw.set_target(tgt[2], 7)
    values = circuit.generate_witness(pw)
    data = outer.compile_outer(circuit, table_bits=8)

    # second circuit: same geometry, different constant (c = a*b + 2d)
    b2 = ckt.CircuitBuilder()
    a2 = b2.add_virtual_target()
    x2 = b2.add_virtual_target()
    d2 = b2.add_virtual_target()
    t2 = b2.mul_add(a2, x2, d2)
    c2 = b2.add(t2, d2)
    range_check(b2, d2, 12)
    b2.register_public_input(a2)
    b2.register_public_input(c2)
    circ2 = b2.build()
    pw2 = ckt.Witness()
    pw2.set_target(a2, 3)
    pw2.set_target(x2, 4)
    pw2.set_target(d2, 7)
    vals2 = circ2.generate_witness(pw2)
    data2 = outer.compile_outer(circ2, table_bits=8)
    if data2.n_log == data.n_log and data2.lay == data.lay:
        proof_x, pub_x = outer.prove_outer(data2, vals2, TEST_CONFIG)
        outer.verify_outer(data2, proof_x, pub_x, TEST_CONFIG)
        with pytest.raises(VerificationError):
            outer.verify_outer(data, proof_x, pub_x, TEST_CONFIG)


def test_outer_poseidon_region():
    """The dedicated Poseidon-round region (circuit/outer.py POS_BLOCK
    blocks — the plonky2 PoseidonGate analog): a circuit with in-circuit
    Poseidon permutations proves + verifies through the outer STARK, and
    region tampering (a forged round state; a forged binding-row state,
    i.e. a permutation output the witness disagrees with) is rejected by
    the AIR / keyed lookup, not a host assert."""
    from plonky2_bn254_tpu.circuit import poseidon_gadget as pg
    from plonky2_bn254_tpu.field import poseidon as pos_native
    from plonky2_bn254_tpu.prover import prove as prove_mod
    from plonky2_bn254_tpu.prover import verify as verify_mod

    b = ckt.CircuitBuilder()
    ins = [b.add_virtual_target() for _ in range(12)]
    mid = pg.permute_targets(b, ins)
    outs = pg.permute_targets(b, mid)
    # arithmetic on a permutation output keeps the universal-gate region
    # non-trivial alongside the poseidon region
    prod = b.mul_add(outs[0], outs[1], outs[2])
    b.register_public_input(outs[0])
    b.register_public_input(prod)
    circuit = b.build()
    pw = ckt.Witness()
    in_vals = [int(x) for x in RNG.integers(0, gl.P, size=12, dtype=np.uint64)]
    for t, v in zip(ins, in_vals):
        pw.set_target(t, v)
    values = circuit.generate_witness(pw)
    circuit.check(values)
    want = pos_native.h_permute(pos_native.h_permute(in_vals))
    assert values[outs[0].index] == want[0]

    data = outer.compile_outer(circuit, table_bits=8)
    assert data.n_pos == 2
    proof, publics = outer.prove_outer(data, values, TEST_CONFIG)
    outer.verify_outer(data, proof, publics, TEST_CONFIG)

    # region tamper 1: forge a mid-round state cell -> transition/sbox AIR
    trace, pubs, ctl_vals = outer.build_outer_trace(data, values)
    lay = data.lay
    t1 = trace.copy()
    t1[data.pos_base + 5, lay.ps + 3] = (
        int(t1[data.pos_base + 5, lay.ps + 3]) + 1
    ) % gl.P
    import jax.numpy as jnp

    p1 = prove_mod.prove(data.stark, jnp.asarray(t1), ctl_vals, TEST_CONFIG)
    with pytest.raises(VerificationError):
        outer.verify_outer(data, p1, pubs, TEST_CONFIG)

    # region tamper 2: an INTERNALLY CONSISTENT region proving a different
    # permutation than the circuit recorded (block 2 honestly recomputed
    # from a forged input state) -> only the keyed-lookup wire binding on
    # the boundary rows can reject it
    from plonky2_bn254_tpu.field import np_gl
    from plonky2_bn254_tpu.field.poseidon_constants import (
        FULL_ROUNDS,
        MDS,
        N_ROUNDS,
        ROUND_CONSTANTS,
    )

    t2 = trace.copy()
    half = FULL_ROUNDS // 2
    rc = np.asarray(ROUND_CONSTANTS).reshape(N_ROUNDS, 12)
    mds_u = MDS.astype(np.uint64)
    state = t2[data.pos_base + outer.POS_BLOCK, lay.ps : lay.ps + 12].copy()
    state[0] = (int(state[0]) + 1) % gl.P  # forged input lane
    for r in range(N_ROUNDS + 1):
        rc_r = rc[r] if r < N_ROUNDS else np.zeros(12, dtype=np.uint64)
        u = np_gl.add(state, rc_r)
        x3 = np_gl.mul(np_gl.mul(u, u), u)
        x7 = np_gl.mul(np_gl.mul(x3, x3), u)
        row = data.pos_base + outer.POS_BLOCK + r
        t2[row, lay.ps : lay.ps + 12] = state
        t2[row, lay.px3 : lay.px3 + 12] = x3
        t2[row, lay.px7 : lay.px7 + 12] = x7
        if r == N_ROUNDS:
            break
        full = r < half or r >= N_ROUNDS - half
        sel = x7 if full else np.concatenate([x7[:1], u[1:]])
        acc = np.zeros(12, dtype=np.uint64)
        for j in range(12):
            acc = np_gl.add(acc, np_gl.mul(mds_u[:, j], sel[j]))
        state = acc
    p2 = prove_mod.prove(data.stark, jnp.asarray(t2), ctl_vals, TEST_CONFIG)
    with pytest.raises(VerificationError):
        outer.verify_outer(data, p2, pubs, TEST_CONFIG)


def test_outer_fq_gadget_circuit():
    """VERDICT item 7 'done' shape: a real gadget circuit (Fq mul + add,
    lazy reduction, hint inverse) through the outer prover, with a
    negative witness case."""
    b = ckt.CircuitBuilder()
    x = ckt.FqTarget.new_unchecked(b)
    y = ckt.FqTarget.new_unchecked(b)
    m = x.mul(b, y).take_mod(b)
    inv = x.inv(b)
    for t in m.value.limbs:
        b.register_public_input(t)
    pw = ckt.Witness()
    xv, yv = oracle.random_fq(RNG), oracle.random_fq(RNG)
    x.set_witness(pw, xv)
    y.set_witness(pw, yv)
    circuit = b.build()
    values = circuit.generate_witness(pw)
    circuit.check(values)
    assert m.get_witness(values) == xv * yv % params.P
    assert inv.get_witness(values) == pow(xv, -1, params.P)

    data = outer.compile_outer(circuit, table_bits=10)
    proof, publics = outer.prove_outer(data, values, TEST_CONFIG)
    outer.verify_outer(data, proof, publics, TEST_CONFIG)

    # corrupt one limb of the product
    bad = dict(values)
    limb = m.value.limbs[0].index
    bad[limb] = (bad[limb] + 1) % gl.P
    proof_b, publics_b = outer.prove_outer(data, bad, TEST_CONFIG)
    with pytest.raises(VerificationError):
        outer.verify_outer(data, proof_b, publics_b, TEST_CONFIG)
