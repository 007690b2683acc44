"""Regression: UNREDUCED (lazily-reduced, >8-limb) values through every
hook op kind.

Round-4 verdict #1: `FqTarget.is_square` passed its lazily-reduced
receiver (e.g. a 17-limb Fq2-norm product) straight into the hook, and
`build()` crashed in the ToU16 resplit (`to_u16.py` asserts <= 16 u16
halves).  The reference never hits this because its FqTarget is always 8
limbs with lazy reduction as a flag (src/fields/fq.rs:42-44).  The hook
entry points now canonicalise (`take_mod`) before recording; this test
feeds an unreduced Fq / G1 / G2 through each op kind and checks build +
witness + constraint satisfaction against the native oracle.

Runs with the fake backend (`prove_starks = False`): the crash was at
circuit BUILD time, and the ToU16/CTL recording happens identically; the
real-backend path is covered by tests/test_hash_to_g2_real.py.
"""

import numpy as np

from plonky2_bn254_tpu import circuit as ckt
from plonky2_bn254_tpu.bn254 import oracle, params
from plonky2_bn254_tpu.circuit import builder_ops
from plonky2_bn254_tpu.circuit.curves import G1Target, G2Target
from plonky2_bn254_tpu.circuit.fq import FqTarget

RNG = np.random.default_rng(41)


def test_unreduced_inputs_every_op_kind():
    b = ckt.CircuitBuilder()
    hook = builder_ops.get_bn254_hook(b)
    hook.prove_starks = False
    pw = ckt.Witness()

    xv, yv = oracle.random_fq(RNG), oracle.random_fq(RNG)
    x = FqTarget.new_unchecked(b)
    y = FqTarget.new_unchecked(b)
    prod = x.mul(b, y)  # unreduced: 16 u32 limbs, mod_taken=False
    assert not prod.mod_taken and prod.value.num_limbs == 16

    e = builder_ops.fq_exp(b, 5, prod)
    flag = prod.is_square(b)  # the round-4 crash path (17-limb receiver)

    # G1/G2 points with unreduced coordinates (gadget-algebra products)
    one = FqTarget.one(b)
    g1 = G1Target.new_unchecked(b)
    g1o = G1Target.new_unchecked(b)
    g1_lazy = G1Target(g1.x.mul(b, one), g1.y.mul(b, one))
    assert not g1_lazy.x.mod_taken
    o1 = builder_ops.g1_scalar_mul(b, 3, g1_lazy, g1o)

    g2 = G2Target.new_unchecked(b)
    g2o = G2Target.new_unchecked(b)
    o2 = builder_ops.g2_scalar_mul(b, 3, g2, g2o)

    x.set_witness(pw, xv)
    y.set_witness(pw, yv)
    p1, p1o = oracle.random_g1(RNG), oracle.random_g1(RNG)
    p2, p2o = oracle.random_g2(RNG), oracle.random_g2(RNG)
    g1.set_witness(pw, p1)
    g1o.set_witness(pw, p1o)
    g2.set_witness(pw, p2)
    g2o.set_witness(pw, p2o)

    circuit = b.build()  # round-4: AssertionError here (to_u16.py:47)
    values = circuit.generate_witness(pw)
    circuit.check(values)

    pv = xv * yv % params.P
    assert e.get_witness(values) == pow(pv, 5, params.P)
    want_sq = 1 if pow(pv, (params.P - 1) // 2, params.P) == 1 else 0
    assert values[flag.index] == want_sq
    assert o1.get_witness(values) == oracle.g1_add(oracle.g1_mul(p1, 3), p1o)
    assert o2.get_witness(values) == oracle.g2_add(oracle.g2_mul(p2, 3), p2o)
