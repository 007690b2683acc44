"""G1 / G2 through the recursive hook binding.

Completes the reference's StarkProofGenerator coverage for all three op
kinds (/root/reference/src/generators/g1/stark_proof.rs:219-267 and the
g2 twin): one op each, recorded on the builder; `build()` emits the ToU16
resplit + in-circuit recursive STARK verifier; witness generation proves
the batch STARK, self-verifies, injects the proof, and `Circuit.check`
enforces the verifier constraints including the CTL wire binding.  The
fq_exp flavor (including tamper rejection) lives in
tests/test_hook_recursion.py.
"""

import numpy as np
import pytest

from plonky2_bn254_tpu.bn254 import oracle
from plonky2_bn254_tpu.circuit import builder_ops
from plonky2_bn254_tpu.circuit.builder import CircuitBuilder, Witness
from plonky2_bn254_tpu.circuit.curves import G1Target, G2Target
from plonky2_bn254_tpu.prover.config import StarkConfig

RNG = np.random.default_rng(88)

HOOK_RECURSION_CONFIG = StarkConfig(
    num_challenges=2,
    rate_bits=1,
    cap_height=1,
    proof_of_work_bits=8,
    num_query_rounds=4,
    arity_bits=2,
    final_poly_degree_bits=3,
)


@pytest.mark.slow
def test_g1_hook_recursive_roundtrip():
    builder = CircuitBuilder()
    hook = builder_ops.get_bn254_hook(builder)
    hook.stark_config = HOOK_RECURSION_CONFIG
    pw = Witness()
    s_v = int(RNG.integers(1, 1 << 62)) << 180 | int(RNG.integers(0, 1 << 62))
    x_v = oracle.random_g1(RNG)
    off_v = oracle.random_g1(RNG)
    x_t = G1Target.new_unchecked(builder)
    off_t = G1Target.new_unchecked(builder)
    out = builder_ops.g1_scalar_mul(builder, s_v, x_t, off_t)
    x_t.set_witness(pw, x_v)
    off_t.set_witness(pw, off_v)
    circuit = builder.build()
    values, proofs = circuit.prove(pw)
    want = oracle.g1_add(oracle.g1_mul(x_v, s_v), off_v)
    assert out.get_witness(values) == want
    assert "g1_scalar_mul" in proofs["bn254"]


@pytest.mark.slow
def test_g2_hook_recursive_roundtrip():
    builder = CircuitBuilder()
    hook = builder_ops.get_bn254_hook(builder)
    hook.stark_config = HOOK_RECURSION_CONFIG
    pw = Witness()
    s_v = int(RNG.integers(1, 1 << 62)) << 180 | int(RNG.integers(0, 1 << 62))
    x_v = oracle.random_g2(RNG)
    off_v = oracle.random_g2(RNG)
    x_t = G2Target.new_unchecked(builder)
    off_t = G2Target.new_unchecked(builder)
    out = builder_ops.g2_scalar_mul(builder, s_v, x_t, off_t)
    x_t.set_witness(pw, x_v)
    off_t.set_witness(pw, off_v)
    circuit = builder.build()
    values, proofs = circuit.prove(pw)
    want = oracle.g2_add(oracle.g2_mul(x_v, s_v), off_v)
    assert out.get_witness(values) == want
    assert "g2_scalar_mul" in proofs["bn254"]


@pytest.mark.slow
def test_g1_hook_rejects_mismatched_trace(monkeypatch):
    """Prove a different G1 batch than recorded: internally consistent,
    but the in-circuit CTL binding must reject it (constraints, not
    asserts) — the g1 twin of the fq_exp tamper test."""
    from plonky2_bn254_tpu.starks import g1_scalar_mul as machine

    builder = CircuitBuilder()
    hook = builder_ops.get_bn254_hook(builder)
    hook.stark_config = HOOK_RECURSION_CONFIG
    pw = Witness()
    s_v = int(RNG.integers(1, 1 << 62))
    x_v = oracle.random_g1(RNG)
    off_v = oracle.random_g1(RNG)
    x_t = G1Target.new_unchecked(builder)
    off_t = G1Target.new_unchecked(builder)
    builder_ops.g1_scalar_mul(builder, s_v, x_t, off_t)
    x_t.set_witness(pw, x_v)
    off_t.set_witness(pw, off_v)
    circuit = builder.build()

    real_trace = machine.generate_trace
    real_ctl = machine.generate_ctl_values

    def tamper(inputs):
        return [(s + 1, x, off, t) for (s, x, off, t) in inputs]

    monkeypatch.setattr(
        machine, "generate_trace", lambda inputs: real_trace(tamper(inputs))
    )
    monkeypatch.setattr(
        machine, "generate_ctl_values", lambda inputs: real_ctl(tamper(inputs))
    )
    with pytest.raises(ValueError):
        values = circuit.generate_witness(pw)
        circuit.check(values)
