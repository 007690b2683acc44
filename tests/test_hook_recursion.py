"""End-to-end hook binding: batch STARK proof verified IN-CIRCUIT.

The rebuild of the reference's full StarkProofGenerator flow
(/root/reference/src/generators/g1/stark_proof.rs:55-179 +
src/starks/common/verifier.rs:101-185): `fq_exp` ops recorded on the
builder, `build()` emits the ToU16 resplit + recursive STARK verifier,
witness generation proves the batch STARK and injects the proof into its
witness targets, and `Circuit.check` enforces the verifier CONSTRAINTS —
including the CTL extra-looking sums that bind circuit wires to the proven
trace.  A tampered trace (proving different inputs than the circuit
recorded) must fail via constraints, not host asserts.
"""

import numpy as np
import pytest

from plonky2_bn254_tpu.bn254 import oracle, params
from plonky2_bn254_tpu.circuit import builder_ops
from plonky2_bn254_tpu.circuit.builder import CircuitBuilder, Witness
from plonky2_bn254_tpu.circuit.fq import FqTarget
from plonky2_bn254_tpu.prover.config import StarkConfig

RNG = np.random.default_rng(77)

# Few query rounds: the verifier circuit is built in python; the circuit
# SHAPE is config-generic (production uses DEFAULT_CONFIG).
HOOK_RECURSION_CONFIG = StarkConfig(
    num_challenges=2,
    rate_bits=1,
    cap_height=1,
    proof_of_work_bits=8,
    num_query_rounds=4,
    arity_bits=2,
    final_poly_degree_bits=3,
)


def _build_fq_exp_circuit(n_ops=2):
    builder = CircuitBuilder()
    hook = builder_ops.get_bn254_hook(builder)
    hook.stark_config = HOOK_RECURSION_CONFIG
    xs, ss, outs = [], [], []
    pw = Witness()
    for _ in range(n_ops):
        x_t = FqTarget.new_unchecked(builder)
        s_v = int(RNG.integers(1, 1 << 62)) << 150 | int(RNG.integers(0, 1 << 62))
        x_v = oracle.random_fq(RNG)
        out = builder_ops.fq_exp(builder, s_v, x_t)
        x_t.set_witness(pw, x_v)
        xs.append(x_v)
        ss.append(s_v)
        outs.append(out)
    circuit = builder.build()
    return circuit, pw, xs, ss, outs, hook


@pytest.mark.slow
def test_fq_exp_hook_recursive_roundtrip():
    circuit, pw, xs, ss, outs, hook = _build_fq_exp_circuit(n_ops=2)
    values, proofs = circuit.prove(pw)
    # outputs are the native ground truth
    for x_v, s_v, out in zip(xs, ss, outs):
        assert out.get_witness(values) == pow(x_v, s_v, params.P)
    # the batch proof landed on the hook
    assert "fq_exp" in proofs["bn254"]


@pytest.mark.slow
def test_fq_exp_hook_rejects_mismatched_trace(monkeypatch):
    """Prove a DIFFERENT op batch than the circuit recorded: the proof
    self-verifies (it is internally consistent) but the in-circuit CTL
    binding must reject it."""
    from plonky2_bn254_tpu.starks import fq_exp as fq_exp_machine

    circuit, pw, xs, ss, outs, hook = _build_fq_exp_circuit(n_ops=1)

    real_trace = fq_exp_machine.generate_trace
    real_ctl = fq_exp_machine.generate_ctl_values

    def tamper(inputs):
        return [(s + 1, x, t) for (s, x, t) in inputs]

    monkeypatch.setattr(
        fq_exp_machine, "generate_trace", lambda inputs: real_trace(tamper(inputs))
    )
    monkeypatch.setattr(
        fq_exp_machine,
        "generate_ctl_values",
        lambda inputs: real_ctl(tamper(inputs)),
    )
    with pytest.raises(ValueError):
        values = circuit.generate_witness(pw)
        circuit.check(values)
