"""The reference's FLAGSHIP shape: ONE circuit containing all three
STARK-accelerated op kinds, proved as ONE outer artifact.

Rebuild of /root/reference/src/builder.rs:178-260 (`test_bn254_stark` —
10 fq_exp + 10 g1_scalar_mul + 10 g2_scalar_mul recorded on one builder,
one proof for the whole circuit): `build()` emits THREE in-circuit
recursive STARK verifiers (one per kind) plus the ToU16/CTL wire
bindings; witness generation produces the three batch STARK proofs and
injects them; `Circuit.prove_all` then produces ONE outer universal-gate
STARK proof over the whole constraint system, `verify_all` checks it with
only the vk.

Negative cases — one per op kind, each through the outer CONSTRAINT
system: a corrupted opening of the injected fq_exp / g1 / g2 proof makes
the outer proof reject.
"""

import numpy as np
import pytest

from plonky2_bn254_tpu.bn254 import oracle, params
from plonky2_bn254_tpu.circuit import builder_ops, outer
from plonky2_bn254_tpu.circuit.builder import CircuitBuilder, Witness
from plonky2_bn254_tpu.circuit.curves import G1Target, G2Target
from plonky2_bn254_tpu.circuit.fq import FqTarget
from plonky2_bn254_tpu.prover.config import StarkConfig, TEST_CONFIG
from plonky2_bn254_tpu.prover.verify import VerificationError

RNG = np.random.default_rng(301)

N_OPS = 10  # per kind, the reference flagship count (builder.rs:188)

INNER_CONFIG = StarkConfig(
    num_challenges=2,
    rate_bits=1,
    cap_height=1,
    proof_of_work_bits=8,
    num_query_rounds=4,
    arity_bits=2,
    final_poly_degree_bits=3,
)


def _rand_scalar():
    return int(RNG.integers(1, 1 << 62)) << 180 | int(RNG.integers(0, 1 << 62))


def _build():
    builder = CircuitBuilder()
    hook = builder_ops.get_bn254_hook(builder)
    hook.stark_config = INNER_CONFIG
    pw = Witness()
    recs = {"fq_exp": [], "g1_scalar_mul": [], "g2_scalar_mul": []}

    for _ in range(N_OPS):
        s_v = _rand_scalar()
        x_v = oracle.random_fq(RNG)
        x_t = FqTarget.new_unchecked(builder)
        out = builder_ops.fq_exp(builder, s_v, x_t)
        x_t.set_witness(pw, x_v)
        recs["fq_exp"].append((s_v, x_v, out))

    for _ in range(N_OPS):
        s_v = _rand_scalar()
        x_v = oracle.random_g1(RNG)
        off_v = oracle.random_g1(RNG)
        x_t = G1Target.new_unchecked(builder)
        off_t = G1Target.new_unchecked(builder)
        out = builder_ops.g1_scalar_mul(builder, s_v, x_t, off_t)
        x_t.set_witness(pw, x_v)
        off_t.set_witness(pw, off_v)
        recs["g1_scalar_mul"].append((s_v, x_v, off_v, out))

    for _ in range(N_OPS):
        s_v = _rand_scalar()
        x_v = oracle.random_g2(RNG)
        off_v = oracle.random_g2(RNG)
        x_t = G2Target.new_unchecked(builder)
        off_t = G2Target.new_unchecked(builder)
        out = builder_ops.g2_scalar_mul(builder, s_v, x_t, off_t)
        x_t.set_witness(pw, x_v)
        off_t.set_witness(pw, off_v)
        recs["g2_scalar_mul"].append((s_v, x_v, off_v, out))

    # statement: the first fq_exp result
    for t in recs["fq_exp"][0][2].value.limbs:
        builder.register_public_input(t)
    circuit = builder.build()
    return circuit, pw, recs, hook


@pytest.mark.slow
def test_compose_three_kinds_one_artifact():
    circuit, pw, recs, hook = _build()

    proof, publics = circuit.prove_all(pw, TEST_CONFIG)
    circuit.verify_all(proof, publics, TEST_CONFIG)

    # all three kinds were proven and injected
    assert set(hook.proof) == {"fq_exp", "g1_scalar_mul", "g2_scalar_mul"}

    # every op's witness output matches the native oracle
    values = circuit.generate_witness(pw)
    for s_v, x_v, out in recs["fq_exp"]:
        assert out.get_witness(values) == pow(x_v, s_v, params.P)
    for s_v, x_v, off_v, out in recs["g1_scalar_mul"]:
        assert out.get_witness(values) == oracle.g1_add(
            oracle.g1_mul(x_v, s_v), off_v
        )
    for s_v, x_v, off_v, out in recs["g2_scalar_mul"]:
        assert out.get_witness(values) == oracle.g2_add(
            oracle.g2_mul(x_v, s_v), off_v
        )

    # public statement = first fq_exp result
    want = pow(recs["fq_exp"][0][1], recs["fq_exp"][0][0], params.P)
    got = sum(int(v) << (32 * i) for i, v in enumerate(publics))
    assert got == want

    # ---- one tamper case per op kind: corrupt one opening of that
    # kind's injected proof-as-witness -> the outer proof's constraint
    # system (the in-circuit recursive verifier rows) rejects -------------
    data = circuit.outer_data()
    for kind in ("fq_exp", "g1_scalar_mul", "g2_scalar_mul"):
        pt = hook.proof_targets[kind]
        bad = dict(values)
        idx = pt.trace_zeta[0].c0.index
        bad[idx] = (bad[idx] + 1) % outer.gl.P
        p_bad, pub_bad = outer.prove_outer(data, bad, TEST_CONFIG)
        with pytest.raises(VerificationError):
            outer.verify_outer(data, p_bad, pub_bad, TEST_CONFIG)
