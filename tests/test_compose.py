"""THE composed product: ONE verifiable artifact for a circuit containing
BN254 STARK-accelerated ops.

Rebuild of the reference's full user flow (`builder.build()` ->
`data.prove(pw)` -> `data.verify(proof)`; /root/reference/src/builder.rs:
178-260 and src/generators/g1/stark_proof.rs:55-179): `fq_exp` ops recorded
on the builder, `build()` emits the in-circuit recursive STARK verifier,
witness generation proves the inner batch STARK and injects it, and
`Circuit.prove_all` produces ONE outer universal-gate STARK proof over the
whole constraint system — recursive verifier, CTL wire binding, ToU16
resplits, Poseidon transcript replay (dedicated round region) included.
A third party runs `verify_all(proof, publics)` with only the verifier
key; no witness regeneration, no host asserts.

Negative cases (each through the outer CONSTRAINT system, not asserts):
  (a) a tampered injected STARK proof  -> outer proof rejects
  (b) a mismatched CTL wire (forged op output, consistently resplit)
                                       -> outer proof rejects
  (c) a corrupted public input         -> verify_all rejects
"""

import numpy as np
import pytest

from plonky2_bn254_tpu.bn254 import oracle, params
from plonky2_bn254_tpu.circuit import builder_ops, outer
from plonky2_bn254_tpu.circuit.builder import CircuitBuilder, Witness
from plonky2_bn254_tpu.circuit.fq import FqTarget
from plonky2_bn254_tpu.field import goldilocks as gl
from plonky2_bn254_tpu.prover.config import StarkConfig, TEST_CONFIG
from plonky2_bn254_tpu.prover.verify import VerificationError

RNG = np.random.default_rng(99)

# Inner STARK config: few query rounds keep the python-built verifier
# sub-circuit small; the circuit SHAPE is config-generic (production:
# DEFAULT_CONFIG — see README for its measured build cost).
INNER_CONFIG = StarkConfig(
    num_challenges=2,
    rate_bits=1,
    cap_height=1,
    proof_of_work_bits=8,
    num_query_rounds=4,
    arity_bits=2,
    final_poly_degree_bits=3,
)


def _build():
    builder = CircuitBuilder()
    hook = builder_ops.get_bn254_hook(builder)
    hook.stark_config = INNER_CONFIG
    pw = Witness()
    xs, ss, outs = [], [], []
    for _ in range(2):
        x_t = FqTarget.new_unchecked(builder)
        s_v = int(RNG.integers(1, 1 << 62)) << 150 | int(
            RNG.integers(0, 1 << 62)
        )
        x_v = oracle.random_fq(RNG)
        out = builder_ops.fq_exp(builder, s_v, x_t)
        x_t.set_witness(pw, x_v)
        xs.append(x_v)
        ss.append(s_v)
        outs.append(out)
    # the first op's result limbs are the statement
    for t in outs[0].value.limbs:
        builder.register_public_input(t)
    circuit = builder.build()
    return circuit, pw, xs, ss, outs, hook


@pytest.mark.slow
def test_compose_fq_exp_one_artifact():
    circuit, pw, xs, ss, outs, hook = _build()

    proof, publics = circuit.prove_all(pw, TEST_CONFIG)
    # the artifact verifies with only the verifier key
    circuit.verify_all(proof, publics, TEST_CONFIG)
    # and the public statement is the native ground truth
    want = pow(xs[0], ss[0], params.P)
    got = sum(int(v) << (32 * i) for i, v in enumerate(publics))
    assert got == want

    # (c) corrupted public input -> CTL multiset mismatch
    bad_publics = list(publics)
    bad_publics[0] = (bad_publics[0] + 1) % gl.P
    with pytest.raises(VerificationError):
        circuit.verify_all(proof, bad_publics, TEST_CONFIG)

    # ---- tamper the WITNESS, re-prove, expect constraint-level reject ----
    values = circuit.generate_witness(pw)
    data = circuit.outer_data()

    # (a) tampered injected STARK proof: corrupt one opening of the
    # proof-as-witness targets -> quotient identity of the in-circuit
    # recursive verifier fails on its gate rows
    pt = hook.proof_targets["fq_exp"]
    bad_a = dict(values)
    idx = pt.trace_zeta[0].c0.index
    bad_a[idx] = (bad_a[idx] + 1) % gl.P
    pa, puba = outer.prove_outer(data, bad_a, TEST_CONFIG)
    with pytest.raises(VerificationError):
        outer.verify_outer(data, pa, puba, TEST_CONFIG)

    # (b) mismatched CTL wire: forge op 1's output limb AND its 16-bit
    # resplit halves consistently (the ToU16 gate still holds; only the
    # CTL extra-looking-sum binding can catch it)
    bad_b = dict(values)
    limb_t = outs[1].value.limbs[0]
    old = bad_b[limb_t.index]
    forged = (old ^ 1) & 0xFFFFFFFF
    bad_b[limb_t.index] = forged
    # find the resplit halves via the recorded generator outputs: the
    # to_u16 template row for this limb defines lo/hi wires; recompute by
    # scanning constraints is brittle — instead regenerate from scratch:
    # overwrite every wire that depended on the limb by rerunning the
    # fixpoint with the forged value pinned.  The inner STARK proof is
    # regenerated too (proving the forged batch) — internally consistent,
    # so ONLY the in-circuit CTL binding to the recorded s (constant
    # scalar wires) distinguishes... to keep the proof honest for the
    # RECORDED ops, re-inject the honest proof values afterwards.
    honest_proof_vals = {
        i: values[i]
        for i in (
            t.index
            for t in __import__(
                "plonky2_bn254_tpu.circuit.stark_verifier",
                fromlist=["flatten_proof_targets"],
            ).flatten_proof_targets(pt)
        )
    }
    # u16 resplit wires of the forged limb: lo = forged & 0xffff, hi >> 16.
    # They are the two wires constrained by `lo + 2^16*hi - limb == 0`;
    # locate them through that ad-hoc/templated row.
    lo_i, hi_i, aliases = _find_resplit(circuit.builder, limb_t.index)
    for a in aliases:  # forge the whole copy-constraint class consistently
        bad_b[a] = forged
    bad_b[lo_i] = forged & 0xFFFF
    bad_b[hi_i] = forged >> 16
    bad_b.update(honest_proof_vals)
    pb, pubb = outer.prove_outer(data, bad_b, TEST_CONFIG)
    with pytest.raises(VerificationError):
        outer.verify_outer(data, pb, pubb, TEST_CONFIG)


def _find_resplit(builder, limb_index):
    """Find (lo, hi) wires of the ToU16 resplit row `lo + 2^16*hi == limb`.

    The recorded output limb is copy-connected to the StarkProofGenerator's
    own output wire (`hook.constrain` connects them), and the resplit row
    references the generator-side alias — so first collect the whole
    copy-constraint class of `limb_index`, then match the row against any
    member.  Returns (lo, hi, alias_class)."""
    aliases = {limb_index}
    changed = True
    while changed:
        changed = False
        for c in builder.constraints:
            mono = getattr(c, "monomials", None)
            if not mono or len(mono) != 2:
                continue
            (c1, s1), (c2, s2) = mono
            if len(s1) != 1 or len(s2) != 1:
                continue
            if sorted((c1, c2)) != [1, gl.P - 1]:
                continue
            a, b = s1[0], s2[0]
            if (a in aliases) != (b in aliases):
                aliases.update((a, b))
                changed = True
    for tid, row in zip(builder.tpl_tids, builder.tpl_rows):
        tpl = builder.templates[tid]
        mono = tpl.monomials
        # shape: (1, (s_lo,)), (2^16, (s_hi,)), (P-1, (s_limb,)) in some order
        if len(mono) != 3 or any(len(s) != 1 for _, s in mono):
            continue
        coeffs = sorted(c for c, _ in mono)
        if coeffs != [1, 1 << 16, gl.P - 1]:
            continue
        slot_by_coeff = {c: s[0] for c, s in mono}
        if row[slot_by_coeff[gl.P - 1]] in aliases:
            return row[slot_by_coeff[1]], row[slot_by_coeff[1 << 16]], aliases
    raise AssertionError("resplit row not found")
