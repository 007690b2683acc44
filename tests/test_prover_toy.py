"""End-to-end prove/verify pipeline shakedown on a tiny toy STARK.

Exercises every prover subsystem (commit, LogUp lookup, CTL binding,
quotient, openings, batch FRI, PoW) in milliseconds before the full-width
machines run — the micro-STARK harness pattern of SURVEY.md §4.4.
"""

import numpy as np
import pytest

from plonky2_bn254_tpu.field import goldilocks as gl
from plonky2_bn254_tpu.prover import prove as prove_mod
from plonky2_bn254_tpu.prover import verify as verify_mod
from plonky2_bn254_tpu.prover.config import TEST_CONFIG
from plonky2_bn254_tpu.starks.demo import demo_stark as toy_stark
from plonky2_bn254_tpu.starks.demo import demo_trace as toy_trace


def test_toy_roundtrip():
    rng = np.random.default_rng(11)
    stark = toy_stark()
    trace, ctl_values = toy_trace(rng)
    proof = prove_mod.prove(stark, trace, ctl_values, TEST_CONFIG)
    verify_mod.verify(stark, proof, ctl_values, TEST_CONFIG)


def test_toy_rejects_corruption():
    rng = np.random.default_rng(12)
    stark = toy_stark()
    trace, ctl_values = toy_trace(rng)

    # corrupt a trace cell: double != 2v on one row
    bad = trace.at[17, 1].add(1)
    proof = prove_mod.prove(stark, bad, ctl_values, TEST_CONFIG)
    with pytest.raises(verify_mod.VerificationError):
        verify_mod.verify(stark, proof, ctl_values, TEST_CONFIG)

    # wrong CTL values (claimed I/O doesn't match the trace)
    proof2 = prove_mod.prove(stark, trace, ctl_values, TEST_CONFIG)
    bad_ctl = {0: [list(row) for row in ctl_values[0]]}
    bad_ctl[0][0][0] = (bad_ctl[0][0][0] + 1) % gl.P
    with pytest.raises(verify_mod.VerificationError):
        verify_mod.verify(stark, proof2, bad_ctl, TEST_CONFIG)

    # tampered opening value
    proof3 = prove_mod.prove(stark, trace, ctl_values, TEST_CONFIG)
    from plonky2_bn254_tpu.field.extension import GLExt

    proof3.openings.trace_zeta[0] = proof3.openings.trace_zeta[0] + GLExt(1)
    with pytest.raises(verify_mod.VerificationError):
        verify_mod.verify(stark, proof3, ctl_values, TEST_CONFIG)


def test_keyed_lookup_roundtrip():
    """KeyedLookup: (key, value) pairs bound to a function table via the
    beta-combined LogUp argument (prover aux + shared constraint path)."""
    from plonky2_bn254_tpu.starks.demo import keyed_demo_stark, keyed_demo_trace

    rng = np.random.default_rng(7)
    stark = keyed_demo_stark()
    trace, ctl_values = keyed_demo_trace(rng)
    proof = prove_mod.prove(stark, trace, ctl_values, TEST_CONFIG)
    verify_mod.verify(stark, proof, ctl_values, TEST_CONFIG)

    # a looked-up value off the table function must be rejected
    bad = trace.at[9, 1].add(1)
    proof2 = prove_mod.prove(stark, bad, ctl_values, TEST_CONFIG)
    with pytest.raises(verify_mod.VerificationError):
        verify_mod.verify(stark, proof2, ctl_values, TEST_CONFIG)


def test_device_fs_proof_matches():
    """The on-device Fiat-Shamir prover path (single end-of-proof pull,
    challenges never leave the device — the real-chip default) must
    produce a BIT-IDENTICAL proof to the host-challenger flow."""
    stark = toy_stark()
    trace, ctl_values = toy_trace(np.random.default_rng(31))
    host_proof = prove_mod.prove(stark, trace, ctl_values, TEST_CONFIG)
    dev_proof = prove_mod.prove(
        stark, trace, ctl_values, TEST_CONFIG, device_fs=True
    )
    verify_mod.verify(stark, dev_proof, ctl_values, TEST_CONFIG)

    np.testing.assert_array_equal(host_proof.trace_cap, dev_proof.trace_cap)
    np.testing.assert_array_equal(host_proof.aux_cap, dev_proof.aux_cap)
    np.testing.assert_array_equal(
        host_proof.quotient_cap, dev_proof.quotient_cap
    )
    for (a, ag), (b, bg) in zip(
        host_proof.openings.all_polys_order(), dev_proof.openings.all_polys_order()
    ):
        assert [(v.c0, v.c1) for v in a] == [(v.c0, v.c1) for v in b]
        assert [(v.c0, v.c1) for v in ag] == [(v.c0, v.c1) for v in bg]
    for ca, cb in zip(host_proof.fri.layer_caps, dev_proof.fri.layer_caps):
        np.testing.assert_array_equal(ca, cb)
    assert [(c.c0, c.c1) for c in host_proof.fri.final_coeffs] == [
        (c.c0, c.c1) for c in dev_proof.fri.final_coeffs
    ]
    assert host_proof.fri.pow_nonce == dev_proof.fri.pow_nonce
    assert host_proof.query_indices == dev_proof.query_indices
    for qa, qb in zip(host_proof.query_initials, dev_proof.query_initials):
        for (ra, pa), (rb, pb) in zip(qa, qb):
            np.testing.assert_array_equal(ra, rb)
            for la, lb in zip(pa, pb):
                np.testing.assert_array_equal(la, lb)
    for qa, qb in zip(host_proof.fri_query_layers, dev_proof.fri_query_layers):
        for la, lb in zip(qa, qb):
            np.testing.assert_array_equal(la.group_values, lb.group_values)
            for pa, pb in zip(la.path, lb.path):
                np.testing.assert_array_equal(pa, pb)


def _filtered_keyed_stark():
    """keyed_demo_stark with a per-pair filter column, covering the
    _aux_combine_keyed + _aux_filter_cols helper path that the outer
    universal-gate STARK takes on the real chip (round-4 advisor
    finding: the fused-vs-plain equality previously only exercised the
    plain-Lookup branch)."""
    import dataclasses

    from plonky2_bn254_tpu.starks.demo import keyed_demo_stark

    stark = keyed_demo_stark()
    stark.lookups[0] = dataclasses.replace(stark.lookups[0], filters=(5,))
    return stark


@pytest.mark.parametrize(
    "mk",
    [
        "demo",
        "keyed",
        "keyed_filtered",
    ],
)
def test_fused_aux_matches(mk):
    """The TPU-fused aux executable (one jit over the whole LogUp/CTL aux
    pipeline) must produce bit-identical columns to the python-composed
    CPU path (prove() picks the fused variant on the real chip)."""
    import jax
    import jax.numpy as jnp
    from plonky2_bn254_tpu.starks.demo import keyed_demo_stark, keyed_demo_trace

    rng = np.random.default_rng(21)
    if mk == "demo":
        stark = toy_stark()
        trace, _ = toy_trace(rng)
    else:
        # fused-vs-plain equality is a pure function-equality check on the
        # aux pipeline, so the keyed trace serves both keyed variants
        stark = keyed_demo_stark() if mk == "keyed" else _filtered_keyed_stark()
        trace, _ = keyed_demo_trace(rng)
    trace_cols = jnp.asarray(trace).T
    betas = jnp.asarray(np.array([3, 5], dtype=np.uint64))
    gammas = jnp.asarray(np.array([7, 11], dtype=np.uint64))
    ctl_weight_specs = [
        [
            (
                jnp.asarray(np.array([c for c, _ in ctl.flat_weights(int(b), gl.P)],
                                     dtype=np.int64)),
                jnp.asarray(np.array([w for _, w in ctl.flat_weights(int(b), gl.P)],
                                     dtype=np.uint64)),
            )
            for ctl in stark.ctls
        ]
        for b in (3, 5)
    ]
    aux_plain = prove_mod._make_aux(stark)
    aux_fused = jax.jit(prove_mod._make_aux(stark))
    a = np.asarray(aux_plain(trace_cols, betas, gammas, ctl_weight_specs))
    b = np.asarray(aux_fused(trace_cols, betas, gammas, ctl_weight_specs))
    np.testing.assert_array_equal(a, b)
