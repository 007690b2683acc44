"""FqExp STARK end-to-end: prove + verify a batch of x^s ops (2^16 rows).

Mirror of the reference's fq_exp roundtrip test
(/root/reference/src/starks/fields/exp_stark.rs:533-600), minus recursion
(circuit layer lands later).  Slow on CPU — the full minimum-size trace is
committed (427 polys x 2^17 LDE).
"""

import numpy as np
import pytest

from plonky2_bn254_tpu.bn254 import oracle, params
from plonky2_bn254_tpu.prover import prove as prove_mod
from plonky2_bn254_tpu.prover import verify as verify_mod
from plonky2_bn254_tpu.prover.config import TEST_CONFIG
from plonky2_bn254_tpu.starks import fq_exp
from plonky2_bn254_tpu.starks.table import fq_exp_stark

RNG = np.random.default_rng(21)


@pytest.mark.slow
def test_fq_exp_roundtrip():
    n_ops = 4
    inputs = [
        (
            int(RNG.integers(0, 1 << 62)) << 194 | int(RNG.integers(0, 1 << 62)),
            oracle.random_fq(RNG),
            t,
        )
        for t in range(n_ops)
    ]
    stark = fq_exp_stark()
    trace = fq_exp.generate_trace(inputs)  # min 2^16 rows
    assert trace.shape == (1 << 16, 427)
    ctl_values = fq_exp.generate_ctl_values(inputs)
    proof = prove_mod.prove(stark, trace, ctl_values, TEST_CONFIG)
    verify_mod.verify(stark, proof, ctl_values, TEST_CONFIG)

    # binding: claiming a different output must fail
    bad_ctl = {k: [list(r) for r in v] for k, v in ctl_values.items()}
    bad_ctl[1][0][0] = (bad_ctl[1][0][0] + 1) % (1 << 16)
    with pytest.raises(verify_mod.VerificationError):
        verify_mod.verify(stark, proof, bad_ctl, TEST_CONFIG)
