"""G2 scalar-mul STARK end-to-end: prove + verify a batch (2^16 rows).

Mirror of the reference's g2_scalar_mul roundtrip test
(/root/reference/src/starks/curves/g2/scalar_mul_stark.rs:551-643,
num_inputs = 1), minus recursion (covered by the hook-binding tier).
The full minimum-size trace is committed (1295 polys x 2^17 LDE) — the
widest machine in the framework, previously never proven end-to-end.
"""

import numpy as np
import pytest

from plonky2_bn254_tpu.bn254 import oracle
from plonky2_bn254_tpu.prover import prove as prove_mod
from plonky2_bn254_tpu.prover import verify as verify_mod
from plonky2_bn254_tpu.prover.config import TEST_CONFIG
from plonky2_bn254_tpu.starks import g2_scalar_mul
from plonky2_bn254_tpu.starks.table import g2_scalar_mul_stark

RNG = np.random.default_rng(63)


@pytest.mark.slow
def test_g2_scalar_mul_roundtrip():
    s = int(RNG.integers(1, 1 << 63)) << 150 | int(RNG.integers(0, 1 << 63))
    inputs = [(s, oracle.random_g2(RNG), oracle.random_g2(RNG), 0)]
    stark = g2_scalar_mul_stark()
    trace = g2_scalar_mul.generate_trace(inputs)  # min 2^16 rows
    assert trace.shape == (1 << 16, 1295)
    ctl_values = g2_scalar_mul.generate_ctl_values(inputs)
    proof = prove_mod.prove(stark, trace, ctl_values, TEST_CONFIG)
    verify_mod.verify(stark, proof, ctl_values, TEST_CONFIG)

    # negative CTL: claiming a different output limb must fail
    bad_ctl = {k: [list(r) for r in v] for k, v in ctl_values.items()}
    bad_ctl[1][0][0] = (bad_ctl[1][0][0] + 1) % (1 << 16)
    with pytest.raises(verify_mod.VerificationError):
        verify_mod.verify(stark, proof, bad_ctl, TEST_CONFIG)
