"""hash_to_g2 with the REAL STARK backend.

The reference's full flow proves the STARKs its gadgets record
(/root/reference/src/utils/hash_to_g2.rs:257-276 test +
src/builder.rs:178-260): is_square's fq_exp ops and the blinded cofactor
g2_scalar_mul flow through the hook, each op kind gets ONE batch STARK
proof, and the in-circuit recursive verifiers bind the proofs to the
circuit wires via CTL sums.  Previous rounds only ever ran this flow with
`prove_starks = False`; this is the real-backend variant.
"""

import numpy as np
import pytest

from plonky2_bn254_tpu import circuit as ckt
from plonky2_bn254_tpu.bn254 import oracle
from plonky2_bn254_tpu.circuit import hash_to_g2 as h2g
from plonky2_bn254_tpu.prover.config import StarkConfig

RNG = np.random.default_rng(170)

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
def test_map_to_g2_real_backend():
    """map_to_g2 with prove_starks=True: two fq_exp ops (Legendre symbol
    candidates) and one g2_scalar_mul (cofactor, blinded) are batch-proven
    and bound in-circuit."""
    uv = (oracle.random_fq(RNG), oracle.random_fq(RNG))
    want = h2g.map_to_g2(uv)
    b = ckt.CircuitBuilder()
    hook = ckt.get_bn254_hook(b)
    hook.stark_config = HOOK_RECURSION_CONFIG
    assert hook.prove_starks  # real backend
    u = ckt.Fq2Target.new_unchecked(b)
    out = h2g.map_to_g2_circuit(b, u)
    pw = ckt.Witness()
    u.set_witness(pw, uv)
    circuit = b.build()
    values, proofs = circuit.prove(pw)
    assert out.get_witness(values) == want
    assert "fq_exp" in proofs["bn254"]
    assert "g2_scalar_mul" in proofs["bn254"]
