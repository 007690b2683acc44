"""Hook batch scale: 128 fq_exp ops through ONE StarkProofGenerator.

The reference's generator tests run 128 ops per kind
(/root/reference/src/generators/fq/stark_proof.rs, twin of
g1/stark_proof.rs:219-267); round-4 verdict item 6 asked for the same
shape here with measured build cost.  128 ops x FQ_PERIOD 512 = exactly
one full 2^16-row FqExp trace — the STARK work is identical to a 1-op
batch; what scales with n_ops is the circuit side: ToU16 resplits, CTL
value targets, and witness-generation fixpoint size.

Usage: python scripts/measure_hook_scale.py [n_ops] [--fake]
  default n_ops=128 with the REAL backend (build emits the ToU16 resplits
  + recursive verifier via _constrain_kind; witness generation proves the
  batch STARK).  --fake skips _constrain_kind to isolate the recording
  cost.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

import numpy as np

from plonky2_bn254_tpu import circuit as ckt
from plonky2_bn254_tpu.bn254 import oracle, params
from plonky2_bn254_tpu.circuit import builder_ops
from plonky2_bn254_tpu.circuit.fq import FqTarget
from plonky2_bn254_tpu.field import goldilocks as _gl
from plonky2_bn254_tpu.prover.config import StarkConfig

_gl.CPU_FRIENDLY_SCANS = True

CONFIG = StarkConfig(
    num_challenges=2,
    rate_bits=1,
    cap_height=1,
    proof_of_work_bits=8,
    num_query_rounds=4,
    arity_bits=2,
    final_poly_degree_bits=3,
)


def main():
    n_ops = 128
    prove = "--fake" not in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        n_ops = int(args[0])
    rng = np.random.default_rng(128)

    t0 = time.time()
    b = ckt.CircuitBuilder()
    hook = builder_ops.get_bn254_hook(b)
    hook.stark_config = CONFIG
    hook.prove_starks = prove
    pw = ckt.Witness()
    recorded = []
    for _ in range(n_ops):
        s_v = int(rng.integers(1, 1 << 62)) << 180 | int(rng.integers(0, 1 << 62))
        x_v = oracle.random_fq(rng)
        x_t = FqTarget.new_unchecked(b)
        out = builder_ops.fq_exp(b, s_v, x_t)
        x_t.set_witness(pw, x_v)
        recorded.append((s_v, x_v, out))
    record_s = time.time() - t0

    t0 = time.time()
    circuit = b.build()
    build_s = time.time() - t0
    n_targets = b.num_targets
    n_constraints = len(b.constraints) + len(b.tpl_rows)
    print(
        f"n_ops={n_ops} record={record_s:.2f}s build={build_s:.2f}s "
        f"targets={n_targets} constraints~={n_constraints} "
        f"backend={'REAL' if prove else 'fake'}",
        flush=True,
    )

    t0 = time.time()
    values = circuit.generate_witness(pw)
    witness_s = time.time() - t0
    t0 = time.time()
    circuit.check(values)
    check_s = time.time() - t0
    for s_v, x_v, out in recorded:
        assert out.get_witness(values) == pow(x_v, s_v, params.P)
    print(
        f"witness={witness_s:.2f}s check={check_s:.2f}s — all {n_ops} "
        "outputs match the native oracle",
        flush=True,
    )


if __name__ == "__main__":
    main()
