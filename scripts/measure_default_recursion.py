"""Measure the PRODUCTION-config recursion circuit (VERDICT r2 item 7).

Builds the full hook path — ToU16 resplit + in-circuit recursive STARK
verifier for the FqExp machine (427 cols, 2^16 rows) — at DEFAULT_CONFIG
(84 query rounds, cap height 4, arity 16: the analog of the reference's
`StarkConfig::standard_fast_config()`, /root/reference/src/generators/g1/
stark_proof.rs:85) and prints the python build cost and circuit size.
Numbers are recorded in README.md ("Production recursion circuit").

Usage: python scripts/measure_default_recursion.py [kind] [n_ops]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from plonky2_bn254_tpu.bn254 import oracle
from plonky2_bn254_tpu.circuit import builder_ops
from plonky2_bn254_tpu.circuit.builder import CircuitBuilder, Witness
from plonky2_bn254_tpu.circuit.fq import FqTarget
from plonky2_bn254_tpu.prover.config import DEFAULT_CONFIG


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "fq_exp"
    n_ops = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rng = np.random.default_rng(7)

    builder = CircuitBuilder()
    hook = builder_ops.get_bn254_hook(builder)
    hook.stark_config = DEFAULT_CONFIG

    t0 = time.time()
    for _ in range(n_ops):
        if kind == "fq_exp":
            x_t = FqTarget.new_unchecked(builder)
            s_v = int(rng.integers(1, 1 << 62)) << 150 | int(
                rng.integers(0, 1 << 62)
            )
            builder_ops.fq_exp(builder, s_v, x_t)
        else:
            raise SystemExit(f"unknown kind {kind}")
    record_s = time.time() - t0

    t0 = time.time()
    circuit = builder.build()  # emits ToU16 + the recursive verifier
    build_s = time.time() - t0

    b = circuit.builder
    tpl_uses = len(b.tpl_rows)
    print(
        f"kind={kind} n_ops={n_ops} config=DEFAULT_CONFIG"
        f" (84 query rounds, cap 4, arity 16, pow 16)"
    )
    print(f"record ops:         {record_s:8.2f}s")
    print(f"build (verifier):   {build_s:8.2f}s  python, single thread")
    print(f"targets:            {b.num_targets:>10,}")
    print(f"constraints (obj):  {len(b.constraints):>10,}")
    print(f"templated rows:     {tpl_uses:>10,}  ({len(b.templates)} templates)")
    print(f"generators:         {len(b.generators):>10,}")
    print(f"poseidon ops:       {len(b.poseidon_ops):>10,}")

    # outer-prover compilation of the production circuit (VERDICT r2
    # weak #5: the outer prover's compile/trace-build cost on a
    # recursion-scale circuit): set MEASURE_COMPILE_OUTER=1
    import os

    if os.environ.get("MEASURE_COMPILE_OUTER"):
        from plonky2_bn254_tpu.circuit import outer

        t0 = time.time()
        data = outer.compile_outer(circuit)
        compile_s = time.time() - t0
        print(f"compile_outer:      {compile_s:8.2f}s  python, single thread")
        print(f"outer gate rows:    {data.n_gate_rows:>10,}")
        print(f"outer poseidon rows:{data.n_pos * 31:>10,}  ({data.n_pos} permutations)")
        print(f"outer trace rows:   {1 << data.n_log:>10,}  (2^{data.n_log})")
        print(f"outer wires:        {data.n_wires:>10,}")


if __name__ == "__main__":
    main()
