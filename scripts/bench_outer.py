"""Composed-product (outer prover) benchmark on the real chip.

Round-4 verdict item 7: the outer universal-gate STARK prove is the
reference's hot loop 4 (SURVEY.md §3.3) and was unmeasured as a metric.
This emits ONE JSON line with the stage breakdown of the composed
artifact at PRODUCTION config (DEFAULT_CONFIG inner + outer; 2-op fq_exp
circuit, 2^20-row outer trace from ~495k targets) and writes
BENCH_OUTER.json at the repo root for round-over-round tracking.

Run manually on the chip (nothing else on the tunnel):
    python scripts/bench_outer.py
"""

import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax

jax.config.update("jax_enable_x64", True)
_cache = ROOT / f".jax_cache_{jax.default_backend()}"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np


def main():
    from plonky2_bn254_tpu.bn254 import oracle, params
    from plonky2_bn254_tpu.circuit import builder_ops, outer
    from plonky2_bn254_tpu.circuit.builder import CircuitBuilder, Witness
    from plonky2_bn254_tpu.circuit.fq import FqTarget
    from plonky2_bn254_tpu.prover.config import DEFAULT_CONFIG
    from plonky2_bn254_tpu.prover.verify import VerificationError

    rng = np.random.default_rng(123)
    stages = {}

    t0 = time.time()
    builder = CircuitBuilder()
    hook = builder_ops.get_bn254_hook(builder)
    hook.stark_config = DEFAULT_CONFIG
    pw = Witness()
    outs = []
    for _ in range(2):
        x_t = FqTarget.new_unchecked(builder)
        s_v = int(rng.integers(1, 1 << 62)) << 150 | int(rng.integers(0, 1 << 62))
        x_v = oracle.random_fq(rng)
        out_t = builder_ops.fq_exp(builder, s_v, x_t)
        x_t.set_witness(pw, x_v)
        outs.append((out_t, pow(x_v, s_v, params.P)))
    for t in outs[0][0].value.limbs:
        builder.register_public_input(t)
    circuit = builder.build()
    stages["build_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    values = circuit.generate_witness(pw)
    stages["witness_inner_stark_s"] = round(time.time() - t0, 1)
    for out_t, want in outs:
        assert out_t.get_witness(values) == want

    t0 = time.time()
    data = circuit.outer_data(16)
    stages["compile_outer_s"] = round(time.time() - t0, 1)
    stages["outer_rows_log2"] = data.n_log

    t0 = time.time()
    proof, publics = outer.prove_outer(data, values, DEFAULT_CONFIG)
    stages["outer_prove_cold_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    proof, publics = outer.prove_outer(data, values, DEFAULT_CONFIG)
    stages["outer_prove_steady_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    outer.verify_outer(data, proof, publics, DEFAULT_CONFIG)
    stages["verify_all_s"] = round(time.time() - t0, 1)

    bad = list(publics)
    bad[0] = (bad[0] + 1) % ((1 << 64) - (1 << 32) + 1)
    try:
        outer.verify_outer(data, proof, bad, DEFAULT_CONFIG)
        raise SystemExit("FAIL: corrupted public input accepted")
    except VerificationError:
        stages["corrupted_public_rejected"] = True

    result = {
        "metric": "composed_outer_prove_steady_s",
        "value": stages["outer_prove_steady_s"],
        "unit": "s",
        "stages": stages,
    }
    line = json.dumps(result)
    print(line, flush=True)
    (ROOT / "BENCH_OUTER.json").write_text(line + "\n")


if __name__ == "__main__":
    main()
