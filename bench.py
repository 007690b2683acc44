"""Benchmark: batched G1 scalar-mul STARK proving throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.md): G1 scalar-mul STARK op-proofs/s.  One
batched proof covers BENCH_OPS ops (default 128 = one full 2^16-row trace,
the reference's test batch size, scalar_mul_stark.rs:554); throughput =
ops / wall-clock of the steady-state prove (trace generation + full STARK
prove) after one warmup iteration.  vs_baseline is against the driver
target of 100 proofs/s (BASELINE.json, v5p-8 target vs this single chip).

Env knobs: BENCH_OPS (ops per proof), BENCH_FAST=1 (tiny run: toy-stark
pipeline only, for smoke tests).
"""

import json
import os
import pathlib
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
_cache = pathlib.Path(__file__).resolve().parent / f".jax_cache_{jax.default_backend()}"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np


def main():
    import plonky2_bn254_tpu  # noqa: F401
    from plonky2_bn254_tpu.bn254 import oracle
    from plonky2_bn254_tpu.prover import prove as prove_mod
    from plonky2_bn254_tpu.prover import verify as verify_mod
    from plonky2_bn254_tpu.prover.config import DEFAULT_CONFIG
    from plonky2_bn254_tpu.starks import g1_scalar_mul
    from plonky2_bn254_tpu.starks.table import g1_scalar_mul_stark
    from plonky2_bn254_tpu.utils.timing import TimingTree

    n_ops = int(os.environ.get("BENCH_OPS", "128"))
    rng = np.random.default_rng(2024)
    inputs = [
        (
            int(rng.integers(1, 1 << 63)) << 192 | int(rng.integers(0, 1 << 63)),
            oracle.random_g1(rng),
            oracle.random_g1(rng),
            t,
        )
        for t in range(n_ops)
    ]
    stark = g1_scalar_mul_stark()
    ctl_values = g1_scalar_mul.generate_ctl_values(inputs)

    def one_proof(tt=None):
        tt = tt or TimingTree(enabled=False)
        with tt.scope("trace gen"):
            trace = g1_scalar_mul.generate_trace(inputs)
        return prove_mod.prove(stark, trace, ctl_values, DEFAULT_CONFIG, timing=tt)

    # warmup (compilation; cached persistently across runs)
    t0 = time.time()
    proof = one_proof()
    warm = time.time() - t0
    print(f"# warmup prove: {warm:.1f}s", file=sys.stderr)

    # correctness gate: the proof must verify
    verify_mod.verify(stark, proof, ctl_values, DEFAULT_CONFIG)
    print("# proof verified", file=sys.stderr)

    tt = TimingTree(enabled=True)
    t0 = time.time()
    one_proof(tt)
    steady = time.time() - t0
    print(f"# steady-state prove: {steady:.1f}s", file=sys.stderr)
    print("# stage breakdown:", file=sys.stderr)
    tt.print(out=sys.stderr)

    value = n_ops / steady
    stages = {}
    for _, name, secs in tt.records:
        stages[name] = round(stages.get(name, 0.0) + secs, 3)
    print(
        json.dumps(
            {
                "metric": "g1_scalar_mul_proofs_per_s",
                "value": round(value, 3),
                "unit": "proofs/s",
                "vs_baseline": round(value / 100.0, 4),
                "stages_s": stages,
            }
        )
    )


if __name__ == "__main__":
    main()
