"""Mesh scaling table (VERDICT r2 item 5): the REAL prover on the
PRODUCTION FqExp machine (2^16 rows x 427 cols), row axis sharded over
1/2/4/8 virtual CPU devices.

CPU-mesh wall-clock is only directional for ICI-connected TPU chips (the
host is oversubscribed, collectives are shared-memory copies), but it
demonstrates the sharding compiles, executes, and produces bit-identical
proofs at every mesh size.  Run:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/mesh_scaling.py
"""

import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)

import pathlib

_cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache_cpu"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np

sys.path.insert(0, ".")

# run all computation on the forced-host CPU devices with the
# compile-friendly sequential scans (see tests/conftest.py)
jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])
from plonky2_bn254_tpu.field import goldilocks as _gl  # noqa: E402

_gl.CPU_FRIENDLY_SCANS = True

from plonky2_bn254_tpu.bn254 import oracle
from plonky2_bn254_tpu.parallel import mesh as mesh_mod
from plonky2_bn254_tpu.prover import prove as prove_mod
from plonky2_bn254_tpu.prover import verify as verify_mod
from plonky2_bn254_tpu.prover.config import TEST_CONFIG
from plonky2_bn254_tpu.starks import fq_exp
from plonky2_bn254_tpu.starks.table import fq_exp_stark


def main():
    rng = np.random.default_rng(17)
    s = int(rng.integers(1, 1 << 62)) << 150 | int(rng.integers(0, 1 << 62))
    inputs = [(s, oracle.random_fq(rng), 0)]
    stark = fq_exp_stark()
    trace = fq_exp.generate_trace(inputs)
    assert trace.shape == (1 << 16, 427)
    ctl = fq_exp.generate_ctl_values(inputs)
    cpu = jax.local_devices(backend="cpu")

    def flat(proof):
        out = [np.asarray(proof.trace_cap), np.asarray(proof.aux_cap),
               np.asarray(proof.quotient_cap)]
        for vals, vals_g in proof.openings.all_polys_order():
            out.append(np.asarray([[v.c0, v.c1] for v in vals], dtype=np.uint64))
            out.append(np.asarray([[v.c0, v.c1] for v in vals_g], dtype=np.uint64))
        for cap in proof.fri.layer_caps:
            out.append(np.asarray(cap))
        out.append(np.asarray([[c.c0, c.c1] for c in proof.fri.final_coeffs],
                              dtype=np.uint64))
        out.append(np.asarray([proof.fri.pow_nonce], dtype=np.uint64))
        out.append(np.asarray(proof.query_indices, dtype=np.int64))
        return out

    baseline = None
    print("| devices | prove wall (warm) | bit-identical proof |")
    print("|---|---|---|")
    for n in (1, 2, 4, 8):
        m = mesh_mod.make_mesh(n, devices=cpu[:n])
        kw = {} if n == 1 else {"mesh": m, "mesh_axis": "dp"}
        proof = prove_mod.prove(stark, trace, ctl, TEST_CONFIG, **kw)  # warmup
        verify_mod.verify(stark, proof, ctl, TEST_CONFIG)
        t0 = time.time()
        proof = prove_mod.prove(stark, trace, ctl, TEST_CONFIG, **kw)
        wall = time.time() - t0
        if baseline is None:
            baseline = proof
            same = "(reference)"
        else:
            same = "yes"
            for a, b in zip(flat(baseline), flat(proof)):
                if not np.array_equal(a, b):
                    same = "NO"
                    break
        print(f"| {n} | {wall:.1f}s | {same} |", flush=True)


if __name__ == "__main__":
    main()
