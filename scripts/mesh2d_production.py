"""Production FqExp machine proven on a 2-D (dp x tp) hierarchical mesh.

Round-4 verdict item 4b: the 2-D mesh had only ever proven the 5-column
demo machine.  This proves the PRODUCTION FqExp STARK (2^16 rows x 427
cols, reference minimum shape) with the evaluation-row axis sharded over
BOTH axes of a (2, 4) mesh — outer axis = DCN/multi-host analog, inner =
ICI — and asserts the proof verifies and is bit-identical to the
single-device proof.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/mesh2d_production.py
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in flags:
    # oversubscribed virtual devices skew past the default 20s/40s
    # rendezvous timers (see __graft_entry__._dryrun_production)
    flags += (
        " --xla_cpu_collective_timeout_seconds=1200"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)
# The axon TPU plugin IGNORES JAX_PLATFORMS=cpu (conftest note); pin the
# default device so nothing lands on the tunnel from this script.
jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])
_cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache_cpu"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np
from jax.sharding import Mesh

from plonky2_bn254_tpu.field import goldilocks as gl

gl.CPU_FRIENDLY_SCANS = True

from plonky2_bn254_tpu.bn254 import oracle
from plonky2_bn254_tpu.prover import prove as prove_mod
from plonky2_bn254_tpu.prover import verify as verify_mod
from plonky2_bn254_tpu.prover.config import TEST_CONFIG
from plonky2_bn254_tpu.starks import fq_exp
from plonky2_bn254_tpu.starks.table import fq_exp_stark


def flat(proof):
    out = [np.asarray(proof.trace_cap), np.asarray(proof.aux_cap),
           np.asarray(proof.quotient_cap)]
    for vals, vals_g in proof.openings.all_polys_order():
        out.append(np.asarray([[v.c0, v.c1] for v in vals], dtype=np.uint64))
        out.append(np.asarray([[v.c0, v.c1] for v in vals_g], dtype=np.uint64))
    for cap in proof.fri.layer_caps:
        out.append(np.asarray(cap))
    out.append(np.asarray([proof.fri.pow_nonce], dtype=np.uint64))
    out.append(np.asarray(proof.query_indices, dtype=np.int64))
    return out


def main():
    rng = np.random.default_rng(1)
    s = int(rng.integers(1, 1 << 62)) << 150 | int(rng.integers(0, 1 << 62))
    inputs = [(s, oracle.random_fq(rng), 0)]
    stark = fq_exp_stark()
    trace = fq_exp.generate_trace(inputs)
    assert trace.shape == (1 << 16, 427)
    ctl = fq_exp.generate_ctl_values(inputs)

    t0 = time.time()
    single = prove_mod.prove(stark, trace, ctl, TEST_CONFIG)
    print(f"single-device prove: {time.time()-t0:.1f}s", flush=True)

    devices = jax.devices("cpu")
    mesh = Mesh(np.array(devices[:8]).reshape(2, 4), ("dp", "tp"))
    t0 = time.time()
    sharded = prove_mod.prove(
        stark, trace, ctl, TEST_CONFIG, mesh=mesh, mesh_axis=("dp", "tp")
    )
    print(f"2-D (2x4) mesh prove: {time.time()-t0:.1f}s on {mesh}", flush=True)
    verify_mod.verify(stark, sharded, ctl, TEST_CONFIG)
    for a, b in zip(flat(single), flat(sharded)):
        np.testing.assert_array_equal(a, b)
    print("2-D mesh production proof verified + bit-identical to single-device", flush=True)


if __name__ == "__main__":
    main()
