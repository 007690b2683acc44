"""Test configuration: route all computation to a virtual 8-device CPU mesh.

The axon TPU platform in this environment ignores ``JAX_PLATFORMS=cpu`` and
forces the TPU as default backend, so instead we set the *default device* to
a forced-host CPU device.  Multi-chip tests build meshes from
``jax.devices('cpu')`` (8 virtual devices via xla_force_host_platform_
device_count), per SURVEY.md §4.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in flags:
    # 8 virtual device threads on ~4 cores: big per-shard kernels skew past
    # XLA-CPU's default 20s/40s collective rendezvous timers, which ABORT
    # the test process.  Emulation is oversubscribed, not hung — widen.
    flags += (
        " --xla_cpu_collective_timeout_seconds=1200"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

# XLA CPU chokes compiling the associative_scan batch-inverse graphs
# (tens of minutes for one executable); tests use the sequential-scan
# implementation, which produces bit-identical values.
from plonky2_bn254_tpu.field import goldilocks as _gl  # noqa: E402

_gl.CPU_FRIENDLY_SCANS = True


def cpu_devices():
    return jax.local_devices(backend="cpu")

# Persistent XLA compilation cache: eager-mode prover code compiles many
# small kernels; cache them across test processes.  Tests always execute on
# the forced-host CPU devices (jax_default_device above), so the cache is
# keyed by the *device* platform, not jax.default_backend() — under the
# axon TPU plugin default_backend() reports "tpu" even though every test
# runs on CPU, which used to scatter CPU executables into .jax_cache_tpu.
import pathlib

_cache_platform = jax.local_devices(backend="cpu")[0].platform
_cache_dir = pathlib.Path(__file__).resolve().parent.parent / f".jax_cache_{_cache_platform}"
_cache_dir.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
