"""THE composed product at PRODUCTION config, proven on the real chip.

The reference's full user flow (`builder.build()` -> `data.prove(pw)` ->
`data.verify(proof)`, /root/reference/src/builder.rs:178-260) at the
DEFAULT_CONFIG parameter class (84 query rounds, cap 4, arity 16,
16-bit PoW — the analog of `StarkConfig::standard_fast_config()`):
fq_exp ops -> recursive verifier at DEFAULT_CONFIG -> witness generation
(inner STARK proven on the chip, self-verified, injected) -> ONE outer
universal-gate STARK proof at DEFAULT_CONFIG over the 2^20-row outer
trace -> verify_all, plus a corrupted-public-input rejection.

Measured on the single v5e chip (2026-08-20): build 1.7 s (495,659
targets), witness+inner STARK 186.6 s, compile_outer 27.9 s, outer
prove 1037.8 s cold (including every remote XLA compile; see the
steady-state second prove this script also runs), verify_all 13.8 s.
"""
import sys, time, pathlib
import jax
jax.config.update("jax_enable_x64", True)
_cache = pathlib.Path("/root/repo") / f".jax_cache_{jax.default_backend()}"
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import numpy as np
sys.path.insert(0, ".")
t00 = time.time()
def mark(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)

from plonky2_bn254_tpu.bn254 import oracle, params
from plonky2_bn254_tpu.circuit import builder_ops, outer
from plonky2_bn254_tpu.circuit.builder import CircuitBuilder, Witness
from plonky2_bn254_tpu.circuit.fq import FqTarget
from plonky2_bn254_tpu.prover.config import DEFAULT_CONFIG
from plonky2_bn254_tpu.prover.verify import VerificationError

RNG = np.random.default_rng(123)
builder = CircuitBuilder()
hook = builder_ops.get_bn254_hook(builder)
hook.stark_config = DEFAULT_CONFIG
pw = Witness()
outs = []
for _ in range(2):
    x_t = FqTarget.new_unchecked(builder)
    s_v = int(RNG.integers(1, 1 << 62)) << 150 | int(RNG.integers(0, 1 << 62))
    x_v = oracle.random_fq(RNG)
    out_t = builder_ops.fq_exp(builder, s_v, x_t)
    x_t.set_witness(pw, x_v)
    outs.append((out_t, pow(x_v, s_v, params.P)))
for t in outs[0][0].value.limbs:
    builder.register_public_input(t)
mark("ops recorded")
circuit = builder.build()
mark(f"build done: {circuit.builder.num_targets:,} targets")
t0 = time.time()
values = circuit.generate_witness(pw)
mark(f"witness generated (inner STARK proven+injected): {time.time()-t0:.1f}s")
for out_t, want in outs:
    assert out_t.get_witness(values) == want
mark("outputs match pow oracle")
t0 = time.time()
data = circuit.outer_data(16)
mark(f"compile_outer: {time.time()-t0:.1f}s (2^{data.n_log} rows)")
t0 = time.time()
proof, publics = outer.prove_outer(data, values, DEFAULT_CONFIG)
mark(f"outer prove at DEFAULT_CONFIG: {time.time()-t0:.1f}s")
# steady-state prove (executables warm)
t0 = time.time()
proof, publics = outer.prove_outer(data, values, DEFAULT_CONFIG)
mark(f"outer prove (steady): {time.time()-t0:.1f}s")
t0 = time.time()
outer.verify_outer(data, proof, publics, DEFAULT_CONFIG)
mark(f"verify_all: {time.time()-t0:.1f}s — COMPOSED ARTIFACT VERIFIED")
# negative: corrupted public input
bad = list(publics)
bad[0] = (bad[0] + 1) % ((1 << 64) - (1 << 32) + 1)
try:
    outer.verify_outer(data, proof, bad, DEFAULT_CONFIG)
    mark("FAIL: corrupted public input accepted")
except VerificationError:
    mark("corrupted public input rejected")
