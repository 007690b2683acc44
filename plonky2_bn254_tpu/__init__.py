"""plonky2_bn254_tpu — a TPU-native BN254-in-STARK proving framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
InternetMaximalism/plonky2_bn254 (reference mounted read-only at
/root/reference): BN254 elliptic-curve operations proven inside STARKs over
the Goldilocks field, with cross-table lookups binding batched scalar-mul /
field-exponentiation traces to circuit wire values.

Design stance (TPU-first, not a port):
  * all hot numerics (trace fill, NTT/LDE, Poseidon Merkle, constraint
    evaluation, FRI) are batched jitted JAX programs on device;
  * rows/ops are sharded over a `jax.sharding.Mesh` for multi-chip scaling;
  * column layouts are declarative specs over `[rows, width]` tensors
    (replacing the reference's `#[repr(C)]` unsafe row views);
  * AIR constraints are written once against a small algebra protocol and
    evaluated vectorized on the LDE domain (prover), on extension-field
    scalars (verifier), and later on circuit targets (recursive verifier).
"""

import jax as _jax

# Goldilocks arithmetic needs 64-bit integers; this must run before any jax
# numpy op in the package.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
