"""fq_mul row semantics: a * b ≡ c (mod p) via mul_wide + modulus_zero.

Rebuild of /root/reference/src/starks/fields/mul.rs:22-76 — generation is
batched on device; evaluation is ring-generic (one definition for prover
and verifier).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import bigint, modular, pol
from .limbs import N_LIMBS


def generate_fq_mul(a: jnp.ndarray, b: jnp.ndarray):
    """Batched: [..., 16] x [..., 16] -> (c [..., 16], ModulusZeroAux)."""
    c = bigint.mulmod(a, b)
    ab = bigint._pol_mul_aa(a, b)  # [..., 31] coefficients
    diff = ab.at[..., :N_LIMBS].add(-c)
    aux = modular.generate_modulus_zero(diff)
    return c, aux


def eval_fq_mul(consumer, ring, filt, modulus, a, b, c, aux):
    """Ring-generic mirror of eval_fq_mul (mul.rs:43-57)."""
    ab = pol.pol_mul_wide(a, b)  # 31 values
    diff = [ab[i] - c[i] if i < N_LIMBS else ab[i] for i in range(2 * N_LIMBS - 1)]
    modular.eval_modulus_zero(consumer, ring, filt, modulus, diff, aux)
