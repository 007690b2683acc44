"""U256 limb representation: 16 limbs x 16 bits (STARK side).

Mirrors the reference's `U256` type and limb constants
(/root/reference/src/starks/mod.rs:13-69) and the column<->bigint helpers
(/root/reference/src/starks/modular/utils.rs:6-49).

Device representation: int64 tensors with a trailing limb axis, values in
[0, 2^16) (unsigned limbs) or small signed ranges (polynomial coefficients).
int64 is exact for every intermediate this codebase produces (products of
16-bit limbs summed over <= 49 terms < 2^42).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

N_LIMBS = 16
LIMB_BITS = 16
N_BITS = 256
LIMB_MASK = (1 << LIMB_BITS) - 1


# ---------------------------------------------------------------------------
# Host converters (python ints)
# ---------------------------------------------------------------------------


def h_int_to_limbs(x: int, n: int = N_LIMBS) -> list:
    """Non-negative int -> n little-endian 16-bit limbs."""
    assert x >= 0 and x < 1 << (LIMB_BITS * n)
    return [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)]


def h_limbs_to_int(limbs) -> int:
    """Little-endian limbs (any sign) -> int (columns_to_bigint semantics)."""
    return sum(int(c) << (LIMB_BITS * i) for i, c in enumerate(limbs))


def h_int_to_columns(x: int, n: int) -> list:
    """Signed int -> signed limb columns (bigint_to_columns semantics:
    limbs of |x| with the sign applied to every limb)."""
    sign = -1 if x < 0 else 1
    return [sign * l for l in h_int_to_limbs(abs(x), n)]


def h_bits_le(x: int, n: int = N_BITS) -> list:
    return [(x >> i) & 1 for i in range(n)]


# ---------------------------------------------------------------------------
# Device converters
# ---------------------------------------------------------------------------


def from_ints(values, n: int = N_LIMBS) -> jnp.ndarray:
    """List of python ints -> [len, n] int64 limb tensor."""
    arr = np.zeros((len(values), n), dtype=np.int64)
    for i, v in enumerate(values):
        arr[i] = h_int_to_limbs(int(v), n)
    return jnp.asarray(arr)


def to_ints(limbs) -> list:
    """[batch, n] device limbs -> python ints."""
    arr = np.asarray(limbs)
    return [h_limbs_to_int(row) for row in arr]


def bits_from_ints(values, n: int = N_BITS) -> jnp.ndarray:
    arr = np.zeros((len(values), n), dtype=np.int64)
    for i, v in enumerate(values):
        arr[i] = h_bits_le(int(v), n)
    return jnp.asarray(arr)
