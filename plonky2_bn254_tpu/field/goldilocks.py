"""Vectorized Goldilocks field arithmetic (p = 2^64 - 2^32 + 1) in JAX.

TPU-native replacement for the Goldilocks arithmetic the reference pulls in
from its forked plonky2 (SURVEY.md L0; reference uses plonky2's
GoldilocksField throughout, e.g. /root/reference/src/starks/mod.rs).

Representation: canonical residues in `jnp.uint64` tensors (x64 mode).  On
TPU, u64 is emulated by XLA as u32 pairs; a full 64x64->128 multiply is
synthesized here from four 32x32->64 partial products followed by the
standard Goldilocks 128->64 reduction using 2^64 = 2^32 - 1 (mod p) and
2^96 = -1 (mod p).

Everything is elementwise and shape-polymorphic: ops broadcast like jnp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

P = 0xFFFFFFFF00000001  # Goldilocks prime, 2^64 - 2^32 + 1
EPSILON = 0xFFFFFFFF  # 2^64 - P = 2^32 - 1
MULTIPLICATIVE_GROUP_GENERATOR = 7
TWO_ADICITY = 32
# g = 7^((p-1)/2^32) mod p: generator of the maximal 2-adic subgroup.
POWER_OF_TWO_GENERATOR = pow(7, (P - 1) >> TWO_ADICITY, P)

_U64 = jnp.uint64


def _c(x: int) -> jnp.ndarray:
    """uint64 scalar constant."""
    return jnp.uint64(x)


# ---------------------------------------------------------------------------
# Host-side helpers (python ints / numpy)
# ---------------------------------------------------------------------------


def to_gl(x) -> jnp.ndarray:
    """Python ints / numpy array (any sign) -> canonical uint64 residues."""
    arr = np.asarray(x, dtype=object)
    red = np.vectorize(lambda v: int(v) % P, otypes=[object])(arr)
    return jnp.asarray(red.astype(np.uint64))


def from_gl(x) -> np.ndarray:
    """Device residues -> numpy uint64 (canonical)."""
    return np.asarray(jax.device_get(x), dtype=np.uint64)


# ---------------------------------------------------------------------------
# Core elementwise ops
# ---------------------------------------------------------------------------


def canonicalize(x):
    """Reduce values in [0, 2^64) to canonical residues in [0, p)."""
    x = jnp.asarray(x, _U64)
    return jnp.where(x >= _c(P), x - _c(P), x)


def add(a, b):
    """(a + b) mod p for canonical a, b."""
    a = jnp.asarray(a, _U64)
    b = jnp.asarray(b, _U64)
    s = a + b  # wraps mod 2^64
    over = s < a  # wrapped => subtract 2^64, so add back 2^64 - p = EPSILON
    s = s + jnp.where(over, _c(EPSILON), _c(0))
    return jnp.where(s >= _c(P), s - _c(P), s)


def sub(a, b):
    """(a - b) mod p for canonical a, b."""
    a = jnp.asarray(a, _U64)
    b = jnp.asarray(b, _U64)
    d = a - b  # wraps mod 2^64
    under = a < b  # wrapped => added 2^64, want +p instead: subtract EPSILON
    return d - jnp.where(under, _c(EPSILON), _c(0))


def neg(a):
    a = jnp.asarray(a, _U64)
    return jnp.where(a == _c(0), _c(0), _c(P) - a)


def _mul_wide(a, b):
    """Full 64x64 -> 128-bit product as (hi, lo) uint64 pair."""
    mask32 = _c(0xFFFFFFFF)
    a_lo = a & mask32
    a_hi = a >> _c(32)
    b_lo = b & mask32
    b_hi = b >> _c(32)
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    # mid = lh + hl, tracking the single possible carry into bit 64
    mid = lh + hl
    mid_carry = (mid < lh).astype(_U64)  # contributes 2^64 -> 2^32 in hi
    lo = ll + (mid << _c(32))
    lo_carry = (lo < ll).astype(_U64)
    hi = hh + (mid >> _c(32)) + (mid_carry << _c(32)) + lo_carry
    return hi, lo


def _reduce128(hi, lo):
    """Reduce hi*2^64 + lo mod p (canonical output).

    Uses 2^64 = 2^32 - 1, 2^96 = -1 (mod p):
      n = hi_hi*2^96 + hi_lo*2^64 + lo
        = lo - hi_hi + hi_lo*(2^32-1)  (mod p)
    """
    mask32 = _c(0xFFFFFFFF)
    hi_hi = hi >> _c(32)
    hi_lo = hi & mask32
    # t0 = lo - hi_hi (mod p); hi_hi < 2^32 so a single borrow adjustment
    t0 = lo - hi_hi
    borrow = lo < hi_hi
    t0 = t0 - jnp.where(borrow, _c(EPSILON), _c(0))
    # t1 = hi_lo * (2^32 - 1) < 2^64, no overflow
    t1 = hi_lo * _c(EPSILON)
    # t = t0 + t1 (mod p)
    t = t0 + t1
    over = t < t0
    t = t + jnp.where(over, _c(EPSILON), _c(0))
    return jnp.where(t >= _c(P), t - _c(P), t)


def mul(a, b):
    """(a * b) mod p for canonical a, b."""
    a = jnp.asarray(a, _U64)
    b = jnp.asarray(b, _U64)
    hi, lo = _mul_wide(a, b)
    return _reduce128(hi, lo)


def square(a):
    return mul(a, a)


def mul_const(a, c: int):
    """Multiply by a python-int constant (reduced mod p)."""
    return mul(a, _c(c % P))


def from_i64(x):
    """Map possibly-negative int64 tensor to field elements.

    Mirrors the reference's signed-limb -> Goldilocks encoding used when
    writing i64 trace columns (e.g. signed quotient limbs in
    /root/reference/src/starks/modular/modulus_zero.rs).
    """
    x = jnp.asarray(x, jnp.int64)
    negv = jnp.asarray(-x, _U64)
    posv = jnp.asarray(x, _U64)
    return jnp.where(x < 0, jnp.where(negv == _c(0), _c(0), _c(P) - negv), posv)


def exp_const(a, e: int):
    """a^e for a python-int exponent (square-and-multiply, unrolled)."""
    a = jnp.asarray(a, _U64)
    result = jnp.full_like(a, _c(1))
    base = a
    while e > 0:
        if e & 1:
            result = mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result


@jax.jit
def inv(a):
    """a^(p-2): multiplicative inverse (0 -> 0, matching the reference's
    zero-returning convention in /root/reference/src/fields/inv.rs)."""
    return exp_const(a, P - 2)


@jax.jit
def batch_inv(x):
    """Elementwise inverse via chunked Montgomery batching.

    Rows of CHUNK elements get prefix/suffix product scans; the per-row
    totals are inverted recursively (bottoming out in one vectorized
    Fermat chain).  Chunking keeps every associative_scan short — a single
    scan over tens of millions of elements OOMs the remote TPU compiler.
    Zero entries map to zero (reference Inv convention).
    """
    shape = x.shape
    flat = x.reshape(-1)
    is_zero = flat == _c(0)
    safe = jnp.where(is_zero, _c(1), flat)
    out = _batch_inv_flat(safe)
    out = jnp.where(is_zero, _c(0), out)
    return out.reshape(shape)


_BINV_CHUNK = 1024

# XLA CPU's compiler goes pathologically slow (tens of minutes) on the
# log-depth associative_scan graphs at some shapes; tests and the CPU-mesh
# dryrun flip this to a sequential lax.scan prefix product instead.  The
# VALUES are identical either way (exact integer products), so proofs are
# bit-identical across the two lowerings.
CPU_FRIENDLY_SCANS = False


def _prefix_products(mat: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix products along axis 1 of [rows, k]."""
    if CPU_FRIENDLY_SCANS:
        def step(carry, x):
            nc = mul(carry, x)
            return nc, nc

        _, incl = jax.lax.scan(step, jnp.ones_like(mat[:, 0]), mat.T)
        return jnp.moveaxis(incl, 0, 1)
    return jax.lax.associative_scan(mul, mat, axis=1)


def _batch_inv_flat(safe: jnp.ndarray) -> jnp.ndarray:
    m = safe.shape[0]
    if m <= 4 * _BINV_CHUNK:
        return inv(safe)
    k = _BINV_CHUNK
    pad = (-m) % k
    if pad:
        safe = jnp.concatenate([safe, jnp.ones(pad, _U64)])
    mat = safe.reshape(-1, k)
    incl = _prefix_products(mat)
    totals_inv = _batch_inv_flat(incl[:, -1])
    pre = jnp.concatenate([jnp.ones_like(mat[:, :1]), incl[:, :-1]], axis=1)
    incl_rev = _prefix_products(mat[:, ::-1])[:, ::-1]
    suf = jnp.concatenate([incl_rev[:, 1:], jnp.ones_like(mat[:, :1])], axis=1)
    out = mul(mul(pre, suf), totals_inv[:, None])
    return out.reshape(-1)[: m]


def batch_dot_accumulate(terms):
    """Sum of products mod p: terms is a list of (a, b) canonical pairs."""
    acc = None
    for a, b in terms:
        t = mul(a, b)
        acc = t if acc is None else add(acc, t)
    return acc


# ---------------------------------------------------------------------------
# Host-side scalar mirror (python ints) — used by oracles and the challenger
# ---------------------------------------------------------------------------


def h_add(a: int, b: int) -> int:
    return (a + b) % P


def h_sub(a: int, b: int) -> int:
    return (a - b) % P


def h_mul(a: int, b: int) -> int:
    return (a * b) % P


def h_inv(a: int) -> int:
    return pow(a, P - 2, P) if a else 0


def h_exp(a: int, e: int) -> int:
    return pow(a, e, P)


def primitive_root_of_unity(n_log: int) -> int:
    """Generator of the order-2^n_log subgroup (python int)."""
    assert 0 <= n_log <= TWO_ADICITY
    return pow(POWER_OF_TWO_GENERATOR, 1 << (TWO_ADICITY - n_log), P)


@functools.lru_cache(maxsize=None)
def two_adic_subgroup(n_log: int) -> np.ndarray:
    """All 2^n_log roots of unity, in generator-power order (numpy u64)."""
    g = primitive_root_of_unity(n_log)
    out = np.empty(1 << n_log, dtype=np.uint64)
    cur = 1
    for i in range(1 << n_log):
        out[i] = cur
        cur = (cur * g) % P
    return out
