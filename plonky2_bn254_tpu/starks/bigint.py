"""Vectorized 256-bit modular arithmetic over BN254 p, on 16-bit limbs.

TPU-native replacement for the arkworks bigint/field calls inside the
reference's trace generators (the `ark` calls in
/root/reference/src/starks/fields/mul.rs:22-40, curves/g1/add.rs:52-122 and
the BigInt division in modular/modulus_zero.rs:84-91).  Everything here is
batched: inputs are `[..., n_limbs]` int64 tensors and all per-element loops
are unrolled static limb loops (XLA fuses them into flat vector code).

Key algorithms, chosen for TPU (no division hardware, wide vectors):

  * `mod_p`: Barrett reduction with mu = floor(2^512 / p); for n < 2^512
    the estimate floor(n*mu / 2^512) is within 1 of floor(n/p), so a
    single conditional subtract pass suffices.
  * `exact_div_p`: Hensel-style EXACT division for multiples of p:
    q mod 2^288 = (n mod 2^288) * (p^-1 mod 2^288), interpreted as a
    288-bit two's-complement signed value.  Replaces the reference's
    BigInt `/` in generate_modulus_zero (quotients there are < 2^233).
  * `inv_mod_p`: Fermat exponentiation via lax.scan over the 254 constant
    bits of p-2 (used via `batch_inverse` on whole trace batches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..bn254.params import P as BN254_P
from .limbs import LIMB_BITS, LIMB_MASK, N_LIMBS, h_int_to_limbs
from .pol import pol_mul_wide

# ---------------------------------------------------------------------------
# Constants (little-endian 16-bit limb tables, as numpy -> jit constants)
# ---------------------------------------------------------------------------

MOD_LIMBS_INT = h_int_to_limbs(BN254_P, N_LIMBS)  # [16]
_MU_INT = (1 << 512) // BN254_P  # 259 bits -> 17 limbs
MU_LIMBS_INT = h_int_to_limbs(_MU_INT, 17)
_PINV_288 = pow(BN254_P, -1, 1 << 288)  # p^-1 mod 2^288 -> 18 limbs
PINV_LIMBS_INT = h_int_to_limbs(_PINV_288, 18)

_P_BITS = [(BN254_P - 2) >> i & 1 for i in range(254)]  # LSB-first bits of p-2


def _const_row(limbs_int) -> jnp.ndarray:
    return jnp.asarray(np.array(limbs_int, dtype=np.int64))


@functools.partial(jax.jit, static_argnums=(1,), static_argnames=("unroll",))
def carry_prop(coeffs: jnp.ndarray, n_out: int, unroll: bool = False) -> jnp.ndarray:
    """Signed coefficient vector -> canonical limbs in [0, 2^16).

    Propagates carries left-to-right for `n_out` limbs; input may be
    shorter (treated as zero-extended).  The final carry is dropped — the
    caller guarantees the value fits (or only the low `n_out` limbs are
    wanted, i.e. reduction mod 2^(16*n_out)).

    Implemented as a lax.scan over the limb axis: the carry chain is
    inherently sequential, and the scan keeps the jit graph tiny (this
    function is instantiated hundreds of times inside the trace-gen scans).

    `unroll=True` flattens the carry chain into straight-line code: inside
    the 256-step sequential chain scans (jacobian.py) the nested scan's
    per-iteration overhead dominates trace generation (~550k inner loop
    iterations per G1 batch, measured ~1s of a 3.8s proof), so the chain
    bodies trade graph size for zero inner-loop overhead.
    """
    n_in = coeffs.shape[-1]
    if n_in < n_out:
        coeffs = jnp.pad(coeffs, [(0, 0)] * (coeffs.ndim - 1) + [(0, n_out - n_in)])
    else:
        coeffs = coeffs[..., :n_out]
    x = jnp.moveaxis(coeffs, -1, 0)  # [n_out, ...]

    def step(carry, c):
        t = c + carry
        limb = t & LIMB_MASK
        return (t - limb) >> LIMB_BITS, limb

    _, limbs = jax.lax.scan(step, jnp.zeros_like(x[0]), x, unroll=unroll)
    return jnp.moveaxis(limbs, 0, -1)


def _shift_add(terms, widths, n_out):
    """Sum of `terms[i]` (width widths[i]) shifted left by i limbs, as
    pad+add (slices/concats) — scatter-free: `.at[].add` lowers to XLA
    scatter, which is both slow on TPU and bloats the compiled executable
    (these products sit inside every mulmod of the 256-step chain scans)."""
    out = None
    for i, (t, w) in enumerate(zip(terms, widths)):
        padded = jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(i, n_out - w - i)])
        out = padded if out is None else out + padded
    return out


def _pol_mul_arrays(a: jnp.ndarray, b_const: list) -> jnp.ndarray:
    """[..., na] limb tensor times a constant limb list -> [..., na+nb-1]."""
    na = a.shape[-1]
    nb = len(b_const)
    terms, widths, offs = [], [], []
    for j, bj in enumerate(b_const):
        if bj == 0:
            continue
        terms.append(a * jnp.int64(bj))
        widths.append(na)
        offs.append(j)
    n_out = na + nb - 1
    out = None
    for t, w, j in zip(terms, widths, offs):
        padded = jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(j, n_out - w - j)])
        out = padded if out is None else out + padded
    if out is None:
        out = jnp.zeros(a.shape[:-1] + (n_out,), jnp.int64)
    return out


def _pol_mul_aa(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[..., na] x [..., nb] -> [..., na+nb-1] coefficient product."""
    na, nb = a.shape[-1], b.shape[-1]
    terms = [a[..., i : i + 1] * b for i in range(na)]
    bshape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    terms = [jnp.broadcast_to(t, bshape + (nb,)) for t in terms]
    return _shift_add(terms, [nb] * na, na + nb - 1)


@functools.partial(jax.jit, static_argnames=("unroll",))
def mul_full(a: jnp.ndarray, b: jnp.ndarray, unroll: bool = False) -> jnp.ndarray:
    """[..., 16] x [..., 16] canonical limbs -> [..., 32] canonical limbs."""
    return carry_prop(_pol_mul_aa(a, b), 2 * N_LIMBS, unroll=unroll)


def compare_ge(a: jnp.ndarray, b_const: list) -> jnp.ndarray:
    """a >= const, lexicographic from the top limb. Returns bool [...]."""
    n = a.shape[-1]
    b = jnp.asarray(
        np.array([int(b_const[i]) if i < len(b_const) else 0 for i in range(n)],
                 dtype=np.int64)
    )
    diff = a - b  # per-limb signed comparison
    rev = diff[..., ::-1]  # MSB first
    nz = rev != 0
    first = jnp.argmax(nz, axis=-1)  # index of most significant difference
    val = jnp.take_along_axis(rev, first[..., None], axis=-1)[..., 0]
    any_nz = jnp.any(nz, axis=-1)
    return jnp.where(any_nz, val > 0, True)


def sub_const_if(a: jnp.ndarray, b_const: list, cond: jnp.ndarray,
                 unroll: bool = False) -> jnp.ndarray:
    """a - const where cond else a; canonical limbs in/out (no underflow)."""
    coeffs = a - jnp.where(
        cond[..., None], _const_row(b_const + [0] * (a.shape[-1] - len(b_const))), 0
    )
    return carry_prop(coeffs, a.shape[-1], unroll=unroll)


@functools.partial(jax.jit, static_argnames=("unroll",))
def mod_p(n: jnp.ndarray, unroll: bool = False) -> jnp.ndarray:
    """[..., <=32] canonical limbs (value < 2^512) -> value mod p, 16 limbs."""
    n32 = carry_prop(n, 32, unroll=unroll) if n.shape[-1] < 32 else n
    # q_hat = floor(n * mu / 2^512): top 17 limbs of the 49-limb product
    prod = carry_prop(_pol_mul_arrays(n32, MU_LIMBS_INT), 49, unroll=unroll)
    q_hat = prod[..., 32:49]
    # r = n - q_hat * p  (fits well under 2^272; compute mod 2^288 = 18 limbs)
    qp = _pol_mul_arrays(q_hat, MOD_LIMBS_INT)  # [..., 32] coeffs
    r = carry_prop(n32[..., :18] - qp[..., :18], 18, unroll=unroll)
    # 0 <= r < 2p + p (one safety margin): subtract p up to twice
    for _ in range(2):
        ge = compare_ge(r, MOD_LIMBS_INT)
        r = sub_const_if(r, MOD_LIMBS_INT, ge, unroll=unroll)
    return r[..., :N_LIMBS]


@functools.partial(jax.jit, static_argnames=("unroll",))
def mulmod(a: jnp.ndarray, b: jnp.ndarray, unroll: bool = False) -> jnp.ndarray:
    """(a * b) mod p on [..., 16] canonical limb tensors."""
    return mod_p(mul_full(a, b, unroll=unroll), unroll=unroll)


@functools.partial(jax.jit, static_argnames=("unroll",))
def addmod(a: jnp.ndarray, b: jnp.ndarray, unroll: bool = False) -> jnp.ndarray:
    """(a + b) mod p on canonical limb tensors."""
    return mod_p(carry_prop(a + b, 32, unroll=unroll), unroll=unroll)


@functools.partial(jax.jit, static_argnames=("unroll",))
def submod(a: jnp.ndarray, b: jnp.ndarray, unroll: bool = False) -> jnp.ndarray:
    """(a - b) mod p on canonical limb tensors."""
    p_row = _const_row(MOD_LIMBS_INT)
    return mod_p(carry_prop(a - b + p_row, 32, unroll=unroll), unroll=unroll)


@jax.jit
def exact_div_p(input_coeffs: jnp.ndarray):
    """Exact signed division by p of a 31-coefficient polynomial value.

    `input_coeffs[..., 31]` are signed int64 coefficients (|c| < 2^40) of a
    value n = sum c_i 2^(16 i) that is an exact multiple of p.  Returns
    (is_quot_positive [...], quot_abs [..., 17]) exactly as the reference's
    generate_modulus_zero derives them (modulus_zero.rs:84-91).
    """
    # n mod 2^288: two's-complement limbs (carry-propagate 18 limbs)
    n_lo = carry_prop(input_coeffs, 18)
    # q mod 2^288 = n_lo * pinv mod 2^288
    prod = _pol_mul_arrays(n_lo, PINV_LIMBS_INT)
    q = carry_prop(prod[..., :18], 18)
    # sign: |q| < 2^287, so bit 15 of limb 17 is the sign bit
    is_neg = (q[..., 17] >> (LIMB_BITS - 1)) & 1
    # |q|: two's-complement negate when negative
    q_flipped = jnp.where(is_neg[..., None] == 1, LIMB_MASK - q, q)
    q_abs = carry_prop(
        q_flipped.at[..., 0].add(jnp.where(is_neg == 1, 1, 0)), 18
    )
    q_abs = jnp.where(is_neg[..., None] == 1, q_abs, q)
    is_zero = jnp.all(q_abs == 0, axis=-1)
    is_quot_positive = jnp.where((is_neg == 0) & ~is_zero, 1, 0).astype(jnp.int64)
    return is_quot_positive, q_abs[..., :17]


@functools.partial(jax.jit, static_argnames=("unroll",))
def inv_mod_p(a: jnp.ndarray, unroll: bool = False) -> jnp.ndarray:
    """Fermat inverse a^(p-2) mod p on [..., 16] limbs (0 -> 0).

    lax.scan over the 254 constant exponent bits: one squaring plus one
    conditional multiply per step, batched over all leading axes.
    `unroll` flattens the limb carries inside each step (see carry_prop).
    """
    bits = jnp.asarray(np.array(_P_BITS, dtype=np.int64))
    one = jnp.zeros_like(a).at[..., 0].set(1)

    def step(carry, bit):
        result, base = carry
        mul = mulmod(result, base, unroll=unroll)
        result = jnp.where(bit == 1, mul, result)
        base = mulmod(base, base, unroll=unroll)
        return (result, base), None

    (result, _), _ = jax.lax.scan(step, (one, a), bits)
    # zero-input convention: a == 0 -> 0
    a_is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
    return jnp.where(a_is_zero, 0, result)


@functools.partial(jax.jit, static_argnames=("unroll",))
def batch_inv_mod_p(a: jnp.ndarray, unroll: bool = False) -> jnp.ndarray:
    """Montgomery-batched modular inverse over all leading axes.

    One Fermat chain for the whole batch plus O(n) multiplications in
    log-depth prefix/suffix scans — replaces per-element 254-step Fermat
    in the trace generators (0 -> 0 convention preserved).
    """
    shape = a.shape
    flat = a.reshape(-1, N_LIMBS)
    is_zero = jnp.all(flat == 0, axis=-1, keepdims=True)
    one = jnp.zeros_like(flat).at[..., 0].set(1)
    safe = jnp.where(is_zero, one, flat)
    # chunked scans (a single giant scan OOMs the remote TPU compiler)
    m = safe.shape[0]
    k = 256
    pad = (-m) % k
    if pad:
        safe_p = jnp.concatenate([safe, jnp.tile(one[:1], (pad, 1))], axis=0)
    else:
        safe_p = safe
    mat = safe_p.reshape(-1, k, N_LIMBS)
    mm = lambda x, y: mulmod(x, y, unroll=unroll)
    incl = jax.lax.associative_scan(mm, mat, axis=1)
    totals = incl[:, -1]
    # per-row totals inverted with one vectorized Fermat chain
    totals_inv = inv_mod_p(totals, unroll=unroll)
    one_row = jnp.tile(one[:1][None], (mat.shape[0], 1, 1))
    pre = jnp.concatenate([one_row, incl[:, :-1]], axis=1)
    incl_rev = jax.lax.associative_scan(mm, mat[:, ::-1], axis=1)[:, ::-1]
    suf = jnp.concatenate([incl_rev[:, 1:], one_row], axis=1)
    out = mulmod(mulmod(pre, suf, unroll=unroll), totals_inv[:, None], unroll=unroll)
    out = out.reshape(-1, N_LIMBS)[:m]
    out = jnp.where(is_zero, 0, out)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Host helpers for tests
# ---------------------------------------------------------------------------


def h_mod_p(x: int) -> int:
    return x % BN254_P
