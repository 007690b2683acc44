"""Batched Goldilocks NTT / inverse NTT / coset LDE in JAX.

TPU-native replacement for the FFT inside the reference's forked plonky2
`PolynomialBatch::from_values` (SURVEY.md §3.3 HOT LOOP 2; call site
/root/reference/src/starks/common/prover.rs:31-38).

All transforms operate on the LAST axis of `[..., n]` uint64 tensors so a
whole polynomial batch (hundreds of trace columns) is transformed as one
fused program.  Stages are vectorized butterflies with twiddle tables
precomputed host-side as numpy constants; under jit they become on-device
constants, so there is no per-call host traffic.

The distributed (row-sharded, all-to-all butterflly) variant lives in
`plonky2_bn254_tpu/parallel/ntt.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl


@functools.lru_cache(maxsize=None)
def _bit_reverse_perm(n_log: int) -> np.ndarray:
    n = 1 << n_log
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(n_log):
        rev |= ((idx >> b) & 1) << (n_log - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _stage_twiddles(n_log: int, inverse: bool) -> tuple:
    """Twiddle tables for each DIT stage, as numpy uint64 arrays.

    Stage s (1-indexed) operates on blocks of m = 2^s; the table holds
    w_m^j for j in [0, m/2), where w_m is a primitive m-th root (or its
    inverse for the inverse transform).
    """
    tables = []
    for s in range(1, n_log + 1):
        m = 1 << s
        w = gl.primitive_root_of_unity(s)
        if inverse:
            w = pow(w, m - 1, gl.P)
        tw = np.empty(m // 2, dtype=np.uint64)
        cur = 1
        for j in range(m // 2):
            tw[j] = cur
            cur = (cur * w) % gl.P
        tables.append(tw)
    return tuple(tables)


@jax.jit
def ntt(x: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT along the last axis (natural order in and out).

    Evaluates the polynomial with coefficients `x[..., i]` at the points
    g^k for k in [0, n), g the canonical 2^log(n)-th root of unity.
    """
    n = x.shape[-1]
    n_log = n.bit_length() - 1
    assert n == 1 << n_log, "NTT size must be a power of two"
    if n == 1:
        return x
    x = x[..., _bit_reverse_perm(n_log)]
    tables = _stage_twiddles(n_log, inverse=False)
    for s in range(1, n_log + 1):
        m = 1 << s
        tw = jnp.asarray(tables[s - 1])  # [m//2]
        y = x.reshape(x.shape[:-1] + (n // m, 2, m // 2))
        even = y[..., 0, :]
        odd = gl.mul(y[..., 1, :], tw)
        x = jnp.concatenate([gl.add(even, odd), gl.sub(even, odd)], axis=-1)
        x = x.reshape((*y.shape[:-3], n))
    return x


@jax.jit
def intt(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT along the last axis: values -> coefficients."""
    n = x.shape[-1]
    n_log = n.bit_length() - 1
    assert n == 1 << n_log
    if n == 1:
        return x
    x = x[..., _bit_reverse_perm(n_log)]
    tables = _stage_twiddles(n_log, inverse=True)
    for s in range(1, n_log + 1):
        m = 1 << s
        tw = jnp.asarray(tables[s - 1])
        y = x.reshape(x.shape[:-1] + (n // m, 2, m // 2))
        even = y[..., 0, :]
        odd = gl.mul(y[..., 1, :], tw)
        x = jnp.concatenate([gl.add(even, odd), gl.sub(even, odd)], axis=-1)
        x = x.reshape((*y.shape[:-3], n))
    n_inv = pow(n, gl.P - 2, gl.P)
    return gl.mul(x, jnp.uint64(n_inv))


@functools.lru_cache(maxsize=None)
def _coset_powers(n: int, shift: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    cur = 1
    for i in range(n):
        out[i] = cur
        cur = (cur * shift) % gl.P
    return out


def coset_lde(values: jnp.ndarray, rate_bits: int, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> jnp.ndarray:
    """Low-degree extension: subgroup values -> values on the coset shift*H'.

    `values[..., n]` are evaluations on the order-n subgroup; output
    `[..., n << rate_bits]` are evaluations on shift * H' where |H'| =
    n << rate_bits.  Mirrors the role of `PolynomialBatch::from_values`
    (reference fork; SURVEY.md §3.3).
    """
    coeffs = intt(values)
    return coset_lde_from_coeffs(coeffs, rate_bits, shift)


@functools.partial(jax.jit, static_argnums=(1, 2))
def coset_lde_from_coeffs(coeffs: jnp.ndarray, rate_bits: int, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> jnp.ndarray:
    n = coeffs.shape[-1]
    big_n = n << rate_bits
    powers = jnp.asarray(_coset_powers(n, shift))
    shifted = gl.mul(coeffs, powers)
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, big_n - n)]
    shifted = jnp.pad(shifted, pad)
    return ntt(shifted)


# ---------------------------------------------------------------------------
# Host-side reference (numpy + python int) for tests
# ---------------------------------------------------------------------------


def h_ntt(values: np.ndarray) -> np.ndarray:
    """O(n^2)-free host NTT via recursive python (test oracle)."""

    def rec(v):
        n = len(v)
        if n == 1:
            return v
        even = rec(v[0::2])
        odd = rec(v[1::2])
        w = gl.primitive_root_of_unity(n.bit_length() - 1)
        out = [0] * n
        cur = 1
        for k in range(n // 2):
            t = (cur * odd[k]) % gl.P
            out[k] = (even[k] + t) % gl.P
            out[k + n // 2] = (even[k] - t) % gl.P
            cur = (cur * w) % gl.P
        return out

    return np.array(rec([int(v) for v in values]), dtype=np.uint64)
