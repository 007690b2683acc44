"""Host-side vectorized Goldilocks arithmetic on numpy uint64 arrays.

Numpy mirror of field/goldilocks.py's device ops (same 32-bit-split
multiply and 2^64 = 2^32 - 1 reduction), used by the circuit backend's
vectorized constraint checker where pulling JAX into tiny host loops would
dominate.  All inputs/outputs are canonical residues in uint64 arrays;
numpy uint64 arithmetic wraps mod 2^64 exactly like the device path.
"""

from __future__ import annotations

import numpy as np

P = np.uint64(0xFFFFFFFF00000001)
EPSILON = np.uint64(0xFFFFFFFF)
_MASK32 = np.uint64(0xFFFFFFFF)
_32 = np.uint64(32)
_0 = np.uint64(0)

_ERR = np.seterr  # silence overflow warnings locally in each op


def add(a, b):
    old = np.seterr(over="ignore")
    try:
        s = a + b
        s = s + np.where(s < a, EPSILON, _0)
        return np.where(s >= P, s - P, s)
    finally:
        np.seterr(**old)


def sub(a, b):
    old = np.seterr(over="ignore")
    try:
        d = a - b
        return d - np.where(a < b, EPSILON, _0)
    finally:
        np.seterr(**old)


def mul(a, b):
    old = np.seterr(over="ignore")
    try:
        a_lo = a & _MASK32
        a_hi = a >> _32
        b_lo = b & _MASK32
        b_hi = b >> _32
        ll = a_lo * b_lo
        lh = a_lo * b_hi
        hl = a_hi * b_lo
        hh = a_hi * b_hi
        mid = lh + hl
        mid_carry = (mid < lh).astype(np.uint64)
        lo = ll + (mid << _32)
        lo_carry = (lo < ll).astype(np.uint64)
        hi = hh + (mid >> _32) + (mid_carry << _32) + lo_carry
        # reduce hi*2^64 + lo mod p
        hi_hi = hi >> _32
        hi_lo = hi & _MASK32
        t0 = lo - hi_hi
        t0 = t0 - np.where(lo < hi_hi, EPSILON, _0)
        t1 = hi_lo * EPSILON
        t = t0 + t1
        t = t + np.where(t < t0, EPSILON, _0)
        return np.where(t >= P, t - P, t)
    finally:
        np.seterr(**old)
