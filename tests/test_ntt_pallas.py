"""Pallas four-step NTT kernel vs the XLA butterfly NTT (interpret mode).

The TPU kernel (field/ntt_pallas.py) must produce bit-identical
natural-order transforms; on CPU it runs through the pallas interpreter,
which exercises the exact kernel dataflow (butterfly stages, fused
four-step middle twiddle, padding) without Mosaic.
"""

import numpy as np
import jax.numpy as jnp

from plonky2_bn254_tpu.field import goldilocks as gl
from plonky2_bn254_tpu.field import ntt, ntt_pallas

RNG = np.random.default_rng(31)


def _x(w, n):
    return jnp.asarray(RNG.integers(0, gl.P, size=(w, n), dtype=np.uint64))


def test_forward_matches_xla():
    x = _x(3, 1 << 14)  # w=3 exercises the batch padding path
    got = ntt_pallas.ntt(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ntt.ntt(x)))


def test_inverse_matches_xla():
    x = _x(2, 1 << 14)
    got = ntt_pallas.intt(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ntt.intt(x)))


def test_coset_lde_rate1_matches_xla():
    x = _x(3, 1 << 13)
    got = ntt_pallas.coset_lde_rate1(x, interpret=True)
    want = ntt.coset_lde_from_coeffs(x, 1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_supports():
    assert ntt_pallas.supports((781, 1 << 16))
    assert ntt_pallas.supports((781, 1 << 17))
    assert not ntt_pallas.supports((781, 1 << 10))  # N1 < 128 lanes
    assert not ntt_pallas.supports((781, 100))  # not a power of two
    assert ntt_pallas.supports((90, 1 << 20))
    assert not ntt_pallas.supports((90, 1 << 21))  # M = 2^11 > vmem budget
