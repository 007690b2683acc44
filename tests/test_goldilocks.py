"""Goldilocks field + extension + NTT unit tests (vs python-int oracle)."""

import numpy as np
import pytest

from plonky2_bn254_tpu.field import goldilocks as gl
from plonky2_bn254_tpu.field import ntt
from plonky2_bn254_tpu.field.extension import GLExt, Ext, W

RNG = np.random.default_rng(0)


def rand_gl(n):
    return (RNG.integers(0, 1 << 63, size=n, dtype=np.uint64) * 3 + RNG.integers(0, 7, size=n, dtype=np.uint64)) % np.uint64(gl.P)


EDGE = np.array([0, 1, 2, gl.P - 1, gl.P - 2, 0xFFFFFFFF, 0x100000000, gl.P >> 1], dtype=np.uint64)


@pytest.mark.parametrize("op,hop", [(gl.add, gl.h_add), (gl.sub, gl.h_sub), (gl.mul, gl.h_mul)])
def test_binary_ops(op, hop):
    a = np.concatenate([EDGE, rand_gl(256)])
    b = np.concatenate([EDGE[::-1], rand_gl(256)])
    got = gl.from_gl(op(a, b))
    want = np.array([hop(int(x), int(y)) for x, y in zip(a, b)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_neg_inv():
    a = np.concatenate([EDGE, rand_gl(64)])
    np.testing.assert_array_equal(
        gl.from_gl(gl.neg(a)), np.array([(-int(x)) % gl.P for x in a], dtype=np.uint64)
    )
    np.testing.assert_array_equal(
        gl.from_gl(gl.inv(a)), np.array([gl.h_inv(int(x)) for x in a], dtype=np.uint64)
    )


def test_from_i64():
    x = np.array([-1, -(2**40), 5, 0, -(2**62)], dtype=np.int64)
    got = gl.from_gl(gl.from_i64(x))
    want = np.array([int(v) % gl.P for v in x], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_exp_const():
    a = rand_gl(16)
    got = gl.from_gl(gl.exp_const(a, 12345))
    want = np.array([pow(int(x), 12345, gl.P) for x in a], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_root_of_unity():
    for n_log in [1, 4, 16, 32]:
        g = gl.primitive_root_of_unity(n_log)
        assert pow(g, 1 << n_log, gl.P) == 1
        if n_log > 0:
            assert pow(g, 1 << (n_log - 1), gl.P) == gl.P - 1


def test_ext_field():
    a = GLExt(123456789, 987654321)
    b = GLExt(gl.P - 5, 77)
    assert (a * b).c0 == (a.c0 * b.c0 + W * a.c1 * b.c1) % gl.P
    assert (a * a.inv()) == GLExt.one()
    # frobenius is the p-power map
    assert a.frobenius() == a.exp(gl.P)
    # device Ext agrees with host GLExt
    da = Ext(gl.to_gl([a.c0]), gl.to_gl([a.c1]))
    db = Ext(gl.to_gl([b.c0]), gl.to_gl([b.c1]))
    dm = da * db
    hm = a * b
    assert int(dm.c0[0]) == hm.c0 and int(dm.c1[0]) == hm.c1
    di = da.inv()
    hi = a.inv()
    assert int(di.c0[0]) == hi.c0 and int(di.c1[0]) == hi.c1


def test_ntt_roundtrip_and_oracle():
    for n_log in [1, 3, 6, 10]:
        n = 1 << n_log
        v = rand_gl(n)
        got = gl.from_gl(ntt.ntt(v))
        want = ntt.h_ntt(v)
        np.testing.assert_array_equal(got, want)
        back = gl.from_gl(ntt.intt(got))
        np.testing.assert_array_equal(back, v)


def test_ntt_batched():
    v = rand_gl(8 * 64).reshape(8, 64)
    got = gl.from_gl(ntt.ntt(v))
    for i in range(8):
        np.testing.assert_array_equal(got[i], ntt.h_ntt(v[i]))


def test_coset_lde():
    n, rate_bits = 32, 2
    v = rand_gl(n)
    lde = gl.from_gl(ntt.coset_lde(v, rate_bits))
    # oracle: interpolate coefficients on host, evaluate on shifted big domain
    coeffs = [int(c) for c in gl.from_gl(ntt.intt(v))]
    g_big = gl.primitive_root_of_unity(n.bit_length() - 1 + rate_bits)
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    for k in range(0, n << rate_bits, 37):
        x = (shift * pow(g_big, k, gl.P)) % gl.P
        want = 0
        for c in reversed(coeffs):
            want = (want * x + c) % gl.P
        assert int(lde[k]) == want
    # LDE restricted to the even-indexed points of the shifted subgroup
    # contains the shifted original evaluations only if shift matches; check
    # degree: iNTT of LDE has zero high coefficients.
    big_coeffs = gl.from_gl(ntt.intt(gl.to_gl(lde)))
    # account for coset shift: c_i * shift^i structure — instead just check
    # the first n coefficients reconstruct v via forward NTT after unshift
    unshifted = [
        (int(big_coeffs[i]) * pow(gl.h_inv(shift), i, gl.P)) % gl.P
        for i in range(n << rate_bits)
    ]
    assert all(c == 0 for c in unshifted[n:])
