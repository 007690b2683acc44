"""Device bigint kernels + modulus_zero witnesses vs python-int oracle.

Mirror of the reference's ModZeroStark micro-harness inputs (SURVEY.md §4.4):
random a*b ≡ c (mod p) instances, asserting device witnesses are bit-exact
against the host mirror of the Rust generation semantics.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky2_bn254_tpu.bn254 import oracle, params
from plonky2_bn254_tpu.starks import bigint, host_ref, limbs, modular

RNG = np.random.default_rng(7)
P = params.P


def rand_fq(n):
    return [oracle.random_fq(RNG) for _ in range(n)]


def test_carry_prop_and_mul_full():
    a_ints = rand_fq(32)
    b_ints = rand_fq(32)
    a = limbs.from_ints(a_ints)
    b = limbs.from_ints(b_ints)
    prod = bigint.mul_full(a, b)
    got = limbs.to_ints(prod)
    for g, x, y in zip(got, a_ints, b_ints):
        assert g == x * y


def test_mod_p():
    a_ints = rand_fq(16)
    b_ints = rand_fq(16)
    a = limbs.from_ints(a_ints)
    b = limbs.from_ints(b_ints)
    r = bigint.mulmod(a, b)
    got = limbs.to_ints(r)
    for g, x, y in zip(got, a_ints, b_ints):
        assert g == x * y % P
    # edge values
    edges = [0, 1, P - 1, P - 2, (1 << 256) % P]
    e = limbs.from_ints(edges)
    r2 = limbs.to_ints(bigint.mulmod(e, e))
    for g, x in zip(r2, edges):
        assert g == x * x % P


def test_inv_mod_p():
    vals = [0, 1, P - 1] + rand_fq(13)
    v = limbs.from_ints(vals)
    inv = limbs.to_ints(bigint.inv_mod_p(v))
    for g, x in zip(inv, vals):
        assert g == (pow(x, P - 2, P) if x else 0)


def _mulzero_inputs(n):
    """Random a*b - c (mod-zero) coefficient vectors, int64 [n, 31]."""
    rows = []
    for _ in range(n):
        a, b = oracle.random_fq(RNG), oracle.random_fq(RNG)
        c = a * b % P
        ai = limbs.h_int_to_columns(a, 16)
        bi = limbs.h_int_to_columns(b, 16)
        ci = limbs.h_int_to_columns(c, 16) + [0] * 15
        ab = host_ref.h_pol_mul_wide(ai, bi)
        rows.append(host_ref.h_pol_sub(ab, ci))
    return rows


def test_exact_div_p_and_generate_modulus_zero():
    rows = _mulzero_inputs(24)
    dev_in = jnp.asarray(np.array(rows, dtype=np.int64))
    aux = modular.generate_modulus_zero(dev_in)
    for i, row in enumerate(rows):
        want = host_ref.h_generate_modulus_zero(row)
        assert int(aux.is_quot_positive[i]) == want["is_quot_positive"], i
        got_quot = [int(v) for v in np.asarray(aux.quot_abs[i])]
        # sign convention: quot_abs limbs are non-negative magnitudes
        assert got_quot == [abs(v) for v in want["quot_abs"]], i
        assert [int(v) for v in np.asarray(aux.aux_lo[i])] == want["aux_lo"], i
        assert [int(v) for v in np.asarray(aux.aux_hi[i])] == want["aux_hi"], i


def test_generate_is_modulus_zero():
    # inputs: differences b.x - a.x with some equal pairs (is_zero = 1)
    rows = []
    for k in range(12):
        a, b = oracle.random_fq(RNG), oracle.random_fq(RNG)
        if k % 3 == 0:
            b = a
        ai = limbs.h_int_to_columns(a, 16)
        bi = limbs.h_int_to_columns(b, 16)
        rows.append([y - x for x, y in zip(ai, bi)])
    dev_in = jnp.asarray(np.array(rows, dtype=np.int64))
    is_zero, aux = modular.generate_is_modulus_zero(dev_in)
    for i, row in enumerate(rows):
        w_is_zero, w_aux = host_ref.h_generate_is_modulus_zero(row)
        assert int(is_zero[i]) == w_is_zero, i
        assert [int(v) for v in np.asarray(aux.inv[i])] == [
            abs(v) for v in w_aux["inv"]
        ], i
        mz = aux.modulus_zero_aux
        wz = w_aux["modulus_zero_aux"]
        assert int(mz.is_quot_positive[i]) == wz["is_quot_positive"], i
        assert [int(v) for v in np.asarray(mz.quot_abs[i])] == [
            abs(v) for v in wz["quot_abs"]
        ], i
        assert [int(v) for v in np.asarray(mz.aux_lo[i])] == wz["aux_lo"], i
        assert [int(v) for v in np.asarray(mz.aux_hi[i])] == wz["aux_hi"], i


def test_eval_modulus_zero_vanishes():
    """The generic constraint evaluation must vanish on valid witnesses and
    catch corrupted ones (GL ring over a batch)."""
    from plonky2_bn254_tpu.starks.air import GLRing, ConstraintConsumer
    from plonky2_bn254_tpu.field import goldilocks as gl

    rows = _mulzero_inputs(8)
    dev_in = jnp.asarray(np.array(rows, dtype=np.int64))
    aux = modular.generate_modulus_zero(dev_in)

    ring = GLRing(shape=(8,))
    consumer = ConstraintConsumer(
        ring, [ring.one()], ring.one(), ring.one(), ring.one()
    )
    modulus = [ring.const(m) for m in bigint.MOD_LIMBS_INT]
    to_gl = lambda arr: ring.wrap(gl.from_i64(arr))
    input_poly = [to_gl(dev_in[:, i]) for i in range(31)]
    aux_ring = {
        "is_quot_positive": to_gl(aux.is_quot_positive),
        "quot_abs": [to_gl(aux.quot_abs[:, i]) for i in range(17)],
        "aux_lo": [to_gl(aux.aux_lo[:, i]) for i in range(31)],
        "aux_hi": [to_gl(aux.aux_hi[:, i]) for i in range(31)],
    }
    modular.eval_modulus_zero(
        consumer, ring, ring.one(), modulus, input_poly, aux_ring
    )
    acc = np.asarray(gl.from_gl(consumer.accs[0].v))
    assert (acc == 0).all(), acc

    # corrupt one aux limb -> nonzero accumulator for that row
    bad_aux = dict(aux_ring)
    bad_aux["quot_abs"] = list(aux_ring["quot_abs"])
    bad_aux["quot_abs"][3] = to_gl(aux.quot_abs[:, 3] + 1)
    consumer2 = ConstraintConsumer(
        ring, [ring.const(12345)], ring.one(), ring.one(), ring.one()
    )
    modular.eval_modulus_zero(
        consumer2, ring, ring.one(), modulus, input_poly, bad_aux
    )
    acc2 = np.asarray(gl.from_gl(consumer2.accs[0].v))
    assert (acc2 != 0).all(), acc2
