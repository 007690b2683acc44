"""FqExp trace generation: device batch vs python-int row-by-row mirror."""

import numpy as np
import pytest

from plonky2_bn254_tpu.bn254 import oracle, params
from plonky2_bn254_tpu.field import goldilocks as gl
from plonky2_bn254_tpu.starks import fq_exp, host_ref, limbs, round_flags

P = params.P
RNG = np.random.default_rng(3)


def host_generate_one_set(s, x, timestamp):
    """Python mirror of FqExpStark::generate_one_set (exp_stark.rs:89-195)."""
    rows = []
    bits = limbs.h_bits_le(s, 256)
    flags = round_flags.flag_tables(fq_exp.FQ_PERIOD)

    def aux_vals(aux):
        return (
            [aux["is_quot_positive"]]
            + [abs(v) for v in aux["quot_abs"]]
            + aux["aux_lo"]
            + aux["aux_hi"]
        )

    def mk_row(square, product, a, b, c, aux, bits_cur, ridx, is_mul, is_sq_nl):
        return (
            limbs.h_int_to_limbs(square, 16)
            + limbs.h_int_to_limbs(product, 16)
            + limbs.h_int_to_limbs(a, 16)
            + limbs.h_int_to_limbs(b, 16)
            + limbs.h_int_to_limbs(c, 16)
            + aux_vals(aux)
            + list(bits_cur)
            + [int(v) for v in flags[ridx]]
            + [timestamp, is_mul, is_sq_nl, 1, 0, 0]
        )

    # first row
    square = x
    a, b = 1, x
    c, aux = host_ref.h_generate_fq_mul(a, b)
    product = c if bits[0] else a
    rows.append(mk_row(square, product, a, b, c, aux, bits, 0, 1, 0))
    state = dict(square=square, product=product, a=a, b=b, c=c, bits=bits,
                 is_mul=1, is_sq_not_last=0)
    for ridx in range(1, fq_exp.FQ_PERIOD):
        if state["is_sq_not_last"]:
            a = state["product"]
            b = state["square"]
            c, aux = host_ref.h_generate_fq_mul(a, b)
            bits_cur = state["bits"][1:] + state["bits"][:1]
            product = c if bits_cur[0] else a
            state = dict(square=state["square"], product=product, a=a, b=b,
                         c=c, bits=bits_cur, is_mul=1, is_sq_not_last=0)
            rows.append(mk_row(state["square"], product, a, b, c, aux,
                               bits_cur, ridx, 1, 0))
        elif state["is_mul"]:
            a = b = state["square"]
            c, aux = host_ref.h_generate_fq_mul(a, a)
            is_nl = 0 if ridx == fq_exp.FQ_PERIOD - 1 else 1
            state = dict(square=c, product=state["product"], a=a, b=a, c=c,
                         bits=state["bits"], is_mul=0, is_sq_not_last=is_nl)
            rows.append(mk_row(c, state["product"], a, a, c, aux,
                               state["bits"], ridx, 0, is_nl))
    assert state["product"] == pow(x, s, P)
    return rows


def test_trace_matches_host_mirror():
    inputs = [
        (int(RNG.integers(0, 1 << 63)) << 193 | int(RNG.integers(0, 1 << 63)),
         oracle.random_fq(RNG), t)
        for t in range(2)
    ]
    trace = np.asarray(fq_exp.generate_trace(inputs, min_rows=2048))
    assert trace.shape == (2048, 427)
    for op, (s, x, t) in enumerate(inputs):
        want = host_generate_one_set(s, x, t)
        got = trace[op * 512 : (op + 1) * 512]
        ncmp = fq_exp.FREQ_COL  # range-check cols filled globally; checked below
        for r in range(512):
            wrow = np.array(want[r], dtype=np.uint64)
            np.testing.assert_array_equal(
                got[r][:ncmp], wrow[:ncmp], err_msg=f"op {op} row {r}"
            )
    # padding rows zero except range-check columns
    assert (trace[2047, :fq_exp.FREQ_COL] == 0).all()
    # range counter increments then saturates (here num_rows < 2^16: capped
    # by row index, monotone)
    assert trace[2047, fq_exp.RANGE_COUNTER_COL] == 2047
    # frequency column counts every range-checked value
    vals = trace[:, fq_exp.RANGE_CHECK_COLS.start : fq_exp.RANGE_CHECK_COLS.stop]
    hist = np.bincount(vals.astype(np.int64).reshape(-1), minlength=2048)
    np.testing.assert_array_equal(trace[:, fq_exp.FREQ_COL], hist[:2048])
