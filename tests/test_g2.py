"""G2 (Fq2) add witnesses + scalar-mul trace vs python oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky2_bn254_tpu.bn254 import oracle, params
from plonky2_bn254_tpu.field import goldilocks as gl
from plonky2_bn254_tpu.starks import fq2_alg, g2_add, g2_scalar_mul, limbs
from plonky2_bn254_tpu.starks.air import GLRing, ConstraintConsumer

RNG = np.random.default_rng(51)


def f2_dev(vals):
    """List of Fq2 tuples -> (c0, c1) limb tensors."""
    return (
        limbs.from_ints([v[0] for v in vals]),
        limbs.from_ints([v[1] for v in vals]),
    )


def f2_host(pair, i):
    return (
        limbs.h_limbs_to_int(np.asarray(pair[0])[i]),
        limbs.h_limbs_to_int(np.asarray(pair[1])[i]),
    )


def test_fq2_alg_matches_oracle():
    a = [(oracle.random_fq(RNG), oracle.random_fq(RNG)) for _ in range(6)]
    b = [(oracle.random_fq(RNG), oracle.random_fq(RNG)) for _ in range(6)]
    da, db = f2_dev(a), f2_dev(b)
    dm = fq2_alg.f2_mul(da, db)
    di = fq2_alg.f2_inv(da)
    for i in range(6):
        assert f2_host(dm, i) == oracle.fq2_mul(a[i], b[i])
        assert f2_host(di, i) == oracle.fq2_inv(a[i])


@pytest.mark.slow  # G2 witness kernels take minutes to compile on CPU
def test_g2_jacobian_and_add():
    pts = [oracle.random_g2(RNG) for _ in range(4)]
    X = f2_dev([p[0] for p in pts])
    Y = f2_dev([p[1] for p in pts])
    Z = (jnp.zeros_like(X[0]).at[..., 0].set(1), jnp.zeros_like(X[0]))
    X2, Y2, Z2 = fq2_alg.jac_double(X, Y, Z)
    ax, ay = fq2_alg.jac_to_affine(X2, Y2, Z2)
    for i, p in enumerate(pts):
        want = oracle.g2_add(p, p)
        assert (f2_host(ax, i), f2_host(ay, i)) == want

    # unified add witnesses: distinct + doubling pairs
    pairs = [(pts[0], pts[1]), (pts[2], pts[2])]
    pa_x = f2_dev([a[0] for a, _ in pairs])
    pa_y = f2_dev([a[1] for a, _ in pairs])
    pb_x = f2_dev([b[0] for _, b in pairs])
    pb_y = f2_dev([b[1] for _, b in pairs])
    cx, cy, aux = g2_add.generate_g2_add(pa_x, pa_y, pb_x, pb_y)
    for i, (a, b) in enumerate(pairs):
        want = oracle.g2_add(a, b)
        assert (f2_host(cx, i), f2_host(cy, i)) == want, i
        assert int(aux.is_x_eq[i]) == (1 if a[0] == b[0] else 0)

    # constraints vanish on the witness
    ring = GLRing(shape=(2,))
    consumer = ConstraintConsumer(
        ring, [ring.const(9)], ring.one(), ring.one(), ring.one()
    )
    modulus = [ring.const(m) for m in g2_add.bigint.MOD_LIMBS_INT]
    wrap = lambda arr: ring.wrap(gl.from_i64(jnp.asarray(arr, jnp.int64)))
    p32 = lambda pr: [wrap(pr[0][:, i]) for i in range(16)] + [
        wrap(pr[1][:, i]) for i in range(16)
    ]
    pt = lambda x, y: {"x": p32(x), "y": p32(y)}
    mz = lambda m: {
        "is_quot_positive": wrap(m.is_quot_positive),
        "quot_abs": [wrap(m.quot_abs[:, i]) for i in range(17)],
        "aux_lo": [wrap(m.aux_lo[:, i]) for i in range(31)],
        "aux_hi": [wrap(m.aux_hi[:, i]) for i in range(31)],
    }
    imz = lambda m: {"inv": [wrap(m.inv[:, i]) for i in range(16)], "modulus_zero_aux": mz(m.modulus_zero_aux)}
    ext = lambda e: {"c0_aux": mz(e.c0_aux), "c1_aux": mz(e.c1_aux)}
    aux_view = {
        "is_x_eq": wrap(aux.is_x_eq),
        "is_x_eq_aux": {
            "is_c0_zero": wrap(aux.is_x_eq_aux.is_c0_zero),
            "is_c1_zero": wrap(aux.is_x_eq_aux.is_c1_zero),
            "c0_aux": imz(aux.is_x_eq_aux.c0_aux),
            "c1_aux": imz(aux.is_x_eq_aux.c1_aux),
        },
        "is_x_eq_filter": wrap(aux.is_x_eq_filter),
        "lambda": [wrap(aux.lam[0][:, i]) for i in range(16)]
        + [wrap(aux.lam[1][:, i]) for i in range(16)],
        "lambda_aux": ext(aux.lambda_aux),
        "x_aux": ext(aux.x_aux),
        "y_aux": ext(aux.y_aux),
    }
    g2_add.eval_g2_add(
        consumer, ring, ring.one(), modulus,
        pt(pa_x, pa_y), pt(pb_x, pb_y), pt(cx, cy), aux_view,
    )
    acc = np.asarray(gl.from_gl(consumer.accs[0].v))
    assert (acc == 0).all(), acc


@pytest.mark.slow  # G2 trace executable takes many minutes to compile on CPU
def test_g2_scalar_mul_trace_output():
    s = int(RNG.integers(1, 1 << 63)) << 150 | int(RNG.integers(0, 1 << 63))
    x = oracle.random_g2(RNG)
    offset = oracle.random_g2(RNG)
    trace = np.asarray(
        g2_scalar_mul.generate_trace([(s, x, offset, 0)], min_rows=512)
    )
    assert trace.shape == (512, 1295)
    L = g2_scalar_mul.LAYOUT
    want = oracle.g2_add(oracle.g2_mul(x, s), offset)
    rx = L.range("sum", "x")
    ry = L.range("sum", "y")
    last = trace[511]
    got_x = (
        limbs.h_limbs_to_int(last[rx.start : rx.start + 16]),
        limbs.h_limbs_to_int(last[rx.start + 16 : rx.stop]),
    )
    got_y = (
        limbs.h_limbs_to_int(last[ry.start : ry.start + 16]),
        limbs.h_limbs_to_int(last[ry.start + 16 : ry.stop]),
    )
    assert (got_x, got_y) == want
    # layout pins (reference row_position_correctness test analog)
    assert L.col("round_flags", "is_first_round") == 5 * 64 + 708 + 256
    assert L.col("timestamp") == 5 * 64 + 708 + 256 + 5
    assert g2_scalar_mul.FREQ_COL == 1295 - 2
    assert g2_scalar_mul.RANGE_COUNTER_COL == 1295 - 1
