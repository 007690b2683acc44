"""G1 add witnesses + scalar-mul trace vs python oracle; constraint check."""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky2_bn254_tpu.bn254 import oracle, params
from plonky2_bn254_tpu.field import goldilocks as gl
from plonky2_bn254_tpu.starks import g1_add, g1_scalar_mul, jacobian, limbs
from plonky2_bn254_tpu.starks.air import GLRing, ConstraintConsumer

P = params.P
RNG = np.random.default_rng(31)


def test_jacobian_chain_matches_oracle():
    pts = [oracle.random_g1(RNG) for _ in range(4)]
    X = limbs.from_ints([p[0] for p in pts])
    Y = limbs.from_ints([p[1] for p in pts])
    Z = jnp.zeros_like(X).at[..., 0].set(1)
    X2, Y2, Z2 = jacobian.double(X, Y, Z)
    ax, ay = jacobian.to_affine(X2, Y2, Z2)
    for i, p in enumerate(pts):
        want = oracle.g1_add(p, p)
        assert limbs.to_ints(ax)[i] == want[0]
        assert limbs.to_ints(ay)[i] == want[1]
    # mixed add
    q = oracle.random_g1(RNG)
    qx = limbs.from_ints([q[0]] * 4)
    qy = limbs.from_ints([q[1]] * 4)
    X3, Y3, Z3 = jacobian.mixed_add(X2, Y2, Z2, qx, qy)
    bx, by = jacobian.to_affine(X3, Y3, Z3)
    for i, p in enumerate(pts):
        want = oracle.g1_add(oracle.g1_add(p, p), q)
        assert limbs.to_ints(bx)[i] == want[0]
        assert limbs.to_ints(by)[i] == want[1]


def test_generate_g1_add_matches_oracle_and_constraints():
    # mix of distinct-add and doubling pairs (reference g1_add_stark pattern)
    pairs = []
    for i in range(8):
        a = oracle.random_g1(RNG)
        b = a if i % 2 else oracle.random_g1(RNG)
        pairs.append((a, b))
    ax = limbs.from_ints([a[0] for a, _ in pairs])
    ay = limbs.from_ints([a[1] for a, _ in pairs])
    bx = limbs.from_ints([b[0] for _, b in pairs])
    by = limbs.from_ints([b[1] for _, b in pairs])
    cx, cy, aux = g1_add.generate_g1_add(ax, ay, bx, by)
    for i, (a, b) in enumerate(pairs):
        want = oracle.g1_add(a, b)
        assert limbs.to_ints(cx)[i] == want[0], i
        assert limbs.to_ints(cy)[i] == want[1], i
        assert int(aux.is_x_eq[i]) == (1 if a[0] == b[0] else 0)

    # constraints vanish on the witness (GL ring batch)
    ring = GLRing(shape=(8,))
    consumer = ConstraintConsumer(
        ring, [ring.const(7)], ring.one(), ring.one(), ring.one()
    )
    modulus = [ring.const(m) for m in g1_add.bigint.MOD_LIMBS_INT]
    wrap = lambda arr: ring.wrap(gl.from_i64(jnp.asarray(arr, jnp.int64)))
    pt = lambda x, y: {
        "x": [wrap(x[:, i]) for i in range(16)],
        "y": [wrap(y[:, i]) for i in range(16)],
    }
    mz = lambda m: {
        "is_quot_positive": wrap(m.is_quot_positive),
        "quot_abs": [wrap(m.quot_abs[:, i]) for i in range(17)],
        "aux_lo": [wrap(m.aux_lo[:, i]) for i in range(31)],
        "aux_hi": [wrap(m.aux_hi[:, i]) for i in range(31)],
    }
    aux_view = {
        "is_x_eq": wrap(aux.is_x_eq),
        "is_x_eq_aux": {
            "inv": [wrap(aux.is_x_eq_aux.inv[:, i]) for i in range(16)],
            "modulus_zero_aux": mz(aux.is_x_eq_aux.modulus_zero_aux),
        },
        "is_x_eq_filter": wrap(aux.is_x_eq_filter),
        "lambda": [wrap(aux.lam[:, i]) for i in range(16)],
        "lambda_aux": mz(aux.lambda_aux),
        "x_aux": mz(aux.x_aux),
        "y_aux": mz(aux.y_aux),
    }
    g1_add.eval_g1_add(
        consumer, ring, ring.one(), modulus, pt(ax, ay), pt(bx, by), pt(cx, cy), aux_view
    )
    acc = np.asarray(gl.from_gl(consumer.accs[0].v))
    assert (acc == 0).all(), acc


def host_scalar_mul_rows(s, x, offset):
    """Expected (a, b, c, double, sum) per row via the python oracle."""
    bits = limbs.h_bits_le(s, 256)
    rows = []
    d = x
    p = offset
    for k in range(256):
        a, b = p, d
        c = oracle.g1_add(a, b)
        p_next = c if bits[k] else p
        rows.append(("add", a, b, c, d, p_next))
        d_next = oracle.g1_add(d, d)
        rows.append(("dbl", d, d, d_next, d_next, p_next))
        d, p = d_next, p_next
    return rows


def test_g1_scalar_mul_trace_matches_oracle():
    inputs = []
    for t in range(2):
        s = int(RNG.integers(1, 1 << 63)) << 180 | int(RNG.integers(0, 1 << 63))
        inputs.append((s, oracle.random_g1(RNG), oracle.random_g1(RNG), t))
    trace = np.asarray(g1_scalar_mul.generate_trace(inputs, min_rows=2048))
    assert trace.shape == (2048, 781)
    L = g1_scalar_mul.LAYOUT
    for op, (s, x, offset, t) in enumerate(inputs):
        want_rows = host_scalar_mul_rows(s, x, offset)
        got = trace[op * 512 : (op + 1) * 512]
        for r in range(512):
            _, a, b, c, dbl, summ = want_rows[r]
            for name, val in [("a", a), ("b", b), ("c", c), ("double", dbl), ("sum", summ)]:
                rx = L.range(name, "x")
                ry = L.range(name, "y")
                got_x = limbs.h_limbs_to_int(got[r][rx.start : rx.stop])
                got_y = limbs.h_limbs_to_int(got[r][ry.start : ry.stop])
                assert (got_x, got_y) == val, (op, r, name)
        # final sum == s*x + offset
        want_out = oracle.g1_add(oracle.g1_mul(x, s), offset)
        rx = L.range("sum", "x")
        last = got[511]
        assert limbs.h_limbs_to_int(last[rx.start : rx.stop]) == want_out[0]
