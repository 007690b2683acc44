"""Circuit gadget layer tests (reference test categories 1, 2, 6 —
SURVEY.md §4): gadget equivalence vs oracle, predicate truth tables, and
the builder/hook end-to-end flow (fake backend for speed)."""

import numpy as np
import pytest

from plonky2_bn254_tpu.bn254 import oracle, params
from plonky2_bn254_tpu import circuit as ckt
from plonky2_bn254_tpu.circuit import builder_ops, hash_to_g2 as h2g

P = params.P
RNG = np.random.default_rng(71)


def run_circuit(builder, pw):
    c = builder.build()
    values = c.generate_witness(pw)
    c.check(values)
    return values


def test_biguint_ops():
    b = ckt.CircuitBuilder()
    x = ckt.add_virtual_biguint_target(b, 8)
    y = ckt.add_virtual_biguint_target(b, 8)
    s = ckt.add_biguint(b, x, y)
    d = ckt.sub_biguint(b, x, y)  # requires x >= y
    m = ckt.mul_biguint(b, x, y)
    le = ckt.cmp_biguint(b, x, y)
    q, r = ckt.div_rem_biguint(b, x, P)
    pw = ckt.Witness()
    xv = int(RNG.integers(0, 1 << 63)) << 190 | 12345
    yv = int(RNG.integers(0, 1 << 60)) << 150 | 7
    xv, yv = max(xv, yv), min(xv, yv)
    x.set_witness(pw, xv)
    y.set_witness(pw, yv)
    values = run_circuit(b, pw)
    assert s.get_witness(values) == xv + yv
    assert d.get_witness(values) == xv - yv
    assert m.get_witness(values) == xv * yv
    assert values[le.index] == (1 if xv <= yv else 0)
    assert q.get_witness(values) == xv // P
    assert r.get_witness(values) == xv % P


def test_fq_ops_and_predicates():
    b = ckt.CircuitBuilder()
    x = ckt.FqTarget.new_unchecked(b)
    y = ckt.FqTarget.new_unchecked(b)
    add = x.add(b, y).take_mod(b)
    sub = x.sub(b, y).take_mod(b)
    mul = x.mul(b, y).take_mod(b)
    inv = x.inv(b)
    sgn = x.sgn(b)
    iz = x.is_zero(b)
    ie = x.is_equal(b, y)
    pw = ckt.Witness()
    xv, yv = oracle.random_fq(RNG), oracle.random_fq(RNG)
    x.set_witness(pw, xv)
    y.set_witness(pw, yv)
    values = run_circuit(b, pw)
    assert add.get_witness(values) == (xv + yv) % P
    assert sub.get_witness(values) == (xv - yv) % P
    assert mul.get_witness(values) == xv * yv % P
    assert inv.get_witness(values) == oracle.fq_inv(xv)
    assert values[sgn.index] == (xv & 1)
    assert values[iz.index] == 0
    assert values[ie.index] == 0


def test_fq_is_valid_truth_table():
    """p-1 valid; p, p+1 invalid (fq.rs:527-548)."""
    for raw, expected in [(P - 1, 1), (P, 0), (P + 1, 0)]:
        b = ckt.CircuitBuilder()
        x = ckt.FqTarget.new_unchecked(b)
        valid = x.is_valid(b)
        pw = ckt.Witness()
        x.value.set_witness(pw, raw)  # bypass mod-p reduction
        values = run_circuit(b, pw)
        assert values[valid.index] == expected, raw


def test_fq2_and_sqrt():
    b = ckt.CircuitBuilder()
    x = ckt.Fq2Target.new_unchecked(b)
    y = ckt.Fq2Target.new_unchecked(b)
    mul = x.mul(b, y).take_mod(b)
    inv = x.inv(b)
    # square then sqrt_with_sgn roundtrip
    sq = x.mul(b, x).take_mod(b)
    sgn = x.sgn(b)
    back = sq.sqrt_with_sgn(b, sgn)
    pw = ckt.Witness()
    xv = (oracle.random_fq(RNG), oracle.random_fq(RNG))
    yv = (oracle.random_fq(RNG), oracle.random_fq(RNG))
    x.set_witness(pw, xv)
    y.set_witness(pw, yv)
    values = run_circuit(b, pw)
    assert mul.get_witness(values) == oracle.fq2_mul(xv, yv)
    assert inv.get_witness(values) == oracle.fq2_inv(xv)
    assert back.get_witness(values) == xv  # same sgn -> same root


def test_g1_add_and_double():
    pts = [oracle.random_g1(RNG) for _ in range(2)]
    b = ckt.CircuitBuilder()
    a = ckt.G1Target.new_checked(b)
    c = ckt.G1Target.new_checked(b)
    added = a.add(b, c)
    doubled = a.add(b, a)
    pw = ckt.Witness()
    a.set_witness(pw, pts[0])
    c.set_witness(pw, pts[1])
    values = run_circuit(b, pw)
    assert added.get_witness(values) == oracle.g1_add(pts[0], pts[1])
    assert doubled.get_witness(values) == oracle.g1_add(pts[0], pts[0])


def test_g1_is_valid_rejects_corrupt_point():
    pt = oracle.random_g1(RNG)
    bad = (pt[0], (pt[1] + 1) % P)
    b = ckt.CircuitBuilder()
    a = ckt.G1Target.new_unchecked(b)
    valid = a.is_valid(b)
    pw = ckt.Witness()
    a.set_witness(pw, bad)
    values = run_circuit(b, pw)
    assert values[valid.index] == 0


def test_g2_add():
    p1 = oracle.random_g2(RNG)
    p2 = oracle.random_g2(RNG)
    b = ckt.CircuitBuilder()
    a = ckt.G2Target.new_checked(b)
    c = ckt.G2Target.new_checked(b)
    added = a.add(b, c)
    pw = ckt.Witness()
    a.set_witness(pw, p1)
    c.set_witness(pw, p2)
    values = run_circuit(b, pw)
    assert added.get_witness(values) == oracle.g2_add(p1, p2)


def test_builder_stark_ops_fake_backend():
    """builder.rs:178-260 flow with the not-constrain fast backend."""
    b = ckt.CircuitBuilder()
    hook = ckt.get_bn254_hook(b)
    hook.prove_starks = False

    sx = ckt.add_virtual_biguint_target(b, 8)
    fx = ckt.FqTarget.new_unchecked(b)
    fq_out = ckt.fq_exp(b, sx, fx)

    g1x = ckt.G1Target.new_checked(b)
    g1o = ckt.G1Target.new_checked(b)
    s1 = ckt.add_virtual_biguint_target(b, 8)
    g1_out = ckt.g1_scalar_mul(b, s1, g1x, g1o)

    pw = ckt.Witness()
    sv = int(RNG.integers(1, 1 << 62)) << 150 | 3
    xv = oracle.random_fq(RNG)
    sx.set_witness(pw, sv)
    fx.set_witness(pw, xv)
    s1v = int(RNG.integers(1, 1 << 62))
    p1 = oracle.random_g1(RNG)
    o1 = oracle.random_g1(RNG)
    s1.set_witness(pw, s1v)
    g1x.set_witness(pw, p1)
    g1o.set_witness(pw, o1)

    circuit = b.build()
    values, proofs = circuit.prove(pw)
    assert fq_out.get_witness(values) == pow(xv, sv, P)
    assert g1_out.get_witness(values) == oracle.g1_add(oracle.g1_mul(p1, s1v), o1)
    assert proofs.get("bn254") == {}  # fake backend: no STARK proofs


def test_g1_msm_fake_backend():
    b = ckt.CircuitBuilder()
    hook = ckt.get_bn254_hook(b)
    hook.prove_starks = False
    n = 3
    scalars = [ckt.add_virtual_biguint_target(b, 8) for _ in range(n)]
    points = [ckt.G1Target.new_checked(b) for _ in range(n)]
    out = ckt.g1_msm(b, scalars, points)
    pw = ckt.Witness()
    svs = [int(RNG.integers(1, 1 << 62)) for _ in range(n)]
    pts = [oracle.random_g1(RNG) for _ in range(n)]
    for s, v in zip(scalars, svs):
        s.set_witness(pw, v)
    for p, v in zip(points, pts):
        p.set_witness(pw, v)
    circuit = b.build()
    values, _ = circuit.prove(pw)
    want = None
    for s, p in zip(svs, pts):
        want = oracle.g1_add(want, oracle.g1_mul(p, s))
    assert out.get_witness(values) == want


def test_hash_to_fq2_circuit_matches_native():
    inputs = [int(RNG.integers(0, 1 << 60)) for _ in range(5)]
    native = h2g.hash_to_fq2(inputs)
    b = ckt.CircuitBuilder()
    ts = [b.add_virtual_target() for _ in inputs]
    out = h2g.hash_to_fq2_circuit(b, ts)
    pw = ckt.Witness()
    for t, v in zip(ts, inputs):
        pw.set_target(t, v)
    values = run_circuit(b, pw)
    assert out.get_witness(values) == native


def test_map_to_g2_circuit_matches_native():
    """map_to_g2 — the hard half of hash_to_g2 (is_square STARK-path calls,
    sqrt_with_sgn, blinded cofactor mul) — vs the native SW mirror
    (reference utils/hash_to_g2.rs:113-148), fake backend."""
    uv = (oracle.random_fq(RNG), oracle.random_fq(RNG))
    want = h2g.map_to_g2(uv)
    b = ckt.CircuitBuilder()
    hook = ckt.get_bn254_hook(b)
    hook.prove_starks = False
    u = ckt.Fq2Target.new_unchecked(b)
    out = h2g.map_to_g2_circuit(b, u)
    pw = ckt.Witness()
    u.set_witness(pw, uv)
    circuit = b.build()
    values, _ = circuit.prove(pw)
    assert out.get_witness(values) == want


def test_hash_to_g2_circuit_matches_native():
    """Full hash_to_g2 flow (hash_to_fq2 + map_to_g2) vs native mirror."""
    inputs = [int(RNG.integers(0, 1 << 60)) for _ in range(4)]
    want = h2g.hash_to_g2(inputs)
    b = ckt.CircuitBuilder()
    hook = ckt.get_bn254_hook(b)
    hook.prove_starks = False
    ts = [b.add_virtual_target() for _ in inputs]
    out = h2g.hash_to_g2_circuit(b, ts)
    pw = ckt.Witness()
    for t, v in zip(ts, inputs):
        pw.set_target(t, v)
    circuit = b.build()
    values, _ = circuit.prove(pw)
    assert out.get_witness(values) == want
