"""Micro-STARK harnesses: each row-constraint family pushed through the
REAL prover in isolation — the reference's key test pattern (SURVEY.md §4.4;
ModZeroStark at /root/reference/src/starks/modular/modulus_zero.rs:296-438,
G1AddStark at g1/add.rs:299-451, G2AddStark at g2/add.rs:312-465).

Each throwaway machine is tiny (64 rows), has no LogUp lookups (like the
reference harnesses) but binds its I/O through one CTL — exactly where
CTL bookkeeping regressions hide.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky2_bn254_tpu.bn254 import oracle, params
from plonky2_bn254_tpu.prover import prove as prove_mod
from plonky2_bn254_tpu.prover import verify as verify_mod
from plonky2_bn254_tpu.prover.config import TEST_CONFIG
from plonky2_bn254_tpu.starks import bigint, fq_mul, g1_add, g2_add, limbs
from plonky2_bn254_tpu.starks.layout import (
    G1_ADD_AUX_LAYOUT,
    Layout,
    MODULUS_ZERO_AUX_LAYOUT,
)
from plonky2_bn254_tpu.starks.table import CtlSpec, Stark

RNG = np.random.default_rng(91)
N_ROWS = 64


def _pad_rows(rows: jnp.ndarray, width: int) -> jnp.ndarray:
    rows = jnp.asarray(rows, jnp.uint64)
    pad = N_ROWS - rows.shape[0]
    return jnp.concatenate([rows, jnp.zeros((pad, width), jnp.uint64)])


def _roundtrip(stark, trace, ctl_values):
    proof = prove_mod.prove(stark, trace, ctl_values, TEST_CONFIG)
    verify_mod.verify(stark, proof, ctl_values, TEST_CONFIG)
    # CTL binding: a different claimed I/O multiset must be rejected
    bad = {0: [list(r) for r in ctl_values[0]]}
    bad[0][0][0] = (bad[0][0][0] + 1) % (1 << 16)
    with pytest.raises(verify_mod.VerificationError):
        verify_mod.verify(stark, proof, bad, TEST_CONFIG)


# ---------------------------------------------------------------------------
# ModZeroStark: a*b ≡ c (mod p) rows
# ---------------------------------------------------------------------------

MZ_LAYOUT = Layout(
    [
        ("a", 16),
        ("b", 16),
        ("c", 16),
        ("aux", MODULUS_ZERO_AUX_LAYOUT),
        ("filter", 1),
    ]
)


def _eval_mod_zero(consumer, ring, local, next_):
    v = MZ_LAYOUT.view(local)
    modulus = [ring.const(m) for m in bigint.MOD_LIMBS_INT]
    fq_mul.eval_fq_mul(
        consumer, ring, v["filter"], modulus, v["a"], v["b"], v["c"], v["aux"]
    )


def test_mod_zero_micro_stark():
    n = 10
    a_int = [oracle.random_fq(RNG) for _ in range(n)]
    b_int = [oracle.random_fq(RNG) for _ in range(n)]
    a = limbs.from_ints(a_int)
    b = limbs.from_ints(b_int)
    c, aux = fq_mul.generate_fq_mul(a, b)
    rows = jnp.concatenate(
        [
            a,
            b,
            c,
            aux.is_quot_positive[..., None],
            aux.quot_abs,
            aux.aux_lo,
            aux.aux_hi,
            jnp.ones((n, 1), jnp.int64),
        ],
        axis=-1,
    )
    trace = _pad_rows(rows, MZ_LAYOUT.width)
    stark = Stark(
        name="mod_zero_micro",
        width=MZ_LAYOUT.width,
        eval_fn=_eval_mod_zero,
        lookups=[],
        ctls=[
            CtlSpec(
                columns=[("single", i) for i in range(48)],
                filter_col=MZ_LAYOUT.col("filter"),
            )
        ],
    )
    ctl_values = {
        0: [
            limbs.h_int_to_limbs(a_int[i], 16)
            + limbs.h_int_to_limbs(b_int[i], 16)
            + limbs.h_int_to_limbs(a_int[i] * b_int[i] % params.P, 16)
            for i in range(n)
        ]
    }
    _roundtrip(stark, trace, ctl_values)


# ---------------------------------------------------------------------------
# G1AddStark: unified add/double rows
# ---------------------------------------------------------------------------

G1A_LAYOUT = Layout(
    [
        ("ax", 16),
        ("ay", 16),
        ("bx", 16),
        ("by", 16),
        ("cx", 16),
        ("cy", 16),
        ("aux", G1_ADD_AUX_LAYOUT),
        ("filter", 1),
    ]
)


def _eval_g1_add(consumer, ring, local, next_):
    v = G1A_LAYOUT.view(local)
    modulus = [ring.const(m) for m in bigint.MOD_LIMBS_INT]
    g1_add.eval_g1_add(
        consumer,
        ring,
        v["filter"],
        modulus,
        {"x": v["ax"], "y": v["ay"]},
        {"x": v["bx"], "y": v["by"]},
        {"x": v["cx"], "y": v["cy"]},
        v["aux"],
    )


def _g1_aux_cols(aux: g1_add.G1AddAux):
    def mz(m):
        return [m.is_quot_positive[..., None], m.quot_abs, m.aux_lo, m.aux_hi]

    return (
        [aux.is_x_eq[..., None], aux.is_x_eq_aux.inv]
        + mz(aux.is_x_eq_aux.modulus_zero_aux)
        + [aux.is_x_eq_filter[..., None], aux.lam]
        + mz(aux.lambda_aux)
        + mz(aux.x_aux)
        + mz(aux.y_aux)
    )


def test_g1_add_micro_stark():
    # alternating distinct-add and doubling pairs, like the reference
    pts = [oracle.random_g1(RNG) for _ in range(8)]
    pairs = [(pts[i], pts[i + 1] if i % 2 == 0 else pts[i]) for i in range(7)]
    ax = limbs.from_ints([p[0] for p, _ in pairs])
    ay = limbs.from_ints([p[1] for p, _ in pairs])
    bx = limbs.from_ints([q[0] for _, q in pairs])
    by = limbs.from_ints([q[1] for _, q in pairs])
    cx, cy, aux = g1_add.generate_g1_add(ax, ay, bx, by)
    n = len(pairs)
    rows = jnp.concatenate(
        [ax, ay, bx, by, cx, cy]
        + _g1_aux_cols(aux)
        + [jnp.ones((n, 1), jnp.int64)],
        axis=-1,
    )
    trace = _pad_rows(rows, G1A_LAYOUT.width)
    stark = Stark(
        name="g1_add_micro",
        width=G1A_LAYOUT.width,
        eval_fn=_eval_g1_add,
        lookups=[],
        ctls=[
            CtlSpec(
                columns=[("single", i) for i in range(96)],
                filter_col=G1A_LAYOUT.col("filter"),
            )
        ],
    )
    ctl_values = {0: []}
    for (p, q) in pairs:
        want = oracle.g1_add(p, q)
        ctl_values[0].append(
            limbs.h_int_to_limbs(p[0], 16)
            + limbs.h_int_to_limbs(p[1], 16)
            + limbs.h_int_to_limbs(q[0], 16)
            + limbs.h_int_to_limbs(q[1], 16)
            + limbs.h_int_to_limbs(want[0], 16)
            + limbs.h_int_to_limbs(want[1], 16)
        )
    _roundtrip(stark, trace, ctl_values)


# ---------------------------------------------------------------------------
# G2AddStark
# ---------------------------------------------------------------------------

G2A_LAYOUT = Layout(
    [
        ("ax", 32),
        ("ay", 32),
        ("bx", 32),
        ("by", 32),
        ("cx", 32),
        ("cy", 32),
        ("aux", g2_add.G2_ADD_AUX_LAYOUT),
        ("filter", 1),
    ]
)


def _eval_g2_add(consumer, ring, local, next_):
    v = G2A_LAYOUT.view(local)
    modulus = [ring.const(m) for m in bigint.MOD_LIMBS_INT]
    g2_add.eval_g2_add(
        consumer,
        ring,
        v["filter"],
        modulus,
        {"x": v["ax"], "y": v["ay"]},
        {"x": v["bx"], "y": v["by"]},
        {"x": v["cx"], "y": v["cy"]},
        v["aux"],
    )


def _g2_aux_cols(aux: g2_add.G2AddAux):
    def mz(m):
        return [m.is_quot_positive[..., None], m.quot_abs, m.aux_lo, m.aux_hi]

    def imz(m):
        return [m.inv] + mz(m.modulus_zero_aux)

    def ext(e):
        return mz(e.c0_aux) + mz(e.c1_aux)

    return (
        [
            aux.is_x_eq[..., None],
            aux.is_x_eq_aux.is_c0_zero[..., None],
            aux.is_x_eq_aux.is_c1_zero[..., None],
        ]
        + imz(aux.is_x_eq_aux.c0_aux)
        + imz(aux.is_x_eq_aux.c1_aux)
        + [aux.is_x_eq_filter[..., None], aux.lam[0], aux.lam[1]]
        + ext(aux.lambda_aux)
        + ext(aux.x_aux)
        + ext(aux.y_aux)
    )


def _f2_dev(vals):
    return (
        limbs.from_ints([v[0] for v in vals]),
        limbs.from_ints([v[1] for v in vals]),
    )


@pytest.mark.slow  # width-901 quotient compile is minutes cold on CPU
def test_g2_add_micro_stark():
    pts = [oracle.random_g2(RNG) for _ in range(4)]
    pairs = [(pts[0], pts[1]), (pts[2], pts[2]), (pts[1], pts[3])]
    pa_x = _f2_dev([a[0] for a, _ in pairs])
    pa_y = _f2_dev([a[1] for a, _ in pairs])
    pb_x = _f2_dev([b[0] for _, b in pairs])
    pb_y = _f2_dev([b[1] for _, b in pairs])
    cx, cy, aux = g2_add.generate_g2_add(pa_x, pa_y, pb_x, pb_y)
    n = len(pairs)
    rows = jnp.concatenate(
        [pa_x[0], pa_x[1], pa_y[0], pa_y[1], pb_x[0], pb_x[1], pb_y[0], pb_y[1],
         cx[0], cx[1], cy[0], cy[1]]
        + _g2_aux_cols(aux)
        + [jnp.ones((n, 1), jnp.int64)],
        axis=-1,
    )
    trace = _pad_rows(rows, G2A_LAYOUT.width)
    stark = Stark(
        name="g2_add_micro",
        width=G2A_LAYOUT.width,
        eval_fn=_eval_g2_add,
        lookups=[],
        ctls=[
            CtlSpec(
                columns=[("single", i) for i in range(192)],
                filter_col=G2A_LAYOUT.col("filter"),
            )
        ],
    )

    def f2_limbs(v):
        return limbs.h_int_to_limbs(v[0], 16) + limbs.h_int_to_limbs(v[1], 16)

    ctl_values = {0: []}
    for (p, q) in pairs:
        want = oracle.g2_add(p, q)
        ctl_values[0].append(
            f2_limbs(p[0]) + f2_limbs(p[1]) + f2_limbs(q[0]) + f2_limbs(q[1])
            + f2_limbs(want[0]) + f2_limbs(want[1])
        )
    _roundtrip(stark, trace, ctl_values)
