"""g2_add row semantics: unified Fq2 affine add/double.

Rebuild of /root/reference/src/starks/curves/g2/add.rs:42-274 — identical
constraint structure to g1_add but over the Fq2 limb algebra (SURVEY.md:
the reference G2 machine is a type-substitution clone of G1; here the
substitution is Fq2 pairs for Fq limb tensors).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import bigint, fq2_alg, modular, pol
from .air import eval_eq
from .layout import IS_MODULUS_ZERO_AUX_LAYOUT, Layout, MODULUS_ZERO_AUX_LAYOUT
from .limbs import N_LIMBS

G2_LEN = 4 * N_LIMBS  # 64

EXT_MODULUS_ZERO_AUX_LAYOUT = Layout(
    [("c0_aux", MODULUS_ZERO_AUX_LAYOUT), ("c1_aux", MODULUS_ZERO_AUX_LAYOUT)]
)
IS_EXT_MODULUS_ZERO_AUX_LAYOUT = Layout(
    [
        ("is_c0_zero", 1),
        ("is_c1_zero", 1),
        ("c0_aux", IS_MODULUS_ZERO_AUX_LAYOUT),
        ("c1_aux", IS_MODULUS_ZERO_AUX_LAYOUT),
    ]
)
G2_ADD_AUX_LAYOUT = Layout(
    [
        ("is_x_eq", 1),
        ("is_x_eq_aux", IS_EXT_MODULUS_ZERO_AUX_LAYOUT),
        ("is_x_eq_filter", 1),
        ("lambda", 2 * N_LIMBS),
        ("lambda_aux", EXT_MODULUS_ZERO_AUX_LAYOUT),
        ("x_aux", EXT_MODULUS_ZERO_AUX_LAYOUT),
        ("y_aux", EXT_MODULUS_ZERO_AUX_LAYOUT),
    ]
)
G2_ADD_AUX_LEN = G2_ADD_AUX_LAYOUT.width
assert G2_ADD_AUX_LEN == 708  # add.rs:42-43


class G2AddAux(NamedTuple):
    is_x_eq: jnp.ndarray
    is_x_eq_aux: fq2_alg.IsExtModulusZeroAux
    is_x_eq_filter: jnp.ndarray
    lam: tuple  # (c0, c1) [..., 16]
    lambda_aux: fq2_alg.ExtModulusZeroAux
    x_aux: fq2_alg.ExtModulusZeroAux
    y_aux: fq2_alg.ExtModulusZeroAux


def _sel_pair(cond, a, b):
    c1 = cond[..., None]
    return (
        jnp.where(c1 == 1, a[0], b[0]),
        jnp.where(c1 == 1, a[1], b[1]),
    )


def _sel_mz(cond, a: modular.ModulusZeroAux, b: modular.ModulusZeroAux):
    c1 = cond[..., None]
    return modular.ModulusZeroAux(
        jnp.where(cond == 1, a.is_quot_positive, b.is_quot_positive),
        jnp.where(c1 == 1, a.quot_abs, b.quot_abs),
        jnp.where(c1 == 1, a.aux_lo, b.aux_lo),
        jnp.where(c1 == 1, a.aux_hi, b.aux_hi),
    )


def _sel_ext_aux(cond, a: fq2_alg.ExtModulusZeroAux, b: fq2_alg.ExtModulusZeroAux):
    return fq2_alg.ExtModulusZeroAux(
        _sel_mz(cond, a.c0_aux, b.c0_aux), _sel_mz(cond, a.c1_aux, b.c1_aux)
    )


@jax.jit
def generate_g2_add(ax, ay, bx, by):
    """Batched G2 unified add: ax/ay/bx/by are (c0, c1) limb pairs."""
    delta_x = (bx[0] - ax[0], bx[1] - ax[1])
    is_x_eq, is_x_eq_aux = fq2_alg.generate_is_ext_modulus_zero(delta_x)

    # both lambda branches (canonical Fq2 arithmetic)
    dx_res = (g_res(delta_x[0]), g_res(delta_x[1]))
    dy_res = (g_res(by[0] - ay[0]), g_res(by[1] - ay[1]))
    lam_neq = fq2_alg.f2_mul(dy_res, fq2_alg.f2_inv(dx_res))
    three_x_sq = fq2_alg.f2_small(3, fq2_alg.f2_mul(ax, ax))
    two_y = fq2_alg.f2_small(2, ay)
    lam_eq = fq2_alg.f2_mul(three_x_sq, fq2_alg.f2_inv(two_y))
    lam = _sel_pair(is_x_eq, lam_eq, lam_neq)

    lam_sq = fq2_alg.f2_mul(lam, lam)
    cx = fq2_alg.f2_sub(fq2_alg.f2_sub(lam_sq, ax), bx)
    cy = fq2_alg.f2_sub(fq2_alg.f2_mul(lam, fq2_alg.f2_sub(ax, cx)), ay)

    # lambda_aux (branch-selected)
    m_neq = fq2_alg.ext_mul_wide(lam, delta_x)
    delta_y = (by[0] - ay[0], by[1] - ay[1])
    diff_neq = (
        m_neq[0].at[..., :N_LIMBS].add(-delta_y[0]),
        m_neq[1].at[..., :N_LIMBS].add(-delta_y[1]),
    )
    aux_neq = fq2_alg.generate_ext_modulus_zero(diff_neq)
    x_sq_w = fq2_alg.ext_mul_wide(ax, ax)
    lam_y_w = fq2_alg.ext_mul_wide(lam, ay)
    diff_eq = (
        2 * lam_y_w[0] - 3 * x_sq_w[0],
        2 * lam_y_w[1] - 3 * x_sq_w[1],
    )
    aux_eq = fq2_alg.generate_ext_modulus_zero(diff_eq)
    lambda_aux = _sel_ext_aux(is_x_eq, aux_eq, aux_neq)

    # x_aux: lambda^2 - (a.x + b.x + c.x)
    lam_sq_w = fq2_alg.ext_mul_wide(lam, lam)
    diff_x = (
        lam_sq_w[0].at[..., :N_LIMBS].add(-(ax[0] + bx[0] + cx[0])),
        lam_sq_w[1].at[..., :N_LIMBS].add(-(ax[1] + bx[1] + cx[1])),
    )
    x_aux = fq2_alg.generate_ext_modulus_zero(diff_x)

    # y_aux: lambda*(c.x - a.x) + c.y + a.y
    cxax = (cx[0] - ax[0], cx[1] - ax[1])
    m_y = fq2_alg.ext_mul_wide(lam, cxax)
    diff_y = (
        m_y[0].at[..., :N_LIMBS].add(cy[0] + ay[0]),
        m_y[1].at[..., :N_LIMBS].add(cy[1] + ay[1]),
    )
    y_aux = fq2_alg.generate_ext_modulus_zero(diff_y)

    aux = G2AddAux(
        is_x_eq=is_x_eq,
        is_x_eq_aux=is_x_eq_aux,
        is_x_eq_filter=is_x_eq,
        lam=lam,
        lambda_aux=lambda_aux,
        x_aux=x_aux,
        y_aux=y_aux,
    )
    return cx, cy, aux


def g_res(coeffs):
    from .g1_add import residue_of_signed

    return residue_of_signed(coeffs)


# ---------------------------------------------------------------------------
# Ring-generic evaluation (mirror of eval_g2_add, add.rs:133-274)
# ---------------------------------------------------------------------------


def _pair(view16x2):
    """32-value list -> (c0 list, c1 list)."""
    return view16x2[:N_LIMBS], view16x2[N_LIMBS:]


def _ext_sub(a, b):
    return (
        [a[0][i] - b[0][i] for i in range(len(a[0]))],
        [a[1][i] - b[1][i] for i in range(len(a[1]))],
    )


def _ext_add(a, b):
    return (
        [a[0][i] + b[0][i] for i in range(len(a[0]))],
        [a[1][i] + b[1][i] for i in range(len(a[1]))],
    )


def _ext_mul_wide_ring(a, b):
    m00 = pol.pol_mul_wide(a[0], b[0])
    m11 = pol.pol_mul_wide(a[1], b[1])
    m01 = pol.pol_mul_wide(a[0], b[1])
    m10 = pol.pol_mul_wide(a[1], b[0])
    return (
        [x - y for x, y in zip(m00, m11)],
        [x + y for x, y in zip(m01, m10)],
    )


def eval_g2_add(consumer, ring, filt, modulus, a, b, c, aux):
    """a/b/c: dicts {"x": 32 values, "y": 32 values} (c0 limbs then c1)."""
    ax, ay = _pair(a["x"]), _pair(a["y"])
    bx, by = _pair(b["x"]), _pair(b["y"])
    cx, cy = _pair(c["x"]), _pair(c["y"])

    delta_x = _ext_sub(bx, ax)
    fq2_alg.eval_is_ext_modulus_zero(
        consumer, ring, filt, modulus, delta_x, aux["is_x_eq"], aux["is_x_eq_aux"]
    )
    is_x_eq_filter = aux["is_x_eq_filter"]
    consumer.constraint(filt * aux["is_x_eq"] - is_x_eq_filter)
    is_not_eq_filter = filt - is_x_eq_filter

    lam = _pair(aux["lambda"])
    # chord branch
    lam_dx = _ext_mul_wide_ring(lam, delta_x)
    delta_y = _ext_sub(by, ay)
    diff = (
        pol.pol_sub(lam_dx[0], delta_y[0]),
        pol.pol_sub(lam_dx[1], delta_y[1]),
    )
    fq2_alg.eval_ext_modulus_zero(
        consumer, ring, is_not_eq_filter, modulus, diff, aux["lambda_aux"]
    )
    # tangent branch
    x_sq = _ext_mul_wide_ring(ax, ax)
    lam_y = _ext_mul_wide_ring(lam, ay)
    diff = (
        [p.scalar_mul(2) - q.scalar_mul(3) for p, q in zip(lam_y[0], x_sq[0])],
        [p.scalar_mul(2) - q.scalar_mul(3) for p, q in zip(lam_y[1], x_sq[1])],
    )
    fq2_alg.eval_ext_modulus_zero(
        consumer, ring, is_x_eq_filter, modulus, diff, aux["lambda_aux"]
    )
    # anti-infinity
    eval_eq(consumer, is_x_eq_filter, a["y"], b["y"])

    # x: lambda^2 - (a.x + b.x + c.x)
    sum_x = _ext_add(_ext_add(ax, bx), cx)
    lam_sq = _ext_mul_wide_ring(lam, lam)
    diff = (
        pol.pol_sub(lam_sq[0], sum_x[0]),
        pol.pol_sub(lam_sq[1], sum_x[1]),
    )
    fq2_alg.eval_ext_modulus_zero(consumer, ring, filt, modulus, diff, aux["x_aux"])

    # y: lambda*(c.x - a.x) + c.y + a.y
    cxax = _ext_sub(cx, ax)
    lam_cx = _ext_mul_wide_ring(lam, cxax)
    cyay = _ext_add(cy, ay)
    diff = (
        pol.pol_add(lam_cx[0], cyay[0]),
        pol.pol_add(lam_cx[1], cyay[1]),
    )
    fq2_alg.eval_ext_modulus_zero(consumer, ring, filt, modulus, diff, aux["y_aux"])
