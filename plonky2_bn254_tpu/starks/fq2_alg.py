"""Batched Fq2 limb algebra: the quadratic-extension layer for G2.

Rebuild of /root/reference/src/starks/curves/g2/ext/ (mod/add/sub/mul/
convert/modulus_zero/is_modulus_zero): values are (c0, c1) pairs of
[..., 16] limb tensors, wide products are (c0, c1) pairs of [..., 31]
coefficient tensors, with u^2 = -1:

  (a0 + a1 u)(b0 + b1 u) = (a0 b0 - a1 b1) + (a0 b1 + a1 b0) u

Aux layouts (identical to the reference):
  ExtModulusZeroAux   = c0_aux(80) | c1_aux(80)             -> 160
  IsExtModulusZeroAux = is_c0_zero | is_c1_zero | 2 x 96    -> 194
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import bigint, modular, pol
from .limbs import N_LIMBS

EXT_MODULUS_AUX_ZERO_LEN = 2 * modular.MODULUS_AUX_ZERO_LEN  # 160
IS_EXT_MODULUS_AUX_ZERO_LEN = 2 + 2 * modular.IS_MODULUS_AUX_ZERO_LEN  # 194


# ---------------------------------------------------------------------------
# Canonical (mod-p) Fq2 arithmetic for witness point math
# ---------------------------------------------------------------------------


def f2_add(a, b, unroll=False):
    return (bigint.addmod(a[0], b[0], unroll=unroll),
            bigint.addmod(a[1], b[1], unroll=unroll))


def f2_sub(a, b, unroll=False):
    return (bigint.submod(a[0], b[0], unroll=unroll),
            bigint.submod(a[1], b[1], unroll=unroll))


def f2_mul(a, b, unroll=False):
    m00 = bigint.mulmod(a[0], b[0], unroll=unroll)
    m11 = bigint.mulmod(a[1], b[1], unroll=unroll)
    m01 = bigint.mulmod(a[0], b[1], unroll=unroll)
    m10 = bigint.mulmod(a[1], b[0], unroll=unroll)
    return (bigint.submod(m00, m11, unroll=unroll),
            bigint.addmod(m01, m10, unroll=unroll))


def f2_small(k: int, a, unroll=False):
    out0 = bigint.mod_p(bigint.carry_prop(k * a[0], 32, unroll=unroll), unroll=unroll)
    out1 = bigint.mod_p(bigint.carry_prop(k * a[1], 32, unroll=unroll), unroll=unroll)
    return (out0, out1)


def f2_inv(a, unroll=False):
    """(a0 - a1 u) / (a0^2 + a1^2); 0 -> 0 (Fermat convention)."""
    norm = bigint.addmod(bigint.mulmod(a[0], a[0], unroll=unroll),
                         bigint.mulmod(a[1], a[1], unroll=unroll),
                         unroll=unroll)
    ninv = bigint.batch_inv_mod_p(norm, unroll=unroll)
    zero = jnp.zeros_like(a[1])
    return (
        bigint.mulmod(a[0], ninv, unroll=unroll),
        bigint.mulmod(bigint.submod(zero, a[1], unroll=unroll), ninv, unroll=unroll),
    )


# ---------------------------------------------------------------------------
# Wide (signed-coefficient) algebra for witness aux generation
# ---------------------------------------------------------------------------


def ext_mul_wide(a, b):
    """(c0, c1) 16-limb pairs -> (c0, c1) 31-coefficient signed products."""
    m00 = bigint._pol_mul_aa(a[0], b[0])
    m11 = bigint._pol_mul_aa(a[1], b[1])
    m01 = bigint._pol_mul_aa(a[0], b[1])
    m10 = bigint._pol_mul_aa(a[1], b[0])
    return (m00 - m11, m01 + m10)


class ExtModulusZeroAux(NamedTuple):
    c0_aux: modular.ModulusZeroAux
    c1_aux: modular.ModulusZeroAux


class IsExtModulusZeroAux(NamedTuple):
    is_c0_zero: jnp.ndarray
    is_c1_zero: jnp.ndarray
    c0_aux: modular.IsModulusZeroAux
    c1_aux: modular.IsModulusZeroAux


def generate_ext_modulus_zero(input_wide) -> ExtModulusZeroAux:
    return ExtModulusZeroAux(
        modular.generate_modulus_zero(input_wide[0]),
        modular.generate_modulus_zero(input_wide[1]),
    )


def eval_ext_modulus_zero(consumer, ring, filt, modulus, input_wide, aux):
    modular.eval_modulus_zero(
        consumer, ring, filt, modulus, input_wide[0], aux["c0_aux"]
    )
    modular.eval_modulus_zero(
        consumer, ring, filt, modulus, input_wide[1], aux["c1_aux"]
    )


def generate_is_ext_modulus_zero(input_pair):
    is_c0, c0_aux = modular.generate_is_modulus_zero(input_pair[0])
    is_c1, c1_aux = modular.generate_is_modulus_zero(input_pair[1])
    is_zero = is_c0 * is_c1
    return is_zero, IsExtModulusZeroAux(is_c0, is_c1, c0_aux, c1_aux)


def eval_is_ext_modulus_zero(consumer, ring, filt, modulus, input_pair, is_zero, aux):
    consumer.constraint(filt * (aux["is_c0_zero"] * aux["is_c1_zero"] - is_zero))
    modular.eval_is_modulus_zero(
        consumer, ring, filt, modulus, input_pair[0], aux["is_c0_zero"], aux["c0_aux"]
    )
    modular.eval_is_modulus_zero(
        consumer, ring, filt, modulus, input_pair[1], aux["is_c1_zero"], aux["c1_aux"]
    )


# ---------------------------------------------------------------------------
# Jacobian arithmetic over Fq2 (G2 trace chains)
# ---------------------------------------------------------------------------


def jac_double(X, Y, Z, unroll=False):
    """dbl-2009-l over Fq2 pairs (curve a = 0)."""
    u = unroll
    A = f2_mul(X, X, u)
    B = f2_mul(Y, Y, u)
    C = f2_mul(B, B, u)
    XB = f2_add(X, B, u)
    D0 = f2_mul(XB, XB, u)
    D = f2_small(2, f2_sub(f2_sub(D0, A, u), C, u), u)
    E = f2_small(3, A, u)
    F = f2_mul(E, E, u)
    X3 = f2_sub(F, f2_small(2, D, u), u)
    Y3 = f2_sub(f2_mul(E, f2_sub(D, X3, u), u), f2_small(8, C, u), u)
    Z3 = f2_small(2, f2_mul(Y, Z, u), u)
    return X3, Y3, Z3


def jac_mixed_add(X1, Y1, Z1, x2, y2, unroll=False):
    """madd-2007-bl over Fq2 pairs; points distinct, no infinity."""
    u = unroll
    Z1Z1 = f2_mul(Z1, Z1, u)
    U2 = f2_mul(x2, Z1Z1, u)
    S2 = f2_mul(f2_mul(y2, Z1, u), Z1Z1, u)
    H = f2_sub(U2, X1, u)
    HH = f2_mul(H, H, u)
    I = f2_small(4, HH, u)
    J = f2_mul(H, I, u)
    r = f2_small(2, f2_sub(S2, Y1, u), u)
    V = f2_mul(X1, I, u)
    X3 = f2_sub(f2_sub(f2_mul(r, r, u), J, u), f2_small(2, V, u), u)
    Y3 = f2_sub(f2_mul(r, f2_sub(V, X3, u), u), f2_small(2, f2_mul(Y1, J, u), u), u)
    Z3 = f2_sub(f2_sub(f2_mul(f2_add(Z1, H, u), f2_add(Z1, H, u), u), Z1Z1, u), HH, u)
    return X3, Y3, Z3


def jac_to_affine(X, Y, Z, unroll=False):
    u = unroll
    z_inv = f2_inv(Z, u)
    z2 = f2_mul(z_inv, z_inv, u)
    z3 = f2_mul(z2, z_inv, u)
    return f2_mul(X, z2, u), f2_mul(Y, z3, u)
