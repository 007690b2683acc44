"""Batched Jacobian-coordinate BN254 point arithmetic on limb tensors.

TPU-native trace-generation strategy (SURVEY.md §2 parallelism note): the
reference computes every double-and-add step with affine arkworks ops —
one field inversion per step (add.rs:66,80).  Inversions don't vectorize
across a sequential chain, so here the chains run in Jacobian coordinates
(inversion-free scans) and ALL points are normalized to affine afterwards
with one big batched Fermat inversion.

Coordinates: (X, Y, Z) with x = X/Z^2, y = Y/Z^3.  No point at infinity is
representable — callers uphold the reference's no-infinity precondition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import bigint


def double(X, Y, Z):
    """dbl-2009-l (a=0): one Jacobian doubling, batched."""
    A = bigint.mulmod(X, X)
    B = bigint.mulmod(Y, Y)
    C = bigint.mulmod(B, B)
    XB = bigint.mod_p(bigint.carry_prop(X + B, 32))
    D = bigint.mulmod(XB, XB)
    D = bigint.mod_p(bigint.carry_prop(2 * (D - A - C) + 4 * jnp.asarray(bigint.MOD_LIMBS_INT), 32))
    E = bigint.mod_p(bigint.carry_prop(3 * A, 32))
    F = bigint.mulmod(E, E)
    X3 = bigint.mod_p(bigint.carry_prop((F - 2 * D) + 2 * jnp.asarray(bigint.MOD_LIMBS_INT), 32))
    DX3 = bigint.mod_p(bigint.carry_prop((D - X3) + jnp.asarray(bigint.MOD_LIMBS_INT), 32))
    Y3 = bigint.mulmod(E, DX3)
    C8 = bigint.mod_p(bigint.carry_prop(8 * C, 32))
    Y3 = bigint.mod_p(bigint.carry_prop((Y3 - C8) + jnp.asarray(bigint.MOD_LIMBS_INT), 32))
    YZ = bigint.mulmod(Y, Z)
    Z3 = bigint.mod_p(bigint.carry_prop(2 * YZ, 32))
    return X3, Y3, Z3


def mixed_add(X1, Y1, Z1, x2, y2):
    """madd-2007-bl: Jacobian + affine -> Jacobian, batched.

    Precondition: the points are distinct and not negatives (guaranteed by
    the random-offset blinding upstream, g1_msm.rs pattern).
    """
    P = jnp.asarray(bigint.MOD_LIMBS_INT)
    Z1Z1 = bigint.mulmod(Z1, Z1)
    U2 = bigint.mulmod(x2, Z1Z1)
    S2 = bigint.mulmod(bigint.mulmod(y2, Z1), Z1Z1)
    H = bigint.mod_p(bigint.carry_prop((U2 - X1) + P, 32))
    HH = bigint.mulmod(H, H)
    I = bigint.mod_p(bigint.carry_prop(4 * HH, 32))
    J = bigint.mulmod(H, I)
    r = bigint.mod_p(bigint.carry_prop(2 * (S2 - Y1) + 2 * P, 32))
    V = bigint.mulmod(X1, I)
    r2 = bigint.mulmod(r, r)
    X3 = bigint.mod_p(bigint.carry_prop((r2 - J - 2 * V) + 3 * P, 32))
    VX3 = bigint.mod_p(bigint.carry_prop((V - X3) + P, 32))
    YJ = bigint.mulmod(Y1, J)
    Y3 = bigint.mod_p(
        bigint.carry_prop(
            (bigint.mulmod(r, VX3) - 2 * YJ) + 2 * P, 32
        )
    )
    Z1H = bigint.mod_p(bigint.carry_prop(Z1 + H, 32))
    Z3sq = bigint.mulmod(Z1H, Z1H)
    Z3 = bigint.mod_p(bigint.carry_prop((Z3sq - Z1Z1 - HH) + 2 * P, 32))
    return X3, Y3, Z3


def to_affine(X, Y, Z):
    """Batched normalization: one Fermat inversion over the whole batch."""
    z_inv = bigint.batch_inv_mod_p(Z)
    z_inv2 = bigint.mulmod(z_inv, z_inv)
    z_inv3 = bigint.mulmod(z_inv2, z_inv)
    return bigint.mulmod(X, z_inv2), bigint.mulmod(Y, z_inv3)
