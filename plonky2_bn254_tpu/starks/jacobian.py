"""Batched Jacobian-coordinate BN254 point arithmetic on limb tensors.

TPU-native trace-generation strategy (SURVEY.md §2 parallelism note): the
reference computes every double-and-add step with affine arkworks ops —
one field inversion per step (add.rs:66,80).  Inversions don't vectorize
across a sequential chain, so here the chains run in Jacobian coordinates
(inversion-free scans) and ALL points are normalized to affine afterwards
with one big batched Fermat inversion.

Coordinates: (X, Y, Z) with x = X/Z^2, y = Y/Z^3.  No point at infinity is
representable — callers uphold the reference's no-infinity precondition.

`unroll=True` flattens every limb-carry scan into straight-line code: on
the TPU the nested-scan per-iteration overhead dominates the 256-step
chain scans (~1s of a 3.8s G1 proof, measured), while on XLA CPU the
unrolled graphs compile pathologically slowly — so the caller selects by
the platform its arrays live on (g1_scalar_mul.generate_trace_core).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import bigint


def double(X, Y, Z, unroll=False):
    """dbl-2009-l (a=0): one Jacobian doubling, batched."""
    A = bigint.mulmod(X, X, unroll=unroll)
    B = bigint.mulmod(Y, Y, unroll=unroll)
    C = bigint.mulmod(B, B, unroll=unroll)
    XB = bigint.mod_p(bigint.carry_prop(X + B, 32, unroll=unroll), unroll=unroll)
    D = bigint.mulmod(XB, XB, unroll=unroll)
    D = bigint.mod_p(bigint.carry_prop(2 * (D - A - C) + 4 * jnp.asarray(bigint.MOD_LIMBS_INT), 32, unroll=unroll), unroll=unroll)
    E = bigint.mod_p(bigint.carry_prop(3 * A, 32, unroll=unroll), unroll=unroll)
    F = bigint.mulmod(E, E, unroll=unroll)
    X3 = bigint.mod_p(bigint.carry_prop((F - 2 * D) + 2 * jnp.asarray(bigint.MOD_LIMBS_INT), 32, unroll=unroll), unroll=unroll)
    DX3 = bigint.mod_p(bigint.carry_prop((D - X3) + jnp.asarray(bigint.MOD_LIMBS_INT), 32, unroll=unroll), unroll=unroll)
    Y3 = bigint.mulmod(E, DX3, unroll=unroll)
    C8 = bigint.mod_p(bigint.carry_prop(8 * C, 32, unroll=unroll), unroll=unroll)
    Y3 = bigint.mod_p(bigint.carry_prop((Y3 - C8) + jnp.asarray(bigint.MOD_LIMBS_INT), 32, unroll=unroll), unroll=unroll)
    YZ = bigint.mulmod(Y, Z, unroll=unroll)
    Z3 = bigint.mod_p(bigint.carry_prop(2 * YZ, 32, unroll=unroll), unroll=unroll)
    return X3, Y3, Z3


def mixed_add(X1, Y1, Z1, x2, y2, unroll=False):
    """madd-2007-bl: Jacobian + affine -> Jacobian, batched.

    Precondition: the points are distinct and not negatives (guaranteed by
    the random-offset blinding upstream, g1_msm.rs pattern).
    """
    P = jnp.asarray(bigint.MOD_LIMBS_INT)
    Z1Z1 = bigint.mulmod(Z1, Z1, unroll=unroll)
    U2 = bigint.mulmod(x2, Z1Z1, unroll=unroll)
    S2 = bigint.mulmod(bigint.mulmod(y2, Z1, unroll=unroll), Z1Z1, unroll=unroll)
    H = bigint.mod_p(bigint.carry_prop((U2 - X1) + P, 32, unroll=unroll), unroll=unroll)
    HH = bigint.mulmod(H, H, unroll=unroll)
    I = bigint.mod_p(bigint.carry_prop(4 * HH, 32, unroll=unroll), unroll=unroll)
    J = bigint.mulmod(H, I, unroll=unroll)
    r = bigint.mod_p(bigint.carry_prop(2 * (S2 - Y1) + 2 * P, 32, unroll=unroll), unroll=unroll)
    V = bigint.mulmod(X1, I, unroll=unroll)
    r2 = bigint.mulmod(r, r, unroll=unroll)
    X3 = bigint.mod_p(bigint.carry_prop((r2 - J - 2 * V) + 3 * P, 32, unroll=unroll), unroll=unroll)
    VX3 = bigint.mod_p(bigint.carry_prop((V - X3) + P, 32, unroll=unroll), unroll=unroll)
    YJ = bigint.mulmod(Y1, J, unroll=unroll)
    Y3 = bigint.mod_p(
        bigint.carry_prop(
            (bigint.mulmod(r, VX3, unroll=unroll) - 2 * YJ) + 2 * P, 32, unroll=unroll
        ),
        unroll=unroll,
    )
    Z1H = bigint.mod_p(bigint.carry_prop(Z1 + H, 32, unroll=unroll), unroll=unroll)
    Z3sq = bigint.mulmod(Z1H, Z1H, unroll=unroll)
    Z3 = bigint.mod_p(bigint.carry_prop((Z3sq - Z1Z1 - HH) + 2 * P, 32, unroll=unroll), unroll=unroll)
    return X3, Y3, Z3


def to_affine(X, Y, Z, unroll=False):
    """Batched normalization: one Fermat inversion over the whole batch."""
    z_inv = bigint.batch_inv_mod_p(Z, unroll=unroll)
    z_inv2 = bigint.mulmod(z_inv, z_inv, unroll=unroll)
    z_inv3 = bigint.mulmod(z_inv2, z_inv, unroll=unroll)
    return bigint.mulmod(X, z_inv2, unroll=unroll), bigint.mulmod(Y, z_inv3, unroll=unroll)
