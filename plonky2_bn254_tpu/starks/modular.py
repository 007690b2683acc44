"""Modular-constraint primitives: modulus_zero and is_modulus_zero.

Rebuild of /root/reference/src/starks/modular/modulus_zero.rs:59-253 and
is_modulus_zero.rs:25-112 with:
  * batched, device-side witness generation (generate_*) over `[..., .]`
    int64 limb tensors — the bigint division replaced by Hensel exact
    division (bigint.exact_div_p), fully vectorized;
  * a single ring-generic constraint evaluation (eval_*) consumed by both
    the prover (Goldilocks arrays on the LDE domain) and the verifier
    (extension scalars at zeta).

Aux layouts (identical to the reference):
  ModulusZeroAux   = is_quot_positive(1) | quot_abs(17) | aux_lo(31) | aux_hi(31)   -> 80
  IsModulusZeroAux = inv(16) | ModulusZeroAux(80)                                   -> 96
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..bn254.params import P as BN254_P
from . import bigint, pol
from .limbs import LIMB_BITS, LIMB_MASK, N_LIMBS

AUX_COEFF_ABS_MAX = 1 << 29
MODULUS_AUX_ZERO_LEN = 5 * N_LIMBS  # 80
IS_MODULUS_AUX_ZERO_LEN = N_LIMBS + MODULUS_AUX_ZERO_LEN  # 96

MOD_LIMBS = bigint.MOD_LIMBS_INT


class ModulusZeroAux(NamedTuple):
    is_quot_positive: jnp.ndarray  # [...]
    quot_abs: jnp.ndarray  # [..., 17]
    aux_lo: jnp.ndarray  # [..., 31]
    aux_hi: jnp.ndarray  # [..., 31]


class IsModulusZeroAux(NamedTuple):
    inv: jnp.ndarray  # [..., 16]
    modulus_zero_aux: ModulusZeroAux


def generate_modulus_zero(input_coeffs: jnp.ndarray) -> ModulusZeroAux:
    """Witness that the value of `input_coeffs[..., 31]` is divisible by p.

    Vectorized mirror of generate_modulus_zero (modulus_zero.rs:77-123).
    """
    is_quot_positive, quot_abs18 = bigint.exact_div_p(input_coeffs)
    quot_abs = quot_abs18  # [..., 17]
    # signed quot limbs: sign * abs; sign = -1 unless strictly positive
    sign = 2 * is_quot_positive - 1
    quot_signed = quot_abs * sign[..., None]
    # constr_poly[32] = input (zero-extended) - quot(x)*m(x)
    prod = jnp.zeros(input_coeffs.shape[:-1] + (2 * N_LIMBS,), jnp.int64)
    prod = prod.at[..., : 17 + N_LIMBS - 1].set(
        bigint._pol_mul_arrays(quot_signed, MOD_LIMBS)
    )
    constr = jnp.pad(input_coeffs, [(0, 0)] * (input_coeffs.ndim - 1) + [(0, 1)]) - prod
    # aux_limbs = constr / (x - 2^16), exact
    a = [constr[..., i] for i in range(2 * N_LIMBS)]
    q = pol.pol_remove_root_2exp(a, LIMB_BITS)
    aux = jnp.stack(q[: 2 * N_LIMBS - 1], axis=-1) + AUX_COEFF_ABS_MAX
    aux_lo = aux & LIMB_MASK
    aux_hi = aux >> LIMB_BITS
    return ModulusZeroAux(is_quot_positive, quot_abs, aux_lo, aux_hi)


def eval_modulus_zero(consumer, ring, filt, modulus, input_poly, aux):
    """Ring-generic constraint: value(input_poly) ≡ 0 (mod p).

    `modulus`: 16 ring values; `input_poly`: 31 ring values; `aux`: dict or
    ModulusZeroAux of ring values (is_quot_positive scalar, quot_abs 17,
    aux_lo/aux_hi 31 each).  Mirrors eval_modulus_zero
    (modulus_zero.rs:163-198) exactly, degree <= 3.

    GL-ring consumers with alpha power tables route through a fully
    stacked tensor path (same constraint values, same order) — the
    per-coefficient expansion is too large for the remote TPU compiler.
    """
    from .air import GL

    if isinstance(filt, GL) and getattr(consumer, "alpha_pows", None) is not None:
        return _eval_modulus_zero_stacked(consumer, filt, input_poly, aux)
    iqp = aux["is_quot_positive"]
    quot_abs = aux["quot_abs"]
    aux_lo = aux["aux_lo"]
    aux_hi = aux["aux_hi"]
    one = ring.one()

    consumer.constraint(filt * (iqp * iqp - iqp))
    quot_sign = iqp + iqp - one
    quot = [quot_sign * l for l in quot_abs]
    # constr_poly = q(x) * m(x)  [32 coeffs from 17 x 16]
    constr = pol.pol_mul_wide(quot, modulus)  # 32
    base = ring.const(1 << LIMB_BITS)
    offset = ring.const(AUX_COEFF_ABS_MAX)
    # aux_poly = s(x) (31 coeffs, recombined from lo/hi, de-offset), zero top
    aux_poly = [aux_lo[i] - offset + base * aux_hi[i] for i in range(2 * N_LIMBS - 1)]
    aux_poly.append(ring.zero())
    # constr += (x - base) * s(x)
    constr = pol.pol_add(constr, pol.pol_adjoin_root(aux_poly, base))
    # constr -= input
    constr = pol.pol_sub(constr, input_poly)
    consumer.constraint_many([filt * c for c in constr])


def _eval_modulus_zero_stacked(consumer, filt, input_poly, aux):
    """Stacked mirror of the generic path (GL ring only)."""
    import jax.numpy as jnp

    from ..field import goldilocks as gl
    from .air import GL

    iqp = aux["is_quot_positive"].v
    quot = jnp.stack([v.v for v in aux["quot_abs"]])  # [17, C]
    lo = jnp.stack([v.v for v in aux["aux_lo"]])  # [31, C]
    hi = jnp.stack([v.v for v in aux["aux_hi"]])  # [31, C]
    fv = filt.v

    consumer.constraint(GL(gl.mul(fv, gl.sub(gl.mul(iqp, iqp), iqp))))
    sign = gl.sub(gl.add(iqp, iqp), jnp.uint64(1))
    quot_s = gl.mul(quot, sign[None])
    # constr = q(x) * m(x): convolution with the 16 CONSTANT modulus limbs
    prod = jnp.zeros((2 * N_LIMBS,) + iqp.shape, jnp.uint64)
    for j, m_j in enumerate(MOD_LIMBS):
        if m_j == 0:
            continue
        term = gl.mul_const(quot_s, int(m_j))
        prod = prod.at[j : j + 17].set(gl.add(prod[j : j + 17], term))
    # aux_poly s(x) and (x - beta) * s(x)
    aux_p = gl.add(
        gl.sub(lo, jnp.uint64(AUX_COEFF_ABS_MAX)),
        gl.mul_const(hi, 1 << LIMB_BITS),
    )  # [31, C]
    b_aux = gl.mul_const(aux_p, 1 << LIMB_BITS)
    adjoin = jnp.concatenate(
        [
            gl.neg(b_aux[:1]),
            gl.sub(aux_p[: 2 * N_LIMBS - 2], b_aux[1:]),
            aux_p[2 * N_LIMBS - 2 :],
        ],
        axis=0,
    )  # [32, C]
    constr = gl.add(prod, adjoin)
    inp = jnp.stack([v.v for v in input_poly])  # [31, C]
    constr = jnp.concatenate(
        [gl.sub(constr[: 2 * N_LIMBS - 1], inp), constr[2 * N_LIMBS - 1 :]],
        axis=0,
    )
    consumer.constraint_many_arr(gl.mul(fv[None], constr))


def generate_is_modulus_zero(input_limbs: jnp.ndarray):
    """(is_zero, IsModulusZeroAux) for a signed 16-limb value.

    Vectorized mirror of generate_is_modulus_zero (is_modulus_zero.rs:36-66):
    witnesses inv = (input mod p)^-1 (0 if zero) and the modulus_zero proof
    of input*inv - 1 + is_zero ≡ 0 (mod p).
    """
    # input mod p: add a positive multiple of p to clear signs, then reduce.
    # limbs are in (-2^16, 2^16); value magnitude < 2^272; offset = p << 32
    offset_coeffs = jnp.asarray(
        bigint.np.array(
            bigint.h_int_to_limbs(BN254_P << 32, 20) + [0] * 12, dtype="int64"
        )
    )
    shifted = bigint.carry_prop(
        jnp.pad(input_limbs, [(0, 0)] * (input_limbs.ndim - 1) + [(0, 16)])
        + offset_coeffs,
        32,
    )
    residue = bigint.mod_p(shifted)
    inv = bigint.batch_inv_mod_p(residue)
    is_zero = jnp.all(residue == 0, axis=-1).astype(jnp.int64)
    # diff = input * inv - 1 + is_zero  (31 coeffs)
    diff = bigint._pol_mul_aa(input_limbs, inv)
    diff = diff.at[..., 0].add(is_zero - 1)
    aux = generate_modulus_zero(diff)
    return is_zero, IsModulusZeroAux(inv, aux)


def eval_is_modulus_zero(consumer, ring, filt, modulus, input_limbs, is_zero, aux):
    """Ring-generic mirror of eval_is_modulus_zero (is_modulus_zero.rs:69-84)."""
    from .air import GL

    inv = aux["inv"]
    diff = pol.pol_mul_wide(input_limbs, inv)  # 31
    one = ring.one()
    diff[0] = diff[0] + is_zero - one
    eval_modulus_zero(consumer, ring, filt, modulus, diff, aux["modulus_zero_aux"])
    if isinstance(filt, GL) and getattr(consumer, "alpha_pows", None) is not None:
        import jax.numpy as jnp

        from ..field import goldilocks as gl

        inp = jnp.stack([v.v for v in input_limbs])
        consumer.constraint_many_arr(
            gl.mul(gl.mul(filt.v, is_zero.v)[None], inp)
        )
    else:
        consumer.constraint_many([filt * (is_zero * limb) for limb in input_limbs])
