"""Host python-int mirror of the witness generators (bit-exactness oracle).

Implements the reference's generation semantics 1:1 over python ints
(modulus_zero.rs:77-123, is_modulus_zero.rs:36-66, fields/mul.rs:22-40) so
device kernels can be asserted bit-exact against it in tests — standing in
for the Rust reference itself, which cannot be compiled in this image
(SURVEY.md §4 fixture note).
"""

from __future__ import annotations

from ..bn254.params import P as BN254_P
from .limbs import LIMB_BITS, LIMB_MASK, N_LIMBS, h_int_to_columns, h_limbs_to_int
from .modular import AUX_COEFF_ABS_MAX

MOD_COLS = h_int_to_columns(BN254_P, N_LIMBS)


def h_pol_mul_wide(a, b):
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            out[i + j] += ai * bj
    return out


def h_pol_sub(a, b):
    assert len(a) >= len(b)
    return [a[i] - (b[i] if i < len(b) else 0) for i in range(len(a))]


def h_pol_remove_root_2exp(a, exp):
    n = len(a)
    q = [0] * n
    q[0] = -(a[0] >> exp)
    for i in range(1, n - 1):
        q[i] = (q[i - 1] - a[i]) >> exp
    return q


def h_generate_modulus_zero(input_coeffs):
    """-> dict(is_quot_positive, quot_abs[17], aux_lo[31], aux_hi[31])."""
    value = h_limbs_to_int(input_coeffs)
    assert value % BN254_P == 0, "input not divisible by modulus"
    quot = value // BN254_P
    is_quot_positive = 1 if quot > 0 else 0
    quot_limbs = h_int_to_columns(quot, N_LIMBS + 1)
    quot_abs = h_int_to_columns(abs(quot), N_LIMBS + 1)
    constr = [0] * (2 * N_LIMBS)
    constr[: 2 * N_LIMBS - 1] = list(input_coeffs)
    prod = h_pol_mul_wide(quot_limbs, MOD_COLS)  # 32 coeffs
    constr = [c - p for c, p in zip(constr, prod)]
    aux = h_pol_remove_root_2exp(constr, LIMB_BITS)
    assert aux[31] == 0
    aux = [c + AUX_COEFF_ABS_MAX for c in aux]
    assert all(0 <= c <= 2 * AUX_COEFF_ABS_MAX for c in aux)
    aux_lo = [c & LIMB_MASK for c in aux[: 2 * N_LIMBS - 1]]
    aux_hi = [(c >> LIMB_BITS) & LIMB_MASK for c in aux[: 2 * N_LIMBS - 1]]
    return {
        "is_quot_positive": is_quot_positive,
        "quot_abs": quot_abs,
        "aux_lo": aux_lo,
        "aux_hi": aux_hi,
    }


def h_generate_is_modulus_zero(input_limbs):
    """-> (is_zero, dict(inv[16], modulus_zero_aux))."""
    value = h_limbs_to_int(input_limbs)
    residue = value % BN254_P
    inv_int = pow(residue, BN254_P - 2, BN254_P) if residue else 0
    is_zero = 1 if residue == 0 else 0
    inv_cols = h_int_to_columns(inv_int, N_LIMBS)
    diff = h_pol_mul_wide(list(input_limbs), inv_cols)
    diff[0] += is_zero - 1
    aux = h_generate_modulus_zero(diff)
    return is_zero, {"inv": inv_cols, "modulus_zero_aux": aux}


def h_generate_fq_mul(a_int: int, b_int: int):
    """-> (c_int, modulus_zero_aux) mirroring generate_fq_mul (mul.rs:22-40)."""
    c_int = a_int * b_int % BN254_P
    a = h_int_to_columns(a_int, N_LIMBS)
    b = h_int_to_columns(b_int, N_LIMBS)
    c = h_int_to_columns(c_int, N_LIMBS)
    ab = h_pol_mul_wide(a, b)
    c_wide = c + [0] * (N_LIMBS - 1)
    diff = h_pol_sub(ab, c_wide)
    aux = h_generate_modulus_zero(diff)
    return c_int, aux
