"""STARK prover driver: commit -> aux -> quotient -> openings -> FRI.

Rebuild of /root/reference/src/starks/common/prover.rs:18-72 plus the
forked-starky machinery it calls (get_ctl_data, prove_with_commitment):
every bulk polynomial step (trace commit, LogUp/CTL running sums, quotient
evaluation on the LDE coset, FRI folds) runs as batched JAX device code;
the Fiat-Shamir challenger and query extraction run on host.

Proof shape (self-consistent with prover/verify.py):
  caps(trace, aux, quotient) -> challenges (beta_i, gamma_i) -> aux ->
  alphas -> quotient (split in 2 chunks per challenge) -> zeta ->
  openings at zeta, zeta*g -> batch-FRI on the two reduced polynomials.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field import ntt
from ..field.extension import Ext, GLExt
from ..starks.air import GL, GLRing, ConstraintConsumer
from ..starks.table import Stark
from . import constraints as cons
from . import fri as fri_mod
from .challenger import Challenger
from .config import StarkConfig
from .merkle import MerkleTree
from .poly_batch import PolynomialBatch, bit_rev_perm, from_coeffs, from_values
from ..utils import timing as timing_mod


@dataclass
class Openings:
    trace_zeta: List[GLExt]
    trace_zeta_g: List[GLExt]
    aux_zeta: List[GLExt]
    aux_zeta_g: List[GLExt]
    quotient_zeta: List[GLExt]
    quotient_zeta_g: List[GLExt]

    def all_polys_order(self):
        """Opening values in the canonical FRI batching order."""
        return (
            (self.trace_zeta, self.trace_zeta_g),
            (self.aux_zeta, self.aux_zeta_g),
            (self.quotient_zeta, self.quotient_zeta_g),
        )


@dataclass
class Proof:
    degree_bits: int
    trace_cap: np.ndarray
    aux_cap: np.ndarray
    quotient_cap: np.ndarray
    openings: Openings
    fri: fri_mod.FriProof
    query_indices: List[int]
    query_initials: List[List]  # per query: [(leaf_row, path) x 3 batches]
    fri_query_layers: List[List[fri_mod.FriLayerProof]]


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _mod_dot(mat: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """sum_j mat[..., j] * vec[j] mod p via log-depth pairwise reduction."""
    prod = gl.mul(mat, vec)
    n = prod.shape[-1]
    while n > 1:
        half = n // 2
        prod = gl.add(prod[..., :half], prod[..., half : 2 * half])
        n = half
    return prod[..., 0]


def _ext_powers(zeta: GLExt, n: int) -> Ext:
    """[zeta^0 .. zeta^{n-1}] as an Ext array, by doubling concatenation."""
    c0 = jnp.asarray(np.array([1], dtype=np.uint64))
    c1 = jnp.asarray(np.array([0], dtype=np.uint64))
    pows = Ext(c0, c1)
    cur = zeta
    while pows.c0.shape[0] < n:
        scaled = fri_mod.ext_scale_const(pows, cur)
        pows = Ext(
            jnp.concatenate([pows.c0, scaled.c0]),
            jnp.concatenate([pows.c1, scaled.c1]),
        )
        cur = cur * cur
    return Ext(pows.c0[:n], pows.c1[:n])


def eval_polys_at(coeffs: jnp.ndarray, zeta: GLExt) -> List[GLExt]:
    """Evaluate each row of coeffs [m, n] at an extension point."""
    n = coeffs.shape[-1]
    pows = _ext_powers(zeta, n)
    r0 = np.asarray(_mod_dot(coeffs, pows.c0))
    r1 = np.asarray(_mod_dot(coeffs, pows.c1))
    return [GLExt(int(a), int(b)) for a, b in zip(r0, r1)]


def _rev_cumsum(values: jnp.ndarray) -> jnp.ndarray:
    """Z[x] = sum_{y >= x} values[y]  (mod p), via associative scan."""
    rev = values[::-1]
    acc = jax.lax.associative_scan(gl.add, rev)
    return acc[::-1]


def generate_aux_columns(stark: Stark, trace_cols: jnp.ndarray, challenges):
    """[w, n] trace values -> [aux_w, n] auxiliary columns (device).

    Order must match constraints.eval_lookup_ctl_constraints.
    """
    n = trace_cols.shape[-1]
    ring = GLRing((n,))
    aux = []
    for beta, gamma in challenges:
        gamma_c = jnp.uint64(gamma)
        for lk in stark.lookups:
            n_h = cons.helper_count(lk)
            # batch-invert all (gamma + col) terms plus the table term
            cols = trace_cols[jnp.asarray(np.array(lk.columns))]
            shifted = gl.add(cols, gamma_c)  # [n_cols, n]
            inv_cols = gl.inv(shifted)
            table_inv = gl.inv(gl.add(trace_cols[lk.table_col], gamma_c))
            helpers = []
            for k in range(n_h):
                h = inv_cols[2 * k]
                if 2 * k + 1 < len(lk.columns):
                    h = gl.add(h, inv_cols[2 * k + 1])
                helpers.append(h)
                aux.append(h)
            h_sum = helpers[0]
            for h in helpers[1:]:
                h_sum = gl.add(h_sum, h)
            freq = trace_cols[lk.freq_col]
            contribution = gl.sub(h_sum, gl.mul(freq, table_inv))
            aux.append(_rev_cumsum(contribution))
        for ctl in stark.ctls:
            row_vals = [ring.wrap(trace_cols[j]) for j in range(trace_cols.shape[0])]
            combined = ctl.eval_row(row_vals, ring)
            acc = ring.const(gamma)
            b_pow = 1
            for v in combined:
                acc = acc + v.scalar_mul(b_pow)
                b_pow = b_pow * beta % gl.P
            filt = trace_cols[ctl.filter_col]
            contribution = gl.mul(filt, gl.inv(acc.v))
            aux.append(_rev_cumsum(contribution))
    return jnp.stack(aux, axis=0)


def _domain_arrays(n_log: int, rate_bits: int):
    """(xs, z_h, inv_z_h, z_last, l_first, l_last) on the LDE coset, device."""
    n = 1 << n_log
    big_n_log = n_log + rate_bits
    N = 1 << big_n_log
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    g_big_pows = jnp.asarray(
        ntt._coset_powers(N, gl.primitive_root_of_unity(big_n_log))
    )
    xs = gl.mul_const(g_big_pows, shift)
    # x^n on the coset: shift^n * (g_big^n)^k, g_big^n has order 2^rate
    g2 = pow(gl.primitive_root_of_unity(big_n_log), n, gl.P)
    shift_n = pow(shift, n, gl.P)
    xn = gl.mul_const(
        jnp.asarray(ntt._coset_powers(1 << rate_bits, g2))[
            jnp.arange(N) % (1 << rate_bits)
        ],
        shift_n,
    )
    one = jnp.uint64(1)
    z_h = gl.sub(xn, one)
    inv_z_h = gl.inv(z_h)
    g = gl.primitive_root_of_unity(n_log)
    g_last = pow(g, n - 1, gl.P)
    z_last = gl.sub(xs, jnp.uint64(g_last))
    n_inv = gl.h_inv(n)
    l_first = gl.mul(z_h, gl.inv(gl.mul_const(gl.sub(xs, one), n)))
    l_last = gl.mul(
        gl.mul_const(z_h, g_last * n_inv % gl.P), gl.inv(z_last)
    )
    return xs, z_h, inv_z_h, z_last, l_first, l_last


# ---------------------------------------------------------------------------
# main prover
# ---------------------------------------------------------------------------


def prove(
    stark: Stark,
    trace_rows: jnp.ndarray,
    ctl_values: Dict[int, List[List[int]]],
    config: StarkConfig,
    timing: "timing_mod.TimingTree" = None,
) -> Proof:
    tt = timing_mod.get(timing)
    n, w = trace_rows.shape
    assert w == stark.width
    n_log = n.bit_length() - 1
    assert n == 1 << n_log
    rate = config.rate_bits
    N = n << rate
    trace_cols = trace_rows.T  # [w, n]

    with tt.scope("trace commit"):
        trace_batch = from_values(trace_cols, rate, config.cap_height)
        jax.block_until_ready(trace_batch.lde)
    ch = Challenger()
    ch.observe_element(n_log)
    ch.observe_cap(trace_batch.cap)

    challenges = [
        (ch.get_challenge(), ch.get_challenge())
        for _ in range(config.num_challenges)
    ]

    with tt.scope("aux columns"):
        aux_cols = generate_aux_columns(stark, trace_cols, challenges)
        jax.block_until_ready(aux_cols)
    with tt.scope("aux commit"):
        aux_batch = from_values(aux_cols, rate, config.cap_height)
        jax.block_until_ready(aux_batch.lde)
    ch.observe_cap(aux_batch.cap)

    ctl_totals = [
        [
            cons.ctl_total(ctl_values[c_idx], beta, gamma)
            for c_idx in range(len(stark.ctls))
        ]
        for (beta, gamma) in challenges
    ]

    alphas = ch.get_n_challenges(config.num_challenges)

    # ---- quotient ------------------------------------------------------
    tt_q = tt.scope("quotient")
    tt_q.__enter__()
    xs, z_h, inv_z_h, z_last, l_first, l_last = _domain_arrays(n_log, rate)
    step = 1 << rate
    t_lde = trace_batch.lde
    a_lde = aux_batch.lde
    ring = GLRing((N,))
    local = [GL(t_lde[j]) for j in range(w)]
    next_ = [GL(jnp.roll(t_lde[j], -step)) for j in range(w)]
    aux_local = [GL(a_lde[j]) for j in range(a_lde.shape[0])]
    aux_next = [GL(jnp.roll(a_lde[j], -step)) for j in range(a_lde.shape[0])]
    consumer = ConstraintConsumer(
        ring,
        [ring.const(a) for a in alphas],
        GL(z_last),
        GL(l_first),
        GL(l_last),
    )
    cons.eval_all_constraints(
        consumer, ring, stark, local, next_, aux_local, aux_next, challenges, ctl_totals
    )
    # quotient chunks: Q_i = acc_i / Z_H, split into degree-n halves
    shift_inv_pows = jnp.asarray(
        ntt._coset_powers(N, gl.h_inv(gl.MULTIPLICATIVE_GROUP_GENERATOR))
    )
    q_chunks = []
    for acc in consumer.accs:
        q_vals = gl.mul(acc.v, inv_z_h)
        q_coeffs = gl.mul(ntt.intt(q_vals), shift_inv_pows)
        q_chunks.append(q_coeffs[:n])
        q_chunks.append(q_coeffs[n:])
    quotient_batch = from_coeffs(jnp.stack(q_chunks), rate, config.cap_height)
    jax.block_until_ready(quotient_batch.lde)
    tt_q.__exit__(None, None, None)
    ch.observe_cap(quotient_batch.cap)

    # ---- openings ------------------------------------------------------
    zeta = ch.get_extension_challenge()
    g = gl.primitive_root_of_unity(n_log)
    zeta_g = zeta.scalar_mul(g)
    tt_o = tt.scope("openings")
    tt_o.__enter__()
    openings = Openings(
        trace_zeta=eval_polys_at(trace_batch.coeffs, zeta),
        trace_zeta_g=eval_polys_at(trace_batch.coeffs, zeta_g),
        aux_zeta=eval_polys_at(aux_batch.coeffs, zeta),
        aux_zeta_g=eval_polys_at(aux_batch.coeffs, zeta_g),
        quotient_zeta=eval_polys_at(quotient_batch.coeffs, zeta),
        quotient_zeta_g=eval_polys_at(quotient_batch.coeffs, zeta_g),
    )
    tt_o.__exit__(None, None, None)
    for vals, vals_g in openings.all_polys_order():
        for v in vals:
            ch.observe_extension(v)
        for v in vals_g:
            ch.observe_extension(v)

    # ---- FRI -----------------------------------------------------------
    tt_f = tt.scope("fri")
    tt_f.__enter__()
    fri_alpha = ch.get_extension_challenge()
    batches = [trace_batch, aux_batch, quotient_batch]
    all_lde = jnp.concatenate([b.lde for b in batches], axis=0)  # [np, N]
    n_polys = all_lde.shape[0]
    # S(x) = sum alpha^i f_i(x)  (Horner over reversed polys)
    S = Ext.zero((N,))
    for j in range(n_polys - 1, -1, -1):
        S = fri_mod.ext_scale_const(S, fri_alpha)
        S = Ext(gl.add(S.c0, all_lde[j]), S.c1)
    vals_zeta = openings.trace_zeta + openings.aux_zeta + openings.quotient_zeta
    vals_zeta_g = (
        openings.trace_zeta_g + openings.aux_zeta_g + openings.quotient_zeta_g
    )

    def horner_scalar(vals):
        acc = GLExt.zero()
        for v in reversed(vals):
            acc = acc * fri_alpha + v
        return acc

    S_zeta = horner_scalar(vals_zeta)
    S_zeta_g = horner_scalar(vals_zeta_g)

    def reduced(point: GLExt, s_at_point: GLExt) -> Ext:
        diff = Ext(
            gl.sub(xs, jnp.uint64(point.c0)),
            jnp.full((N,), jnp.uint64((-point.c1) % gl.P)),
        )
        inv_diff = diff.inv()
        num = Ext(
            gl.sub(S.c0, jnp.uint64(s_at_point.c0)),
            gl.sub(S.c1, jnp.uint64(s_at_point.c1)),
        )
        return num * inv_diff

    B = reduced(zeta, S_zeta)
    B_g = reduced(zeta_g, S_zeta_g)
    alpha_off = fri_alpha.exp(n_polys)
    F = B + fri_mod.ext_scale_const(B_g, alpha_off)

    fri_proof, query_indices, fri_query_layers = fri_mod.prove_fri(
        F, n_log, config, ch
    )
    tt_f.__exit__(None, None, None)

    # initial tree openings per query
    big_perm = bit_rev_perm(n_log + rate)
    lde_host = [np.asarray(b.lde) for b in batches]
    query_initials = []
    for idx in query_indices:
        nat = int(big_perm[idx])
        per_batch = []
        for b, lh in zip(batches, lde_host):
            leaf_row = lh[:, nat]
            per_batch.append((leaf_row, b.tree.prove(idx)))
        query_initials.append(per_batch)

    return Proof(
        degree_bits=n_log,
        trace_cap=trace_batch.cap,
        aux_cap=aux_batch.cap,
        quotient_cap=quotient_batch.cap,
        openings=openings,
        fri=fri_proof,
        query_indices=query_indices,
        query_initials=query_initials,
        fri_query_layers=fri_query_layers,
    )
