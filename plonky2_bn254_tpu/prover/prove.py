"""STARK prover driver: a few large jitted device stages per proof.

Rebuild of /root/reference/src/starks/common/prover.rs:18-72 plus the
forked-starky machinery it calls (get_ctl_data, prove_with_commitment).

Structure (SURVEY.md §7 hard part (e) — avoid host/device ping-pong in
Fiat-Shamir): the prover is FIVE jitted segments separated only by host
challenger squeezes; all Fiat-Shamir challenges are passed into the
segments as traced arguments so compiled executables are reused across
proofs of the same shape:

  S1 commit(trace)                 -> coeffs/LDE/Merkle levels/cap
  S2 aux(trace, beta, gamma)       -> LogUp helpers+Z, CTL Z  -> commit
  S3 quotient(ldes, challenges)    -> alpha-combined quotient chunks -> commit
  S4 openings(coeffs, zeta)        -> f_i(zeta), f_i(zeta*g)
  S5 fri(ldes, openings, alpha)    -> reduced oracle F + fold layers + trees

Jitted executables are cached per (stark, degree, config) in _JIT_CACHE.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field import ntt, poseidon
from ..field.extension import Ext, GLExt
from ..starks.air import GL, GLRing, ConstraintConsumer
from ..starks.table import Stark
from ..utils import timing as timing_mod
from . import constraints as cons
from . import fri as fri_mod
from .challenger import Challenger
from .config import StarkConfig
from .merkle import MerkleTree, gather_paths
from .poly_batch import bit_rev_perm

_JIT_CACHE: Dict = {}


def _cached(key, factory):
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = factory()
    return _JIT_CACHE[key]


# ---------------------------------------------------------------------------
# small device helpers
# ---------------------------------------------------------------------------


def ext_scale(v: Ext, k0, k1) -> Ext:
    """Ext tensor times a (possibly traced) scalar extension value."""
    k0 = jnp.asarray(k0, jnp.uint64)
    k1 = jnp.asarray(k1, jnp.uint64)
    k1w = gl.mul_const(k1, 7)
    return Ext(
        gl.add(gl.mul(v.c0, k0), gl.mul(v.c1, k1w)),
        gl.add(gl.mul(v.c0, k1), gl.mul(v.c1, k0)),
    )


def _mod_dot(mat: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """sum_j mat[..., j] * vec[j] mod p via log-depth pairwise reduction."""
    prod = gl.mul(mat, vec)
    n = prod.shape[-1]
    while n > 1:
        half = n // 2
        prod = gl.add(prod[..., :half], prod[..., half : 2 * half])
        n = half
    return prod[..., 0]


def _ext_powers(z0, z1, n: int) -> Ext:
    """[zeta^0 .. zeta^{n-1}] by doubling concatenation (traced zeta)."""
    pows = Ext(jnp.ones((1,), jnp.uint64), jnp.zeros((1,), jnp.uint64))
    cur = Ext(jnp.asarray(z0, jnp.uint64), jnp.asarray(z1, jnp.uint64))
    while pows.c0.shape[0] < n:
        scaled = ext_scale(pows, cur.c0, cur.c1)
        pows = Ext(
            jnp.concatenate([pows.c0, scaled.c0]),
            jnp.concatenate([pows.c1, scaled.c1]),
        )
        cur = cur * cur
    return Ext(pows.c0[:n], pows.c1[:n])


def _rev_cumsum(values: jnp.ndarray) -> jnp.ndarray:
    rev = values[::-1]
    acc = jax.lax.associative_scan(gl.add, rev)
    return acc[::-1]


def _tree_levels(leaves: jnp.ndarray, cap_height: int, use_pallas: bool = False):
    """[N, L] leaves -> list of digest levels (one fused jit per shape)."""
    from .merkle import device_tree_levels

    return device_tree_levels(leaves, cap_height, use_pallas)


@functools.lru_cache(maxsize=None)
def _domain_arrays(n_log: int, rate_bits: int):
    """(xs, inv_z_h, z_last, l_first, l_last) on the LDE coset (constants).

    Computed EAGERLY on device once per shape and cached: inlining these
    batch-inverse chains into a jitted consumer triggers the XLA-CPU
    scalarization pathology (see _make_aux note)."""
    n = 1 << n_log
    big_n_log = n_log + rate_bits
    N = 1 << big_n_log
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    g_big_pows = jnp.asarray(
        ntt._coset_powers(N, gl.primitive_root_of_unity(big_n_log))
    )
    xs = gl.mul_const(g_big_pows, shift)
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
    inv_z_h = gl.batch_inv(z_h)
    g = gl.primitive_root_of_unity(n_log)
    g_last = pow(g, n - 1, gl.P)
    z_last = gl.sub(xs, jnp.uint64(g_last))
    n_inv = gl.h_inv(n)
    l_first = gl.mul(z_h, gl.batch_inv(gl.mul_const(gl.sub(xs, one), n)))
    l_last = gl.mul(gl.mul_const(z_h, g_last * n_inv % gl.P), gl.batch_inv(z_last))
    return xs, inv_z_h, z_last, l_first, l_last


# ---------------------------------------------------------------------------
# jitted stages
# ---------------------------------------------------------------------------


def _intt_maybe_pallas(values, use_pallas: bool):
    from ..field import ntt_pallas

    if use_pallas and ntt_pallas.supports(values.shape):
        return ntt_pallas.intt(values)
    return ntt.intt(values)


@functools.lru_cache(maxsize=None)
def _coset_premul(n: int, shift: int):
    return ntt._coset_powers(n, shift)


def _lde_maybe_pallas(coeffs, rate_bits: int, use_pallas: bool):
    from ..field import ntt_pallas

    n = coeffs.shape[-1]
    big_shape = coeffs.shape[:-1] + (n << rate_bits,)
    if use_pallas and rate_bits == 1 and ntt_pallas.supports(big_shape):
        # coset premultiply + zero pad fused into the stage-A kernel
        return ntt_pallas.coset_lde_rate1(coeffs)
    return ntt.coset_lde_from_coeffs(coeffs, rate_bits)


def _make_commit(rate_bits: int, cap_height: int, use_pallas: bool = False,
                 mesh_fns=None):
    # NOT fused into one jit: XLA's algebraic simplifier loops pathologically
    # on the large fused graph; the component kernels (intt / coset_lde /
    # hash / per-level compress) are each jitted and cached individually.
    # `mesh_fns`: optional (intt_fn, lde_fn) pair — the EXPLICIT all-to-all
    # four-step transforms (parallel/ntt.py) used when the prover runs on a
    # 1-D mesh, replacing GSPMD's auto-inserted collectives with a known
    # communication schedule (bit-identical: exact mod-p arithmetic).
    def commit(values, tt=None):
        sync = (lambda x: jax.block_until_ready(x)) if (
            tt is not None and tt.enabled
        ) else (lambda x: x)
        tt = timing_mod.get(tt)
        with tt.scope("intt"):
            if mesh_fns is not None:
                coeffs = sync(mesh_fns[0](values))
            else:
                coeffs = sync(_intt_maybe_pallas(values, use_pallas))
        with tt.scope("lde"):
            if mesh_fns is not None:
                lde = sync(mesh_fns[1](coeffs))
            else:
                lde = sync(_lde_maybe_pallas(coeffs, rate_bits, use_pallas))
        n_big = lde.shape[-1]
        perm = jnp.asarray(bit_rev_perm(n_big.bit_length() - 1))
        with tt.scope("merkle"):
            leaves = _gather_t(lde, perm)
            levels = sync(_tree_levels(leaves, cap_height, use_pallas))
        return coeffs, lde, levels

    return commit


@jax.jit
def _gather_t(lde, perm):
    return lde[:, perm].T


@jax.jit
def _gather_t_rows(lde, idx):
    return lde[:, idx].T


def _make_commit_coeffs(rate_bits: int, cap_height: int, use_pallas: bool = False,
                        mesh_fns=None):
    def commit(coeffs):
        if mesh_fns is not None:
            lde = mesh_fns[1](coeffs)
        else:
            lde = _lde_maybe_pallas(coeffs, rate_bits, use_pallas)
        n_big = lde.shape[-1]
        perm = jnp.asarray(bit_rev_perm(n_big.bit_length() - 1))
        leaves = _gather_t(lde, perm)
        levels = _tree_levels(leaves, cap_height, use_pallas)
        return lde, levels

    return commit


def _tree_reduce0(arr):
    """mod-p sum over axis 0 via log-depth halving."""
    while arr.shape[0] > 1:
        m = arr.shape[0]
        if m % 2 == 1:
            arr = jnp.concatenate(
                [gl.add(arr[:1], arr[m - 1 :]), arr[1 : m - 1]], axis=0
            )
            m -= 1
        half = m // 2
        arr = gl.add(arr[:half], arr[half:])
    return arr[0]


# The aux pipeline is a PYTHON composition of small jitted stages, NOT one
# fused jit: this environment's XLA CPU scalarizes fusions that chain the
# u64-emulated combine producers into the deep Fermat-inverse chain
# (~5.5 ms/element — a 6700x slowdown, measured; a jit-executable boundary
# between them restores vectorized codegen).  The extra dispatches are
# negligible on TPU (same data movement, ~20 launches per proof).


@jax.jit
def _aux_combine_keyed(trace_cols, idx_c, val_c, beta, gamma):
    """gamma + key + beta*value for every (key, value) pair column."""
    return gl.add(
        gl.add(trace_cols[idx_c], gl.mul(trace_cols[val_c], beta)), gamma
    )


@jax.jit
def _aux_gather_add(trace_cols, col_idx, gamma):
    return gl.add(trace_cols[col_idx], gamma)


@jax.jit
def _aux_filter_cols(trace_cols, filt_idx):
    """filter columns per pair; -1 = unfiltered (constant 1)."""
    return jnp.where(
        (filt_idx >= 0)[:, None],
        trace_cols[jnp.maximum(filt_idx, 0)],
        jnp.uint64(1),
    )


@jax.jit
def _aux_mul(a, b):
    return gl.mul(a, b)


@jax.jit
def _aux_helpers(inv_cols):
    even = inv_cols[0::2]
    odd = inv_cols[1::2]
    if odd.shape[0] < even.shape[0]:
        odd = jnp.concatenate([odd, jnp.zeros_like(even[:1])], axis=0)
    return gl.add(even, odd)


@jax.jit
def _aux_z(helpers, table_inv, freq):
    h_sum = _tree_reduce0(helpers)
    contribution = gl.sub(h_sum, gl.mul(freq, table_inv))
    return _rev_cumsum(contribution)[None]


@jax.jit
def _aux_ctl_acc(trace_cols, col_idx, weights, gamma):
    weighted = gl.mul(trace_cols[col_idx], weights[:, None])
    return gl.add(_tree_reduce0(weighted), gamma)


@jax.jit
def _aux_ctl_z(filt, inv_acc):
    return _rev_cumsum(gl.mul(filt, inv_acc))[None]


def _make_aux(stark: Stark):
    """Aux-column pipeline: helper pairing via strided slices, CTL
    combination via host-precomputed per-column weight vectors, composed
    from the small jitted stages above (see the fusion-pathology note)."""
    from ..starks.table import KeyedLookup

    lookup_col_idx = []
    for lk in stark.lookups:
        if isinstance(lk, KeyedLookup):
            filters = getattr(lk, "filters", None)
            filt_idx = None
            if filters is not None:
                # -1 marks unfiltered pairs (multiplied by constant 1)
                filt_idx = jnp.asarray(
                    np.array(
                        [f if f is not None else -1 for f in filters],
                        dtype=np.int64,
                    )
                )
            lookup_col_idx.append(
                (
                    jnp.asarray(np.array([i for i, _ in lk.pairs], dtype=np.int64)),
                    jnp.asarray(np.array([v for _, v in lk.pairs], dtype=np.int64)),
                    filt_idx,
                )
            )
        else:
            lookup_col_idx.append(
                jnp.asarray(np.array(lk.columns, dtype=np.int64))
            )
    table_pair_idx = [
        jnp.asarray(
            np.array(
                [lk.table_key_col, lk.table_val_col]
                if isinstance(lk, KeyedLookup)
                else [lk.table_col],
                dtype=np.int64,
            )
        )
        for lk in stark.lookups
    ]
    freq_idx = [
        jnp.asarray(np.array([lk.freq_col], dtype=np.int64))
        for lk in stark.lookups
    ]
    ctl_filter_idx = [
        jnp.asarray(np.array([ctl.filter_col], dtype=np.int64))
        for ctl in stark.ctls
    ]

    def aux_core(trace_cols, betas, gammas, ctl_weight_specs):
        """betas/gammas: [num_challenges]; ctl_weight_specs: list (per
        challenge) of lists (per ctl) of (col_idx [k], weights [k]) arrays."""
        aux = []
        for i in range(len(ctl_weight_specs)):
            gamma_c = gammas[i]
            beta_c = betas[i]
            for li, lk in enumerate(stark.lookups):
                filt_idx = None
                if isinstance(lk, KeyedLookup):
                    idx_c, val_c, filt_idx = lookup_col_idx[li]
                    cols = _aux_combine_keyed(
                        trace_cols, idx_c, val_c, beta_c, gamma_c
                    )
                    table_raw = _aux_combine_keyed(
                        trace_cols,
                        table_pair_idx[li][0:1],
                        table_pair_idx[li][1:2],
                        beta_c,
                        gamma_c,
                    )
                else:
                    cols = _aux_gather_add(
                        trace_cols, lookup_col_idx[li], gamma_c
                    )
                    table_raw = _aux_gather_add(
                        trace_cols, table_pair_idx[li], gamma_c
                    )
                inv_cols = gl.batch_inv(cols)
                if filt_idx is not None:
                    # helper terms become filter/(gamma+entry); -1 = unfiltered
                    inv_cols = _aux_mul(
                        inv_cols, _aux_filter_cols(trace_cols, filt_idx)
                    )
                helpers = _aux_helpers(inv_cols)
                table_inv = gl.batch_inv(table_raw)[0]
                freq = trace_cols[freq_idx[li]][0]
                aux.append(helpers)
                aux.append(_aux_z(helpers, table_inv, freq))
            for c_idx, ctl in enumerate(stark.ctls):
                col_idx, weights = ctl_weight_specs[i][c_idx]
                acc = _aux_ctl_acc(trace_cols, col_idx, weights, gamma_c)
                filt = trace_cols[ctl_filter_idx[c_idx]][0]
                aux.append(_aux_ctl_z(filt, gl.batch_inv(acc)))
        return jnp.concatenate(aux, axis=0)

    return aux_core


def _make_quotient(stark: Stark, n_log: int, config: StarkConfig):
    """Quotient evaluation in LDE-point chunks.

    One chunk executable is compiled and reused across the domain — both
    the graph and (critically) its buffers stay small enough for the
    remote TPU compiler's memory cap.  The final Z_H division / iNTT /
    degree split runs in a second small jit over the assembled accs.
    """
    n = 1 << n_log
    rate = config.rate_bits
    N = n << rate
    step = 1 << rate
    n_chunks = max(1, N // (1 << 14))
    C = N // n_chunks
    shift_inv_pows_np = ntt._coset_powers(
        N, gl.h_inv(gl.MULTIPLICATIVE_GROUP_GENERATOR)
    )
    # CTL column index lists are challenge-independent: keep them STATIC in
    # the closure (only the beta-dependent weights are traced arguments).
    ctl_static_cols = tuple(
        tuple(c for c, _ in ctl.flat_weights(1, gl.P)) for ctl in stark.ctls
    )

    @jax.jit
    def chunk_eval(t_loc, t_nxt, a_loc, a_nxt, zl, lf, ll,
                   alphas, alpha_pows, betas, gammas, totals,
                   ctl_weight_specs):
        ring = GLRing((C,))
        local = [GL(t_loc[j]) for j in range(t_loc.shape[0])]
        next_ = [GL(t_nxt[j]) for j in range(t_nxt.shape[0])]
        aux_local = [GL(a_loc[j]) for j in range(a_loc.shape[0])]
        aux_next = [GL(a_nxt[j]) for j in range(a_nxt.shape[0])]
        consumer = ConstraintConsumer(
            ring,
            [ring.const(alphas[i]) for i in range(alphas.shape[0])],
            GL(zl),
            GL(lf),
            GL(ll),
            alpha_pows=alpha_pows,
        )
        challenges = [(betas[i], gammas[i]) for i in range(betas.shape[0])]
        ctl_totals = [
            [totals[i, c] for c in range(totals.shape[1])]
            for i in range(totals.shape[0])
        ]
        cons.eval_all_constraints(
            consumer, ring, stark, local, next_, aux_local, aux_next,
            challenges, ctl_totals,
            ctl_weight_specs=(ctl_static_cols, ctl_weight_specs),
        )
        return jnp.stack([acc.v for acc in consumer.accs])

    @jax.jit
    def rolled(arr):
        return jnp.roll(arr, -step, axis=1)

    @jax.jit
    def finish(accs, inv_z_h):
        shift_inv_pows = jnp.asarray(shift_inv_pows_np)
        q_chunks = []
        for i in range(accs.shape[0]):
            q_vals = gl.mul(accs[i], inv_z_h)
            q_coeffs = gl.mul(ntt.intt(q_vals), shift_inv_pows)
            q_chunks.append(q_coeffs[:n])
            q_chunks.append(q_coeffs[n:])
        return jnp.stack(q_chunks)

    def quotient_core(t_lde, a_lde, alphas, alpha_pows, betas, gammas, totals,
                      ctl_weight_specs):
        xs, inv_z_h, z_last, l_first, l_last = _domain_arrays(n_log, rate)
        t_nxt = rolled(t_lde)
        a_nxt = rolled(a_lde)
        acc_parts = []
        for ci in range(n_chunks):
            sl = slice(ci * C, (ci + 1) * C)
            acc_parts.append(
                chunk_eval(
                    t_lde[:, sl], t_nxt[:, sl], a_lde[:, sl], a_nxt[:, sl],
                    z_last[sl], l_first[sl], l_last[sl],
                    alphas, alpha_pows, betas, gammas, totals,
                    ctl_weight_specs,
                )
            )
        accs = jnp.concatenate(acc_parts, axis=1)
        return finish(accs, inv_z_h)

    return quotient_core


def _make_openings(n: int):
    # powers chain and the big dot live in separate executables (XLA-CPU
    # scalarization pathology; see _make_aux note)
    @jax.jit
    def powers(z0, z1):
        p = _ext_powers(z0, z1, n)
        return p.c0, p.c1

    @jax.jit
    def dots(coeffs, p0, p1):
        return _mod_dot(coeffs, p0), _mod_dot(coeffs, p1)

    def openings_core(coeffs, z0, z1):
        p0, p1 = powers(z0, z1)
        return dots(coeffs, p0, p1)

    return openings_core


@functools.lru_cache(maxsize=None)
def _xs_np(N: int):
    big_n_log = N.bit_length() - 1
    return ntt._coset_powers(N, gl.primitive_root_of_unity(big_n_log))


def _ext_batch_inv(v: Ext) -> Ext:
    norm = gl.sub(gl.square(v.c0), gl.mul_const(gl.square(v.c1), 7))
    ninv = gl.batch_inv(norm)
    return Ext(gl.mul(v.c0, ninv), gl.mul(gl.neg(v.c1), ninv))


def _make_fri_oracle(n_polys: int, N: int):
    # Python-composed jitted stages with the inverse chains at executable
    # boundaries (same XLA-CPU scalarization pathology as _make_aux).

    @jax.jit
    def fri_S_part(lde, alpha_pows, acc0, acc1):
        """Partial S += sum_j alpha^j f_j over one LDE batch (log-depth
        reduction) — an unrolled 565-step Horner chain compiles into a
        pathologically slow XLA CPU executable, and concatenating the
        three LDE batches into one array doubles peak HBM."""
        # f_j are base-field: (alpha^j * f_j).c0 = p0_j f_j, .c1 = p1_j f_j
        t0 = gl.mul(lde, alpha_pows[:, 0:1])
        t1 = gl.mul(lde, alpha_pows[:, 1:2])

        def reduce0(arr):
            while arr.shape[0] > 1:
                m = arr.shape[0]
                if m % 2 == 1:
                    arr = jnp.concatenate(
                        [gl.add(arr[:1], arr[m - 1 :]), arr[1 : m - 1]], axis=0
                    )
                    m -= 1
                half = m // 2
                arr = gl.add(arr[:half], arr[half:])
            return arr[0]

        return gl.add(acc0, reduce0(t0)), gl.add(acc1, reduce0(t1))

    @jax.jit
    def diff_and_norm(point):
        xs = gl.mul_const(
            jnp.asarray(_xs_np(N)), gl.MULTIPLICATIVE_GROUP_GENERATOR
        )
        d = Ext(
            gl.sub(xs, point[0]),
            jnp.broadcast_to(gl.neg(point[1]), (N,)),
        )
        norm = gl.sub(gl.square(d.c0), gl.mul_const(gl.square(d.c1), 7))
        return d.c0, d.c1, norm

    @jax.jit
    def combine(S0, S1, d0, d1, ninv, s_at):
        inv_diff = Ext(gl.mul(d0, ninv), gl.mul(gl.neg(d1), ninv))
        num = Ext(gl.sub(S0, s_at[0]), gl.sub(S1, s_at[1]))
        out = num * inv_diff
        return out.c0, out.c1

    @jax.jit
    def finish(b0, b1, bg0, bg1, alpha_off):
        scaled = ext_scale(Ext(bg0, bg1), alpha_off[0], alpha_off[1])
        return gl.add(b0, scaled.c0), gl.add(b1, scaled.c1)

    def fri_oracle(lde_batches, alpha_pows, s_zeta, s_zeta_g, zeta, zeta_g, alpha_off):
        """lde_batches: list of [k_i, N] LDE batches (trace, aux, quotient);
        alpha_pows: [n_polys, 2] host-precomputed powers of the FRI alpha
        (c0, c1); other args are [2] uint64 extension pairs."""
        S0 = jnp.zeros((N,), jnp.uint64)
        S1 = jnp.zeros((N,), jnp.uint64)
        off = 0
        for lde in lde_batches:
            k = lde.shape[0]
            S0, S1 = fri_S_part(lde, alpha_pows[off : off + k], S0, S1)
            off += k
        assert off == n_polys

        def reduced(point, s_at):
            d0, d1, norm = diff_and_norm(point)
            ninv = gl.batch_inv(norm)
            return combine(S0, S1, d0, d1, ninv, s_at)

        b0, b1 = reduced(zeta, s_zeta)
        bg0, bg1 = reduced(zeta_g, s_zeta_g)
        return finish(b0, b1, bg0, bg1, alpha_off)

    return fri_oracle


# ---------------------------------------------------------------------------
# device-side Fiat-Shamir transitions (remote-chip path)
# ---------------------------------------------------------------------------
#
# On the tunnelled chip every host pull costs ~31 ms AND drains the device
# queue, so the host-challenger flow (pull each cap, absorb on host, pass
# challenges back in) serializes the prover around ~10 round trips.  These
# transitions run the SAME duplex schedule on a traced state: challenges
# never leave the device, the stages chain through the async queue, and
# the proof is pulled ONCE at the end.  Bit-identical to the host path
# (tests/test_prover_toy.py::test_device_fs_proof_matches).


def _make_fs1(stark, n_log, nc, counts_in, row_meta):
    from . import device_challenger as dcm

    @jax.jit
    def fs1(packed, cap, ctl_rows):
        ch = dcm.DeviceChallenger.unpack(packed, counts_in)
        ch.observe_element(jnp.uint64(n_log))
        ch.observe_cap(cap)
        pairs = [(ch.get_challenge(), ch.get_challenge()) for _ in range(nc)]
        betas = jnp.stack([b for b, _ in pairs])
        gammas = jnp.stack([g for _, g in pairs])
        weights = [dcm.ctl_weights_device(stark, b) for b, _ in pairs]
        totals = dcm.ctl_totals_device(ctl_rows, row_meta, betas, gammas)
        return betas, gammas, weights, totals, ch.pack()

    return fs1


def _make_fs2(nc, counts_in):
    from . import device_challenger as dcm

    @jax.jit
    def fs2(packed, cap):
        ch = dcm.DeviceChallenger.unpack(packed, counts_in)
        ch.observe_cap(cap)
        alphas = jnp.stack(ch.get_n_challenges(nc))
        apows = jnp.stack([dcm.powers_vec(alphas[i], 513) for i in range(nc)])
        return alphas, apows, ch.pack()

    return fs2


def _make_fs3(counts_in):
    from . import device_challenger as dcm

    @jax.jit
    def fs3(packed, cap):
        ch = dcm.DeviceChallenger.unpack(packed, counts_in)
        ch.observe_cap(cap)
        z0 = ch.get_challenge()
        z1 = ch.get_challenge()
        return z0, z1, ch.pack()

    return fs3


def _make_fs4(n_polys, counts_in):
    from . import device_challenger as dcm

    @jax.jit
    def fs4(packed, opens):
        """opens: list of 6 (r0 [k], r1 [k]) open batches in transcript
        order (trace_z, trace_zg, aux_z, aux_zg, q_z, q_zg)."""
        ch = dcm.DeviceChallenger.unpack(packed, counts_in)
        for r0, r1 in opens:
            flat = jnp.stack([r0, r1], axis=1).reshape(-1)
            ch.observe_flat(flat)
        fa0 = ch.get_challenge()
        fa1 = ch.get_challenge()
        apow = dcm.ext_powers_rows(fa0, fa1, n_polys + 1)

        # S = sum_i v_i alpha^i over the zeta / zeta*g opening vectors
        def horner(vals_list):
            # ext openings v, ext alpha powers a: S = sum v_i * a^i
            v0 = jnp.concatenate([r0 for r0, _ in vals_list])
            v1 = jnp.concatenate([r1 for _, r1 in vals_list])
            a0 = apow[:n_polys, 0]
            a1 = apow[:n_polys, 1]
            s0 = dcm._sum_mod(
                gl.add(gl.mul(v0, a0), gl.mul_const(gl.mul(v1, a1), 7))
            )
            s1 = dcm._sum_mod(gl.add(gl.mul(v0, a1), gl.mul(v1, a0)))
            return s0, s1

        sz = horner(opens[0::2])
        szg = horner(opens[1::2])
        alpha_off = apow[n_polys]
        return (
            jnp.stack([fa0, fa1]),
            apow[:n_polys],
            jnp.stack(sz),
            jnp.stack(szg),
            alpha_off,
            ch.pack(),
        )

    return fs4


def _prove_device_fs_impl(stark, trace_cols, ctl_values, config, tt, key,
                          commit, commit_c, aux_core, quotient_core,
                          openings_core, n_log, use_pallas):
    """prove() body with the transcript on device: no host pull until the
    single end-of-proof device_get.  Bit-identical to the host-challenger
    flow (same duplex schedule, exact mod-p arithmetic)."""
    from . import device_challenger as dcm
    from .merkle import _gather_paths_dev

    n = 1 << n_log
    rate = config.rate_bits
    N = n << rate
    nc = config.num_challenges
    n_ctls = len(stark.ctls)

    # CTL value rows to device once (the statement side of the totals)
    ctl_rows = []
    row_meta = []
    for c_idx in range(n_ctls):
        rows = ctl_values[c_idx]
        if len(rows) == 0:
            ctl_rows.append(jnp.zeros((1, 1), jnp.uint64))
            row_meta.append((0, 1))
        else:
            arr = np.array(rows, dtype=np.uint64)
            ctl_rows.append(jnp.asarray(arr))
            row_meta.append(arr.shape)
    row_meta = tuple(tuple(m) for m in row_meta)

    # ---- S1: trace commit + fs1 -----------------------------------------
    with tt.scope("trace commit"):
        t_coeffs, t_lde, t_levels = commit(trace_cols, tt)
    trace_cap_dev = t_levels[-1]

    cnt = dcm.CountingSponge()
    packed = jnp.zeros((12,), jnp.uint64)
    fs1 = _cached(
        (key, "fs1", row_meta),
        lambda: _make_fs1(stark, n_log, nc, cnt.counts(), row_meta),
    )
    betas, gammas, weights_dev, totals_dev, packed = fs1(
        packed, trace_cap_dev, ctl_rows
    )
    cnt.observe_element()
    cnt.observe_cap(1 << config.cap_height)
    cnt.get_n_challenges(2 * nc)

    ctl_static = [
        jnp.asarray(
            np.array([c for c, _ in ctl.flat_weights(1, gl.P)], dtype=np.int64)
        )
        for ctl in stark.ctls
    ]
    ctl_weight_specs = [
        [(ctl_static[c], weights_dev[i][c]) for c in range(n_ctls)]
        for i in range(nc)
    ]

    # ---- S2: aux + commit + fs2 -------------------------------------
    with tt.scope("aux"):
        aux_cols = aux_core(trace_cols, betas, gammas, ctl_weight_specs)
        a_coeffs, a_lde, a_levels = commit(aux_cols)
    del aux_cols, trace_cols  # queries read the LDEs, not the values
    aux_cap_dev = a_levels[-1]
    fs2 = _cached(
        (key, "fs2", cnt.counts()),
        lambda c=cnt.counts(): _make_fs2(nc, c),
    )
    alphas, alpha_pows, packed = fs2(packed, aux_cap_dev)
    cnt.observe_cap(1 << config.cap_height)
    cnt.get_n_challenges(nc)

    # ---- S3: quotient + commit + fs3 --------------------------------
    with tt.scope("quotient"):
        wspecs = [[w for (_, w) in per] for per in ctl_weight_specs]
        q_chunks = quotient_core(
            t_lde, a_lde, alphas, alpha_pows, betas, gammas, totals_dev, wspecs
        )
        q_lde, q_levels = commit_c(q_chunks)
    q_cap_dev = q_levels[-1]
    fs3 = _cached(
        (key, "fs3", cnt.counts()), lambda c=cnt.counts(): _make_fs3(c)
    )
    z0, z1, packed = fs3(packed, q_cap_dev)
    cnt.observe_cap(1 << config.cap_height)
    cnt.get_n_challenges(2)

    g = gl.primitive_root_of_unity(n_log)
    zg0 = gl.mul_const(z0, g)
    zg1 = gl.mul_const(z1, g)

    # ---- S4: openings + fs4 ------------------------------------------
    with tt.scope("openings"):
        opens = [
            openings_core(coeffs, a, b)
            for coeffs in (t_coeffs, a_coeffs, q_chunks)
            for (a, b) in ((z0, z1), (zg0, zg1))
        ]
    del t_coeffs, a_coeffs  # openings dispatched; only LDEs queried below
    n_polys = sum(int(r0.shape[0]) for r0, _ in opens[0::2])
    fs4 = _cached(
        (key, "fs4", cnt.counts()),
        lambda c=cnt.counts(): _make_fs4(n_polys, c),
    )
    fri_alpha2, apow_rows, s_z, s_zg, alpha_off2, packed = fs4(packed, opens)
    for r0, _ in opens:
        cnt.observe_flat(2 * int(r0.shape[0]))
    cnt.get_n_challenges(2)

    # ---- S5: FRI oracle + device-FS FRI -------------------------------
    fri_oracle = _cached((key, "fri_oracle"), lambda: _make_fri_oracle(n_polys, N))
    with tt.scope("fri oracle"):
        F0, F1 = fri_oracle(
            [t_lde, a_lde, q_lde],
            apow_rows,
            s_z,
            s_zg,
            jnp.stack([z0, z1]),
            jnp.stack([zg0, zg1]),
            alpha_off2,
        )
        F = Ext(F0, F1)

    with tt.scope("fri"):
        res = fri_mod.prove_fri_device(
            F, n_log, config, packed, cnt.counts(), use_pallas, _cached, key,
            timing=tt,
        )

    # initial-tree query gathers driven by the device indices
    with tt.scope("query extraction"):
        big_perm = jnp.asarray(bit_rev_perm(n_log + rate))
        nat_dev = big_perm[res["q_idx"]]
        init_pending = [
            (_gather_t_rows(lde, nat_dev), _gather_paths_dev(levels, res["q_idx"]))
            for lde, levels in (
                (t_lde, t_levels),
                (a_lde, a_levels),
                (q_lde, q_levels),
            )
        ]

    # ---- the ONE host pull -------------------------------------------
    with tt.scope("final pull"):
        pulled = jax.device_get(
            {
                "trace_cap": trace_cap_dev,
                "aux_cap": aux_cap_dev,
                "q_cap": q_cap_dev,
                "opens": opens,
                "fri_caps": res["caps"],
                "final": (res["final"][0], res["final"][1]),
                "nonce": res["nonce"],
                "pow_ok": res["pow_ok"],
                "q_idx": res["q_idx"],
                "init": init_pending,
                "layers": res["layer_pending"],
            }
        )
    assert bool(pulled["pow_ok"]), "device PoW check failed"

    def mk(r):
        r0, r1 = r
        return [GLExt(int(a), int(b)) for a, b in zip(r0, r1)]

    o = pulled["opens"]
    openings = Openings(
        trace_zeta=mk(o[0]),
        trace_zeta_g=mk(o[1]),
        aux_zeta=mk(o[2]),
        aux_zeta_g=mk(o[3]),
        quotient_zeta=mk(o[4]),
        quotient_zeta_g=mk(o[5]),
    )

    fc0, fc1 = pulled["final"]
    n_final = res["final"][2]
    final_coeffs = [GLExt(int(fc0[i]), int(fc1[i])) for i in range(n_final)]
    query_indices = [int(v) for v in pulled["q_idx"]]

    query_initials = [[] for _ in query_indices]
    for rows, paths in pulled["init"]:
        rows = np.asarray(rows)
        for qi in range(len(query_indices)):
            query_initials[qi].append(
                (rows[qi], [np.asarray(lvl)[qi] for lvl in paths])
            )

    fri_query_layers = []
    layer_rows = [np.asarray(rows) for rows, _ in pulled["layers"]]
    layer_paths = [[np.asarray(p) for p in paths] for _, paths in pulled["layers"]]
    for qi in range(len(query_indices)):
        layer_proofs = []
        for li, (m_log, shift, a) in enumerate(res["layers_cfg"]):
            A = 1 << a
            row = layer_rows[li][qi].reshape(A, 2)
            path = [lvl[qi] for lvl in layer_paths[li]]
            layer_proofs.append(
                fri_mod.FriLayerProof(group_values=row, path=path)
            )
        fri_query_layers.append(layer_proofs)

    return Proof(
        degree_bits=n_log,
        trace_cap=np.asarray(pulled["trace_cap"]),
        aux_cap=np.asarray(pulled["aux_cap"]),
        quotient_cap=np.asarray(pulled["q_cap"]),
        openings=openings,
        fri=fri_mod.FriProof(
            layer_caps=[np.asarray(c) for c in pulled["fri_caps"]],
            final_coeffs=final_coeffs,
            pow_nonce=int(pulled["nonce"]),
            queries=None,
        ),
        query_indices=query_indices,
        query_initials=query_initials,
        fri_query_layers=fri_query_layers,
    )


# ---------------------------------------------------------------------------
# proof container
# ---------------------------------------------------------------------------


@dataclass
class Openings:
    trace_zeta: List[GLExt]
    trace_zeta_g: List[GLExt]
    aux_zeta: List[GLExt]
    aux_zeta_g: List[GLExt]
    quotient_zeta: List[GLExt]
    quotient_zeta_g: List[GLExt]

    def all_polys_order(self):
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
    query_initials: List[List]
    fri_query_layers: List[List[fri_mod.FriLayerProof]]


# ---------------------------------------------------------------------------
# main prover
# ---------------------------------------------------------------------------


def prove(
    stark: Stark,
    trace_rows: jnp.ndarray,
    ctl_values: Dict[int, List[List[int]]],
    config: StarkConfig,
    timing: "timing_mod.TimingTree" = None,
    mesh=None,
    mesh_axis: str = "tp",
    col_axis: str = None,
    device_fs: bool = None,
) -> Proof:
    """When `mesh` is given, the evaluation-point (row) axis of the
    polynomial batch is sharded over it and every jitted stage runs SPMD —
    GSPMD inserts the ICI collectives (all-to-alls at the NTT butterfly
    transposes, permutes at the rolled next-row, gathers at the Merkle
    tree top).  Rows are the axis that grows with batch size (512·n_ops,
    min 2^16) and are always a power of two, so the shard is always even;
    this is the SP-analog sharding from SURVEY §2.  All stage arithmetic
    is exact mod-p, so the sharded proof is BIT-IDENTICAL to the
    single-device proof (asserted by
    tests/test_parallel.py::test_mesh_prove_matches_single_device)."""
    tt = timing_mod.get(timing)
    n, w = trace_rows.shape
    assert w == stark.width
    n_log = n.bit_length() - 1
    assert n == 1 << n_log
    rate = config.rate_bits
    N = n << rate
    trace_cols = jnp.asarray(trace_rows).T
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # rows (evaluation points) over mesh_axis; with a 2-D mesh the
        # polynomial/column axis additionally shards over col_axis (the
        # DCN/multi-host analog — columns are independent through
        # iNTT/LDE, so the outer axis needs no collectives until the
        # Merkle leaves regroup rows)
        ca = col_axis
        if ca is not None and w % mesh.shape[ca] != 0:
            ca = None  # replicate columns when the width doesn't divide
        trace_cols = jax.device_put(
            trace_cols, NamedSharding(mesh, P(ca, mesh_axis))
        )

    # pallas leaf hashing: single real TPU only (the CPU test mesh and the
    # XLA path stay bit-identical — the kernel computes the same sponge)
    try:
        use_pallas = mesh is None and all(
            d.platform == "tpu" for d in trace_cols.devices()
        )
    except Exception:
        use_pallas = False

    # explicit all-to-all four-step NTT on a 1-D mesh (round-4 verdict 4c):
    # the iNTT/LDE inside the commits run with a hand-scheduled collective
    # plan (3 all-to-alls, natural order preserved) instead of GSPMD's
    # auto-sharded butterflies.  2-D meshes keep the GSPMD path (the
    # column axis would need its own spec plumbing).
    mesh_fns = None
    mesh_token = None
    _explicit_ok = True
    if mesh is not None and len(mesh.shape) == 1:
        try:
            _is_cpu_mesh = all(
                d.platform == "cpu" for d in mesh.devices.flat
            )
        except Exception:
            _is_cpu_mesh = False
        if _is_cpu_mesh:
            import os as _os

            # On the forced-host CPU emulation, more device threads than
            # physical cores deadlocks the shard_map all-to-all rendezvous
            # against the shared intra-op pool once the per-shard kernels
            # get large (observed at 8 virtual shards on 4 cores with the
            # production machine).  Oversubscribed CPU meshes keep the
            # GSPMD auto-sharded path, which tolerates it (slowly).
            _explicit_ok = mesh.shape[mesh_axis] <= (_os.cpu_count() or 1)
    if (
        mesh is not None
        and col_axis is None
        and len(mesh.shape) == 1
        and rate == 1
        and n % (mesh.shape[mesh_axis] ** 2) == 0
        and mesh.shape[mesh_axis] > 1
        and _explicit_ok
    ):
        from ..parallel import ntt as pntt

        mesh_fns = (
            lambda v: pntt.mesh_intt(v, mesh, mesh_axis),
            lambda c: pntt.mesh_coset_lde_rate1(c, mesh, mesh_axis),
        )
        mesh_token = (
            tuple(mesh.shape.items()),
            mesh_axis,
            tuple(d.id for d in mesh.devices.flat),
        )

    key = (stark.name, n_log, config, use_pallas, mesh_token)
    commit = _cached(
        (key, "commit"),
        lambda: _make_commit(rate, config.cap_height, use_pallas, mesh_fns),
    )
    commit_c = _cached(
        (key, "commit_coeffs"),
        lambda: _make_commit_coeffs(rate, config.cap_height, use_pallas, mesh_fns),
    )
    # On the real chip the ~24 small aux dispatches each pay a tunnel
    # launch latency; one fused executable removes that (the CPU path
    # stays python-composed — fusing the u64 combine producers into the
    # Fermat-inverse chain triggers XLA-CPU's scalarization pathology).
    # Values are identical either way (exact mod-p integer arithmetic);
    # asserted by tests/test_prover_toy.py::test_fused_aux_matches.
    if use_pallas:
        aux_core = _cached((key, "aux_fused"), lambda: jax.jit(_make_aux(stark)))
    else:
        aux_core = _cached((key, "aux"), lambda: _make_aux(stark))
    quotient_core = _cached(
        (key, "quotient"), lambda: _make_quotient(stark, n_log, config)
    )
    openings_core = _cached((key, "open"), lambda: _make_openings(n))

    # device-side Fiat-Shamir: default ON for the real chip (each host
    # pull costs a ~31 ms tunnel round trip and drains the device queue);
    # the host-challenger flow remains for CPU/mesh runs.  Proofs are
    # bit-identical either way (test_prover_toy.py::test_device_fs_*).
    if device_fs is None:
        device_fs = use_pallas
    if device_fs:
        return _prove_device_fs_impl(
            stark, trace_cols, ctl_values, config, tt, key,
            commit, commit_c, aux_core, quotient_core, openings_core,
            n_log, use_pallas,
        )

    # ---- S1: trace commit ---------------------------------------------
    # Merkle levels STAY on device; only the cap is pulled.  Query rows
    # and sibling paths are gathered on device after the indices are known
    # (round-1 pulled the full ~1.3 GB of LDEs + every level to host,
    # which was 57s of a 75s proof).
    with tt.scope("trace commit"):
        t_coeffs, t_lde, t_levels = commit(trace_cols, tt)
        trace_cap = np.asarray(t_levels[-1])
    ch = Challenger()
    ch.observe_element(n_log)
    ch.observe_cap(trace_cap)

    challenges = [
        (ch.get_challenge(), ch.get_challenge())
        for _ in range(config.num_challenges)
    ]
    betas_np = np.array([b for b, _ in challenges], dtype=np.uint64)
    gammas_np = np.array([g for _, g in challenges], dtype=np.uint64)
    # host-precomputed per-column CTL weight vectors per (challenge, ctl)
    ctl_weight_specs = [
        [
            (
                jnp.asarray(
                    np.array([c for c, _ in ctl.flat_weights(int(b), gl.P)],
                             dtype=np.int64)
                ),
                jnp.asarray(
                    np.array([w for _, w in ctl.flat_weights(int(b), gl.P)],
                             dtype=np.uint64)
                ),
            )
            for ctl in stark.ctls
        ]
        for (b, _) in challenges
    ]

    # ---- S2: aux columns + commit -------------------------------------
    with tt.scope("aux"):
        aux_cols = aux_core(
            trace_cols, jnp.asarray(betas_np), jnp.asarray(gammas_np),
            ctl_weight_specs,
        )
        a_coeffs, a_lde, a_levels = commit(aux_cols)
        aux_cap = np.asarray(a_levels[-1])
    ch.observe_cap(aux_cap)
    del aux_cols, trace_cols  # queries read the LDEs, not the values

    ctl_totals_np = np.array(
        [
            [
                cons.ctl_total(ctl_values[c_idx], int(b), int(g))
                for c_idx in range(len(stark.ctls))
            ]
            for (b, g) in challenges
        ],
        dtype=np.uint64,
    )
    alphas = ch.get_n_challenges(config.num_challenges)

    # ---- S3: quotient --------------------------------------------------
    with tt.scope("quotient"):
        alpha_pows_np = np.array(
            [
                [pow(int(a), j, gl.P) for j in range(513)]
                for a in alphas
            ],
            dtype=np.uint64,
        )
        q_chunks = quotient_core(
            t_lde,
            a_lde,
            jnp.asarray(np.array(alphas, dtype=np.uint64)),
            jnp.asarray(alpha_pows_np),
            jnp.asarray(betas_np),
            jnp.asarray(gammas_np),
            jnp.asarray(ctl_totals_np),
            [[w for (_, w) in per_ch] for per_ch in ctl_weight_specs],
        )
        q_lde, q_levels = commit_c(q_chunks)
        quotient_cap = np.asarray(q_levels[-1])
    ch.observe_cap(quotient_cap)

    # ---- S4: openings --------------------------------------------------
    zeta = ch.get_extension_challenge()
    g = gl.primitive_root_of_unity(n_log)
    zeta_g = zeta.scalar_mul(g)

    with tt.scope("openings"):
        # dispatch all six open batches, then ONE host pull (each pull is
        # a full tunnel round trip on the remote TPU)
        pending = [
            openings_core(coeffs, jnp.uint64(z.c0), jnp.uint64(z.c1))
            for coeffs in (t_coeffs, a_coeffs, q_chunks)
            for z in (zeta, zeta_g)
        ]
        pulled = jax.device_get(pending)

        def mk(r):
            r0, r1 = r
            return [GLExt(int(a), int(b)) for a, b in zip(r0, r1)]

        openings = Openings(
            trace_zeta=mk(pulled[0]),
            trace_zeta_g=mk(pulled[1]),
            aux_zeta=mk(pulled[2]),
            aux_zeta_g=mk(pulled[3]),
            quotient_zeta=mk(pulled[4]),
            quotient_zeta_g=mk(pulled[5]),
        )
    del t_coeffs, a_coeffs  # openings done; only LDEs are queried below
    for vals, vals_g in openings.all_polys_order():
        for v in vals:
            ch.observe_extension(v)
        for v in vals_g:
            ch.observe_extension(v)

    # ---- S5: FRI -------------------------------------------------------
    fri_alpha = ch.get_extension_challenge()
    vals_zeta = openings.trace_zeta + openings.aux_zeta + openings.quotient_zeta
    vals_zeta_g = (
        openings.trace_zeta_g + openings.aux_zeta_g + openings.quotient_zeta_g
    )
    n_polys = len(vals_zeta)

    def horner(vals):
        acc = GLExt.zero()
        for v in reversed(vals):
            acc = acc * fri_alpha + v
        return acc

    S_zeta = horner(vals_zeta)
    S_zeta_g = horner(vals_zeta_g)
    alpha_off = fri_alpha.exp(n_polys)

    fri_oracle = _cached((key, "fri_oracle"), lambda: _make_fri_oracle(n_polys, N))
    pair = lambda e: jnp.asarray(np.array([e.c0, e.c1], dtype=np.uint64))
    apow = GLExt.one()
    alpha_pows_rows = []
    for _ in range(n_polys):
        alpha_pows_rows.append([apow.c0, apow.c1])
        apow = apow * fri_alpha
    with tt.scope("fri oracle"):
        F0, F1 = fri_oracle(
            [t_lde, a_lde, q_lde],
            jnp.asarray(np.array(alpha_pows_rows, dtype=np.uint64)),
            pair(S_zeta),
            pair(S_zeta_g),
            pair(zeta),
            pair(zeta_g),
            pair(alpha_off),
        )
        F = Ext(F0, F1)

    with tt.scope("fri"):
        fri_proof, query_indices, fri_query_layers = fri_mod.prove_fri(
            F, n_log, config, ch, timing=tt, use_pallas=use_pallas
        )

    # initial tree openings per query: device-side gather of the Q queried
    # rows and their sibling paths; only ~Q*(width+4*height) values land on
    # host.
    with tt.scope("query extraction"):
        from .merkle import _gather_paths_dev

        big_perm = bit_rev_perm(n_log + rate)
        idx_np = np.array(query_indices, dtype=np.int64)
        nat_np = big_perm[idx_np].astype(np.int64)
        nat_dev = jnp.asarray(nat_np)
        idx_dev = jnp.asarray(idx_np)
        # dispatch the row + sibling-path gathers for all three trees,
        # then pull everything in ONE tunnel round trip
        pending = [
            (_gather_t_rows(lde, nat_dev), _gather_paths_dev(levels, idx_dev))
            for lde, levels in (
                (t_lde, t_levels),
                (a_lde, a_levels),
                (q_lde, q_levels),
            )
        ]
        pulled = jax.device_get(pending)
        query_initials = [[] for _ in query_indices]
        for rows, paths in pulled:
            rows = np.asarray(rows)
            for qi in range(len(query_indices)):
                query_initials[qi].append(
                    (rows[qi], [np.asarray(lvl)[qi] for lvl in paths])
                )

    return Proof(
        degree_bits=n_log,
        trace_cap=trace_cap,
        aux_cap=aux_cap,
        quotient_cap=quotient_cap,
        openings=openings,
        fri=fri_mod.FriProof(
            layer_caps=fri_proof.layer_caps,
            final_coeffs=fri_proof.final_coeffs,
            pow_nonce=fri_proof.pow_nonce,
            queries=None,
        ),
        query_indices=query_indices,
        query_initials=query_initials,
        fri_query_layers=fri_query_layers,
    )
