"""Batch FRI: commit/fold on device, query openings, host verification.

Rebuild of the FRI stack the reference gets from its plonky2 fork
(SURVEY.md §3.3 HOT LOOP 3 tail).  The FRI oracle is an extension-field
polynomial given by its values on the LDE coset (natural order); Merkle
leaves group the 2^arity_bits sibling values (bit-reversed order makes
fold fibers contiguous).

Fold (arity A = 2^a): for fiber {x*w^t} over y = x^A with values v_t,
interpolate q = iNTT_A(v) and emit q(beta/x) = sum_j q_j beta^j x^-j.
On device this is one batched size-A iNTT + weighted sum per layer.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field import ntt
from ..field.extension import Ext, GLExt
from ..field.poseidon import h_permute
from .config import StarkConfig
from .merkle import MerkleTree, build_tree
from .poly_batch import bit_rev_perm


@dataclass
class FriLayerProof:
    group_values: np.ndarray  # [A, 2] uint64 (c0, c1 per value)
    path: List[np.ndarray]


@dataclass
class FriQueryProof:
    initial_leaves: List[np.ndarray]  # per batch: [n_polys] uint64 leaf row
    initial_paths: List[List[np.ndarray]]
    layers: List[FriLayerProof]


@dataclass
class FriProof:
    layer_caps: List[np.ndarray]
    final_coeffs: List[GLExt]
    pow_nonce: int
    queries: List[FriQueryProof]


@functools.lru_cache(maxsize=None)
def _inv_point_pows(m_log: int, a_bits: int, shift: int):
    """x_i^-j tables for one fold layer: [A, M/A] numpy uint64.

    Layer domain = shift * <g> with |.| = M = 2^m_log; fiber base points
    x_i = shift * g^i for i < M/A; entry [j, i] = x_i^-j.
    """
    M = 1 << m_log
    A = 1 << a_bits
    g = gl.primitive_root_of_unity(m_log)
    g_inv = gl.h_inv(g)
    shift_inv = gl.h_inv(shift)
    base = np.empty(M // A, dtype=np.uint64)
    cur = shift_inv
    for i in range(M // A):
        base[i] = cur
        cur = cur * g_inv % gl.P
    out = np.empty((A, M // A), dtype=np.uint64)
    out[0] = 1
    row = np.ones(M // A, dtype=object)
    for j in range(1, A):
        row = row * base.astype(object) % gl.P
        out[j] = row.astype(np.uint64)
    return out


@functools.lru_cache(maxsize=None)
def _fold_layer_fn(m_log: int, a_bits: int, shift: int):
    """Jitted fold for one layer shape; beta enters as a traced [A, 2]
    power table so the executable is reused across proofs (and so a fold
    is ONE device dispatch — eager per-op dispatch over the remote-TPU
    tunnel dominated round-2's FRI wall clock)."""
    M = 1 << m_log
    A = 1 << a_bits
    inv_pows_np = _inv_point_pows(m_log, a_bits, shift)

    @jax.jit
    def fold(v0, v1, beta_pows):
        # iNTT of size A along axis 0 (transpose to last axis)
        d0 = ntt.intt(v0.reshape(A, M // A).T).T  # [A, M/A] coefficients
        d1 = ntt.intt(v1.reshape(A, M // A).T).T
        inv_pows = jnp.asarray(inv_pows_np)
        t0 = gl.mul(d0, inv_pows)  # [A, M/A]
        t1 = gl.mul(d1, inv_pows)
        # (t0 + t1 u) * (b0 + b1 u), u^2 = 7; summed over the A axis
        b0 = beta_pows[:, 0:1]
        b1 = beta_pows[:, 1:2]
        b1w = gl.mul_const(beta_pows[:, 1:2], 7)
        acc0 = gl.add(gl.mul(t0, b0), gl.mul(t1, b1w))
        acc1 = gl.add(gl.mul(t0, b1), gl.mul(t1, b0))

        def reduce0(arr):
            while arr.shape[0] > 1:
                half = arr.shape[0] // 2
                arr = gl.add(arr[:half], arr[half:])
            return arr[0]

        return reduce0(acc0), reduce0(acc1)

    return fold


def fold_layer(values: Ext, m_log: int, a_bits: int, shift: int, beta: GLExt) -> Ext:
    """One fold: Ext values [M] natural order -> Ext values [M/A]."""
    A = 1 << a_bits
    beta_pows = np.empty((A, 2), dtype=np.uint64)
    bp = GLExt.one()
    for j in range(A):
        beta_pows[j] = (bp.c0, bp.c1)
        bp = bp * beta
    c0, c1 = _fold_layer_fn(m_log, a_bits, shift)(
        values.c0, values.c1, jnp.asarray(beta_pows)
    )
    return Ext(c0, c1)


def ext_scale_const(v: Ext, k: GLExt) -> Ext:
    """Ext tensor times a scalar GLExt constant: (v0 k0 + 7 v1 k1, v0 k1 + v1 k0)."""
    k0 = jnp.uint64(k.c0)
    k1 = jnp.uint64(k.c1)
    k1w = jnp.uint64(7 * k.c1 % gl.P)
    return Ext(
        gl.add(gl.mul(v.c0, k0), gl.mul(v.c1, k1w)),
        gl.add(gl.mul(v.c0, k1), gl.mul(v.c1, k0)),
    )


@functools.lru_cache(maxsize=None)
def _ext_leaves_fn(m_log: int, a_bits: int):
    M = 1 << m_log
    A = 1 << a_bits
    perm_np = bit_rev_perm(m_log)

    @jax.jit
    def leaves(c0, c1):
        perm = jnp.asarray(perm_np)
        l0 = c0[perm].reshape(M // A, A)
        l1 = c1[perm].reshape(M // A, A)
        return jnp.stack([l0, l1], axis=-1).reshape(M // A, 2 * A)

    return leaves


def _ext_leaves(values: Ext, m_log: int, a_bits: int) -> jnp.ndarray:
    """Bit-rev group leaves: [M/A, 2A] uint64 rows (c0,c1 interleaved)."""
    return _ext_leaves_fn(m_log, a_bits)(values.c0, values.c1)


@functools.lru_cache(maxsize=None)
def _pow_grind_fn(pow_bits: int, batch: int, use_pallas: bool = False):
    from ..field import poseidon

    @jax.jit
    def grind(state, start):
        nonces = start + jnp.arange(batch, dtype=jnp.uint64)
        states = jnp.broadcast_to(state, (batch, poseidon.WIDTH))
        states = states.at[:, 0].set(nonces)
        if use_pallas:
            from ..field import poseidon_pallas

            out = poseidon_pallas.permute_states(states)
        else:
            out = poseidon.permute(states)
        ok = out[:, 7] >> jnp.uint64(64 - pow_bits) == 0
        hit = jnp.argmax(ok)  # first True (0 if none)
        return jnp.any(ok), nonces[hit]

    return grind


def pow_grind(challenger, pow_bits: int, use_pallas: bool = False) -> int:
    """Find nonce whose challenge has pow_bits leading zero bits: one
    device dispatch hashing 2^(pow_bits+4) candidates, two scalars back
    (round-2's host loop shipped 25 MB state batches through the tunnel)."""
    state = jnp.asarray(np.array(challenger.state, dtype=np.uint64))
    batch = 1 << max(pow_bits + 4, 12)
    grind = _pow_grind_fn(pow_bits, batch, use_pallas)
    start = 0
    while True:
        found, nonce = grind(state, jnp.uint64(start))
        if bool(found):
            return int(nonce)
        start += batch


def pow_check(challenger, nonce: int, pow_bits: int) -> bool:
    c = challenger.fork()
    c.observe_element(nonce % gl.P)
    val = c.get_challenge()
    return (val >> (64 - pow_bits)) == 0


@functools.lru_cache(maxsize=None)
def _final_poly_fn(final_m_log: int, final_shift: int):
    shift_inv_pows = np.empty(1 << final_m_log, dtype=np.uint64)
    cur = 1
    sinv = gl.h_inv(final_shift)
    for i in range(1 << final_m_log):
        shift_inv_pows[i] = cur
        cur = cur * sinv % gl.P

    @jax.jit
    def final(c0_vals, c1_vals):
        sp = jnp.asarray(shift_inv_pows)
        return gl.mul(ntt.intt(c0_vals), sp), gl.mul(ntt.intt(c1_vals), sp)

    return final


def domain_shifts_and_sizes(n_log: int, config: StarkConfig):
    """[(m_log, shift)] per fold layer, and the final domain params."""
    out = []
    m_log = n_log + config.rate_bits
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    degree_bits = n_log
    while degree_bits > config.final_poly_degree_bits:
        a = min(config.arity_bits, degree_bits - config.final_poly_degree_bits)
        out.append((m_log, shift, a))
        shift = pow(shift, 1 << a, gl.P)
        m_log -= a
        degree_bits -= a
    return out, (m_log, shift, degree_bits)


def prove_fri(values: Ext, n_log: int, config: StarkConfig, challenger,
              timing=None, use_pallas: bool = False):
    """FRI prove for one ext-valued oracle on the LDE coset (natural order).

    Returns (FriProof, layer data kept for query extraction).  Layer leaves
    and Merkle levels stay on device; queries are gathered device-side.
    """
    from ..utils import timing as timing_mod
    from .merkle import device_tree_levels, gather_paths

    tt = timing_mod.get(timing)
    layers_cfg, (final_m_log, final_shift, final_deg_bits) = domain_shifts_and_sizes(
        n_log, config
    )
    layer_values = [values]
    layer_leaves = []
    layer_levels = []
    caps = []
    betas = []
    with tt.scope("fri commit/fold"):
        for m_log, shift, a in layers_cfg:
            v = layer_values[-1]
            cap_h = min(config.cap_height, m_log - a)
            leaves = _ext_leaves(v, m_log, a)
            levels = device_tree_levels(leaves, cap_h, use_pallas)
            cap = np.asarray(levels[-1])
            layer_leaves.append(leaves)
            layer_levels.append(levels)
            caps.append(cap)
            challenger.observe_cap(cap)
            beta = challenger.get_extension_challenge()
            betas.append(beta)
            layer_values.append(fold_layer(v, m_log, a, shift, beta))

    # final polynomial: coefficients of the last layer (coset iNTT)
    with tt.scope("fri final poly"):
        last = layer_values[-1]
        c0, c1 = jax.device_get(
            _final_poly_fn(final_m_log, final_shift)(last.c0, last.c1)
        )
        n_final = 1 << final_deg_bits
        final_coeffs = [GLExt(int(c0[i]), int(c1[i])) for i in range(n_final)]
    for fc in final_coeffs:
        challenger.observe_extension(fc)

    with tt.scope("fri pow"):
        nonce = pow_grind(challenger, config.proof_of_work_bits, use_pallas)
    challenger.observe_element(nonce % gl.P)
    assert (challenger.get_challenge() >> (64 - config.proof_of_work_bits)) == 0

    big_n = 1 << (n_log + config.rate_bits)
    query_indices = [
        challenger.get_challenge() % big_n for _ in range(config.num_query_rounds)
    ]

    # device-side gather of the queried groups + sibling paths: dispatch
    # every layer's gathers, then ONE host pull (per-layer pulls cost a
    # tunnel round trip each on the remote TPU)
    with tt.scope("fri query gather"):
        from .merkle import _gather_paths_dev, _gather_rows_paths_dev

        idx_np = np.array(query_indices, dtype=np.int64)
        r = idx_np
        pending = []
        for li, (m_log, shift, a) in enumerate(layers_cfg):
            groups = r >> a
            pending.append(
                _gather_rows_paths_dev(
                    layer_leaves[li],
                    layer_levels[li],
                    jnp.asarray(groups),
                    0,
                )
            )
            r = groups
        pulled = jax.device_get(pending)
        layer_rows = [np.asarray(rows) for rows, _ in pulled]
        layer_paths = [
            [np.asarray(p) for p in paths] for _, paths in pulled
        ]

        queries = []
        for qi in range(len(query_indices)):
            layer_proofs = []
            for li, (m_log, shift, a) in enumerate(layers_cfg):
                A = 1 << a
                row = layer_rows[li][qi].reshape(A, 2)
                path = [lvl[qi] for lvl in layer_paths[li]]
                layer_proofs.append(
                    FriLayerProof(group_values=row, path=path)
                )
            queries.append(layer_proofs)

    proof = FriProof(
        layer_caps=caps, final_coeffs=final_coeffs, pow_nonce=nonce, queries=None
    )
    return proof, query_indices, queries


# ---------------------------------------------------------------------------
# Device-side Fiat-Shamir FRI (remote-chip path; see prove.py fs notes)
# ---------------------------------------------------------------------------


def _make_fri_fsl(A: int, counts_in):
    """Per-layer transition: absorb cap, squeeze beta, emit beta powers."""
    from . import device_challenger as dcm

    @jax.jit
    def fsl(packed, cap):
        ch = dcm.DeviceChallenger.unpack(packed, counts_in)
        ch.observe_cap(cap)
        b0 = ch.get_challenge()
        b1 = ch.get_challenge()
        return dcm.ext_powers_rows(b0, b1, A), ch.pack()

    return fsl


def _make_fri_fsf(counts_in):
    """Final-poly absorb (c0, c1 interleaved per coefficient)."""
    from . import device_challenger as dcm

    @jax.jit
    def fsf(packed, c0, c1):
        ch = dcm.DeviceChallenger.unpack(packed, counts_in)
        ch.observe_flat(jnp.stack([c0, c1], axis=1).reshape(-1))
        return ch.pack()

    return fsf


def _make_fri_fsp(pow_bits: int, big_n: int, n_queries: int, counts_in):
    """Post-grind transition: absorb nonce, check the PoW bits, squeeze
    the query indices (mod big_n — a power of two, same as host %)."""
    from . import device_challenger as dcm

    @jax.jit
    def fsp(packed, nonce):
        ch = dcm.DeviceChallenger.unpack(packed, counts_in)
        ch.observe_element(nonce % jnp.uint64(gl.P))
        ok = (ch.get_challenge() >> jnp.uint64(64 - pow_bits)) == 0
        q = jnp.stack(
            [c % jnp.uint64(big_n) for c in ch.get_n_challenges(n_queries)]
        )
        return ok, q.astype(jnp.int64), ch.pack()

    return fsp


def pow_grind_device(state_dev, pow_bits: int, use_pallas: bool = False):
    """pow_grind on a traced sponge state: one `found` pull per batch
    (first batch hits with overwhelming probability at batch 2^(pow+4))."""
    batch = 1 << max(pow_bits + 4, 12)
    grind = _pow_grind_fn(pow_bits, batch, use_pallas)
    start = 0
    while True:
        found, nonce = grind(state_dev, jnp.uint64(start))
        if bool(found):
            return nonce  # device scalar
        start += batch


def prove_fri_device(values: Ext, n_log: int, config: StarkConfig,
                     packed, counts, use_pallas: bool, cached, key,
                     timing=None):
    """Device-FS twin of prove_fri: all transcript traffic stays on
    device; returns device handles for the single end-of-proof pull.

    Returns dict with: caps (list of [k,4] dev), final (c0, c1, n_final),
    nonce, pow_ok, q_idx, layer_pending (list of (rows, paths) dev),
    packed_end, counts_end, layers_cfg."""
    from ..prover import device_challenger as dcm
    from ..utils import timing as timing_mod
    from .merkle import _gather_rows_paths_dev, device_tree_levels

    tt = timing_mod.get(timing)
    layers_cfg, (final_m_log, final_shift, final_deg_bits) = domain_shifts_and_sizes(
        n_log, config
    )
    cnt = dcm.CountingSponge(counts)
    cur = packed
    vals = values
    caps_dev = []
    layer_leaves = []
    layer_levels = []
    with tt.scope("fri commit/fold"):
        for li, (m_log, shift, a) in enumerate(layers_cfg):
            cap_h = min(config.cap_height, m_log - a)
            leaves = _ext_leaves(vals, m_log, a)
            levels = device_tree_levels(leaves, cap_h, use_pallas)
            caps_dev.append(levels[-1])
            layer_leaves.append(leaves)
            layer_levels.append(levels)
            A = 1 << a
            cin = cnt.counts()
            fsl = cached(
                (key, "fri_fsl", li, A, cin), lambda A=A, cin=cin: _make_fri_fsl(A, cin)
            )
            beta_pows, cur = fsl(cur, caps_dev[-1])
            cnt.observe_cap(1 << cap_h)
            cnt.get_n_challenges(2)
            c0, c1 = _fold_layer_fn(m_log, a, shift)(vals.c0, vals.c1, beta_pows)
            vals = Ext(c0, c1)

    with tt.scope("fri final poly"):
        n_final = 1 << final_deg_bits
        fc0, fc1 = _final_poly_fn(final_m_log, final_shift)(vals.c0, vals.c1)
        fc0, fc1 = fc0[:n_final], fc1[:n_final]
        cin = cnt.counts()
        fsf = cached((key, "fri_fsf", cin), lambda cin=cin: _make_fri_fsf(cin))
        cur = fsf(cur, fc0, fc1)
        cnt.observe_flat(2 * n_final)

    # PoW: grind needs an empty input buffer (same assumption as the host
    # pow_grind, which reads challenger.state directly)
    assert cnt.counts()[0] == 0, "input buffer not empty at PoW"
    with tt.scope("fri pow"):
        # pack layout = state(12) | in_buf(0 here) | out_buf
        nonce = pow_grind_device(cur[:12], config.proof_of_work_bits, use_pallas)
    big_n = 1 << (n_log + config.rate_bits)
    cin = cnt.counts()
    fsp = cached(
        (key, "fri_fsp", cin),
        lambda cin=cin: _make_fri_fsp(
            config.proof_of_work_bits, big_n, config.num_query_rounds, cin
        ),
    )
    pow_ok, q_idx, cur = fsp(cur, nonce)
    cnt.observe_element()
    cnt.get_n_challenges(1 + config.num_query_rounds)

    with tt.scope("fri query gather"):
        layer_pending = []
        r = q_idx
        for li, (m_log, shift, a) in enumerate(layers_cfg):
            groups = r >> a
            layer_pending.append(
                _gather_rows_paths_dev(
                    layer_leaves[li], layer_levels[li], groups, 0
                )
            )
            r = groups

    return {
        "caps": caps_dev,
        "final": (fc0, fc1, n_final),
        "nonce": nonce,
        "pow_ok": pow_ok,
        "q_idx": q_idx,
        "layer_pending": layer_pending,
        "packed_end": cur,
        "counts_end": cnt.counts(),
        "layers_cfg": layers_cfg,
    }


# ---------------------------------------------------------------------------
# Host verification helpers
# ---------------------------------------------------------------------------


def h_fold_group(group_values, x_base: int, beta: GLExt, a_bits: int) -> GLExt:
    """Host fold of one fiber: values in bit-rev t-order at points
    x_base * w^t -> folded value at x_base^A."""
    A = 1 << a_bits
    rev = bit_rev_perm(a_bits)
    vals_nat = [None] * A
    for j in range(A):
        c0, c1 = int(group_values[j][0]), int(group_values[j][1])
        vals_nat[int(rev[j])] = GLExt(c0, c1)
    # iNTT of size A over w-powers (host)
    w_inv = gl.h_inv(gl.primitive_root_of_unity(a_bits))
    n_inv = gl.h_inv(A)
    coeffs = []
    for j in range(A):
        acc = GLExt.zero()
        wp = 1
        step = pow(w_inv, j, gl.P)
        for t in range(A):
            acc = acc + vals_nat[t].scalar_mul(wp)
            wp = wp * step % gl.P
        coeffs.append(acc.scalar_mul(n_inv))
    x_inv = gl.h_inv(x_base)
    acc = GLExt.zero()
    cur = GLExt.one()
    for j in range(A):
        acc = acc + coeffs[j] * cur
        cur = cur * beta.scalar_mul(x_inv)
    return acc


def verify_fri_query(
    proof: FriProof,
    betas,
    idx: int,
    f_at_idx: GLExt,
    n_log: int,
    config: StarkConfig,
    query: List[FriLayerProof],
) -> bool:
    """Check one query path: layer consistency down to the final poly."""
    from .merkle import MerkleTree as MT
    from ..field import poseidon

    layers_cfg, (final_m_log, final_shift, final_deg_bits) = domain_shifts_and_sizes(
        n_log, config
    )
    r = idx
    cur_val = f_at_idx
    for li, (m_log, shift, a) in enumerate(layers_cfg):
        A = 1 << a
        group = r >> a
        offset = r & (A - 1)
        lp = query[li]
        got = GLExt(int(lp.group_values[offset][0]), int(lp.group_values[offset][1]))
        if got != cur_val:
            return False
        # Merkle check
        leaf = [int(v) for pair in lp.group_values for v in pair]
        digest = poseidon.h_hash_no_pad(leaf)
        if not MT.verify(digest, group, lp.path, proof.layer_caps[li]):
            return False
        # fold
        M = 1 << m_log
        g = gl.primitive_root_of_unity(m_log)
        i_nat = int(bit_rev_perm(m_log - a)[group])
        x_base = shift * pow(g, i_nat, gl.P) % gl.P
        cur_val = h_fold_group(lp.group_values, x_base, betas[li], a)
        r = group
    # final polynomial evaluation at the final-layer point
    y_nat = int(bit_rev_perm(final_m_log)[r])
    g = gl.primitive_root_of_unity(final_m_log)
    y = final_shift * pow(g, y_nat, gl.P) % gl.P
    acc = GLExt.zero()
    for c in reversed(proof.final_coeffs):
        acc = acc.scalar_mul(y) + c
    return acc == cur_val
