"""Distributed Goldilocks NTT: four-step algorithm with all-to-all.

The SP/CP analog of this domain (SURVEY.md §2, §5 "long context"): trace
length scales as 512 * n_ops, and the NTT/LDE over the row axis is where
row-sharding forces cross-device communication.  The classic four-step
factorization N = N1*N2 turns one length-N transform into local column
transforms + twiddle + ONE all-to-all transpose + local row transforms —
the butterfly exchange rides ICI within a slice.

Data layout contract (avoids global reorder):
  input  A[N1, N2] sharded on axis 1 (columns), A[j1, j2] = x[j1*N2 + j2]
  output B[N1, N2] sharded on axis 0 (rows),   B[k1, k2] = X[k1 + k2*N1]
Equivalently: B = ntt(x).reshape(N2, N1).T.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import ntt as ntt_mod


@functools.lru_cache(maxsize=None)
def _twiddle_matrix(n1_log: int, n2_log: int, inverse: bool) -> np.ndarray:
    """omega^{j2*k1} table [N1, N2] (numpy, cached per shape)."""
    n1, n2 = 1 << n1_log, 1 << n2_log
    w = gl.primitive_root_of_unity(n1_log + n2_log)
    if inverse:
        w = gl.h_inv(w)
    # row k1: powers of w^{k1}
    out = np.empty((n1, n2), dtype=np.uint64)
    row_base = np.empty(n1, dtype=object)
    cur = 1
    for k1 in range(n1):
        row_base[k1] = cur
        cur = cur * w % gl.P
    for k1 in range(n1):
        b = int(row_base[k1])
        r = np.empty(n2, dtype=np.uint64)
        acc = 1
        for j2 in range(n2):
            r[j2] = acc
            acc = acc * b % gl.P
        out[k1] = r
    return out


def distributed_ntt(x_mat: jnp.ndarray, mesh: Mesh, axis: str = "dp"):
    """Four-step NTT over a [N1, N2] matrix (layout contract above)."""
    n1, n2 = x_mat.shape
    n1_log = n1.bit_length() - 1
    n2_log = n2.bit_length() - 1
    n_dev = mesh.shape[axis]
    assert n1 % n_dev == 0 and n2 % n_dev == 0
    tw_global = jnp.asarray(_twiddle_matrix(n1_log, n2_log, inverse=False))
    chunk = n2 // n_dev

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis),),
        out_specs=P(axis, None),
        check_rep=False,
    )
    def step(blk):
        # blk: [N1, N2/D] — local size-N1 transforms along axis 0
        b = ntt_mod.ntt(blk.T).T
        i = lax.axis_index(axis)
        zero = jnp.zeros((), i.dtype)
        tw = lax.dynamic_slice(tw_global, (zero, i * chunk), (n1, chunk))
        c = gl.mul(b, tw)
        # all-to-all transpose: [N1, N2/D] -> [N1/D, N2]
        c = lax.all_to_all(c, axis, split_axis=0, concat_axis=1, tiled=True)
        # local size-N2 transforms along the last axis
        return ntt_mod.ntt(c)

    return step(x_mat)


def single_device_reference(x_mat: jnp.ndarray) -> jnp.ndarray:
    """B = ntt(flat x).reshape(N2, N1).T — oracle for the layout contract."""
    n1, n2 = x_mat.shape
    flat = x_mat.reshape(n1 * n2)
    return ntt_mod.ntt(flat).reshape(n2, n1).T


# ---------------------------------------------------------------------------
# Natural-order mesh NTT / coset-LDE: the prover's sharded commit path
# ---------------------------------------------------------------------------
#
# The prover shards the evaluation-point (row) axis of [w, N] polynomial
# batches contiguously over the mesh.  These transforms keep that layout on
# BOTH sides (natural order in and out, last axis sharded), so they drop
# into `prove()`'s iNTT/LDE with no global reorder — the explicit
# communication schedule replaces GSPMD's auto-inserted collectives.
#
# Math (N = C·D, D = mesh size, C = N/D local; device i holds the
# contiguous block x[iC:(i+1)C], i.e. row i of the [D, C] view A):
#
#   X[k1 + D·k2] = NTT_C over j2 [ w^(j2·k1) · y[k1, j2] ],
#   y[k1, j2]    = sum_i A[i, j2] · (w^C)^(i·k1)          (DFT_D)
#
# Schedule (3 all-to-alls, each moving the full local block once):
#   a2a#1  split j2, concat i      -> [w, D(i),  C/D(j2)]  (gather the
#          device axis so the size-D DFT is LOCAL — an [D, D] matmul)
#   DFT_D  einsum over i           -> [w, D(k1), C/D(j2)]
#   a2a#2  split k1, concat j2     -> [w, C(j2)] for this device's k1
#   twiddle w^(j2·k1), local NTT_C -> X[k1 + D·k2], k2-major
#   a2a#3  split k2, concat k1     -> [w, D(k1), C/D(k2')]
#   local interleave (transpose)   -> natural block [qC : (q+1)C]
#
# Per-device bytes on the wire: 3·(8·w·C)·(D-1)/D — the communication-
# volume model in README §multi-chip quantifies this against the O(w·C·
# log N) local butterfly FLOPs.  All arithmetic is exact mod-p, so the
# result is BIT-IDENTICAL to the single-device transform by construction
# (asserted in tests/test_parallel.py).


@functools.lru_cache(maxsize=None)
def _dftD_matrix(n_log: int, d_log: int, inverse: bool) -> np.ndarray:
    """[D, D] matrix M[k1, i] = (w_N^C)^(i·k1) (= w_D^(i·k1)); inverse
    variant uses w_D^(-i·k1) with the 1/D factor folded in."""
    D = 1 << d_log
    wD = gl.primitive_root_of_unity(d_log)
    if inverse:
        wD = gl.h_inv(wD)
    scale = gl.h_inv(D) if inverse else 1
    out = np.empty((D, D), dtype=np.uint64)
    for k1 in range(D):
        acc = scale
        base = pow(wD, k1, gl.P)
        for i in range(D):
            out[k1, i] = acc
            acc = acc * base % gl.P
    return out


@functools.lru_cache(maxsize=None)
def _mid_twiddle(n_log: int, d_log: int, inverse: bool) -> np.ndarray:
    """[D, C] table T[k1, j2] = w_N^(±j2·k1) (the j2-major middle twiddle,
    row k1 = the slice device k1 needs after a2a#2)."""
    N, D = 1 << n_log, 1 << d_log
    C = N // D
    w = gl.primitive_root_of_unity(n_log)
    if inverse:
        w = gl.h_inv(w)
    out = np.empty((D, C), dtype=np.uint64)
    for k1 in range(D):
        base = pow(w, k1, gl.P)
        acc = 1
        row = np.empty(C, dtype=np.uint64)
        for j2 in range(C):
            row[j2] = acc
            acc = acc * base % gl.P
        out[k1] = row
    return out


def _mesh_ntt_local(blk, axis: str, n_log: int, d_log: int, inverse: bool,
                    local_tf):
    """Per-shard body shared by mesh_ntt / mesh_coset_lde (shapes static)."""
    w = blk.shape[0]
    D = 1 << d_log
    C = (1 << n_log) // D
    M = jnp.asarray(_dftD_matrix(n_log, d_log, inverse))
    mid = jnp.asarray(_mid_twiddle(n_log, d_log, inverse))

    # a2a#1: [w, C] -> [w, D, C/D] (device axis gathered locally)
    b = blk.reshape(w, D, C // D)
    b = lax.all_to_all(b, axis, split_axis=1, concat_axis=1, tiled=False)
    # now b[w, D(i), C/D(j2 local chunk)]

    # DFT_D over i: y[k1] = sum_i M[k1, i] b[i]  (log-depth mod-p sum)
    prod = gl.mul(b[:, None, :, :], M[None, :, :, None])  # [w, D(k1), D(i), C/D]
    m = prod.shape[2]
    while m > 1:
        half = m // 2
        prod = gl.add(prod[:, :, :half], prod[:, :, half : 2 * half])
        m = half
    y = prod[:, :, 0]  # [w, D(k1), C/D(j2)]

    # a2a#2: split k1 -> this device keeps its own k1, gathers all j2
    y = lax.all_to_all(y, axis, split_axis=1, concat_axis=2, tiled=True)
    y = y.reshape(w, C)  # [w, C(j2)] for k1 = axis_index

    k1 = lax.axis_index(axis)
    tw = lax.dynamic_slice(mid, (k1 * 1, jnp.zeros((), k1.dtype)), (1, C))
    z = gl.mul(y, tw)

    # local size-C transform over j2 -> X[k1 + D*k2], k2-major
    Xk = local_tf(z)  # [w, C(k2)]

    # a2a#3: split k2 chunks -> natural contiguous block, then interleave
    Xk = Xk.reshape(w, D, C // D)  # [w, D(k2 chunk q), C/D(k2')]
    Xk = lax.all_to_all(Xk, axis, split_axis=1, concat_axis=1, tiled=False)
    # now [w, D(k1), C/D(k2')]; natural position p = k1 + D*k2'
    out = jnp.transpose(Xk, (0, 2, 1)).reshape(w, C)
    return out


def mesh_ntt(x: jnp.ndarray, mesh: Mesh, axis: str = "dp",
             inverse: bool = False) -> jnp.ndarray:
    """[w, N] natural order, last axis sharded over `axis` -> same layout
    NTT (or iNTT with the 1/N scale)."""
    w, N = x.shape
    n_log = N.bit_length() - 1
    D = mesh.shape[axis]
    d_log = D.bit_length() - 1
    assert 1 << n_log == N and 1 << d_log == D and N % (D * D) == 0

    local_tf = (lambda z: ntt_mod.intt(z)) if inverse else (lambda z: ntt_mod.ntt(z))
    # intt includes 1/C; the inverse DFT_D matrix includes 1/D -> 1/N total

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis),),
        out_specs=P(None, axis),
        check_rep=False,
    )
    def step(blk):
        return _mesh_ntt_local(blk, axis, n_log, d_log, inverse, local_tf)

    return step(x)


def mesh_intt(x: jnp.ndarray, mesh: Mesh, axis: str = "dp") -> jnp.ndarray:
    return mesh_ntt(x, mesh, axis, inverse=True)


def mesh_coset_lde_rate1(coeffs: jnp.ndarray, mesh: Mesh, axis: str = "dp",
                         shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> jnp.ndarray:
    """[w, N] coeffs (natural, last axis sharded) -> [w, 2N] coset-LDE
    values on shift·H_2N (same layout).  Even/odd output points are two
    size-N NTTs of premultiplied coeffs, interleaved — the interleave is
    LOCAL under contiguous sharding (block q of the 2N output = interleave
    of block q of each NTT), so the pad-to-2N reshard disappears."""
    w, N = coeffs.shape
    n_log = N.bit_length() - 1
    D = mesh.shape[axis]
    d_log = D.bit_length() - 1
    assert 1 << n_log == N and 1 << d_log == D and N % (D * D) == 0
    C = N // D

    pre_even = ntt_mod._coset_powers(N, shift)
    w2N = gl.primitive_root_of_unity(n_log + 1)
    pre_odd = ntt_mod._coset_powers(N, shift * w2N % gl.P)
    pre = jnp.asarray(np.stack([pre_even, pre_odd]).reshape(2, D, C))

    local_tf = lambda z: ntt_mod.ntt(z)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis),),
        out_specs=P(None, axis),
        check_rep=False,
    )
    def step(blk):
        i = lax.axis_index(axis)
        zero = jnp.zeros((), i.dtype)
        tabs = lax.dynamic_slice(pre, (zero, i, zero), (2, 1, C))
        outs = []
        for par in range(2):
            z = gl.mul(blk, tabs[par])
            outs.append(
                _mesh_ntt_local(z, axis, n_log, d_log, False, local_tf)
            )
        # interleave even/odd into the natural 2C block
        both = jnp.stack(outs, axis=-1)  # [w, C, 2]
        return both.reshape(blk.shape[0], 2 * C)

    return step(coeffs)
