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
