"""Poseidon permutation + sponge over Goldilocks, vectorized in JAX.

TPU-native replacement for the plonky2 fork's `PoseidonGoldilocksConfig`
hashing used in Merkle commitments and the Fiat-Shamir challenger
(SURVEY.md L0-fork surface; reference call sites e.g.
/root/reference/src/starks/common/prover.rs, verifier.rs).

Device flavor operates on `[..., 12]` uint64 tensors, vectorizing the whole
Merkle level / leaf batch through one permutation program.  A host scalar
mirror (python ints) backs the sequential challenger and the verifier.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl
from .poseidon_constants import (
    ALPHA,
    DIGEST_LEN,
    FULL_ROUNDS,
    MDS,
    N_ROUNDS,
    PARTIAL_ROUNDS,
    ROUND_CONSTANTS,
    SPONGE_CAPACITY,
    SPONGE_RATE,
    WIDTH,
)

_HALF_FULL = FULL_ROUNDS // 2

# MDS rows as python ints (small constants)
_MDS_INT = [[int(x) for x in row] for row in MDS]
_RC = ROUND_CONSTANTS.reshape(N_ROUNDS, WIDTH)


def _sbox(x):
    x2 = gl.square(x)
    x4 = gl.square(x2)
    x6 = gl.mul(x4, x2)
    return gl.mul(x6, x)


def _mds_layer(state):
    """state: [..., 12] -> MDS @ state along the last axis.

    Entries are < 64, so c*x fits in (hi, lo) u32-split products; we
    accumulate the full 128-bit row sum before one reduction per output,
    which is cheaper than 12 modular multiplies.  Written as broadcasted
    tensor ops (not per-element lists) to keep the jit graph small.
    """
    mask32 = jnp.uint64(0xFFFFFFFF)
    m = jnp.asarray(MDS)  # [12(out), 12(in)] small uint64 entries
    x_lo = state & mask32
    x_hi = state >> jnp.uint64(32)
    # [..., out, in] products summed over the input axis; < 12*64*2^32 < 2^42
    acc_lo = jnp.sum(x_lo[..., None, :] * m, axis=-1)
    acc_hi = jnp.sum(x_hi[..., None, :] * m, axis=-1)
    lo = acc_lo + ((acc_hi & mask32) << jnp.uint64(32))
    carry = (lo < acc_lo).astype(jnp.uint64)
    hi = (acc_hi >> jnp.uint64(32)) + carry
    return gl._reduce128(hi, lo)


@jax.jit
def permute(state: jnp.ndarray) -> jnp.ndarray:
    """Poseidon permutation on `[..., 12]` uint64 tensors.

    Rounds run under fori_loop with the constant schedule indexed on the
    fly, keeping the jit graph to ~3 round bodies.
    """
    rc = jnp.asarray(_RC)

    def full_round(r, state):
        state = gl.add(state, rc[r])
        state = _sbox(state)
        return _mds_layer(state)

    def partial_round(r, state):
        state = gl.add(state, rc[r])
        s0 = _sbox(state[..., 0:1])
        state = jnp.concatenate([s0, state[..., 1:]], axis=-1)
        return _mds_layer(state)

    state = jax.lax.fori_loop(0, _HALF_FULL, full_round, state)
    state = jax.lax.fori_loop(
        _HALF_FULL, _HALF_FULL + PARTIAL_ROUNDS, partial_round, state
    )
    state = jax.lax.fori_loop(
        _HALF_FULL + PARTIAL_ROUNDS, N_ROUNDS, full_round, state
    )
    return state


@jax.jit
def hash_no_pad(inputs: jnp.ndarray) -> jnp.ndarray:
    """Sponge hash of `[..., n]` inputs -> `[..., 4]` digests.

    Overwrite-mode absorption in rate-8 chunks, zero-padded final chunk,
    zero initial capacity (fixed-length inputs, no padding scheme — the
    plonky2 `hash_n_to_m_no_pad` shape).  Chunk loop is a fori_loop so the
    graph holds ONE permutation regardless of leaf width.
    """
    n = inputs.shape[-1]
    batch = inputs.shape[:-1]
    n_chunks = -(-n // SPONGE_RATE)
    pad = n_chunks * SPONGE_RATE - n
    if pad:
        inputs = jnp.concatenate(
            [inputs, jnp.zeros(batch + (pad,), jnp.uint64)], axis=-1
        )
    chunks = inputs.reshape(batch + (n_chunks, SPONGE_RATE))

    def body(i, state):
        chunk = jax.lax.dynamic_index_in_dim(chunks, i, axis=-2, keepdims=False)
        state = jnp.concatenate([chunk, state[..., SPONGE_RATE:]], axis=-1)
        return permute(state)

    state = jnp.zeros(batch + (WIDTH,), jnp.uint64)
    state = jax.lax.fori_loop(0, n_chunks, body, state)
    return state[..., :DIGEST_LEN]


@jax.jit
def two_to_one(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Merkle node compression: two `[..., 4]` digests -> `[..., 4]`."""
    batch = left.shape[:-1]
    cap = jnp.zeros(batch + (WIDTH - 2 * DIGEST_LEN,), jnp.uint64)
    state = jnp.concatenate([left, right, cap], axis=-1)
    return permute(state)[..., :DIGEST_LEN]


# ---------------------------------------------------------------------------
# Host scalar mirror (python ints) — challenger / verifier / tests
# ---------------------------------------------------------------------------


def h_permute(state):
    """Permutation on a list of 12 python ints (native lib when available)."""
    assert len(state) == WIDTH
    from . import native

    nat = native.permute([s % gl.P for s in state])
    if nat is not None:
        return nat
    state = [s % gl.P for s in state]
    r = 0

    def full(state, r):
        state = [(s + int(_RC[r][i])) % gl.P for i, s in enumerate(state)]
        state = [pow(s, ALPHA, gl.P) for s in state]
        return _h_mds(state)

    for _ in range(_HALF_FULL):
        state = full(state, r)
        r += 1
    for _ in range(PARTIAL_ROUNDS):
        state = [(s + int(_RC[r][i])) % gl.P for i, s in enumerate(state)]
        state[0] = pow(state[0], ALPHA, gl.P)
        state = _h_mds(state)
        r += 1
    for _ in range(_HALF_FULL):
        state = full(state, r)
        r += 1
    return state


def _h_mds(state):
    return [
        sum(_MDS_INT[r][j] * state[j] for j in range(WIDTH)) % gl.P
        for r in range(WIDTH)
    ]


def h_hash_no_pad(inputs):
    """Sponge hash of a python-int list -> 4-int digest."""
    from . import native

    nat = native.hash_no_pad([int(v) % gl.P for v in inputs])
    if nat is not None:
        return nat
    state = [0] * WIDTH
    for start in range(0, len(inputs), SPONGE_RATE):
        chunk = list(inputs[start : start + SPONGE_RATE])
        chunk += [0] * (SPONGE_RATE - len(chunk))
        state = chunk + state[SPONGE_RATE:]
        state = h_permute(state)
    return state[:DIGEST_LEN]


def h_two_to_one(left, right):
    from . import native

    nat = native.two_to_one([int(v) for v in left], [int(v) for v in right])
    if nat is not None:
        return nat
    state = list(left) + list(right) + [0] * (WIDTH - 2 * DIGEST_LEN)
    return h_permute(state)[:DIGEST_LEN]
