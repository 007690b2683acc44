"""Pallas TPU kernel for the Poseidon sponge over Goldilocks.

Speed-of-light path for the Merkle leaf hashing that dominates STARK
commit time (SURVEY.md §3.3 HOT LOOP 2; the reference's rayon-parallel
`PolynomialBatch::from_values` Merkle build).  The XLA u64-emulated
Poseidon (field/poseidon.py) round-trips every intermediate tensor
through HBM; this kernel keeps the whole sponge state in VMEM/registers
and streams leaf data through the grid, so the only HBM traffic is one
read of the leaves and one write of the digests.

Arithmetic: Goldilocks (p = 2^64 - 2^32 + 1) on u32 (lo, hi) pairs —
Mosaic has no 64-bit integers.  A full 64x64->128 multiply is sixteen
16x16->32 partial products with explicit carries; the 128->64 reduction
uses 2^64 = 2^32 - 1 and 2^96 = -1 (mod p).  The MDS layer exploits the
small circulant entries (< 2^6): each output is accumulated in four
16-bit limb planes (sums < 2^26, no overflow) and recombined with one
reduction per output.

Layout: leaves [N, L] are regrouped to [G, n_chunks, 8, S=8, LANES=128]
so each sponge absorb reads a native (8, 128) u32 tile per state element;
the grid is (G, n_chunk_groups) with the 24-plane state persisted in VMEM
scratch across the sequential chunk-group steps (classic Pallas streaming
pattern), letting the next group's DMA overlap the current hash.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .poseidon_constants import (
    FULL_ROUNDS,
    MDS,
    N_ROUNDS,
    PARTIAL_ROUNDS,
    ROUND_CONSTANTS,
    SPONGE_RATE,
    WIDTH,
)

_HALF_FULL = FULL_ROUNDS // 2
_MDS_INT = [[int(x) for x in row] for row in MDS]
_RC = np.asarray(ROUND_CONSTANTS).reshape(N_ROUNDS, WIDTH)
_RC_LO = (_RC & 0xFFFFFFFF).astype(np.uint32)
_RC_HI = (_RC >> 32).astype(np.uint32)

SUB = 8  # sublanes per batch tile
LANES = 128
TILE = SUB * LANES  # leaves per grid step along the batch axis

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)
_EPS = np.uint32(0xFFFFFFFF)  # 2^32 - 1 = 2^64 - p (low word); p = (eps, 1)


def _u(x):
    return jnp.asarray(x, _U32)


def _b2u(cond):
    """bool -> u32 0/1 (Mosaic's bool->uint32 astype recurses infinitely)."""
    return jnp.where(cond, _u(1), _u(0))


# ---------------------------------------------------------------------------
# Goldilocks arithmetic on (lo, hi) u32 pairs (elementwise, any shape)
# ---------------------------------------------------------------------------


def _ge_p(lo, hi):
    """(lo, hi) >= p  <=>  hi == 2^32-1 and lo >= 1."""
    return (hi == _EPS) & (lo >= _u(1))


def _cond_sub_p(lo, hi):
    """Subtract p where >= p (value < 2^64 assumed)."""
    m = _ge_p(lo, hi)
    # p = (1, 0xFFFFFFFF): lo' = lo - 1 (lo >= 1 where m), hi' = hi - eps = 0
    return jnp.where(m, lo - _u(1), lo), jnp.where(m, jnp.zeros_like(hi), hi)


def _add64(alo, ahi, blo, bhi):
    """64-bit wrapping add; returns (lo, hi, carry_out)."""
    lo = alo + blo
    c = _b2u(lo < alo)
    hi = ahi + bhi + c
    c2 = _b2u((hi < ahi) | ((hi == ahi) & (c > 0) & (bhi == _EPS)))
    # carry-out: hi wrapped. hi = ahi + bhi + c wraps iff result < ahi, or
    # equals ahi with bhi+c = 2^32 (bhi = eps and c = 1).
    return lo, hi, c2


def gl_add(alo, ahi, blo, bhi):
    """(a + b) mod p for canonical inputs."""
    lo, hi, over = _add64(alo, ahi, blo, bhi)
    # wrapped => add 2^64 - p = eps
    lo2 = lo + (over * _EPS)
    c = _b2u(lo2 < lo)
    hi2 = hi + c
    return _cond_sub_p(lo2, hi2)


def _mul32(a, b):
    """32x32 -> 64 as (lo, hi) via 16-bit halves."""
    a0 = a & _MASK16
    a1 = a >> _u(16)
    b0 = b & _MASK16
    b1 = b >> _u(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + p10
    midc = _b2u(mid < p01)
    lo = p00 + (mid << _u(16))
    c = _b2u(lo < p00)
    hi = p11 + (mid >> _u(16)) + (midc << _u(16)) + c
    return lo, hi


def _reduce128(r0, r1, r2, r3):
    """(r3 r2 r1 r0) 32-bit words -> canonical Goldilocks residue.

    n = r3*2^96 + r2*2^64 + (r1 r0) = (r1 r0) - r3 + r2*(2^32 - 1) (mod p).
    """
    # t0 = (r1 r0) - r3, borrow-corrected by -eps (i.e. +p-2^64 ... same
    # correction as goldilocks._reduce128: on borrow subtract eps again)
    l = r0 - r3
    b = _b2u(r0 < r3)
    h = r1 - b
    b2 = _b2u((r1 == _u(0)) & (b > 0))  # borrow out of 64 bits
    # subtract eps where b2: l' = l - eps = l + 1 (mod 2^32), borrow h-1+carry
    l2 = l + b2
    c = _b2u((l2 == _u(0)) & (b2 > 0))
    h2 = h - b2 + c
    # t1 = r2 * eps = (r2 << 32) - r2
    t1lo = _u(0) - r2
    t1hi = r2 - _b2u(r2 != _u(0))
    lo, hi, over = _add64(l2, h2, t1lo, t1hi)
    lo2 = lo + over * _EPS
    cc = _b2u(lo2 < lo)
    hi2 = hi + cc
    return _cond_sub_p(lo2, hi2)


def gl_mul(alo, ahi, blo, bhi):
    """(a * b) mod p, canonical output (inputs any u64)."""
    l0, h0 = _mul32(alo, blo)  # bits 0..63
    l1, h1 = _mul32(alo, bhi)  # bits 32..95
    l2, h2 = _mul32(ahi, blo)  # bits 32..95
    l3, h3 = _mul32(ahi, bhi)  # bits 64..127
    r0 = l0
    m1 = h0 + l1
    c1 = _b2u(m1 < h0)
    m2 = m1 + l2
    c2 = _b2u(m2 < m1)
    r1 = m2
    t = h1 + h2
    ct = _b2u(t < h1)
    t2 = t + l3
    ct2 = _b2u(t2 < t)
    t3 = t2 + c1 + c2
    ct3 = _b2u(t3 < t2)
    r2 = t3
    r3 = h3 + ct + ct2 + ct3  # < 2^32 (h3 <= (2^32-1)^2 >> 32 ~ 2^32-2^17)
    return _reduce128(r0, r1, r2, r3)


def _sbox(lo, hi):
    """x^7 mod p."""
    l2, h2 = gl_mul(lo, hi, lo, hi)
    l4, h4 = gl_mul(l2, h2, l2, h2)
    l6, h6 = gl_mul(l4, h4, l2, h2)
    return gl_mul(l6, h6, lo, hi)


def _mds(los, his):
    """MDS layer on 12 (lo, hi) planes via 16-bit limb-plane MACs."""
    q0 = [lo & _MASK16 for lo in los]
    q1 = [lo >> _u(16) for lo in los]
    q2 = [hi & _MASK16 for hi in his]
    q3 = [hi >> _u(16) for hi in his]
    out_lo, out_hi = [], []
    for i in range(WIDTH):
        a0 = a1 = a2 = a3 = None
        for j in range(WIDTH):
            c = _MDS_INT[i][j]
            if c == 0:
                continue
            cu = _u(c)
            t0, t1, t2, t3 = cu * q0[j], cu * q1[j], cu * q2[j], cu * q3[j]
            if a0 is None:
                a0, a1, a2, a3 = t0, t1, t2, t3
            else:
                a0, a1, a2, a3 = a0 + t0, a1 + t1, a2 + t2, a3 + t3
        # recombine acc_k * 2^(16k), acc_k < 2^26
        lo = a0 + ((a1 & _MASK16) << _u(16))
        c0 = _b2u(lo < a0)
        mid_a = a2 + (a1 >> _u(16)) + c0  # < 2^26 + 2^10 + 1, no wrap
        mid = mid_a + ((a3 & _MASK16) << _u(16))
        c1 = _b2u(mid < mid_a)
        top = (a3 >> _u(16)) + c1  # bits 64.. ; < 2^10 + 1
        rlo, rhi = _reduce128(lo, mid, top, jnp.zeros_like(top))
        out_lo.append(rlo)
        out_hi.append(rhi)
    return out_lo, out_hi


def _permute_pairs(los, his, rc_read):
    """Poseidon permutation on 12 (lo, hi) planes.

    `rc_read(r, e) -> (lo_scalar, hi_scalar)` supplies round constants
    (SMEM refs inside the kernel; numpy for the host-side tracer tests).
    Rounds are python-unrolled: 30 static bodies keep every value in
    registers (a fori_loop would force the 24-plane state into a carry).
    """
    los = list(los)
    his = list(his)

    def full_round(r, los, his):
        for e in range(WIDTH):
            clo, chi = rc_read(r, e)
            los[e], his[e] = gl_add(los[e], his[e], clo, chi)
        for e in range(WIDTH):
            los[e], his[e] = _sbox(los[e], his[e])
        return _mds(los, his)

    def partial_round(r, los, his):
        for e in range(WIDTH):
            clo, chi = rc_read(r, e)
            los[e], his[e] = gl_add(los[e], his[e], clo, chi)
        los[0], his[0] = _sbox(los[0], his[0])
        return _mds(los, his)

    r = 0
    for _ in range(_HALF_FULL):
        los, his = full_round(r, los, his)
        r += 1
    for _ in range(PARTIAL_ROUNDS):
        los, his = partial_round(r, los, his)
        r += 1
    for _ in range(_HALF_FULL):
        los, his = full_round(r, los, his)
        r += 1
    return los, his


def permute_pairs_reference(los, his):
    """XLA (non-pallas) evaluation of the pair arithmetic, for tests."""
    def rc_read(r, e):
        return _u(_RC_LO[r, e]), _u(_RC_HI[r, e])

    return _permute_pairs(los, his, rc_read)


def _permute_pairs_loops(los, his, rc_read):
    """Poseidon permutation with the round schedule under fori_loop.

    Three loops (full / partial / full) with the per-round constants read
    dynamically via `rc_read(r, e)`; the graph holds TWO round bodies
    instead of thirty.  The fully-unrolled `_permute_pairs` compiles each
    Merkle `build` executable to ~20 MB, which costs ~40 s PER SHAPE to
    compile/ship to the remote chip every process start — the loop variant
    trades a small in-kernel loop overhead for a ~10x smaller executable.

    int32 bounds/carries throughout: under x64 mode python-int loop bounds
    trace as i64, which Mosaic cannot legalize back to i32.
    """

    def add_rc(r, los, his):
        out_l, out_h = [], []
        for e in range(WIDTH):
            clo, chi = rc_read(r, e)
            l, h = gl_add(los[e], his[e], clo, chi)
            out_l.append(l)
            out_h.append(h)
        return out_l, out_h

    def full_body(r, carry):
        los, his = list(carry[0]), list(carry[1])
        los, his = add_rc(r, los, his)
        for e in range(WIDTH):
            los[e], his[e] = _sbox(los[e], his[e])
        los, his = _mds(los, his)
        return (tuple(los), tuple(his))

    def partial_body(r, carry):
        los, his = list(carry[0]), list(carry[1])
        los, his = add_rc(r, los, his)
        los[0], his[0] = _sbox(los[0], his[0])
        los, his = _mds(los, his)
        return (tuple(los), tuple(his))

    carry = (tuple(los), tuple(his))
    carry = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(_HALF_FULL), full_body, carry
    )
    carry = jax.lax.fori_loop(
        jnp.int32(_HALF_FULL),
        jnp.int32(_HALF_FULL + PARTIAL_ROUNDS),
        partial_body,
        carry,
    )
    carry = jax.lax.fori_loop(
        jnp.int32(_HALF_FULL + PARTIAL_ROUNDS),
        jnp.int32(N_ROUNDS),
        full_body,
        carry,
    )
    return list(carry[0]), list(carry[1])


def permute_pairs_loops_reference(los, his):
    """XLA (non-pallas) evaluation of the looped variant, for tests."""
    rc_lo = jnp.asarray(_RC_LO)
    rc_hi = jnp.asarray(_RC_HI)

    def rc_read(r, e):
        return rc_lo[r, e], rc_hi[r, e]

    return _permute_pairs_loops(los, his, rc_read)


# ---------------------------------------------------------------------------
# leaf-hash kernel
# ---------------------------------------------------------------------------


def _make_leaf_kernel(n_chunks: int, cg: int):
    from jax.experimental import pallas as pl

    n_cg = -(-n_chunks // cg)

    def kernel(rc_lo_ref, rc_hi_ref, leaf_lo_ref, leaf_hi_ref,
               out_lo_ref, out_hi_ref, st_ref):
        gcg = pl.program_id(1)

        def rc_read(r, e):
            return rc_lo_ref[r, e], rc_hi_ref[r, e]

        @pl.when(gcg == 0)
        def _():
            st_ref[...] = jnp.zeros_like(st_ref)

        los = tuple(st_ref[e] for e in range(WIDTH))
        his = tuple(st_ref[WIDTH + e] for e in range(WIDTH))

        def chunk_body(cc, carry):
            los, his = list(carry[0]), list(carry[1])
            prev = (tuple(los), tuple(his))
            # pl.ds keeps the index int32 (plain indexing promotes to int64
            # under x64 mode, which Mosaic cannot lower back to i32)
            for e in range(SPONGE_RATE):
                los[e] = leaf_lo_ref[0, pl.ds(cc, 1), e][0]
                his[e] = leaf_hi_ref[0, pl.ds(cc, 1), e][0]
            los, his = _permute_pairs_loops(los, his, rc_read)
            valid = gcg * cg + cc < n_chunks
            new = (tuple(los), tuple(his))
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(valid, a, b), new, prev
            )

        # int32 bounds: python-int bounds make the induction var int64
        # under x64 mode, which Mosaic cannot lower back to i32
        los, his = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(cg), chunk_body, (los, his)
        )
        for e in range(WIDTH):
            st_ref[e] = los[e]
            st_ref[WIDTH + e] = his[e]

        @pl.when(gcg == n_cg - 1)
        def _():
            for e in range(4):
                out_lo_ref[0, e] = los[e]
                out_hi_ref[0, e] = his[e]

    return kernel, n_cg


@functools.lru_cache(maxsize=None)
def _leaf_hash_fn(n: int, width: int):
    """[N, width] u64 leaves -> [N, 4] u64 digests (pallas, jitted)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n % TILE == 0 and n >= TILE
    G = n // TILE
    n_chunks = -(-width // SPONGE_RATE)
    cg = min(n_chunks, 12)
    kernel, n_cg = _make_leaf_kernel(n_chunks, cg)
    pad_cols = n_cg * cg * SPONGE_RATE - width

    @jax.jit
    def hash_leaves(leaves):
        # [N, W] u64 -> [G, n_cg*cg, 8, SUB, LANES] u32 x2
        if pad_cols:
            leaves = jnp.pad(leaves, ((0, 0), (0, pad_cols)))
        lo = (leaves & jnp.uint64(0xFFFFFFFF)).astype(_U32)
        hi = (leaves >> jnp.uint64(32)).astype(_U32)

        def regroup(x):
            x = x.reshape(G, SUB, LANES, n_cg * cg, SPONGE_RATE)
            return x.transpose(0, 3, 4, 1, 2)

        lo = regroup(lo)
        hi = regroup(hi)
        out_shape = (
            jax.ShapeDtypeStruct((G, 4, SUB, LANES), _U32),
            jax.ShapeDtypeStruct((G, 4, SUB, LANES), _U32),
        )
        blk = (1, cg, SPONGE_RATE, SUB, LANES)
        out_blk = (1, 4, SUB, LANES)
        # index maps use int32 constants: python-int block indices trace as
        # i64 under x64 mode and Mosaic cannot legalize the index func
        z = np.int32(0)
        d_lo, d_hi = pl.pallas_call(
            kernel,
            grid=(G, n_cg),
            in_specs=[
                pl.BlockSpec((N_ROUNDS, WIDTH), lambda g, c: (z, z),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((N_ROUNDS, WIDTH), lambda g, c: (z, z),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(blk, lambda g, c: (g, c, z, z, z)),
                pl.BlockSpec(blk, lambda g, c: (g, c, z, z, z)),
            ],
            out_specs=(
                pl.BlockSpec(out_blk, lambda g, c: (g, z, z, z)),
                pl.BlockSpec(out_blk, lambda g, c: (g, z, z, z)),
            ),
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((2 * WIDTH, SUB, LANES), _U32)],
        )(jnp.asarray(_RC_LO), jnp.asarray(_RC_HI), lo, hi)
        # [G, 4, SUB, LANES] -> [N, 4] u64
        d_lo = d_lo.transpose(0, 2, 3, 1).reshape(n, 4)
        d_hi = d_hi.transpose(0, 2, 3, 1).reshape(n, 4)
        return d_lo.astype(jnp.uint64) | (d_hi.astype(jnp.uint64) << jnp.uint64(32))

    return hash_leaves


def supports(n: int) -> bool:
    """Shape eligibility for the pallas leaf-hash path."""
    return n >= TILE and n % TILE == 0


# ---------------------------------------------------------------------------
# raw-permutation kernel (PoW grind and other full-state uses)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _permute_states_fn(n: int):
    """[N, 12] u64 states -> [N, 12] permuted states (pallas, jitted)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n % TILE == 0 and n >= TILE
    G = n // TILE

    def kernel(rc_lo_ref, rc_hi_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
        def rc_read(r, e):
            return rc_lo_ref[r, e], rc_hi_ref[r, e]

        los = [lo_ref[0, e] for e in range(WIDTH)]
        his = [hi_ref[0, e] for e in range(WIDTH)]
        los, his = _permute_pairs_loops(los, his, rc_read)
        for e in range(WIDTH):
            out_lo_ref[0, e] = los[e]
            out_hi_ref[0, e] = his[e]

    @jax.jit
    def permute_states(states):
        lo = (states & jnp.uint64(0xFFFFFFFF)).astype(_U32)
        hi = (states >> jnp.uint64(32)).astype(_U32)

        def regroup(x):  # [N, 12] -> [G, 12, SUB, LANES]
            return x.reshape(G, SUB, LANES, WIDTH).transpose(0, 3, 1, 2)

        lo = regroup(lo)
        hi = regroup(hi)
        z = np.int32(0)
        blk = (1, WIDTH, SUB, LANES)
        d_lo, d_hi = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((N_ROUNDS, WIDTH), lambda g: (z, z),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((N_ROUNDS, WIDTH), lambda g: (z, z),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(blk, lambda g: (g, z, z, z)),
                pl.BlockSpec(blk, lambda g: (g, z, z, z)),
            ],
            out_specs=(
                pl.BlockSpec(blk, lambda g: (g, z, z, z)),
                pl.BlockSpec(blk, lambda g: (g, z, z, z)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((G, WIDTH, SUB, LANES), _U32),
                jax.ShapeDtypeStruct((G, WIDTH, SUB, LANES), _U32),
            ),
        )(jnp.asarray(_RC_LO), jnp.asarray(_RC_HI), lo, hi)

        def degroup(x):  # [G, 12, SUB, LANES] -> [N, 12]
            return x.transpose(0, 2, 3, 1).reshape(n, WIDTH)

        d_lo = degroup(d_lo)
        d_hi = degroup(d_hi)
        return d_lo.astype(jnp.uint64) | (d_hi.astype(jnp.uint64) << jnp.uint64(32))

    return permute_states


def permute_states(states: jnp.ndarray) -> jnp.ndarray:
    """[N, 12] u64 -> [N, 12] Poseidon-permuted (pallas kernel)."""
    n, w = states.shape
    assert w == WIDTH
    return _permute_states_fn(n)(states)


def hash_leaves(leaves: jnp.ndarray) -> jnp.ndarray:
    """[N, W] u64 -> [N, 4] digests via the pallas sponge kernel."""
    n, width = leaves.shape
    return _leaf_hash_fn(n, width)(leaves)
