"""Pallas TPU four-step NTT over Goldilocks: the polynomial-commit hot path.

Speed-of-light path for the iNTT/coset-LDE inside trace/aux/quotient
commits (SURVEY.md §3.3 HOT LOOP 2; the reference's
`PolynomialBatch::from_values` FFT).  The XLA butterfly NTT (field/ntt.py)
round-trips the whole [W, n] batch through HBM once per stage with
u64-emulated arithmetic; this kernel runs all butterflies of each DFT half
in VMEM on u32 (lo, hi) pairs, so the batch touches HBM only a handful of
times regardless of log(n).

Decomposition (n = N1 * N2, natural order in AND out):

  x[i1 + N1*i2]  --reshape-->  A[i2][i1]            ([N2, N1], row-major)
  stage A: DIF butterflies of size N2 along the SUBLANE axis
           -> rows hold DFT_N2 in bit-reversed row order
  middle (XLA): un-bit-reverse rows, multiply by the four-step twiddle
           w_n^(+-i1*k2) (n_inv folded in for the inverse transform),
           transpose, bit-reverse rows again for the DIT input
  stage B: DIT butterflies of size N1 along the SUBLANE axis
           -> [N1(k1), N2(k2)] natural; flatten = X[k2 + N2*k1]  (natural)

Both kernels do log(N) butterfly stages on a VMEM-resident [M, L] tile
(grid = (W, n/(M*L))), with per-stage twiddle vectors in VMEM; the lane
axis never needs a shuffle.  Goldilocks arithmetic comes from
poseidon_pallas (u32 pairs; Mosaic has no 64-bit integers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl
from .poseidon_pallas import gl_add, gl_mul, _EPS, _u
from .ntt import _bit_reverse_perm

_U32 = jnp.uint32


def gl_sub(alo, ahi, blo, bhi):
    """(a - b) mod p on (lo, hi) u32 pairs, canonical inputs."""
    lo = alo - blo
    hi = ahi - bhi - (alo < blo).astype(_U32)
    # wrapped (a < b as 64-bit values): add p = 2^64 - 2^32 + 1 back, i.e.
    # lo += 1 (with carry) and hi += 0xFFFFFFFF
    wrapped = ((ahi < bhi) | ((ahi == bhi) & (alo < blo))).astype(_U32)
    lo2 = lo + wrapped
    carry = ((lo2 == 0) & (wrapped == 1)).astype(_U32)
    hi2 = hi + wrapped * _EPS + carry
    return lo2, hi2


@functools.lru_cache(maxsize=None)
def _stage_tw_tables(m_log: int, inverse: bool, dif: bool):
    """Per-stage butterfly twiddle vectors, concatenated with offsets.

    DIF stage s runs blocks of size m = 2^s for s = m_log..1; DIT runs
    s = 1..m_log.  Twiddle vector per stage: w_m^j, j in [0, m/2) (the
    same for every block).
    """
    tables = []
    offsets = {}
    off = 0
    stages = range(m_log, 0, -1) if dif else range(1, m_log + 1)
    for s in stages:
        m = 1 << s
        w = gl.primitive_root_of_unity(s)
        if inverse:
            w = pow(w, m - 1, gl.P)
        tw = np.empty(m // 2, dtype=np.uint64)
        cur = 1
        for j in range(m // 2):
            tw[j] = cur
            cur = (cur * w) % gl.P
        offsets[s] = off
        tables.append(tw)
        off += m // 2
    cat = np.concatenate(tables)
    return (
        (cat & 0xFFFFFFFF).astype(np.uint32),
        (cat >> 32).astype(np.uint32),
        offsets,
    )


def _kernel_batch(m_log: int) -> int:
    """Polynomials per grid step: the unrolled butterfly stages keep every
    stage's gl_mul temporaries live in Mosaic's stack allocator (~4.25 MB
    per batch unit at M=256, scaling with M), so B is sized to a ~40 MB
    budget under the 64 MB scoped-vmem cap.  Larger B amortizes per-step
    DMA/launch overhead (at B=1 the 781-column batch spent ~60 ms of a
    100 ms transform on grid-step overhead)."""
    M = 1 << m_log
    return max(1, 1024 // M)  # see _dft_sublane_fn for the (M, L, B) table


def _run_stages(tw_lo_ref, tw_hi_ref, lo, hi, m_log, lanes, B, dif, offsets):
    """The butterfly stage loop shared by the DFT and LDE kernels."""
    M = 1 << m_log
    stages = range(m_log, 0, -1) if dif else range(1, m_log + 1)
    for s in stages:
        m = 1 << s
        half = m // 2
        off = offsets[s]
        lo4 = lo.reshape(B, M // m, m, lanes)
        hi4 = hi.reshape(B, M // m, m, lanes)
        top_lo, bot_lo = lo4[:, :, :half], lo4[:, :, half:]
        top_hi, bot_hi = hi4[:, :, :half], hi4[:, :, half:]
        twl = tw_lo_ref[off : off + half, :].reshape(1, 1, half, 1)
        twh = tw_hi_ref[off : off + half, :].reshape(1, 1, half, 1)
        if dif:
            new_top = gl_add(top_lo, top_hi, bot_lo, bot_hi)
            d_lo, d_hi = gl_sub(top_lo, top_hi, bot_lo, bot_hi)
            new_bot = gl_mul(d_lo, d_hi, twl, twh)
        else:
            t_lo, t_hi = gl_mul(bot_lo, bot_hi, twl, twh)
            new_top = gl_add(top_lo, top_hi, t_lo, t_hi)
            new_bot = gl_sub(top_lo, top_hi, t_lo, t_hi)
        lo = jnp.concatenate([new_top[0], new_bot[0]], axis=2).reshape(B, M, lanes)
        hi = jnp.concatenate([new_top[1], new_bot[1]], axis=2).reshape(B, M, lanes)
    return lo, hi


def _make_dft_kernel(m_log: int, lanes: int, inverse: bool, dif: bool,
                     with_mid: bool, B: int):
    """Kernel: [B, M, lanes] tile -> size-M DFT along the sublane axis.

    dif=True: natural input, bit-reversed output (stage A).
    dif=False (DIT): bit-reversed input, natural output (stage B).
    with_mid: multiply the output elementwise by a [M, lanes] table block
    (the four-step middle twiddle, pre-permuted to the kernel's row
    order) — fusing it here saves two full-batch XLA passes.

    The stages are python-unrolled: a constant-geometry (Pease) fori_loop
    variant halves the vmem footprint but costs 2x wall time in sublane
    interleaves (214 ms vs 98 ms measured at [781, 2^16]).
    """
    M = 1 << m_log
    tw_lo_np, tw_hi_np, offsets = _stage_tw_tables(m_log, inverse, dif)

    def body(tw_lo_ref, tw_hi_ref, lo, hi, mid=None):
        lo, hi = _run_stages(
            tw_lo_ref, tw_hi_ref, lo, hi, m_log, lanes, B, dif, offsets
        )
        if mid is not None:
            lo, hi = gl_mul(lo, hi, mid[0][None], mid[1][None])
        return lo, hi

    if with_mid:
        def kernel(tw_lo_ref, tw_hi_ref, mid_lo_ref, mid_hi_ref,
                   lo_ref, hi_ref, out_lo_ref, out_hi_ref):
            lo, hi = body(tw_lo_ref, tw_hi_ref, lo_ref[...], hi_ref[...],
                          (mid_lo_ref[...], mid_hi_ref[...]))
            out_lo_ref[...] = lo
            out_hi_ref[...] = hi
    else:
        def kernel(tw_lo_ref, tw_hi_ref, lo_ref, hi_ref,
                   out_lo_ref, out_hi_ref):
            lo, hi = body(tw_lo_ref, tw_hi_ref, lo_ref[...], hi_ref[...])
            out_lo_ref[...] = lo
            out_hi_ref[...] = hi

    return kernel, tw_lo_np, tw_hi_np


@functools.lru_cache(maxsize=None)
def _dft_sublane_fn(w: int, m_log: int, n_lanes: int, inverse: bool,
                    dif: bool, with_mid: bool, interpret: bool = False):
    """[w, M, n_lanes] u32 plane pair -> same, size-M DFT along axis 1.

    Operates on (lo, hi) u32 planes directly (the caller splits/combines
    u64 once for the whole transform).  with_mid: also takes a [M, n_lanes]
    u32 plane pair of middle twiddles, multiplied into the output."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = 1 << m_log
    # (M, L, B) sized to keep Mosaic's unrolled-stage working set inside
    # the 64 MB scoped-vmem cap (empirical: 68 MB at M=256,L=256,B=8 and
    # 17 MB at M=512,L=128,B=1), while maximizing tile width/batch:
    L = 256 if (M <= 256 and n_lanes % 256 == 0) else 128
    assert n_lanes % L == 0, (n_lanes, L)
    B = _kernel_batch(m_log)
    kernel, tw_lo_np, tw_hi_np = _make_dft_kernel(m_log, L, inverse, dif,
                                                  with_mid, B)
    n_tw = tw_lo_np.shape[0]

    @jax.jit
    def dft(lo, hi, mid_lo=None, mid_hi=None):
        z = np.int32(0)
        assert w % B == 0, (w, B)
        blk = (B, M, L)
        tw_specs = [
            pl.BlockSpec((n_tw, 1), lambda i, j: (z, z)),
            pl.BlockSpec((n_tw, 1), lambda i, j: (z, z)),
        ]
        mid_specs = [
            pl.BlockSpec((M, L), lambda i, j: (z, j)),
            pl.BlockSpec((M, L), lambda i, j: (z, j)),
        ]
        data_specs = [
            pl.BlockSpec(blk, lambda i, j: (i, z, j)),
            pl.BlockSpec(blk, lambda i, j: (i, z, j)),
        ]
        args = [jnp.asarray(tw_lo_np)[:, None], jnp.asarray(tw_hi_np)[:, None]]
        specs = list(tw_specs)
        if with_mid:
            args += [mid_lo, mid_hi]
            specs += mid_specs
        args += [lo, hi]
        specs += data_specs
        return pl.pallas_call(
            kernel,
            grid=(w // B, n_lanes // L),
            in_specs=specs,
            out_specs=(
                pl.BlockSpec(blk, lambda i, j: (i, z, j)),
                pl.BlockSpec(blk, lambda i, j: (i, z, j)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((w, M, n_lanes), _U32),
                jax.ShapeDtypeStruct((w, M, n_lanes), _U32),
            ),
            # the python-unrolled butterfly stages keep several tile-sized
            # temporaries live; the default 16M scoped-vmem cap is a soft
            # compiler limit, not the physical VMEM size
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(*args)

    return dft


@functools.lru_cache(maxsize=None)
def _lde_stage_a_fn(w: int, m_log: int, n_lanes: int, interpret: bool = False):
    """Stage-A DIF for the rate-1 coset LDE: the input block holds only
    the LOWER M/2 rows (the upper half of the padded coefficient vector is
    zero); the kernel multiplies the coset-shift powers in, zero-extends,
    runs the butterflies, and applies the four-step middle twiddle — so
    the XLA-side premultiply and pad passes disappear."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = 1 << m_log
    L = 256 if (M <= 256 and n_lanes % 256 == 0) else 128
    assert n_lanes % L == 0
    B = _kernel_batch(m_log)
    tw_lo_np, tw_hi_np, offsets = _stage_tw_tables(m_log, False, True)
    n_tw = tw_lo_np.shape[0]

    def kernel(tw_lo_ref, tw_hi_ref, pre_lo_ref, pre_hi_ref,
               mid_lo_ref, mid_hi_ref, lo_ref, hi_ref,
               out_lo_ref, out_hi_ref):
        plo, phi = gl_mul(lo_ref[...], hi_ref[...],
                          pre_lo_ref[...][None], pre_hi_ref[...][None])
        z = jnp.zeros_like(plo)
        lo = jnp.concatenate([plo, z], axis=1)
        hi = jnp.concatenate([phi, z], axis=1)
        lo, hi = _run_stages(
            tw_lo_ref, tw_hi_ref, lo, hi, m_log, L, B, True, offsets
        )
        lo, hi = gl_mul(lo, hi, mid_lo_ref[...][None], mid_hi_ref[...][None])
        out_lo_ref[...] = lo
        out_hi_ref[...] = hi

    @jax.jit
    def lde_a(lo, hi, pre_lo, pre_hi, mid_lo, mid_hi):
        z = np.int32(0)
        assert w % B == 0
        half_blk = (B, M // 2, L)
        blk = (B, M, L)
        return pl.pallas_call(
            kernel,
            grid=(w // B, n_lanes // L),
            in_specs=[
                pl.BlockSpec((n_tw, 1), lambda i, j: (z, z)),
                pl.BlockSpec((n_tw, 1), lambda i, j: (z, z)),
                pl.BlockSpec((M // 2, L), lambda i, j: (z, j)),
                pl.BlockSpec((M // 2, L), lambda i, j: (z, j)),
                pl.BlockSpec((M, L), lambda i, j: (z, j)),
                pl.BlockSpec((M, L), lambda i, j: (z, j)),
                pl.BlockSpec(half_blk, lambda i, j: (i, z, j)),
                pl.BlockSpec(half_blk, lambda i, j: (i, z, j)),
            ],
            out_specs=(
                pl.BlockSpec(blk, lambda i, j: (i, z, j)),
                pl.BlockSpec(blk, lambda i, j: (i, z, j)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((w, M, n_lanes), _U32),
                jax.ShapeDtypeStruct((w, M, n_lanes), _U32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(jnp.asarray(tw_lo_np)[:, None], jnp.asarray(tw_hi_np)[:, None],
          pre_lo, pre_hi, mid_lo, mid_hi, lo, hi)

    return lde_a


@functools.lru_cache(maxsize=None)
def _lde_pre_table(n_log: int, n1_log: int, shift: int):
    """Coset premul table P[i2][i1] = shift^(i1 + N1*i2) for the LOWER half
    rows (i2 < N2/2) of the padded [N2, N1] view."""
    n2_log = n_log - n1_log
    N1, N2 = 1 << n1_log, 1 << n2_log
    tab = np.empty((N2 // 2, N1), dtype=np.uint64)
    row = np.empty(N1, dtype=object)
    cur = 1
    for j in range(N1):
        row[j] = cur
        cur = cur * shift % gl.P
    stepper = pow(shift, N1, gl.P)
    r = row.copy()
    for i2 in range(N2 // 2):
        tab[i2] = np.array([int(v) for v in r], dtype=np.uint64)
        r = r * stepper % gl.P
    return tab


@functools.lru_cache(maxsize=None)
def _lde_fn(w: int, n_log_big: int, shift: int, interpret: bool = False):
    """[w, n] u64 coeffs -> [w, 2n] u64 coset-LDE values (rate 1)."""
    n1_log, n2_log = _dft_shape(n_log_big)
    N1, N2 = 1 << n1_log, 1 << n2_log
    w_pad = -(-w // 8) * 8
    stage_a = _lde_stage_a_fn(w_pad, n2_log, N1, interpret)
    stage_b = _dft_sublane_fn(w_pad, n1_log, N2, False, False, False, interpret)
    rev2 = _bit_reverse_perm(n2_log)
    rev1 = _bit_reverse_perm(n1_log)
    mid_np = _mid_tables(n_log_big, n1_log, False)[rev2]
    pre_np = _lde_pre_table(n_log_big, n1_log, shift)

    def planes(tab):
        return (
            jnp.asarray((tab & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((tab >> 32).astype(np.uint32)),
        )

    @jax.jit
    def lde(x):
        if w_pad != w:
            x = jnp.pad(x, ((0, w_pad - w), (0, 0)))
        lo = (x & jnp.uint64(0xFFFFFFFF)).astype(_U32).reshape(w_pad, N2 // 2, N1)
        hi = (x >> jnp.uint64(32)).astype(_U32).reshape(w_pad, N2 // 2, N1)
        mlo, mhi = planes(mid_np)
        plo, phi = planes(pre_np)
        lo, hi = stage_a(lo, hi, plo, phi, mlo, mhi)
        perm_rows = jnp.asarray(rev1)
        perm_lanes = jnp.asarray(rev2)
        lo = jnp.swapaxes(lo, 1, 2)[:, perm_rows][:, :, perm_lanes]
        hi = jnp.swapaxes(hi, 1, 2)[:, perm_rows][:, :, perm_lanes]
        lo, hi = stage_b(lo, hi)
        z = lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))
        return z.reshape(w_pad, N1 * N2)[:w]

    return lde


def coset_lde_rate1(coeffs: jnp.ndarray, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR,
                    interpret: bool = False) -> jnp.ndarray:
    """Rate-1 coset LDE: [w, n] coeffs -> [w, 2n] values on shift*H."""
    w, n = coeffs.shape
    return _lde_fn(w, n.bit_length(), shift, interpret)(coeffs)


@functools.lru_cache(maxsize=None)
def _mid_tables(n_log: int, n1_log: int, inverse: bool):
    """Four-step middle twiddle [N2, N1]: w_n^(+-k2*i1) (n_inv folded for
    inverse), with k2 = natural row index (applied AFTER un-bit-reversing
    stage A's output rows)."""
    n2_log = n_log - n1_log
    N1, N2 = 1 << n1_log, 1 << n2_log
    w = gl.primitive_root_of_unity(n_log)
    if inverse:
        w = pow(w, (1 << n_log) - 1, gl.P)
    scale = pow(1 << n_log, gl.P - 2, gl.P) if inverse else 1
    # row-incremental construction (object-int modmuls, cached per shape)
    tab = np.empty((N2, N1), dtype=np.uint64)
    w_i1 = np.empty(N1, dtype=object)
    cur = 1
    for j in range(N1):
        w_i1[j] = cur
        cur = cur * w % gl.P
    row = np.full(N1, scale, dtype=object)  # w^(k2*i1) built incrementally
    for r in range(N2):
        tab[r] = np.array([int(v) for v in row], dtype=np.uint64)
        row = row * w_i1 % gl.P
    return tab


def _dft_shape(n_log: int):
    """Split n = N1 * N2 with N2 = stage-A (first) DFT size."""
    n1_log = n_log // 2
    n2_log = n_log - n1_log
    return n1_log, n2_log


@functools.lru_cache(maxsize=None)
def _ntt_fn(w: int, n_log: int, inverse: bool, interpret: bool = False):
    """[w, n] u64 natural order -> [w, n] u64 natural order NTT/iNTT."""
    n1_log, n2_log = _dft_shape(n_log)
    N1, N2 = 1 << n1_log, 1 << n2_log
    w_pad = -(-w // 8) * 8  # batched kernel grid wants a multiple of 8
    stage_a = _dft_sublane_fn(w_pad, n2_log, N1, inverse, True, True, interpret)
    stage_b = _dft_sublane_fn(w_pad, n1_log, N2, inverse, False, False, interpret)
    rev2 = _bit_reverse_perm(n2_log)
    rev1 = _bit_reverse_perm(n1_log)
    # middle twiddle pre-permuted to stage A's bit-reversed row order, so
    # the multiply fuses into the kernel epilogue
    mid_np = _mid_tables(n_log, n1_log, inverse)[rev2]
    mid_lo_np = (mid_np & 0xFFFFFFFF).astype(np.uint32)
    mid_hi_np = (mid_np >> 32).astype(np.uint32)

    @jax.jit
    def ntt(x):
        if w_pad != w:
            x = jnp.pad(x, ((0, w_pad - w), (0, 0)))
        lo = (x & jnp.uint64(0xFFFFFFFF)).astype(_U32).reshape(w_pad, N2, N1)
        hi = (x >> jnp.uint64(32)).astype(_U32).reshape(w_pad, N2, N1)
        # stage A (DIF, bitrev rows) + fused middle twiddle
        lo, hi = stage_a(lo, hi, jnp.asarray(mid_lo_np), jnp.asarray(mid_hi_np))
        # rows are rev2(k2); transpose and deliver DIT's bitrev input rows:
        # DIT wants in[r1] = c[rev1(r1)] along rows, any lane order k2' as
        # long as the OUTPUT lane order is tracked.  Lanes after transpose
        # are stage-A rows r = rev2(k2); undo that with ONE gather fused
        # with the rev1 row gather.
        perm_rows = jnp.asarray(rev1)
        perm_lanes = jnp.asarray(rev2)
        lo = jnp.swapaxes(lo, 1, 2)[:, perm_rows][:, :, perm_lanes]
        hi = jnp.swapaxes(hi, 1, 2)[:, perm_rows][:, :, perm_lanes]
        lo, hi = stage_b(lo, hi)  # [w_pad, N1(k1), N2(k2)] natural
        z = lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))
        return z.reshape(w_pad, N1 * N2)[:w]  # X[k2 + N2*k1] natural

    return ntt


def ntt(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Forward NTT along the last axis of [w, n] (natural in/out)."""
    w, n = x.shape
    return _ntt_fn(w, n.bit_length() - 1, False, interpret)(x)


def intt(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Inverse NTT along the last axis of [w, n] (natural in/out)."""
    w, n = x.shape
    return _ntt_fn(w, n.bit_length() - 1, True, interpret)(x)


def supports(shape) -> bool:
    """Kernel eligibility: [w, n] with n a power of two in [2^14, 2^20]
    (below: the stage lanes drop under the 128-lane tile; above: the
    stage-A tile at M = 2^11 overflows the 64 MB scoped-vmem budget)."""
    if len(shape) != 2:
        return False
    w, n = shape
    if n & (n - 1) or n < (1 << 10):
        return False
    n1_log, n2_log = _dft_shape(n.bit_length() - 1)
    return (
        (1 << n1_log) % 128 == 0
        and (1 << n2_log) % 128 == 0
        and n2_log <= 10
    )
