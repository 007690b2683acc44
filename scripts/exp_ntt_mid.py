"""Chip experiment: where do the pallas iNTT/LDE milliseconds go, and
does lax.scan unroll help the trace-gen chains?

Sections:
  1. iNTT decomposition: stage A kernel alone, the swapaxes+bitrev
     gathers alone, stage B alone.
  2. Gather alternatives: fused [:, perm_rows][:, :, perm_lanes] gather
     vs reshape-to-bits transpose chain vs take along flattened axis.
  3. G1 trace-gen chains with lax.scan unroll 1 / 2 / 4.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)
_cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache_tpu"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np


def _drain(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])


def t(fn, inputs):
    _drain(fn(inputs[0]))
    best = float("inf")
    for x in inputs[1:]:
        t0 = time.time()
        _drain(fn(x))
        best = min(best, time.time() - t0)
    return best


def main():
    from plonky2_bn254_tpu.field import goldilocks as gl
    from plonky2_bn254_tpu.field import ntt_pallas as npls
    from plonky2_bn254_tpu.field.ntt import _bit_reverse_perm

    rng = np.random.default_rng(5)
    w, n_log = 781, 16
    n1_log, n2_log = npls._dft_shape(n_log)
    N1, N2 = 1 << n1_log, 1 << n2_log
    w_pad = -(-w // 8) * 8
    xs = [
        jnp.asarray(rng.integers(0, gl.P, size=(w, 1 << n_log), dtype=np.uint64))
        for _ in range(3)
    ]

    stage_a = npls._dft_sublane_fn(w_pad, n2_log, N1, True, True, True)
    stage_b = npls._dft_sublane_fn(w_pad, n1_log, N2, True, False, False)
    rev2 = _bit_reverse_perm(n2_log)
    rev1 = _bit_reverse_perm(n1_log)
    mid_np = npls._mid_tables(n_log, n1_log, True)[rev2]
    mlo, mhi = (
        jnp.asarray((mid_np & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((mid_np >> 32).astype(np.uint32)),
    )

    @jax.jit
    def split(x):
        if w_pad != w:
            x = jnp.pad(x, ((0, w_pad - w), (0, 0)))
        lo = (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).reshape(w_pad, N2, N1)
        hi = (x >> jnp.uint64(32)).astype(jnp.uint32).reshape(w_pad, N2, N1)
        return lo, hi

    print(f"split u64->u32 planes   : {t(split, xs):.3f} s", flush=True)
    planes = [split(x) for x in xs]
    _drain(planes[-1])

    sa = lambda p: stage_a(p[0], p[1], mlo, mhi)
    print(f"stage A kernel          : {t(sa, planes):.3f} s", flush=True)
    a_out = [sa(p) for p in planes]
    _drain(a_out[-1])

    perm_rows = jnp.asarray(rev1)
    perm_lanes = jnp.asarray(rev2)

    @jax.jit
    def mid_gather(p):
        lo, hi = p
        lo = jnp.swapaxes(lo, 1, 2)[:, perm_rows][:, :, perm_lanes]
        hi = jnp.swapaxes(hi, 1, 2)[:, perm_rows][:, :, perm_lanes]
        return lo, hi

    print(f"mid swap+2 gathers      : {t(mid_gather, a_out):.3f} s", flush=True)

    # alternative: bit-reversal as reshape/transpose chain (no gather)
    def bitrev_axis(x, axis, k):
        pre, post = x.shape[:axis], x.shape[axis + 1 :]
        y = x.reshape(pre + (2,) * k + post)
        ax = (
            list(range(len(pre)))
            + list(reversed(range(len(pre), len(pre) + k)))
            + list(range(len(pre) + k, y.ndim))
        )
        return jnp.transpose(y, ax).reshape(x.shape)

    @jax.jit
    def mid_transpose(p):
        out = []
        for a in p:
            a = jnp.swapaxes(a, 1, 2)
            a = bitrev_axis(a, 1, n1_log)
            a = bitrev_axis(a, 2, n2_log)
            out.append(a)
        return tuple(out)

    print(f"mid via bit-transposes  : {t(mid_transpose, a_out):.3f} s", flush=True)
    # cross-check the two mid implementations agree
    g = mid_gather(a_out[0])
    tr = mid_transpose(a_out[0])
    np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(tr[0]))
    print("mid implementations agree", flush=True)

    m_out = [mid_gather(p) for p in a_out]
    _drain(m_out[-1])
    sb = lambda p: stage_b(p[0], p[1])
    print(f"stage B kernel          : {t(sb, m_out):.3f} s", flush=True)

    @jax.jit
    def join(p):
        lo, hi = p
        return (lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))).reshape(
            w_pad, N1 * N2
        )[:w]

    print(f"join u32->u64           : {t(join, m_out):.3f} s", flush=True)

    del planes, a_out, m_out

    # ---- trace-gen scan unroll --------------------------------------
    from plonky2_bn254_tpu.bn254 import oracle
    from plonky2_bn254_tpu.starks import g1_scalar_mul as g1m

    def mk(seed):
        r = np.random.default_rng(seed)
        return [
            (
                int(r.integers(1, 1 << 63)) << 192 | int(r.integers(0, 1 << 63)),
                oracle.random_g1(r),
                oracle.random_g1(r),
                tt,
            )
            for tt in range(128)
        ]

    sets = [mk(i) for i in range(3)]
    print(
        f"trace gen (current)     : {t(g1m.generate_trace, sets):.3f} s",
        flush=True,
    )


if __name__ == "__main__":
    main()
