"""Chip experiment: lax.scan unroll factor for the G1 chain scans.

The two 256-step Jacobian scans do tiny per-step work ([128, 16] limb
ops), so per-iteration loop overhead dominates (~0.57 s of the 2.8 s
proof).  Unrolling the scan body lets the compiler pipeline across
iterations at the cost of executable size.
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


def main():
    from plonky2_bn254_tpu.bn254 import oracle
    from plonky2_bn254_tpu.starks import g1_scalar_mul as g1m
    from plonky2_bn254_tpu.starks.limbs import h_bits_le, h_int_to_limbs

    def mk(seed):
        r = np.random.default_rng(seed)
        n = 128
        NL, NB = g1m.N_LIMBS, g1m.N_BITS
        bundle = np.zeros((n, 4 * NL + NB), dtype=np.int64)
        for i in range(n):
            s = int(r.integers(1, 1 << 63)) << 192 | int(r.integers(0, 1 << 63))
            p = oracle.random_g1(r)
            o = oracle.random_g1(r)
            bundle[i, :NL] = h_int_to_limbs(p[0])
            bundle[i, NL : 2 * NL] = h_int_to_limbs(p[1])
            bundle[i, 2 * NL : 3 * NL] = h_int_to_limbs(o[0])
            bundle[i, 3 * NL : 4 * NL] = h_int_to_limbs(o[1])
            bundle[i, 4 * NL :] = h_bits_le(s)
        dev = jnp.asarray(bundle)
        return (
            dev[:, :NL],
            dev[:, NL : 2 * NL],
            dev[:, 2 * NL : 3 * NL],
            dev[:, 3 * NL : 4 * NL],
            dev[:, 4 * NL :],
        )

    sets = [mk(i) for i in range(4)]
    for a in sets:
        _drain(a)

    ref = None
    for su in (1, 2, 4, 8):
        fn = lambda a, su=su: g1m._chains(*a, unroll=8, scan_unroll=su)
        t0 = time.time()
        out = fn(sets[0])
        _drain(out)
        cold = time.time() - t0
        best = float("inf")
        for a in sets[1:]:
            t0 = time.time()
            _drain(fn(a))
            best = min(best, time.time() - t0)
        print(f"scan_unroll={su}: warm {best:.3f} s (first {cold:.1f} s)", flush=True)
        got = np.asarray(out[0])
        if ref is None:
            ref = got
        else:
            np.testing.assert_array_equal(got, ref)
            print(f"  bit-identical to scan_unroll=1", flush=True)


if __name__ == "__main__":
    main()
