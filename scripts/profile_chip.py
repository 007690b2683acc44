"""Per-stage microprofile of the G1 prover hot path on the real chip.

Separates what bench.py's stage scopes conflate: the `intt` scope syncs
whatever is still in flight (trace generation dispatches lazily), so its
wall time is trace-gen + transpose + iNTT.  This script syncs between
every step and feeds DISTINCT inputs per repetition (the axon runtime
memoizes identical (executable, buffer) pairs, so repeating one input
measures nothing).

Run ONLY when no other process is using the TPU tunnel.
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

REPS = 3


def _drain(r):
    """Force the device queue to drain: on the axon platform
    block_until_ready is a NO-OP (dispatches are queued async and only a
    host transfer waits), so sync by pulling one element of the result."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])


def t(fn, inputs):
    """Best wall over distinct inputs; first call (compile/warm) discarded.
    Includes one tiny host pull (subtract the `sync round trip` line)."""
    _drain(fn(inputs[0]))
    best = float("inf")
    for x in inputs[1:]:
        t0 = time.time()
        _drain(fn(x))
        best = min(best, time.time() - t0)
    return best


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    tiny = jnp.ones((8,), jnp.uint64)
    _drain(tiny)
    t0 = time.time()
    for _ in range(10):
        _drain(tiny)
    print(f"sync round trip         : {(time.time()-t0)/10*1e3:.1f} ms", flush=True)

    from plonky2_bn254_tpu.bn254 import oracle
    from plonky2_bn254_tpu.field import goldilocks as gl
    from plonky2_bn254_tpu.field import ntt, ntt_pallas
    from plonky2_bn254_tpu.prover import prove as prove_mod
    from plonky2_bn254_tpu.prover.config import DEFAULT_CONFIG
    from plonky2_bn254_tpu.prover.merkle import device_tree_levels
    from plonky2_bn254_tpu.prover.poly_batch import bit_rev_perm
    from plonky2_bn254_tpu.starks import g1_scalar_mul
    from plonky2_bn254_tpu.starks.table import g1_scalar_mul_stark

    n_ops = 128
    rng = np.random.default_rng(2024)

    def mk_inputs(seed_off):
        r = np.random.default_rng(2024 + seed_off)
        return [
            (
                int(r.integers(1, 1 << 63)) << 192 | int(r.integers(0, 1 << 63)),
                oracle.random_g1(r),
                oracle.random_g1(r),
                tt,
            )
            for tt in range(n_ops)
        ]

    input_sets = [mk_inputs(i) for i in range(REPS + 1)]
    print(
        f"trace gen [128 ops]     : {t(g1_scalar_mul.generate_trace, input_sets):.3f} s",
        flush=True,
    )
    traces = [
        jax.block_until_ready(g1_scalar_mul.generate_trace(s)) for s in input_sets
    ]

    tr_T = jax.jit(lambda x: x.T)
    print(f"transpose [n,w]->[w,n]  : {t(tr_T, traces):.3f} s", flush=True)
    cols = [jax.block_until_ready(tr_T(x)) for x in traces]

    print(f"pallas iNTT  [781,2^16] : {t(ntt_pallas.intt, cols):.3f} s", flush=True)
    print(f"XLA    iNTT  [781,2^16] : {t(ntt.intt, cols):.3f} s", flush=True)
    coeffs = [jax.block_until_ready(ntt_pallas.intt(c)) for c in cols]
    print(
        f"pallas LDE   [781,2^17] : {t(ntt_pallas.coset_lde_rate1, coeffs):.3f} s",
        flush=True,
    )
    ldes = [jax.block_until_ready(ntt_pallas.coset_lde_rate1(c)) for c in coeffs]

    n_big = ldes[0].shape[-1]
    perm = jnp.asarray(bit_rev_perm(n_big.bit_length() - 1))
    gt = lambda l: prove_mod._gather_t(l, perm)
    print(f"leaf gather+T [2^17,781]: {t(gt, ldes):.3f} s", flush=True)
    leaves = [jax.block_until_ready(gt(l)) for l in ldes]
    tree = lambda lv: device_tree_levels(lv, DEFAULT_CONFIG.cap_height, True)
    print(f"tree levels (pallas)    : {t(tree, leaves):.3f} s", flush=True)
    tree_x = lambda lv: device_tree_levels(lv, DEFAULT_CONFIG.cap_height, False)
    print(f"tree levels (XLA)       : {t(tree_x, leaves):.3f} s", flush=True)

    # aux stage (fused)
    stark = g1_scalar_mul_stark()
    aux_core = jax.jit(prove_mod._make_aux(stark))
    betas = jnp.asarray(np.array([3, 5], dtype=np.uint64))
    gammas = jnp.asarray(np.array([7, 11], dtype=np.uint64))
    specs = [
        [
            (
                jnp.asarray(
                    np.array(
                        [c for c, _ in ctl.flat_weights(b, gl.P)], dtype=np.int64
                    )
                ),
                jnp.asarray(
                    np.array(
                        [w for _, w in ctl.flat_weights(b, gl.P)], dtype=np.uint64
                    )
                ),
            )
            for ctl in stark.ctls
        ]
        for b in (3, 5)
    ]
    aux = lambda c: aux_core(c, betas, gammas, specs)
    print(f"aux (fused jit)         : {t(aux, cols):.3f} s", flush=True)
    aux_cols = [jax.block_until_ready(aux(c)) for c in cols]
    print(f"aux shape {aux_cols[0].shape}", flush=True)
    print(
        f"aux commit intt [{aux_cols[0].shape[0]}]   : {t(ntt_pallas.intt, aux_cols):.3f} s",
        flush=True,
    )
    a_coeffs = [jax.block_until_ready(ntt_pallas.intt(a)) for a in aux_cols]
    print(
        f"aux commit lde          : {t(ntt_pallas.coset_lde_rate1, a_coeffs):.3f} s",
        flush=True,
    )
    a_ldes = [
        jax.block_until_ready(ntt_pallas.coset_lde_rate1(a)) for a in a_coeffs
    ]
    a_leaves = [jax.block_until_ready(gt(a)) for a in a_ldes]
    print(f"aux tree (pallas)       : {t(tree, a_leaves):.3f} s", flush=True)

    # quotient
    qc = prove_mod._make_quotient(stark, 16, DEFAULT_CONFIG)
    alphas = jnp.asarray(np.array([13, 17], dtype=np.uint64))
    apow = jnp.asarray(
        np.array(
            [[pow(a, j, gl.P) for j in range(513)] for a in (13, 17)],
            dtype=np.uint64,
        )
    )
    totals = jnp.asarray(np.array([[1] * len(stark.ctls)] * 2, dtype=np.uint64))
    wspecs = [[w for (_, w) in per] for per in specs]
    quo = lambda pair: qc(pair[0], pair[1], alphas, apow, betas, gammas, totals, wspecs)
    print(
        f"quotient chunks         : {t(quo, list(zip(ldes, a_ldes))):.3f} s",
        flush=True,
    )


if __name__ == "__main__":
    main()
