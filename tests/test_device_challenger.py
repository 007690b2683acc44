"""Bit-equivalence of the on-device Fiat-Shamir path with the host one.

The TPU prover threads a traced duplex-sponge state through its stage
executables (prover/device_challenger.py) so challenges never cross the
tunnel mid-proof; every derived quantity (challenges, power tables, CTL
weights, extra-looking totals) must match the host challenger /
flat_weights / ctl_total EXACTLY or proofs stop verifying.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from plonky2_bn254_tpu.field import goldilocks as gl
from plonky2_bn254_tpu.field.extension import GLExt
from plonky2_bn254_tpu.prover import constraints as cons
from plonky2_bn254_tpu.prover import device_challenger as dc
from plonky2_bn254_tpu.prover.challenger import Challenger

RNG = np.random.default_rng(77)


def test_device_challenger_matches_host():
    """Random interleaved absorb/squeeze schedules, including partial
    buffers crossing flat absorbs and pack/unpack executable boundaries."""
    for trial in range(5):
        host = Challenger()
        dev = dc.DeviceChallenger()
        for step in range(12):
            kind = RNG.integers(0, 4)
            if kind == 0:
                n = int(RNG.integers(1, 7))
                xs = [int(v) for v in RNG.integers(0, gl.P, size=n, dtype=np.uint64)]
                host.observe_elements(xs)
                for x in xs:
                    dev.observe_element(jnp.uint64(x))
            elif kind == 1:
                n = int(RNG.integers(1, 40))
                xs = RNG.integers(0, gl.P, size=n, dtype=np.uint64)
                host.observe_elements([int(v) for v in xs])
                dev.observe_flat(jnp.asarray(xs))
            elif kind == 2:
                k = int(RNG.integers(1, 5))
                want = host.get_n_challenges(k)
                got = [int(np.asarray(c)) for c in dev.get_n_challenges(k)]
                assert got == want, (trial, step)
            else:
                # executable-boundary crossing
                packed, counts = dev.pack(), dev.counts()
                dev = dc.DeviceChallenger.unpack(jnp.asarray(packed), counts)
        want = host.get_n_challenges(3)
        got = [int(np.asarray(c)) for c in dev.get_n_challenges(3)]
        assert got == want


def test_counting_sponge_matches():
    """The buffer-count shadow must track the real device challenger's
    pack counts through arbitrary schedules."""
    for trial in range(4):
        dev = dc.DeviceChallenger()
        cnt = dc.CountingSponge()
        for step in range(30):
            kind = RNG.integers(0, 3)
            if kind == 0:
                x = jnp.uint64(int(RNG.integers(0, gl.P, dtype=np.uint64)))
                dev.observe_element(x)
                cnt.observe_element()
            elif kind == 1:
                n = int(RNG.integers(0, 30))
                xs = RNG.integers(0, gl.P, size=n, dtype=np.uint64)
                dev.observe_flat(jnp.asarray(xs))
                cnt.observe_flat(n)
            else:
                k = int(RNG.integers(1, 4))
                dev.get_n_challenges(k)
                cnt.get_n_challenges(k)
            assert dev.counts() == cnt.counts(), (trial, step, kind)


def test_powers_and_ext_powers():
    b = int(RNG.integers(1, gl.P, dtype=np.uint64))
    got = np.asarray(dc.powers_vec(jnp.uint64(b), 20))
    want = [pow(b, j, gl.P) for j in range(20)]
    assert [int(v) for v in got] == want

    e = GLExt(int(RNG.integers(1, gl.P, dtype=np.uint64)), int(RNG.integers(1, gl.P, dtype=np.uint64)))
    rows = np.asarray(dc.ext_powers_rows(jnp.uint64(e.c0), jnp.uint64(e.c1), 13))
    cur = GLExt.one()
    for j in range(13):
        assert (int(rows[j, 0]), int(rows[j, 1])) == (cur.c0, cur.c1)
        cur = cur * e


def test_ctl_weights_and_totals_match_host():
    from plonky2_bn254_tpu.starks.table import g1_scalar_mul_stark

    stark = g1_scalar_mul_stark()
    beta = int(RNG.integers(1, gl.P, dtype=np.uint64))
    gamma = int(RNG.integers(1, gl.P, dtype=np.uint64))
    dev_ws = dc.ctl_weights_device(stark, jnp.uint64(beta))
    for ctl, w_dev in zip(stark.ctls, dev_ws):
        host = ctl.flat_weights(beta, gl.P)
        assert [int(v) for v in np.asarray(w_dev)] == [w for _, w in host]

    # totals: random CTL value rows per ctl
    ctl_values = {}
    for c, ctl in enumerate(stark.ctls):
        n_cols = len(list(ctl.flat_weights(1, gl.P)))
        ctl_values[c] = [
            [int(v) for v in RNG.integers(0, 1 << 16, size=n_cols)]
            for _ in range(7)
        ]
    rows_padded = [
        jnp.asarray(np.array(ctl_values[c], dtype=np.uint64))
        for c in range(len(stark.ctls))
    ]
    counts = [(7, rows_padded[c].shape[1]) for c in range(len(stark.ctls))]
    betas = jnp.asarray(np.array([beta], dtype=np.uint64))
    gammas = jnp.asarray(np.array([gamma], dtype=np.uint64))
    got = np.asarray(dc.ctl_totals_device(rows_padded, counts, betas, gammas))
    for c in range(len(stark.ctls)):
        want = cons.ctl_total(ctl_values[c], beta, gamma)
        assert int(got[0, c]) == want
