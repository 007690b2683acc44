"""On-device Fiat-Shamir challenger: the duplex sponge as traced jax ops.

The host `Challenger` (challenger.py) forces a tunnel round trip at every
transcript interaction — the prover must PULL each Merkle cap to absorb it
and each challenge to use it, ~10 round trips x ~31 ms on the remote chip,
and every pull drains the device queue (no pipelining across stages).
This mirror runs the SAME duplex schedule (plonky2 semantics: absorbs
buffer up to the rate then permute; any absorb invalidates pending
outputs) on a traced [12]-element state, so challenges stay on device,
stages chain without host synchronisation, and the proof is pulled ONCE
at the end.

The absorb/squeeze COUNTS are static per (stark, degree, config), so each
transcript transition compiles to one small cached executable.  Bulk
absorption (openings, FRI final poly) runs as a lax.scan over full
rate-8 chunks.  Outputs are bit-identical to the host challenger
(tests/test_device_challenger.py drives random schedules against it).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import poseidon

RATE = poseidon.SPONGE_RATE
WIDTH = poseidon.WIDTH


def _permute1(state: jnp.ndarray) -> jnp.ndarray:
    """[12] -> [12] single-state permutation (batched kernel, batch 1)."""
    return poseidon.permute(state[None])[0]


class DeviceChallenger:
    """Trace-time challenger: state is a traced [12] u64 array; buffer
    fill levels are python ints (static per transcript schedule)."""

    def __init__(self, state=None):
        self.state = (
            jnp.zeros((WIDTH,), jnp.uint64) if state is None else state
        )
        self.input_buffer: List = []  # traced scalars
        self.output_buffer: List = []  # traced scalars

    # -- absorbing ---------------------------------------------------------

    def observe_element(self, x):
        """x: traced u64 scalar (canonical, < p)."""
        self.output_buffer = []
        self.input_buffer.append(jnp.asarray(x, jnp.uint64))
        if len(self.input_buffer) == RATE:
            self._duplex()

    def observe_flat(self, xs: jnp.ndarray):
        """Absorb a 1-D traced vector of STATIC length.

        Full rate-chunks run as a lax.scan of permutes (one executable
        region instead of len/8 unrolled permutes); the tail goes through
        the element path so buffer semantics stay exact."""
        n = int(xs.shape[0])
        self.output_buffer = []
        # fill the current partial buffer first
        fill = (-len(self.input_buffer)) % RATE
        fill = min(fill, n)
        for i in range(fill):
            self.observe_element(xs[i])
        n_chunks = (n - fill) // RATE
        if n_chunks > 0:
            assert not self.input_buffer
            chunks = xs[fill : fill + n_chunks * RATE].reshape(n_chunks, RATE)

            def step(state, chunk):
                state = jnp.concatenate([chunk, state[RATE:]])
                return _permute1(state), None

            self.state, _ = jax.lax.scan(step, self.state, chunks)
            self.output_buffer = [self.state[i] for i in range(RATE)]
        for i in range(fill + n_chunks * RATE, n):
            self.observe_element(xs[i])

    def observe_cap(self, cap: jnp.ndarray):
        """cap: traced [k, 4] digest rows."""
        self.observe_flat(cap.reshape(-1))

    # -- squeezing -----------------------------------------------------

    def get_challenge(self):
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int):
        return [self.get_challenge() for _ in range(n)]

    # -- internals -----------------------------------------------------

    def _duplex(self):
        k = len(self.input_buffer)
        assert k <= RATE
        if k:
            self.state = jnp.concatenate(
                [jnp.stack(self.input_buffer), self.state[k:]]
            )
            self.input_buffer = []
        self.state = _permute1(self.state)
        self.output_buffer = [self.state[i] for i in range(RATE)]

    # -- executable-boundary packing ------------------------------------

    def pack(self) -> jnp.ndarray:
        """Flatten to one [12 + i + o] vector for crossing a jit boundary;
        pair with `counts()` (static) for unpack."""
        parts = [self.state]
        if self.input_buffer:
            parts.append(jnp.stack(self.input_buffer))
        if self.output_buffer:
            parts.append(jnp.stack(self.output_buffer))
        return jnp.concatenate(parts)

    def counts(self):
        return (len(self.input_buffer), len(self.output_buffer))

    @staticmethod
    def unpack(packed: jnp.ndarray, counts) -> "DeviceChallenger":
        n_in, n_out = counts
        c = DeviceChallenger(packed[:WIDTH])
        c.input_buffer = [packed[WIDTH + i] for i in range(n_in)]
        c.output_buffer = [packed[WIDTH + n_in + i] for i in range(n_out)]
        return c


class CountingSponge:
    """Buffer-count shadow of DeviceChallenger: replays a transcript
    schedule tracking ONLY (input, output) buffer fill levels — used to
    derive the static pack/unpack counts at executable boundaries without
    executing any hashing.  Must mirror DeviceChallenger's buffer logic
    exactly (asserted by tests/test_device_challenger.py)."""

    def __init__(self, counts=(0, 0)):
        self.n_in, self.n_out = counts

    def observe_element(self, _x=None):
        self.n_out = 0
        self.n_in += 1
        if self.n_in == RATE:
            self._duplex()

    def observe_flat(self, n: int):
        self.n_out = 0
        fill = min((-self.n_in) % RATE, n)
        for _ in range(fill):
            self.observe_element()
        n_chunks = (n - fill) // RATE
        if n_chunks > 0:
            self.n_out = RATE
        for _ in range(fill + n_chunks * RATE, n):
            self.observe_element()

    def observe_cap(self, k_digests: int):
        self.observe_flat(4 * k_digests)

    def get_challenge(self):
        if self.n_in or not self.n_out:
            self._duplex()
        self.n_out -= 1

    def get_n_challenges(self, n: int):
        for _ in range(n):
            self.get_challenge()

    def _duplex(self):
        self.n_in = 0
        self.n_out = RATE

    def counts(self):
        return (self.n_in, self.n_out)


# ---------------------------------------------------------------------------
# challenge-derived device tables (host pow chains made traced)
# ---------------------------------------------------------------------------


def powers_vec(base, n: int) -> jnp.ndarray:
    """[base^0 .. base^(n-1)] by doubling concatenation (traced base)."""
    pows = jnp.ones((1,), jnp.uint64)
    cur = jnp.asarray(base, jnp.uint64)
    while pows.shape[0] < n:
        pows = jnp.concatenate([pows, gl.mul(pows, cur)])
        cur = gl.mul(cur, cur)
    return pows[:n]


def ext_powers_rows(c0, c1, n: int) -> jnp.ndarray:
    """[n, 2] rows of (c0+c1*u)^j, u^2 = 7 (traced extension base)."""
    p0 = jnp.ones((1,), jnp.uint64)
    p1 = jnp.zeros((1,), jnp.uint64)
    b0 = jnp.asarray(c0, jnp.uint64)
    b1 = jnp.asarray(c1, jnp.uint64)
    while p0.shape[0] < n:
        b1w = gl.mul_const(b1, 7)
        q0 = gl.add(gl.mul(p0, b0), gl.mul(p1, b1w))
        q1 = gl.add(gl.mul(p0, b1), gl.mul(p1, b0))
        p0 = jnp.concatenate([p0, q0])
        p1 = jnp.concatenate([p1, q1])
        # (b0+b1u)^2 = b0^2 + 7 b1^2 + 2 b0 b1 u
        s0 = gl.add(gl.mul(b0, b0), gl.mul_const(gl.mul(b1, b1), 7))
        s1 = gl.mul_const(gl.mul(b0, b1), 2)
        b0, b1 = s0, s1
    return jnp.stack([p0[:n], p1[:n]], axis=1)


def ctl_weights_device(stark, beta) -> jnp.ndarray:
    """Traced weight vector per CTL: beta^k * 2^j per flat column slot
    (the device twin of CtlSpec.flat_weights; column INDICES are static
    and supplied separately by the caller)."""
    import numpy as np

    out = []
    for ctl in stark.ctls:
        ks, mults = [], []
        for k, (kind, spec) in enumerate([(c[0], c[1]) for c in ctl.columns]):
            if kind == "single":
                ks.append(k)
                mults.append(1)
            else:
                for j, _ in enumerate(spec):
                    ks.append(k)
                    mults.append((1 << j) % gl.P)
        bp = powers_vec(beta, len(ctl.columns))
        w = gl.mul(
            bp[jnp.asarray(np.array(ks, dtype=np.int64))],
            jnp.asarray(np.array(mults, dtype=np.uint64)),
        )
        out.append(w)
    return out


def ctl_totals_device(ctl_rows_padded, row_counts, betas, gammas):
    """Traced extra-looking totals: [n_challenges, n_ctls].

    ctl_rows_padded: list (per ctl) of [n_rows, max_len] u64 value rows
    (zero-padded) with `row_counts[c]` = (n_rows, true_len per row list —
    all rows of one ctl share a length here).  Total = sum 1/(gamma +
    sum beta^j v_j) over rows (constraints.ctl_total device twin)."""
    n_ch = betas.shape[0]
    totals = []
    for i in range(n_ch):
        beta_i = betas[i]
        gamma_i = gammas[i]
        row = []
        for c, rows in enumerate(ctl_rows_padded):
            n_rows, true_len = row_counts[c]
            if n_rows == 0:
                row.append(jnp.uint64(0))
                continue
            bp = powers_vec(beta_i, true_len)
            acc = gl.add(
                _mod_dot_rows(rows[:, :true_len], bp), gamma_i
            )  # [n_rows]
            row.append(_sum_mod(gl.batch_inv(acc)))
        totals.append(jnp.stack(row))
    return jnp.stack(totals)


def _pad_pow2(arr, axis=-1):
    n = arr.shape[axis]
    m = 1 << (n - 1).bit_length()
    if m == n:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, m - n)
    return jnp.pad(arr, pad)


def _mod_dot_rows(mat, vec):
    """sum_j mat[..., j] * vec[j] mod p (log-depth; zero-padded)."""
    prod = _pad_pow2(gl.mul(mat, vec))
    n = prod.shape[-1]
    while n > 1:
        half = n // 2
        prod = gl.add(prod[..., :half], prod[..., half:])
        n = half
    return prod[..., 0]


def _sum_mod(v):
    v = _pad_pow2(v)
    n = v.shape[0]
    while n > 1:
        half = n // 2
        v = gl.add(v[:half], v[half:])
        n = half
    return v[0]
