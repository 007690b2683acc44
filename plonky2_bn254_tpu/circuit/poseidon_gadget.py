"""In-circuit Poseidon permutation + recursive challenger.

The reference gets these from plonky2 (`PoseidonHash` gates +
`RecursiveChallenger`, used by the recursive STARK verifier at
/root/reference/src/starks/common/verifier.rs:101-185 and by
hash_to_fq2_circuit at /root/reference/src/utils/hash_to_g2.rs:89-107).

Gate shape: lanes are tracked as affine values (target, pending_const) so
round constants ride for free inside the next constraint; the S-box
(x + c)^7 is ONE degree-7 constraint via binomial expansion, and the MDS
matvec is ONE linear constraint per output lane.  A full permutation is
478 constraints and a single batch witness generator (the round-1 version
was ~2200 constraints with a generator per gate — too heavy for
recursion-scale circuits).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..field import goldilocks as gl
from ..field.poseidon_constants import (
    ALPHA,
    DIGEST_LEN,
    FULL_ROUNDS,
    MDS,
    N_ROUNDS,
    PARTIAL_ROUNDS,
    ROUND_CONSTANTS,
    SPONGE_RATE,
    WIDTH,
)
from .builder import CircuitBuilder, Generator, Target

_HALF_FULL = FULL_ROUNDS // 2
_RC = ROUND_CONSTANTS.reshape(N_ROUNDS, WIDTH)
_MDS_INT = [[int(x) for x in row] for row in MDS]
_BINOM7 = [1, 7, 21, 35, 35, 21, 7, 1]


def _sbox_monomials(c: int):
    """(t + c)^7 - out as template monomials over slots (0=in, 1=out)."""
    monomials = []
    for k in range(7, -1, -1):
        coeff = _BINOM7[k] * pow(c, 7 - k, gl.P) % gl.P
        if coeff:
            monomials.append((coeff, (0,) * k))
    monomials.append((gl.P - 1, (1,)))
    return monomials


def permute_indices(builder: CircuitBuilder, state: List[int]) -> List[int]:
    """Constrained Poseidon permutation over target indices.

    Recorded as ONE first-class poseidon op (12 in wires, 12 out wires)
    plus one native witness generator.  The constraint lives in the outer
    proof's dedicated Poseidon-round region (circuit/outer.py: 32 trace
    rows per permutation, transition constraints over round-boundary
    states — the plonky2 PoseidonGate analog, replacing the ~500
    universal-gate rows per permutation that made recursion-scale outer
    traces infeasible) and in Circuit.check's native replay."""
    assert len(state) == WIDTH
    base = builder.reserve_indices(WIDTH)
    outs = list(range(base, base + WIDTH))
    in_indices = list(state)
    builder.poseidon_ops.append((in_indices, outs))

    def run(w, in_indices=in_indices, outs=outs):
        from ..field.poseidon import h_permute

        v = h_permute([w[i] for i in in_indices])
        return dict(zip(outs, v))

    builder.add_generator(
        Generator(in_indices, outs, run, "poseidon_permute")
    )
    return outs


def permute_targets(builder: CircuitBuilder, state: List[Target]) -> List[Target]:
    """Constrained Poseidon permutation; returns the 12 output targets."""
    out = permute_indices(builder, [t.index for t in state])
    return [Target(i) for i in out]


def hash_no_pad_targets(builder: CircuitBuilder, inputs: List[Target]) -> List[Target]:
    """In-circuit sponge hash (plonky2 hash_n_to_m_no_pad shape): rate-8
    overwrite absorption, zero capacity; returns the 4-target digest."""
    zero = builder.zero()
    state = [zero] * WIDTH
    for start in range(0, len(inputs), SPONGE_RATE):
        chunk = list(inputs[start : start + SPONGE_RATE])
        chunk += [zero] * (SPONGE_RATE - len(chunk))
        state = chunk + state[SPONGE_RATE:]
        state = permute_targets(builder, state)
    return state[:DIGEST_LEN]


def two_to_one_targets(
    builder: CircuitBuilder, left: List[Target], right: List[Target]
) -> List[Target]:
    """In-circuit Merkle two-to-one compression."""
    zero = builder.zero()
    state = list(left) + list(right) + [zero] * (WIDTH - 2 * DIGEST_LEN)
    return permute_targets(builder, state)[:DIGEST_LEN]


class RecursiveChallenger:
    """In-circuit duplex sponge mirroring prover.challenger.Challenger."""

    def __init__(self, builder: CircuitBuilder):
        self.builder = builder
        self.state = [builder.zero() for _ in range(WIDTH)]
        self.input_buffer: List[Target] = []
        self.output_buffer: List[Target] = []

    def observe_element(self, t: Target):
        self.output_buffer = []
        self.input_buffer.append(t)
        if len(self.input_buffer) == SPONGE_RATE:
            self._duplex()

    def observe_elements(self, targets: List[Target]):
        for t in targets:
            self.observe_element(t)

    def observe_cap(self, cap_targets):
        """cap_targets: iterable of 4-target digests."""
        for digest in cap_targets:
            self.observe_elements(list(digest))

    def observe_extension(self, x):
        """x: ExtTarget (circuit.ext_target)."""
        self.observe_elements([x.c0, x.c1])

    def get_challenge(self) -> Target:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int) -> List[Target]:
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self):
        from .ext_target import ExtTarget

        c0 = self.get_challenge()
        c1 = self.get_challenge()
        return ExtTarget(c0, c1)

    def _duplex(self):
        for i, t in enumerate(self.input_buffer[:SPONGE_RATE]):
            self.state[i] = t
        self.input_buffer = self.input_buffer[SPONGE_RATE:]
        self.state = permute_targets(self.builder, self.state)
        self.output_buffer = list(self.state[:SPONGE_RATE])
        if self.input_buffer:
            self._duplex()
