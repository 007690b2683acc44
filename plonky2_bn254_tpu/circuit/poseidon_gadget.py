"""In-circuit Poseidon permutation + recursive challenger.

The reference gets these from plonky2 (`PoseidonHash` gates +
`RecursiveChallenger`, used by hash_to_fq2_circuit at
/root/reference/src/utils/hash_to_g2.rs:89-107).  Here the permutation is
expressed with mul/linear constraints over the same constants as the
native hash (field/poseidon_constants.py), so in-circuit and native
transcripts agree.
"""

from __future__ import annotations

from typing import List

from ..field import goldilocks as gl
from ..field.poseidon_constants import (
    ALPHA,
    FULL_ROUNDS,
    MDS,
    N_ROUNDS,
    PARTIAL_ROUNDS,
    ROUND_CONSTANTS,
    SPONGE_RATE,
    WIDTH,
)
from .builder import CircuitBuilder, Constraint, Generator, Target

_HALF_FULL = FULL_ROUNDS // 2
_RC = ROUND_CONSTANTS.reshape(N_ROUNDS, WIDTH)
_MDS_INT = [[int(x) for x in row] for row in MDS]


def _sbox(builder: CircuitBuilder, t: Target) -> Target:
    x2 = builder.mul(t, t)
    x4 = builder.mul(x2, x2)
    x6 = builder.mul(x4, x2)
    return builder.mul(x6, t)


def _linear_layer(builder: CircuitBuilder, state: List[Target], rc_next=None):
    """MDS matvec as one linear constraint per output element."""
    out = []
    for r in range(WIDTH):
        o = builder.add_virtual_target()
        mono = [(_MDS_INT[r][j], [state[j].index]) for j in range(WIDTH)]
        mono.append((gl.P - 1, [o.index]))
        builder.constraints.append(Constraint(mono, tag="poseidon_mds"))

        def run(w, state=state, o=o, r=r):
            acc = sum(_MDS_INT[r][j] * w[state[j].index] for j in range(WIDTH))
            return {o.index: acc % gl.P}

        builder.add_generator(
            Generator([s.index for s in state], [o.index], run, "poseidon_mds")
        )
        out.append(o)
    return out


def _add_constants(builder: CircuitBuilder, state: List[Target], r: int):
    return [
        builder.add(s, builder.constant(int(_RC[r][i])))
        for i, s in enumerate(state)
    ]


def permute_targets(builder: CircuitBuilder, state: List[Target]) -> List[Target]:
    assert len(state) == WIDTH
    r = 0
    for _ in range(_HALF_FULL):
        state = _add_constants(builder, state, r)
        state = [_sbox(builder, s) for s in state]
        state = _linear_layer(builder, state)
        r += 1
    for _ in range(PARTIAL_ROUNDS):
        state = _add_constants(builder, state, r)
        state = [_sbox(builder, state[0])] + state[1:]
        state = _linear_layer(builder, state)
        r += 1
    for _ in range(_HALF_FULL):
        state = _add_constants(builder, state, r)
        state = [_sbox(builder, s) for s in state]
        state = _linear_layer(builder, state)
        r += 1
    return state


class RecursiveChallenger:
    """In-circuit duplex sponge mirroring prover.challenger.Challenger."""

    def __init__(self, builder: CircuitBuilder):
        self.builder = builder
        self.state = [builder.zero() for _ in range(WIDTH)]
        self.input_buffer: List[Target] = []
        self.output_buffer: List[Target] = []

    def observe_elements(self, targets: List[Target]):
        for t in targets:
            self.output_buffer = []
            self.input_buffer.append(t)
            if len(self.input_buffer) == SPONGE_RATE:
                self._duplex()

    def get_challenge(self) -> Target:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int) -> List[Target]:
        return [self.get_challenge() for _ in range(n)]

    def _duplex(self):
        for i, t in enumerate(self.input_buffer[:SPONGE_RATE]):
            self.state[i] = t
        self.input_buffer = self.input_buffer[SPONGE_RATE:]
        self.state = permute_targets(self.builder, self.state)
        self.output_buffer = list(self.state[:SPONGE_RATE])
        if self.input_buffer:
            self._duplex()
