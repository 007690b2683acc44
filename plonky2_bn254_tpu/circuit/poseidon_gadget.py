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
from .builder import CircuitBuilder, Constraint, Generator, Target

_HALF_FULL = FULL_ROUNDS // 2
_RC = ROUND_CONSTANTS.reshape(N_ROUNDS, WIDTH)
_MDS_INT = [[int(x) for x in row] for row in MDS]
_BINOM7 = [1, 7, 21, 35, 35, 21, 7, 1]

# affine lane: value = w[target] + const  (const is a python int mod p)
Lane = Tuple[Target, int]


def _sbox_constraint(builder: CircuitBuilder, lane: Lane) -> Target:
    """out = (t + c)^7 as one degree-7 constraint (binomial expansion)."""
    t, c = lane
    out = builder.add_virtual_target()
    monomials = []
    for k in range(7, -1, -1):
        coeff = _BINOM7[k] * pow(c, 7 - k, gl.P) % gl.P
        if coeff:
            monomials.append((coeff, [t.index] * k))
    monomials.append((gl.P - 1, [out.index]))
    builder.constraints.append(Constraint(monomials, tag="poseidon_sbox"))
    return out


def _mds_constraint(builder: CircuitBuilder, lanes: List[Lane], r: int) -> Target:
    """out = sum_j m_rj * (t_j + c_j) as one linear constraint."""
    out = builder.add_virtual_target()
    monomials = []
    const = 0
    for j, (t, c) in enumerate(lanes):
        m = _MDS_INT[r][j]
        monomials.append((m % gl.P, [t.index]))
        const = (const + m * c) % gl.P
    if const:
        monomials.append((const, []))
    monomials.append((gl.P - 1, [out.index]))
    builder.constraints.append(Constraint(monomials, tag="poseidon_mds"))
    return out


def permute_targets(builder: CircuitBuilder, state: List[Target]) -> List[Target]:
    """Constrained Poseidon permutation; returns the 12 output targets."""
    assert len(state) == WIDTH
    in_targets = list(state)
    lanes: List[Lane] = [(t, int(_RC[0][i])) for i, t in enumerate(state)]
    sbox_targets: List[Tuple[int, Target]] = []  # (lane, target) per round, flat
    mds_targets: List[Target] = []  # 12 per round, flat

    for r in range(N_ROUNDS):
        full = r < _HALF_FULL or r >= _HALF_FULL + PARTIAL_ROUNDS
        if full:
            sboxed = [(_sbox_constraint(builder, lanes[i]), 0) for i in range(WIDTH)]
            for i in range(WIDTH):
                sbox_targets.append((i, sboxed[i][0]))
        else:
            s0 = _sbox_constraint(builder, lanes[0])
            sbox_targets.append((0, s0))
            sboxed = [(s0, 0)] + lanes[1:]
        rc_next = _RC[r + 1] if r + 1 < N_ROUNDS else [0] * WIDTH
        new_lanes = []
        for i in range(WIDTH):
            o = _mds_constraint(builder, sboxed, i)
            mds_targets.append(o)
            new_lanes.append((o, int(rc_next[i])))
        lanes = new_lanes

    out_targets = [t for t, _ in lanes]

    def run(w, in_targets=in_targets, sbox_targets=sbox_targets,
            mds_targets=mds_targets):
        """Native replay writing every intermediate (one generator per
        permutation keeps the witness fixpoint cheap)."""
        values = {}
        v = [w[t.index] for t in in_targets]
        si = 0
        mi = 0
        for r in range(N_ROUNDS):
            full = r < _HALF_FULL or r >= _HALF_FULL + PARTIAL_ROUNDS
            u = [(x + int(_RC[r][i])) % gl.P for i, x in enumerate(v)]
            if full:
                s = [pow(x, ALPHA, gl.P) for x in u]
                for i in range(WIDTH):
                    values[sbox_targets[si][1].index] = s[i]
                    si += 1
            else:
                s = [pow(u[0], ALPHA, gl.P)] + u[1:]
                values[sbox_targets[si][1].index] = s[0]
                si += 1
            v = [
                sum(_MDS_INT[rr][j] * s[j] for j in range(WIDTH)) % gl.P
                for rr in range(WIDTH)
            ]
            for rr in range(WIDTH):
                values[mds_targets[mi].index] = v[rr]
                mi += 1
        return values

    builder.add_generator(
        Generator(
            [t.index for t in in_targets],
            [t.index for _, t in sbox_targets] + [t.index for t in mds_targets],
            run,
            "poseidon_permute",
        )
    )
    return out_targets


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
