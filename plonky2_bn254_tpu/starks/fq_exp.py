"""FqExpStark: batched x^s (BN254 Fq exponentiation) STARK machine.

Rebuild of /root/reference/src/starks/fields/exp_stark.rs:36-494 and
exp_view.rs:9-83.  512 rows per op, alternating mul rows (even counter,
process scalar bit 0) and square rows (odd counter), scalar kept as 256
one-bit columns rotated left after each square row.

TPU-native trace generation: the whole batch is produced by two
`lax.scan`s (square chain, running product) followed by ONE fully batched
witness kernel over all n*512 rows — no per-row host loops (SURVEY.md §7
stage 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from . import bigint, fq_mul, modular, round_flags
from .air import eval_eq
from .layout import Layout, MODULUS_ZERO_AUX_LAYOUT, ROUND_FLAGS_LAYOUT
from .limbs import LIMB_BITS, N_BITS, N_LIMBS, bits_from_ints, from_ints

FQ_PERIOD = 2 * N_BITS  # 512

LAYOUT = Layout(
    [
        ("square", N_LIMBS),
        ("product", N_LIMBS),
        ("a", N_LIMBS),
        ("b", N_LIMBS),
        ("c", N_LIMBS),
        ("mul_aux", MODULUS_ZERO_AUX_LAYOUT),
        ("bits", N_BITS),
        ("round_flags", ROUND_FLAGS_LAYOUT),
        ("timestamp", 1),
        ("is_mul", 1),
        ("is_sq_not_last", 1),
        ("filter", 1),
        ("frequency", 1),
        ("range_counter", 1),
    ]
)
assert LAYOUT.width == 427  # FQ_EXP_VIEW_LEN (exp_view.rs:12-13)

RANGE_CHECK_COLS = range(2 * N_LIMBS, 5 * N_LIMBS + modular.MODULUS_AUX_ZERO_LEN)
FREQ_COL = LAYOUT.col("frequency")
RANGE_COUNTER_COL = LAYOUT.col("range_counter")


@functools.partial(jax.jit, static_argnames=("unroll",))
def generate_trace_core(x_limbs: jnp.ndarray, s_bits: jnp.ndarray,
                        timestamps: jnp.ndarray, unroll=False):
    """Jittable core: [n,16] x limbs, [n,256] scalar bits, [n] timestamps ->
    [n*512, 427] uint64 trace rows (without range-check columns).

    `unroll` partially unrolls the limb-carry scans inside the two chain
    scans (TPU; see g1_scalar_mul._unroll_for)."""
    n = x_limbs.shape[0]

    # square chain sq_k = x^(2^k), k = 0..256  ([257, n, 16])
    def sq_step(cur, _):
        return bigint.mulmod(cur, cur, unroll=unroll), cur

    last_sq, sqs = jax.lax.scan(sq_step, x_limbs, None, length=N_BITS)
    sqs = jnp.concatenate([sqs, last_sq[None]], axis=0)  # [257, n, 16]

    # running products: p_prev[k] = x^(s mod 2^k)   ([257, n, 16])
    one = jnp.zeros_like(x_limbs).at[..., 0].set(1)

    def p_step(cur, inp):
        sq_k, bit_k = inp
        mul = bigint.mulmod(cur, sq_k, unroll=unroll)
        nxt = jnp.where(bit_k[:, None] == 1, mul, cur)
        return nxt, cur

    p_last, p_prevs = jax.lax.scan(p_step, one, (sqs[:N_BITS], s_bits.T))
    p_full = jnp.concatenate([p_prevs[1:], p_last[None]], axis=0)  # p_k

    # mul rows (counter 2k): a=p_{k-1}, b=sq_k, c=a*b; product=p_k
    mul_a, mul_b = p_prevs, sqs[:N_BITS]
    mul_c, mul_aux = fq_mul.generate_fq_mul(mul_a, mul_b)
    # square rows (counter 2k+1): a=b=sq_k, c=sq_{k+1}
    sq_a = sqs[:N_BITS]
    sq_c, sq_aux = fq_mul.generate_fq_mul(sq_a, sq_a)

    # bit columns rotated left k times on rows of round k
    k_idx = jnp.arange(N_BITS)
    rot_idx = (k_idx[:, None] + k_idx[None, :]) % N_BITS  # [k, i]
    bits_rot = s_bits[:, rot_idx]  # [n, 256(k), 256(i)]
    bits_rot = jnp.transpose(bits_rot, (1, 0, 2))  # [256(k), n, 256]

    flags = jnp.asarray(round_flags.flag_tables(FQ_PERIOD).astype(np.int64))
    mul_flags = jnp.broadcast_to(flags[0::2][:, None, :], (N_BITS, n, 5))
    sq_flags = jnp.broadcast_to(flags[1::2][:, None, :], (N_BITS, n, 5))

    ts = jnp.broadcast_to(timestamps[None, :, None], (N_BITS, n, 1)).astype(jnp.int64)
    ones = jnp.ones((N_BITS, n, 1), jnp.int64)
    zeros = jnp.zeros((N_BITS, n, 1), jnp.int64)
    # is_sq_not_last: 1 on square rows except row 511 (k = 255)
    sq_not_last = ones.at[N_BITS - 1].set(0)

    def aux_cols(aux):
        return [
            aux.is_quot_positive[..., None],
            aux.quot_abs,
            aux.aux_lo,
            aux.aux_hi,
        ]

    mul_rows = jnp.concatenate(
        [mul_b, p_full, mul_a, mul_b, mul_c]  # square col of mul row = sq_k = b
        + aux_cols(mul_aux)
        + [bits_rot, mul_flags, ts, ones, zeros, ones, zeros, zeros],
        axis=-1,
    )
    sq_rows = jnp.concatenate(
        [sq_c, p_full, sq_a, sq_a, sq_c]  # square col of sq row = sq_{k+1} = c
        + aux_cols(sq_aux)
        + [bits_rot, sq_flags, ts, zeros, sq_not_last, ones, zeros, zeros],
        axis=-1,
    )
    # interleave: per op rows 0..511 = mul_0, sq_0, mul_1, sq_1, ...
    per_op = jnp.stack([mul_rows, sq_rows], axis=1)  # [256, 2, n, 427]
    per_op = jnp.transpose(per_op, (2, 0, 1, 3)).reshape(n * FQ_PERIOD, LAYOUT.width)
    return per_op.astype(jnp.uint64)


@jax.jit
def add_range_checks(rows: jnp.ndarray) -> jnp.ndarray:
    """Fill range_counter and frequency columns (exp_stark.rs:69-85)."""
    num_rows = rows.shape[0]
    range_max = 1 << LIMB_BITS
    counter = jnp.minimum(jnp.arange(num_rows), range_max - 1).astype(jnp.uint64)
    rows = rows.at[:, RANGE_COUNTER_COL].set(counter)
    vals = rows[:, RANGE_CHECK_COLS.start : RANGE_CHECK_COLS.stop].astype(jnp.int32)
    from .histogram import bincount16
    freq = bincount16(vals, num_rows)
    rows = rows.at[:, FREQ_COL].set(freq)
    return rows


def generate_trace(inputs, min_rows: int = 1 << LIMB_BITS) -> jnp.ndarray:
    """inputs: list of (s int, x int, timestamp int) -> [num_rows, 427] u64."""
    n = len(inputs)
    num_rows = max(min_rows, n * FQ_PERIOD)
    num_rows = 1 << (num_rows - 1).bit_length()
    from .g1_scalar_mul import _unroll_for
    from .limbs import h_bits_le, h_int_to_limbs

    # ONE bundled host->device transfer (remote-chip round trips dominate)
    bundle = np.zeros((n, N_LIMBS + N_BITS + 1), dtype=np.int64)
    for i, (s, x, t) in enumerate(inputs):
        bundle[i, :N_LIMBS] = h_int_to_limbs(int(x))
        bundle[i, N_LIMBS : N_LIMBS + N_BITS] = h_bits_le(int(s))
        bundle[i, -1] = int(t)
    dev = jnp.asarray(bundle)
    x_limbs = dev[:, :N_LIMBS]
    s_bits = dev[:, N_LIMBS : N_LIMBS + N_BITS]
    ts = dev[:, -1]
    rows = generate_trace_core(x_limbs, s_bits, ts, unroll=_unroll_for(x_limbs))
    pad = jnp.zeros((num_rows - rows.shape[0], LAYOUT.width), jnp.uint64)
    return add_range_checks(jnp.concatenate([rows, pad], axis=0))


# ---------------------------------------------------------------------------
# AIR constraints (ring-generic; mirror of exp_stark.rs:208-327)
# ---------------------------------------------------------------------------

MODULUS_INT = bigint.MOD_LIMBS_INT


def eval_fq_exp(consumer, ring, local, next_):
    lv = LAYOUT.view(local)
    nv = LAYOUT.view(next_)
    modulus = [ring.const(m) for m in MODULUS_INT]
    one = ring.one()

    is_not_last_round = lv["filter"] - lv["round_flags"]["is_last_round"]

    fq_mul.eval_fq_mul(
        consumer, ring, lv["filter"], modulus, lv["a"], lv["b"], lv["c"], lv["mul_aux"]
    )
    first = lv["round_flags"]["is_first_round"]
    eval_eq(consumer, first, lv["is_mul"], one)
    eval_eq(consumer, first, lv["square"], lv["b"])
    first_bit0 = lv["bits"][0] * first
    first_not_bit0 = (one - lv["bits"][0]) * first
    eval_eq(consumer, first_bit0, lv["product"], lv["c"])
    eval_eq(consumer, first_not_bit0, lv["product"], lv["a"])
    one_u256 = [one] + [ring.zero()] * (N_LIMBS - 1)
    eval_eq(consumer, first, lv["a"], one_u256)

    # sq_step -> mul_step
    sq = lv["is_sq_not_last"]
    eval_eq(consumer, sq, nv["a"], lv["product"])
    eval_eq(consumer, sq, nv["b"], lv["square"])
    eval_eq(consumer, nv["bits"][0] * sq, nv["product"], nv["c"])
    eval_eq(consumer, (one - nv["bits"][0]) * sq, nv["product"], nv["a"])
    eval_eq(consumer, sq, nv["square"], lv["square"])
    eval_eq(consumer, sq, nv["is_mul"], one)
    eval_eq(consumer, sq, nv["is_sq_not_last"], ring.zero())
    eval_eq(
        consumer, sq, nv["bits"],
        [lv["bits"][(i + 1) % N_BITS] for i in range(N_BITS)],
    )

    # mul_step -> sq_step
    mu = lv["is_mul"]
    is_next_not_last = nv["filter"] - nv["round_flags"]["is_last_round"]
    eval_eq(consumer, mu, nv["a"], lv["square"])
    eval_eq(consumer, mu, nv["b"], lv["square"])
    eval_eq(consumer, mu, nv["product"], lv["product"])
    eval_eq(consumer, mu, nv["square"], nv["c"])
    eval_eq(consumer, mu, nv["is_mul"], ring.zero())
    eval_eq(consumer, mu, nv["is_sq_not_last"], is_next_not_last)
    eval_eq(consumer, mu, nv["bits"], lv["bits"])

    round_flags.eval_round_flags(
        consumer,
        ring,
        FQ_PERIOD,
        lv["filter"],
        lv["round_flags"],
        nv["round_flags"]["counter"],
    )
    eval_eq(consumer, is_not_last_round, nv["timestamp"], lv["timestamp"])
    eval_eq(consumer, is_not_last_round, nv["filter"], lv["filter"])

    # range_counter monotonicity + last-row pin
    diff = nv["range_counter"] - lv["range_counter"]
    consumer.constraint_transition(diff * diff - diff)
    consumer.constraint_last_row(
        lv["range_counter"] - ring.const((1 << LIMB_BITS) - 1)
    )


# ---------------------------------------------------------------------------
# Lookup and CTL specs (exp_view.rs:15-29, exp_ctl.rs:18-75)
# ---------------------------------------------------------------------------


def lookups():
    from .table import Lookup

    return [
        Lookup(
            columns=list(RANGE_CHECK_COLS),
            table_col=RANGE_COUNTER_COL,
            freq_col=FREQ_COL,
        )
    ]


def ctls():
    from .table import CtlSpec

    b0 = LAYOUT.range("b").start
    prod0 = LAYOUT.range("product").start
    bits0 = LAYOUT.range("bits").start
    ts = LAYOUT.col("timestamp")
    input_cols = [("single", b0 + i) for i in range(N_LIMBS)]
    input_cols += [
        ("le_bits", list(range(bits0 + k * LIMB_BITS, bits0 + (k + 1) * LIMB_BITS)))
        for k in range(N_BITS // LIMB_BITS)
    ]
    input_cols.append(("single", ts))
    output_cols = [("single", prod0 + i) for i in range(N_LIMBS)] + [("single", ts)]
    return [
        CtlSpec(columns=input_cols, filter_col=LAYOUT.col("round_flags", "is_first_round")),
        CtlSpec(columns=output_cols, filter_col=LAYOUT.col("round_flags", "is_last_round")),
    ]


def generate_ctl_values(inputs):
    """Host mirror of fq_generate_ctl_values (exp_ctl.rs:53-75):
    {0: input rows, 1: output rows} as python-int lists."""
    from ..bn254.params import P as BN254_P
    from .limbs import h_int_to_limbs

    ins, outs = [], []
    for s, x, t in inputs:
        ins.append(h_int_to_limbs(x, 16) + h_int_to_limbs(s, 16) + [t])
        outs.append(h_int_to_limbs(pow(x, s, BN254_P), 16) + [t])
    return {0: ins, 1: outs}
