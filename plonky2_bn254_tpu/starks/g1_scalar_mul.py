"""G1ScalarMulStark: batched s*x + offset (BN254 G1) STARK machine.

Rebuild of /root/reference/src/starks/curves/g1/scalar_mul_stark.rs:37-509
and scalar_mul_view.rs:10-118.  512 rows per op, alternating add rows
(even counter, process scalar bit 0) and double rows (odd counter), scalar
bits rotated left after each double row; row width 781.

TPU-native trace generation (vs the reference's one-affine-add-per-row
host loop): inversion-free Jacobian scans produce the double chain and
running sums, two batched Fermat inversions normalize every point, then
ONE batched g1_add witness kernel fills all n*512 rows (SURVEY.md §7
stage 6 + §2 parallelism note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import bigint, g1_add, jacobian, modular, round_flags
from .air import eval_eq
from .layout import G1_ADD_AUX_LAYOUT, Layout, ROUND_FLAGS_LAYOUT
from .limbs import LIMB_BITS, N_BITS, N_LIMBS, bits_from_ints, from_ints

G1_PERIOD = 2 * N_BITS  # 512
G1_LEN = g1_add.G1_LEN  # 32

POINT = Layout([("x", N_LIMBS), ("y", N_LIMBS)])

LAYOUT = Layout(
    [
        ("double", POINT),
        ("sum", POINT),
        ("a", POINT),
        ("b", POINT),
        ("c", POINT),
        ("add_aux", G1_ADD_AUX_LAYOUT),
        ("bits", N_BITS),
        ("round_flags", ROUND_FLAGS_LAYOUT),
        ("timestamp", 1),
        ("is_adding", 1),
        ("is_doubling_not_last", 1),
        ("filter", 1),
        ("frequency", 1),
        ("range_counter", 1),
    ]
)
assert LAYOUT.width == 781  # G1_SCALAR_MUL_VIEW_LEN (scalar_mul_view.rs:13-14)

RANGE_CHECK_COLS = range(2 * G1_LEN, 5 * G1_LEN + g1_add.G1_ADD_AUX_LEN)
FREQ_COL = LAYOUT.col("frequency")
RANGE_COUNTER_COL = LAYOUT.col("range_counter")


@functools.partial(jax.jit, static_argnames=("unroll", "scan_unroll"))
def _chains(x_limbs, y_limbs, ox_limbs, oy_limbs, s_bits, unroll=False,
            scan_unroll=1):
    """Stage 1: Jacobian scans + batched affine normalization.

    Kept as its own executable — the remote TPU compiler OOMs on the
    fused trace graph, so trace generation runs as three jitted stages
    (chains -> add witnesses -> row assembly)."""
    n = x_limbs.shape[0]

    # double chain d_k = 2^k * x, k = 0..256 (Jacobian scan, then normalize)
    one_limb = jnp.zeros_like(x_limbs).at[..., 0].set(1)

    def d_step(carry, _):
        X, Y, Z = carry
        return jacobian.double(X, Y, Z, unroll=unroll), (X, Y, Z)

    last_d, d_jac = jax.lax.scan(
        d_step, (x_limbs, y_limbs, one_limb), None, length=N_BITS,
        unroll=scan_unroll,
    )
    dX = jnp.concatenate([d_jac[0], last_d[0][None]], axis=0)  # [257, n, 16]
    dY = jnp.concatenate([d_jac[1], last_d[1][None]], axis=0)
    dZ = jnp.concatenate([d_jac[2], last_d[2][None]], axis=0)
    d_ax, d_ay = jacobian.to_affine(dX, dY, dZ, unroll=unroll)  # affine doubles [257, n, 16]

    # running sums p_k = offset + sum_{i<=k, bit_i} d_i (Jacobian mixed adds)
    def p_step(carry, inp):
        X, Y, Z = carry
        dx_k, dy_k, bit_k = inp
        Xa, Ya, Za = jacobian.mixed_add(X, Y, Z, dx_k, dy_k, unroll=unroll)
        sel = (bit_k == 1)[:, None]
        X2 = jnp.where(sel, Xa, X)
        Y2 = jnp.where(sel, Ya, Y)
        Z2 = jnp.where(sel, Za, Z)
        return (X2, Y2, Z2), (X, Y, Z)

    (lastX, lastY, lastZ), p_prev_jac = jax.lax.scan(
        p_step,
        (ox_limbs, oy_limbs, one_limb),
        (d_ax[:N_BITS], d_ay[:N_BITS], s_bits.T),
        unroll=scan_unroll,
    )
    pX = jnp.concatenate([p_prev_jac[0][1:], lastX[None]], axis=0)  # p_k
    pY = jnp.concatenate([p_prev_jac[1][1:], lastY[None]], axis=0)
    pZ = jnp.concatenate([p_prev_jac[2][1:], lastZ[None]], axis=0)
    p_ax, p_ay = jacobian.to_affine(pX, pY, pZ, unroll=unroll)  # p_k affine [256, n, 16]
    pp_ax, pp_ay = jacobian.to_affine(  # p_{k-1} affine
        p_prev_jac[0], p_prev_jac[1], p_prev_jac[2], unroll=unroll
    )
    return d_ax, d_ay, p_ax, p_ay, pp_ax, pp_ay


@jax.jit
def _assemble(d_ax, d_ay, p_ax, p_ay, pp_ax, pp_ay,
              add_cx, add_cy, add_aux, dbl_cx, dbl_cy, dbl_aux,
              s_bits, timestamps):
    """Stage 3: row assembly from chain points and add witnesses."""
    n = s_bits.shape[0]
    k_idx = jnp.arange(N_BITS)
    rot_idx = (k_idx[:, None] + k_idx[None, :]) % N_BITS
    bits_rot = jnp.transpose(s_bits[:, rot_idx], (1, 0, 2))  # [256, n, 256]

    flags = jnp.asarray(round_flags.flag_tables(G1_PERIOD).astype(np.int64))
    add_flags = jnp.broadcast_to(flags[0::2][:, None, :], (N_BITS, n, 5))
    dbl_flags = jnp.broadcast_to(flags[1::2][:, None, :], (N_BITS, n, 5))

    ts = jnp.broadcast_to(timestamps[None, :, None], (N_BITS, n, 1)).astype(jnp.int64)
    ones = jnp.ones((N_BITS, n, 1), jnp.int64)
    zeros = jnp.zeros((N_BITS, n, 1), jnp.int64)
    dbl_not_last = ones.at[N_BITS - 1].set(0)

    def aux_cols(aux: g1_add.G1AddAux):
        return [
            aux.is_x_eq[..., None],
            aux.is_x_eq_aux.inv,
            aux.is_x_eq_aux.modulus_zero_aux.is_quot_positive[..., None],
            aux.is_x_eq_aux.modulus_zero_aux.quot_abs,
            aux.is_x_eq_aux.modulus_zero_aux.aux_lo,
            aux.is_x_eq_aux.modulus_zero_aux.aux_hi,
            aux.is_x_eq_filter[..., None],
            aux.lam,
        ] + [
            arr
            for mz in (aux.lambda_aux, aux.x_aux, aux.y_aux)
            for arr in (
                mz.is_quot_positive[..., None],
                mz.quot_abs,
                mz.aux_lo,
                mz.aux_hi,
            )
        ]

    add_rows = jnp.concatenate(
        [d_ax[:N_BITS], d_ay[:N_BITS], p_ax, p_ay]  # double, sum
        + [pp_ax, pp_ay, d_ax[:N_BITS], d_ay[:N_BITS], add_cx, add_cy]  # a,b,c
        + aux_cols(add_aux)
        + [bits_rot, add_flags, ts, ones, zeros, ones, zeros, zeros],
        axis=-1,
    )
    dbl_rows = jnp.concatenate(
        [d_ax[1:], d_ay[1:], p_ax, p_ay]  # double = d_{k+1}, sum = p_k
        + [d_ax[:N_BITS], d_ay[:N_BITS], d_ax[:N_BITS], d_ay[:N_BITS], dbl_cx, dbl_cy]
        + aux_cols(dbl_aux)
        + [bits_rot, dbl_flags, ts, zeros, dbl_not_last, ones, zeros, zeros],
        axis=-1,
    )
    per_op = jnp.stack([add_rows, dbl_rows], axis=1)  # [256, 2, n, 781]
    per_op = jnp.transpose(per_op, (2, 0, 1, 3)).reshape(
        n * G1_PERIOD, LAYOUT.width
    )
    return per_op.astype(jnp.uint64)


def _unroll_for(arr):
    """Partially-unrolled limb carries on the real chip (factor 8: the
    nested-scan per-iteration overhead dominates the chain scans, but a
    FULL unroll makes the remote TPU compiler crawl), plain scans on XLA
    CPU; identical integer math either way, so traces are bit-identical
    across the lowerings."""
    try:
        return 8 if all(d.platform == "tpu" for d in arr.devices()) else False
    except Exception:
        return False


def generate_trace_core(x_limbs, y_limbs, ox_limbs, oy_limbs, s_bits, timestamps):
    """[n,16] x/y/offset limbs, [n,256] bits, [n] ts -> [n*512, 781] u64."""
    d_ax, d_ay, p_ax, p_ay, pp_ax, pp_ay = _chains(
        x_limbs, y_limbs, ox_limbs, oy_limbs, s_bits,
        unroll=_unroll_for(x_limbs),
    )
    add_cx, add_cy, add_aux = g1_add.generate_g1_add(
        pp_ax, pp_ay, d_ax[:N_BITS], d_ay[:N_BITS]
    )
    dbl_cx, dbl_cy, dbl_aux = g1_add.generate_g1_add(
        d_ax[:N_BITS], d_ay[:N_BITS], d_ax[:N_BITS], d_ay[:N_BITS]
    )
    return _assemble(
        d_ax, d_ay, p_ax, p_ay, pp_ax, pp_ay,
        add_cx, add_cy, add_aux, dbl_cx, dbl_cy, dbl_aux,
        s_bits, timestamps,
    )


@jax.jit
def add_range_checks(rows: jnp.ndarray) -> jnp.ndarray:
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
    """inputs: list of (s, (x, y), (ox, oy), timestamp) python ints ->
    [num_rows, 781] uint64."""
    from .limbs import h_bits_le, h_int_to_limbs

    n = len(inputs)
    num_rows = max(min_rows, n * G1_PERIOD)
    num_rows = 1 << (num_rows - 1).bit_length()
    # ONE bundled host->device transfer: on the tunnelled remote chip each
    # transfer costs a full round trip, and six small per-proof transfers
    # used to dominate trace-generation wall clock.
    bundle = np.zeros((n, 4 * N_LIMBS + N_BITS + 1), dtype=np.int64)
    for i, (s, p, o, t) in enumerate(inputs):
        bundle[i, : N_LIMBS] = h_int_to_limbs(int(p[0]))
        bundle[i, N_LIMBS : 2 * N_LIMBS] = h_int_to_limbs(int(p[1]))
        bundle[i, 2 * N_LIMBS : 3 * N_LIMBS] = h_int_to_limbs(int(o[0]))
        bundle[i, 3 * N_LIMBS : 4 * N_LIMBS] = h_int_to_limbs(int(o[1]))
        bundle[i, 4 * N_LIMBS : 4 * N_LIMBS + N_BITS] = h_bits_le(int(s))
        bundle[i, -1] = int(t)
    dev = jnp.asarray(bundle)
    xs = dev[:, :N_LIMBS]
    ys = dev[:, N_LIMBS : 2 * N_LIMBS]
    oxs = dev[:, 2 * N_LIMBS : 3 * N_LIMBS]
    oys = dev[:, 3 * N_LIMBS : 4 * N_LIMBS]
    s_bits = dev[:, 4 * N_LIMBS : 4 * N_LIMBS + N_BITS]
    ts = dev[:, -1]
    rows = generate_trace_core(xs, ys, oxs, oys, s_bits, ts)
    pad = jnp.zeros((num_rows - rows.shape[0], LAYOUT.width), jnp.uint64)
    return add_range_checks(jnp.concatenate([rows, pad], axis=0))


# ---------------------------------------------------------------------------
# AIR constraints (mirror of scalar_mul_stark.rs:226-339)
# ---------------------------------------------------------------------------


def eval_g1_scalar_mul(consumer, ring, local, next_):
    lv = LAYOUT.view(local)
    nv = LAYOUT.view(next_)
    modulus = [ring.const(m) for m in bigint.MOD_LIMBS_INT]
    one = ring.one()

    is_not_last_round = lv["filter"] - lv["round_flags"]["is_last_round"]
    is_next_not_last = nv["filter"] - nv["round_flags"]["is_last_round"]

    g1_add.eval_g1_add(
        consumer, ring, lv["filter"], modulus, lv["a"], lv["b"], lv["c"], lv["add_aux"]
    )
    first = lv["round_flags"]["is_first_round"]
    eval_eq(consumer, first, lv["is_adding"], one)
    eval_eq(consumer, first, lv["double"]["x"] + lv["double"]["y"], lv["b"]["x"] + lv["b"]["y"])
    first_bit0 = lv["bits"][0] * first
    first_not_bit0 = (one - lv["bits"][0]) * first
    eval_eq(consumer, first_bit0, lv["sum"]["x"] + lv["sum"]["y"], lv["c"]["x"] + lv["c"]["y"])
    eval_eq(consumer, first_not_bit0, lv["sum"]["x"] + lv["sum"]["y"], lv["a"]["x"] + lv["a"]["y"])

    # doubling_step -> addition_step
    dbl = lv["is_doubling_not_last"]
    eval_eq(consumer, dbl, nv["a"]["x"] + nv["a"]["y"], lv["sum"]["x"] + lv["sum"]["y"])
    eval_eq(consumer, dbl, nv["b"]["x"] + nv["b"]["y"], lv["double"]["x"] + lv["double"]["y"])
    eval_eq(consumer, nv["bits"][0] * dbl, nv["sum"]["x"] + nv["sum"]["y"], nv["c"]["x"] + nv["c"]["y"])
    eval_eq(
        consumer,
        (one - nv["bits"][0]) * dbl,
        nv["sum"]["x"] + nv["sum"]["y"],
        nv["a"]["x"] + nv["a"]["y"],
    )
    eval_eq(consumer, dbl, nv["double"]["x"] + nv["double"]["y"], lv["double"]["x"] + lv["double"]["y"])
    eval_eq(consumer, dbl, nv["is_adding"], one)
    eval_eq(consumer, dbl, nv["is_doubling_not_last"], ring.zero())
    eval_eq(
        consumer, dbl, nv["bits"],
        [lv["bits"][(i + 1) % N_BITS] for i in range(N_BITS)],
    )

    # addition_step -> doubling_step
    ad = lv["is_adding"]
    eval_eq(consumer, ad, nv["a"]["x"] + nv["a"]["y"], lv["double"]["x"] + lv["double"]["y"])
    eval_eq(consumer, ad, nv["b"]["x"] + nv["b"]["y"], lv["double"]["x"] + lv["double"]["y"])
    eval_eq(consumer, ad, nv["sum"]["x"] + nv["sum"]["y"], lv["sum"]["x"] + lv["sum"]["y"])
    eval_eq(consumer, ad, nv["double"]["x"] + nv["double"]["y"], nv["c"]["x"] + nv["c"]["y"])
    eval_eq(consumer, ad, nv["is_adding"], ring.zero())
    eval_eq(consumer, ad, nv["is_doubling_not_last"], is_next_not_last)
    eval_eq(consumer, ad, nv["bits"], lv["bits"])

    round_flags.eval_round_flags(
        consumer,
        ring,
        G1_PERIOD,
        lv["filter"],
        lv["round_flags"],
        nv["round_flags"]["counter"],
    )
    eval_eq(consumer, is_not_last_round, nv["timestamp"], lv["timestamp"])
    eval_eq(consumer, is_not_last_round, nv["filter"], lv["filter"])

    diff = nv["range_counter"] - lv["range_counter"]
    consumer.constraint_transition(diff * diff - diff)
    consumer.constraint_last_row(
        lv["range_counter"] - ring.const((1 << LIMB_BITS) - 1)
    )


# ---------------------------------------------------------------------------
# Lookup / CTL specs (scalar_mul_view.rs:16-30, scalar_mul_ctl.rs:20-80)
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

    a0 = LAYOUT.range("a").start
    b0 = LAYOUT.range("b").start
    sum0 = LAYOUT.range("sum").start
    bits0 = LAYOUT.range("bits").start
    ts = LAYOUT.col("timestamp")
    input_cols = [("single", b0 + i) for i in range(G1_LEN)]
    input_cols += [("single", a0 + i) for i in range(G1_LEN)]
    input_cols += [
        ("le_bits", list(range(bits0 + k * LIMB_BITS, bits0 + (k + 1) * LIMB_BITS)))
        for k in range(N_BITS // LIMB_BITS)
    ]
    input_cols.append(("single", ts))
    output_cols = [("single", sum0 + i) for i in range(G1_LEN)] + [("single", ts)]
    return [
        CtlSpec(columns=input_cols, filter_col=LAYOUT.col("round_flags", "is_first_round")),
        CtlSpec(columns=output_cols, filter_col=LAYOUT.col("round_flags", "is_last_round")),
    ]


def generate_ctl_values(inputs):
    """Host mirror of g1_generate_ctl_values (scalar_mul_ctl.rs:57-80)."""
    from ..bn254 import oracle
    from .limbs import h_int_to_limbs

    ins, outs = [], []
    for s, x, offset, t in inputs:
        row = (
            h_int_to_limbs(x[0], 16)
            + h_int_to_limbs(x[1], 16)
            + h_int_to_limbs(offset[0], 16)
            + h_int_to_limbs(offset[1], 16)
            + h_int_to_limbs(s, 16)
            + [t]
        )
        ins.append(row)
        out_pt = oracle.g1_add(oracle.g1_mul(x, s), offset)
        outs.append(
            h_int_to_limbs(out_pt[0], 16) + h_int_to_limbs(out_pt[1], 16) + [t]
        )
    return {0: ins, 1: outs}
