"""G2ScalarMulStark: batched s*x + offset over the BN254 twist (Fq2).

Rebuild of /root/reference/src/starks/curves/g2/scalar_mul_stark.rs and
scalar_mul_view.rs (row width 1295) — the same machine shape as G1 with
the Fq2 limb algebra substituted (SURVEY.md §2: the reference's G2 files
are whitespace-identical clones of G1 after type substitution).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import bigint, fq2_alg, g2_add, round_flags
from .air import eval_eq
from .layout import Layout, ROUND_FLAGS_LAYOUT
from .limbs import LIMB_BITS, N_BITS, N_LIMBS, bits_from_ints, from_ints

G2_PERIOD = 2 * N_BITS  # 512
G2_LEN = g2_add.G2_LEN  # 64

POINT2 = Layout([("x", 2 * N_LIMBS), ("y", 2 * N_LIMBS)])

LAYOUT = Layout(
    [
        ("double", POINT2),
        ("sum", POINT2),
        ("a", POINT2),
        ("b", POINT2),
        ("c", POINT2),
        ("add_aux", g2_add.G2_ADD_AUX_LAYOUT),
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
assert LAYOUT.width == 1295  # G2_SCALAR_MUL_VIEW_LEN (g2/scalar_mul_view.rs:13-14)

RANGE_CHECK_COLS = range(2 * G2_LEN, 5 * G2_LEN + g2_add.G2_ADD_AUX_LEN)
FREQ_COL = LAYOUT.col("frequency")
RANGE_COUNTER_COL = LAYOUT.col("range_counter")


def _aux_cols(aux: g2_add.G2AddAux):
    def mz(m):
        return [m.is_quot_positive[..., None], m.quot_abs, m.aux_lo, m.aux_hi]

    def imz(m):
        return [m.inv] + mz(m.modulus_zero_aux)

    def ext(e):
        return mz(e.c0_aux) + mz(e.c1_aux)

    return (
        [
            aux.is_x_eq[..., None],
            aux.is_x_eq_aux.is_c0_zero[..., None],
            aux.is_x_eq_aux.is_c1_zero[..., None],
        ]
        + imz(aux.is_x_eq_aux.c0_aux)
        + imz(aux.is_x_eq_aux.c1_aux)
        + [aux.is_x_eq_filter[..., None], aux.lam[0], aux.lam[1]]
        + ext(aux.lambda_aux)
        + ext(aux.x_aux)
        + ext(aux.y_aux)
    )


@functools.partial(jax.jit, static_argnames=("unroll",))
def generate_trace_core(x_pair, y_pair, ox_pair, oy_pair, s_bits, timestamps,
                        unroll=False):
    """Fq2 pairs of [n,16] limbs + [n,256] bits + [n] ts -> [n*512, 1295].

    `unroll` partially unrolls the limb-carry scans inside the chain scans
    (TPU; see g1_scalar_mul._unroll_for)."""
    n = s_bits.shape[0]
    one_limb = jnp.zeros_like(x_pair[0]).at[..., 0].set(1)
    zero_limb = jnp.zeros_like(x_pair[0])
    one_f2 = (one_limb, zero_limb)

    def d_step(carry, _):
        X, Y, Z = carry
        return fq2_alg.jac_double(X, Y, Z, unroll=unroll), (X, Y, Z)

    last_d, d_jac = jax.lax.scan(
        d_step, (x_pair, y_pair, one_f2), None, length=N_BITS
    )

    def cat(tree_seq, last):
        return jax.tree.map(
            lambda s, l: jnp.concatenate([s, l[None]], axis=0), tree_seq, last
        )

    dX, dY, dZ = cat(d_jac, last_d)  # pairs of [257, n, 16]
    d_ax, d_ay = fq2_alg.jac_to_affine(dX, dY, dZ, unroll=unroll)

    def p_step(carry, inp):
        X, Y, Z = carry
        dx0, dx1, dy0, dy1, bit_k = inp
        Xa, Ya, Za = fq2_alg.jac_mixed_add(X, Y, Z, (dx0, dx1), (dy0, dy1), unroll=unroll)
        sel = (bit_k == 1)[:, None]
        pick = lambda a, b: (
            jnp.where(sel, a[0], b[0]),
            jnp.where(sel, a[1], b[1]),
        )
        return (pick(Xa, X), pick(Ya, Y), pick(Za, Z)), (X, Y, Z)

    (lastP), p_prev_jac = jax.lax.scan(
        p_step,
        (ox_pair, oy_pair, one_f2),
        (
            d_ax[0][:N_BITS],
            d_ax[1][:N_BITS],
            d_ay[0][:N_BITS],
            d_ay[1][:N_BITS],
            s_bits.T,
        ),
    )
    pX, pY, pZ = cat(jax.tree.map(lambda s: s[1:], p_prev_jac), lastP)  # p_k
    p_ax, p_ay = fq2_alg.jac_to_affine(pX, pY, pZ, unroll=unroll)
    pp_ax, pp_ay = fq2_alg.jac_to_affine(*p_prev_jac, unroll=unroll)

    d_axN = jax.tree.map(lambda s: s[:N_BITS], d_ax)
    d_ayN = jax.tree.map(lambda s: s[:N_BITS], d_ay)
    add_cx, add_cy, add_aux = g2_add.generate_g2_add(pp_ax, pp_ay, d_axN, d_ayN)
    dbl_cx, dbl_cy, dbl_aux = g2_add.generate_g2_add(d_axN, d_ayN, d_axN, d_ayN)

    k_idx = jnp.arange(N_BITS)
    rot_idx = (k_idx[:, None] + k_idx[None, :]) % N_BITS
    bits_rot = jnp.transpose(s_bits[:, rot_idx], (1, 0, 2))

    flags = jnp.asarray(round_flags.flag_tables(G2_PERIOD).astype(np.int64))
    add_flags = jnp.broadcast_to(flags[0::2][:, None, :], (N_BITS, n, 5))
    dbl_flags = jnp.broadcast_to(flags[1::2][:, None, :], (N_BITS, n, 5))
    ts = jnp.broadcast_to(timestamps[None, :, None], (N_BITS, n, 1)).astype(jnp.int64)
    ones = jnp.ones((N_BITS, n, 1), jnp.int64)
    zeros = jnp.zeros((N_BITS, n, 1), jnp.int64)
    dbl_not_last = ones.at[N_BITS - 1].set(0)

    def pt(x, y):
        return [x[0], x[1], y[0], y[1]]

    d_ax1 = (d_ax[0][1:], d_ax[1][1:])
    d_ay1 = (d_ay[0][1:], d_ay[1][1:])
    add_rows = jnp.concatenate(
        pt(d_axN, d_ayN) + pt(p_ax, p_ay)  # double, sum
        + pt(pp_ax, pp_ay) + pt(d_axN, d_ayN) + pt(add_cx, add_cy)  # a, b, c
        + _aux_cols(add_aux)
        + [bits_rot, add_flags, ts, ones, zeros, ones, zeros, zeros],
        axis=-1,
    )
    dbl_rows = jnp.concatenate(
        pt(d_ax1, d_ay1) + pt(p_ax, p_ay)
        + pt(d_axN, d_ayN) + pt(d_axN, d_ayN) + pt(dbl_cx, dbl_cy)
        + _aux_cols(dbl_aux)
        + [bits_rot, dbl_flags, ts, zeros, dbl_not_last, ones, zeros, zeros],
        axis=-1,
    )
    per_op = jnp.stack([add_rows, dbl_rows], axis=1)
    per_op = jnp.transpose(per_op, (2, 0, 1, 3)).reshape(n * G2_PERIOD, LAYOUT.width)
    return per_op.astype(jnp.uint64)


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


class _cache_off:
    """jax's persistent-cache writer segfaults serializing the (very large)
    G2 trace executable; disable the disk cache just for this compile."""

    def __enter__(self):
        self.prev = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", None)

    def __exit__(self, *a):
        jax.config.update("jax_compilation_cache_dir", self.prev)


def generate_trace(inputs, min_rows: int = 1 << LIMB_BITS) -> jnp.ndarray:
    """inputs: list of (s, ((x0,x1),(y0,y1)), ((ox0,ox1),(oy0,oy1)), ts)."""
    n = len(inputs)
    num_rows = max(min_rows, n * G2_PERIOD)
    num_rows = 1 << (num_rows - 1).bit_length()
    from .g1_scalar_mul import _unroll_for
    from .limbs import h_bits_le, h_int_to_limbs

    # ONE bundled host->device transfer (remote-chip round trips dominate)
    bundle = np.zeros((n, 8 * N_LIMBS + N_BITS + 1), dtype=np.int64)
    for i, (sc, p, o, t) in enumerate(inputs):
        vals = [p[0][0], p[0][1], p[1][0], p[1][1],
                o[0][0], o[0][1], o[1][0], o[1][1]]
        for j, v in enumerate(vals):
            bundle[i, j * N_LIMBS : (j + 1) * N_LIMBS] = h_int_to_limbs(int(v))
        bundle[i, 8 * N_LIMBS : 8 * N_LIMBS + N_BITS] = h_bits_le(int(sc))
        bundle[i, -1] = int(t)
    dev = jnp.asarray(bundle)
    sl = lambda j: dev[:, j * N_LIMBS : (j + 1) * N_LIMBS]
    x0, x1, y0, y1, ox0, ox1, oy0, oy1 = (sl(j) for j in range(8))
    s_bits = dev[:, 8 * N_LIMBS : 8 * N_LIMBS + N_BITS]
    ts = dev[:, -1]
    with _cache_off():
        rows = generate_trace_core(
            (x0, x1), (y0, y1), (ox0, ox1), (oy0, oy1), s_bits, ts,
            unroll=_unroll_for(s_bits),
        )
    pad = jnp.zeros((num_rows - rows.shape[0], LAYOUT.width), jnp.uint64)
    return add_range_checks(jnp.concatenate([rows, pad], axis=0))


# ---------------------------------------------------------------------------
# AIR constraints (g2 scalar_mul_stark.rs mirror)
# ---------------------------------------------------------------------------


def eval_g2_scalar_mul(consumer, ring, local, next_):
    lv = LAYOUT.view(local)
    nv = LAYOUT.view(next_)
    modulus = [ring.const(m) for m in bigint.MOD_LIMBS_INT]
    one = ring.one()

    is_not_last_round = lv["filter"] - lv["round_flags"]["is_last_round"]
    is_next_not_last = nv["filter"] - nv["round_flags"]["is_last_round"]

    g2_add.eval_g2_add(
        consumer, ring, lv["filter"], modulus, lv["a"], lv["b"], lv["c"], lv["add_aux"]
    )
    first = lv["round_flags"]["is_first_round"]
    point = lambda v: v["x"] + v["y"]
    eval_eq(consumer, first, lv["is_adding"], one)
    eval_eq(consumer, first, point(lv["double"]), point(lv["b"]))
    first_bit0 = lv["bits"][0] * first
    first_not_bit0 = (one - lv["bits"][0]) * first
    eval_eq(consumer, first_bit0, point(lv["sum"]), point(lv["c"]))
    eval_eq(consumer, first_not_bit0, point(lv["sum"]), point(lv["a"]))

    dbl = lv["is_doubling_not_last"]
    eval_eq(consumer, dbl, point(nv["a"]), point(lv["sum"]))
    eval_eq(consumer, dbl, point(nv["b"]), point(lv["double"]))
    eval_eq(consumer, nv["bits"][0] * dbl, point(nv["sum"]), point(nv["c"]))
    eval_eq(consumer, (one - nv["bits"][0]) * dbl, point(nv["sum"]), point(nv["a"]))
    eval_eq(consumer, dbl, point(nv["double"]), point(lv["double"]))
    eval_eq(consumer, dbl, nv["is_adding"], one)
    eval_eq(consumer, dbl, nv["is_doubling_not_last"], ring.zero())
    eval_eq(
        consumer, dbl, nv["bits"],
        [lv["bits"][(i + 1) % N_BITS] for i in range(N_BITS)],
    )

    ad = lv["is_adding"]
    eval_eq(consumer, ad, point(nv["a"]), point(lv["double"]))
    eval_eq(consumer, ad, point(nv["b"]), point(lv["double"]))
    eval_eq(consumer, ad, point(nv["sum"]), point(lv["sum"]))
    eval_eq(consumer, ad, point(nv["double"]), point(nv["c"]))
    eval_eq(consumer, ad, nv["is_adding"], ring.zero())
    eval_eq(consumer, ad, nv["is_doubling_not_last"], is_next_not_last)
    eval_eq(consumer, ad, nv["bits"], lv["bits"])

    round_flags.eval_round_flags(
        consumer,
        ring,
        G2_PERIOD,
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
    input_cols = [("single", b0 + i) for i in range(G2_LEN)]
    input_cols += [("single", a0 + i) for i in range(G2_LEN)]
    input_cols += [
        ("le_bits", list(range(bits0 + k * LIMB_BITS, bits0 + (k + 1) * LIMB_BITS)))
        for k in range(N_BITS // LIMB_BITS)
    ]
    input_cols.append(("single", ts))
    output_cols = [("single", sum0 + i) for i in range(G2_LEN)] + [("single", ts)]
    return [
        CtlSpec(columns=input_cols, filter_col=LAYOUT.col("round_flags", "is_first_round")),
        CtlSpec(columns=output_cols, filter_col=LAYOUT.col("round_flags", "is_last_round")),
    ]


def generate_ctl_values(inputs):
    """Host mirror of g2_generate_ctl_values."""
    from ..bn254 import oracle
    from .limbs import h_int_to_limbs

    def pt_limbs(p):
        return (
            h_int_to_limbs(p[0][0], 16)
            + h_int_to_limbs(p[0][1], 16)
            + h_int_to_limbs(p[1][0], 16)
            + h_int_to_limbs(p[1][1], 16)
        )

    ins, outs = [], []
    for s, x, offset, t in inputs:
        ins.append(pt_limbs(x) + pt_limbs(offset) + h_int_to_limbs(s, 16) + [t])
        out_pt = oracle.g2_add(oracle.g2_mul(x, s), offset)
        outs.append(pt_limbs(out_pt) + [t])
    return {0: ins, 1: outs}
