"""MXU-friendly histogram for the range-check frequency columns.

Every production machine needs `freq[v] = #occurrences of v` over tens of
millions of 16-bit trace cells (the LogUp range-check table — reference
`generate_range_checks`, e.g. g1/scalar_mul_stark.rs:71-87).  XLA lowers
`jnp.bincount` to a serialized scatter-add on TPU (~3.5s for the G1 trace
— half the proof!); this instead splits each value into bytes and builds
the 256x256 2-D histogram as ONE-HOT MATMULS on the MXU:

    hist2d[a, b] = #{i : hi_i = a and lo_i = b} = OneHotHi^T @ OneHotLo

f32 accumulation is exact (counts and one-hot entries are integers far
below 2^24), and the value stream is chunked so the one-hot operands
stay HBM-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CHUNK = 1 << 20


def bincount16(values: jnp.ndarray, length: int) -> jnp.ndarray:
    """Histogram of 16-bit `values` (any shape, dtype int32/uint64) over
    bins [0, 65536), zero-padded/truncated to `length` (uint64 output)."""
    flat = values.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    pad = (-n) % _CHUNK
    if pad:
        # pad with bin -1 sentinel -> contributes to no bin (== comparisons
        # against 0..255 all fail for hi byte -1)
        flat = jnp.concatenate([flat, jnp.full((pad,), -256, jnp.int32)])
    chunks = flat.reshape(-1, _CHUNK)
    codes = jnp.arange(256, dtype=jnp.int32)

    def body(acc, vals):
        hi = vals >> 8
        lo = vals & 255
        oh_hi = (hi[:, None] == codes[None, :]).astype(jnp.bfloat16)
        oh_lo = (lo[:, None] == codes[None, :]).astype(jnp.bfloat16)
        counts = jax.lax.dot_general(
            oh_hi,
            oh_lo,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # per-chunk counts <= 2^20 are exact in f32; accumulate in int32
        # (a single bin can collect > 2^24 across chunks, past f32's
        # exact-integer range)
        return acc + counts.astype(jnp.int32), None

    acc, _ = jax.lax.scan(body, jnp.zeros((256, 256), jnp.int32), chunks)
    hist = acc.reshape(65536).astype(jnp.uint64)
    if length >= 65536:
        return jnp.concatenate(
            [hist, jnp.zeros((length - 65536,), jnp.uint64)]
        )
    return hist[:length]
