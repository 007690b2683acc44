"""Constraint-evaluation algebra: one AIR definition, many consumers.

The reference duplicates every constraint as a packed-field flavor and an
`_ext_circuit` flavor (e.g. eval_modulus_zero vs eval_modulus_zero_circuit,
/root/reference/src/starks/modular/modulus_zero.rs:163-253).  Here a single
eval function is written against ring VALUES and a `ConstraintConsumer`;
instantiations:

  * `GL` — Goldilocks uint64 tensors over the LDE domain (prover quotient);
  * `extension.GLExt` — scalar GF(p^2) values at zeta (native verifier);
  * later: circuit-target values (recursive verifier).

The consumer mirrors starky's ConstraintConsumer semantics: every-row,
transition (all but last row), first-row and last-row constraints are
alpha-combined into one accumulator per challenge, pre-divided selector
values supplied by the caller (z_last, lagrange_first/last evaluations).
"""

from __future__ import annotations

from typing import Any, Callable, List

import jax.numpy as jnp

from ..field import goldilocks as gl


class GL:
    """Ring wrapper for Goldilocks uint64 tensors (operator syntax)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __add__(self, o):
        return GL(gl.add(self.v, o.v))

    def __sub__(self, o):
        return GL(gl.sub(self.v, o.v))

    def __mul__(self, o):
        return GL(gl.mul(self.v, o.v))

    def neg(self):
        return GL(gl.neg(self.v))

    def scalar_mul(self, c: int):
        return GL(gl.mul_const(self.v, c))


class GLRing:
    """Ring factory for `GL` values, batched over a fixed shape."""

    def __init__(self, shape=()):
        self.shape = shape

    def const(self, x: int) -> GL:
        return GL(jnp.full(self.shape, jnp.uint64(x % gl.P)))

    def zero(self) -> GL:
        return self.const(0)

    def one(self) -> GL:
        return self.const(1)

    def wrap(self, arr) -> GL:
        return GL(arr)


class HostExtRing:
    """Ring factory for scalar GLExt values (verifier at zeta)."""

    def const(self, x: int):
        from ..field.extension import GLExt

        return GLExt(x % gl.P)

    def zero(self):
        return self.const(0)

    def one(self):
        return self.const(1)

    def wrap(self, v):
        return v


class ConstraintConsumer:
    """Alpha-combines constraints with starky's row-domain semantics.

    `z_last`, `l_first`, `l_last` are ring values (evaluations of
    (x - g^{n-1}), L_0(x), L_{n-1}(x) at the evaluation point(s));
    `alphas` is a list of ring values (one accumulator per challenge).
    """

    def __init__(self, ring, alphas, z_last, l_first, l_last):
        self.ring = ring
        self.alphas = alphas
        self.z_last = z_last
        self.l_first = l_first
        self.l_last = l_last
        self.accs = [ring.zero() for _ in alphas]
        self.count = 0

    def _accumulate(self, term):
        self.accs = [acc * alpha + term for acc, alpha in zip(self.accs, self.alphas)]
        self.count += 1

    def constraint(self, c):
        """Must vanish on every row."""
        self._accumulate(c)

    def constraint_transition(self, c):
        """Must vanish on every row but the last."""
        self._accumulate(c * self.z_last)

    def constraint_first_row(self, c):
        self._accumulate(c * self.l_first)

    def constraint_last_row(self, c):
        self._accumulate(c * self.l_last)


def eval_eq(consumer, filt, a, b):
    """filter * (a - b) = 0; a/b are values or equal-length lists of values.

    Rebuild of the reference's EvalEq trait (common/eq.rs:11-67).
    """
    if isinstance(a, (list, tuple)):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            consumer.constraint(filt * (x - y))
    else:
        consumer.constraint(filt * (a - b))
