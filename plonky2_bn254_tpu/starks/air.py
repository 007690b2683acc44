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

    def const(self, x) -> GL:
        if isinstance(x, int):
            return GL(jnp.full(self.shape, jnp.uint64(x % gl.P)))
        # traced scalar (uint64 0-d array): broadcast to the ring shape
        return GL(jnp.broadcast_to(jnp.asarray(x, jnp.uint64), self.shape))

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

    `alpha_pows` (optional, GL ring only): [num_challenges, K] uint64 array
    of host-precomputed alpha powers enabling `constraint_many` to fold a
    whole GROUP of constraints with one weighted mod-sum — this keeps the
    jitted quotient graph small (SURVEY.md hard part: compile scaling).
    """

    def __init__(self, ring, alphas, z_last, l_first, l_last, alpha_pows=None):
        self.ring = ring
        self.alphas = alphas
        self.z_last = z_last
        self.l_first = l_first
        self.l_last = l_last
        self.alpha_pows = alpha_pows
        self.accs = [ring.zero() for _ in alphas]
        self.count = 0

    def _accumulate(self, term):
        self.accs = [acc * alpha + term for acc, alpha in zip(self.accs, self.alphas)]
        self.count += 1

    def constraint(self, c):
        """Must vanish on every row."""
        self._accumulate(c)

    def constraint_many(self, items):
        """Fold a group of every-row constraints, equivalent to calling
        `constraint` on each in order (Horner identity:
        acc*alpha^k + sum_j alpha^(k-1-j) c_j)."""
        items = list(items)
        k = len(items)
        if k == 0:
            return
        if self.alpha_pows is None or not isinstance(items[0], GL):
            for c in items:
                self.constraint(c)
            return
        import jax.numpy as _jnp

        stacked = _jnp.stack([c.v for c in items])  # [k, rows]
        self.constraint_many_arr(stacked)

    def constraint_many_arr(self, stacked):
        """Fold an already-stacked [k, rows] uint64 constraint group."""
        k = stacked.shape[0]
        if k == 0:
            return
        import jax.numpy as _jnp

        for i in range(len(self.accs)):
            # weights alpha^(k-1-j) for constraint j
            w = self.alpha_pows[i, :k][::-1]
            term = gl.mul(stacked, w[:, None])
            while term.shape[0] > 1:
                m = term.shape[0]
                if m % 2 == 1:
                    term = _jnp.concatenate(
                        [gl.add(term[:1], term[m - 1 :]), term[1 : m - 1]], axis=0
                    )
                    m -= 1
                half = m // 2
                term = gl.add(term[:half], term[half:])
            alpha_k = self.ring.const(self.alpha_pows[i, k])
            self.accs[i] = self.accs[i] * alpha_k + GL(term[0])
        self.count += k

    def constraint_transition(self, c):
        """Must vanish on every row but the last."""
        self._accumulate(c * self.z_last)

    def constraint_first_row(self, c):
        self._accumulate(c * self.l_first)

    def constraint_last_row(self, c):
        self._accumulate(c * self.l_last)


def eval_eq(consumer, filt, a, b):
    """filter * (a - b) = 0; a/b are values or equal-length lists of values.

    Rebuild of the reference's EvalEq trait (common/eq.rs:11-67); list
    inputs fold through constraint_many (stack-first tensor math in the
    jitted prover, plain loop for scalar rings).
    """
    if isinstance(a, (list, tuple)):
        assert len(a) == len(b)
        if (
            isinstance(a[0], GL)
            and getattr(consumer, "alpha_pows", None) is not None
        ):
            A = jnp.stack([x.v for x in a])
            B = jnp.stack([y.v for y in b])
            consumer.constraint_many_arr(gl.mul(filt.v[None], gl.sub(A, B)))
        else:
            consumer.constraint_many([filt * (x - y) for x, y in zip(a, b)])
    else:
        consumer.constraint(filt * (a - b))
