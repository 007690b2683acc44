"""Polynomial batch commitment: values -> coefficients + coset LDE + Merkle.

Rebuild of the reference fork's `PolynomialBatch::from_values`
(SURVEY.md §3.3 HOT LOOP 2; call site common/prover.rs:31-38): batched
iNTT, coset LDE with shift g=7, and a Poseidon Merkle cap over the LDE rows
in bit-reversed order (so FRI fold siblings are adjacent leaves).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field import ntt
from .merkle import MerkleTree, build_tree


@functools.lru_cache(maxsize=None)
def bit_rev_perm(n_log: int) -> np.ndarray:
    return ntt._bit_reverse_perm(n_log)


@dataclass
class PolynomialBatch:
    """coeffs: [n_polys, n]; lde: [n_polys, N] natural domain order;
    tree over bit-reversed leaf rows [N, n_polys]."""

    coeffs: jnp.ndarray
    lde: jnp.ndarray
    tree: MerkleTree
    rate_bits: int

    @property
    def cap(self):
        return self.tree.cap


def from_values(values: jnp.ndarray, rate_bits: int, cap_height: int) -> PolynomialBatch:
    """values: [n_polys, n] evaluations on the order-n subgroup."""
    coeffs = ntt.intt(values)
    return from_coeffs(coeffs, rate_bits, cap_height)


def from_coeffs(coeffs: jnp.ndarray, rate_bits: int, cap_height: int) -> PolynomialBatch:
    lde = ntt.coset_lde_from_coeffs(coeffs, rate_bits)
    n_big = lde.shape[-1]
    perm = jnp.asarray(bit_rev_perm(n_big.bit_length() - 1))
    leaves = lde[:, perm].T  # [N, n_polys], bit-reversed domain order
    tree = build_tree(leaves, cap_height)
    return PolynomialBatch(coeffs=coeffs, lde=lde, tree=tree, rate_bits=rate_bits)


def leaf_row(batch: PolynomialBatch, rev_index: int) -> np.ndarray:
    """The committed leaf values at bit-reversed index (host)."""
    n_big = batch.lde.shape[-1]
    perm = bit_rev_perm(n_big.bit_length() - 1)
    return np.asarray(batch.lde[:, int(perm[rev_index])])
