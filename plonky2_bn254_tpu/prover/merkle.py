"""Poseidon Merkle tree with cap, built level-batched on device.

TPU-native replacement for the Merkle commitment inside the reference's
`PolynomialBatch::from_values` (fork; call site common/prover.rs:31-38).
Leaf hashing vectorizes the whole leaf batch through one sponge program;
every tree level is one batched two_to_one call.  Levels are pulled to host
numpy once per tree for the query phase (random access).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..field import poseidon


@dataclass
class MerkleTree:
    """levels[0] = leaf digests [N, 4]; levels[-1] = cap [2^cap_height, 4]."""

    levels: List[np.ndarray]

    @property
    def cap(self) -> np.ndarray:
        return self.levels[-1]

    def prove(self, index: int) -> List[np.ndarray]:
        """Sibling digests from leaf level up to (excluding) the cap."""
        path = []
        for level in self.levels[:-1]:
            path.append(level[index ^ 1])
            index >>= 1
        return path

    @staticmethod
    def verify(leaf_digest, index: int, path, cap) -> bool:
        from ..field import native

        if native.available():
            cap_node = cap[index >> len(path)]
            ok = native.verify_path(leaf_digest, index, path, cap_node)
            if ok is not None:
                return ok
        h = [int(x) for x in leaf_digest]
        for sib in path:
            s = [int(x) for x in sib]
            if index & 1:
                h = poseidon.h_two_to_one(s, h)
            else:
                h = poseidon.h_two_to_one(h, s)
            index >>= 1
        return h == [int(x) for x in cap[index]]


def hash_leaves(leaves: jnp.ndarray) -> jnp.ndarray:
    """[N, L] uint64 -> [N, 4] digests (device)."""
    return poseidon.hash_no_pad(leaves)


@functools.lru_cache(maxsize=None)
def _tree_fn(n: int, width: int, cap_height: int):
    """One fused jit building the whole tree for a leaf shape: leaf sponge
    plus every compression level in a single executable (one compile per
    shape instead of one per level)."""
    n_levels = (n.bit_length() - 1) - cap_height
    assert n_levels >= 0, "cap larger than tree"

    @jax.jit
    def build(leaves):
        digests = poseidon.hash_no_pad(leaves)
        levels = [digests]
        for _ in range(n_levels):
            digests = poseidon.two_to_one(digests[0::2], digests[1::2])
            levels.append(digests)
        return levels

    return build


def device_tree_levels(leaves: jnp.ndarray, cap_height: int):
    """Device-side tree levels (list of [m, 4] digests), fused per shape."""
    return _tree_fn(leaves.shape[0], leaves.shape[1], cap_height)(leaves)


def build_tree(leaves: jnp.ndarray, cap_height: int) -> MerkleTree:
    """[N, L] uint64 leaf rows -> MerkleTree with 2^cap_height cap."""
    levels = device_tree_levels(leaves, cap_height)
    return MerkleTree(levels=[np.asarray(jax.device_get(l)) for l in levels])


def gather_paths(levels, indices: np.ndarray):
    """Device-side sibling-path gather for a batch of leaf indices.

    `levels`: device digest levels (leaf level first, cap last);
    `indices`: [Q] leaf indices.  Returns a list (per level below the cap)
    of [Q, 4] numpy digests — the only host transfer is the gathered data.
    """
    paths = []
    cur = np.asarray(indices, dtype=np.int64)
    for level in levels[:-1]:
        sib = cur ^ 1
        paths.append(np.asarray(level[jnp.asarray(sib)]))
        cur = cur >> 1
    return paths
