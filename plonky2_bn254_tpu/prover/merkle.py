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
def _tree_fn(n: int, width: int, cap_height: int, use_pallas: bool):
    """One fused jit building the whole tree for a leaf shape: leaf sponge
    plus every compression level in a single executable (one compile per
    shape instead of one per level).

    With `use_pallas` (TPU), BOTH the leaf sponge and every level
    compression run through the VMEM-resident pallas kernel:
    two_to_one(l, r) == hash_no_pad(l || r) (zero capacity, one rate-8
    chunk), so a level is the leaf kernel on [m/2, 8] pair rows — small
    levels are zero-padded up to one kernel tile.  The alternative (an
    inlined XLA Poseidon per level) compiled each build executable to
    ~15-20 MB, which costs ~10 s PER SHAPE to ship to the remote chip at
    every process start."""
    n_levels = (n.bit_length() - 1) - cap_height
    assert n_levels >= 0, "cap larger than tree"

    @jax.jit
    def build(leaves):
        if use_pallas:
            from ..field import poseidon_pallas

            digests = poseidon_pallas.hash_leaves(leaves)
        else:
            digests = poseidon.hash_no_pad(leaves)
        levels = [digests]
        for _ in range(n_levels):
            pairs = jnp.concatenate([digests[0::2], digests[1::2]], axis=-1)
            if use_pallas:
                from ..field import poseidon_pallas

                m = pairs.shape[0]
                pad = max(poseidon_pallas.TILE, m) - m
                if pad:
                    pairs = jnp.pad(pairs, ((0, pad), (0, 0)))
                digests = poseidon_pallas.hash_leaves(pairs)[:m]
            else:
                digests = poseidon.two_to_one(digests[0::2], digests[1::2])
            levels.append(digests)
        return levels

    return build


def device_tree_levels(leaves: jnp.ndarray, cap_height: int, use_pallas=False):
    """Device-side tree levels (list of [m, 4] digests), fused per shape."""
    from ..field import poseidon_pallas

    use_pallas = use_pallas and poseidon_pallas.supports(leaves.shape[0])
    return _tree_fn(
        leaves.shape[0], leaves.shape[1], cap_height, use_pallas
    )(leaves)


def build_tree(leaves: jnp.ndarray, cap_height: int) -> MerkleTree:
    """[N, L] uint64 leaf rows -> MerkleTree with 2^cap_height cap."""
    levels = device_tree_levels(leaves, cap_height)
    return MerkleTree(levels=[np.asarray(jax.device_get(l)) for l in levels])


@jax.jit
def _gather_paths_dev(levels, idx):
    paths = []
    cur = idx
    for level in levels[:-1]:
        paths.append(level[cur ^ 1])
        cur = cur >> 1
    return paths


def gather_paths(levels, indices: np.ndarray):
    """Device-side sibling-path gather for a batch of leaf indices.

    `levels`: device digest levels (leaf level first, cap last);
    `indices`: [Q] leaf indices.  Returns a list (per level below the cap)
    of [Q, 4] numpy digests — ONE device dispatch and one transfer for the
    whole path set (a per-level eager gather pays a tunnel round trip per
    level on the remote TPU).
    """
    idx = jnp.asarray(np.asarray(indices, dtype=np.int64))
    return [np.asarray(p) for p in jax.device_get(_gather_paths_dev(levels, idx))]


@functools.partial(jax.jit, static_argnums=(3,))
def _gather_rows_paths_dev(lde_or_leaves, levels, idx, leaf_axis):
    """Rows of the leaf source at `idx` plus sibling paths, one dispatch."""
    if leaf_axis == 0:
        rows = lde_or_leaves[idx]
    else:
        rows = lde_or_leaves[:, idx].T
    return rows, _gather_paths_dev(levels, idx)


def gather_rows_and_paths(lde_or_leaves, levels, indices: np.ndarray, leaf_axis=0):
    """([Q, w] numpy rows, [height][Q, 4] numpy paths) in one round trip.

    `leaf_axis=0`: source is [N, w] leaf rows; `leaf_axis=1`: source is a
    [w, N] column-major LDE (rows are gathered along the point axis).
    """
    idx = jnp.asarray(np.asarray(indices, dtype=np.int64))
    rows, paths = jax.device_get(
        _gather_rows_paths_dev(lde_or_leaves, levels, idx, leaf_axis)
    )
    return np.asarray(rows), [np.asarray(p) for p in paths]
