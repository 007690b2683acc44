"""Device mesh construction and sharding helpers.

TPU-native scaling layer (SURVEY.md §2 "Parallelism & distributed
backend"): the reference has no distributed components (rayon-only); here
trace blocks, polynomial batches and LDE points are sharded over a
`jax.sharding.Mesh` and XLA GSPMD inserts the ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp", devices=None) -> Mesh:
    """1-D mesh over the first n devices (default: all of the default backend)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def make_mesh2d(shape, axes=("tp", "dp"), devices=None) -> Mesh:
    """2-D mesh (e.g. (2, 4) = tp x dp): the outer axis models the
    DCN/multi-host dimension, the inner axis ICI within a slice.  The
    prover shards polynomial columns over the outer axis and evaluation
    rows over the inner one (prove(col_axis=...))."""
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(shape))
    return Mesh(np.array(devices[:n]).reshape(shape), axes)


def shard_rows(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def shard_cols(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the second axis (e.g. trace columns / polynomial index)."""
    return NamedSharding(mesh, P(None, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
