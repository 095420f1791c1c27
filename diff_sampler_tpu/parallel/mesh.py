"""Device mesh + data-parallel helpers.

Replaces the reference's entire distributed backend
(`torch_utils/distributed.py`, 59 LoC of NCCL process-group setup) with XLA
collectives over a `jax.sharding.Mesh`:

  * seed-sharded sampling: the global seed list is split across the 'data'
    axis (the reference shards seeds round-robin across ranks,
    `sample.py:167-169`); per-seed RNG keeps image i a pure function of
    seed i at any device count,
  * training: params replicated, batch sharded on 'data', gradients psum'd
    by XLA -- exactly replacing DDP + gradient accumulation,
  * multi-host: `jax.distributed.initialize()` before mesh construction;
    barriers become implicit in SPMD collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "get_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "process_index",
    "print0",
    "pad_to_multiple",
]


def get_mesh(axis_name: str = "data", devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    """Shard dim 0 over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, axis_name: str = "data"):
    """Place a host array with dim 0 sharded across the mesh."""
    return jax.device_put(x, data_sharding(mesh, x.ndim, axis_name))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. params) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def process_index() -> int:
    return jax.process_index()


def print0(*args, **kwargs):
    """Print only on process 0 (the reference's dist.print0,
    torch_utils/distributed.py:55-57)."""
    if jax.process_index() == 0:
        print(*args, **kwargs)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n (for padding seed lists so the
    batch divides the mesh)."""
    return ((n + m - 1) // m) * m
