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
  * multi-host: CLIs call `maybe_initialize_distributed()` (env-gated
    `jax.distributed.initialize()`) before any backend touch; barriers
    become implicit in SPMD collectives; writes are gated/sharded on
    `process_index()` (2-process harness: tests/test_multihost.py).
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
    "maybe_initialize_distributed",
    "process_index",
    "print0",
    "pad_to_multiple",
]


def maybe_initialize_distributed() -> bool:
    """Multi-host bring-up: call `jax.distributed.initialize()` when launched
    as one process of a multi-process job, else no-op.

    Replaces the reference's `torch_utils/distributed.py:14-31` init()
    (MASTER_ADDR/RANK env dance + process-group init).  Activation is
    env-gated so single-host runs never pay a rendezvous:

      * explicit: DST_COORDINATOR[, DST_NUM_PROCESSES, DST_PROCESS_ID] --
        our own env surface, mirroring the reference's MASTER_ADDR surface,
      * automatic: JAX_COORDINATOR_ADDRESS set by a launcher, or a real
        multi-host TPU slice (jax.distributed.initialize() auto-detects).

    Idempotent: a second call (e.g. CLI invoked twice in-process in tests)
    is a no-op.  Returns True iff distributed was initialized by this call.
    """
    import os

    if getattr(maybe_initialize_distributed, "_done", False):
        return False
    coord = os.environ.get("DST_COORDINATOR") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coord is None:
        return False
    kwargs = {}
    if os.environ.get("DST_COORDINATOR"):
        kwargs["coordinator_address"] = os.environ["DST_COORDINATOR"]
        if os.environ.get("DST_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["DST_NUM_PROCESSES"])
        if os.environ.get("DST_PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["DST_PROCESS_ID"])
        if os.environ.get("DST_LOCAL_DEVICE_IDS"):
            kwargs["local_device_ids"] = [
                int(i) for i in os.environ["DST_LOCAL_DEVICE_IDS"].split(",")]
    jax.distributed.initialize(**kwargs)
    maybe_initialize_distributed._done = True
    return True


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
