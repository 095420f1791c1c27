"""Per-seed deterministic RNG.

Replaces the reference's `StackedRandomGenerator`
(`diff-solvers-main/sample.py:22-36`): image i must be a pure function of
seed i, regardless of batch size, batch split, or device count.  On TPU this
is `jax.random.fold_in` per seed + a vmapped `normal`, entirely on device
(the reference builds one CPU `torch.Generator` per sample).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["stacked_randn", "stacked_randint", "batch_keys"]

_BASE_KEY = jax.random.key(0)


def batch_keys(seeds: jax.Array) -> jax.Array:
    """One PRNG key per seed, each a pure function of the seed value."""
    seeds = jnp.asarray(seeds, jnp.uint32)
    return jax.vmap(lambda s: jax.random.fold_in(_BASE_KEY, s))(seeds)


def stacked_randn(seeds, shape: Sequence[int], dtype=jnp.float32) -> jax.Array:
    """[len(seeds), *shape] standard normals; row i depends only on seeds[i]."""
    keys = batch_keys(jnp.asarray(seeds))
    return jax.vmap(lambda k: jax.random.normal(k, tuple(shape), dtype))(keys)


def stacked_randint(seeds, shape: Sequence[int], minval: int, maxval: int,
                    dtype=jnp.int32) -> jax.Array:
    """[len(seeds), *shape] uniform ints; row i depends only on seeds[i].
    A second fold_in(1) decorrelates from stacked_randn on the same seed."""
    keys = batch_keys(jnp.asarray(seeds))
    keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
    return jax.vmap(lambda k: jax.random.randint(k, tuple(shape), minval, maxval, dtype))(keys)
