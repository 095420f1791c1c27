"""Fully-sharded data parallel (ZeRO-3-style) parameter/optimizer shardings.

Motivation (measured, BENCH_NOTES "Latent-tier training on chip"): the 860M
Stable-Diffusion SFD student does NOT fit one 15.75 GiB v5e at the f32
4-copy footprint -- student + Adam m + v at f32 are 10.3 GiB before the
frozen teacher and activations; round 4 made it fit with bf16 moments.  The
TPU-idiomatic fix at scale is to shard those copies over the *data* axis:
every device holds 1/n of each weight, the forward all-gathers a transient
full copy per use, and gradients reduce-scatter straight back into shards.
The reference has no equivalent (DDP replicates everything,
`sfd-main/training/training_loop.py:214`); this is a beyond-reference tier
like parallel/tp.py.

No communication code lives here -- the scaling-book recipe: pick a mesh,
annotate shardings, let GSPMD insert the all-gather/reduce-scatter pairs.

  * `fsdp_param_specs(params, n_shard)` shards the LARGEST dim of every
    big-enough leaf over the data axis (falls back to any divisible dim,
    then to replicated -- always safe to apply to any tree),
  * params, the frozen teacher, and the Adam moments all take the same
    specs (the moments inherit automatically when `optimizer.init` runs on
    placed params),
  * combine with the existing microbatch-accumulation scan untouched: the
    train step's carried params keep their shardings because jit
    in/out_shardings pin both ends of the scan.

Unlike tensor parallelism there is no per-op math to get right, so any
model tier (pixel EDM, ADM, latent LDM/SD) shards without a plan table.
Trade-off: one all-gather per weight USE (forward and backward), so it
pays when memory-bound, not when flops-bound -- the 860M SD student at
batch 8 is exactly the memory-bound case.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["fsdp_param_specs", "shard_params_fsdp", "count_sharded_fsdp",
           "fsdp_bytes_per_device"]

# Leaves smaller than this stay replicated: gathering a few KiB per use
# costs latency and saves nothing (biases, norm scales, embeddings).
_MIN_SHARD_ELEMS = 2 ** 14


def fsdp_param_specs(params, n_shard: int, axis_name: str = "data",
                     min_shard_elems=None):
    """PartitionSpec pytree sharding each leaf's largest divisible dim.

    Works on ANY param/optimizer tree (no naming assumptions, unlike
    `tp_param_specs`): a leaf is sharded over `axis_name` along its largest
    dim that divides by `n_shard`; ties break toward the LAST such dim
    (an arbitrary but deterministic choice -- GSPMD re-layouts either way,
    and correctness never depends on it); leaves with < min_shard_elems
    elements or no divisible dim stay replicated.
    """
    if min_shard_elems is None:
        # read the module global at CALL time so tests (and callers) can
        # lower the floor without threading the kwarg through every CLI
        min_shard_elems = _MIN_SHARD_ELEMS

    def spec_for(leaf):
        shape = getattr(leaf, "shape", ())
        if not shape or int(np.prod(shape)) < min_shard_elems:
            return P()
        best = -1
        for i, d in enumerate(shape):
            if d % n_shard == 0 and (best < 0 or d >= shape[best]):
                best = i
        if best < 0:
            return P()
        spec = [None] * len(shape)
        spec[best] = axis_name
        return P(*spec)

    return jax.tree.map(spec_for, params)


def shard_params_fsdp(params, mesh: Mesh, specs=None,
                      axis_name: str = "data",
                      min_shard_elems: int = _MIN_SHARD_ELEMS):
    """Place a param tree on the mesh with FSDP shardings."""
    if specs is None:
        specs = fsdp_param_specs(params, mesh.shape[axis_name], axis_name,
                                 min_shard_elems)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs)


def count_sharded_fsdp(specs) -> int:
    """Number of leaves with a non-trivial spec (diagnostics/tests)."""
    return sum(1 for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)) if tuple(s) != ())


def fsdp_bytes_per_device(params, specs, n_shard: int) -> int:
    """Per-device resident bytes for a tree under the given specs
    (diagnostics: compare against replicated = total bytes)."""
    total = 0
    for leaf, s in zip(jax.tree.leaves(params),
                       jax.tree_util.tree_leaves(
                           specs, is_leaf=lambda x: isinstance(x, P))):
        nbytes = leaf.size * leaf.dtype.itemsize
        total += nbytes // n_shard if tuple(s) != () else nbytes
    return total
