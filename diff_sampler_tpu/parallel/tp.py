"""Tensor-parallel (Megatron-style) parameter shardings over a 2-D
('data', 'model') mesh.

The reference is data-parallel only (DDP, `torch_utils/distributed.py`);
this module is the TPU-native scaling tier beyond that: shard the BIG
weight matrices of a U-Net over a 'model' mesh axis, let GSPMD propagate
activation shardings and insert the collectives (psum after every
row-parallel projection), and combine freely with batch sharding on the
'data' axis.  No communication code is written here at all -- the design
is "pick a mesh, annotate shardings, let XLA do the rest".

Sharding plan (everything not listed stays replicated -- XLA slices
replicated operands for free, so norms/biases/modulation cost nothing):

  residual blocks   in_layers_2 / conv0   column-parallel (out channels)
                    out_layers_3 / conv1  row-parallel (in channels, psum)
  attention         qkv (1x1 conv)        column-parallel; both the EDM
                    (head, ch, 3) and the guided-diffusion (head, 3ch)
                    interleaved layouts put the HEAD factor first, so a
                    contiguous shard of the fused dim is a shard over
                    heads whenever tp divides the head count
                    proj / proj_out       row-parallel (psum back to the
                    replicated residual stream)
  cross-attention   to_q / to_k / to_v    column-parallel (heads)
  (SpatialTransformer)  to_out_0          row-parallel
  feed-forward      net_0_proj            column-parallel
                    net_2                 row-parallel

The transformer's proj_in/proj_out convs and its LayerNorms stay
replicated so the inner residual stream is replicated (the Megatron
convention); proj_out is row-parallel only in the pixel-attention blocks
(recognised by a qkv sibling and no proj_in sibling).

Caveats, stated rather than hidden:
  * GEGLU (net_0_proj) fuses [a | gelu-gate] in one output dim; a
    contiguous shard of that dim does not align with the split, so XLA
    inserts a reshard at the gate.  Correct always; measure before
    leaning on it at scale.
  * tp should divide the head count (and 32, the GroupNorm group count)
    or GSPMD resolves the mismatch with gathers.
  * The Pallas flash-attention kernel is an opaque call to GSPMD.  When
    `pallas_attention.set_tp_context(mesh)` is installed (the TP CLIs do),
    sdpa wraps the kernel in shard_map over the (data, model) mesh --
    attention is embarrassingly parallel over heads, so each device runs
    the same kernel on its local [B/dp, T, H/tp, d] block with zero
    collectives and O(T d) memory.  Without the context (or when heads
    don't divide tp), GSPMD handles the einsum path natively and the
    flash path degrades to a gather -- correct, but measure it.

Weights whose sharded dimension is not divisible by the 'model' axis
size fall back to replicated, so any net can be passed through
`tp_param_specs` safely.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["get_mesh_2d", "tp_param_specs", "shard_params_tp",
           "count_sharded"]

# module-name suffixes -> role; matched against the second-to-last path
# component (the owning module), leaf must be a >=2-D "kernel".
_COL_SUFFIXES = ("in_layers_2", "conv0", "qkv", "to_q", "to_k", "to_v",
                 "net_0_proj")
_ROW_SUFFIXES = ("out_layers_3", "conv1", "to_out_0", "net_2")


def get_mesh_2d(tp_size: int, devices: Optional[Sequence] = None,
                data_axis: str = "data", model_axis: str = "model") -> Mesh:
    """(n_devices/tp, tp) mesh; the model axis is the FASTER-varying one so
    tensor-parallel collectives ride neighbouring devices (ICI on a real
    slice, cf. the mesh-ordering advice of the scaling literature)."""
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) % tp_size:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"tp_size={tp_size}")
    grid = np.asarray(devices).reshape(len(devices) // tp_size, tp_size)
    return Mesh(grid, (data_axis, model_axis))


def _role(module_name: str, all_names: frozenset) -> Optional[str]:
    if module_name == "proj" or module_name.endswith("_proj"):
        # EDM UNetBlock attention out-projection (sibling 'qkv'); other
        # *_proj names (e.g. net_0_proj) fall through to the suffix table.
        prefix = module_name[: -len("proj")].rstrip("_")
        sib = f"{prefix}_qkv" if prefix else "qkv"
        if sib in all_names:
            return "row"
    elif module_name == "proj_out" or module_name.endswith("_proj_out"):
        prefix = module_name[: -len("proj_out")].rstrip("_")
        pin = f"{prefix}_proj_in" if prefix else "proj_in"
        qkv = f"{prefix}_qkv" if prefix else "qkv"
        if pin in all_names:
            return None  # SpatialTransformer boundary: keep replicated
        if qkv in all_names:
            return "row"  # guided-diffusion pixel attention
        return None
    for s in _COL_SUFFIXES:
        if module_name == s or module_name.endswith("_" + s):
            return "col"
    for s in _ROW_SUFFIXES:
        if module_name == s or module_name.endswith("_" + s):
            return "row"
    return None


def tp_param_specs(params, tp_size: int, model_axis: str = "model"):
    """PartitionSpec pytree for a U-Net param tree (LDMUNet's flat naming or
    SongUNet/DhariwalUNet's nested blocks), per the module-docstring plan."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = frozenset(
        str(p[-2].key) for p, _ in flat
        if len(p) >= 2 and hasattr(p[-2], "key"))

    def spec_for(path, leaf):
        if len(path) < 2 or not hasattr(path[-2], "key"):
            return P()
        leaf_name = getattr(path[-1], "key", None)
        if leaf_name != "kernel" or leaf.ndim not in (2, 4):
            return P()
        role = _role(str(path[-2].key), names)
        if role == "col" and leaf.shape[-1] % tp_size == 0:
            return P(*([None] * (leaf.ndim - 1)), model_axis)
        if role == "row":
            # conv kernels are HWIO (contract dim 2); linear kernels are
            # (in, out) (contract dim 0)
            cdim = 2 if leaf.ndim == 4 else 0
            if leaf.shape[cdim] % tp_size == 0:
                spec = [None] * leaf.ndim
                spec[cdim] = model_axis
                return P(*spec)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params_tp(params, mesh: Mesh, specs=None, tp_size: Optional[int] = None,
                    model_axis: str = "model"):
    """Place a param tree on the mesh with tensor-parallel shardings
    (replicated over every other axis)."""
    if specs is None:
        tp = tp_size if tp_size is not None else mesh.shape[model_axis]
        specs = tp_param_specs(params, tp, model_axis)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs)


def count_sharded(specs) -> int:
    """Number of leaves with a non-trivial spec (diagnostics/tests)."""
    return sum(1 for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)) if tuple(s) != ())
