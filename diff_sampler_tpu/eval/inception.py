"""FID Inception-V3 feature extractor in Flax (NHWC).

The reference downloads NVIDIA's direct PyTorch translation of the original
TF `inception-2015-12-05` graph (`diff-solvers-main/fid.py:32-38`) and takes
the 2048-dim pool3 features.  This module implements the same underlying
network in the standard "FID variant" form (the pytorch-fid lineage of the
identical TF graph): torchvision InceptionV3 layout with the FID
modifications (avg-pool branches with count_include_pad=False; max-pool
pool-branch in the final InceptionE block).

Weights are importable from a pytorch-fid / torchvision state_dict via
`torch_import.state_dict_to_params` (conv OIHW->HWIO handled there; BN
running stats are buffers named running_mean/running_var and map to
mean/var here via `import_inception_state_dict`).

Input: uint8 NHWC images (any resolution); preprocessing (bilinear resize to
299, scale to [-1, 1]) happens inside, mirroring the NVIDIA detector's
internal preprocessing.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["InceptionV3FID", "import_inception_state_dict",
           "import_nvidia_inception_pickle", "FEATURE_DIM"]

FEATURE_DIM = 2048


def _tf1_resize_bilinear(x, out_h: int, out_w: int):
    """TF1 ResizeBilinear with align_corners=False (asymmetric coordinate
    transform src = dst * in/out) -- the resize baked into the original
    inception-2015-12-05 graph that the NVIDIA detector translates.  Differs
    from jax.image.resize's half-pixel-centers convention by a sub-pixel
    shift, which matters at the FID-within-0.05 level."""

    def _axis(size_in, size_out):
        src = jnp.arange(size_out, dtype=jnp.float32) * (size_in / size_out)
        i0 = jnp.floor(src).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, size_in - 1)
        w = src - i0.astype(jnp.float32)
        return i0, i1, w

    i0, i1, wh = _axis(x.shape[1], out_h)
    x = (jnp.take(x, i0, axis=1) * (1.0 - wh)[None, :, None, None]
         + jnp.take(x, i1, axis=1) * wh[None, :, None, None])
    j0, j1, ww = _axis(x.shape[2], out_w)
    x = (jnp.take(x, j0, axis=2) * (1.0 - ww)[None, None, :, None]
         + jnp.take(x, j1, axis=2) * ww[None, None, :, None])
    return x


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: tuple
    stride: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.out_channels, self.kernel, strides=(self.stride,) * 2,
                    padding=pad, use_bias=False, name="conv")(x)
        # inference-mode BN with eps=1e-3 (torchvision BasicConv2d)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_channels,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_channels,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_channels,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_channels,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return jax.nn.relu(x)


def _avg_pool_3x3_no_pad_count(x):
    """3x3 stride-1 avg pool, count_include_pad=False (FID variant)."""
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                                   (1, 1, 1, 1), "SAME")
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                   (1, 1, 1, 1), "SAME")
    return summed / counts


def _max_pool(x, k, s, pad="VALID"):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1),
                                 (1, s, s, 1), pad)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_no_pad_count(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_no_pad_count(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # final block (Mixed_7c) uses max (FID variant)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "avg":
            bp = _avg_pool_3x3_no_pad_count(x)
        else:
            bp = _max_pool(x, 3, 1, "SAME")
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Returns 2048-dim pool3 features from uint8 NHWC images.

    tf_preprocessing=True reproduces the NVIDIA/TF-graph detector's input
    path exactly (asymmetric TF1 bilinear resize + (x-128)/128 scaling,
    `fid.py:32-38`); the default matches the pytorch-fid lineage
    (half-pixel bilinear + x/127.5-1).
    """

    tf_preprocessing: bool = False

    @nn.compact
    def __call__(self, images_uint8):
        x = images_uint8.astype(jnp.float32)
        if self.tf_preprocessing:
            if x.shape[1:3] != (299, 299):
                x = _tf1_resize_bilinear(x, 299, 299)
            x = (x - 128.0) / 128.0
        else:
            if x.shape[1:3] != (299, 299):
                x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                                     "bilinear")
            x = x / 127.5 - 1.0

        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # global average pool -> [N, 2048]


# BasicConv2d units of InceptionV3FID in CALL (graph) order -- the anchor
# for order/shape-based weight mapping from the NVIDIA detector pickle,
# whose module tree follows the same TF graph order.
_A = ["branch1x1", "branch5x5_1", "branch5x5_2",
      "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"]
_B = ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"]
_C = ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
      "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
      "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"]
_D = ["branch3x3_1", "branch3x3_2",
      "branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"]
_E = ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
      "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
      "branch3x3dbl_3b", "branch_pool"]

CONV_UNITS_GRAPH_ORDER = (
    [("Conv2d_1a_3x3",), ("Conv2d_2a_3x3",), ("Conv2d_2b_3x3",),
     ("Conv2d_3b_1x1",), ("Conv2d_4a_3x3",)]
    + [(f"Mixed_5{s}", b) for s in "bcd" for b in _A]
    + [("Mixed_6a", b) for b in _B]
    + [(f"Mixed_6{s}", b) for s in "bcde" for b in _C]
    + [("Mixed_7a", b) for b in _D]
    + [(f"Mixed_7{s}", b) for s in "bc" for b in _E]
)


def import_nvidia_inception_pickle(path: str):
    """Import the NVIDIA StyleGAN3 Inception detector pkl
    (`diff-solvers-main/fid.py:34`) into InceptionV3FID params.

    The pkl is a PLAIN pickle of a torch module (NVIDIA's direct translation
    of the TF inception-2015-12-05 graph).  It is loaded through the
    restricted unpickler (no embedded code executes) and its tensors are
    mapped onto our param tree:

      * torchvision/pytorch-fid naming (keys contain 'Mixed_5b...') ->
        exact name-based mapping,
      * anything else -> ORDER/SHAPE-based automap: 4-D kernels are assigned
        to our conv units in graph order (both trees follow the TF graph
        order), 1-D tensors attach to the most recent conv by name heuristic
        (mean/var/beta|bias/gamma|weight); missing BN stats get identity
        values (var = 1 - eps so rsqrt(var+eps) == 1, exact for folded BN).

    Returns (params, report).  report['mode'] is 'names' or 'automap';
    report['unused'] lists tensors that were not consumed (e.g. the 1008-way
    logits head, which FID features do not use).  OFFLINE CAVEAT: automap has
    only been validated against synthetic module trees -- run
    tests/test_inception_import.py with the real pkl present to confirm
    feature-level parity before trusting FID at the 0.05 level.
    """
    from ..models.torch_import import load_torch_file, torch_state_dict

    obj = load_torch_file(path)
    sd = torch_state_dict(obj)
    if any("Mixed_5b" in k for k in sd):
        return import_inception_state_dict(sd), {
            "mode": "names", "n_tensors": len(sd), "unused": []}
    return _automap_conv_bn(sd)


def _automap_conv_bn(sd: Dict[str, Any]):
    """Order/shape-based mapping of a flat {name: array} dict (DFS module
    order) onto InceptionV3FID's conv units in graph order."""
    params: Dict[str, Any] = {}
    report = {"mode": "automap", "n_tensors": len(sd), "unused": []}
    unit_idx = -1
    current: Dict[str, Any] = {}

    def flush():
        if unit_idx < 0 or not current:
            return
        path = CONV_UNITS_GRAPH_ORDER[unit_idx]
        out_ch = current["conv"].shape[-1]
        eps = 1e-3
        unit = {
            "conv": {"kernel": current["conv"]},
            "bn_scale": current.get("scale", np.ones(out_ch, np.float32)),
            "bn_bias": current.get("bias", np.zeros(out_ch, np.float32)),
            "bn_mean": current.get("mean", np.zeros(out_ch, np.float32)),
            "bn_var": current.get("var",
                                  np.full(out_ch, 1.0 - eps, np.float32)),
        }
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node.update(unit)

    for name, arr in sd.items():
        arr = np.asarray(arr)
        if arr.ndim == 4:
            flush()
            unit_idx += 1
            if unit_idx >= len(CONV_UNITS_GRAPH_ORDER):
                report["unused"].append(name)
                unit_idx -= 1
                current = {}  # already flushed; don't attach later vectors
                continue
            kern = arr.transpose(2, 3, 1, 0).astype(np.float32)  # OIHW->HWIO
            want = CONV_UNITS_GRAPH_ORDER[unit_idx]
            current = {"conv": np.ascontiguousarray(kern), "_name": name,
                       "_unit": want}
        elif (arr.ndim == 1 and unit_idx >= 0 and "conv" in current
              and arr.shape[0] == current["conv"].shape[-1]):
            # BN vector for the open conv unit; the shape guard keeps
            # trailing head tensors (e.g. the 1008-way logits bias arriving
            # after the last conv) from corrupting its BN params
            low = name.lower()
            if "mean" in low:
                current["mean"] = arr.astype(np.float32)
            elif "var" in low:
                current["var"] = arr.astype(np.float32)
            elif "beta" in low or "bias" in low:
                current["bias"] = arr.astype(np.float32)
            elif "gamma" in low or "weight" in low or "scale" in low:
                current["scale"] = arr.astype(np.float32)
            else:
                report["unused"].append(name)
        else:
            report["unused"].append(name)
    flush()
    n_mapped = unit_idx + 1
    if n_mapped != len(CONV_UNITS_GRAPH_ORDER):
        raise ValueError(
            f"automap matched {n_mapped}/{len(CONV_UNITS_GRAPH_ORDER)} conv "
            f"units -- the pickle's structure does not follow the expected "
            f"TF graph order; inspect its tensor names manually")
    report["n_units"] = n_mapped
    return params, report


def import_inception_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a pytorch-fid / torchvision inception_v3 state_dict into the Flax
    param tree of InceptionV3FID."""
    from ..models.torch_import import _to_numpy

    params: Dict[str, Any] = {}
    for key, val in state_dict.items():
        arr = _to_numpy(val)
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        *path, mod, leaf = parts
        if mod == "conv" and leaf == "weight":
            mod_leaf = [("conv", "kernel")]
            arr = arr.transpose(2, 3, 1, 0)
        elif mod == "bn":
            mod_leaf = [(None, {"weight": "bn_scale", "bias": "bn_bias",
                                "running_mean": "bn_mean",
                                "running_var": "bn_var"}[leaf])]
        else:
            continue  # fc layer etc. -- unused for features
        node = params
        for p in path:
            node = node.setdefault(p, {})
        for m, l in mod_leaf:
            tgt = node.setdefault(m, {}) if m else node
            tgt[l] = np.ascontiguousarray(arr, np.float32)
    return params
