"""LPIPS perceptual distance (VGG16 backbone) in Flax.

Replaces `piq.LPIPS(replace_pooling=True, reduction='none')` used by the SFD
second-stage loss (`sfd-main/training/loss.py:130-135`): inputs are resized
to 224 bilinear, ImageNet-normalized, passed through VGG16 feature stages
(max-pools replaced by avg-pools per replace_pooling=True), features are
channel-unit-normalized, squared differences are weighted by the learned
1x1 'lin' layers and averaged.

Weights (VGG16 + LPIPS linear heads) import from the standard torch
checkpoints via `lpips_params_from_torch`; random init still yields a valid
premetric for smoke use (0 iff identical inputs).
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LPIPS", "lpips_params_from_torch"]

# VGG16 conv plan: (out_channels, layers) per stage; features tapped after
# the last ReLU of each stage (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
_VGG_PLAN = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class _VGGFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        idx = 0
        for stage, (ch, n_layers) in enumerate(_VGG_PLAN):
            for i in range(n_layers):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{idx}")(x)
                x = jax.nn.relu(x)
                idx += 1
            feats.append(x)
            if stage < len(_VGG_PLAN) - 1:
                # replace_pooling=True: avg pool instead of max pool
                x = nn.avg_pool(x, (2, 2), (2, 2))
        return feats


class LPIPS(nn.Module):
    """lpips(x, y): [B] perceptual distances; x, y in [-1, 1] NHWC."""

    resize_to: int = 224

    @nn.compact
    def __call__(self, x, y):
        def prep(v):
            v = (v + 1.0) / 2.0  # [-1,1] -> [0,1]
            if v.shape[1] != self.resize_to:
                v = jax.image.resize(
                    v, (v.shape[0], self.resize_to, self.resize_to, v.shape[3]),
                    "bilinear")
            return (v - _MEAN) / _STD

        vgg = _VGGFeatures(name="vgg")
        fx = vgg(prep(x))
        fy = vgg(prep(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2  # [B, H, W, C]
            w = self.param(f"lin{i}", nn.initializers.ones, (d.shape[-1],))
            total = total + (d * jnp.abs(w)).sum(-1).mean(axis=(1, 2))
        return total


def lpips_params_from_torch(vgg_state_dict: Dict, lin_state_dict: Dict) -> Dict:
    """Map torchvision VGG16 `features.*` weights + LPIPS `lin*.model.1.weight`
    heads into the LPIPS param tree."""
    from ..models.torch_import import _to_numpy

    params: Dict = {"vgg": {}}
    conv_idx = 0
    # torchvision vgg16 features indices of conv layers
    tv_conv_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for tv_i in tv_conv_indices:
        w = _to_numpy(vgg_state_dict[f"features.{tv_i}.weight"]).transpose(2, 3, 1, 0)
        b = _to_numpy(vgg_state_dict[f"features.{tv_i}.bias"])
        params["vgg"][f"conv{conv_idx}"] = {
            "kernel": np.ascontiguousarray(w, np.float32),
            "bias": np.ascontiguousarray(b, np.float32)}
        conv_idx += 1
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        w = _to_numpy(lin_state_dict[key]).reshape(-1)
        params[f"lin{i}"] = np.ascontiguousarray(w, np.float32)
    return params
