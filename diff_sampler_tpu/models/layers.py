"""Layer primitives for the EDM-family U-Nets, in NHWC (TPU-native) layout.

Functionally equivalent to the reference's custom layers
(`diff-solvers-main/models/networks_edm.py:22-212`): Linear, Conv2d with
optional (fused) 2x resampling, GroupNorm, fp32-softmax attention, and the
positional/Fourier timestep embeddings.  Weight conventions:

  * conv kernels are HWIO (torch OIHW -> transpose(2,3,1,0) on import),
  * linear kernels are (in, out) (torch (out, in) -> transpose on import),
  * attention keeps the reference's interleaved qkv channel layout
    (channel o of the qkv projection factors as (head, c_per_head, qkv)).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "weight_init",
    "Linear",
    "Conv2d",
    "GroupNorm",
    "attention",
    "positional_embedding",
    "FourierEmbedding",
]


def weight_init(mode: str, fan_in: int, fan_out: int, weight_mult: float = 1.0):
    """Initializer matching `networks_edm.py:11-16` (scaled uniform/normal)."""

    def init(key, shape, dtype=jnp.float32):
        if mode == "xavier_uniform":
            scale = np.sqrt(6.0 / (fan_in + fan_out))
            w = jax.random.uniform(key, shape, dtype, -1.0, 1.0) * scale
        elif mode == "xavier_normal":
            w = jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / (fan_in + fan_out))
        elif mode == "kaiming_uniform":
            w = jax.random.uniform(key, shape, dtype, -1.0, 1.0) * np.sqrt(3.0 / fan_in)
        elif mode == "kaiming_normal":
            w = jax.random.normal(key, shape, dtype) * np.sqrt(1.0 / fan_in)
        else:
            raise ValueError(f'Invalid init mode "{mode}"')
        return w * weight_mult

    return init


class Linear(nn.Module):
    in_features: int
    out_features: int
    use_bias: bool = True
    init_mode: str = "kaiming_normal"
    init_weight: float = 1.0
    init_bias: float = 0.0

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            weight_init(self.init_mode, self.in_features, self.out_features, self.init_weight),
            (self.in_features, self.out_features),
        )
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param(
                "bias",
                weight_init(self.init_mode, self.in_features, self.out_features, self.init_bias),
                (self.out_features,),
            )
            y = y + b.astype(x.dtype)
        return y


# module-level perf switch: implement the 2x2 box resample as reshapes
# instead of a feature-grouped conv.  Measured on v5e (scripts/perf_probe.py
# A/B, CIFAR SongUNet batch 256): depthwise 70.4 ms/eval vs reshape 71.3 --
# XLA's grouped conv wins slightly at model level, so this stays off.
BOX_RESAMPLE_RESHAPE = False


def _resample_kernel(resample_filter: Sequence[float]) -> np.ndarray:
    f = np.asarray(resample_filter, dtype=np.float32)
    f = np.outer(f, f) / (f.sum() ** 2)
    return f  # [k, k]


def _depthwise(x, f2d, *, stride=1, padding=0, transpose=False, tp_pad=0):
    """Depthwise conv (or transposed conv) with a shared 2D filter, NHWC."""
    c = x.shape[-1]
    k = f2d.shape[0]
    # Fast path for the default box filter (resample_filter=[1,1], k=2): the
    # feature-grouped conv is exactly nearest-neighbor 2x upsampling (transpose)
    # or 2x2 scaled mean-pooling (stride-2), expressible as reshapes.
    # Toggleable for A/B measurement (scripts/perf_probe.py).
    if BOX_RESAMPLE_RESHAPE and k == 2 and float(np.ptp(f2d)) == 0.0:
        v = float(f2d[0, 0])
        n, h, w, _ = x.shape
        if transpose and tp_pad == 0:
            y = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
            y = y.reshape(n, 2 * h, 2 * w, c)
            return y if v == 1.0 else y * jnp.asarray(v, x.dtype)
        if not transpose and stride == 2 and padding == 0:
            y = (x * jnp.asarray(v, x.dtype)).astype(jnp.float32)
            y = y.reshape(n, h // 2, 2, w // 2, 2, c).sum(axis=(2, 4))
            return y.astype(x.dtype)
    kern = jnp.tile(f2d[:, :, None, None].astype(x.dtype), (1, 1, 1, c))  # HWIO, I=1 (grouped)
    if transpose:
        # torch conv_transpose2d(stride=2, padding=p) == lhs_dilated conv with
        # per-side padding (k - 1 - p); the filter is symmetric so no flip.
        pad = k - 1 - tp_pad
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _conv(x, w, padding):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Conv2d(nn.Module):
    """Conv with optional 2x up/down-sampling, mirroring `networks_edm.py:40-82`.

    kernel=0 gives a resample-only layer (no weights).
    """

    in_channels: int
    out_channels: int
    kernel: int
    use_bias: bool = True
    up: bool = False
    down: bool = False
    resample_filter: Sequence[float] = (1, 1)
    fused_resample: bool = False
    init_mode: str = "kaiming_normal"
    init_weight: float = 1.0
    init_bias: float = 0.0

    @nn.compact
    def __call__(self, x):
        w = b = None
        if self.kernel:
            fan = self.in_channels * self.kernel * self.kernel
            fan_out = self.out_channels * self.kernel * self.kernel
            w = self.param(
                "kernel",
                weight_init(self.init_mode, fan, fan_out, self.init_weight),
                (self.kernel, self.kernel, self.in_channels, self.out_channels),
            )
            if self.use_bias:
                b = self.param(
                    "bias", weight_init(self.init_mode, fan, fan_out, self.init_bias),
                    (self.out_channels,))
        f = _resample_kernel(self.resample_filter) if (self.up or self.down) else None
        w_pad = self.kernel // 2 if w is not None else 0
        f_pad = (f.shape[0] - 1) // 2 if f is not None else 0

        if self.fused_resample and self.up and w is not None:
            x = _depthwise(x, f * 4.0, transpose=True, tp_pad=max(f_pad - w_pad, 0))
            x = _conv(x, w, max(w_pad - f_pad, 0))
        elif self.fused_resample and self.down and w is not None:
            x = _conv(x, w, w_pad + f_pad)
            x = _depthwise(x, f, stride=2)
        else:
            if self.up:
                x = _depthwise(x, f * 4.0, transpose=True, tp_pad=f_pad)
            if self.down:
                x = _depthwise(x, f, stride=2, padding=f_pad)
            if w is not None:
                x = _conv(x, w, w_pad)
        if b is not None:
            x = x + b.astype(x.dtype)
        return x


class GroupNorm(nn.Module):
    """GroupNorm over NHWC with the reference's adaptive group count
    (`networks_edm.py:87-98`): groups = min(32, C // 4)."""

    num_channels: int
    num_groups: int = 32
    min_channels_per_group: int = 4
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_groupnorm import groupnorm_silu

        g = min(self.num_groups, self.num_channels // self.min_channels_per_group)
        scale = self.param("scale", nn.initializers.ones, (self.num_channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_channels,))
        return groupnorm_silu(x, scale, bias, groups=g, eps=self.eps,
                              apply_silu=False)


def attention(qkv: jax.Array, num_heads: int) -> jax.Array:
    """Self-attention with fp32 softmax, matching `AttentionOp` + the qkv
    reshape of `UNetBlock.forward` (`networks_edm.py:105-118,173-177`).

    qkv: [N, H, W, 3*C] from a 1x1 conv whose output channel o factors as
    (head, c_per_head, qkv) -- the reference's interleaved layout.
    Returns [N, H, W, C].
    """
    from ..ops.pallas_attention import sdpa

    n, h, w, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    t = qkv.reshape(n, h * w, num_heads, ch, 3)
    q, k, v = t[..., 0], t[..., 1], t[..., 2]  # [N, HW, heads, ch]
    out = sdpa(q, k, v, scale=1.0 / math.sqrt(ch))
    return out.reshape(n, h, w, c)


def positional_embedding(x: jax.Array, num_channels: int, max_positions: int = 10000,
                         endpoint: bool = False) -> jax.Array:
    """DDPM++/ADM timestep embedding (`networks_edm.py:185-198`): [cos | sin]."""
    freqs = jnp.arange(num_channels // 2, dtype=jnp.float32)
    freqs = freqs / (num_channels // 2 - (1 if endpoint else 0))
    freqs = (1.0 / max_positions) ** freqs
    ang = x[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=1).astype(x.dtype)


class FourierEmbedding(nn.Module):
    """NCSN++ random Fourier features (`networks_edm.py:204-212`)."""

    num_channels: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, x):
        freqs = self.param(
            "freqs", lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.num_channels // 2,))
        ang = 2.0 * np.pi * x[:, None].astype(jnp.float32) * freqs[None, :].astype(jnp.float32)
        return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=1).astype(x.dtype)
