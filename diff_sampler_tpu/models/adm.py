"""ADM (guided-diffusion) U-Net family in Flax (NHWC): UNetModel,
EncoderUNetModel (classifier), and the CM variant.

Behavioral spec: `diff-solvers-main/models/guided_diffusion/unet.py:396,683`
(+ nn.py helpers) and `models/cm/unet.py:505` -- the CM LSUN nets are the
same architecture with different settings (its flash-attention module is
numerically plain attention).  Hardcoded checkpoint settings live in
`cg_model_loader.py:109-160` / `cm_model_loader.py:60-127`.

Module naming mirrors the torch state_dict with '.' -> '_'
('input_blocks.10.1.qkv' -> module 'input_blocks_10_1_qkv'), so checkpoint
import is a mechanical key rewrite (`adm_state_dict_to_params`).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

silu = jax.nn.silu

__all__ = ["ADMUNet", "ADMClassifier", "adm_state_dict_to_params",
           "IMAGENET256_SETTING", "IMAGENET256_CLASSIFIER_SETTING",
           "CM_LSUN_SETTING", "channel_mult_for"]


def timestep_embedding(t, dim, max_period=10000.0):
    """guided_diffusion/nn.py:103-121: [cos | sin] with exp-spaced freqs."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class _GN(nn.Module):
    """GroupNorm32: 32 groups, fp32 compute (nn.py:17-19,93-100)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_groupnorm import groupnorm_silu

        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return groupnorm_silu(x, scale, bias, groups=32, eps=1e-5,
                              apply_silu=False)


class _Conv(nn.Module):
    cin: int
    cout: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, self.cin, self.cout))
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride, self.stride),
            [(pad, pad), (pad, pad)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(x.dtype)


class _Linear(nn.Module):
    cin: int
    cout: int

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.cin, self.cout))
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        return x @ w.astype(x.dtype) + b.astype(x.dtype)


def _upsample_nearest(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), "nearest")


def _avgpool2(x):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID") / 4.0


def legacy_attention(qkv, num_heads):
    """QKVAttentionLegacy (unet.py:328-359): channel layout (head, 3*ch),
    scale applied to q AND k as 1/sqrt(sqrt(ch)), fp32 softmax.

    qkv: [N, T, 3C].  Returns [N, T, C]."""
    from ..ops.pallas_attention import sdpa

    n, t, w = qkv.shape
    ch = w // (3 * num_heads)
    parts = qkv.reshape(n, t, num_heads, 3 * ch)
    q, k, v = parts[..., :ch], parts[..., ch:2 * ch], parts[..., 2 * ch:]
    out = sdpa(q, k, v, scale=1.0 / math.sqrt(ch))
    return out.reshape(n, t, num_heads * ch)


def new_order_attention(qkv, num_heads):
    """QKVAttention (unet.py:361-392): channel layout (3, head, ch)."""
    from ..ops.pallas_attention import sdpa

    n, t, w = qkv.shape
    ch = w // (3 * num_heads)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(n, t, num_heads, ch)
    k = k.reshape(n, t, num_heads, ch)
    v = v.reshape(n, t, num_heads, ch)
    out = sdpa(q, k, v, scale=1.0 / math.sqrt(ch))
    return out.reshape(n, t, num_heads * ch)


def channel_mult_for(image_size: int) -> Tuple[float, ...]:
    """script_util channel_mult defaults for channel_mult=''."""
    return {512: (0.5, 1, 1, 2, 2, 4, 4), 256: (1, 1, 2, 2, 4, 4),
            128: (1, 1, 2, 3, 4), 64: (1, 2, 3, 4), 32: (1, 2, 2, 2)}[image_size]


def _encoder_layout(model_channels, num_res_blocks, attention_resolutions,
                    channel_mult, resblock_updown, conv_resample):
    """Grouped layout: blocks[i] = list of (layer_name, kind, kwargs), one
    list per TimestepEmbedSequential in unet.py:483-536.  Skip states are
    saved after each full block."""
    blocks: List[List[Tuple[str, str, dict]]] = []
    ch = int(channel_mult[0] * model_channels)
    blocks.append([("input_blocks_0_0", "conv_in", dict(cout=ch))])
    input_chans = [ch]
    ds = 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            i = len(blocks)
            out_ch = int(mult * model_channels)
            layers = [(f"input_blocks_{i}_0", "res",
                       dict(cin=ch, cout=out_ch, up=False, down=False))]
            ch = out_ch
            if ds in attention_resolutions:
                layers.append((f"input_blocks_{i}_1", "attn", dict(c=ch)))
            blocks.append(layers)
            input_chans.append(ch)
        if level != len(channel_mult) - 1:
            i = len(blocks)
            if resblock_updown:
                blocks.append([(f"input_blocks_{i}_0", "res",
                                dict(cin=ch, cout=ch, up=False, down=True))])
            else:
                blocks.append([(f"input_blocks_{i}_0", "downsample",
                                dict(c=ch, conv=conv_resample))])
            input_chans.append(ch)
            ds *= 2
    return blocks, input_chans, ch, ds


class _ADMBase(nn.Module):
    """Shared machinery for ADMUNet / ADMClassifier."""

    def _res(self, name, kw, emb_dim):
        cin, cout = kw["cin"], kw["cout"]
        ssn = self.use_scale_shift_norm
        in_norm = _GN(cin, name=f"{name}_in_layers_0")
        in_conv = _Conv(cin, cout, 3, name=f"{name}_in_layers_2")
        emb_lin = _Linear(emb_dim, 2 * cout if ssn else cout,
                          name=f"{name}_emb_layers_1")
        out_norm = _GN(cout, name=f"{name}_out_layers_0")
        out_conv = _Conv(cout, cout, 3, name=f"{name}_out_layers_3")
        skip = (_Conv(cin, cout, 1, name=f"{name}_skip_connection")
                if cin != cout else None)
        up, down = kw["up"], kw["down"]

        def call(x, emb):
            h = silu(in_norm(x))
            if up:
                h, x = _upsample_nearest(h), _upsample_nearest(x)
            elif down:
                h, x = _avgpool2(h), _avgpool2(x)
            h = in_conv(h)
            emb_out = emb_lin(silu(emb))[:, None, None, :].astype(h.dtype)
            if ssn:
                scale, shift = jnp.split(emb_out, 2, axis=-1)
                h = out_conv(silu(out_norm(h) * (1.0 + scale) + shift))
            else:
                h = out_conv(silu(out_norm(h + emb_out)))
            return (skip(x) if skip is not None else x) + h

        return call

    def _attn(self, name, kw):
        c = kw["c"]
        heads = (self.num_heads if self.num_head_channels == -1
                 else c // self.num_head_channels)
        norm = _GN(c, name=f"{name}_norm")
        qkv = _Conv(c, c * 3, 1, name=f"{name}_qkv")
        proj = _Conv(c, c, 1, name=f"{name}_proj_out")
        attn_fn = (new_order_attention if self.use_new_attention_order
                   else legacy_attention)

        def call(x):
            n, h, w, c_ = x.shape
            a = qkv(norm(x)).reshape(n, h * w, 3 * c_)
            a = attn_fn(a, heads)
            return x + proj(a.reshape(n, h, w, c_))

        return call

    def _layer(self, name, kind, kw, emb_dim):
        if kind == "conv_in":
            conv = _Conv(self.in_channels, kw["cout"], 3, name=name)
            return lambda x, emb: conv(x)
        if kind == "res":
            return self._res(name, kw, emb_dim)
        if kind == "attn":
            f = self._attn(name, kw)
            return lambda x, emb: f(x)
        if kind == "downsample":
            if kw["conv"]:
                conv = _Conv(kw["c"], kw["c"], 3, stride=2, name=f"{name}_op")
                return lambda x, emb: conv(x)
            return lambda x, emb: _avgpool2(x)
        if kind == "upsample":
            if kw["conv"]:
                conv = _Conv(kw["c"], kw["c"], 3, name=f"{name}_conv")
                return lambda x, emb: conv(_upsample_nearest(x))
            return lambda x, emb: _upsample_nearest(x)
        raise ValueError(kind)

    def _time_emb(self, timesteps, emb_dim):
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = _Linear(self.model_channels, emb_dim, name="time_embed_0")(emb)
        return _Linear(emb_dim, emb_dim, name="time_embed_2")(silu(emb))


class ADMUNet(_ADMBase):
    """guided_diffusion UNetModel (unet.py:396-665) in NHWC.

    attention_resolutions are downsample RATES (e.g. (32,16,8) for 256px
    means attention at 8/16/32x downsampling)."""

    image_size: int
    in_channels: int = 3
    model_channels: int = 256
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (32, 16, 8)
    dropout: float = 0.0
    channel_mult: Optional[Sequence[float]] = None
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 4
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_new_attention_order: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, y=None, *, deterministic: bool = True,
                 return_bottleneck: bool = False):
        cm = tuple(self.channel_mult or channel_mult_for(self.image_size))
        emb_dim = self.model_channels * 4
        emb = self._time_emb(timesteps, emb_dim)
        if self.num_classes is not None:
            table = self.param("label_emb_weight", nn.initializers.normal(1.0),
                               (self.num_classes, emb_dim))
            emb = emb + table[y.astype(jnp.int32)]

        enc_blocks, input_chans, ch, ds = _encoder_layout(
            self.model_channels, self.num_res_blocks,
            tuple(self.attention_resolutions), cm, self.resblock_updown,
            self.conv_resample)

        h = x.astype(self.dtype)
        emb = emb.astype(self.dtype)
        hs = []
        for block in enc_blocks:
            for name, kind, kw in block:
                h = self._layer(name, kind, kw, emb_dim)(h, emb)
            hs.append(h)

        for name, kind, kw in [
            ("middle_block_0", "res", dict(cin=ch, cout=ch, up=False, down=False)),
            ("middle_block_1", "attn", dict(c=ch)),
            ("middle_block_2", "res", dict(cin=ch, cout=ch, up=False, down=False)),
        ]:
            h = self._layer(name, kind, kw, emb_dim)(h, emb)
        # AMED bottleneck tap: the reference hooks model.middle_block
        # (solvers_amed.py:12-15 for 256-res CM/ADM); explicit output here.
        bottleneck = h

        # Decoder (unet.py:566-610)
        idx = 0
        for level, mult in list(enumerate(cm))[::-1]:
            for i in range(self.num_res_blocks + 1):
                ich = input_chans.pop()
                out_ch = int(self.model_channels * mult)
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = self._layer(f"output_blocks_{idx}_0", "res",
                                dict(cin=ch + ich, cout=out_ch, up=False,
                                     down=False), emb_dim)(h, emb)
                ch = out_ch
                j = 1
                if ds in self.attention_resolutions:
                    h = self._layer(f"output_blocks_{idx}_{j}", "attn",
                                    dict(c=ch), emb_dim)(h, emb)
                    j += 1
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = self._layer(f"output_blocks_{idx}_{j}", "res",
                                        dict(cin=ch, cout=ch, up=True,
                                             down=False), emb_dim)(h, emb)
                    else:
                        h = self._layer(f"output_blocks_{idx}_{j}", "upsample",
                                        dict(c=ch, conv=self.conv_resample),
                                        emb_dim)(h, emb)
                    ds //= 2
                idx += 1

        h = h.astype(x.dtype)
        h = _GN(ch, name="out_0")(h)
        out = _Conv(ch, self.out_channels, 3, name="out_2")(silu(h))
        if return_bottleneck:
            return out, bottleneck
        return out


class ADMClassifier(_ADMBase):
    """EncoderUNetModel (unet.py:683-894): the noisy classifier used for
    classifier guidance.  pool='attention' (AttentionPool2d, unet.py:30-52)
    or 'adaptive'."""

    image_size: int
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 1000
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (32, 16, 8)
    dropout: float = 0.0
    channel_mult: Optional[Sequence[float]] = None
    conv_resample: bool = True
    num_heads: int = 1
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_new_attention_order: bool = False
    pool: str = "attention"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, *, deterministic: bool = True):
        cm = tuple(self.channel_mult or channel_mult_for(self.image_size))
        emb_dim = self.model_channels * 4
        emb = self._time_emb(timesteps, emb_dim).astype(self.dtype)

        enc_blocks, _chans, ch, ds = _encoder_layout(
            self.model_channels, self.num_res_blocks,
            tuple(self.attention_resolutions), cm, self.resblock_updown,
            self.conv_resample)

        h = x.astype(self.dtype)
        for block in enc_blocks:
            for name, kind, kw in block:
                h = self._layer(name, kind, kw, emb_dim)(h, emb)
        for name, kind, kw in [
            ("middle_block_0", "res", dict(cin=ch, cout=ch, up=False, down=False)),
            ("middle_block_1", "attn", dict(c=ch)),
            ("middle_block_2", "res", dict(cin=ch, cout=ch, up=False, down=False)),
        ]:
            h = self._layer(name, kind, kw, emb_dim)(h, emb)

        h = silu(_GN(ch, name="out_0")(h))
        if self.pool == "adaptive":
            h = h.mean(axis=(1, 2), keepdims=True)
            h = _Conv(ch, self.out_channels, 1, name="out_3")(h)
            return h.reshape(h.shape[0], -1)
        if self.pool == "attention":
            # AttentionPool2d (unet.py:30-52): prepend the mean token, add a
            # positional embedding, new-order attention, take token 0.
            n, hh, ww, c = h.shape
            t = h.reshape(n, hh * ww, c)
            t = jnp.concatenate([t.mean(axis=1, keepdims=True), t], axis=1)
            pos = self.param("out_2_positional_embedding",
                             nn.initializers.normal(1.0 / c**0.5),
                             (hh * ww + 1, c))
            t = t + pos[None].astype(t.dtype)
            t = t[:, None]  # [N, 1, T, C] -> reuse conv-on-NHWC 1x1 layers
            t = _Conv(c, 3 * c, 1, name="out_2_qkv_proj")(t)
            heads = c // self.num_head_channels
            a = new_order_attention(t[:, 0], heads)[:, None]
            a = _Conv(c, self.out_channels, 1, name="out_2_c_proj")(a)
            return a[:, 0, 0]
        raise NotImplementedError(self.pool)


def adm_state_dict_to_params(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Mechanical torch->flax rewrite for ADM/CM checkpoints.

    Leaf modules are named by the torch path with '.' -> '_'; weights convert
    by rank (conv [O,I,kh,kw] -> HWIO; conv1d [O,I,1] -> [1,1,I,O]; linear
    transpose; norm weight -> scale).  label_emb and the attention-pool
    positional embedding are kept untransposed."""
    from .torch_import import _to_numpy

    params: Dict[str, Any] = {}
    for key, val in state_dict.items():
        arr = _to_numpy(val)
        parts = key.split(".")
        leaf = parts[-1]
        name = "_".join(parts[:-1])
        if name == "label_emb":
            params["label_emb_weight"] = np.ascontiguousarray(arr, np.float32)
            continue
        if name.endswith("positional_embedding") or leaf == "positional_embedding":
            full = "_".join(parts)
            params[full] = np.ascontiguousarray(arr.T, np.float32)
            continue
        if leaf == "weight":
            if arr.ndim == 4:
                leaf, arr = "kernel", arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 3:  # conv1d
                leaf, arr = "kernel", arr.transpose(2, 1, 0)[None]
            elif arr.ndim == 2:
                leaf, arr = "kernel", arr.T
            else:
                leaf = "scale"
        node = params.setdefault(name, {})
        node[leaf] = np.ascontiguousarray(arr, np.float32)
    return params


IMAGENET256_SETTING = dict(
    image_size=256, in_channels=3, model_channels=256, out_channels=6,
    num_res_blocks=2, attention_resolutions=(32, 16, 8), dropout=0.0,
    num_classes=1000, num_heads=4, num_head_channels=64,
    use_scale_shift_norm=True, resblock_updown=True,
    use_new_attention_order=False)

CM_LSUN_SETTING = dict(
    image_size=256, in_channels=3, model_channels=256, out_channels=3,
    num_res_blocks=2, attention_resolutions=(32, 16, 8), dropout=0.1,
    num_classes=None, num_heads=4, num_head_channels=64,
    use_scale_shift_norm=False, resblock_updown=True,
    use_new_attention_order=False)

IMAGENET256_CLASSIFIER_SETTING = dict(
    image_size=256, in_channels=3, model_channels=128, out_channels=1000,
    num_res_blocks=2, attention_resolutions=(32, 16, 8),
    num_head_channels=64, use_scale_shift_norm=True, resblock_updown=True,
    pool="attention")
