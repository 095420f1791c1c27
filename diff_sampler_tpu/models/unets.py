"""EDM-family U-Nets in Flax (NHWC): SongUNet (DDPM++/NCSN++) and
DhariwalUNet (ADM re-implementation).

Behavioral spec: `diff-solvers-main/models/networks_edm.py:126-453`, with the
SFD extensions folded in behind a flag (`use_step_condition` adds the second
AdaGN modulation `affine_step` + `map_step*` tower, and `skip_tuning` rescales
decoder skip connections; `sfd-main/models/networks_edm.py:153,166-190,
290-293,339-397`).

Module/parameter names mirror the torch state_dict (enc_8x8_block0/conv0 ...)
so checkpoint import is a mechanical key rewrite (see torch_import.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import Conv2d, FourierEmbedding, GroupNorm, Linear, attention, positional_embedding

silu = jax.nn.silu

__all__ = ["UNetBlock", "SongUNet", "DhariwalUNet"]


class UNetBlock(nn.Module):
    """Unified DDPM++/NCSN++/ADM residual block (`networks_edm.py:126-179`)."""

    in_channels: int
    out_channels: int
    emb_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    num_heads: Optional[int] = None
    channels_per_head: int = 64
    dropout: float = 0.0
    skip_scale: float = 1.0
    eps: float = 1e-5
    resample_filter: Sequence[int] = (1, 1)
    resample_proj: bool = False
    adaptive_scale: bool = True
    init: Dict[str, Any] = dataclasses.field(default_factory=dict)
    init_zero: Dict[str, Any] = dataclasses.field(default_factory=lambda: dict(init_weight=0))
    init_attn: Optional[Dict[str, Any]] = None
    use_step_condition: bool = False

    @nn.compact
    def __call__(self, x, emb, emb_step=None, deterministic: bool = True):
        heads = (
            0 if not self.attention
            else self.num_heads if self.num_heads is not None
            else self.out_channels // self.channels_per_head
        )
        init = dict(self.init)
        init_zero = dict(self.init_zero)
        init_attn = dict(self.init_attn) if self.init_attn is not None else init

        orig = x
        x = GroupNorm(self.in_channels, eps=self.eps, name="norm0")(x)
        x = Conv2d(self.in_channels, self.out_channels, kernel=3, up=self.up,
                   down=self.down, resample_filter=self.resample_filter,
                   name="conv0", **init)(silu(x))

        n_aff = self.out_channels * (2 if self.adaptive_scale else 1)
        params = Linear(self.emb_channels, n_aff, name="affine", **init)(emb)
        params = params[:, None, None, :].astype(x.dtype)
        params_step = None
        if self.use_step_condition:
            affine_step = Linear(self.emb_channels, n_aff, name="affine_step", **init)
            if emb_step is not None:
                params_step = affine_step(emb_step)[:, None, None, :].astype(x.dtype)
            elif self.is_initializing():
                affine_step(emb)  # materialize params so the pytree is stable

        norm1 = GroupNorm(self.out_channels, eps=self.eps, name="norm1")
        if self.adaptive_scale:
            scale, shift = jnp.split(params, 2, axis=-1)
            x = shift + norm1(x) * (scale + 1.0)
            if params_step is not None:
                # SFD second AdaGN (sfd networks_edm.py:175-180)
                scale_s, shift_s = jnp.split(params_step, 2, axis=-1)
                x = shift_s + x * (scale_s + 1.0)
            x = silu(x)
        else:
            # Non-adaptive: add embedding THEN normalize (networks_edm.py:167).
            add = params if params_step is None else params + params_step
            x = silu(norm1(x + add))

        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = Conv2d(self.out_channels, self.out_channels, kernel=3, name="conv1",
                   **init_zero)(x)

        if self.out_channels != self.in_channels or self.up or self.down:
            kernel = 1 if self.resample_proj or self.out_channels != self.in_channels else 0
            skip = Conv2d(self.in_channels, self.out_channels, kernel=kernel, up=self.up,
                          down=self.down, resample_filter=self.resample_filter,
                          name="skip", **init)(orig)
        else:
            skip = orig
        x = (x + skip) * self.skip_scale

        if heads:
            a_in = GroupNorm(self.out_channels, eps=self.eps, name="norm2")(x)
            qkv = Conv2d(self.out_channels, self.out_channels * 3, kernel=1,
                         name="qkv", **init_attn)(a_in)
            a = attention(qkv, heads)
            x = x + Conv2d(self.out_channels, self.out_channels, kernel=1,
                           name="proj", **init_zero)(a)
            x = x * self.skip_scale
        return x


def _song_layout(img_resolution, in_channels, out_channels, model_channels,
                 channel_mult, num_blocks, attn_resolutions, encoder_type,
                 decoder_type):
    """Static layer layout of SongUNet (`networks_edm.py:267-310`): ordered
    (name, kind, kwargs) lists for encoder and decoder, plus skip channel
    counts.  kind in {conv, block, aux_down, aux_skip, aux_residual, aux_up,
    aux_norm, aux_conv}."""
    enc: List[Tuple[str, str, dict]] = []
    cout = in_channels
    caux = in_channels
    for level, mult in enumerate(channel_mult):
        res = img_resolution >> level
        if level == 0:
            cin, cout = cout, model_channels
            enc.append((f"enc_{res}x{res}_conv", "conv", dict(cin=cin, cout=cout, kernel=3)))
        else:
            enc.append((f"enc_{res}x{res}_down", "block",
                        dict(cin=cout, cout=cout, up=False, down=True, attn=False)))
            if encoder_type == "skip":
                enc.append((f"enc_{res}x{res}_aux_down", "aux_down", dict(cin=caux, cout=caux)))
                enc.append((f"enc_{res}x{res}_aux_skip", "aux_skip", dict(cin=caux, cout=cout)))
            if encoder_type == "residual":
                enc.append((f"enc_{res}x{res}_aux_residual", "aux_residual",
                            dict(cin=caux, cout=cout)))
                caux = cout
        for idx in range(num_blocks):
            cin, cout = cout, model_channels * mult
            enc.append((f"enc_{res}x{res}_block{idx}", "block",
                        dict(cin=cin, cout=cout, up=False, down=False,
                             attn=res in attn_resolutions)))
    skips = [e[2]["cout"] for e in enc if "aux" not in e[0]]

    dec: List[Tuple[str, str, dict]] = []
    sk = list(skips)
    for level, mult in reversed(list(enumerate(channel_mult))):
        res = img_resolution >> level
        if level == len(channel_mult) - 1:
            dec.append((f"dec_{res}x{res}_in0", "block",
                        dict(cin=cout, cout=cout, up=False, down=False, attn=True)))
            dec.append((f"dec_{res}x{res}_in1", "block",
                        dict(cin=cout, cout=cout, up=False, down=False, attn=False)))
        else:
            dec.append((f"dec_{res}x{res}_up", "block",
                        dict(cin=cout, cout=cout, up=True, down=False, attn=False)))
        for idx in range(num_blocks + 1):
            cin = cout + sk.pop()
            cout = model_channels * mult
            attn = idx == num_blocks and res in attn_resolutions
            dec.append((f"dec_{res}x{res}_block{idx}", "block",
                        dict(cin=cin, cout=cout, up=False, down=False, attn=attn)))
        if decoder_type == "skip" or level == 0:
            if decoder_type == "skip" and level < len(channel_mult) - 1:
                dec.append((f"dec_{res}x{res}_aux_up", "aux_up",
                            dict(cin=out_channels, cout=out_channels)))
            dec.append((f"dec_{res}x{res}_aux_norm", "aux_norm", dict(c=cout)))
            dec.append((f"dec_{res}x{res}_aux_conv", "aux_conv",
                        dict(cin=cout, cout=out_channels)))
    return enc, dec


class SongUNet(nn.Module):
    """DDPM++ / NCSN++ U-Net (`networks_edm.py:221-355`)."""

    img_resolution: int
    in_channels: int
    out_channels: int
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 128
    channel_mult: Sequence[int] = (1, 2, 2, 2)
    channel_mult_emb: int = 4
    num_blocks: int = 4
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.10
    label_dropout: float = 0.0
    embedding_type: str = "positional"
    channel_mult_noise: int = 1
    encoder_type: str = "standard"
    decoder_type: str = "standard"
    resample_filter: Sequence[int] = (1, 1)
    use_step_condition: bool = False
    remat: bool = False  # block-granular rematerialization for training memory

    @nn.compact
    def __call__(self, x, noise_labels, class_labels=None, augment_labels=None,
                 *, step_condition=None, skip_tuning: bool = False,
                 deterministic: bool = True):
        block_cls = (nn.remat(UNetBlock, static_argnums=(4,))
                     if self.remat else UNetBlock)
        emb_channels = self.model_channels * self.channel_mult_emb
        noise_channels = self.model_channels * self.channel_mult_noise
        init = dict(init_mode="xavier_uniform")
        init_zero = dict(init_mode="xavier_uniform", init_weight=1e-5)
        init_attn = dict(init_mode="xavier_uniform", init_weight=float(np.sqrt(0.2)))
        block_kwargs = dict(
            emb_channels=emb_channels, num_heads=1, dropout=self.dropout,
            skip_scale=float(np.sqrt(0.5)), eps=1e-6,
            resample_filter=tuple(self.resample_filter), resample_proj=True,
            adaptive_scale=False, init=init, init_zero=init_zero,
            init_attn=init_attn, use_step_condition=self.use_step_condition,
        )

        def noise_embed(v, name_prefix):
            if self.embedding_type == "positional":
                e = positional_embedding(v, noise_channels, endpoint=True)
            else:
                e = FourierEmbedding(noise_channels, name=f"{name_prefix}")(v)
            # swap sin/cos halves (networks_edm.py:315)
            return e.reshape(e.shape[0], 2, -1)[:, ::-1].reshape(e.shape)

        # Mapping tower.
        emb = noise_embed(noise_labels, "map_noise")
        if self.label_dim:
            tmp = class_labels
            if not deterministic and self.label_dropout > 0:
                keep = jax.random.bernoulli(
                    self.make_rng("label_dropout"), 1.0 - self.label_dropout,
                    (x.shape[0], 1))
                tmp = tmp * keep.astype(tmp.dtype)
            emb = emb + Linear(self.label_dim, noise_channels, name="map_label", **init)(
                tmp * np.sqrt(self.label_dim))
        if self.augment_dim and augment_labels is not None:
            emb = emb + Linear(self.augment_dim, noise_channels, use_bias=False,
                               name="map_augment", **init)(augment_labels)
        emb = silu(Linear(noise_channels, emb_channels, name="map_layer0", **init)(emb))
        emb = silu(Linear(emb_channels, emb_channels, name="map_layer1", **init)(emb))

        emb_step = None
        if self.use_step_condition:
            sc = step_condition if step_condition is not None else noise_labels
            es = noise_embed(sc, "map_step")
            es = silu(Linear(noise_channels, emb_channels, name="map_step_layer0", **init)(es))
            es = silu(Linear(emb_channels, emb_channels, name="map_step_layer1", **init)(es))
            if step_condition is not None:
                emb_step = es

        enc_layout, dec_layout = _song_layout(
            self.img_resolution, self.in_channels, self.out_channels,
            self.model_channels, tuple(self.channel_mult), self.num_blocks,
            tuple(self.attn_resolutions), self.encoder_type, self.decoder_type)

        # Encoder.
        skips = []
        aux = x
        for name, kind, kw in enc_layout:
            if kind == "conv":
                x = Conv2d(kw["cin"], kw["cout"], kernel=3, name=name, **init)(x)
                skips.append(x)
            elif kind == "aux_down":
                aux = Conv2d(kw["cin"], kw["cout"], kernel=0, down=True,
                             resample_filter=tuple(self.resample_filter), name=name)(aux)
            elif kind == "aux_skip":
                x = x + Conv2d(kw["cin"], kw["cout"], kernel=1, name=name, **init)(aux)
                skips[-1] = x
            elif kind == "aux_residual":
                x = (x + Conv2d(kw["cin"], kw["cout"], kernel=3, down=True,
                                resample_filter=tuple(self.resample_filter),
                                fused_resample=True, name=name, **init)(aux)) / np.sqrt(2)
                aux = x
                skips[-1] = x
            else:
                x = block_cls(kw["cin"], kw["cout"], up=False, down=kw["down"],
                              attention=kw["attn"], name=name, **block_kwargs)(
                    x, emb, emb_step, deterministic)
                skips.append(x)

        # Decoder.
        n_skips = len(skips)
        count = 0
        aux = None
        tmp = None
        for name, kind, kw in dec_layout:
            if kind == "aux_up":
                aux = Conv2d(kw["cin"], kw["cout"], kernel=0, up=True,
                             resample_filter=tuple(self.resample_filter), name=name)(aux)
            elif kind == "aux_norm":
                tmp = GroupNorm(kw["c"], eps=1e-6, name=name)(x)
            elif kind == "aux_conv":
                tmp = Conv2d(kw["cin"], kw["cout"], kernel=3, name=name, **init_zero)(silu(tmp))
                aux = tmp if aux is None else tmp + aux
            else:
                if x.shape[-1] != kw["cin"]:
                    s = skips.pop()
                    if skip_tuning:
                        # 0.75 -> 1.0 coefficient ramp (sfd networks_edm.py:377-397)
                        coeff = 0.75 + (1.0 - 0.75) / n_skips * count
                        s = coeff * s
                        count += 1
                    x = jnp.concatenate([x, s], axis=-1)
                x = block_cls(kw["cin"], kw["cout"], up=kind == "block" and kw["up"],
                              down=False, attention=kw["attn"], name=name,
                              **block_kwargs)(x, emb, emb_step, deterministic)
        return aux


class DhariwalUNet(nn.Module):
    """ADM U-Net re-implementation (`networks_edm.py:364-453`)."""

    img_resolution: int
    in_channels: int
    out_channels: int
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 192
    channel_mult: Sequence[int] = (1, 2, 3, 4)
    channel_mult_emb: int = 4
    num_blocks: int = 3
    attn_resolutions: Sequence[int] = (32, 16, 8)
    dropout: float = 0.10
    label_dropout: float = 0.0
    use_step_condition: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x, noise_labels, class_labels=None, augment_labels=None,
                 *, step_condition=None, skip_tuning: bool = False,
                 deterministic: bool = True):
        block_cls = (nn.remat(UNetBlock, static_argnums=(4,))
                     if self.remat else UNetBlock)
        emb_channels = self.model_channels * self.channel_mult_emb
        init = dict(init_mode="kaiming_uniform", init_weight=float(np.sqrt(1 / 3)),
                    init_bias=float(np.sqrt(1 / 3)))
        init_zero = dict(init_mode="kaiming_uniform", init_weight=0.0, init_bias=0.0)
        block_kwargs = dict(emb_channels=emb_channels, channels_per_head=64,
                            dropout=self.dropout, init=init, init_zero=init_zero,
                            use_step_condition=self.use_step_condition)

        emb = positional_embedding(noise_labels, self.model_channels)
        if self.augment_dim and augment_labels is not None:
            emb = emb + Linear(self.augment_dim, self.model_channels, use_bias=False,
                               name="map_augment", **init_zero)(augment_labels)
        emb = silu(Linear(self.model_channels, emb_channels, name="map_layer0", **init)(emb))
        emb = Linear(emb_channels, emb_channels, name="map_layer1", **init)(emb)
        if self.label_dim:
            tmp = class_labels
            if not deterministic and self.label_dropout > 0:
                keep = jax.random.bernoulli(
                    self.make_rng("label_dropout"), 1.0 - self.label_dropout,
                    (x.shape[0], 1))
                tmp = tmp * keep.astype(tmp.dtype)
            emb = emb + Linear(self.label_dim, emb_channels, use_bias=False,
                               init_mode="kaiming_normal",
                               init_weight=float(np.sqrt(self.label_dim)),
                               name="map_label")(tmp)
        emb = silu(emb)

        emb_step = None
        if self.use_step_condition:
            sc = step_condition if step_condition is not None else noise_labels
            es = positional_embedding(sc, self.model_channels)
            es = silu(Linear(self.model_channels, emb_channels, name="map_step_layer0",
                             **init)(es))
            es = silu(Linear(emb_channels, emb_channels, name="map_step_layer1", **init)(es))
            if step_condition is not None:
                emb_step = es

        # Encoder layout (networks_edm.py:395-409).
        enc: List[Tuple[str, str, dict]] = []
        cout = self.in_channels
        for level, mult in enumerate(self.channel_mult):
            res = self.img_resolution >> level
            if level == 0:
                cin, cout = cout, self.model_channels * mult
                enc.append((f"enc_{res}x{res}_conv", "conv", dict(cin=cin, cout=cout)))
            else:
                enc.append((f"enc_{res}x{res}_down", "block",
                            dict(cin=cout, cout=cout, down=True, up=False, attn=False)))
            for idx in range(self.num_blocks):
                cin, cout = cout, self.model_channels * mult
                enc.append((f"enc_{res}x{res}_block{idx}", "block",
                            dict(cin=cin, cout=cout, down=False, up=False,
                                 attn=res in self.attn_resolutions)))
        skip_ch = [e[2]["cout"] for e in enc]

        dec: List[Tuple[str, str, dict]] = []
        sk = list(skip_ch)
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            res = self.img_resolution >> level
            if level == len(self.channel_mult) - 1:
                dec.append((f"dec_{res}x{res}_in0", "block",
                            dict(cin=cout, cout=cout, up=False, down=False, attn=True)))
                dec.append((f"dec_{res}x{res}_in1", "block",
                            dict(cin=cout, cout=cout, up=False, down=False, attn=False)))
            else:
                dec.append((f"dec_{res}x{res}_up", "block",
                            dict(cin=cout, cout=cout, up=True, down=False, attn=False)))
            for idx in range(self.num_blocks + 1):
                cin = cout + sk.pop()
                cout = self.model_channels * mult
                dec.append((f"dec_{res}x{res}_block{idx}", "block",
                            dict(cin=cin, cout=cout, up=False, down=False,
                                 attn=res in self.attn_resolutions)))

        skips = []
        for name, kind, kw in enc:
            if kind == "conv":
                x = Conv2d(kw["cin"], kw["cout"], kernel=3, name=name, **init)(x)
            else:
                x = block_cls(kw["cin"], kw["cout"], up=kw["up"], down=kw["down"],
                              attention=kw["attn"], name=name, **block_kwargs)(
                    x, emb, emb_step, deterministic)
            skips.append(x)

        n_skips = len(skips)
        count = 0
        for name, kind, kw in dec:
            if x.shape[-1] != kw["cin"]:
                s = skips.pop()
                if skip_tuning:
                    coeff = 0.75 + (1.0 - 0.75) / n_skips * count
                    s = coeff * s
                    count += 1
                x = jnp.concatenate([x, s], axis=-1)
            x = block_cls(kw["cin"], kw["cout"], up=kw["up"], down=kw["down"],
                          attention=kw["attn"], name=name, **block_kwargs)(
                x, emb, emb_step, deterministic)
        x = GroupNorm(cout, name="out_norm")(x)
        x = Conv2d(cout, self.out_channels, kernel=3, name="out_conv", **init_zero)(silu(x))
        return x
