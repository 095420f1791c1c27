"""LDM / Stable-Diffusion tier in Flax (NHWC): latent U-Net with
cross-attention SpatialTransformer, VAE first stages (AutoencoderKL +
VQModel), and the LatentDiffusion wrapper.

Behavioral spec (reference files):
  * latent U-Net: `models/ldm/modules/diffusionmodules/openaimodel.py:413`
    -- the guided-diffusion skeleton with SpatialTransformer at attention
    resolutions when use_spatial_transformer=True (SD) or the legacy
    AttentionBlock otherwise (LSUN/FFHQ LDM),
  * SpatialTransformer / BasicTransformerBlock / CrossAttention / GEGLU:
    `models/ldm/modules/attention.py:47-260`,
  * VAE Encoder/Decoder/ResnetBlock/AttnBlock: `modules/diffusionmodules/
    model.py:42-560`; AutoencoderKL/VQModel(+Interface):
    `models/autoencoder.py:14,264,285`; DiagonalGaussianDistribution:
    `modules/distributions/distributions.py`,
  * LatentDiffusion: `models/diffusion/ddpm.py:425` (apply_model :892,
    decode_first_stage :707, get_learned_conditioning :552), linear beta
    schedule from (linear_start, linear_end, timesteps),
  * configs: `models/ldm/configs/**.yaml` -> LDM_CONFIGS below.

Naming mirrors the torch state_dict with '.' -> '_' so import is mechanical
(`ldm_state_dict_to_params` splits model./first_stage_model./cond_stage_model.).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .adm import _Conv, _GN, _Linear, legacy_attention, timestep_embedding

silu = jax.nn.silu

__all__ = ["LDMUNet", "VAEDecoder", "VAEEncoder", "AutoencoderKL", "VQModel",
           "LatentDiffusion", "ldm_state_dict_to_params", "LDM_CONFIGS",
           "linear_alphas_cumprod", "DiagonalGaussianDistribution"]


# ---------------------------------------------------------------------------
# schedules + distributions
# ---------------------------------------------------------------------------


def linear_alphas_cumprod(linear_start: float, linear_end: float,
                          timesteps: int = 1000) -> np.ndarray:
    """ddpm.py register_schedule, 'linear': betas = linspace(sqrt(s), sqrt(e))^2."""
    betas = np.linspace(linear_start**0.5, linear_end**0.5, timesteps,
                        dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


class DiagonalGaussianDistribution:
    """distributions.py: moments [.., 2*z] -> (mean, logvar) halves."""

    def __init__(self, parameters, deterministic=False):
        self.mean, self.logvar = jnp.split(parameters, 2, axis=-1)
        self.logvar = jnp.clip(self.logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, key):
        if self.deterministic:
            return self.mean
        return self.mean + self.std * jax.random.normal(key, self.mean.shape)

    def mode(self):
        return self.mean


# ---------------------------------------------------------------------------
# SpatialTransformer stack (attention.py:47-260)
# ---------------------------------------------------------------------------


class _LN(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return out.astype(x.dtype)


class _LinearNoBias(nn.Module):
    cin: int
    cout: int

    def setup(self):
        # setup-style (not compact) so siblings can read .kernel for the
        # fused-QKV path below; the param tree is identical either way
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.cin, self.cout))

    def __call__(self, x):
        return x @ self.kernel.astype(x.dtype)


# Fuse the q/k/v (or k/v) projections of one attention block into a single
# matmul over call-time-concatenated kernels.  The checkpoint layout keeps
# the reference's three separate trees; only the COMPUTE is fused.  The
# hypothesis was lane-pad + HBM-reread savings (C=448: N pads 512 vs 1408,
# x read 3x vs 1x) -- MEASURED NEGATIVE on the 274M LDM (ldm_probe round
# 5: fused 70.13 vs unfused 70.00 ms/eval, -0.2%): the projection bucket
# is LayerNorm/reshape-bound at 23.4% MXU, not GEMM-bound, so the merge
# buys nothing.  Kept opt-in like the other measured negatives (Pallas
# GN/conv, int8, exp2).  Also gated off under tensor parallelism (the TP
# plan shards to_q/to_k/to_v column-wise by name; concat would force
# GSPMD gathers).
_FUSE_QKV = False


def _cross_attention(parent, name, query_dim, context_dim, heads, dim_head):
    inner = heads * dim_head
    to_q = _LinearNoBias(query_dim, inner, name=f"{name}_to_q", parent=parent)
    to_k = _LinearNoBias(context_dim, inner, name=f"{name}_to_k", parent=parent)
    to_v = _LinearNoBias(context_dim, inner, name=f"{name}_to_v", parent=parent)
    to_out = _Linear(inner, query_dim, name=f"{name}_to_out_0", parent=parent)
    scale = dim_head**-0.5

    def call(x, context=None):
        from ..ops.pallas_attention import _TP_CTX, sdpa

        ctx = x if context is None else context
        fuse = _FUSE_QKV and _TP_CTX is None
        if fuse and context is None:
            w = jnp.concatenate([to_q.kernel, to_k.kernel, to_v.kernel],
                                axis=1)
            q, k, v = jnp.split(x @ w.astype(x.dtype), 3, axis=-1)
        elif fuse:
            q = to_q(x)
            wkv = jnp.concatenate([to_k.kernel, to_v.kernel], axis=1)
            k, v = jnp.split(ctx @ wkv.astype(x.dtype), 2, axis=-1)
        else:
            q, k, v = to_q(x), to_k(ctx), to_v(ctx)
        q = q.reshape(x.shape[0], x.shape[1], heads, dim_head)
        k = k.reshape(x.shape[0], ctx.shape[1], heads, dim_head)
        v = v.reshape(x.shape[0], ctx.shape[1], heads, dim_head)
        if context is None:
            out = sdpa(q, k, v, scale=scale)
        else:  # ragged T_k (e.g. 77 text tokens): einsum path
            logits = jnp.einsum("bihd,bjhd->bhij",
                                (q * scale).astype(jnp.float32),
                                k.astype(jnp.float32))
            w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhij,bjhd->bihd", w, v)
        return to_out(out.reshape(x.shape[0], x.shape[1], inner))

    return call


def _feed_forward(parent, name, dim, mult=4):
    inner = int(dim * mult)
    proj = _Linear(dim, inner * 2, name=f"{name}_net_0_proj", parent=parent)
    out = _Linear(inner, dim, name=f"{name}_net_2", parent=parent)

    def call(x):
        h, gate = jnp.split(proj(x), 2, axis=-1)  # GEGLU (attention.py:37-44)
        return out(h * jax.nn.gelu(gate))

    return call


def _spatial_transformer(parent, name, in_channels, n_heads, d_head, depth,
                         context_dim):
    inner = n_heads * d_head
    # LDM Normalize = GroupNorm(32, eps=1e-6) (attention.py:76-77)
    norm = _GN6(in_channels, name=f"{name}_norm", parent=parent)
    proj_in = _Conv(in_channels, inner, 1, name=f"{name}_proj_in", parent=parent)
    proj_out = _Conv(inner, in_channels, 1, name=f"{name}_proj_out", parent=parent)
    blocks = []
    for d in range(depth):
        bn = f"{name}_transformer_blocks_{d}"
        blocks.append(dict(
            attn1=_cross_attention(parent, f"{bn}_attn1", inner, inner,
                                   n_heads, d_head),
            attn2=_cross_attention(parent, f"{bn}_attn2", inner,
                                   context_dim or inner, n_heads, d_head),
            ff=_feed_forward(parent, f"{bn}_ff", inner),
            norm1=_LN(inner, name=f"{bn}_norm1", parent=parent),
            norm2=_LN(inner, name=f"{bn}_norm2", parent=parent),
            norm3=_LN(inner, name=f"{bn}_norm3", parent=parent),
        ))

    def call(x, context=None):
        b, h, w, c = x.shape
        x_in = x
        t = proj_in(norm(x)).reshape(b, h * w, inner)
        for blk in blocks:
            t = blk["attn1"](blk["norm1"](t)) + t
            t = blk["attn2"](blk["norm2"](t), context) + t
            t = blk["ff"](blk["norm3"](t)) + t
        return proj_out(t.reshape(b, h, w, inner)) + x_in

    return call


# Note: the LDM GroupNorm uses eps=1e-6 (attention.py:76-77); _GN uses 1e-5
# (guided-diffusion).  Subclass with the right eps:
class _GN6(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_groupnorm import groupnorm_silu

        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return groupnorm_silu(x, scale, bias, groups=32, eps=1e-6,
                              apply_silu=False)


# ---------------------------------------------------------------------------
# Latent U-Net (openaimodel.py:413-740)
# ---------------------------------------------------------------------------


def _res_step(mdl, h, emb, name, cin, cout, emb_dim):
    """Module-first res-block step: the form `nn.remat` can lift without
    disturbing the flat checkpoint-parity param names (children are still
    created on `mdl` itself)."""
    return mdl._res_layer(name, cin, cout, emb_dim)(h, emb)


def _attn_step(mdl, h, context, name, ch):
    return mdl._attn_layer(name, ch)(h, context)


class LDMUNet(nn.Module):
    """openaimodel UNetModel: guided-diffusion skeleton + SpatialTransformer.

    attention_resolutions are downsample RATES (the YAMLs pass rates
    directly, see lsun config comment).

    remat=True rematerializes per res/attn block (training memory; the
    pixel-tier analogue is SongUNet/DhariwalUNet's `remat` flag)."""

    image_size: int
    in_channels: int
    out_channels: int
    model_channels: int
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = -1
    num_head_channels: int = -1
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    legacy: bool = True
    dropout: float = 0.0
    dtype: Any = jnp.float32
    remat: bool = False

    def _heads(self, ch):
        """openaimodel.py:542-556 head/dim bookkeeping."""
        if self.num_head_channels == -1:
            num_heads = self.num_heads
            dim_head = ch // self.num_heads
        else:
            num_heads = ch // self.num_head_channels
            dim_head = self.num_head_channels
        if self.legacy:
            dim_head = (ch // num_heads if self.use_spatial_transformer
                        else self.num_head_channels)
        return num_heads, dim_head

    def _attn_layer(self, name, ch):
        num_heads, dim_head = self._heads(ch)
        if self.use_spatial_transformer:
            st = _spatial_transformer(self, name, ch, num_heads, dim_head,
                                      self.transformer_depth, self.context_dim)
            return lambda x, ctx: st(x, ctx)
        norm = _GN(ch, name=f"{name}_norm", parent=self)
        qkv = _Conv(ch, ch * 3, 1, name=f"{name}_qkv", parent=self)
        proj = _Conv(ch, ch, 1, name=f"{name}_proj_out", parent=self)
        heads = ch // dim_head if dim_head != -1 else num_heads

        def call(x, ctx):
            n, h, w, c = x.shape
            a = qkv(norm(x)).reshape(n, h * w, 3 * c)
            a = legacy_attention(a, heads)
            return x + proj(a.reshape(n, h, w, c))

        return call

    def _res_layer(self, name, cin, cout, emb_dim):
        in_norm = _GN(cin, name=f"{name}_in_layers_0", parent=self)
        in_conv = _Conv(cin, cout, 3, name=f"{name}_in_layers_2", parent=self)
        emb_lin = _Linear(emb_dim, cout, name=f"{name}_emb_layers_1", parent=self)
        out_norm = _GN(cout, name=f"{name}_out_layers_0", parent=self)
        out_conv = _Conv(cout, cout, 3, name=f"{name}_out_layers_3", parent=self)
        skip = (_Conv(cin, cout, 1, name=f"{name}_skip_connection", parent=self)
                if cin != cout else None)

        def call(x, emb):
            h = in_conv(silu(in_norm(x)))
            h = h + emb_lin(silu(emb))[:, None, None, :].astype(h.dtype)
            h = out_conv(silu(out_norm(h)))
            return (skip(x) if skip is not None else x) + h

        return call

    @nn.compact
    def __call__(self, x, timesteps, context=None, *,
                 return_bottleneck: bool = False):
        cm = tuple(self.channel_mult)
        emb_dim = self.model_channels * 4
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = _Linear(self.model_channels, emb_dim, name="time_embed_0")(emb)
        emb = _Linear(emb_dim, emb_dim, name="time_embed_2")(silu(emb))
        emb = emb.astype(self.dtype)

        h = x.astype(self.dtype)
        if context is not None:
            context = context.astype(self.dtype)

        res_step, attn_step = _res_step, _attn_step
        if self.remat:
            res_step = nn.remat(_res_step, static_argnums=(3, 4, 5, 6))
            attn_step = nn.remat(_attn_step, static_argnums=(3, 4))

        ch = self.model_channels * cm[0]
        h = _Conv(self.in_channels, ch, 3, name="input_blocks_0_0")(h)
        hs = [h]
        ds = 1
        block_idx = 1
        input_chans = [ch]
        for level, mult in enumerate(cm):
            for _ in range(self.num_res_blocks):
                out_ch = self.model_channels * mult
                h = res_step(self, h, emb, f"input_blocks_{block_idx}_0", ch,
                             out_ch, emb_dim)
                ch = out_ch
                if ds in self.attention_resolutions:
                    h = attn_step(self, h, context,
                                  f"input_blocks_{block_idx}_1", ch)
                hs.append(h)
                input_chans.append(ch)
                block_idx += 1
            if level != len(cm) - 1:
                h = _Conv(ch, ch, 3, stride=2,
                          name=f"input_blocks_{block_idx}_0_op")(h)
                hs.append(h)
                input_chans.append(ch)
                block_idx += 1
                ds *= 2

        h = res_step(self, h, emb, "middle_block_0", ch, ch, emb_dim)
        h = attn_step(self, h, context, "middle_block_1", ch)
        h = res_step(self, h, emb, "middle_block_2", ch, ch, emb_dim)
        # AMED bottleneck tap: the reference hooks model.middle_block
        # (solvers_amed.py:7-11); JAX has no hooks, so the activation is an
        # explicit second output.
        bottleneck = h

        idx = 0
        for level, mult in list(enumerate(cm))[::-1]:
            for i in range(self.num_res_blocks + 1):
                ich = input_chans.pop()
                out_ch = self.model_channels * mult
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res_step(self, h, emb, f"output_blocks_{idx}_0", ch + ich,
                             out_ch, emb_dim)
                ch = out_ch
                j = 1
                if ds in self.attention_resolutions:
                    h = attn_step(self, h, context, f"output_blocks_{idx}_{j}",
                                  ch)
                    j += 1
                if level and i == self.num_res_blocks:
                    n_, hh, ww, c_ = h.shape
                    h = jax.image.resize(h, (n_, hh * 2, ww * 2, c_), "nearest")
                    h = _Conv(ch, ch, 3, name=f"output_blocks_{idx}_{j}_conv")(h)
                    ds //= 2
                idx += 1

        h = h.astype(x.dtype)
        h = _GN(ch, name="out_0")(h)
        out = _Conv(ch, self.out_channels, 3, name="out_2")(silu(h))
        if return_bottleneck:
            return out, bottleneck
        return out


# ---------------------------------------------------------------------------
# VAE first stages (modules/diffusionmodules/model.py, autoencoder.py)
# ---------------------------------------------------------------------------


class _ConvDownAsym(nn.Module):
    """Stride-2 conv with asymmetric (0,1,0,1) padding (model.py:72-77)."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.cin, self.cout))
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, w.astype(x.dtype), (2, 2), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(x.dtype)


class _VAEBase(nn.Module):
    def _resnet(self, name, cin, cout):
        norm1 = _GN6(cin, name=f"{name}_norm1", parent=self)
        conv1 = _Conv(cin, cout, 3, name=f"{name}_conv1", parent=self)
        norm2 = _GN6(cout, name=f"{name}_norm2", parent=self)
        conv2 = _Conv(cout, cout, 3, name=f"{name}_conv2", parent=self)
        nin = (_Conv(cin, cout, 1, name=f"{name}_nin_shortcut", parent=self)
               if cin != cout else None)

        def call(x):
            h = conv1(silu(norm1(x)))
            h = conv2(silu(norm2(h)))
            return (nin(x) if nin is not None else x) + h

        return call

    def _attn(self, name, c):
        norm = _GN6(c, name=f"{name}_norm", parent=self)
        q_c = _Conv(c, c, 1, name=f"{name}_q", parent=self)
        k_c = _Conv(c, c, 1, name=f"{name}_k", parent=self)
        v_c = _Conv(c, c, 1, name=f"{name}_v", parent=self)
        proj = _Conv(c, c, 1, name=f"{name}_proj_out", parent=self)

        def call(x):
            n, h, w, cc = x.shape
            hn = norm(x)
            q = q_c(hn).reshape(n, h * w, cc)
            k = k_c(hn).reshape(n, h * w, cc)
            v = v_c(hn).reshape(n, h * w, cc)
            logits = jnp.einsum("bic,bjc->bij", q.astype(jnp.float32),
                                k.astype(jnp.float32)) / math.sqrt(cc)
            wgt = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            a = jnp.einsum("bij,bjc->bic", wgt, v).reshape(n, h, w, cc)
            return x + proj(a)

        return call


class VAEDecoder(_VAEBase):
    """model.py:462-560."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    z_channels: int = 3

    @nn.compact
    def __call__(self, z):
        n_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (n_res - 1)
        h = _Conv(self.z_channels, block_in, 3, name="conv_in")(z)
        h = self._resnet("mid_block_1", block_in, block_in)(h)
        h = self._attn("mid_attn_1", block_in)(h)
        h = self._resnet("mid_block_2", block_in, block_in)(h)
        for i_level in reversed(range(n_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = self._resnet(f"up_{i_level}_block_{i_block}", block_in,
                                 block_out)(h)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = self._attn(f"up_{i_level}_attn_{i_block}", block_in)(h)
            if i_level != 0:
                n_, hh, ww, c_ = h.shape
                h = jax.image.resize(h, (n_, hh * 2, ww * 2, c_), "nearest")
                h = _Conv(block_in, block_in, 3,
                          name=f"up_{i_level}_upsample_conv")(h)
                curr_res *= 2
        h = _GN6(block_in, name="norm_out")(h)
        return _Conv(block_in, self.out_ch, 3, name="conv_out")(silu(h))


class VAEEncoder(_VAEBase):
    """model.py:368-460."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    in_channels: int = 3
    z_channels: int = 3
    double_z: bool = False

    @nn.compact
    def __call__(self, x):
        n_res = len(self.ch_mult)
        curr_res = self.resolution
        h = _Conv(self.in_channels, self.ch, 3, name="conv_in")(x)
        block_in = self.ch
        for i_level in range(n_res):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = self._resnet(f"down_{i_level}_block_{i_block}", block_in,
                                 block_out)(h)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = self._attn(f"down_{i_level}_attn_{i_block}", block_in)(h)
            if i_level != n_res - 1:
                h = _ConvDownAsym(block_in, block_in,
                                  name=f"down_{i_level}_downsample_conv")(h)
                curr_res //= 2
        h = self._resnet("mid_block_1", block_in, block_in)(h)
        h = self._attn("mid_attn_1", block_in)(h)
        h = self._resnet("mid_block_2", block_in, block_in)(h)
        h = _GN6(block_in, name="norm_out")(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return _Conv(block_in, out_ch, 3, name="conv_out")(silu(h))


# ---------------------------------------------------------------------------
# First-stage wrappers (autoencoder.py:14,264,285)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class AutoencoderKL:
    """KL autoencoder: encode -> DiagonalGaussian moments, decode latents."""

    decoder: VAEDecoder
    decoder_params: Dict
    quant_conv: Dict  # {kernel, bias} 1x1 over 2*z -> 2*embed
    post_quant_conv: Dict
    encoder: Optional[VAEEncoder] = None
    encoder_params: Optional[Dict] = None

    def decode(self, z):
        z = _conv1x1(z, self.post_quant_conv)
        return self.decoder.apply({"params": self.decoder_params}, z)

    def encode(self, x) -> DiagonalGaussianDistribution:
        assert self.encoder is not None, "encoder weights not loaded"
        moments = self.encoder.apply({"params": self.encoder_params}, x)
        return DiagonalGaussianDistribution(_conv1x1(moments, self.quant_conv))


@dataclasses.dataclass
class VQModel:
    """VQ autoencoder: decode goes through nearest-codebook quantization
    (VQModelInterface.decode with force_not_quantize=False,
    autoencoder.py:264-283)."""

    decoder: VAEDecoder
    decoder_params: Dict
    post_quant_conv: Dict
    codebook: np.ndarray  # [n_embed, embed_dim]
    quant_conv: Optional[Dict] = None
    encoder: Optional[VAEEncoder] = None
    encoder_params: Optional[Dict] = None

    def quantize(self, z):
        """Nearest codebook entry per spatial position (VectorQuantizer2)."""
        e = jnp.asarray(self.codebook)  # [K, D]
        zf = z.reshape(-1, z.shape[-1])
        d = (jnp.sum(zf**2, axis=1, keepdims=True)
             - 2.0 * zf @ e.T + jnp.sum(e**2, axis=1)[None])
        idx = jnp.argmin(d, axis=1)
        return e[idx].reshape(z.shape)

    def decode(self, z, force_not_quantize=False):
        if not force_not_quantize:
            z = self.quantize(z)
        z = _conv1x1(z, self.post_quant_conv)
        return self.decoder.apply({"params": self.decoder_params}, z)


def _conv1x1(x, p):
    w = jnp.asarray(p["kernel"])  # HWIO [1,1,I,O]
    y = jax.lax.conv_general_dilated(x, w.astype(x.dtype), (1, 1),
                                     [(0, 0), (0, 0)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.asarray(p["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# LatentDiffusion wrapper (ddpm.py:425,552,707,892,1396)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LatentDiffusion:
    """Functional LatentDiffusion: the pieces the sampling toolbox uses.

    * apply_model(x, t, cond): eps prediction from the latent U-Net
      (conditioning_key 'crossattn' -> context, None -> unconditional)
    * decode_first_stage(z): VAE decode (with 1/scale_factor for KL)
    * get_learned_conditioning(prompts): text encoder (pluggable)
    * alphas_cumprod: linear beta schedule (register_schedule)
    """

    unet: LDMUNet
    unet_params: Dict
    first_stage: Any  # AutoencoderKL | VQModel
    alphas_cumprod: np.ndarray
    scale_factor: float = 1.0
    conditioning_key: Optional[str] = None
    cond_stage_fn: Optional[Callable] = None  # prompts -> context

    def apply_model(self, x, t, cond=None):
        if self.conditioning_key is None or cond is None:
            return self.unet.apply({"params": self.unet_params}, x, t)
        return self.unet.apply({"params": self.unet_params}, x, t, cond)

    def decode_first_stage(self, z):
        if isinstance(self.first_stage, AutoencoderKL):
            z = z / self.scale_factor
        return self.first_stage.decode(z)

    def get_learned_conditioning(self, prompts):
        assert self.cond_stage_fn is not None, "no text encoder bound"
        return self.cond_stage_fn(prompts)


# ---------------------------------------------------------------------------
# Configs (models/ldm/configs/**.yaml)
# ---------------------------------------------------------------------------

LDM_CONFIGS = {
    "lsun_bedroom_ldm": dict(
        linear_start=0.0015, linear_end=0.0195, timesteps=1000,
        scale_factor=1.0, conditioning_key=None, first_stage="vq",
        unet=dict(image_size=64, in_channels=3, out_channels=3,
                  model_channels=224, attention_resolutions=(8, 4, 2),
                  num_res_blocks=2, channel_mult=(1, 2, 3, 4),
                  num_head_channels=32),
        vae=dict(z_channels=3, resolution=256, ch=128, ch_mult=(1, 2, 4),
                 num_res_blocks=2, attn_resolutions=()),
        n_embed=8192, embed_dim=3,
    ),
    "ffhq_ldm": dict(
        linear_start=0.0015, linear_end=0.0195, timesteps=1000,
        scale_factor=1.0, conditioning_key=None, first_stage="vq",
        unet=dict(image_size=64, in_channels=3, out_channels=3,
                  model_channels=224, attention_resolutions=(8, 4, 2),
                  num_res_blocks=2, channel_mult=(1, 2, 3, 4),
                  num_head_channels=32),
        vae=dict(z_channels=3, resolution=256, ch=128, ch_mult=(1, 2, 4),
                 num_res_blocks=2, attn_resolutions=()),
        n_embed=8192, embed_dim=3,
    ),
    "ms_coco": dict(  # Stable Diffusion v1.5 (v1-inference.yaml)
        linear_start=0.00085, linear_end=0.0120, timesteps=1000,
        scale_factor=0.18215, conditioning_key="crossattn", first_stage="kl",
        unet=dict(image_size=64, in_channels=4, out_channels=4,
                  model_channels=320, attention_resolutions=(4, 2, 1),
                  num_res_blocks=2, channel_mult=(1, 2, 4, 4), num_heads=8,
                  use_spatial_transformer=True, transformer_depth=1,
                  context_dim=768, legacy=False),
        vae=dict(z_channels=4, resolution=256, ch=128, ch_mult=(1, 2, 4, 4),
                 num_res_blocks=2, attn_resolutions=(), double_z=True),
        embed_dim=4,
    ),
}


# ---------------------------------------------------------------------------
# Checkpoint import
# ---------------------------------------------------------------------------


def _mechanical(state_dict, *, skip_prefixes=()):
    """'.'->'_' module naming with rank-based weight conversion."""
    from .torch_import import _to_numpy

    params: Dict[str, Any] = {}
    for key, val in state_dict.items():
        if any(key.startswith(p) for p in skip_prefixes):
            continue
        arr = _to_numpy(val)
        parts = key.split(".")
        leaf = parts[-1]
        name = "_".join(parts[:-1])
        if leaf == "weight":
            if arr.ndim == 4:
                leaf, arr = "kernel", arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 3:
                leaf, arr = "kernel", arr.transpose(2, 1, 0)[None]
            elif arr.ndim == 2:
                leaf, arr = "kernel", arr.T
            else:
                leaf = "scale"
        params.setdefault(name, {})[leaf] = np.ascontiguousarray(arr, np.float32)
    return params


def ldm_state_dict_to_params(state_dict) -> Dict[str, Any]:
    """Split an LDM/SD checkpoint state_dict into component param trees:
    {'unet': ..., 'decoder': ..., 'encoder': ..., 'quant_conv': ...,
     'post_quant_conv': ..., 'codebook': ..., 'cond_stage': raw}."""
    groups: Dict[str, Dict] = {"unet": {}, "decoder": {}, "encoder": {},
                               "other": {}, "cond_stage": {}}
    for key, val in state_dict.items():
        if key.startswith("model.diffusion_model."):
            groups["unet"][key[len("model.diffusion_model."):]] = val
        elif key.startswith("first_stage_model.decoder."):
            groups["decoder"][key[len("first_stage_model.decoder."):]] = val
        elif key.startswith("first_stage_model.encoder."):
            groups["encoder"][key[len("first_stage_model.encoder."):]] = val
        elif key.startswith("first_stage_model."):
            groups["other"][key[len("first_stage_model."):]] = val
        elif key.startswith("cond_stage_model."):
            groups["cond_stage"][key[len("cond_stage_model."):]] = val

    out: Dict[str, Any] = {
        "unet": _mechanical(groups["unet"]),
        "decoder": _mechanical(groups["decoder"]),
        "encoder": _mechanical(groups["encoder"]) if groups["encoder"] else None,
        "cond_stage": groups["cond_stage"],
    }
    other = groups["other"]
    from .torch_import import _to_numpy

    for nm in ("quant_conv", "post_quant_conv"):
        if f"{nm}.weight" in other:
            out[nm] = {
                "kernel": _to_numpy(other[f"{nm}.weight"]).transpose(2, 3, 1, 0),
                "bias": _to_numpy(other[f"{nm}.bias"]),
            }
    if "quantize.embedding.weight" in other:
        out["codebook"] = _to_numpy(other["quantize.embedding.weight"])
    return out


def build_latent_diffusion(dataset_name: str, state_dict=None,
                           cond_stage_fn=None, dtype=jnp.float32,
                           params_override=None,
                           remat: bool = False) -> LatentDiffusion:
    """Construct the LatentDiffusion stack for a dataset config; with
    state_dict=None the parts get random init (smoke/bench use).
    remat enables block-granular rematerialization (training memory)."""
    cfg = LDM_CONFIGS[dataset_name]
    unet = LDMUNet(dtype=dtype, remat=remat, **cfg["unet"])
    vae_cfg = cfg["vae"]
    decoder = VAEDecoder(out_ch=3, **{k: v for k, v in vae_cfg.items()
                                      if k != "double_z"})

    if state_dict is not None:
        trees = ldm_state_dict_to_params(state_dict)
    elif params_override is not None:
        trees = params_override
    else:
        res = cfg["unet"]["image_size"]
        zc = vae_cfg["z_channels"]
        unet_params = jax.jit(unet.init)(
            jax.random.key(0), jnp.zeros((1, res, res, cfg["unet"]["in_channels"])),
            jnp.ones((1,)),
            jnp.zeros((1, 77, cfg["unet"]["context_dim"]))
            if cfg["unet"].get("context_dim") else None)["params"]
        low = vae_cfg["resolution"] // 2 ** (len(vae_cfg["ch_mult"]) - 1)
        dec_params = jax.jit(decoder.init)(
            jax.random.key(1), jnp.zeros((1, low, low, zc)))["params"]
        eye = np.eye(zc, dtype=np.float32)[None, None]
        trees = dict(unet=unet_params, decoder=dec_params,
                     quant_conv=None,
                     post_quant_conv={"kernel": eye, "bias": np.zeros(zc, np.float32)},
                     codebook=np.random.RandomState(0).randn(
                         cfg.get("n_embed", 16), zc).astype(np.float32))

    if cfg["first_stage"] == "vq":
        first = VQModel(decoder=decoder, decoder_params=trees["decoder"],
                        post_quant_conv=trees["post_quant_conv"],
                        codebook=trees["codebook"])
    else:
        first = AutoencoderKL(decoder=decoder, decoder_params=trees["decoder"],
                              quant_conv=trees.get("quant_conv"),
                              post_quant_conv=trees["post_quant_conv"])

    return LatentDiffusion(
        unet=unet, unet_params=trees["unet"], first_stage=first,
        alphas_cumprod=linear_alphas_cumprod(cfg["linear_start"],
                                             cfg["linear_end"],
                                             cfg["timesteps"]),
        scale_factor=cfg["scale_factor"],
        conditioning_key=cfg["conditioning_key"],
        cond_stage_fn=cond_stage_fn)
