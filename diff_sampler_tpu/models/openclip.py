"""OpenCLIP image+text towers, offline.

The reference's CLIP-score detector is OpenCLIP ViT-g-14
(`diff-solvers-main/clip_score.py:59`: open_clip.create_model_and_transforms
('ViT-g-14', pretrained='laion2b_s34b_b88k')), downloaded at run time.  This
module is the no-network path: a from-scratch functional JAX implementation
of the OpenCLIP transformer towers plus a torch-state_dict importer
(mirroring `models/text.py::clip_text_params_from_state_dict` but for the
full two-tower model), so a locally present checkpoint file is all that's
needed.

Everything is shape-inferred from the state_dict (width/layers/patch/grid/
embed_dim); only the attention head width cannot be read from shapes and
comes from the OpenCLIP config table (`open_clip/model_configs/*.json`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["OpenCLIPConfig", "OpenCLIP", "openclip_params_from_state_dict",
           "infer_openclip_config"]

# vision width -> attention head width (open_clip model_configs: ViT-B/L use
# 64; ViT-H-14 80; ViT-g-14 88; ViT-bigG-14 104)
_VISION_HEAD_WIDTH = {768: 64, 1024: 64, 1280: 80, 1408: 88, 1664: 104}


@dataclasses.dataclass(frozen=True)
class OpenCLIPConfig:
    embed_dim: int
    image_size: int
    patch_size: int
    vision_width: int
    vision_layers: int
    vision_heads: int
    vision_mlp_dim: int
    text_width: int
    text_layers: int
    text_heads: int
    text_mlp_dim: int
    vocab_size: int
    context_length: int


def _ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _mha(x, p, heads: int, mask=None):
    """Packed-qkv multi-head attention (torch nn.MultiheadAttention layout:
    in_proj [3w, w] -> stored transposed as [w, 3w])."""
    b, t, w = x.shape
    qkv = x @ p["in_proj_w"] + p["in_proj_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    dh = w // heads
    q = q.reshape(b, t, heads, dh)
    k = k.reshape(b, t, heads, dh)
    v = v.reshape(b, t, heads, dh)
    logits = jnp.einsum("bihd,bjhd->bhij", q * (dh**-0.5), k)
    if mask is not None:
        logits = logits + mask
    a = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhij,bjhd->bihd", a, v).reshape(b, t, w)
    return out @ p["out_proj_w"] + p["out_proj_b"]


def _resblock(x, p, heads: int, mask=None):
    x = x + _mha(_ln(x, p["ln_1"]), p["attn"], heads, mask)
    h = _ln(x, p["ln_2"])
    h = jax.nn.gelu(h @ p["c_fc_w"] + p["c_fc_b"], approximate=False)
    return x + h @ p["c_proj_w"] + p["c_proj_b"]


class OpenCLIP:
    """Functional two-tower CLIP over a params dict (open_clip CLIP/
    VisionTransformer/TextTransformer, `open_clip/model.py` +
    `open_clip/transformer.py`)."""

    def __init__(self, cfg: OpenCLIPConfig):
        self.cfg = cfg
        t = cfg.context_length
        self._causal = jnp.triu(jnp.full((t, t), -jnp.inf), k=1)

    def encode_image(self, params: Dict, pixels) -> jax.Array:
        """pixels: [B, H, W, 3] float32, already CLIP-normalized."""
        cfg = self.cfg
        v = params["visual"]
        x = jax.lax.conv_general_dilated(
            pixels, v["conv1_w"], (cfg.patch_size, cfg.patch_size), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, gh, gw, w = x.shape
        x = x.reshape(b, gh * gw, w)
        cls = jnp.broadcast_to(v["class_embedding"], (b, 1, w))
        x = jnp.concatenate([cls, x], axis=1) + v["positional_embedding"]
        x = _ln(x, v["ln_pre"])
        for p in v["resblocks"]:
            x = _resblock(x, p, cfg.vision_heads)
        x = _ln(x[:, 0], v["ln_post"])
        return x @ v["proj"]

    def encode_text(self, params: Dict, ids) -> jax.Array:
        """ids: [B, context_length] int32 (EOT = argmax id, open_clip
        model.py text pooling)."""
        cfg = self.cfg
        t = params["text"]
        x = jnp.asarray(t["token_embedding"])[ids] + t["positional_embedding"]
        for p in t["resblocks"]:
            x = _resblock(x, p, cfg.text_heads, self._causal)
        x = _ln(x, t["ln_final"])
        eot = jnp.argmax(ids, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        return x @ t["text_projection"]


def infer_openclip_config(sd: Dict[str, np.ndarray],
                          vision_heads: Optional[int] = None,
                          text_heads: Optional[int] = None) -> OpenCLIPConfig:
    """Shape-infer the architecture from an open_clip state_dict (the same
    trick open_clip's build_model_from_openai_state_dict uses)."""
    vw = sd["visual.conv1.weight"].shape[0]
    patch = sd["visual.conv1.weight"].shape[-1]
    n_pos = sd["visual.positional_embedding"].shape[0]
    grid = int(round((n_pos - 1) ** 0.5))
    vl = 1 + max(int(k.split(".")[3]) for k in sd
                 if k.startswith("visual.transformer.resblocks."))
    tw = sd["token_embedding.weight"].shape[1]
    tl = 1 + max(int(k.split(".")[2]) for k in sd
                 if k.startswith("transformer.resblocks."))
    return OpenCLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_size=grid * patch, patch_size=patch, vision_width=vw,
        vision_layers=vl,
        vision_heads=vision_heads or vw // _VISION_HEAD_WIDTH.get(vw, 64),
        vision_mlp_dim=sd["visual.transformer.resblocks.0.mlp.c_fc.weight"].shape[0],
        text_width=tw, text_layers=tl,
        text_heads=text_heads or tw // 64,
        text_mlp_dim=sd["transformer.resblocks.0.mlp.c_fc.weight"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        context_length=sd["positional_embedding"].shape[0])


def _convert_block(sd, prefix: str) -> Dict[str, Any]:
    g = lambda k: np.asarray(sd[f"{prefix}.{k}"], np.float32)  # noqa: E731
    return {
        "ln_1": {"scale": g("ln_1.weight"), "bias": g("ln_1.bias")},
        "attn": {
            "in_proj_w": g("attn.in_proj_weight").T,
            "in_proj_b": g("attn.in_proj_bias"),
            "out_proj_w": g("attn.out_proj.weight").T,
            "out_proj_b": g("attn.out_proj.bias"),
        },
        "ln_2": {"scale": g("ln_2.weight"), "bias": g("ln_2.bias")},
        "c_fc_w": g("mlp.c_fc.weight").T,
        "c_fc_b": g("mlp.c_fc.bias"),
        "c_proj_w": g("mlp.c_proj.weight").T,
        "c_proj_b": g("mlp.c_proj.bias"),
    }


def openclip_params_from_state_dict(state_dict: Dict) -> Dict[str, Any]:
    """open_clip torch state_dict -> params tree for `OpenCLIP` (handles the
    'module.'-prefixed and open_clip_pytorch_model.bin layouts)."""
    from .torch_import import _to_numpy

    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        # some distributions nest under text./visual. consistently already
        sd[k] = _to_numpy(v)

    cfg = infer_openclip_config(sd)
    g = lambda k: np.asarray(sd[k], np.float32)  # noqa: E731
    visual = {
        # torch conv [out, in, kh, kw] -> HWIO
        "conv1_w": g("visual.conv1.weight").transpose(2, 3, 1, 0),
        "class_embedding": g("visual.class_embedding"),
        "positional_embedding": g("visual.positional_embedding"),
        "ln_pre": {"scale": g("visual.ln_pre.weight"),
                   "bias": g("visual.ln_pre.bias")},
        "resblocks": [
            _convert_block(sd, f"visual.transformer.resblocks.{i}")
            for i in range(cfg.vision_layers)],
        "ln_post": {"scale": g("visual.ln_post.weight"),
                    "bias": g("visual.ln_post.bias")},
        "proj": g("visual.proj"),
    }
    text = {
        "token_embedding": g("token_embedding.weight"),
        "positional_embedding": g("positional_embedding"),
        "resblocks": [_convert_block(sd, f"transformer.resblocks.{i}")
                      for i in range(cfg.text_layers)],
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
        "text_projection": g("text_projection"),
    }
    return {"visual": visual, "text": text, "config": cfg}
