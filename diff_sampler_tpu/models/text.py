"""Text conditioning: the FrozenCLIPEmbedder equivalent
(`models/ldm/modules/encoders/modules.py:137-166`) on transformers' Flax CLIP.

The SD checkpoint carries the CLIP text tower weights under
`cond_stage_model.transformer.*`; we convert that torch state_dict into
FlaxCLIPTextModel params offline (no download).  The tokenizer's vocab files
are NOT in the checkpoint -- in offline environments pass pre-tokenized ids
or pre-computed embeddings instead.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

__all__ = ["FrozenCLIPEmbedder", "clip_text_params_from_state_dict"]

_CLIP_TEXT_CONFIG = dict(  # openai/clip-vit-large-patch14 text tower
    vocab_size=49408, hidden_size=768, intermediate_size=3072,
    num_hidden_layers=12, num_attention_heads=12, max_position_embeddings=77)


def clip_text_params_from_state_dict(state_dict: Dict) -> Dict:
    """cond_stage_model.transformer.* torch weights -> Flax CLIPTextModel
    params, via transformers' own converter (no network access)."""
    import torch
    from transformers import CLIPTextConfig, FlaxCLIPTextModel
    from transformers.modeling_flax_pytorch_utils import (
        convert_pytorch_state_dict_to_flax)

    cfg = CLIPTextConfig(**_CLIP_TEXT_CONFIG)
    model = FlaxCLIPTextModel(cfg, _do_init=False)
    sd = {k[len("transformer."):]: torch.as_tensor(np.asarray(v))
          for k, v in state_dict.items() if k.startswith("transformer.")}
    return convert_pytorch_state_dict_to_flax(sd, model)


class FrozenCLIPEmbedder:
    """prompts -> [B, 77, 768] context embeddings (last_hidden_state),
    matching FrozenCLIPEmbedder.encode."""

    def __init__(self, params: Dict, tokenizer=None,
                 version: str = "openai/clip-vit-large-patch14"):
        from transformers import CLIPTextConfig, FlaxCLIPTextModel

        self.model = FlaxCLIPTextModel(CLIPTextConfig(**_CLIP_TEXT_CONFIG),
                                       _do_init=False)
        self.params = params
        self.tokenizer = tokenizer
        self.version = version

    def _get_tokenizer(self):
        if self.tokenizer is None:
            # in-repo BPE (utils/bpe.py) first -- EOT padding, matching
            # CLIPTokenizer's pad token: SD cross-attention consumes ALL 77
            # hidden states, so pad ids are numerically load-bearing here
            # (unlike CLIP-score pooling, which reads only the first EOT)
            from ..utils.bpe import SimpleBPETokenizer, find_vocab_file

            if find_vocab_file() is not None:
                tok = SimpleBPETokenizer.from_default_paths(context_length=77)
                tok.pad_id = tok.eot_id
                self.tokenizer = lambda prompts, **kw: {
                    "input_ids": tok(list(prompts))}
                return self.tokenizer
            from transformers import CLIPTokenizer

            try:
                self.tokenizer = CLIPTokenizer.from_pretrained(self.version)
            except Exception as e:
                raise RuntimeError(
                    "CLIP tokenizer vocab unavailable offline; pass token ids "
                    "to encode_ids() or a tokenizer instance, or place a BPE "
                    "vocab file where utils.bpe.find_vocab_file looks") from e
        return self.tokenizer

    def encode_ids(self, input_ids: np.ndarray) -> np.ndarray:
        """input_ids: [B, 77] int32 -> [B, 77, 768]."""
        out = self.model(input_ids=input_ids, params=self.params)
        return out.last_hidden_state

    def __call__(self, prompts: List[str]) -> np.ndarray:
        tok = self._get_tokenizer()
        batch = tok(prompts, truncation=True, max_length=77,
                    padding="max_length", return_tensors="np")
        return self.encode_ids(batch["input_ids"])


class BERTTextTransformer:
    """The LDM txt2img text encoder: x_transformer TransformerWrapper with a
    pre-norm Encoder (`models/ldm/modules/x_transformer.py:370-641`,
    BERTEmbedder `encoders/modules.py:80-103`).

    Functional flax-free implementation over a params dict whose keys follow
    the torch state_dict mechanically ('.' -> nested): token_emb, pos_emb,
    attn_layers.layers.{i}.{0|1} (norm / attention|ff), norm.
    """

    def __init__(self, n_embed: int = 1280, n_layer: int = 32,
                 vocab_size: int = 30522, max_seq_len: int = 77,
                 heads: int = 8, dim_head: int = 64):
        self.dim = n_embed
        self.depth = n_layer
        self.vocab_size = vocab_size
        self.max_seq_len = max_seq_len
        self.heads = heads
        self.dim_head = dim_head

    def init_params(self, key) -> Dict:
        import jax
        import jax.numpy as jnp

        keys = jax.random.split(key, 4 + 4 * self.depth)
        d, inner = self.dim, self.heads * self.dim_head
        p = {
            "token_emb": jax.random.normal(keys[0], (self.vocab_size, d)) * 0.02,
            "pos_emb": jax.random.normal(keys[1], (self.max_seq_len, d)) * 0.02,
            "norm_scale": jnp.ones(d), "norm_bias": jnp.zeros(d),
            "layers": [],
        }
        for i in range(self.depth):
            k = jax.random.split(keys[2 + i], 8)
            s = 1.0 / np.sqrt(d)
            layer = {
                "attn_norm_scale": jnp.ones(d), "attn_norm_bias": jnp.zeros(d),
                "to_q": jax.random.normal(k[0], (d, inner)) * s,
                "to_k": jax.random.normal(k[1], (d, inner)) * s,
                "to_v": jax.random.normal(k[2], (d, inner)) * s,
                "to_out": jax.random.normal(k[3], (inner, d)) * s,
                "to_out_b": jnp.zeros(d),
                "ff_norm_scale": jnp.ones(d), "ff_norm_bias": jnp.zeros(d),
                "ff_w1": jax.random.normal(k[4], (d, 4 * d)) * s,
                "ff_b1": jnp.zeros(4 * d),
                "ff_w2": jax.random.normal(k[5], (4 * d, d)) * (0.5 / np.sqrt(d)),
                "ff_b2": jnp.zeros(d),
            }
            p["layers"].append(layer)
        return p

    def __call__(self, params: Dict, token_ids) -> "jax.Array":
        import jax
        import jax.numpy as jnp

        def ln(x, scale, bias):
            mu = x.mean(-1, keepdims=True)
            var = x.var(-1, keepdims=True)
            return (x - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias

        x = jnp.asarray(params["token_emb"])[token_ids]
        x = x + jnp.asarray(params["pos_emb"])[None, : x.shape[1]]
        scale = self.dim_head**-0.5
        for lp in params["layers"]:
            h = ln(x, lp["attn_norm_scale"], lp["attn_norm_bias"])
            q = (h @ lp["to_q"]).reshape(*h.shape[:2], self.heads, self.dim_head)
            k = (h @ lp["to_k"]).reshape(*h.shape[:2], self.heads, self.dim_head)
            v = (h @ lp["to_v"]).reshape(*h.shape[:2], self.heads, self.dim_head)
            logits = jnp.einsum("bihd,bjhd->bhij", q * scale, k)
            w = jax.nn.softmax(logits, axis=-1)
            a = jnp.einsum("bhij,bjhd->bihd", w, v).reshape(*h.shape[:2], -1)
            x = x + a @ lp["to_out"] + lp["to_out_b"]
            h = ln(x, lp["ff_norm_scale"], lp["ff_norm_bias"])
            h = jax.nn.gelu(h @ lp["ff_w1"] + lp["ff_b1"], approximate=False)
            x = x + h @ lp["ff_w2"] + lp["ff_b2"]
        return ln(x, params["norm_scale"], params["norm_bias"])


def bert_params_from_state_dict(state_dict: Dict, depth: int) -> Dict:
    """Map an LDM BERTEmbedder state_dict (cond_stage_model.transformer.*)
    into BERTTextTransformer params."""
    from .torch_import import _to_numpy

    g = lambda k: np.asarray(_to_numpy(state_dict[k]), np.float32)  # noqa: E731
    p = {
        "token_emb": g("transformer.token_emb.weight"),
        "pos_emb": g("transformer.pos_emb.emb.weight"),
        "norm_scale": g("transformer.norm.weight"),
        "norm_bias": g("transformer.norm.bias"),
        "layers": [],
    }
    for i in range(depth):
        a = f"transformer.attn_layers.layers.{2 * i}"
        f = f"transformer.attn_layers.layers.{2 * i + 1}"
        p["layers"].append({
            "attn_norm_scale": g(f"{a}.0.weight"),
            "attn_norm_bias": g(f"{a}.0.bias"),
            "to_q": g(f"{a}.1.to_q.weight").T,
            "to_k": g(f"{a}.1.to_k.weight").T,
            "to_v": g(f"{a}.1.to_v.weight").T,
            "to_out": g(f"{a}.1.to_out.weight").T,
            "to_out_b": g(f"{a}.1.to_out.bias"),
            "ff_norm_scale": g(f"{f}.0.weight"),
            "ff_norm_bias": g(f"{f}.0.bias"),
            "ff_w1": g(f"{f}.1.net.0.0.weight").T,
            "ff_b1": g(f"{f}.1.net.0.0.bias"),
            "ff_w2": g(f"{f}.1.net.2.weight").T,
            "ff_b2": g(f"{f}.1.net.2.bias"),
        })
    return p
