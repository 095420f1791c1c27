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
            from transformers import CLIPTokenizer

            try:
                self.tokenizer = CLIPTokenizer.from_pretrained(self.version)
            except Exception as e:
                raise RuntimeError(
                    "CLIP tokenizer vocab unavailable offline; pass token ids "
                    "to encode_ids() or a tokenizer instance") from e
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
