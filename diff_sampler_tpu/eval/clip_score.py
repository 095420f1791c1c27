"""CLIP score: image/text cosine similarity x100 averaged over prompts.

Rebuilds `diff-solvers-main/clip_score.py:34-96` (OpenCLIP ViT-g-14
image/text cosine).  The encoder is pluggable:

  * `make_hf_clip_encoders(model_name)` builds jitted Flax encoders from a
    HuggingFace CLIP checkpoint (requires network/cached weights; the
    reference likewise downloads its OpenCLIP checkpoint at run time),
  * any (image_embed_fn, text_embed_fn) pair works -- tests use stubs.
"""

from __future__ import annotations

from typing import Callable, Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["clip_score", "make_hf_clip_encoders"]


def clip_score(image_embed_fn: Callable, text_embed_fn: Callable,
               batches: Iterable[Tuple[np.ndarray, Sequence[str]]],
               batch_size: int = 64) -> float:
    """Mean 100 * cosine(image_emb, text_emb) over (images, prompts) batches
    (clip_score.py:74-94)."""
    total, count = 0.0, 0
    for images, prompts in batches:
        img_e = np.asarray(image_embed_fn(images))
        txt_e = np.asarray(text_embed_fn(list(prompts)))
        img_e = img_e / np.linalg.norm(img_e, axis=-1, keepdims=True)
        txt_e = txt_e / np.linalg.norm(txt_e, axis=-1, keepdims=True)
        sims = 100.0 * np.sum(img_e * txt_e, axis=-1)
        total += float(sims.sum())
        count += len(sims)
    return total / max(count, 1)


def make_hf_clip_encoders(model_name: str = "laion/CLIP-ViT-g-14-laion2B-s12B-b42K"):
    """Jitted Flax CLIP encoders from a HuggingFace checkpoint.

    Returns (image_embed_fn(uint8 NHWC), text_embed_fn(list[str])).
    Requires the checkpoint to be downloadable or cached; raises a clear
    error in offline environments.
    """
    try:
        from transformers import AutoTokenizer, FlaxCLIPModel
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("transformers with flax support required") from e
    try:
        model = FlaxCLIPModel.from_pretrained(model_name, from_pt=True)
        tokenizer = AutoTokenizer.from_pretrained(model_name)
    except Exception as e:
        raise RuntimeError(
            f"CLIP checkpoint '{model_name}' unavailable (offline?): {e}") from e

    size = model.config.vision_config.image_size
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])

    @jax.jit
    def image_embed(images_uint8):
        x = images_uint8.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, (x.shape[0], size, size, 3), "bicubic")
        x = (x - mean) / std
        x = x.transpose(0, 3, 1, 2)  # HF CLIP expects NCHW
        return model.get_image_features(pixel_values=x)

    def text_embed(prompts: List[str]):
        toks = tokenizer(prompts, padding="max_length", truncation=True,
                         return_tensors="np")
        return model.get_text_features(input_ids=toks["input_ids"],
                                       attention_mask=toks["attention_mask"])

    return image_embed, text_embed
