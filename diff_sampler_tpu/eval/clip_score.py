"""CLIP score: image/text cosine similarity x100 averaged over prompts.

Rebuilds `diff-solvers-main/clip_score.py:34-96` (OpenCLIP ViT-g-14
image/text cosine).  The encoder is pluggable:

  * `make_openclip_encoders(checkpoint_path)` -- the NO-NETWORK path: loads
    a local OpenCLIP torch checkpoint (e.g. ViT-g-14 laion2b_s34b_b88k, the
    reference's exact detector, clip_score.py:59) through the from-scratch
    `models/openclip.py` towers,
  * `make_hf_clip_encoders(model_name)` builds jitted Flax encoders from a
    HuggingFace CLIP checkpoint (requires network/cached weights; the
    reference likewise downloads its OpenCLIP checkpoint at run time),
  * any (image_embed_fn, text_embed_fn) pair works -- tests use stubs.
"""

from __future__ import annotations

from typing import Callable, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["clip_score", "make_hf_clip_encoders", "make_openclip_encoders",
           "clip_preprocess"]


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


_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(images_uint8, size: int):
    """uint8 NHWC -> CLIP-normalized float NHWC: bicubic resize of the
    shorter side to `size` + center crop + normalize (the torchvision
    Compose open_clip returns as `preprocess`, open_clip/transform.py)."""
    x = jnp.asarray(images_uint8).astype(jnp.float32) / 255.0
    b, h, w, _ = x.shape
    scale = size / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    x = jax.image.resize(x, (b, nh, nw, 3), "bicubic")
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[:, top : top + size, left : left + size, :]
    return (x - jnp.asarray(_CLIP_MEAN)) / jnp.asarray(_CLIP_STD)


def make_openclip_encoders(checkpoint_path: str, tokenizer=None,
                           vision_heads: Optional[int] = None):
    """Offline OpenCLIP encoders from a local torch checkpoint file
    (ViT-g-14: `open_clip_pytorch_model.bin` / `.pt`).

    Returns (image_embed_fn(uint8 NHWC), text_embed_fn(list[str])).
    tokenizer: any callable prompts -> [B, 77] int ids; defaults to
    transformers' CLIPTokenizer if its vocab is cached locally (OpenCLIP
    ships the same BPE vocab).  text_embed_fn also accepts a pre-tokenized
    int array directly.
    """
    from ..models.openclip import OpenCLIP, openclip_params_from_state_dict
    from ..models.torch_import import load_torch_file, torch_state_dict

    sd = torch_state_dict(load_torch_file(checkpoint_path))
    params = openclip_params_from_state_dict(sd)
    cfg = params.pop("config")
    if vision_heads is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, vision_heads=vision_heads)
    model = OpenCLIP(cfg)

    @jax.jit
    def image_embed(images_uint8):
        return model.encode_image(params, clip_preprocess(images_uint8,
                                                          cfg.image_size))

    encode_ids = jax.jit(lambda ids: model.encode_text(params, ids))

    def text_embed(prompts):
        if isinstance(prompts, np.ndarray) or hasattr(prompts, "dtype"):
            return encode_ids(jnp.asarray(prompts, jnp.int32))
        tok = tokenizer
        if tok is None:
            # the in-repo BPE tokenizer (utils/bpe.py) is the default: only
            # the merges FILE is an artifact, the algorithm is local
            from ..utils.bpe import SimpleBPETokenizer, find_vocab_file

            if find_vocab_file() is not None:
                tok = SimpleBPETokenizer.from_default_paths(
                    context_length=cfg.context_length)
            else:
                from transformers import CLIPTokenizer

                try:
                    tok_obj = CLIPTokenizer.from_pretrained(
                        "openai/clip-vit-large-patch14")
                except Exception as e:
                    raise RuntimeError(
                        "CLIP BPE vocab unavailable offline; place "
                        "bpe_simple_vocab_16e6.txt.gz or merges.txt where "
                        "utils.bpe.find_vocab_file looks (or set "
                        "$CLIP_BPE_VOCAB), or pass a tokenizer / "
                        "pre-tokenized [B, 77] ids") from e
                tok = lambda ps: tok_obj(  # noqa: E731
                    ps, truncation=True, max_length=cfg.context_length,
                    padding="max_length", return_tensors="np")["input_ids"]
        return encode_ids(jnp.asarray(tok(list(prompts)), jnp.int32))

    return image_embed, text_embed


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
