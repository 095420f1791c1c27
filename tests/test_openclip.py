"""Offline OpenCLIP towers (`models/openclip.py`): cross-implementation
parity against transformers' torch CLIPModel on a tiny random-init config
(same architecture family as open_clip's CLIP: pre-LN ViT + causal text
transformer, EOT pooling), shape inference, and the gated real-ViT-g test."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from diff_sampler_tpu.models.openclip import (OpenCLIP,
                                              infer_openclip_config,
                                              openclip_params_from_state_dict)

VITG_CANDIDATES = [
    "/root/models/open_clip_pytorch_model.bin",
    "/root/models/vit_g_14_laion2b_s34b_b88k.bin",
    os.path.expanduser("~/.cache/diff_sampler_tpu/src/clip/open_clip_pytorch_model.bin"),
]


def _tiny_hf_clip():
    """Random-init torch CLIPModel with plain GELU (laion checkpoints use
    non-quick gelu, open_clip model.py) at tiny dims."""
    import torch
    from transformers import (CLIPConfig, CLIPModel, CLIPTextConfig,
                              CLIPVisionConfig)

    torch.manual_seed(0)
    cfg = CLIPConfig.from_text_vision_configs(
        # eos_token_id = max id: transformers pools at the first EOS position
        # while open_clip argmax-pools -- identical when EOS is the max id
        # appearing once at the end (the real tokenizer guarantees this).
        CLIPTextConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       max_position_embeddings=16, hidden_act="gelu",
                       eos_token_id=63),
        CLIPVisionConfig(hidden_size=48, intermediate_size=96,
                         num_hidden_layers=2, num_attention_heads=4,
                         image_size=24, patch_size=8, hidden_act="gelu"),
        projection_dim=20)
    model = CLIPModel(cfg).eval()
    return model, cfg


def _to_openclip_sd(model):
    """Repackage a transformers CLIPModel state_dict in open_clip naming
    (the historical conversion direction: HF's checkpoints were converted
    FROM open_clip; this inverts the mechanical renames)."""
    import torch

    sd = {k: v.detach() for k, v in model.state_dict().items()}
    out = {}
    v = "vision_model."
    out["visual.conv1.weight"] = sd[v + "embeddings.patch_embedding.weight"]
    out["visual.class_embedding"] = sd[v + "embeddings.class_embedding"]
    out["visual.positional_embedding"] = sd[v + "embeddings.position_embedding.weight"]
    out["visual.ln_pre.weight"] = sd[v + "pre_layrnorm.weight"]
    out["visual.ln_pre.bias"] = sd[v + "pre_layrnorm.bias"]
    out["visual.ln_post.weight"] = sd[v + "post_layernorm.weight"]
    out["visual.ln_post.bias"] = sd[v + "post_layernorm.bias"]
    out["visual.proj"] = sd["visual_projection.weight"].T.contiguous()

    def blocks(src_prefix, dst_prefix, n):
        for i in range(n):
            s = f"{src_prefix}.encoder.layers.{i}."
            d = f"{dst_prefix}.resblocks.{i}."
            out[d + "ln_1.weight"] = sd[s + "layer_norm1.weight"]
            out[d + "ln_1.bias"] = sd[s + "layer_norm1.bias"]
            out[d + "attn.in_proj_weight"] = torch.cat(
                [sd[s + "self_attn.q_proj.weight"],
                 sd[s + "self_attn.k_proj.weight"],
                 sd[s + "self_attn.v_proj.weight"]])
            out[d + "attn.in_proj_bias"] = torch.cat(
                [sd[s + "self_attn.q_proj.bias"],
                 sd[s + "self_attn.k_proj.bias"],
                 sd[s + "self_attn.v_proj.bias"]])
            out[d + "attn.out_proj.weight"] = sd[s + "self_attn.out_proj.weight"]
            out[d + "attn.out_proj.bias"] = sd[s + "self_attn.out_proj.bias"]
            out[d + "ln_2.weight"] = sd[s + "layer_norm2.weight"]
            out[d + "ln_2.bias"] = sd[s + "layer_norm2.bias"]
            out[d + "mlp.c_fc.weight"] = sd[s + "mlp.fc1.weight"]
            out[d + "mlp.c_fc.bias"] = sd[s + "mlp.fc1.bias"]
            out[d + "mlp.c_proj.weight"] = sd[s + "mlp.fc2.weight"]
            out[d + "mlp.c_proj.bias"] = sd[s + "mlp.fc2.bias"]

    blocks("vision_model", "visual.transformer",
           model.config.vision_config.num_hidden_layers)
    blocks("text_model", "transformer",
           model.config.text_config.num_hidden_layers)
    out["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    out["positional_embedding"] = sd["text_model.embeddings.position_embedding.weight"]
    out["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    out["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    out["text_projection"] = sd["text_projection.weight"].T.contiguous()
    return out


@pytest.fixture(scope="module")
def converted():
    model, cfg = _tiny_hf_clip()
    sd = _to_openclip_sd(model)
    params = openclip_params_from_state_dict(sd)
    ocfg = params.pop("config")
    # tiny dims defeat the head-width table; pin heads explicitly
    import dataclasses

    ocfg = dataclasses.replace(ocfg, vision_heads=4, text_heads=4)
    return model, cfg, OpenCLIP(ocfg), params, ocfg


def test_config_shape_inference(converted):
    _, cfg, _, _, ocfg = converted
    assert ocfg.embed_dim == 20
    assert ocfg.image_size == 24 and ocfg.patch_size == 8
    assert ocfg.vision_width == 48 and ocfg.vision_layers == 2
    assert ocfg.text_width == 32 and ocfg.text_layers == 2
    assert ocfg.vocab_size == 64 and ocfg.context_length == 16


def test_image_tower_parity(converted):
    import torch

    model, _, ours, params, ocfg = converted
    rng = np.random.RandomState(0)
    pixels = rng.randn(2, 24, 24, 3).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)))
    got = ours.encode_image(params, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


def test_text_tower_parity(converted):
    import torch

    model, _, ours, params, ocfg = converted
    rng = np.random.RandomState(1)
    ids = rng.randint(1, 50, size=(3, 16))
    ids[:, -1] = 63  # EOT = max id -> argmax pooling picks it in both impls
    with torch.no_grad():
        ref = model.get_text_features(input_ids=torch.from_numpy(ids))
    got = ours.encode_text(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


def test_clip_preprocess_resize_crop():
    from diff_sampler_tpu.eval.clip_score import clip_preprocess

    imgs = np.random.RandomState(0).randint(0, 256, (2, 64, 48, 3), np.uint8)
    out = clip_preprocess(imgs, 24)
    assert out.shape == (2, 24, 24, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_openclip_score_end_to_end(converted):
    """clip_score through the from-scratch towers (pre-tokenized ids)."""
    from diff_sampler_tpu.eval.clip_score import clip_preprocess, clip_score

    _, _, ours, params, ocfg = converted
    import jax

    image_fn = jax.jit(lambda u: ours.encode_image(
        params, clip_preprocess(u, ocfg.image_size)))
    text_fn = lambda ids: ours.encode_text(  # noqa: E731
        params, jnp.asarray(ids, jnp.int32))
    imgs = np.random.RandomState(2).randint(0, 256, (4, 32, 32, 3), np.uint8)
    ids = np.random.RandomState(3).randint(1, 50, size=(4, 16))
    ids[:, -1] = 63
    score = clip_score(image_fn, text_fn, [(imgs, ids)])
    assert np.isfinite(score) and -100.0 <= score <= 100.0


def test_vitg_checkpoint_import_if_present():
    """Feature-parity hook: runs only when the real laion2b ViT-g-14
    checkpoint is available locally (offline env cannot download it)."""
    path = next((p for p in VITG_CANDIDATES if os.path.isfile(p)), None)
    if path is None:
        pytest.skip("OpenCLIP ViT-g-14 checkpoint not available (offline env)")
    from diff_sampler_tpu.eval.clip_score import make_openclip_encoders

    image_fn, text_fn = make_openclip_encoders(path)
    imgs = np.random.RandomState(0).randint(0, 256, (2, 512, 512, 3), np.uint8)
    e = np.asarray(image_fn(imgs))
    assert e.shape == (2, 1024) and np.all(np.isfinite(e))
