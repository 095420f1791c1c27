"""LDM/SD tier parity: latent U-Net (legacy + spatial-transformer variants),
VAE decoder/encoder vs the reference torch modules; VQ quantize and the beta
schedule vs independent formulations."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_sampler_tpu.models.ldm import (LDM_CONFIGS, AutoencoderKL,
                                         DiagonalGaussianDistribution, LDMUNet,
                                         VAEDecoder, VAEEncoder, VQModel,
                                         linear_alphas_cumprod,
                                         ldm_state_dict_to_params)


@pytest.fixture(scope="module")
def ref_ldm(reference_dir):
    base = str(reference_dir / "diff-solvers-main")
    if base not in sys.path:
        sys.path.insert(0, base)
    # the reference imports omegaconf only for an isinstance check
    # (openaimodel.py:476); stub it.
    import types

    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        om.listconfig = lc
        sys.modules["omegaconf"] = om
        sys.modules["omegaconf.listconfig"] = lc
    for m in [k for k in list(sys.modules) if k == "models" or k.startswith("models.")]:
        del sys.modules[m]
    from models.ldm.modules.diffusionmodules import model as vae
    from models.ldm.modules.diffusionmodules import openaimodel
    return openaimodel, vae


def _mech(state_dict):
    from diff_sampler_tpu.models.ldm import _mechanical

    return _mechanical(state_dict)


def test_ldm_unet_legacy_attention(ref_ldm):
    """LSUN-style config: plain AttentionBlock path (openaimodel legacy)."""
    import torch

    openaimodel, _ = ref_ldm
    torch.manual_seed(0)
    kw = dict(image_size=16, in_channels=3, out_channels=3, model_channels=32,
              attention_resolutions=(2, 4), num_res_blocks=1,
              channel_mult=(1, 2, 3), num_head_channels=16)
    net_t = openaimodel.UNetModel(**kw)
    net_t.eval()
    params = _mech(net_t.state_dict())
    net_j = LDMUNet(**kw)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([5.0, 700.0], dtype=np.float32)
    with torch.no_grad():
        out_t = net_t(torch.as_tensor(x), torch.as_tensor(t)).numpy()
    out_j = net_j.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(t))
    err = np.abs(np.asarray(out_j).transpose(0, 3, 1, 2) - out_t).max()
    assert err < 2e-4, err


def test_ldm_unet_spatial_transformer(ref_ldm):
    """SD-style config: SpatialTransformer with cross-attention context."""
    import torch

    openaimodel, _ = ref_ldm
    torch.manual_seed(2)
    kw = dict(image_size=16, in_channels=4, out_channels=4, model_channels=32,
              attention_resolutions=(1, 2), num_res_blocks=1,
              channel_mult=(1, 2), num_heads=4, use_spatial_transformer=True,
              transformer_depth=1, context_dim=24, legacy=False)
    net_t = openaimodel.UNetModel(**kw)
    net_t.eval()
    params = _mech(net_t.state_dict())
    net_j = LDMUNet(**{k: v for k, v in kw.items()})

    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([5.0, 700.0], dtype=np.float32)
    ctx = rng.randn(2, 7, 24).astype(np.float32)
    with torch.no_grad():
        out_t = net_t(torch.as_tensor(x), torch.as_tensor(t),
                      context=torch.as_tensor(ctx)).numpy()
    out_j = net_j.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(t), jnp.asarray(ctx))
    err = np.abs(np.asarray(out_j).transpose(0, 3, 1, 2) - out_t).max()
    assert err < 2e-4, err


def test_vae_decoder(ref_ldm):
    import torch

    _, vae = ref_ldm
    torch.manual_seed(4)
    dd = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(8,), resolution=16, z_channels=3,
              in_channels=3, dropout=0.0)
    dec_t = vae.Decoder(**dd)
    dec_t.eval()
    params = _mech(dec_t.state_dict())
    dec_j = VAEDecoder(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(8,), resolution=16, z_channels=3)
    rng = np.random.RandomState(5)
    z = rng.randn(2, 3, 8, 8).astype(np.float32)
    with torch.no_grad():
        out_t = dec_t(torch.as_tensor(z)).numpy()
    out_j = dec_j.apply({"params": params}, jnp.asarray(z.transpose(0, 2, 3, 1)))
    err = np.abs(np.asarray(out_j).transpose(0, 3, 1, 2) - out_t).max()
    assert err < 2e-4, err


def test_vae_encoder(ref_ldm):
    import torch

    _, vae = ref_ldm
    torch.manual_seed(6)
    dd = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(), resolution=16, z_channels=3,
              in_channels=3, dropout=0.0, double_z=True)
    enc_t = vae.Encoder(**dd)
    enc_t.eval()
    params = _mech(enc_t.state_dict())
    enc_j = VAEEncoder(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(), resolution=16, in_channels=3,
                       z_channels=3, double_z=True)
    rng = np.random.RandomState(7)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        out_t = enc_t(torch.as_tensor(x)).numpy()
    out_j = enc_j.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    err = np.abs(np.asarray(out_j).transpose(0, 3, 1, 2) - out_t).max()
    assert err < 2e-4, err


def test_vq_quantize_nearest_neighbor():
    rng = np.random.RandomState(8)
    codebook = rng.randn(16, 3).astype(np.float32)
    z = rng.randn(2, 4, 4, 3).astype(np.float32)
    vq = VQModel(decoder=None, decoder_params=None, post_quant_conv=None,
                 codebook=codebook)
    q = np.asarray(vq.quantize(jnp.asarray(z)))
    # independent nearest-neighbor
    zf = z.reshape(-1, 3)
    d = ((zf[:, None] - codebook[None]) ** 2).sum(-1)
    expect = codebook[d.argmin(1)].reshape(z.shape)
    np.testing.assert_allclose(q, expect, atol=1e-6)


def test_linear_schedule_matches_reference_formula():
    import torch

    ac = linear_alphas_cumprod(0.00085, 0.0120, 1000)
    betas = torch.linspace(0.00085**0.5, 0.0120**0.5, 1000,
                           dtype=torch.float64) ** 2
    ref = torch.cumprod(1.0 - betas, 0).numpy()
    np.testing.assert_allclose(ac, ref, rtol=1e-10)
    assert ac.shape == (1000,) and 0 < ac[-1] < ac[0] < 1


@pytest.mark.slow
def test_cfg_precond_with_latent_diffusion():
    """CFGPrecond over a random-init SD-style LatentDiffusion: classifier-free
    guidance doubling + discrete sigma maps run end-to-end."""
    from diff_sampler_tpu.models.ldm import build_latent_diffusion
    from diff_sampler_tpu.models.precond import CFGPrecond
    from diff_sampler_tpu.ops import get_schedule
    from diff_sampler_tpu.solvers import get_sampler

    cfg = dict(LDM_CONFIGS["ms_coco"])
    small_unet = dict(cfg["unet"], model_channels=32, channel_mult=(1, 2),
                      attention_resolutions=(1, 2), context_dim=24)
    small_vae = dict(cfg["vae"], ch=32, ch_mult=(1, 2), resolution=32)
    import diff_sampler_tpu.models.ldm as L

    old = L.LDM_CONFIGS["ms_coco"]
    L.LDM_CONFIGS["ms_coco"] = dict(cfg, unet=small_unet, vae=small_vae)
    try:
        ld = build_latent_diffusion("ms_coco")
    finally:
        L.LDM_CONFIGS["ms_coco"] = old

    pre = CFGPrecond(
        model_fn=lambda x, t, cond: ld.apply_model(x, t, cond),
        alphas_cumprod=ld.alphas_cumprod, img_resolution=64, img_channels=4,
        guidance_type="classifier-free", guidance_rate=3.0)
    assert 0 < pre.sigma_min < 1 < pre.sigma_max

    rng = np.random.RandomState(9)
    lat = jnp.asarray(rng.randn(2, 64, 64, 4).astype(np.float32))
    cond = jnp.asarray(rng.randn(2, 7, 24).astype(np.float32))
    uncond = jnp.asarray(rng.randn(2, 7, 24).astype(np.float32))

    from diff_sampler_tpu.models.precond import bind

    den = bind(pre, condition=cond, unconditional_condition=uncond)
    t_steps = get_schedule(4, pre.sigma_min, pre.sigma_max, "discrete", 1.0,
                           sigma_fn=pre.sigma, sigma_inv_fn=pre.sigma_inv)
    out = get_sampler("dpmpp")(den, lat, t_steps).x
    assert out.shape == lat.shape and bool(jnp.isfinite(out).all())
    # decode latents through the VAE (scale factor path)
    img = ld.decode_first_stage(out[:, :32, :32, :])
    assert img.shape[-1] == 3 and bool(jnp.isfinite(img).all())


def test_sigma_inv_roundtrip():
    from diff_sampler_tpu.models.precond import CFGPrecond

    ac = linear_alphas_cumprod(0.00085, 0.0120, 1000)
    pre = CFGPrecond(model_fn=None, alphas_cumprod=ac)
    sig = np.array([0.2, 1.0, 5.0, 50.0], np.float32)
    t = pre.sigma_inv(jnp.asarray(sig))
    back = pre.sigma(t)
    np.testing.assert_allclose(np.asarray(back), sig, rtol=1e-3)


@pytest.mark.slow
def test_factory_ldm_random_and_clip_conversion():
    """Factory LDM path with random init end-to-end (small override), plus
    the CLIP text-param converter on a tiny random torch CLIP state_dict."""
    import diff_sampler_tpu.models.ldm as L
    from diff_sampler_tpu.models.factory import build_ldm_model

    old = L.LDM_CONFIGS["lsun_bedroom_ldm"]
    small = dict(old, unet=dict(old["unet"], model_channels=32,
                                channel_mult=(1, 2), attention_resolutions=(2,)),
                 vae=dict(old["vae"], ch=32, ch_mult=(1, 2), resolution=32))
    L.LDM_CONFIGS["lsun_bedroom_ldm"] = small
    try:
        pre, _ = build_ldm_model("lsun_bedroom_ldm", "random")
    finally:
        L.LDM_CONFIGS["lsun_bedroom_ldm"] = old
    x = jnp.zeros((1, 64, 64, 3))
    d = pre(x, 2.0)
    assert d.shape == x.shape and bool(jnp.isfinite(d).all())
    assert pre.sigma_min == 0.006
    img = pre.latent_diffusion.decode_first_stage(x[:, :16, :16, :])
    assert img.shape == (1, 32, 32, 3)


def test_fused_qkv_projection_parity():
    """_FUSE_QKV merges the q/k/v (self-attn) and k/v (cross-attn)
    projections into one call-time-concatenated matmul; outputs must be
    bit-compatible with the unfused path (same math, same param tree)."""
    from diff_sampler_tpu.models import ldm as ldm_mod

    kw = dict(image_size=16, in_channels=4, out_channels=4,
              model_channels=32, num_res_blocks=1,
              attention_resolutions=(1, 2), channel_mult=(1, 2), num_heads=2,
              use_spatial_transformer=True, transformer_depth=1,
              context_dim=16, legacy=False)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 4))
    t = jnp.full((2,), 10.0)
    ctx = jax.random.normal(jax.random.key(1), (2, 5, 16))
    outs = {}
    assert not ldm_mod._FUSE_QKV  # opt-in: measured -0.2% (no win) on TPU
    try:
        for fuse in (True, False):
            ldm_mod._FUSE_QKV = fuse
            net = ldm_mod.LDMUNet(**kw)
            params = net.init(jax.random.key(2), x, t, ctx)["params"]
            outs[fuse] = (net.apply({"params": params}, x, t, ctx), params)
    finally:
        ldm_mod._FUSE_QKV = False
    # identical param trees (checkpoint layout is unchanged by the fusion)
    ka = jax.tree_util.tree_structure(outs[True][1])
    kb = jax.tree_util.tree_structure(outs[False][1])
    assert ka == kb
    np.testing.assert_allclose(np.asarray(outs[True][0]),
                               np.asarray(outs[False][0]),
                               rtol=2e-5, atol=2e-5)
