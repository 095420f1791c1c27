"""AMED beyond the EDM tier (VERDICT round-1 missing #4): the bottleneck tap,
bind_with_bottleneck, and the trainer must work on CM (ADMUNet-256-style),
ADM classifier guidance, and LDM tiers -- the reference's headline AMED
results include LSUN-Bedroom 13.20 @ NFE5 on the CM model
(`amed-solver-main/README.md:9`, hook points `solvers_amed.py:7-18`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from diff_sampler_tpu.models.adm import ADMClassifier, ADMUNet
from diff_sampler_tpu.models.factory import _capture_middle
from diff_sampler_tpu.models.ldm import LDMUNet
from diff_sampler_tpu.models.precond import CFGPrecond, CGPrecond, CMPrecond
from diff_sampler_tpu.solvers import amed as A
from diff_sampler_tpu.training.amed import (AMEDConfig, make_amed_train_step,
                                            predictor_from_config)

RES = 16  # tiny "256-style" config: 2 levels -> middle block at 8x8 = 64 dims

# ADM/LDM GroupNorms are fixed 32-group (guided_diffusion GroupNorm32), so
# the smallest valid width is 32 channels.
ADM_KW = dict(image_size=RES, in_channels=3, model_channels=32, out_channels=3,
              num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
              num_heads=2, num_head_channels=16, use_scale_shift_norm=False,
              resblock_updown=True)
LDM_KW = dict(image_size=RES, in_channels=3, out_channels=3, model_channels=32,
              num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
              num_heads=2)


def _cm_precond():
    net = ADMUNet(**ADM_KW)
    params = net.init(jax.random.key(0), jnp.zeros((1, RES, RES, 3)),
                      jnp.ones((1,)))["params"]

    return CMPrecond(
        model_fn=lambda x, t, y: net.apply({"params": params}, x, t, None),
        img_resolution=RES, img_channels=3, label_dim=0,
        model_fn_bottleneck=_capture_middle(net, params)), net, params


def _ldm_precond(guidance_type="uncond", guidance_rate=1.0):
    net = LDMUNet(**LDM_KW)
    params = net.init(jax.random.key(0), jnp.zeros((1, RES, RES, 3)),
                      jnp.ones((1,)))["params"]
    alphas = np.cumprod(1.0 - np.linspace(1e-4, 2e-2, 50))
    bneck = _capture_middle(net, params)
    # epsilon_t must stay >= 1/M (the first alphas keypoint); real LDM
    # checkpoints have M=1000 where the default 1e-3 is exactly 1/M.
    pre = CFGPrecond(
        model_fn=lambda x, t, cond: net.apply({"params": params}, x, t, None),
        alphas_cumprod=alphas, img_resolution=RES, img_channels=3,
        guidance_type=guidance_type, guidance_rate=guidance_rate, label_dim=0,
        epsilon_t=1.0 / 50,
        model_fn_bottleneck=lambda x, t, cond: bneck(x, t, None))
    return pre, net, params


def test_cm_bottleneck_matches_plain_call():
    pre, net, params = _cm_precond()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, RES, RES, 3).astype(np.float32))
    sigma = jnp.asarray([5.0, 1.3])
    d_plain = pre(x, sigma)
    d_b, act = pre.with_bottleneck(x, sigma)
    np.testing.assert_array_equal(np.asarray(d_plain), np.asarray(d_b))
    # middle block at 8x8 with top channels
    assert act.shape == (2, RES // 2, RES // 2, 64)


def test_cm_bind_with_bottleneck_pools_to_64():
    pre, _, _ = _cm_precond()
    den_b = A.bind_with_bottleneck(pre)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, RES, RES, 3).astype(np.float32))
    out, pooled = den_b.with_bottleneck(x, jnp.asarray([2.0, 2.0]))
    assert out.shape == x.shape
    assert pooled.shape == (2, 64)
    np.testing.assert_array_equal(np.asarray(den_b(x, jnp.asarray([2.0, 2.0]))),
                                  np.asarray(out))


def test_cm_amed_sampler_runs_and_deterministic():
    pre, _, _ = _cm_precond()
    den_b = A.bind_with_bottleneck(pre)
    cfg = AMEDConfig(num_steps=4, scale_dir=0.01, scale_time=0.0)
    pred = predictor_from_config(cfg)
    pred_params = pred.init(jax.random.key(1), jnp.zeros((2, 64)),
                            jnp.asarray(1.0), jnp.asarray(0.5))["params"]

    def pred_apply(b, tc, tn):
        return pred.apply({"params": pred_params}, b, tc, tn)

    from diff_sampler_tpu.ops import get_schedule

    t_steps = get_schedule(4, pre.sigma_min, pre.sigma_max, "polynomial", 7.0)
    lat = jax.random.normal(jax.random.key(2), (2, RES, RES, 3))
    out1 = A.AMED_SOLVER_REGISTRY["amed"](den_b, pred_apply, lat, t_steps).x
    out2 = A.AMED_SOLVER_REGISTRY["amed"](den_b, pred_apply, lat, t_steps).x
    assert np.all(np.isfinite(np.asarray(out1, np.float32)))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


@pytest.mark.slow
def test_cm_amed_training_smoke():
    """AMED trainer over the CM (ADMUNet) tier: loss finite, params move."""
    pre, _, _ = _cm_precond()
    den_b = A.bind_with_bottleneck(pre)
    cfg = AMEDConfig(num_steps=3, M=1, sampler_stu="amed", sampler_tea="heun",
                     scale_dir=0.01, scale_time=0.0,
                     sigma_min=pre.sigma_min, sigma_max=pre.sigma_max)
    pred = predictor_from_config(cfg)
    pred_params = pred.init(jax.random.key(1), jnp.zeros((2, 64)),
                            jnp.asarray(1.0), jnp.asarray(0.5))["params"]
    opt = optax.adam(cfg.lr)
    step = jax.jit(make_amed_train_step(pred, den_b, cfg, opt))
    lat = jax.random.normal(jax.random.key(3), (2, RES, RES, 3))
    new_params, _, metrics = step(pred_params, opt.init(pred_params), lat)
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         pred_params, new_params)
    assert max(jax.tree.leaves(moved)) > 0.0


@pytest.mark.slow
def test_cg_amed_training_with_labels():
    """Conditional (classifier-guidance) tier: denoise_factory per-batch
    labels thread through the jitted train step."""
    net = ADMUNet(**{**ADM_KW, "num_classes": 7,
                     "out_channels": 6})  # eps + learned variance
    params = net.init(jax.random.key(0), jnp.zeros((1, RES, RES, 3)),
                      jnp.ones((1,)), jnp.zeros((1,), jnp.int32))["params"]
    cls = ADMClassifier(image_size=RES, in_channels=3, model_channels=32,
                        out_channels=7, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_head_channels=16, pool="attention")
    cls_params = cls.init(jax.random.key(1), jnp.zeros((1, RES, RES, 3)),
                          jnp.ones((1,)))["params"]

    def capture(x, t, y):
        return net.apply({"params": params}, x, t, y, return_bottleneck=True)

    pre = CGPrecond(
        model_fn=lambda x, t, y: net.apply({"params": params}, x, t, y),
        classifier_fn=lambda x, t: cls.apply({"params": cls_params}, x, t),
        img_resolution=RES, img_channels=3, label_dim=7, guidance_rate=0.5,
        model_fn_bottleneck=capture)

    cfg = AMEDConfig(num_steps=3, M=1, sampler_stu="amed", sampler_tea="euler",
                     scale_dir=0.01, scale_time=0.0,
                     sigma_min=float(pre.sigma_min),
                     sigma_max=float(pre.sigma_max))
    pred = predictor_from_config(cfg)
    pred_params = pred.init(jax.random.key(2), jnp.zeros((2, 64)),
                            jnp.asarray(1.0), jnp.asarray(0.5))["params"]
    opt = optax.adam(cfg.lr)

    def factory(labels):
        return A.bind_with_bottleneck(pre, class_labels=labels)

    step = jax.jit(make_amed_train_step(pred, None, cfg, opt,
                                        denoise_factory=factory,
                                        sigma_fn=pre.sigma,
                                        sigma_inv_fn=pre.sigma_inv))
    lat = jax.random.normal(jax.random.key(3), (2, RES, RES, 3))
    labels = jnp.asarray([1, 4], jnp.int32)
    new_params, _, metrics = step(pred_params, opt.init(pred_params), lat,
                                  labels)
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         pred_params, new_params)
    assert max(jax.tree.leaves(moved)) > 0.0

    # regression: --batch_gpu accumulation must slice labels per microbatch
    # along with latents (full-batch labels against a microbatch crashed at
    # trace time with a broadcast error)
    import dataclasses
    cfg2 = dataclasses.replace(cfg, batch_gpu=1)
    step2 = jax.jit(make_amed_train_step(pred, None, cfg2, opt,
                                         denoise_factory=factory,
                                         sigma_fn=pre.sigma,
                                         sigma_inv_fn=pre.sigma_inv))
    p2, _, m2 = step2(pred_params, opt.init(pred_params), lat, labels)
    assert np.isfinite(float(m2["loss"]))


def test_ldm_bottleneck_and_discrete_schedule():
    pre, _, _ = _ldm_precond()
    den_b = A.bind_with_bottleneck(pre)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, RES, RES, 3).astype(np.float32))
    sigma = jnp.full((2,), 0.5 * (pre.sigma_min + pre.sigma_max))
    out, pooled = den_b.with_bottleneck(x, sigma)
    assert out.shape == x.shape and pooled.shape == (2, 64)

    from diff_sampler_tpu.ops import get_schedule

    t = get_schedule(4, pre.sigma_min, pre.sigma_max, "discrete", 7.0,
                     sigma_fn=pre.sigma, sigma_inv_fn=pre.sigma_inv)
    assert t.shape == (4,) and t[0] > t[-1] > 0


def test_cfg_doubled_batch_pools_cond_half():
    pre, _, _ = _ldm_precond(guidance_type="classifier-free", guidance_rate=2.0)
    den_b = A.bind_with_bottleneck(pre, cfg_doubled=True,
                                   condition=None, unconditional_condition=None)
    # guidance_rate != 1 but unconditional_condition None -> single batch;
    # exercise the doubled path directly through with_bottleneck semantics.
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, RES, RES, 3).astype(np.float32))
    sigma = jnp.full((2,), 1.0)
    out, act = pre.with_bottleneck(x, sigma)
    pooled = A._pool_bottleneck(act, cfg_doubled=True)
    assert pooled.shape == (1, 64)  # cond half of the 2-batch


@pytest.mark.slow
def test_ldm_amed_training_smoke_discrete():
    pre, _, _ = _ldm_precond()
    den_b = A.bind_with_bottleneck(pre)
    cfg = AMEDConfig(num_steps=3, M=1, sampler_stu="amed", sampler_tea="euler",
                     schedule_type="discrete",
                     sigma_min=float(pre.sigma_min),
                     sigma_max=float(pre.sigma_max),
                     scale_dir=0.01, scale_time=0.0)
    pred = predictor_from_config(cfg)
    pred_params = pred.init(jax.random.key(6), jnp.zeros((2, 64)),
                            jnp.asarray(1.0), jnp.asarray(0.5))["params"]
    opt = optax.adam(cfg.lr)
    step = jax.jit(make_amed_train_step(pred, den_b, cfg, opt,
                                        sigma_fn=pre.sigma,
                                        sigma_inv_fn=pre.sigma_inv))
    lat = jax.random.normal(jax.random.key(7), (2, RES, RES, 3))
    new_params, _, metrics = step(pred_params, opt.init(pred_params), lat)
    assert np.isfinite(float(metrics["loss"]))


SD_KW = dict(image_size=RES, in_channels=4, out_channels=4, model_channels=32,
             num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
             num_heads=2, use_spatial_transformer=True, transformer_depth=1,
             context_dim=16, legacy=False)


def _sd_precond(guidance_rate=7.5):
    """Tiny Stable-Diffusion-shaped tier: cross-attention latent U-Net under
    classifier-free guidance (amed training_loop.py:69-73 create_model)."""
    net = LDMUNet(**SD_KW)
    params = net.init(jax.random.key(0), jnp.zeros((1, RES, RES, 4)),
                      jnp.ones((1,)), jnp.zeros((1, 3, 16)))["params"]
    alphas = np.cumprod(1.0 - np.linspace(1e-4, 2e-2, 50))
    bneck = _capture_middle(net, params)
    pre = CFGPrecond(
        model_fn=lambda x, t, c: net.apply({"params": params}, x, t, c),
        alphas_cumprod=alphas, img_resolution=RES, img_channels=4,
        guidance_type="classifier-free", guidance_rate=guidance_rate,
        label_dim=1, epsilon_t=1.0 / 50, model_fn_bottleneck=bneck)
    return pre, net, params


@pytest.mark.slow
def test_sd_amed_training_with_captions_cfg_doubled():
    """ms_coco-style AMED training: text contexts + empty-string uncond run
    the CFG-doubled batch through the frozen SD net; the pooled bottleneck is
    the cond half (amed training_loop.py:173-180, solvers_amed.py:33-39)."""
    pre, _, _ = _sd_precond(guidance_rate=7.5)
    cfg = AMEDConfig(num_steps=3, M=1, sampler_stu="amed", sampler_tea="euler",
                     schedule_type="discrete", schedule_rho=1.0,
                     sigma_min=float(pre.sigma_min),
                     sigma_max=float(pre.sigma_max),
                     scale_dir=0.01, scale_time=0.0, guidance_type="cfg",
                     guidance_rate=7.5)
    uc = jnp.zeros((2, 3, 16))

    def denoise_factory(ctx):
        return A.bind_with_bottleneck(pre, cfg_doubled=True, condition=ctx,
                                      unconditional_condition=uc)

    pred = predictor_from_config(cfg)
    pred_params = pred.init(jax.random.key(6), jnp.zeros((2, 64)),
                            jnp.asarray(1.0), jnp.asarray(0.5))["params"]
    opt = optax.adam(cfg.lr)
    step = jax.jit(make_amed_train_step(pred, None, cfg, opt,
                                        denoise_factory=denoise_factory,
                                        sigma_fn=pre.sigma,
                                        sigma_inv_fn=pre.sigma_inv))
    lat = jax.random.normal(jax.random.key(7), (2, RES, RES, 4))
    ctx = jax.random.normal(jax.random.key(8), (2, 3, 16))
    new_params, _, metrics = step(pred_params, opt.init(pred_params), lat, ctx)
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         pred_params, new_params)
    assert max(jax.tree.leaves(moved)) > 0.0


@pytest.mark.slow
def test_train_amed_cli_ms_coco(tmp_path, monkeypatch):
    """End-to-end CLI smoke on the SD tier (tiny config, random weights,
    seeded random contexts)."""
    from click.testing import CliRunner

    from diff_sampler_tpu.cli.train_amed import main
    from diff_sampler_tpu.models import ldm as ldm_mod

    tiny = dict(
        linear_start=0.00085, linear_end=0.0120, timesteps=100,
        scale_factor=0.18215, conditioning_key="crossattn", first_stage="kl",
        unet=dict(SD_KW),
        vae=dict(z_channels=4, resolution=RES * 2, ch=32, ch_mult=(1, 2),
                 num_res_blocks=1, attn_resolutions=(), double_z=True),
        embed_dim=4)
    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS",
                        {**ldm_mod.LDM_CONFIGS, "ms_coco": tiny})
    args = [f"--outdir={tmp_path}", "--dataset_name=ms_coco",
            "--model_path=random", "--guidance_type=cfg",
            "--guidance_rate=7.5", "--total_kimg=1", "--batch=512",
            "--num_steps=3", "--m=1", "--sampler_tea=euler",
            "--schedule_type=discrete", "--schedule_rho=1", "--afs=False"]
    res = CliRunner().invoke(main, args, catch_exceptions=False)
    assert res.exit_code == 0, res.output
    runs = list(tmp_path.iterdir())
    assert len(runs) == 1
    assert (runs[0] / "predictor.npz").exists()


def test_lsun_cat_requires_explicit_model_path():
    """The reference lists lsun_cat as a choice but registers no checkpoint
    URL (train.py:18 vs download_util.py:6-19); we fail with a clear error."""
    from diff_sampler_tpu.models.factory import create_model

    with pytest.raises(ValueError, match="lsun_cat"):
        create_model("lsun_cat", model_path=None)


def test_amed_sample_cli_path_conditional(tmp_path):
    """cli/sample._amed_sample on a classifier-guided tier: per-seed class
    labels are drawn and bound (train/sample symmetry regression -- the CG
    precond asserts class_labels is not None)."""
    import json
    import os

    from diff_sampler_tpu.cli.sample import _amed_sample
    from diff_sampler_tpu.utils import checkpoint as ckpt

    net = ADMUNet(**{**ADM_KW, "num_classes": 7, "out_channels": 6})
    params = net.init(jax.random.key(0), jnp.zeros((1, RES, RES, 3)),
                      jnp.ones((1,)), jnp.zeros((1,), jnp.int32))["params"]

    def capture(x, t, y):
        return net.apply({"params": params}, x, t, y, return_bottleneck=True)

    pre = CGPrecond(
        model_fn=lambda x, t, y: net.apply({"params": params}, x, t, y),
        classifier_fn=lambda x, t: jnp.zeros((x.shape[0], 7), x.dtype),
        img_resolution=RES, img_channels=3, label_dim=7, guidance_rate=0.0,
        model_fn_bottleneck=capture)

    cfg = AMEDConfig(num_steps=3, M=1, sampler_stu="amed", sampler_tea="euler",
                     afs=False, sigma_min=float(pre.sigma_min),
                     sigma_max=float(pre.sigma_max))
    pred = predictor_from_config(cfg)
    pp = pred.init(jax.random.key(1), jnp.zeros((2, 64)), jnp.asarray(1.0),
                   jnp.asarray(0.5))["params"]
    run = tmp_path / "00000-test"
    os.makedirs(run)
    ckpt.save_config(str(run / "predictor_config.json"), cfg)
    ckpt.save_params(str(run / "predictor.npz"), pp)

    out = tmp_path / "samples"
    _amed_sample(pre, None, None, str(run), [0, 1, 2], (RES, RES, 3),
                 4, str(out), False, False, "imagenet256-test")
    pngs = [f for _r, _d, fs in os.walk(out) for f in fs if f.endswith(".png")]
    assert len(pngs) == 3


def test_ldm_bottleneck_tap_late_binds_params(monkeypatch):
    """factory._capture_middle_lazy: the AMED bottleneck tap reads
    ld.unet_params at CALL time (like LatentDiffusion.apply_model,
    ldm.py:595), so a jit caller can route the 274-860M tree as an
    ARGUMENT by assigning the tracer -- embedding it as HLO constants
    stalls the axon remote compile (BENCH_NOTES round 4)."""
    from diff_sampler_tpu.models import ldm as ldm_mod
    from diff_sampler_tpu.models.factory import build_ldm_model
    from test_sfd_ldm import CTX, _tiny_ldm_configs

    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS", _tiny_ldm_configs())
    pre, _ = build_ldm_model("ms_coco", "random", guidance_rate=7.5)
    ld = pre.latent_diffusion
    params = ld.unet_params
    res, chn = pre.img_resolution, pre.img_channels
    x = jnp.ones((2, res, res, chn), jnp.float32)
    sigma = jnp.full((2,), 1.0)
    ctx = jnp.zeros((2, 77, CTX), jnp.float32)
    uncond = jnp.zeros((1, 77, CTX), jnp.float32)

    def tapped(p, x):
        ld.unet_params = p  # routes BOTH model_fn and the bottleneck tap
        out, act = pre.with_bottleneck(x, sigma, condition=ctx,
                                       unconditional_condition=uncond)
        return out, act

    try:
        jaxpr = jax.make_jaxpr(tapped)(params, x)
        param_bytes = sum(a.size * a.dtype.itemsize
                          for a in jax.tree.leaves(params))
        const_bytes = sum(np.asarray(c).nbytes for c in jaxpr.consts)
        # captured constants must be incidental scalars/tables, never the
        # weight tree (tiny net here; at 860M this is 3.44 GB of HLO)
        assert const_bytes < max(1024, param_bytes // 100), \
            (const_bytes, param_bytes)
        # and the tap really evaluates under the late-bound tree
        out, act = jax.jit(tapped)(params, x)
        assert np.isfinite(np.asarray(out)).all()
        assert act.shape[0] == 2 * x.shape[0]  # CFG-doubled activation
    finally:
        ld.unet_params = params


def test_train_amed_cli_fsdp(tmp_path, monkeypatch):
    """`--fsdp` on a latent tier shards the FROZEN net 1/n over the data
    axis and routes it as a jit argument; training completes finite and
    the predictor checkpoint is written (VERDICT r4 item 5: train_amed
    lacked the flag train_sfd had)."""
    import json

    from click.testing import CliRunner

    from diff_sampler_tpu.cli.train_amed import main
    from diff_sampler_tpu.models import ldm as ldm_mod
    from diff_sampler_tpu.parallel import fsdp as fsdpmod

    # RES=16 so the middle block pools to 8*8 = 64 predictor dims (the
    # test_sfd_ldm tiny configs are RES=8 -> 16 dims, too small for AMED)
    tiny = dict(
        linear_start=0.0015, linear_end=0.0195, timesteps=100,
        scale_factor=1.0, conditioning_key=None, first_stage="vq",
        unet=dict(image_size=RES, in_channels=3, out_channels=3,
                  model_channels=32, attention_resolutions=(2,),
                  num_res_blocks=1, channel_mult=(1, 2),
                  num_head_channels=16),
        vae=dict(z_channels=3, resolution=RES * 2, ch=32, ch_mult=(1, 2),
                 num_res_blocks=1, attn_resolutions=()),
        n_embed=32, embed_dim=3)
    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS",
                        {**ldm_mod.LDM_CONFIGS, "lsun_bedroom_ldm": tiny})
    # the tiny net sits below the production min-shard floor
    monkeypatch.setattr(fsdpmod, "_MIN_SHARD_ELEMS", 512)
    args = [f"--outdir={tmp_path}", "--dataset_name=lsun_bedroom_ldm",
            "--model_path=random", "--guidance_type=uncond",
            "--total_kimg=1", "--batch=512", "--num_steps=3", "--m=1",
            "--sampler_tea=euler", "--schedule_type=discrete",
            "--schedule_rho=1", "--afs=False", "--fsdp"]
    res = CliRunner().invoke(main, args, catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert "FSDP: frozen net" in res.output
    run = next(tmp_path.iterdir())
    assert (run / "predictor.npz").exists()
    stats = (run / "stats.jsonl").read_text().strip().splitlines()
    assert stats and np.isfinite(json.loads(stats[-1])["Loss/loss"]["mean"])


def test_train_amed_cli_fsdp_tp_exclusive(tmp_path):
    from click.testing import CliRunner

    from diff_sampler_tpu.cli.train_amed import main

    res = CliRunner().invoke(main, [
        f"--outdir={tmp_path}", "--dataset_name=lsun_bedroom_ldm",
        "--model_path=random", "--tp=2", "--fsdp"])
    assert res.exit_code != 0
    assert "mutually exclusive" in res.output


def test_train_amed_cli_fsdp_pixel_rejected(tmp_path):
    """--fsdp on a pixel tier is a clear UsageError, not a silent no-op."""
    from click.testing import CliRunner

    from diff_sampler_tpu.cli.train_amed import main

    res = CliRunner().invoke(main, [
        f"--outdir={tmp_path}", "--dataset_name=cifar10",
        "--model_path=random", "--fsdp"])
    assert res.exit_code != 0
    assert "ldm/sd" in res.output


def test_train_amed_cli_cm_pixel_params_as_args(tmp_path, monkeypatch):
    """The CM/ADM pixel tiers route the frozen net tree through the train
    jit as an ARGUMENT (round 5: the same contract as the latent tiers --
    a closure-embedded 550M tree stalls the axon remote compile): the CLI
    step rebinds model_fn/model_fn_bottleneck over the traced tree and
    training completes finite."""
    import json

    from click.testing import CliRunner

    import diff_sampler_tpu.cli.train_amed as ta

    pre, net, params = _cm_precond()
    pre.net = net  # factory contract (build_cm_model sets this)
    monkeypatch.setattr(ta, "create_model",
                        lambda *a, **k: (pre, params, "cm"))
    res = CliRunner().invoke(ta.main, [
        f"--outdir={tmp_path}", "--dataset_name=lsun_bedroom",
        "--model_path=random", "--total_kimg=1", "--batch=512",
        "--num_steps=3", "--m=1", "--afs=False"], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    run = next(tmp_path.iterdir())
    assert (run / "predictor.npz").exists()
    stats = (run / "stats.jsonl").read_text().strip().splitlines()
    assert stats and np.isfinite(json.loads(stats[-1])["Loss/loss"]["mean"])


def test_train_amed_cli_adm_pixel_params_as_args(tmp_path, monkeypatch):
    """Same params-as-argument contract on the ADM+classifier (imagenet256)
    tier: the CLI step rebinds model_fn, classifier_fn AND the bottleneck
    tap over the traced {model, classifier} tree, and the conditional
    denoise_factory (per-trajectory random labels) still threads through.
    This is the src == 'adm' branch of the round-5 pixel step_fn."""
    import json

    from click.testing import CliRunner

    import diff_sampler_tpu.cli.train_amed as ta

    net = ADMUNet(**{**ADM_KW, "num_classes": 7,
                     "out_channels": 6})  # eps + learned variance
    params = net.init(jax.random.key(0), jnp.zeros((1, RES, RES, 3)),
                      jnp.ones((1,)), jnp.zeros((1,), jnp.int32))["params"]
    cls = ADMClassifier(image_size=RES, in_channels=3, model_channels=32,
                        out_channels=7, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_head_channels=16, pool="attention")
    cls_params = cls.init(jax.random.key(1), jnp.zeros((1, RES, RES, 3)),
                          jnp.ones((1,)))["params"]
    pre = CGPrecond(
        model_fn=lambda x, t, y: net.apply({"params": params}, x, t, y),
        classifier_fn=lambda x, t: cls.apply({"params": cls_params}, x, t),
        img_resolution=RES, img_channels=3, label_dim=7, guidance_rate=0.5,
        model_fn_bottleneck=_capture_middle(net, params))
    pre.net, pre.classifier = net, cls  # factory contract (build_cg_model)
    tree = {"model": params, "classifier": cls_params}
    monkeypatch.setattr(ta, "create_model",
                        lambda *a, **k: (pre, tree, "adm"))
    res = CliRunner().invoke(ta.main, [
        f"--outdir={tmp_path}", "--dataset_name=imagenet256",
        "--model_path=random", "--total_kimg=1", "--batch=512",
        "--num_steps=3", "--m=1", "--afs=False"], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    run = next(tmp_path.iterdir())
    assert (run / "predictor.npz").exists()
    stats = (run / "stats.jsonl").read_text().strip().splitlines()
    assert stats and np.isfinite(json.loads(stats[-1])["Loss/loss"]["mean"])
