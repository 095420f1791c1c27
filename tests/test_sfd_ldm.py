"""SFD distillation on the latent (LDM / Stable-Diffusion) tier
(sfd-main/training/training_loop.py:85-110,168-186,227-260): latent student
training step, gradient-accumulation equivalence, and the ms_coco /
lsun_bedroom_ldm CLI smoke paths on tiny configs."""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from diff_sampler_tpu.models.ldm import LDMUNet, linear_alphas_cumprod
from diff_sampler_tpu.models.precond import CFGPrecond
from diff_sampler_tpu.training.sfd import (SFDConfig, make_ldm_train_step,
                                           make_train_step)

RES, ZC, CTX = 8, 4, 16


def _tiny_sd():
    """Tiny cross-attention latent U-Net + CFGPrecond (SD-shaped)."""
    unet = LDMUNet(image_size=RES, in_channels=ZC, out_channels=ZC,
                   model_channels=32, attention_resolutions=(2,),
                   num_res_blocks=1, channel_mult=(1, 2), num_heads=2,
                   use_spatial_transformer=True, transformer_depth=1,
                   context_dim=CTX, legacy=False)
    params = unet.init(jax.random.key(0), jnp.zeros((1, RES, RES, ZC)),
                       jnp.ones((1,)), jnp.zeros((1, 3, CTX)))["params"]

    def unet_apply(p, x, t, c=None):
        if c is None:
            return unet.apply({"params": p}, x, t)
        return unet.apply({"params": p}, x, t, c)

    precond = CFGPrecond(
        model_fn=lambda x, t, c: unet_apply(params, x, t, c),
        alphas_cumprod=linear_alphas_cumprod(0.00085, 0.012, 100),
        img_resolution=RES, img_channels=ZC,
        guidance_type="classifier-free", guidance_rate=7.5)
    precond.sigma_min = 0.1  # sfd training_loop.py:105 (ms_coco narrowing)
    return unet_apply, precond, params


def _cfg(**kw):
    base = dict(num_steps=3, M=1, sampler_tea="dpmpp",
                schedule_type="discrete", schedule_rho=1.0, afs=False)
    base.update(kw)
    return SFDConfig(**base)


def test_ldm_sfd_loss_decreases():
    unet_apply, precond, params = _tiny_sd()
    opt = optax.adam(1e-3)
    step = jax.jit(make_ldm_train_step(unet_apply, precond, _cfg(), opt))
    teacher = jax.tree.map(lambda a: a.copy(), params)
    student = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.key(1), a.shape),
        params)
    opt_state = opt.init(student)
    lat = jax.random.normal(jax.random.key(2), (4, RES, RES, ZC))
    ctx = jax.random.normal(jax.random.key(3), (4, 3, CTX))
    losses = []
    for _ in range(8):
        student, opt_state, m = step(student, opt_state, teacher, lat, ctx)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_ldm_sfd_teacher_equals_student_zero_first_step():
    """euler teacher at M=0 steps exactly like the student euler segment, so
    with student == teacher the first-segment loss is ~0 (validates the
    latent preconditioning wiring end-to-end, cf. the pixel-tier twin)."""
    unet_apply, precond, params = _tiny_sd()
    opt = optax.sgd(0.0)
    step = jax.jit(make_ldm_train_step(
        unet_apply, precond, _cfg(M=0, sampler_tea="euler"), opt))
    lat = jax.random.normal(jax.random.key(2), (2, RES, RES, ZC))
    ctx = jax.random.normal(jax.random.key(3), (2, 3, CTX))
    _, _, m = step(params, opt.init(params), params, lat, ctx)
    per_step = np.asarray(m["loss_per_step"])
    assert per_step[0] < 1e-4, per_step


def test_ldm_sfd_guidance_rate_forced_to_one():
    """Training always runs the single (conditional) branch regardless of the
    sampling guidance_rate (training_loop.py:185 net.guidance_rate = 1.0)."""
    unet_apply, precond, params = _tiny_sd()
    opt = optax.adam(1e-3)
    lat = jax.random.normal(jax.random.key(2), (2, RES, RES, ZC))
    ctx = jax.random.normal(jax.random.key(3), (2, 3, CTX))
    outs = []
    for rate in (1.0, 7.5):
        pc = dataclasses.replace(precond, guidance_rate=rate)
        pc.sigma_min = precond.sigma_min
        step = jax.jit(make_ldm_train_step(unet_apply, pc, _cfg(), opt))
        p, _, m = step(params, opt.init(params), params, lat, ctx)
        outs.append((m["loss"], p))
    np.testing.assert_allclose(float(outs[0][0]), float(outs[1][0]), rtol=1e-6)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         outs[0][1], outs[1][1])
    assert max(jax.tree.leaves(diffs)) == 0.0


def test_grad_accumulation_matches_full_batch():
    """n_acc microbatch rounds == one full-batch step (training_loop.py:
    269-295: grads summed across rounds, one optimizer update per segment).
    Exercised on the pixel tier (cheaper net, same generic step)."""
    from diff_sampler_tpu.models import precond as P

    net = P.EDMPrecond(img_resolution=8, img_channels=3, label_dim=0,
                       model_type="SongUNet",
                       model_kwargs=dict(model_channels=16, channel_mult=[1, 2],
                                         num_blocks=1, attn_resolutions=[4],
                                         dropout=0.0))
    params = net.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)),
                      jnp.ones((1,)))["params"]
    teacher = jax.tree.map(lambda a: a.copy(), params)
    opt = optax.sgd(1e-3)  # sgd: update linear in grads -> exact equivalence
    cfg = SFDConfig(num_steps=3, M=1)
    lat = jax.random.normal(jax.random.key(2), (4, 8, 8, 3))

    outs = []
    for n_acc in (1, 2):
        step = jax.jit(make_train_step(net, cfg, opt, n_acc=n_acc))
        p, _, m = step(params, opt.init(params), teacher, lat)
        outs.append((float(m["loss"]), p))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         outs[0][1], outs[1][1])
    assert max(jax.tree.leaves(diffs)) < 1e-6


def _tiny_ldm_configs():
    """Tiny LDM_CONFIGS overrides for CLI smoke tests."""
    return {
        "ms_coco": dict(
            linear_start=0.00085, linear_end=0.0120, timesteps=100,
            scale_factor=0.18215, conditioning_key="crossattn",
            first_stage="kl",
            unet=dict(image_size=RES, in_channels=ZC, out_channels=ZC,
                      model_channels=32, attention_resolutions=(2,),
                      num_res_blocks=1, channel_mult=(1, 2), num_heads=2,
                      use_spatial_transformer=True, transformer_depth=1,
                      context_dim=CTX, legacy=False),
            vae=dict(z_channels=ZC, resolution=RES * 2, ch=32, ch_mult=(1, 2),
                     num_res_blocks=1, attn_resolutions=(), double_z=True),
            embed_dim=ZC,
        ),
        "lsun_bedroom_ldm": dict(
            linear_start=0.0015, linear_end=0.0195, timesteps=100,
            scale_factor=1.0, conditioning_key=None, first_stage="vq",
            unet=dict(image_size=RES, in_channels=3, out_channels=3,
                      model_channels=32, attention_resolutions=(2,),
                      num_res_blocks=1, channel_mult=(1, 2),
                      num_head_channels=16),
            vae=dict(z_channels=3, resolution=RES * 2, ch=32, ch_mult=(1, 2),
                     num_res_blocks=1, attn_resolutions=()),
            n_embed=32, embed_dim=3,
        ),
    }


@pytest.mark.slow
@pytest.mark.parametrize("dataset,extra", [
    ("ms_coco", ["--guidance_type=cfg", "--guidance_rate=7.5"]),
    ("lsun_bedroom_ldm", ["--guidance_type=uncond"]),
])
def test_train_sfd_cli_latent_tier(tmp_path, monkeypatch, dataset, extra):
    """End-to-end CLI smoke: latent student trains, snapshots + stats land
    (mirrors `sfd-main/train.py` invocation for the LDM/SD tiers)."""
    from click.testing import CliRunner

    from diff_sampler_tpu.cli.train_sfd import main
    from diff_sampler_tpu.models import ldm as ldm_mod

    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS", _tiny_ldm_configs())
    args = [f"--dataset_name={dataset}", f"--outdir={tmp_path}",
            "--model_path=random", "--total_kimg=1", "--batch=256",
            "--num_steps=3", "--m=1", "--schedule_type=discrete",
            "--schedule_rho=1", "--afs=False", "--tick=2", "--snap=2",
            *extra]
    res = CliRunner().invoke(main, args, catch_exceptions=False)
    assert res.exit_code == 0, res.output
    runs = list(tmp_path.iterdir())
    assert len(runs) == 1
    run = runs[0]
    snaps = sorted(run.glob("snapshot-*.npz"))
    assert snaps, list(run.iterdir())
    opts = json.loads((run / "training_options.json").read_text())
    assert opts["dataset_name"] == dataset
    stats = (run / "stats.jsonl").read_text().strip().splitlines()
    assert stats and np.isfinite(json.loads(stats[-1])["Loss/loss"]["mean"])


@pytest.mark.slow
def test_latent_student_train_then_sample_roundtrip(tmp_path, monkeypatch):
    """Train a tiny latent SFD student via the CLI, then SAMPLE from the run
    dir: the sample CLI must rebuild the LDM stack, swap in the distilled
    U-Net weights, restore the training schedule, and decode to PNGs
    (sfd sample.py:110-135,189-196)."""
    from click.testing import CliRunner

    from diff_sampler_tpu.cli.sample import main as sample_main
    from diff_sampler_tpu.cli.train_sfd import main as train_main
    from diff_sampler_tpu.models import ldm as ldm_mod

    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS", _tiny_ldm_configs())
    out = tmp_path / "exps"
    res = CliRunner().invoke(train_main, [
        "--dataset_name=lsun_bedroom_ldm", f"--outdir={out}",
        "--model_path=random", "--total_kimg=1", "--batch=256",
        "--num_steps=3", "--m=1", "--schedule_type=discrete",
        "--schedule_rho=1", "--afs=False", "--guidance_type=uncond",
        "--tick=2", "--snap=2"], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    run_dir = next(iter(out.iterdir()))

    samples = tmp_path / "samples"
    res = CliRunner().invoke(sample_main, [
        "--dataset_name=lsun_bedroom_ldm", f"--model_path={run_dir}",
        "--seeds=0-7", "--batch=8", f"--outdir={samples}",
        "--subdirs=False"], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert "Restored SFD sampling settings" in res.output
    pngs = sorted(samples.glob("*.png"))
    assert len(pngs) == 8, res.output


@pytest.mark.slow
def test_train_sfd_cli_ms_coco_forces_128_accumulation(tmp_path, monkeypatch):
    """ms_coco forces an effective batch of 128 via accumulation rounds of
    fresh latents (training_loop.py:227,246): --batch=64 -> 2 rounds of 64,
    128 images per iteration."""
    from click.testing import CliRunner

    from diff_sampler_tpu.cli.train_sfd import main
    from diff_sampler_tpu.models import ldm as ldm_mod

    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS", _tiny_ldm_configs())
    args = [f"--dataset_name=ms_coco", f"--outdir={tmp_path}",
            "--model_path=random", "--total_kimg=1", "--batch=64",
            "--num_steps=3", "--m=1", "--schedule_type=discrete",
            "--schedule_rho=1", "--afs=False", "--guidance_type=cfg",
            "--tick=8", "--snap=2"]
    res = CliRunner().invoke(main, args, catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert "Gradient accumulation: 2 rounds of 64" in res.output
    assert "(batch 128)" in res.output
