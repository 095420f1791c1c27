"""Regression tests for the round-3 code-review fixes: lr-drop boundary in
optimizer updates, ms_coco accumulation honoring --batch_gpu, the latent
--remat guard, missing-captions errors, the SD --prompt sampling path, and
GITS dp search with caption conditioning."""

import numpy as np
import pytest

from test_sfd_ldm import _tiny_ldm_configs, CTX


def test_lr_drop_boundary_counts_segment_updates():
    """The 10x lr drop must land at HALF TRAINING in images: the optax
    schedule counts optimizer updates and the SFD step runs num_steps-1
    updates per iteration (one per trajectory segment, sfd
    training_loop.py:297-301 vs training/sfd.py seg scan)."""
    from diff_sampler_tpu.cli.train_sfd import _lr_drop_updates

    # 200 kimg at eff_batch 128 -> 781 iterations to half; num_steps=4 ->
    # 3 updates each.
    half_iters = (200 * 1000) // (2 * 128)
    assert _lr_drop_updates(200, 128, 4, sfdv=False, seed=0) == half_iters * 3
    assert _lr_drop_updates(200, 128, 2, sfdv=False, seed=0) == half_iters * 1

    # SFD-v: replays the exact seeded num_steps draw sequence.
    sim = np.random.RandomState(7)
    expect = sum(int(sim.randint(4, 8)) - 1 for _ in range(half_iters))
    assert _lr_drop_updates(200, 128, 4, sfdv=True, seed=7) == expect
    # draws in [4,7] -> 3..6 updates per iteration
    assert 3 * half_iters <= expect <= 6 * half_iters


def test_ms_coco_accumulation_honors_batch_gpu():
    """ms_coco forces an effective 128 via rounds of the MICROBATCH
    (training_loop.py:227) -- --batch_gpu caps the microbatch so
    reference-style `--batch=128 --batch_gpu=32` runs 4 rounds of 32, not
    one OOM-sized round of 128."""
    from diff_sampler_tpu.cli.train_sfd import _accumulation

    assert _accumulation("ms_coco", 128, 32) == (4, 32)
    assert _accumulation("ms_coco", 32, None) == (4, 32)
    assert _accumulation("ms_coco", 128, None) == (1, 128)
    assert _accumulation("ms_coco", 256, None) == (1, 256)
    assert _accumulation("cifar10", 128, 32) == (4, 32)
    assert _accumulation("cifar10", 128, None) == (1, 128)


def test_ldm_unet_remat_parity():
    """LDMUNet(remat=True) must be a pure memory/recompute trade: identical
    param tree (flat checkpoint-parity names), identical outputs, and
    gradients matching the non-remat VJP."""
    import jax
    import jax.numpy as jnp

    from diff_sampler_tpu.models.ldm import LDMUNet

    kw = dict(image_size=8, in_channels=4, out_channels=4, model_channels=32,
              attention_resolutions=(2,), num_res_blocks=1,
              channel_mult=(1, 2), num_heads=2, use_spatial_transformer=True,
              transformer_depth=1, context_dim=CTX, legacy=False)
    base = LDMUNet(**kw)
    rmt = LDMUNet(remat=True, **kw)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4), jnp.float32)
    t = jnp.ones((2,))
    c = jnp.asarray(np.random.RandomState(1).randn(2, 3, CTX), jnp.float32)
    params = base.init(jax.random.key(0), x, t, c)["params"]
    p2 = rmt.init(jax.random.key(0), x, t, c)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)

    def loss(mod):
        return lambda p: jnp.sum(mod.apply({"params": p}, x, t, c) ** 2)

    l0, g0 = jax.value_and_grad(loss(base))(params)
    l1, g1 = jax.value_and_grad(loss(rmt))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), g0, g1)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


def test_train_sfd_latent_remat_smoke(tmp_path, monkeypatch):
    """--remat=True on a latent tier trains end to end (the flag used to be
    silently ignored; now it reaches the U-Net build)."""
    from click.testing import CliRunner

    from diff_sampler_tpu.cli.train_sfd import main
    from diff_sampler_tpu.models import ldm as ldm_mod

    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS", _tiny_ldm_configs())
    res = CliRunner().invoke(main, [
        "--dataset_name=lsun_bedroom_ldm", f"--outdir={tmp_path}",
        "--model_path=random", "--total_kimg=1", "--batch=512",
        "--num_steps=3", "--m=1", "--schedule_type=discrete",
        "--schedule_rho=1", "--afs=False", "--guidance_type=uncond",
        "--remat=True", "--tick=1", "--snap=1"], catch_exceptions=False)
    assert res.exit_code == 0, res.output


def test_missing_captions_path_raises():
    """A GIVEN --prompts_path that does not exist must raise, not silently
    fall back to random-context smoke mode."""
    from diff_sampler_tpu.training.conditioning import load_captions

    assert load_captions(None) is None
    with pytest.raises(FileNotFoundError, match="captions CSV not found"):
        load_captions("/nonexistent/captions.csv")


def _patch_text_encoder(monkeypatch):
    """Deterministic stand-in for the CLIP text tower on random-init SD."""
    from diff_sampler_tpu.models import ldm as ldm_mod

    def fake_cond(self, prompts):
        out = np.zeros((len(prompts), 7, CTX), np.float32)
        for i, p in enumerate(prompts):
            rng = np.random.RandomState(abs(hash(p)) % (1 << 31))
            out[i] = rng.randn(7, CTX)
        return out

    monkeypatch.setattr(ldm_mod.LatentDiffusion, "get_learned_conditioning",
                        fake_cond)


@pytest.mark.slow
def test_sample_cli_sd_prompt(tmp_path, monkeypatch):
    """`--dataset_name=ms_coco --prompt=...` must sample through the bound
    prompt conditioning -- CFGPrecond takes condition=, not class_labels=,
    and its label_dim=1 must not route into the class-label branch."""
    from click.testing import CliRunner

    from diff_sampler_tpu.cli.sample import main
    from diff_sampler_tpu.models import ldm as ldm_mod

    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS", _tiny_ldm_configs())
    _patch_text_encoder(monkeypatch)
    out = tmp_path / "samples"
    res = CliRunner().invoke(main, [
        "--dataset_name=ms_coco", "--model_path=random", "--prompt=a cat",
        "--guidance_rate=7.5", "--seeds=0-3", "--batch=4", "--num_steps=3",
        f"--outdir={out}", "--subdirs=False"], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert len(sorted(out.glob("*.png"))) == 4


@pytest.mark.slow
def test_sample_cli_sd_gits_dp(tmp_path, monkeypatch):
    """GITS --dp on ms_coco (no --prompt): the warmup teacher must run with
    per-seed caption conditioning (gits_utils.py:63-110), on the model's
    discrete schedule, and produce a valid dp schedule + samples."""
    from click.testing import CliRunner

    from diff_sampler_tpu.cli import clip_score as cs
    from diff_sampler_tpu.cli.sample import main
    from diff_sampler_tpu.models import ldm as ldm_mod

    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS", _tiny_ldm_configs())
    _patch_text_encoder(monkeypatch)
    monkeypatch.setattr(cs, "load_captions",
                        lambda path=None: [f"caption {i}" for i in range(8)])
    out = tmp_path / "samples"
    res = CliRunner().invoke(main, [
        "--dataset_name=ms_coco", "--model_path=random",
        "--guidance_rate=7.5", "--seeds=0-3", "--batch=4",
        "--dp=True", "--num_steps=4", "--num_steps_tea=7", "--num_warmup=4",
        f"--outdir={out}", "--subdirs=False"], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert "GITS dp_list" in res.output
    assert len(sorted(out.glob("*.png"))) == 4


@pytest.mark.slow
def test_train_sfd_cli_resume_with_optimizer_state(tmp_path, monkeypatch):
    """--resume must restore params AND Adam moments from a snapshot (the
    unflatten used a nonexistent jax.tree.util and crashed; the moment
    structure now comes from jax.eval_shape without allocating)."""
    from click.testing import CliRunner

    from diff_sampler_tpu.cli.train_sfd import main
    from diff_sampler_tpu.models import ldm as ldm_mod

    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS", _tiny_ldm_configs())
    base = ["--dataset_name=lsun_bedroom_ldm", "--model_path=random",
            "--batch=512", "--num_steps=3", "--m=1",
            "--schedule_type=discrete", "--schedule_rho=1", "--afs=False",
            "--guidance_type=uncond", "--tick=1", "--snap=1"]
    out1 = tmp_path / "first"
    res = CliRunner().invoke(main, base + [
        f"--outdir={out1}", "--total_kimg=1"], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    snap = sorted(next(out1.iterdir()).glob("snapshot-*.npz"))[-1]

    out2 = tmp_path / "second"
    res = CliRunner().invoke(main, base + [
        f"--outdir={out2}", "--total_kimg=2", f"--resume={snap}"],
        catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert "Resumed from" in res.output
    # the resumed run continued from 1 kimg, not from scratch
    assert "kimg 2.05" in res.output or "kimg 2.0" in res.output, res.output
