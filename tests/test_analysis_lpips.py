"""Analyzer toolbox + LPIPS + dataset_tool tests."""

import os
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_sampler_tpu import analysis
from diff_sampler_tpu.eval.lpips import LPIPS
from diff_sampler_tpu.models.analytic import GaussianDenoiser
from diff_sampler_tpu.ops import get_schedule
from diff_sampler_tpu.solvers import get_sampler


@pytest.fixture(scope="module")
def traj():
    den = GaussianDenoiser(-0.1, 0.04)
    t = get_schedule(9, 0.002, 80.0)
    lat = jax.random.normal(jax.random.key(0), (4, 2, 4, 4))
    out = get_sampler("ipndm")(den, lat, t, return_inters=True)
    return out, t, den, lat


def test_denoised_trajectory_matches_definition(traj):
    out, t, _, _ = traj
    den_traj = analysis.denoised_trajectory(out.xs, out.eps, t)
    # by definition denoised_i = x_i - t_i * d_i
    i = 3
    expect = out.xs[i] - float(t[i]) * out.eps[i]
    np.testing.assert_allclose(np.asarray(den_traj[i]), np.asarray(expect),
                               rtol=1e-6)


def test_trajectory_report_shapes(traj):
    out, t, den, lat = traj
    ref = get_sampler("euler")(den, lat, t, return_inters=True)
    rep = analysis.trajectory_report(out.xs, out.eps, t, ref.xs)
    T = out.xs.shape[0]
    assert rep["magnitude"].shape == (T,)
    assert rep["deviation"].shape == (T - 2,)
    assert rep["direction_cosine"].shape == (T - 2,)
    assert rep["deviation_to_reference"].shape == (T,)
    assert np.isfinite(rep["pca_curvature"]).all()
    assert np.isfinite(rep["pca_torsion"]).all()
    # diffusion trajectories are near-straight: cosines close to 1
    assert rep["direction_cosine"].mean() > 0.5


def test_straight_line_geometry():
    # A perfectly straight trajectory: zero deviation/curvature, cosine 1.
    line = jnp.linspace(0, 1, 7)[:, None, None] * jnp.ones((1, 2, 3))
    dev = analysis.trajectory_report(line)
    np.testing.assert_allclose(dev["deviation"], 0.0, atol=1e-5)
    np.testing.assert_allclose(dev["direction_cosine"], 1.0, atol=1e-5)
    np.testing.assert_allclose(dev["curvature"], 0.0, atol=1e-4)


@pytest.mark.slow
def test_lpips_premetric_properties():
    net = LPIPS()
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3)) * 0.5
    y = jax.random.normal(jax.random.key(2), (2, 32, 32, 3)) * 0.5
    params = jax.jit(net.init)(jax.random.key(0), x, y)["params"]
    d_same = net.apply({"params": params}, x, x)
    d_diff = net.apply({"params": params}, x, y)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    assert np.all(np.asarray(d_diff) > 0)
    d_sym = net.apply({"params": params}, y, x)
    np.testing.assert_allclose(np.asarray(d_diff), np.asarray(d_sym), rtol=1e-4)


@pytest.mark.slow
def test_sfd_second_stage_with_lpips():
    import optax

    from diff_sampler_tpu.models import precond as P
    from diff_sampler_tpu.training.sfd import SFDConfig, make_train_step

    net = P.EDMPrecond(img_resolution=16, img_channels=3, label_dim=0,
                       model_type="SongUNet",
                       model_kwargs=dict(model_channels=16, channel_mult=[1, 2],
                                         num_blocks=1, attn_resolutions=[8],
                                         dropout=0.0))
    params = jax.jit(net.init)(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                               jnp.ones((1,)))["params"]
    lp = LPIPS(resize_to=32)
    lp_params = jax.jit(lp.init)(jax.random.key(1), jnp.zeros((1, 16, 16, 3)),
                                 jnp.zeros((1, 16, 16, 3)))["params"]
    cfg = SFDConfig(num_steps=2, M=0, sampler_tea="euler", is_second_stage=True)
    opt = optax.adam(1e-5)
    step = jax.jit(make_train_step(
        net, cfg, opt,
        lpips_fn=lambda a, b: lp.apply({"params": lp_params}, a, b)))
    teacher = jax.tree.map(lambda a: a + 0.01, params)
    p2, _, m = step(params, opt.init(params), teacher,
                    jax.random.normal(jax.random.key(3), (2, 16, 16, 3)))
    assert np.isfinite(float(m["loss"]))


def test_dataset_tool_roundtrip(tmp_path):
    import PIL.Image
    from click.testing import CliRunner

    from diff_sampler_tpu.cli.dataset_tool import main as dt_main
    from diff_sampler_tpu.eval.dataset import ImageFolderDataset

    src = tmp_path / "src"
    os.makedirs(src)
    rng = np.random.RandomState(0)
    for i in range(5):
        PIL.Image.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8)).save(
            src / f"im{i}.png")
    dest = str(tmp_path / "out.zip")
    res = CliRunner().invoke(dt_main, ["--source", str(src), "--dest", dest])
    assert res.exit_code == 0, res.output
    ds = ImageFolderDataset(dest)
    assert len(ds) == 5
    assert ds[0][0].shape == (8, 8, 3)


def test_dataset_tool_npz_labels(tmp_path):
    from click.testing import CliRunner

    from diff_sampler_tpu.cli.dataset_tool import main as dt_main
    from diff_sampler_tpu.eval.dataset import ImageFolderDataset

    rng = np.random.RandomState(1)
    npz = str(tmp_path / "d.npz")
    np.savez(npz, images=(rng.rand(6, 8, 8, 3) * 255).astype(np.uint8),
             labels=np.arange(6) % 3)
    dest = str(tmp_path / "out2.zip")
    res = CliRunner().invoke(dt_main, ["--source", npz, "--dest", dest,
                                       "--resolution", "16"])
    assert res.exit_code == 0, res.output
    ds = ImageFolderDataset(dest, use_labels=True)
    assert len(ds) == 6 and ds.label_dim == 3
    assert ds[0][0].shape == (16, 16, 3)
