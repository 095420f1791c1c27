"""Tests for the main_extend.ipynb-equivalent analyzer tier: approximated-
Gaussian-score denoisers, regularity projection, Procrustes calibration, and
windowed curvature/torsion (`diff-analyzer-main/main_extend.ipynb`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from diff_sampler_tpu import analysis
from diff_sampler_tpu.models import analytic


def test_isotropic_gaussian_denoiser_matches_exact():
    # data ~ N(mu, I): IsotropicGaussianDenoiser must equal the general
    # GaussianDenoiser with unit variance.
    rng = np.random.default_rng(0)
    mu = rng.normal(size=(4, 4, 3)).astype(np.float32)
    x = rng.normal(size=(5, 4, 4, 3)).astype(np.float32)
    iso = analytic.IsotropicGaussianDenoiser(mu)
    gen = analytic.GaussianDenoiser(mu, np.ones_like(mu))
    for t in (0.1, 1.0, 10.0):
        np.testing.assert_allclose(np.asarray(iso(jnp.asarray(x), t)),
                                   np.asarray(gen(jnp.asarray(x), t)),
                                   rtol=1e-5, atol=1e-5)


def test_low_rank_gaussian_full_rank_matches_exact():
    # With rank == D and data drawn from N(mu, diag(var)), the empirical
    # low-rank denoiser approaches the exact diagonal-covariance denoiser.
    rng = np.random.default_rng(1)
    d = 6
    mu = rng.normal(size=d).astype(np.float32)
    var = (0.5 + rng.random(d)).astype(np.float32)
    data = mu + np.sqrt(var) * rng.normal(size=(20000, d)).astype(np.float32)
    den = analytic.LowRankGaussianDenoiser.from_data(data, rank=d)
    gen = analytic.GaussianDenoiser(mu, var)
    x = rng.normal(size=(7, d)).astype(np.float32)
    for t in (0.3, 2.0):
        got = np.asarray(den(jnp.asarray(x), t))
        want = np.asarray(gen(jnp.asarray(x), t))
        # empirical moments from 20k draws: ~2% tolerance
        np.testing.assert_allclose(got, want, rtol=0.1, atol=0.05)


def test_mixture_single_component_reduces_to_component():
    rng = np.random.default_rng(2)
    mu = rng.normal(size=8).astype(np.float32)
    comp = analytic.IsotropicGaussianDenoiser(mu)
    mix = analytic.MixtureGaussianDenoiser([comp])
    x = rng.normal(size=(3, 8)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(mix(jnp.asarray(x), 1.5)),
                               np.asarray(comp(jnp.asarray(x), 1.5)),
                               rtol=1e-5, atol=1e-6)


def test_mixture_picks_nearest_component_at_small_sigma():
    # Two far-apart components: at small sigma the posterior weight collapses
    # onto the nearest one.
    mu_a = np.zeros(16, np.float32)
    mu_b = np.full(16, 20.0, np.float32)
    mix = analytic.MixtureGaussianDenoiser(
        [analytic.IsotropicGaussianDenoiser(mu_a),
         analytic.IsotropicGaussianDenoiser(mu_b)])
    x = jnp.asarray(mu_b + 0.1)[None]
    out = np.asarray(mix(x, 0.5))
    near_b = np.asarray(analytic.IsotropicGaussianDenoiser(mu_b)(x, 0.5))
    np.testing.assert_allclose(out, near_b, rtol=1e-4, atol=1e-4)


def test_regularity_projection_shapes_and_orthogonality():
    rng = np.random.default_rng(3)
    traj = rng.normal(size=(30, 4, 5, 5, 1)).astype(np.float64)
    xs, ys, zs = analysis.regularity_projection(traj)
    assert xs.shape == ys.shape == zs.shape == (30, 4)
    # endpoint convention: coordinates are relative to the final state
    np.testing.assert_allclose(xs[-1], 0.0, atol=1e-8)
    np.testing.assert_allclose(ys[-1], 0.0, atol=1e-8)
    np.testing.assert_allclose(zs[-1], 0.0, atol=1e-8)
    # sign convention: the midpoint test vector has negative u1 coordinate
    assert np.all(xs[30 // 2] <= 1e-12)


def test_keep_central_drops_outliers():
    xs = np.zeros((10, 10))
    ys = np.ones((10, 10))
    ys[:, 3] = 100.0  # outlier
    zs = np.zeros((10, 10))
    kx, ky, kz = analysis.keep_central(xs, ys, zs, ratio=0.8)
    assert kx.shape[1] == 8
    assert ky.max() < 100.0


def test_procrustes_align_recovers_rotation():
    # A rotated copy of the base trajectory must align back onto it exactly.
    rng = np.random.default_rng(4)
    t = np.linspace(0, 1, 50)
    base = np.stack([t, np.sin(2 * np.pi * t), np.cos(2 * np.pi * t)], 1)
    theta = 0.7
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    other = base.copy()
    other[:, 1:] = other[:, 1:] @ rot.T
    xs = np.stack([base[:, 0], other[:, 0]], 1)
    ys = np.stack([base[:, 1], other[:, 1]], 1)
    zs = np.stack([base[:, 2], other[:, 2]], 1)
    ax, ay, az = analysis.procrustes_align(xs, ys, zs, base_idx=0, proj_dim=2)
    np.testing.assert_allclose(ay[:, 1], ys[:, 0], atol=1e-8)
    np.testing.assert_allclose(az[:, 1], zs[:, 0], atol=1e-8)


def test_windowed_curvature_torsion_on_helix():
    # Helix r(u) = (a cos u, a sin u, b u): curvature a/(a^2+b^2),
    # torsion b/(a^2+b^2) -- both constant.
    a, b = 2.0, 0.5
    u = np.linspace(0, 6 * np.pi, 600)
    xs = (a * np.cos(u))[:, None]
    ys = (a * np.sin(u))[:, None]
    zs = (b * u)[:, None]
    curv, tors, s = analysis.windowed_curvature_torsion(xs, ys, zs,
                                                        window_size=21)
    c2 = a * a + b * b
    mid = slice(50, -50)  # reference's reflected end-padding blurs the ends
    # the windowed cubic fit carries O(window-span^2) truncation bias (~0.6%
    # here); the estimate must be constant along the helix and close to exact
    np.testing.assert_allclose(curv[mid, 0], a / c2, rtol=1e-2)
    np.testing.assert_allclose(tors[mid, 0], b / c2, rtol=1e-2)
    assert np.ptp(curv[mid, 0]) < 1e-6
    assert np.ptp(tors[mid, 0]) < 1e-6


def test_straight_line_has_zero_curvature():
    t = np.linspace(0, 5, 100)[:, None]
    curv, tors, _s = analysis.windowed_curvature_torsion(
        3 * t, -2 * t, 0.5 * t, window_size=11)
    assert np.nanmax(curv) < 1e-8


@pytest.mark.slow
def test_analyze_trajectories_sharded_stats_smoke(tmp_path):
    """main_mp.ipynb-scale harness: sharded stat accumulation over a mesh."""
    import subprocess
    import sys
    import os
    import json

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, "scripts/analyze_trajectories.py",
         "--model_path=random", "--dataset_name=cifar10", "--num_steps=6",
         "--batch=16", "--num_images=20", f"--outdir={tmp_path}"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads((tmp_path / "report.json").read_text())
    assert "magnitude" in report and len(report["magnitude"]) == 6
    assert "direction_cosine" in report


@pytest.mark.slow
def test_analyze_extend_script_smoke(tmp_path):
    import subprocess
    import sys
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "scripts/analyze_extend.py",
         "--mode=low_rank_gaussian", "--num_steps=31", "--batch=4",
         "--resolution=8", "--rank=8", "--window=15",
         f"--outdir={tmp_path}"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert (tmp_path / "traj_3d_raw_low_rank_gaussian.png").exists()
    assert (tmp_path / "traj_3d_calibrated_low_rank_gaussian.png").exists()
    assert (tmp_path / "curv_tors_low_rank_gaussian.png").exists()
    assert (tmp_path / "stats_low_rank_gaussian.json").exists()
