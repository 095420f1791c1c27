"""Diffusers-plugin round trip (VERDICT round-1 missing #5).

Proves `export_amed_schedule` output reproduces the JAX AMED sampler inside
the reference's diffusers scheduler subclass: the JAX AMED-plugin DPM++(2M)
sampler (VE space, midpoints in-graph) and a faithful numpy emulation of
`amed-solver-main/diffusers_amed_plugin_dpmpp.py` (VP space, static
interleaved timesteps + scale lists) run the same analytic discrete-time
model from the same latents and must produce the same images.

Setup notes:
  * the discrete sigma grid is built to contain the base schedule AND the
    learned midpoints exactly, so set_timesteps' argmin snapping is lossless,
  * scale_time is pinned to 1 (scale_time=0 head): with st != 1 the plugin
    evaluates eps at a shifted time but converts x0 with the UNSHIFTED sigma
    (set_timesteps only rewrites self.timesteps), while the reference (and
    our) AMED sampler re-preconditions at the shifted sigma -- the plugin is
    itself approximate there, so exact round-trip is only defined at st=1,
  * the predictor's r-head weights are zeroed -> r = 0.5 for every sample,
    matching the plugin's batch-constant schedule.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_sampler_tpu.integrations.amed_export import export_amed_schedule
from diff_sampler_tpu.integrations.diffusers_emulation import (
    AMEDDPMSolverMultistepEmulator)
from diff_sampler_tpu.models.precond import CFGPrecond
from diff_sampler_tpu.ops import get_schedule
from diff_sampler_tpu.solvers import amed as A
from diff_sampler_tpu.solvers.amed import BottleneckDenoiser
from diff_sampler_tpu.utils.rng import stacked_randn

# Data scale chosen so |x0| stays < 1 along the trajectory: our dpmpp (like
# the torch reference, solver_utils.py:77-86) applies Imagen dynamic
# thresholding to x0 predictions, which is a no-op for |x0| <= 1; the
# diffusers plugin ships with thresholding off, so the round trip is exact
# only in that regime (true for real image models, whose x0 lives in [-1,1]).
MU, VAR = 0.1, 0.04
N_STEPS = 5  # 2N-2 = 8 < 15 so the plugin's lower_order_final fires like ours
SHAPE = (4, 4, 2)


SIGMA_MIN, SIGMA_MAX = 0.05, 25.0


def _build_problem():
    """(alphas_cumprod, pre, t_base) with an exact interleaved sigma grid.

    The endpoints are pinned explicitly (not read back from the f32
    interpolation in CFGPrecond) so the exporter's internal get_schedule
    regenerates EXACTLY the same base schedule; alphas_cumprod must be
    DECREASING with index (sigma increasing), like a real checkpoint table.
    """
    dense = np.geomspace(SIGMA_MIN, SIGMA_MAX, 400)
    t_base = np.asarray(get_schedule(N_STEPS, SIGMA_MIN, SIGMA_MAX,
                                     "polynomial", 7.0), np.float64)
    t_mid = np.sqrt(t_base[1:] * t_base[:-1])  # r = 0.5 geometric midpoints
    grid = np.unique(np.concatenate([dense, t_base, t_mid]))  # ascending
    ac = 1.0 / (1.0 + grid**2)  # descending with index
    pre = CFGPrecond(model_fn=None, alphas_cumprod=ac, img_resolution=4,
                     img_channels=2, guidance_type="uncond",
                     guidance_rate=1.0, label_dim=0, epsilon_t=1.0 / len(ac))
    return ac, pre, t_base


def _eps_from_sigma(x_vp, sigma_ve):
    """Analytic eps for data ~ N(MU, VAR) at VE sigma, VP parameterization."""
    x_ve = x_vp * np.sqrt(1.0 + sigma_ve**2)
    x0 = (VAR * x_ve + sigma_ve**2 * MU) / (VAR + sigma_ve**2)
    return (x_ve - x0) / sigma_ve


def test_amed_dpmpp_roundtrip_through_plugin_emulation():
    ac, pre, t_base = _build_problem()
    M = pre.M

    def model_fn(x_vp, c_noise, cond):
        t_cont = (c_noise + 1.0) / M
        sigma_ve = pre.sigma(t_cont).reshape((-1,) + (1,) * (x_vp.ndim - 1))
        return _eps_from_sigma(x_vp, sigma_ve)

    pre.model_fn = model_fn
    den = lambda x, t: pre(x, t)

    # constant predictor: r = 0.5 (zeroed r-head), scale_dir/time = 1
    cfg_pred = A.AMEDPredictor(scale_dir=0.0, scale_time=0.0)
    pred_params = cfg_pred.init(jax.random.key(0), jnp.zeros((2, 64)),
                                jnp.asarray(1.0), jnp.asarray(0.5))["params"]
    pred_params = jax.tree.map(jnp.zeros_like, pred_params)

    def pred_apply(b, tc, tn):
        return cfg_pred.apply({"params": pred_params}, b, tc, tn)

    den_b = BottleneckDenoiser(
        fn=lambda x, t: (den(x, t), jnp.zeros((x.shape[0], 64), x.dtype)),
        plain_fn=den, sigma_min=pre.sigma_min, sigma_max=pre.sigma_max)

    # --- JAX AMED-plugin DPM++(2M) sampler ---------------------------------
    seeds = jnp.asarray([0, 1, 2])
    latents = stacked_randn(seeds, SHAPE, jnp.float32)
    out_jax = A.AMED_SOLVER_REGISTRY["dpmpp"](
        den_b, pred_apply, latents, t_base, max_order=2,
        lower_order_final=True).x
    out_jax = np.asarray(out_jax, np.float64)

    # --- export -------------------------------------------------------------
    sched = export_amed_schedule(
        pred_apply, den_b, SHAPE, N_STEPS, SIGMA_MIN, SIGMA_MAX,
        alphas_cumprod=ac, seeds=range(3))
    np.testing.assert_allclose(sched["sigmas"], t_base, rtol=1e-12)
    np.testing.assert_allclose(sched["r"], 0.5, atol=1e-7)
    all_sigmas = np.sqrt((1.0 - ac) / ac)
    # exact-grid construction: snapping must be lossless
    inter = np.empty(2 * (N_STEPS - 1) + 1)
    inter[0::2] = t_base
    inter[1::2] = np.asarray(sched["t_mid"])
    np.testing.assert_allclose(all_sigmas[sched["timesteps"]], inter,
                               rtol=1e-7)

    # --- plugin emulation ----------------------------------------------------
    emu = AMEDDPMSolverMultistepEmulator(ac, solver_order=2,
                                         lower_order_final=True)
    emu.set_timesteps(sched["timesteps"], sched["scale_dirs_interleaved"],
                      sched["scale_times_interleaved"])

    def eps_model(x_vp, t_idx):
        return _eps_from_sigma(x_vp, all_sigmas[t_idx])

    x_ve0 = np.asarray(latents, np.float64) * t_base[0]
    alpha0 = 1.0 / np.sqrt(1.0 + t_base[0] ** 2)
    x_vp_final = emu.sample(eps_model, alpha0 * x_ve0)
    alpha_end = 1.0 / np.sqrt(1.0 + inter[-1] ** 2)
    out_emu = x_vp_final / alpha_end

    err = np.abs(out_jax - out_emu).max()
    assert err < 1e-3, f"round-trip max diff {err}"


def test_emulator_timestep_shift_matches_plugin_semantics():
    """set_timesteps' odd-index scale_time shift: target sigma snapped within
    (timesteps[i+1]+1, timesteps[i-1]) exactly as the plugin does."""
    ac, _, t_base = _build_problem()
    all_sigmas = np.sqrt((1.0 - ac) / ac)
    t_mid = np.sqrt(t_base[1:] * t_base[:-1])
    inter = np.empty(2 * (N_STEPS - 1) + 1)
    inter[0::2] = t_base
    inter[1::2] = t_mid
    timesteps = [int(np.abs(all_sigmas - s).argmin()) for s in inter]

    emu = AMEDDPMSolverMultistepEmulator(ac, solver_order=2)
    st = np.ones(len(inter))
    st[1::2] = 0.9  # shift midpoints to 0.9 * sigma
    emu.set_timesteps(timesteps, np.ones(len(inter)), st)
    for i in range(1, len(timesteps) - 1, 2):
        target = inter[i] * 0.9
        lo, hi = timesteps[i + 1] + 1, timesteps[i - 1]
        expect = lo + int(np.argmin(np.abs(all_sigmas[lo:hi] - target)))
        assert emu.timesteps[i] == expect
        # shifted eval sigma is below the unshifted midpoint
        assert all_sigmas[emu.timesteps[i]] <= inter[i]
