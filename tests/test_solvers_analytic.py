"""Solver correctness against the exact probability-flow ODE solution of a
Gaussian data distribution (order-of-convergence + accuracy ranking).  This is
the test strategy SURVEY.md section 4 derives from the analyzer's optimal
denoiser (`diff-analyzer-main/solvers.py:20-31`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from diff_sampler_tpu.models.analytic import DatasetPosteriorDenoiser, GaussianDenoiser
from diff_sampler_tpu.ops import get_schedule
from diff_sampler_tpu.solvers import samplers as S

# std 0.2 keeps |denoised| < 1 so dynamic thresholding (dpmpp/unipc x0 mode)
# is a no-op and those solvers are exact on this problem too.
MU, VAR = -0.1, 0.04
SHAPE = (8, 2, 4, 4)


def _setup():
    rng = np.random.RandomState(3)
    latents = jnp.asarray(rng.randn(*SHAPE).astype(np.float32))
    den = GaussianDenoiser(MU, VAR)
    return latents, den


def _error(name, num_steps, **kw):
    latents, den = _setup()
    t = get_schedule(num_steps, 0.002, 80.0, "polynomial", 7.0)
    out = S.get_sampler(name)(den, latents, t, **kw)
    exact = den.exact_solution(latents * t[0], t[0], t[-1])
    return float(jnp.max(jnp.abs(out.x - exact)))


def test_euler_first_order():
    e1, e2 = _error("euler", 33), _error("euler", 65)
    assert e2 < e1 * 0.65  # ~halves with step count


def test_heun_second_order():
    e1, e2 = _error("heun", 17), _error("heun", 33)
    assert e2 < e1 * 0.35  # ~quarters with step count


def test_dpm2_second_order():
    e1, e2 = _error("dpm", 17), _error("dpm", 33)
    assert e2 < e1 * 0.35


def test_multistep_beats_euler_at_equal_nfe():
    e_euler = _error("euler", 10)
    for name in ["ipndm", "ipndm_v", "deis", "dpmpp", "unipc"]:
        assert _error(name, 10) < e_euler, name


@pytest.mark.parametrize("name", list(S.SOLVER_REGISTRY))
def test_all_solvers_converge(name):
    # Error must shrink with step count and land near the exact terminal
    # state with a generous budget (euler is 1st order: loosest bound).
    e_small, e_big = _error(name, 32), _error(name, 96)
    assert e_big < e_small, (name, e_small, e_big)
    assert e_big < (0.05 if name == "euler" else 5e-3), (name, e_big)


def test_posterior_denoiser_matches_reference_formula():
    import torch

    rng = np.random.RandomState(0)
    data = rng.randn(32, 2, 4, 4).astype(np.float32)
    x = rng.randn(3, 2, 4, 4).astype(np.float32)
    t = 1.7
    den = DatasetPosteriorDenoiser(data)
    ours = np.asarray(den(jnp.asarray(x), t))

    # Reference formula (diff-analyzer-main/solvers.py:20-31), per sample.
    xd, dd = torch.as_tensor(x), torch.as_tensor(data)
    outs = []
    for i in range(x.shape[0]):
        l2 = torch.norm(dd - xd[i][None], p=2, dim=(1, 2, 3))
        w = torch.softmax(-(l2**2) / (2 * t**2), dim=0).reshape(-1, 1, 1, 1)
        outs.append(torch.sum(dd * w, dim=0))
    theirs = torch.stack(outs).numpy()
    # Both sides are fp32; a peaked softmax amplifies input rounding, so the
    # realistic agreement level is ~1e-2 (the two formulations agree to 1e-15
    # in float64 -- verified separately).
    np.testing.assert_allclose(ours, theirs, atol=1.5e-2)


def test_posterior_denoiser_recovers_modes_at_low_sigma():
    data = jnp.asarray(np.array([[[[1.0]]], [[[-1.0]]]], dtype=np.float32))
    den = DatasetPosteriorDenoiser(data)
    x = jnp.asarray(np.array([[[[0.9]]], [[[-0.8]]]], dtype=np.float32))
    out = den(x, 0.05)
    np.testing.assert_allclose(np.asarray(out), [[[[1.0]]], [[[-1.0]]]], atol=1e-4)


def test_nfe_accounting():
    assert S.count_nfe("heun", 6) == 10
    assert S.count_nfe("heun", 6, afs=True) == 9
    assert S.count_nfe("ipndm", 6) == 5
    assert S.count_nfe("ipndm", 6, afs=True) == 4
    assert S.count_nfe("euler", 6, denoise_to_zero=True) == 6
    assert S.count_nfe("dpmpp", 6, cfg_doubled=True) == 10
