"""End-to-end sampler parity: run the ACTUAL reference PyTorch sampling loops
(imported from /root/reference) and our scan-based JAX samplers on the same
analytic Gaussian denoiser and the same latents; outputs must match to fp32
tolerance.  This pins every coefficient path (AB weights, DPM++ phis, UniPC
rho solves, DEIS integrals) against the reference implementation."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from diff_sampler_tpu.models.analytic import GaussianDenoiser
from diff_sampler_tpu.ops import get_schedule
from diff_sampler_tpu.solvers import samplers as S

MU, VAR = 0.15, 0.35
SHAPE = (4, 3, 8, 8)  # batch of 4 tiny "images"


@pytest.fixture(scope="module")
def ref_solvers(reference_dir):
    sys.path.insert(0, str(reference_dir / "diff-solvers-main"))
    try:
        import solver_utils  # noqa: F401  (solvers does `from solver_utils import *`)
        import solvers as ref
    finally:
        sys.path.pop(0)
    return ref


class TorchGaussianNet:
    """Torch twin of GaussianDenoiser with the reference net interface."""

    sigma_min, sigma_max = 0.002, 80.0

    def __call__(self, x, t, class_labels=None):
        import torch

        t = torch.as_tensor(t, dtype=x.dtype)
        return MU + VAR / (VAR + t**2) * (x - MU)


def _latents():
    rng = np.random.RandomState(7)
    return rng.randn(*SHAPE).astype(np.float32)


def _run_ours(name, latents, t_steps, **kw):
    denoise = GaussianDenoiser(MU, VAR)
    fn = S.get_sampler(name)
    out = fn(denoise, jnp.asarray(latents), t_steps, **kw)
    return np.asarray(out.x)


def _run_ref(ref, name, latents, t_steps, **kw):
    import torch

    fn = {
        "euler": ref.euler_sampler,
        "heun": ref.heun_sampler,
        "dpm": ref.dpm_2_sampler,
        "ipndm": ref.ipndm_sampler,
        "ipndm_v": ref.ipndm_v_sampler,
        "deis": ref.deis_sampler,
        "dpmpp": ref.dpm_pp_sampler,
        "unipc": ref.unipc_sampler,
    }[name]
    t = torch.as_tensor(np.asarray(t_steps, dtype=np.float32))
    if name == "deis":
        sys.path.insert(0, str([p for p in sys.path if "diff-solvers-main" in p] or [""])[0])
        import solver_utils

        kw = dict(kw)
        kw["coeff_list"] = solver_utils.get_deis_coeff_list(
            t, kw.pop("max_order", 4), deis_mode=kw.pop("deis_mode", "tab")
        )
    out = fn(TorchGaussianNet(), torch.as_tensor(latents), t_steps=t,
             num_steps=len(t_steps), **kw)
    return out.numpy()


CASES = [
    ("euler", dict()),
    ("euler", dict(afs=True)),
    ("euler", dict(denoise_to_zero=True)),
    ("heun", dict()),
    ("heun", dict(afs=True)),
    ("dpm", dict()),
    ("dpm", dict(r=0.4)),
    ("ipndm", dict(max_order=4)),
    ("ipndm", dict(max_order=2, afs=True)),
    ("ipndm_v", dict(max_order=4)),
    ("ipndm_v", dict(max_order=3)),
    ("deis", dict(max_order=4)),
    ("deis", dict(max_order=3, deis_mode="rhoab")),
    ("dpmpp", dict(max_order=3)),
    ("dpmpp", dict(max_order=2, predict_x0=False)),
    ("dpmpp", dict(max_order=3, lower_order_final=False)),
    ("unipc", dict(max_order=3)),
    ("unipc", dict(max_order=3, variant="bh1")),
    ("unipc", dict(max_order=2, predict_x0=False)),
]


@pytest.mark.parametrize("name,kw", CASES, ids=[f"{n}-{i}" for i, (n, _) in enumerate(CASES)])
@pytest.mark.parametrize("num_steps,schedule", [(7, "polynomial"), (11, "logsnr")])
def test_sampler_parity(ref_solvers, name, kw, num_steps, schedule):
    t_steps = get_schedule(num_steps, 0.002, 80.0, schedule, 7.0)
    latents = _latents()
    ours = _run_ours(name, latents, t_steps, **kw)
    theirs = _run_ref(ref_solvers, name, latents, t_steps, **kw)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_return_inters_shapes():
    t_steps = get_schedule(6, 0.002, 80.0, "polynomial", 7.0)
    latents = _latents()
    denoise = GaussianDenoiser(MU, VAR)
    out = S.heun_sampler(denoise, jnp.asarray(latents), t_steps, return_inters=True)
    assert out.xs.shape == (6,) + SHAPE  # initial + 5 steps
    assert out.eps.shape == (5,) + SHAPE
    out = S.euler_sampler(denoise, jnp.asarray(latents), t_steps,
                          return_inters=True, denoise_to_zero=True)
    assert out.xs.shape == (7,) + SHAPE  # + denoise-to-zero entry


def test_trajectory_matches_reference_inters(ref_solvers):
    import torch

    t_steps = get_schedule(8, 0.002, 80.0, "polynomial", 7.0)
    latents = _latents()
    ours = S.ipndm_sampler(GaussianDenoiser(MU, VAR), jnp.asarray(latents), t_steps,
                           return_inters=True)
    t = torch.as_tensor(np.asarray(t_steps, dtype=np.float32))
    theirs, theirs_eps = ref_solvers.ipndm_sampler(
        TorchGaussianNet(), torch.as_tensor(latents), t_steps=t, num_steps=8,
        return_inters=True, return_eps=True)
    np.testing.assert_allclose(np.asarray(ours.xs), theirs.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours.eps), theirs_eps.numpy(), rtol=2e-4, atol=2e-4)
