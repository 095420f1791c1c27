"""Schedule tests: self-contained golden checks + parity vs the torch reference."""

import sys

import numpy as np
import pytest

from diff_sampler_tpu.ops import get_schedule


def test_polynomial_endpoints_and_monotone():
    t = get_schedule(18, 0.002, 80.0, "polynomial", 7.0)
    assert t.shape == (18,)
    assert np.isclose(t[0], 80.0)
    assert np.isclose(t[-1], 0.002)
    assert np.all(np.diff(t) < 0)


def test_logsnr_uniform_in_loglambda():
    t = get_schedule(10, 0.002, 80.0, "logsnr")
    lam = -np.log(t)
    assert np.allclose(np.diff(lam), lam[1] - lam[0])
    assert np.isclose(t[0], 80.0) and np.isclose(t[-1], 0.002)


def test_time_uniform_endpoints():
    t = get_schedule(12, 0.002, 80.0, "time_uniform", 2.0)
    assert np.isclose(t[0], 80.0, rtol=1e-6)
    # The last point lands at sigma(epsilon_s) == sigma_min by construction.
    assert np.isclose(t[-1], 0.002, rtol=1e-5)
    assert np.all(np.diff(t) < 0)


def test_discrete_requires_sigma_maps():
    with pytest.raises(ValueError):
        get_schedule(8, 0.01, 10.0, "discrete")


def test_dp_list_subselect():
    full = get_schedule(61, 0.002, 80.0, "polynomial", 7.0)
    sub = get_schedule(61, 0.002, 80.0, "polynomial", 7.0, dp_list=[0, 10, 30, 60])
    assert np.allclose(sub, full[[0, 10, 30, 60]])


@pytest.mark.parametrize("schedule_type,rho", [
    ("polynomial", 7.0),
    ("logsnr", 7.0),
    ("time_uniform", 2.0),
])
def test_parity_vs_reference(reference_dir, schedule_type, rho):
    sys.path.insert(0, str(reference_dir / "diff-solvers-main"))
    try:
        import solver_utils as ref
    finally:
        sys.path.pop(0)
    ours = get_schedule(16, 0.002, 80.0, schedule_type, rho)
    theirs = ref.get_schedule(16, 0.002, 80.0, device="cpu",
                              schedule_type=schedule_type, schedule_rho=rho)
    # atol covers the reference's fp32 exp()-1 roundoff near sigma_min
    # (we compute the same quantity exactly in float64).
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=2e-5, atol=5e-5)
