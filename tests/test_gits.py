"""GITS schedule-search tests: DP parity vs the reference implementation,
cost-matrix correctness vs an independent numpy formulation, and an
end-to-end search on the analytic denoiser."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from diff_sampler_tpu.gits.search import (GITSConfig, compute_cost_matrix,
                                          dp_search, dp_search_multi, gits_schedule)
from diff_sampler_tpu.models.analytic import GaussianDenoiser
from diff_sampler_tpu.ops import get_schedule
from diff_sampler_tpu.ops.geometry import trajectory_deviation
from diff_sampler_tpu.solvers import get_sampler


def test_dp_parity_vs_reference(reference_dir):
    sys.path.insert(0, str(reference_dir / "gits-main"))
    try:
        from gits_utils import dp as ref_dp
    finally:
        sys.path.pop(0)
    rng = np.random.RandomState(0)
    n_tea = 21
    cost = np.triu(rng.rand(n_tea, n_tea), k=1)
    for num_steps in (4, 6, 8):
        for coeff in (1.0, 1.15):
            ours = dp_search(cost, num_steps, n_tea, coeff)
            theirs = ref_dp(cost, num_steps, n_tea, coeff)
            assert ours == theirs, (num_steps, coeff)
            assert ours[0] == 0 and ours[-1] == n_tea - 1
            assert all(a < b for a, b in zip(ours, ours[1:]))


def _numpy_cost(traj, eps, t, metric):
    """Independent O(N^2) formulation of gits_utils.py:115-132."""
    n, b = traj.shape[:2]
    cost = np.zeros((n, n))
    if metric == "dev":
        dev_tea = np.asarray(trajectory_deviation(jnp.asarray(traj))).mean(0)
        dev_tea = np.concatenate([dev_tea, [0.0]])
        start, end = traj[0].reshape(b, -1), traj[-1].reshape(b, -1)
        bc = end - start
        bcu = bc / np.linalg.norm(bc, axis=-1, keepdims=True)
    for i in range(n - 1):
        for j in range(i + 1, n):
            x_next = traj[i] + (t[j] - t[i]) * eps[i]
            d = (x_next - traj[j]).reshape(b, -1)
            if metric == "l1":
                cost[i, j] = np.abs(d).sum(-1).mean()
            elif metric == "l2":
                cost[i, j] = np.linalg.norm(d, axis=-1).mean()
            else:
                ac = end - x_next.reshape(b, -1)
                proj = (ac * bcu).sum(-1, keepdims=True) * bcu
                dev = np.linalg.norm(ac - proj, axis=-1)
                cost[i, j] = (dev - dev_tea[j - 1]).mean()
    return cost


@pytest.mark.parametrize("metric", ["l1", "l2", "dev"])
def test_cost_matrix_vectorization(metric):
    den = GaussianDenoiser(-0.1, 0.04)
    t = get_schedule(9, 0.002, 80.0, "polynomial", 7.0)
    rng = np.random.RandomState(1)
    lat = jnp.asarray(rng.randn(4, 2, 4, 4).astype(np.float32))
    out = get_sampler("ipndm")(den, lat, t, return_inters=True)
    ours = np.asarray(compute_cost_matrix(out.xs, out.eps, t, metric))
    ref = _numpy_cost(np.asarray(out.xs), np.asarray(out.eps),
                      t.astype(np.float32), metric)
    iu = np.triu_indices(9, k=1)
    np.testing.assert_allclose(ours[iu], ref[iu], rtol=2e-3, atol=2e-4)
    # lower triangle + diagonal must be zero (masked)
    assert np.all(ours[np.tril_indices(9)] == 0)


def test_gits_end_to_end_analytic():
    den = GaussianDenoiser(-0.1, 0.04)
    cfg = GITSConfig(num_steps=5, num_steps_tea=13, num_warmup=8,
                     batch_size=8, metric="dev", afs=False)
    dp_list, t_steps = gits_schedule(den, (2, 4, 4), cfg)
    assert dp_list[0] == 0 and dp_list[-1] == 12
    assert len(dp_list) == 5
    assert all(a < b for a, b in zip(dp_list, dp_list[1:]))
    full = get_schedule(13, 0.002, 80.0, "polynomial", 7.0)
    np.testing.assert_allclose(t_steps, full[np.asarray(dp_list)])


def test_gits_afs_insertion():
    den = GaussianDenoiser(-0.1, 0.04)
    cfg = GITSConfig(num_steps=5, num_steps_tea=13, num_warmup=8,
                     batch_size=8, metric="l2", afs=True)
    dp_list, t_steps = gits_schedule(den, (2, 4, 4), cfg)
    # AFS inserts one extra (free) step
    assert len(dp_list) in (5, 6)
    assert all(a < b for a, b in zip(dp_list, dp_list[1:]))


def test_dp_multi_coeff_table():
    rng = np.random.RandomState(2)
    cost = np.triu(rng.rand(11, 11), k=1)
    table = dp_search_multi(cost, 5, 11, coeffs=(1.0, 1.15))
    assert (1.0, 2) in table and (1.15, 4) in table
    for phi in table.values():
        assert phi[0] == 0 and phi[-1] == 10


def test_gits_afs_insertion_dpmpp_unipc_single_compile():
    """AFS search single-compile path for the coefficient-dataclass solvers
    (coeffs enter the jit as registered pytrees)."""
    den = GaussianDenoiser(-0.1, 0.04)
    for solver in ("dpmpp", "unipc"):
        cfg = GITSConfig(num_steps=5, num_steps_tea=13, num_warmup=8,
                         batch_size=8, metric="l2", afs=True, solver=solver)
        dp_list, _t = gits_schedule(den, (2, 4, 4), cfg)
        assert len(dp_list) in (5, 6)
        assert all(a < b for a, b in zip(dp_list, dp_list[1:]))


def test_coeff_injection_matches_host_path():
    """sampler(..., coeffs=<traced pytree>) == sampler(...) exactly."""
    import jax
    import jax.numpy as jnp

    from diff_sampler_tpu.ops import multistep
    from diff_sampler_tpu.ops.schedules import get_schedule
    from diff_sampler_tpu.solvers.samplers import get_sampler
    from diff_sampler_tpu.utils.rng import stacked_randn

    den = GaussianDenoiser(-0.1, 0.04)
    t = get_schedule(6, 0.002, 80.0)
    lat = stacked_randn(np.arange(4), (2, 4, 4))
    for solver, coeff_fn in [("dpmpp", multistep.dpm_pp_coeffs),
                             ("unipc", multistep.unipc_coeffs)]:
        s = get_sampler(solver)
        a = np.asarray(jax.jit(lambda l: s(den, l, t, afs=True).x)(lat))
        co = jax.tree.map(jnp.asarray, coeff_fn(t, 3))
        b = np.asarray(jax.jit(
            lambda l, tt, c: s(den, l, tt, afs=True, coeffs=c).x)(
                lat, jnp.asarray(t), co))
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6)
