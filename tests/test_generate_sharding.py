"""generate() data-parallel sharding on the 8-virtual-device mesh."""

import numpy as np

import jax

from diff_sampler_tpu.models.analytic import GaussianDenoiser
from diff_sampler_tpu.parallel.mesh import get_mesh
from diff_sampler_tpu.sampling import SolverConfig, generate


def test_generate_sharded_matches_default():
    den = GaussianDenoiser(-0.1, 0.04)
    cfg = SolverConfig(solver="ipndm", num_steps=5)
    mesh = get_mesh()
    assert mesh.devices.size == 8
    a = generate(den, range(16), (4, 4, 2), cfg, mesh=mesh, max_batch_size=2)
    b = generate(den, range(16), (4, 4, 2), cfg, mesh=mesh, max_batch_size=16)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_generate_seed_count_not_divisible_by_devices():
    den = GaussianDenoiser(-0.1, 0.04)
    cfg = SolverConfig(solver="euler", num_steps=4)
    mesh = get_mesh()
    out = generate(den, [5, 9, 11], (4, 4, 2), cfg, mesh=mesh, max_batch_size=4)
    assert out.shape == (3, 4, 4, 2)
    # each row matches its single-seed run
    for i, s in enumerate([5, 9, 11]):
        one = generate(den, [s], (4, 4, 2), cfg, mesh=mesh, max_batch_size=4)
        np.testing.assert_allclose(out[i], one[0], atol=1e-6)
