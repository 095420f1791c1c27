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


def test_generate_return_inters_trajectory():
    """--return_inters (sample.py:140): [num_points, N, ...] trajectory whose
    last point equals the plain run's output, sharded over the mesh."""
    den = GaussianDenoiser(-0.1, 0.04)
    cfg = SolverConfig(solver="ipndm", num_steps=5)
    mesh = get_mesh()
    xs = generate(den, range(16), (4, 4, 2), cfg, mesh=mesh, max_batch_size=8,
                  return_inters=True)
    assert xs.shape == (5, 16, 4, 4, 2)
    final = generate(den, range(16), (4, 4, 2), cfg, mesh=mesh, max_batch_size=8)
    np.testing.assert_allclose(xs[-1], final, atol=1e-5)
    # denoise_to_zero appends one extra point
    import dataclasses
    xs2 = generate(den, range(8), (4, 4, 2),
                   dataclasses.replace(cfg, denoise_to_zero=True), mesh=mesh,
                   max_batch_size=8, return_inters=True)
    assert xs2.shape == (6, 8, 4, 4, 2)


def test_generate_batch_callback_streams_every_batch():
    """The software-pipelined batch loop: batch_callback sees every batch
    exactly once, in seed order, with padding stripped, and the streamed
    chunks are bit-identical to the returned array (same compiled fn)."""
    den = GaussianDenoiser(-0.1, 0.04)
    cfg = SolverConfig(solver="ipndm", num_steps=5)
    mesh = get_mesh()
    seen = []
    # max_batch_size is PER-DEVICE: 1 x 8 devices = global batches of 8
    out = generate(den, range(11), (4, 4, 2), cfg, mesh=mesh, max_batch_size=1,
                   batch_callback=lambda s, x: seen.append((s, x.copy())))
    assert [s for s, _ in seen] == [0, 8]
    assert [len(x) for _, x in seen] == [8, 3]  # last batch pad stripped
    streamed = np.concatenate([x for _, x in seen])
    np.testing.assert_array_equal(streamed, out)
    ref = generate(den, range(11), (4, 4, 2), cfg, mesh=mesh, max_batch_size=1)
    np.testing.assert_array_equal(out, ref)  # pipelining changes no values


def test_solver_config_sigma_overrides():
    """--sigma_min/--sigma_max (sample.py:153-154) override the model range."""
    cfg = SolverConfig(solver="euler", num_steps=4, sigma_min=0.1, sigma_max=10.0)
    t = cfg.resolve_t_steps(0.002, 80.0)
    assert abs(t[0] - 10.0) < 1e-9 and abs(t[-1] - 0.1) < 1e-9
    t_def = SolverConfig(solver="euler", num_steps=4).resolve_t_steps(0.002, 80.0)
    assert abs(t_def[0] - 80.0) < 1e-9 and abs(t_def[-1] - 0.002) < 1e-9
