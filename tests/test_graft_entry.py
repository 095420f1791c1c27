"""Driver-surface tests: `__graft_entry__.entry()` and `dryrun_multichip`.

Round 1's driver run failed precisely here (MULTICHIP_r01.json rc=1): the
flagship init dispatched on the default backend before the CPU-mesh fallback
was consulted. These tests run the exact driver entry points under the pytest
CPU env (conftest.py forces JAX_PLATFORMS=cpu with 8 virtual devices), so any
regression in the driver surface fails the suite instead of the driver run.
"""

import numpy as np
import pytest

import jax

import __graft_entry__ as graft


def test_entry_tiny_forward():
    fn, args = graft.entry(tiny=True)
    params, x, sigma = args
    out = jax.jit(fn)(params, x, sigma)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out, dtype=np.float32)))


def test_entry_returns_jittable_with_example_args():
    # Exactly what the driver compile-checks: jit(fn).lower(*example_args).
    fn, args = graft.entry(tiny=True)
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None


def test_dryrun_multichip_8():
    assert len(jax.devices("cpu")) >= 8
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_2():
    # Mesh sizes other than 8 must also work (driver may probe different N).
    graft.dryrun_multichip(2)
