"""Pallas direct 3x3 conv kernel tests (interpret mode on CPU) vs lax.conv.

The kernel is a documented negative-result experiment (slower than XLA's
conv on v5e, see ops/pallas_conv.py docstring) but stays correct and
opt-in."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_sampler_tpu.ops.pallas_conv import (conv3x3, gn_silu_conv3x3,
                                              supported)


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("n,h,wd,cin,cout", [
    (2, 8, 8, 128, 128),
    (3, 4, 4, 128, 256),
    (1, 8, 4, 256, 128),
])
def test_conv3x3_matches_lax(n, h, wd, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, wd, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32)) * 0.05
    bias = jnp.asarray(rng.randn(cout).astype(np.float32)) * 0.1
    assert supported(n, h, wd, cin, cout)
    got = conv3x3(x, w, bias, interpret=True)
    ref = _ref_conv(x, w) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gn_silu_conv3x3_fused_matches_chain():
    rng = np.random.RandomState(1)
    n, h, wd, c = 2, 8, 8, 128
    x = jnp.asarray(rng.randn(n, h, wd, c).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32)) * 0.05
    a = jnp.asarray(1.0 + 0.1 * rng.randn(n, c).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(n, c).astype(np.float32))
    z = jax.nn.silu(x * a[:, None, None, :] + b[:, None, None, :])
    ref = _ref_conv(z, w)
    got = gn_silu_conv3x3(x, a, b, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_supported_gate():
    assert not supported(2, 8, 8, 96, 128)   # cin not lane-aligned
    assert not supported(2, 8, 8, 128, 96)   # cout not lane-aligned
    assert supported(5, 8, 8, 128, 128)      # any n >= 1
