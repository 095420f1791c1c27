"""Fused GroupNorm+SiLU kernel (interpret mode) + EMA tests."""

import numpy as np

import jax
import jax.numpy as jnp

from diff_sampler_tpu.ops.pallas_groupnorm import _jnp_gn, groupnorm_silu
from diff_sampler_tpu.utils.ema import ema_init, ema_update


def test_gn_kernel_matches_jnp():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 128).astype(np.float32))
    scale = jnp.asarray(rng.rand(128).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    ref = _jnp_gn(x, scale, bias, 32, 1e-5, True)
    out = groupnorm_silu(x, scale, bias, groups=32, force_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_gn_kernel_no_silu_bf16():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 4, 256), jnp.bfloat16)
    scale = jnp.ones(256)
    bias = jnp.zeros(256)
    ref = _jnp_gn(x, scale, bias, 32, 1e-6, False).astype(jnp.float32)
    out = groupnorm_silu(x, scale, bias, groups=32, eps=1e-6, apply_silu=False,
                         force_pallas=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_gn_fallback_unaligned_channels():
    # c=96 not lane-aligned -> jnp path, still correct vs torch-style GN
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 4, 4, 96).astype(np.float32))
    out = groupnorm_silu(x, jnp.ones(96), jnp.zeros(96), groups=32,
                         apply_silu=False)
    import torch

    ref = torch.nn.functional.group_norm(
        torch.as_tensor(np.asarray(x).transpose(0, 3, 1, 2)), 32).numpy()
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-5)


def test_ema_warmup_and_convergence():
    params = {"w": jnp.zeros(3)}
    state = ema_init(params)
    target = {"w": jnp.ones(3)}
    # first update: decay = min(0.9999, 2/11)
    state = ema_update(state, target)
    np.testing.assert_allclose(np.asarray(state.params["w"]),
                               (1 - 2 / 11) * np.ones(3), rtol=1e-6)
    for _ in range(500):
        state = ema_update(state, target)
    assert float(jnp.abs(state.params["w"] - 1.0).max()) < 0.05
    assert int(state.count) == 501


def test_gn_kernel_gradients():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    scale = jnp.asarray(rng.rand(128).astype(np.float32) + 0.5)
    bias = jnp.zeros(128)

    g1 = jax.grad(lambda x_: groupnorm_silu(x_, scale, bias, groups=32,
                                            force_pallas=True).sum())(x)
    g2 = jax.grad(lambda x_: _jnp_gn(x_, scale, bias, 32, 1e-5, True).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-5)
