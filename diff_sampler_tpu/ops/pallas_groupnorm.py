"""Fused GroupNorm(+affine)(+SiLU) Pallas kernel.

The second native-tier op of SURVEY.md 2.9: the reference's hot elementwise
chain GroupNorm -> scale/bias -> SiLU (`networks_edm.py:96-98,160`) fused
into one VMEM-resident kernel (grid: one program per sample, [H*W, C] slab).

MEASURED VERDICT (v5e, 64x32x32x256 f32): the Pallas kernel runs 0.90 ms vs
XLA's own fused GroupNorm at 0.84 ms, and the MXU-matmul group reduction
costs ~4e-3 absolute precision (E[x^2]-E[x]^2 cancellation at reduced matmul
precision).  XLA already fuses this chain well on TPU, so `groupnorm_silu`
defaults to the jnp path; the kernel stays available via force_pallas=True
as the documented experiment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["groupnorm_silu"]

_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom of the ~16MB per core


def _gn_kernel(x_ref, scale_ref, bias_ref, gmat_ref, o_ref, *, eps, apply_silu,
               hw):
    """Group stats via a [C, C] block-diagonal averaging matmul (gmat),
    avoiding 3D reshapes that Mosaic cannot tile."""
    x = x_ref[0].astype(jnp.float32)  # [HW, C]
    gmat = gmat_ref[...]              # [C, C], rows sum to 1 within a group
    s1 = jnp.sum(x, axis=0, keepdims=True) / hw          # [1, C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True) / hw      # [1, C]
    mean = jax.lax.dot_general(s1, gmat, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    m2 = jax.lax.dot_general(s2, gmat, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    var = m2 - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    out = (x - mean) * inv * scale_ref[...] + bias_ref[...]
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def _jnp_gn(x, scale, bias, groups, eps, apply_silu):
    """Two-pass GroupNorm shaped for minimum HBM traffic: one fused
    sum/sum-of-squares stats pass, then one fused  x*a + b (+silu)  pass with
    the per-(sample, channel) affine folded into a and b."""
    n, h, w, c = x.shape
    cg = c // groups
    xg = x.reshape(n, h * w, groups, cg).astype(jnp.float32)
    s1 = jnp.sum(xg, axis=(1, 3))            # [n, g]
    s2 = jnp.sum(xg * xg, axis=(1, 3))       # [n, g]
    cnt = h * w * cg
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)           # [n, g]
    inv_c = jnp.repeat(inv, cg, axis=1)      # [n, c]
    mean_c = jnp.repeat(mean, cg, axis=1)
    a = inv_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mean_c * a
    out = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    if apply_silu:
        out = jax.nn.silu(out)
    return out.astype(x.dtype)


@functools.lru_cache(maxsize=32)
def _group_matrix(c: int, groups: int):
    import numpy as np

    cg = c // groups
    m = np.zeros((c, c), np.float32)
    for g in range(groups):
        m[g * cg:(g + 1) * cg, g * cg:(g + 1) * cg] = 1.0 / cg
    return m


@functools.partial(jax.jit, static_argnames=("groups", "eps", "apply_silu",
                                             "interpret"))
def _pallas_gn(x, scale, bias, groups, eps, apply_silu, interpret=False):
    n, h, w, c = x.shape
    xf = x.reshape(n, h * w, c)
    gmat = jnp.asarray(_group_matrix(c, groups))
    out = pl.pallas_call(
        functools.partial(_gn_kernel, eps=eps, apply_silu=apply_silu,
                          hw=float(h * w)),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h * w, c), x.dtype),
        interpret=interpret,
    )(xf, scale.astype(jnp.float32), bias.astype(jnp.float32), gmat)
    return out.reshape(n, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _pallas_gn_diff(x, scale, bias, groups, eps, apply_silu, interpret):
    return _pallas_gn(x, scale, bias, groups, eps, apply_silu, interpret)


def _gn_fwd(x, scale, bias, groups, eps, apply_silu, interpret):
    return _pallas_gn_diff(x, scale, bias, groups, eps, apply_silu,
                           interpret), (x, scale, bias)


def _gn_bwd(groups, eps, apply_silu, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x_, s_, b_: _jnp_gn(x_, s_, b_, groups, eps,
                                                apply_silu), x, scale, bias)
    return vjp(g)


_pallas_gn_diff.defvjp(_gn_fwd, _gn_bwd)


def groupnorm_silu(x, scale, bias, *, groups: int, eps: float = 1e-5,
                   apply_silu: bool = True, force_pallas: bool = False):
    """Fused GroupNorm + affine (+ SiLU) over NHWC.

    Defaults to the XLA (jnp) path, which measured faster and more precise
    than the Pallas kernel on v5e (see module docstring); force_pallas=True
    selects the kernel (differentiable via custom_vjp)."""
    if force_pallas:
        on_tpu = jax.default_backend() == "tpu"
        return _pallas_gn_diff(x, scale, bias, groups, eps, apply_silu,
                               not on_tpu)
    return _jnp_gn(x, scale, bias, groups, eps, apply_silu)
