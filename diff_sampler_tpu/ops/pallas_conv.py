"""Pallas direct 3x3 conv kernels (NHWC, stride 1, SAME) for the U-Net hot
path, with an optional fused GroupNorm-apply + SiLU prologue.

The 3x3 conv is where ~90% of the sampler's FLOPs are (SURVEY.md section 6;
`networks_edm.py:158-166` in the reference).  This kernel computes the conv
as 9 shifted [rows, Cin] @ [Cin, Cout] MXU matmuls accumulated in f32,
entirely from VMEM, optionally fusing the preceding per-(sample,channel)
affine + SiLU (the folded GroupNorm normalize pass) into the input load.

MEASURED VERDICT (v5e, 256x32x32x256 bf16, delta-timed chained loops):

    xla conv      1.938 ms (81.0% MXU)     pallas        2.185 ms (71.8%)
    xla gn+conv   2.108 ms (74.5%)         pallas fused  2.364 ms (66.4%)

XLA's conv wins: the padded-scratch write + 9 strided slice reads cost more
than the one HBM round trip the fusion saves (XLA already folds the
elementwise prologue nearly for free -- 0.17 ms, about the bandwidth bound).
Like ops/pallas_groupnorm.py, this stays as a correct, tested, opt-in
experiment rather than the default path; the model keeps lax.conv.

Numerics: accumulation in f32 (same as XLA's conv), inputs bf16 or f32.
Gate with `supported(...)`; callers fall back to lax.conv otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3", "gn_silu_conv3x3", "supported"]


def supported(n, h, w, cin, cout, bn=None) -> bool:
    """Kernel applicability: lane-aligned channels, batch divisible by the
    image-block size."""
    if cin % 128 or cout % 128:
        return False
    return n >= 1


def _block_images(n, h, w):
    """Images per program: target ~2048 matmul rows per shift, divide n."""
    bn = max(1, min(n, 2048 // (h * w)))
    while n % bn:
        bn -= 1
    return bn


def _kernel(x_ref, a_ref, b_ref, w_ref, bias_ref, o_ref, zp_ref, acc_ref, *,
            bn, h, wd, cin, cout, fuse_affine, out_dtype):
    # 1) prologue: (optional) x*a+b -> silu, write into the padded scratch
    zp_ref[...] = jnp.zeros(zp_ref.shape, zp_ref.dtype)
    x = x_ref[...]
    if fuse_affine:
        xf = x.astype(jnp.float32)
        a = a_ref[...][:, :, None, :]  # [bn,1,c] -> [bn,1,1,c]
        b = b_ref[...][:, :, None, :]
        z = jax.nn.silu(xf * a + b)
        x = z.astype(zp_ref.dtype)
    zp_ref[:, 1:h + 1, 1:wd + 1, :] = x

    # 2) 9 shifted matmuls accumulated in f32
    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    for dy in range(3):
        for dx in range(3):
            sl = zp_ref[:, dy:dy + h, dx:dx + wd, :]
            sl2 = sl.reshape(bn * h * wd, cin)
            acc_ref[...] += jax.lax.dot_general(
                sl2, w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    out = acc_ref[...] + bias_ref[...][None, :]
    o_ref[...] = out.reshape(bn, h, wd, cout).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("fuse_affine", "interpret"))
def _conv_call(x, a, b, w, bias, fuse_affine, interpret=False):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    bn = _block_images(n, h, wd)
    grid = (n // bn,)
    kern = functools.partial(
        _kernel, bn=bn, h=h, wd=wd, cin=cin, cout=cout,
        fuse_affine=fuse_affine, out_dtype=x.dtype)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, h, wd, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bn, 1, cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((bn, 1, cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bn, h, wd, cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bn, h + 2, wd + 2, cin), x.dtype),
            pltpu.VMEM((bn * h * wd, cout), jnp.float32),
        ],
        interpret=interpret,
    )(x, a.reshape(n, 1, cin), b.reshape(n, 1, cin), w, bias)


def conv3x3(x, w, bias=None, *, interpret=False):
    """Direct 3x3 SAME conv: x [N,H,W,Cin] (bf16/f32), w [3,3,Cin,Cout]."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    dummy = jnp.zeros((n, cin), jnp.float32)
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    return _conv_call(x, dummy, dummy, w.astype(x.dtype),
                      bias.astype(jnp.float32), False, interpret)


def gn_silu_conv3x3(x, a, b, w, bias=None, *, interpret=False):
    """Fused  conv3x3(silu(x * a + b))  where a, b are the per-(sample,
    channel) fold of GroupNorm stats + affine:  a = rsqrt(var+eps)*scale,
    b = bias_gn - mean*a  (see ops/pallas_groupnorm._jnp_gn)."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    return _conv_call(x, a.astype(jnp.float32), b.astype(jnp.float32),
                      w.astype(x.dtype), bias.astype(jnp.float32), True,
                      interpret)
