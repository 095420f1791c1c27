"""Component-share probe for the ImageNet-64 DhariwalUNet (ADM) denoiser.

BENCH_r (round 3) measured this tier at 46% model-level MXU vs the
SongUNet's 73-74%; this script locates the non-MXU time by ablation,
using the chained-iteration timing required by the axon tunnel
(BENCH_NOTES.md): output feeds next input, delta-timed over two rep
counts to cancel dispatch overhead.

Variants:
  full        -- production model (flash attention from T>=256, fused GN)
  no_attn     -- attn_resolutions=() (attention share, incl. qkv/proj)
  gn_passthru -- groupnorm_silu monkeypatched to a single affine pass
                 (GN stats+normalize share; NOT numerically meaningful)
  einsum_attn -- min_flash_tokens huge => einsum attention everywhere
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chained_ms(fn, x, sigma, lo=4, hi=12, params=None):
    """Delta-timed chained eval: (t(hi)-t(lo))/(hi-lo) per call, median of 3.

    params (when given) enter the jit as an ARGUMENT -- closing over a
    296M-param tree would embed ~1.2 GB of f32 constants in the HLO and
    trip the axon compile service's body limit (BENCH_NOTES: HTTP 413)."""
    if params is not None:
        jfn = jax.jit(lambda p, z, s: fn(p, z, s))
        params = jax.device_put(params)
        call = lambda z: jfn(params, z, sigma)
    else:
        jfn = jax.jit(fn)
        call = lambda z: jfn(z, sigma)
    # A SCALAR D2H data-dependent on the whole chain is what actually
    # fences on the axon tunnel -- block_until_ready alone under-reported
    # the 274M LDM no_attn eval as 0.79 ms (2026-08-18, ldm_probe).
    fence = jax.jit(lambda z: jnp.sum(z.astype(jnp.float32)))
    y = call(x)
    float(fence(y))

    def run(n):
        t0 = time.perf_counter()
        z = x
        for _ in range(n):
            z = call(z)
        float(fence(z))
        return time.perf_counter() - t0

    run(2)  # warm
    deltas = []
    for _ in range(3):
        tl, th = run(lo), run(hi)
        deltas.append((th - tl) / (hi - lo))
    return 1e3 * float(np.median(deltas))


def build(batch, attn=True, dtype=jnp.bfloat16):
    import dataclasses

    from diff_sampler_tpu.models.factory import build_edm_model

    net = build_edm_model("imagenet64", dtype=dtype)
    if not attn:
        kw = dict(net.model_kwargs)
        kw["attn_resolutions"] = []
        net = dataclasses.replace(net, model_kwargs=kw)
    res, chn, label_dim = net.img_resolution, net.img_channels, net.label_dim
    init_args = [jax.random.key(0), jnp.zeros((1, res, res, chn)),
                 jnp.ones((1,))]
    if label_dim:
        init_args.append(jnp.zeros((1, label_dim)))
    params = jax.jit(net.init)(*init_args)["params"]
    if os.environ.get("ADM_PROBE_BF16_PARAMS"):
        # H4: is the per-eval f32->bf16 weight cast (~1.2 GB reads) material?
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params)
    y = (jnp.eye(label_dim, dtype=jnp.float32)[jnp.arange(batch) % label_dim]
         if label_dim else None)

    def fn(p, x, sigma):
        return net.apply({"params": p}, x, sigma, y)

    x = jnp.asarray(np.random.RandomState(0).randn(batch, res, res, chn),
                    jnp.float32)
    sigma = jnp.full((batch,), 2.5, jnp.float32)
    return fn, params, x, sigma


def conv_roofline(batch):
    """Isolated 3x3 convs at every (res, cin, cout) the ImageNet-64 net uses:
    the achievable per-shape conv ceiling, to separate 'convs are slow at
    these shapes' from 'non-conv work pads the timeline'."""
    shapes = [(64, 192, 192), (32, 384, 384), (32, 192, 384),
              (16, 576, 576), (16, 384, 576), (8, 768, 768), (8, 576, 768)]
    for res, cin, cout in shapes:
        x = jnp.asarray(np.random.RandomState(0).randn(batch, res, res, cin),
                        jnp.bfloat16)
        w = jnp.asarray(
            np.random.RandomState(1).randn(3, 3, cin, cout) * 0.02,
            jnp.bfloat16)

        def f(x, _sigma, w=w, cin=cin, cout=cout):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # keep shapes chainable when cin != cout
            return y[..., :cin] if cout != cin else y

        ms = chained_ms(f, x, jnp.zeros(()), lo=20, hi=60)
        flops = 2 * batch * res * res * cin * cout * 9
        print(f"conv {res:3d}x{res:<3d} {cin:4d}->{cout:<4d} {ms:7.3f} ms  "
              f"{100 * flops / (ms * 1e-3) / 197e12:5.1f}% MXU")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--variants", nargs="*",
                   default=["full", "no_attn", "gn_passthru", "einsum_attn"])
    args = p.parse_args()
    print("devices:", jax.devices())

    if "convs" in args.variants:
        conv_roofline(args.batch)
        args.variants = [v for v in args.variants if v != "convs"]

    from diff_sampler_tpu.ops import pallas_attention, pallas_groupnorm

    results = {}
    for variant in args.variants:
        saved_gn = pallas_groupnorm.groupnorm_silu
        saved_kw = dict(pallas_attention.sdpa.__kwdefaults__)
        try:
            if variant == "gn_passthru":
                # layers.py / unets.py import the symbol lazily inside the
                # call, so patching the module attribute is enough.
                def passthru(x, scale, bias, *, groups, eps=1e-5,
                             apply_silu=True, force_pallas=False):
                    out = x * scale.astype(x.dtype) + bias.astype(x.dtype)
                    return jax.nn.silu(out) if apply_silu else out
                pallas_groupnorm.groupnorm_silu = passthru
            if variant == "einsum_attn":
                # min_flash_tokens is keyword-only: flip its default so every
                # in-model call site takes the einsum path.
                pallas_attention.sdpa.__kwdefaults__["min_flash_tokens"] = 1 << 30
            if variant == "attn512":
                # einsum below T=512 (the 16x16 level), flash at T=1024
                pallas_attention.sdpa.__kwdefaults__["min_flash_tokens"] = 512

            fn, params, x, sigma = build(args.batch, attn=(variant != "no_attn"))
            ms = chained_ms(fn, x, sigma, params=params)
            results[variant] = ms
            print(f"{variant:12s} {ms:8.2f} ms/eval "
                  f"({1e3 * args.batch / ms:7.1f} img/s-eval)")
        finally:
            pallas_groupnorm.groupnorm_silu = saved_gn
            pallas_attention.sdpa.__kwdefaults__.update(saved_kw)

    if "full" in results:
        base = results["full"]
        for k, v in results.items():
            if k != "full":
                print(f"{k:12s} share vs full: {100 * (base - v) / base:+.1f}%")


if __name__ == "__main__":
    main()
