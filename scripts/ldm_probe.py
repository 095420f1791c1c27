"""Component-share probe for the LSUN-bedroom LDM latent U-Net (274M).

Round 3 measured this tier at 41% model-level MXU (BENCH_NOTES); this
script locates the non-MXU time by ablation, with the chained delta-rep
timing the axon tunnel requires, and params as jit ARGUMENTS (closing over
them embeds >1 GB of HLO constants -> compile-service 413, BENCH_NOTES).

Variants:
  full        -- production latent U-Net (flash attention from T>=256)
  no_attn     -- attention_resolutions=() (self-attention share)
  einsum_attn -- min_flash_tokens huge => einsum attention everywhere
  gn_passthru -- groupnorm_silu patched to one affine pass (GN share;
                 NOT numerically meaningful)
  bf16_params -- storage-dtype bf16 weights (per-eval f32->bf16 cast share)
  sdpa_passthru -- sdpa patched to return q (attention-CORE share: the
                 softmax(qk)v op alone, keeping the ST projections/GEGLU;
                 NOT numerically meaningful).  no_attn minus this is the
                 projection+FF share of the SpatialTransformer stack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adm_probe import chained_ms  # same timing harness


def build(batch, attn=True, dtype=jnp.bfloat16):
    from diff_sampler_tpu.models.ldm import LDM_CONFIGS, LDMUNet

    kw = dict(LDM_CONFIGS["lsun_bedroom_ldm"]["unet"])
    if not attn:
        kw["attention_resolutions"] = ()
    unet = LDMUNet(dtype=dtype, **kw)
    res, chn = unet.image_size, unet.in_channels
    params = jax.jit(unet.init)(jax.random.key(0),
                                jnp.zeros((1, res, res, chn)),
                                jnp.ones((1,)))["params"]
    if os.environ.get("LDM_PROBE_BF16_PARAMS"):
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params)

    def fn(p, x, t):
        return unet.apply({"params": p}, x, t)

    x = jnp.asarray(np.random.RandomState(0).randn(batch, res, res, chn),
                    jnp.float32)
    t = jnp.full((batch,), 500.0, jnp.float32)
    return fn, params, x, t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--variants", nargs="*",
                   default=["full", "no_attn", "gn_passthru", "einsum_attn"])
    args = p.parse_args()
    print("devices:", jax.devices())

    from diff_sampler_tpu.ops import pallas_attention, pallas_groupnorm

    results = {}
    for variant in args.variants:
        saved_gn = pallas_groupnorm.groupnorm_silu
        saved_sdpa = pallas_attention.sdpa
        saved_kw = dict(pallas_attention.sdpa.__kwdefaults__)
        try:
            if variant == "gn_passthru":
                def passthru(x, scale, bias, *, groups, eps=1e-5,
                             apply_silu=True, force_pallas=False):
                    out = x * scale.astype(x.dtype) + bias.astype(x.dtype)
                    return jax.nn.silu(out) if apply_silu else out
                pallas_groupnorm.groupnorm_silu = passthru
            if variant == "einsum_attn":
                pallas_attention.sdpa.__kwdefaults__["min_flash_tokens"] = 1 << 30
            if variant == "bf16_params":
                os.environ["LDM_PROBE_BF16_PARAMS"] = "1"
            if variant == "full_unpacked":
                pallas_attention._PACK_SMALL_D = False
            from diff_sampler_tpu.models import ldm as ldm_mod
            saved_fuse = ldm_mod._FUSE_QKV
            if variant == "full_fused":
                # fusion is opt-in after the round-5 A/B (-0.2%, no win)
                ldm_mod._FUSE_QKV = True
            if variant == "sdpa_passthru":
                def sdpa_passthru(q, k, v, scale=None, **kw):
                    # cheap data dependence on k/v so nothing dead-code
                    # eliminates; adds 2 VPU adds, no matmuls
                    return q + 0.0 * (k[:, :1] + v[:, :1])
                pallas_attention.sdpa = sdpa_passthru

            fn, params, x, t = build(args.batch, attn=(variant != "no_attn"))
            try:
                fl = float(jax.jit(fn).lower(params, x, t).compile()
                           .cost_analysis().get("flops", 0.0))
            except Exception:
                fl = 0.0
            ms = chained_ms(fn, x, t, params=params)
            results[variant] = (ms, fl)
            mxu = 100 * fl / (ms * 1e-3) / 197e12 if fl else 0.0
            print(f"{variant:13s} {ms:8.2f} ms/eval "
                  f"({1e3 * args.batch / ms:7.1f} img/s-eval, "
                  f"{fl / 1e12:6.2f} TF, {mxu:4.1f}% MXU)")
        finally:
            ldm_mod._FUSE_QKV = saved_fuse
            pallas_attention._PACK_SMALL_D = True
            pallas_groupnorm.groupnorm_silu = saved_gn
            pallas_attention.sdpa = saved_sdpa
            pallas_attention.sdpa.__kwdefaults__.update(saved_kw)
            os.environ.pop("LDM_PROBE_BF16_PARAMS", None)

    if "full" in results:
        base = results["full"][0]
        for k, (v, _) in results.items():
            if k != "full":
                print(f"{k:13s} share vs full: {100 * (base - v) / base:+.1f}%")


if __name__ == "__main__":
    main()
