"""On-chip training-throughput probe for the latent (LDM/SD) tiers.

VERDICT round-3 task 2: the latent SFD train step had only been driven at
toy dims; this measures the REAL configs on one chip --

  * SFD distillation of the 274M lsun_bedroom latent U-Net
    (sfd-main/README.md:23 cost basis: LSUN runs on A100s), and
  * SFD / AMED on the ms_coco Stable-Diffusion tier (sfd README.md:11,
    amed README.md:24) -- random weights; throughput is weight-independent.

Reports s/kimg, peak HBM, and whether the Pallas flash backward kernels
dispatched during the trace (first in-model exercise of the 64 MB logits
crossover).  Timing: train steps chain naturally (params feed the next
step), fenced by a scalar loss fetch; delta-timed over two rep counts to
cancel dispatch overhead (BENCH_NOTES methodology).

Usage (one job per tier; a 274M-param jit compiles in minutes over the
axon tunnel -- write stdout to a file):
  python -u scripts/train_probe.py --tier lsun_bedroom_ldm --batch 32 \
      --batch_gpu 8 2>&1 | tee /tmp/train_probe_lsun.log
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def flash_bwd_counters():
    """Wrap the flash backward entry points with trace-time counters."""
    from diff_sampler_tpu.ops import pallas_attention as PA

    counts = {"flat": 0, "mh": 0, "einsum_vjp": 0}
    real_flat, real_mh = PA._flash_bwd, PA._flash_bwd_mh
    real_ref = PA._reference_sdpa

    def flat(*a, **k):
        counts["flat"] += 1
        return real_flat(*a, **k)

    def mh(*a, **k):
        counts["mh"] += 1
        return real_mh(*a, **k)

    PA._flash_bwd, PA._flash_bwd_mh = flat, mh
    return counts


def build_sfd(tier, batch, batch_gpu, num_steps=4, remat=True):
    import optax

    from diff_sampler_tpu.models.factory import build_ldm_model
    from diff_sampler_tpu.training.sfd import SFDConfig, make_ldm_train_step

    precond, _ = build_ldm_model(tier, "random", dtype=jnp.bfloat16,
                                 remat=remat)
    ld = precond.latent_diffusion
    n_acc = max(1, batch // (batch_gpu or batch))
    cfg = SFDConfig(num_steps=num_steps, M=3, sampler_tea="dpmpp",
                    schedule_type="discrete", schedule_rho=1.0, afs=False)
    opt = optax.adam(5e-5)

    def unet_apply(p, x, t, c=None):
        # same functional call as cli/train_sfd._unet_apply: params explicit
        # so the jit never embeds the 274M tree as HLO constants
        if c is None:
            return ld.unet.apply({"params": p}, x, t)
        return ld.unet.apply({"params": p}, x, t, c)

    step = make_ldm_train_step(unet_apply, precond, cfg, opt, n_acc=n_acc)
    params = ld.unet_params
    res, zc = ld.unet.image_size, ld.unet.in_channels
    ctx_shape = None
    if tier == "ms_coco":
        ctx_shape = (batch, 77, 768)
    return step, opt, params, (batch, res, res, zc), ctx_shape


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tier", default="lsun_bedroom_ldm",
                   choices=["lsun_bedroom_ldm", "ffhq_ldm", "ms_coco"])
    p.add_argument("--mode", default="sfd", choices=["sfd", "amed"])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--batch_gpu", type=int, default=None)
    p.add_argument("--num_steps", type=int, default=4)
    p.add_argument("--remat", type=lambda s: s.lower() != "false",
                   default=True)
    p.add_argument("--lo", type=int, default=2)
    p.add_argument("--hi", type=int, default=6)
    args = p.parse_args()
    print("devices:", jax.devices())
    dev = jax.devices()[0]

    counts = flash_bwd_counters()
    rng = np.random.RandomState(0)

    if args.mode == "sfd":
        t0 = time.perf_counter()
        step, opt, params, lat_shape, ctx_shape = build_sfd(
            args.tier, args.batch, args.batch_gpu, args.num_steps, args.remat)
        print(f"build+init: {time.perf_counter() - t0:.1f}s  "
              f"params={sum(a.size for a in jax.tree.leaves(params)) / 1e6:.0f}M")
        params = jax.device_put(params)
        teacher = jax.tree.map(lambda a: a, params)
        opt_state = opt.init(params)
        jstep = jax.jit(step, donate_argnums=(0, 1))
        lat = jnp.asarray(rng.randn(*lat_shape), jnp.float32)
        ctx = (jnp.asarray(rng.randn(*ctx_shape) * 0.3, jnp.float32)
               if ctx_shape else None)

        t0 = time.perf_counter()
        params, opt_state, m = jstep(params, opt_state, teacher, lat, ctx)
        print(f"compile+first step: {time.perf_counter() - t0:.1f}s  "
              f"loss={float(m['loss']):.4f}")
        print(f"flash bwd dispatch at trace: mh={counts['mh']} "
              f"flat={counts['flat']}")

        def run(n):
            nonlocal params, opt_state
            t0 = time.perf_counter()
            for _ in range(n):
                params, opt_state, m = jstep(params, opt_state, teacher,
                                             lat, ctx)
            float(m["loss"])  # fence: scalar data-dependent on the chain
            return time.perf_counter() - t0

        run(1)
        deltas = []
        for _ in range(3):
            tl, th = run(args.lo), run(args.hi)
            deltas.append((th - tl) / (args.hi - args.lo))
        # NOTE: each train step consumes `batch` images x num_steps-1
        # student segments? No: SFD counts kimg by images per step (the
        # reference's cur_nimg += batch, training_loop.py:297)
        s_per_step = float(np.median(deltas))
        s_per_kimg = s_per_step * 1000.0 / args.batch
        stats = dev.memory_stats() or {}
        print(f"s/step: {s_per_step:.3f}  s/kimg: {s_per_kimg:.1f}  "
              f"(batch {args.batch}, n_acc "
              f"{max(1, args.batch // (args.batch_gpu or args.batch))})")
        print(f"peak HBM: {stats.get('peak_bytes_in_use', 0) / 2**30:.2f} GiB")
    else:
        measure_amed(args, counts, rng, dev)


def measure_amed(args, counts, rng, dev):
    import optax

    from diff_sampler_tpu.models.factory import build_ldm_model
    from diff_sampler_tpu.solvers.amed import bind_with_bottleneck
    from diff_sampler_tpu.training.amed import (AMEDConfig,
                                                make_amed_train_step,
                                                predictor_from_config)

    t0 = time.perf_counter()
    precond, _ = build_ldm_model(args.tier, "random", dtype=jnp.bfloat16)
    res, chn = precond.img_resolution, precond.img_channels
    cfg = AMEDConfig(num_steps=args.num_steps + 1, M=1, sampler_stu="amed",
                     sampler_tea="heun", afs=False,
                     schedule_type="discrete", schedule_rho=1.0,
                     sigma_min=float(precond.sigma_min),
                     sigma_max=float(precond.sigma_max))
    uncond = jnp.zeros((1, 77, 768), jnp.float32) \
        if args.tier == "ms_coco" else None

    def denoise_factory(ctx):
        return bind_with_bottleneck(precond, cfg_doubled=uncond is not None,
                                    condition=ctx,
                                    unconditional_condition=uncond)

    pred = predictor_from_config(cfg)
    pred_params = jax.jit(pred.init)(jax.random.key(0),
                                     np.zeros((2, 64), np.float32),
                                     np.float32(1.0), np.float32(0.5))["params"]
    opt = optax.adam(1e-3)
    step = make_amed_train_step(pred, None, cfg, opt,
                                denoise_factory=denoise_factory,
                                sigma_fn=precond.sigma,
                                sigma_inv_fn=precond.sigma_inv)
    print(f"build+init: {time.perf_counter() - t0:.1f}s")
    jstep = jax.jit(step, donate_argnums=(0, 1))
    opt_state = opt.init(pred_params)
    lat = jnp.asarray(rng.randn(args.batch, res, res, chn), jnp.float32)
    ctx = (jnp.asarray(rng.randn(args.batch, 77, 768) * 0.3, jnp.float32)
           if args.tier == "ms_coco" else None)

    t0 = time.perf_counter()
    pred_params, opt_state, m = jstep(pred_params, opt_state, lat, ctx)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")
    print(f"flash bwd dispatch at trace: mh={counts['mh']} "
          f"flat={counts['flat']}")

    def run(n):
        nonlocal pred_params, opt_state
        t0 = time.perf_counter()
        for _ in range(n):
            pred_params, opt_state, m = jstep(pred_params, opt_state, lat, ctx)
        jax.tree.leaves(m)[0].block_until_ready()
        float(np.asarray(jax.tree.leaves(m)[0]).ravel()[0])
        return time.perf_counter() - t0

    run(1)
    deltas = []
    for _ in range(3):
        tl, th = run(args.lo), run(args.hi)
        deltas.append((th - tl) / (args.hi - args.lo))
    s_per_step = float(np.median(deltas))
    s_per_kimg = s_per_step * 1000.0 / args.batch
    stats = dev.memory_stats() or {}
    print(f"s/step: {s_per_step:.3f}  s/kimg: {s_per_kimg:.1f}  "
          f"(batch {args.batch})")
    print(f"peak HBM: {stats.get('peak_bytes_in_use', 0) / 2**30:.2f} GiB")


if __name__ == "__main__":
    main()
