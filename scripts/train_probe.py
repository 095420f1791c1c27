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

    counts = {"flat": 0, "mh": 0, "mh_stream": 0, "einsum_vjp": 0}
    real_flat, real_mh = PA._flash_bwd, PA._flash_bwd_mh
    real_stream = PA._flash_bwd_mh_stream

    def flat(*a, **k):
        counts["flat"] += 1
        return real_flat(*a, **k)

    def mh(*a, **k):
        counts["mh"] += 1
        return real_mh(*a, **k)

    def mh_stream(*a, **k):
        counts["mh_stream"] += 1
        return real_stream(*a, **k)

    PA._flash_bwd, PA._flash_bwd_mh = flat, mh
    PA._flash_bwd_mh_stream = mh_stream
    return counts


def build_sfd(tier, batch, batch_gpu, num_steps=4, remat=True,
              mu_bf16=False):
    import optax

    from diff_sampler_tpu.models.factory import build_ldm_model
    from diff_sampler_tpu.training.sfd import SFDConfig, make_ldm_train_step

    precond, _ = build_ldm_model(tier, "random", dtype=jnp.bfloat16,
                                 remat=remat)
    ld = precond.latent_diffusion
    n_acc = max(1, batch // (batch_gpu or batch))
    cfg = SFDConfig(num_steps=num_steps, M=3, sampler_tea="dpmpp",
                    schedule_type="discrete", schedule_rho=1.0, afs=False)
    # bf16 first moment: the 860M SD tier's f32 4-copy footprint (student +
    # m + v + teacher) plus the remat'd backward exceeds one 15.75 GiB v5e
    # by ~0.8 GiB; Adam's m tolerates bf16 (v stays f32)
    opt = optax.adam(5e-5, mu_dtype=jnp.bfloat16 if mu_bf16 else None)

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
    p.add_argument("--teacher_bf16", action="store_true",
                   help="hold the frozen teacher copy in bf16 (same dtype "
                        "the sampling path runs the identical net in); "
                        "saves 1.7 GiB on the 860M SD tier, whose f32 "
                        "4-copy footprint alone is 13.8 of 15.75 GiB")
    p.add_argument("--mu_bf16", action="store_true",
                   help="Adam first moment in bf16 (see build_sfd note)")
    p.add_argument("--remat_traj", action="store_true",
                   help="AMED mode: jax.checkpoint around each frozen-net "
                        "eval in the student backward (the trajectory "
                        "memory lever; measures its temp-GiB / s-per-step "
                        "trade on chip)")
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
            args.tier, args.batch, args.batch_gpu, args.num_steps, args.remat,
            args.mu_bf16)
        print(f"build+init: {time.perf_counter() - t0:.1f}s  "
              f"params={sum(a.size for a in jax.tree.leaves(params)) / 1e6:.0f}M")
        params = jax.device_put(params)
        # a REAL copy: params is donated (argnum 0) every step, and donating
        # a buffer that another argument (teacher) aliases is an
        # INVALID_ARGUMENT on the axon backend (identity tree.map copies
        # nothing -- jax arrays are immutable views of the same buffers)
        teacher = jax.tree.map(
            (lambda a: a.astype(jnp.bfloat16)) if args.teacher_bf16
            else jnp.copy, params)
        opt_state = opt.init(params)
        jstep = jax.jit(step, donate_argnums=(0, 1))
        lat = jnp.asarray(rng.randn(*lat_shape), jnp.float32)
        ctx = (jnp.asarray(rng.randn(*ctx_shape) * 0.3, jnp.float32)
               if ctx_shape else None)

        t0 = time.perf_counter()
        # AOT lower+compile: axon memory_stats() returns no useful keys, so
        # peak HBM comes from XLA's own memory_analysis of the executable
        compiled = jstep.lower(params, opt_state, teacher, lat, ctx).compile()
        print(f"compile: {time.perf_counter() - t0:.1f}s")
        try:
            ma = compiled.memory_analysis()
            print(f"XLA memory: args {ma.argument_size_in_bytes / 2**30:.2f} "
                  f"+ temp {ma.temp_size_in_bytes / 2**30:.2f} "
                  f"+ out {ma.output_size_in_bytes / 2**30:.2f} GiB "
                  f"(alias {ma.alias_size_in_bytes / 2**30:.2f})")
        except Exception as e:  # pragma: no cover - backend-dependent
            print("memory_analysis unavailable:", e)
        t0 = time.perf_counter()
        params, opt_state, m = compiled(params, opt_state, teacher, lat, ctx)
        jstep = compiled  # all further steps ride the AOT executable
        print(f"first step: {time.perf_counter() - t0:.1f}s  "
              f"loss={float(m['loss']):.4f}")
        print(f"flash bwd dispatch at trace: mh={counts['mh']} "
              f"mh_stream={counts['mh_stream']} flat={counts['flat']}")

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
        # kimg counts images per step, matching the reference's
        # cur_nimg += batch (sfd training_loop.py:297), NOT student segments
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
    # ms_coco AMED trains THROUGH the CFG-doubled net at guidance 7.5 (the
    # reference run matrix, amed training_loop.py:69-73); at guidance 1.0
    # CFGPrecond skips the batch doubling (precond.py:340) and the
    # cfg_doubled bottleneck slice below would mis-halve the batch
    guided = args.tier == "ms_coco"
    precond, _ = build_ldm_model(args.tier, "random", dtype=jnp.bfloat16,
                                 guidance_rate=7.5 if guided else 1.0)
    res, chn = precond.img_resolution, precond.img_channels
    cfg = AMEDConfig(num_steps=args.num_steps + 1, M=1, sampler_stu="amed",
                     sampler_tea="heun", afs=False,
                     schedule_type="discrete", schedule_rho=1.0,
                     sigma_min=float(precond.sigma_min),
                     sigma_max=float(precond.sigma_max),
                     remat_traj=args.remat_traj)
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
    ld = precond.latent_diffusion
    net_params = ld.unet_params

    def step_with_params(pred_params, opt_state, lat, ctx, p):
        # late-bind the frozen net's params as a jit ARGUMENT: closing over
        # the 274-860M tree embeds it as HLO constants and the axon
        # remote-compile 413s (BENCH_NOTES round 3; same as ldm_bench.py).
        # The dataclass attribute is read lazily inside the trace
        # (models/ldm.py:595), so assigning the tracer here routes it.
        ld.unet_params = p
        return step(pred_params, opt_state, lat, ctx)

    jstep = jax.jit(step_with_params, donate_argnums=(0, 1))
    opt_state = opt.init(pred_params)
    lat = jnp.asarray(rng.randn(args.batch, res, res, chn), jnp.float32)
    ctx = (jnp.asarray(rng.randn(args.batch, 77, 768) * 0.3, jnp.float32)
           if args.tier == "ms_coco" else None)

    t0 = time.perf_counter()
    compiled = jstep.lower(pred_params, opt_state, lat, ctx,
                           net_params).compile()
    print(f"compile: {time.perf_counter() - t0:.1f}s")
    try:
        ma = compiled.memory_analysis()
        print(f"XLA memory: args {ma.argument_size_in_bytes / 2**30:.2f} "
              f"+ temp {ma.temp_size_in_bytes / 2**30:.2f} "
              f"+ out {ma.output_size_in_bytes / 2**30:.2f} GiB")
    except Exception as e:  # pragma: no cover - backend-dependent
        print("memory_analysis unavailable:", e)
    t0 = time.perf_counter()
    pred_params, opt_state, m = compiled(pred_params, opt_state, lat, ctx,
                                         net_params)
    print(f"first step: {time.perf_counter() - t0:.1f}s")
    print(f"flash bwd dispatch at trace: mh={counts['mh']} "
          f"mh_stream={counts['mh_stream']} flat={counts['flat']}")

    def run(n):
        nonlocal pred_params, opt_state
        t0 = time.perf_counter()
        for _ in range(n):
            pred_params, opt_state, m = compiled(pred_params, opt_state, lat,
                                                 ctx, net_params)
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
