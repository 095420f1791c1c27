"""AMED predictor training CLI (mirrors `amed-solver-main/train.py:15-160`).

  python -m diff_sampler_tpu.cli.train_amed --dataset_name=cifar10 \\
      --model_path=random --total_kimg=1 --batch=16
"""

from __future__ import annotations

import dataclasses
import json
import os

import click
import numpy as np

from ..models.factory import create_model
from ..parallel.mesh import (data_sharding, get_mesh,
                             maybe_initialize_distributed, print0,
                             process_index, replicated)
from ..solvers.amed import bind_with_bottleneck, bottleneck_module_name
from ..training.amed import (AMEDConfig, make_amed_train_step,
                             predictor_from_config)
from ..utils import checkpoint as ckpt
from ..utils import stats as training_stats
from ..utils.common import EasyDict, Logger
from ..utils.profiling import Timer
from ..utils.rng import stacked_randn


@click.command()
@click.option("--dataset_name", type=click.Choice([
    "cifar10", "ffhq", "afhqv2", "imagenet64",        # EDM tier
    "lsun_bedroom", "lsun_cat",                       # CM tier (256px)
    "imagenet256",                                    # ADM + classifier guidance
    "lsun_bedroom_ldm", "ffhq_ldm",                   # LDM tier
    "ms_coco"]), required=True)                       # Stable Diffusion (CFG)
@click.option("--guidance_type", type=click.Choice(["cg", "cfg", "uncond"]),
              default=None)
@click.option("--guidance_rate", type=float, default=1.0)
@click.option("--prompt_path", type=str, default=None,
              help="MS-COCO captions CSV with a 'text' column "
                   "(amed training_loop.py:118-126)")
@click.option("--outdir", type=str, default="./exps")
@click.option("--total_kimg", type=click.IntRange(min=1), default=10)
@click.option("--model_path", type=str, default=None)
@click.option("--num_steps", type=click.IntRange(min=2), default=4)
@click.option("--sampler_stu", type=click.Choice(["amed", "euler", "ipndm",
                                                  "dpm", "dpmpp"]), default="amed")
@click.option("--sampler_tea", type=click.Choice(["heun", "dpm", "dpmpp",
                                                  "euler", "ipndm"]), default="heun")
@click.option("--m", "--M", "M", type=click.IntRange(min=0), default=1)
@click.option("--schedule_type", type=str, default="polynomial")
@click.option("--schedule_rho", type=float, default=7.0)
@click.option("--afs", type=bool, default=False)
@click.option("--scale_dir", type=float, default=0.01)
@click.option("--scale_time", type=float, default=0.0)
@click.option("--max_order", type=int, default=4)
@click.option("--predict_x0", type=bool, default=True)
@click.option("--lower_order_final", type=bool, default=True)
@click.option("--batch", type=click.IntRange(min=1), default=512)
@click.option("--batch_gpu", type=click.IntRange(min=1), default=None,
              help="Microbatch for gradient accumulation (reference "
                   "--batch-gpu); a 16GB v5e fits 256 directly")
@click.option("--lr", type=float, default=5e-3)
@click.option("--remat_traj", type=bool, default=False,
              help="Rematerialize the frozen-net evals in the student "
                   "backward (trajectory memory lever for the CFG-doubled "
                   "SD tier; ~1 extra forward per eval)")
@click.option("--tp", type=int, default=1,
              help="Tensor-parallel degree for the latent tiers: the frozen "
                   "LDM/SD net the predictor trains through is sharded over "
                   "a (data, model) mesh (parallel/tp.py)")
@click.option("--sp", type=int, default=1,
              help="Sequence-parallel degree: ring attention over a "
                   "(data, seq) mesh (ops/ring_attention.py)")
@click.option("--fsdp", is_flag=True, default=False,
              help="Shard the FROZEN net 1/n over the data axis "
                   "(parallel/fsdp.py). AMED trains a tiny predictor "
                   "THROUGH a frozen teacher -- there are no student "
                   "moments to shard, but the 860M SD teacher at CFG 7.5 "
                   "plus the 11.23 GiB trajectory backward (BENCH_NOTES) "
                   "is exactly where sharding the frozen copy pays. "
                   "Latent (ldm/sd) tiers only")
@click.option("--desc", type=str, default=None)
@click.option("--tick", type=click.IntRange(min=1), default=1)
@click.option("--seed", type=int, default=0)
@click.option("-n", "--dry-run", is_flag=True)
def main(dataset_name, guidance_type, guidance_rate, prompt_path, outdir,
         total_kimg, model_path, num_steps, sampler_stu, sampler_tea, M,
         schedule_type, schedule_rho, afs, scale_dir, scale_time, max_order,
         predict_x0, lower_order_final, batch, batch_gpu, lr, remat_traj,
         tp, sp, fsdp, desc, tick, seed, dry_run):
    import jax
    import optax

    if tp > 1 and sp > 1:
        raise click.UsageError("--tp and --sp are mutually exclusive "
                               "(one attention sharding at a time)")
    if fsdp and tp > 1:
        raise click.UsageError("--fsdp and --tp are mutually exclusive "
                               "(one weight sharding at a time)")
    if fsdp and dataset_name not in ("lsun_bedroom_ldm", "ffhq_ldm",
                                     "ms_coco"):
        raise click.UsageError("--fsdp shards the frozen latent net; it "
                               "applies to ldm/sd tiers only")
    maybe_initialize_distributed()
    if dataset_name == "ms_coco":
        assert guidance_type == "cfg", "ms_coco trains with --guidance_type=cfg"
    cfg = AMEDConfig(dataset_name=dataset_name, num_steps=num_steps,
                     sampler_stu=sampler_stu, sampler_tea=sampler_tea, M=M,
                     schedule_type=schedule_type, schedule_rho=schedule_rho,
                     afs=afs, scale_dir=scale_dir, scale_time=scale_time,
                     max_order=max_order, predict_x0=predict_x0,
                     lower_order_final=lower_order_final, lr=lr,
                     total_kimg=total_kimg, batch=batch, batch_gpu=batch_gpu,
                     guidance_type=guidance_type, guidance_rate=guidance_rate,
                     remat_traj=remat_traj)
    if dry_run:
        print0("Training options:")
        print0(json.dumps(dataclasses.asdict(cfg), indent=2))
        print0("Dry run; exiting.")
        return

    run_desc = f"{dataset_name}-{num_steps}-{num_steps}-{sampler_stu}-{sampler_tea}" + (
        f"-{desc}" if desc else "")
    run_dir = ckpt.create_run_dir(outdir, run_desc)
    logger = Logger(os.path.join(run_dir, "log.txt")
                    if process_index() == 0 else None, "a")
    print0(f"Run dir: {run_dir}")

    import flax.linen as flax_nn

    module, params, src = create_model(dataset_name, model_path,
                                       guidance_type=guidance_type,
                                       guidance_rate=guidance_rate)
    # Sampling range/schedule come from the wrapped net (discrete-time tiers
    # expose sigma maps; amed sample.py:171-185 restores the same way).
    cfg = dataclasses.replace(cfg, sigma_min=float(module.sigma_min),
                              sigma_max=float(module.sigma_max))
    # Sampling-config-in-checkpoint pattern: JSON sidecar (SURVEY 5.4),
    # saved AFTER the model range replace -- the sidecar must describe the
    # schedule the predictor actually trains on.
    if process_index() == 0:
        ckpt.save_config(os.path.join(run_dir, "predictor_config.json"), cfg)
    sigma_fn = getattr(module, "sigma", None)
    sigma_inv_fn = getattr(module, "sigma_inv", None)

    tp_mesh = None
    if tp > 1:
        # must happen BEFORE the denoise closures below bind the bottleneck
        from ..ops.pallas_attention import set_tp_context
        from ..parallel import tp as tpmod

        tp_mesh = tpmod.get_mesh_2d(tp)
        if src in ("ldm", "sd"):
            from ..models.factory import shard_ldm_tensor_parallel

            shard_ldm_tensor_parallel(module, tp_mesh)
            params = module.latent_diffusion.unet_params  # drop unsharded
        else:
            from ..models.factory import shard_pixel_tensor_parallel

            params = shard_pixel_tensor_parallel(module, params, tp_mesh, src)
        set_tp_context(tp_mesh)  # flash attention via shard_map over 'model'
        print0(f"Tensor parallel: frozen net sharded over "
               f"mesh {dict(tp_mesh.shape)}")
    if sp > 1:
        from ..ops.ring_attention import set_sp_context
        from ..parallel.tp import get_mesh_2d

        tp_mesh = get_mesh_2d(sp, model_axis="seq")  # reused as the run mesh
        set_sp_context(tp_mesh, seq_axis="seq", batch_axis="data")
        print0(f"Sequence parallel: ring attention over mesh "
               f"{dict(tp_mesh.shape)}")

    conditional = src == "adm"  # CG tier draws random labels per trajectory
    text_cond = src == "sd"  # SD draws random captions (training_loop.py:173-180)
    denoise_factory = None
    context_fn = None
    if isinstance(module, flax_nn.Module):
        den_b = bind_with_bottleneck(
            module, params,
            bottleneck_module_name(module.label_dim, module.img_resolution))
    elif conditional:
        den_b = None

        def denoise_factory(labels):
            return bind_with_bottleneck(module, class_labels=labels)
    elif text_cond:
        den_b = None
        mb = batch_gpu or batch
        context_fn, uncond = _make_text_conditioning(
            module.latent_diffusion, prompt_path, batch, mb, guidance_rate,
            seed)
        cfg_doubled = uncond is not None

        def denoise_factory(ctx):
            return bind_with_bottleneck(module, cfg_doubled=cfg_doubled,
                                        condition=ctx,
                                        unconditional_condition=uncond)
    else:
        den_b = bind_with_bottleneck(module)

    pred = predictor_from_config(cfg)
    pred_params = jax.jit(pred.init)(jax.random.key(seed),
                                     np.zeros((2, 64), np.float32),
                                     np.float32(1.0), np.float32(0.5))["params"]
    optimizer = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = optimizer.init(pred_params)

    mesh = tp_mesh if tp_mesh is not None else get_mesh()
    rep = replicated(mesh)
    shard = data_sharding(mesh, 4)
    step_fn = make_amed_train_step(pred, den_b, cfg, optimizer,
                                   denoise_factory=denoise_factory,
                                   sigma_fn=sigma_fn,
                                   sigma_inv_fn=sigma_inv_fn)

    # Latent tiers: route the FROZEN 274-860M net tree as a jit ARGUMENT
    # (assigning the tracer to ld.unet_params inside the trace, the
    # late-binding contract of models/ldm.py apply_model) -- closing over
    # it embeds it as HLO constants, which stalls the axon remote compile
    # (BENCH_NOTES round 4).  Under --fsdp that argument is additionally
    # sharded 1/n over the data axis.
    net_extra = ()
    net_sh = None
    if src in ("cm", "adm") and tp == 1:
        # Pixel 256 tiers: same params-as-argument contract -- the frozen
        # 550M CM/ADM(+classifier) tree would otherwise embed as HLO
        # constants (remote-compile stall class, BENCH_NOTES round 4).
        # The dataclass precond reads model_fn/model_fn_bottleneck at call
        # time, so reassigning them over the traced tree inside step_fn
        # routes it (mirrors scripts/bench_256px.py).
        from ..models.factory import _capture_middle

        net_pix = module.net
        cls_pix = getattr(module, "classifier", None)
        net_sh = rep
        net_params = jax.device_put(params, rep)
        net_extra = (net_params,)
        base_pixel_step = step_fn

        def step_fn(pred_params, opt_state, latents, *cond_and_net):
            *cond_args, p = cond_and_net
            if src == "adm":
                module.model_fn = lambda x, t, y: net_pix.apply(
                    {"params": p["model"]}, x, t, y)
                module.classifier_fn = lambda x, t: cls_pix.apply(
                    {"params": p["classifier"]}, x, t)
                module.model_fn_bottleneck = _capture_middle(net_pix,
                                                             p["model"])
            else:
                module.model_fn = lambda x, t, y: net_pix.apply(
                    {"params": p}, x, t, None)
                module.model_fn_bottleneck = _capture_middle(net_pix, p)
            return base_pixel_step(pred_params, opt_state, latents,
                                   *cond_args)

    if src in ("ldm", "sd") and tp == 1:
        ld_lat = module.latent_diffusion
        net_params = ld_lat.unet_params
        net_sh = rep
        if fsdp:
            from jax.sharding import NamedSharding, PartitionSpec

            from ..parallel import fsdp as fsdpmod

            n_shard = mesh.shape["data"]
            specs = fsdpmod.fsdp_param_specs(net_params, n_shard)
            net_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda x: isinstance(x, PartitionSpec))
            gib = fsdpmod.fsdp_bytes_per_device(net_params, specs,
                                                n_shard) / 2**30
            print0(f"FSDP: frozen net "
                   f"({fsdpmod.count_sharded_fsdp(specs)} weights) sharded "
                   f"1/{n_shard}: {gib:.2f} GiB/device resident")
        net_params = jax.device_put(net_params, net_sh)
        ld_lat.unet_params = net_params  # release the unplaced tree
        net_extra = (net_params,)
        base_step = step_fn

        def step_fn(pred_params, opt_state, latents, *cond_and_net):
            *cond_args, p = cond_and_net
            ld_lat.unet_params = p
            return base_step(pred_params, opt_state, latents, *cond_args)

    if conditional or text_cond:
        cond_ndim = 3 if text_cond else 1
        train_step = jax.jit(step_fn,
                             in_shardings=(rep, rep, shard,
                                           data_sharding(mesh, cond_ndim))
                             + ((net_sh,) if net_extra else ()),
                             out_shardings=(rep, rep, rep),
                             donate_argnums=(0, 1))
    else:
        train_step = jax.jit(step_fn,
                             in_shardings=(rep, rep, shard)
                             + ((net_sh,) if net_extra else ()),
                             out_shardings=(rep, rep, rep),
                             donate_argnums=(0, 1))
    pred_params = jax.device_put(pred_params, rep)
    opt_state = jax.device_put(opt_state, rep)

    res, chn = module.img_resolution, module.img_channels
    collector = training_stats.default_collector
    jsonl = training_stats.JsonlWriter(os.path.join(run_dir, "stats.jsonl"))
    timer = Timer()
    cur_nimg, it = 0, 0
    print0(f"Training for {total_kimg} kimg (batch {batch})...")
    while cur_nimg < total_kimg * 1000:
        batch_seeds = np.arange(it * batch, (it + 1) * batch) + seed
        latents = stacked_randn(batch_seeds, (res, res, chn))
        latents = jax.device_put(latents, shard)
        if conditional:
            from ..utils.rng import stacked_randint

            labels = stacked_randint(batch_seeds, (), 0, module.label_dim)
            labels = jax.device_put(labels, data_sharding(mesh, 1))
            pred_params, opt_state, metrics = train_step(
                pred_params, opt_state, latents, labels, *net_extra)
        elif text_cond:
            ctx = jax.device_put(context_fn(it), data_sharding(mesh, 3))
            pred_params, opt_state, metrics = train_step(
                pred_params, opt_state, latents, ctx, *net_extra)
        else:
            pred_params, opt_state, metrics = train_step(
                pred_params, opt_state, latents, *net_extra)
        training_stats.report("Loss/loss", np.asarray(metrics["loss_per_step"]))
        cur_nimg += batch
        it += 1
        if it % tick == 0 or cur_nimg >= total_kimg * 1000:
            collector.update()
            t = timer.tick(cur_nimg)
            print0(f"kimg {cur_nimg/1e3:<8.2f} loss {collector.mean('Loss/loss'):<12.6f} "
                   f"sec/kimg {t['sec_per_kimg']:<8.1f}")
            jsonl.write(collector, kimg=cur_nimg / 1e3, **t)
            collector.reset()
    if process_index() == 0:
        path = os.path.join(run_dir, "predictor.npz")
        ckpt.save_params(path, jax.device_get(pred_params))
        print0(f"Saved {path}")
    print0("Done.")
    logger.close()


def _make_text_conditioning(ld, prompt_path, batch, mb, guidance_rate, seed):
    """(context_fn, uncond) for SD AMED training: random-caption contexts per
    iteration plus the (constant) empty-string CFG context sized to the
    microbatch (amed training_loop.py:118-126,173-180)."""
    from ..training.conditioning import (make_caption_context_fn,
                                         make_uncond_context)

    context_fn = make_caption_context_fn(ld, prompt_path, batch, seed)
    uncond = make_uncond_context(ld, mb, guidance_rate, seed=seed)
    return context_fn, uncond


if __name__ == "__main__":
    main()
