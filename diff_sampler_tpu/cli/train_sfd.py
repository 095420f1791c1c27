"""SFD distillation training CLI (mirrors `sfd-main/train.py:15-156`).

  # pixel-space EDM tiers
  python -m diff_sampler_tpu.cli.train_sfd --dataset_name=cifar10 \\
      --model_path=random --total_kimg=1 --batch=8

  # latent tiers (LDM / Stable Diffusion): the student is the latent U-Net,
  # distilled in latent space (sfd training_loop.py:85-110,168-186,227-260)
  python -m diff_sampler_tpu.cli.train_sfd --dataset_name=ms_coco \\
      --guidance_type=cfg --guidance_rate=7.5 --schedule_type=discrete \\
      --schedule_rho=1 --model_path=/path/to/sd-v1-5.ckpt --batch=32
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import click
import numpy as np

from ..models.factory import create_model
from ..parallel.mesh import (data_sharding, get_mesh, maybe_initialize_distributed,
                             print0, process_index, replicated)
from ..training.sfd import SFDConfig, make_ldm_train_step, make_train_step
from ..utils import checkpoint as ckpt
from ..utils import stats as training_stats
from ..utils.common import EasyDict, Logger
from ..utils.profiling import Timer, device_memory_stats
from ..utils.rng import stacked_randn

LATENT_DATASETS = ("ms_coco", "lsun_bedroom_ldm", "ffhq_ldm")


@click.command()
@click.option("--dataset_name", type=click.Choice(
    ["cifar10", "ffhq", "afhqv2", "imagenet64",  # EDM tier
     "ms_coco", "lsun_bedroom_ldm", "ffhq_ldm"]  # LDM/SD tier (sfd train.py:18)
), required=True)
@click.option("--outdir", type=str, default="./exps")
@click.option("--total_kimg", type=click.IntRange(min=1), default=200)
@click.option("--use_step_condition", type=bool, default=False)
@click.option("--is_second_stage", type=bool, default=False)
@click.option("--model_path", type=str, default=None)
@click.option("--num_steps", type=click.IntRange(min=2), default=4)
@click.option("--sampler_tea", type=click.Choice(["dpm", "dpmpp", "euler",
                                                  "ipndm", "heun"]), default="dpmpp")
@click.option("--m", "--M", "M", type=click.IntRange(min=0), default=3)
@click.option("--guidance_type", type=click.Choice(["cg", "cfg", "uncond"]),
              default=None)
@click.option("--guidance_rate", type=float, default=0.0)
@click.option("--schedule_type", type=str, default="polynomial")
@click.option("--schedule_rho", type=float, default=7.0)
@click.option("--afs", type=bool, default=True)
@click.option("--max_order", type=int, default=3)
@click.option("--predict_x0", type=bool, default=True)
@click.option("--lower_order_final", type=bool, default=True)
@click.option("--batch", type=click.IntRange(min=1), default=128)
@click.option("--batch_gpu", type=click.IntRange(min=1), default=None,
              help="Microbatch for gradient accumulation (reference "
                   "--batch-gpu; ms_coco forces an effective 128)")
@click.option("--lr", type=float, default=5e-5)
@click.option("--tp", type=int, default=1,
              help="Tensor-parallel degree for the latent tiers: student + "
                   "teacher weights and optimizer moments sharded over a "
                   "(data, model) mesh (parallel/tp.py)")
@click.option("--sp", type=int, default=1,
              help="Sequence-parallel degree: ring attention over a "
                   "(data, seq) mesh (ops/ring_attention.py)")
@click.option("--fsdp", is_flag=True, default=False,
              help="Fully-sharded data parallel: student, teacher, and Adam "
                   "moments sharded 1/n per device over the data axis "
                   "(parallel/fsdp.py; ZeRO-3 -- the memory lever for the "
                   "860M SD student)")
@click.option("--prompts_path", type=str, default=None,
              help="MS-COCO captions CSV with a 'text' column "
                   "(sfd training_loop.py:168-178)")
@click.option("--remat", type=bool, default=None,
              help="Block-granular rematerialization (training memory). "
                   "Default: on for pixel tiers (fits batch>=64 on 16GB), "
                   "off for latent tiers (--batch_gpu accumulation is the "
                   "first memory lever there)")
@click.option("--resume", type=str, default=None,
              help="Snapshot .npz to resume params+optimizer state from "
                   "(true resume; the reference's is commented out)")
@click.option("--desc", type=str, default=None)
@click.option("--tick", type=click.IntRange(min=1), default=10)
@click.option("--snap", type=click.IntRange(min=1), default=10)
@click.option("--seed", type=int, default=0)
@click.option("-n", "--dry-run", is_flag=True)
def main(dataset_name, outdir, total_kimg, use_step_condition, is_second_stage,
         model_path, num_steps, sampler_tea, M, guidance_type, guidance_rate,
         schedule_type, schedule_rho, afs, max_order, predict_x0,
         lower_order_final, batch, batch_gpu, lr, tp, sp, fsdp, prompts_path,
         remat, resume, desc, tick, snap, seed, dry_run):
    import jax
    import jax.numpy as jnp
    import optax

    if tp > 1 and sp > 1:
        raise click.UsageError("--tp and --sp are mutually exclusive "
                               "(one attention sharding at a time)")
    if fsdp and tp > 1:
        raise click.UsageError("--fsdp and --tp are mutually exclusive "
                               "(one weight sharding at a time; --fsdp does "
                               "combine with --sp)")
    maybe_initialize_distributed()
    latent = dataset_name in LATENT_DATASETS
    if remat is None:
        # pixel tiers need it for batch>=64 on 16GB; latent tiers default
        # off (microbatch accumulation is the first lever there; remat
        # trades ~30% recompute for activation memory when opted in)
        remat = not latent
    cfg = SFDConfig(num_steps=num_steps, M=M, sampler_tea=sampler_tea,
                    schedule_type=schedule_type, schedule_rho=schedule_rho,
                    afs=afs, max_order=max_order, predict_x0=predict_x0,
                    lower_order_final=lower_order_final,
                    use_step_condition=use_step_condition,
                    is_second_stage=is_second_stage,
                    sigma_min=0.006, sigma_max=80.0)
    run_desc = f"{dataset_name}-{num_steps}step-{sampler_tea}{M}" + (
        f"-{desc}" if desc else "")
    options = EasyDict(dataset_name=dataset_name, batch=batch, lr=lr,
                       total_kimg=total_kimg, seed=seed, model_path=model_path,
                       guidance_type=guidance_type, guidance_rate=guidance_rate,
                       **dataclasses.asdict(cfg))
    if dry_run:
        print0("Training options:")
        print0(json.dumps(options, indent=2))
        print0("Dry run; exiting.")
        return

    run_dir = ckpt.create_run_dir(outdir, run_desc)
    logger = Logger(os.path.join(run_dir, "log.txt")
                    if process_index() == 0 else None, "a")
    if process_index() == 0:
        ckpt.save_config(os.path.join(run_dir, "training_options.json"), options)
    print0(f"Run dir: {run_dir}")

    n_acc, mb = _accumulation(dataset_name, batch, batch_gpu)
    eff_batch = n_acc * mb
    if n_acc > 1:
        print0(f"Gradient accumulation: {n_acc} rounds of {mb}")

    # lr drops 10x at half training (training_loop.py:297-301).  optax
    # schedules count OPTIMIZER UPDATES, and the train step performs one
    # update per trajectory segment (num_steps-1 per iteration, sfd.py seg
    # scan), so the boundary is expressed in updates, not iterations.
    sfdv = use_step_condition and not is_second_stage and not latent
    half = _lr_drop_updates(total_kimg, eff_batch, num_steps, sfdv, seed)
    schedule = optax.join_schedules([optax.constant_schedule(lr),
                                     optax.constant_schedule(lr / 10.0)], [half])
    optimizer = optax.adam(schedule)

    label_dim = 0
    context_fn = None
    if latent:
        precond, ld, params = _create_latent_student(
            dataset_name, model_path, guidance_type, guidance_rate, remat)
        step_builder = lambda c: make_ldm_train_step(
            _unet_apply(ld.unet), precond, c, optimizer, n_acc=n_acc)
        res, chn = precond.img_resolution, precond.img_channels
        if dataset_name == "ms_coco":
            context_fn = _make_context_fn(ld, prompts_path, eff_batch, seed)
    else:
        module, params, _src = _create_student(dataset_name, model_path,
                                               use_step_condition, remat)
        step_builder = lambda c: make_train_step(module, c, optimizer,
                                                 n_acc=n_acc)
        res, chn = module.img_resolution, module.img_channels
        label_dim = module.label_dim
    teacher_params = jax.tree.map(lambda a: a.copy(), params)
    opt_state = None  # initialized/placed after the mesh+sharding decision
    start_nimg = 0
    if resume:
        loaded = ckpt.load_params(resume)
        params = jax.tree.map(jnp.asarray, loaded["params"])
        if "opt_state" in loaded:
            # eval_shape gives the state STRUCTURE without allocating the
            # (param-sized) moments on the default device
            struct = jax.eval_shape(optimizer.init, params)
            leaves = [jnp.asarray(loaded["opt_state"][k])
                      for k in sorted(loaded["opt_state"])]
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(struct), leaves)
        start_nimg = int(loaded.get("meta", {}).get("cur_nimg", [0])[0]) \
            if "meta" in loaded else 0
        print0(f"Resumed from {resume} at {start_nimg / 1e3:.1f} kimg")

    mesh = get_mesh()
    tp_sh = None
    if tp > 1:
        # works for the latent tiers AND pixel EDM students: tp_param_specs
        # understands both the LDM flat naming and SongUNet/DhariwalUNet's
        # nested blocks (parallel/tp.py)
        from jax.sharding import NamedSharding, PartitionSpec

        from ..ops.pallas_attention import set_tp_context
        from ..parallel import tp as tpmod

        mesh = tpmod.get_mesh_2d(tp)
        specs = tpmod.tp_param_specs(params, tp)
        tp_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, PartitionSpec))
        set_tp_context(mesh)  # flash attention via shard_map over 'model'
        print0(f"Tensor parallel: {tpmod.count_sharded(specs)} weights "
               f"sharded over mesh {dict(mesh.shape)}")
    if sp > 1:
        from ..ops.ring_attention import set_sp_context
        from ..parallel import tp as tpmod

        mesh = tpmod.get_mesh_2d(sp, model_axis="seq")
        set_sp_context(mesh, seq_axis="seq", batch_axis="data")
        print0(f"Sequence parallel: ring attention over mesh "
               f"{dict(mesh.shape)}")
    fsdp_sh = None
    if fsdp:
        from jax.sharding import NamedSharding, PartitionSpec

        from ..parallel import fsdp as fsdpmod

        n_shard = mesh.shape["data"]
        specs = fsdpmod.fsdp_param_specs(params, n_shard)
        fsdp_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                               is_leaf=lambda x: isinstance(x, PartitionSpec))
        gib = fsdpmod.fsdp_bytes_per_device(params, specs, n_shard) / 2**30
        print0(f"FSDP: {fsdpmod.count_sharded_fsdp(specs)} weights sharded "
               f"1/{n_shard} per device ({gib:.2f} GiB/device resident vs "
               f"replicated)")
    rep = replicated(mesh)
    p_sh = tp_sh if tp_sh is not None else (
        fsdp_sh if fsdp_sh is not None else rep)
    shard = data_sharding(mesh, 4)
    conditional = label_dim > 0 or context_fn is not None
    cond_ndim = 3 if context_fn is not None else 2

    params = jax.device_put(params, p_sh)
    teacher_params = jax.device_put(teacher_params, p_sh)
    # init from the PLACED params: zeros_like inherits their shardings, so
    # the Adam moments are tensor/fsdp-sharded under --tp/--fsdp,
    # replicated otherwise.
    ref_state = optimizer.init(params)
    if opt_state is None:
        opt_state = ref_state
    else:
        # resumed moments get the same mesh shardings a fresh state has;
        # leaves the init created as fresh constants (e.g. the Adam `count`
        # scalar) carry a single-device sharding and stay uncommitted so
        # the jit can place them
        from jax.sharding import NamedSharding

        def _place(ref, host):
            h = jnp.asarray(host)
            s = ref.sharding
            return jax.device_put(h, s) if isinstance(s, NamedSharding) else h

        opt_state = jax.tree.map(_place, ref_state, opt_state)
    # PIN the opt-state shardings through the jit: with out_shardings=None
    # GSPMD is free to re-layout a moment (observed: one leaf drifting to
    # replicated under fsdp, defeating the memory point); leaves init left
    # uncommitted (the Adam `count` scalar) pin to replicated
    from jax.sharding import NamedSharding as _NS

    o_sh = jax.tree.map(
        lambda l: l.sharding if isinstance(l.sharding, _NS) else rep,
        ref_state)
    del ref_state

    def build_step(c):
        if conditional:
            return jax.jit(step_builder(c),
                           in_shardings=(p_sh, o_sh, p_sh, shard,
                                         data_sharding(mesh, cond_ndim)),
                           out_shardings=(p_sh, o_sh, rep))
        return jax.jit(step_builder(c),
                       in_shardings=(p_sh, o_sh, p_sh, shard),
                       out_shardings=(p_sh, o_sh, rep))

    if use_step_condition and not is_second_stage and not latent:
        # SFD-v: randomize num_steps in [4,7] per trajectory
        # (training_loop.py:239-244); one jitted program per step count.
        step_variants = {
            n: build_step(dataclasses.replace(
                cfg, num_steps=n, M=2 if n == 3 else 3))
            for n in range(4, 8)}
        rng_steps = np.random.RandomState(seed)
        train_step = lambda *a: step_variants[int(rng_steps.randint(4, 8))](*a)
    else:
        train_step = build_step(cfg)
    if (tp_sh is not None or fsdp_sh is not None) and latent:
        # rebind so the stale unsharded tree is released (it is otherwise
        # kept alive through the LatentDiffusion the step builder closes
        # over); `ld` only exists on the latent tiers -- pixel students keep
        # nothing stale (their module is a pure flax def, params-free)
        ld.unet_params = params

    collector = training_stats.default_collector
    jsonl = training_stats.JsonlWriter(os.path.join(run_dir, "stats.jsonl"))
    timer = Timer()
    cur_nimg, it = start_nimg, start_nimg // eff_batch
    print0(f"Training for {total_kimg} kimg (batch {eff_batch})...")
    while cur_nimg < total_kimg * 1000:
        batch_seeds = np.arange(it * eff_batch, (it + 1) * eff_batch) + seed
        latents = stacked_randn(batch_seeds, (res, res, chn))
        latents = jax.device_put(latents, shard)
        if context_fn is not None:
            cond = jax.device_put(context_fn(it), data_sharding(mesh, 3))
            params, opt_state, metrics = train_step(
                params, opt_state, teacher_params, latents, cond)
        elif label_dim:
            # random one-hot class labels per trajectory
            # (training_loop.py:181-182)
            from ..utils.rng import stacked_randint

            idx = np.asarray(stacked_randint(batch_seeds, (), 0, label_dim))
            cond = jax.device_put(
                np.eye(label_dim, dtype=np.float32)[idx],
                data_sharding(mesh, 2))
            params, opt_state, metrics = train_step(
                params, opt_state, teacher_params, latents, cond)
        else:
            params, opt_state, metrics = train_step(params, opt_state,
                                                    teacher_params, latents)
        training_stats.report("Loss/loss", np.asarray(metrics["loss_per_step"]))
        cur_nimg += eff_batch
        it += 1
        if it % tick == 0 or cur_nimg >= total_kimg * 1000:
            collector.update()
            t = timer.tick(cur_nimg)
            mem = device_memory_stats()
            print0(f"kimg {cur_nimg/1e3:<8.2f} loss {collector.mean('Loss/loss'):<10.4f} "
                   f"sec/kimg {t['sec_per_kimg']:<8.1f} "
                   f"hbm {mem['peak_bytes_in_use_gib']:.2f}GiB")
            jsonl.write(collector, kimg=cur_nimg / 1e3, **t)
            collector.reset()
        if (it % (tick * snap) == 0 or cur_nimg >= total_kimg * 1000) \
                and process_index() == 0:
            path = os.path.join(run_dir, f"snapshot-{cur_nimg//1000:06d}.npz")
            # zero-padded keys keep leaf order stable under string sort
            flat_opt = {f"{i:06d}": np.asarray(x) for i, x in
                        enumerate(jax.tree.leaves(jax.device_get(opt_state)))}
            ckpt.save_params(path, jax.device_get(params),
                             opt_state=flat_opt,
                             meta={"cur_nimg": np.asarray([cur_nimg])})
            print0(f"Saved {path}")
    print0("Done.")
    logger.close()


def _accumulation(dataset_name, batch, batch_gpu):
    """(accumulation rounds, microbatch).

    ms_coco forces an EFFECTIVE batch of 128 (training_loop.py:227:
    num_acc_rounds = 128 // batch); the microbatch honors --batch_gpu when
    given (memory cap) -- intentional divergence: the reference recomputes
    rounds from batch_size alone at :227, clobbering its own --batch-gpu
    accumulation from :165, so `--batch=128 --batch_gpu=32` there runs one
    oversized microbatch.  Other tiers split `batch` into --batch_gpu
    microbatches."""
    if dataset_name == "ms_coco":
        mb = batch_gpu if (batch_gpu is not None and batch_gpu < batch) else batch
        return max(1, 128 // mb), mb
    if batch_gpu is not None and batch_gpu < batch:
        if batch % batch_gpu:
            raise click.ClickException(
                f"batch {batch} not divisible by batch_gpu {batch_gpu}")
        return batch // batch_gpu, batch_gpu
    return 1, batch


def _lr_drop_updates(total_kimg, eff_batch, num_steps, sfdv, seed):
    """Optimizer-update index of the half-training 10x lr drop.

    The train step runs one optax update per trajectory segment
    (num_steps-1 per iteration); SFD-v draws num_steps per iteration from
    the seeded RandomState the training loop also uses, so replay a copy
    to count its updates exactly."""
    half_iters = (total_kimg * 1000) // (2 * eff_batch)
    if not sfdv:
        return half_iters * (num_steps - 1)
    sim = np.random.RandomState(seed)
    return int(sum(int(sim.randint(4, 8)) - 1 for _ in range(half_iters)))


def _unet_apply(unet):
    """Functional latent-U-Net call closing over the module only -- params
    are an explicit argument so distillation gradients flow into them."""

    def apply(p, x, t, c=None):
        if c is None:
            return unet.apply({"params": p}, x, t)
        return unet.apply({"params": p}, x, t, c)

    return apply


def _create_latent_student(dataset_name, model_path, guidance_type,
                           guidance_rate, remat=False):
    """LDM/SD student: CFGPrecond math + trainable latent-U-Net params
    (sfd training_loop.py:85-110 create_model LDM branch; guidance asserts
    mirror :92,97,103)."""
    from ..models.factory import build_ldm_model

    if dataset_name == "ms_coco":
        assert guidance_type == "cfg", "ms_coco trains with --guidance_type=cfg"
    else:
        assert guidance_type in (None, "uncond"), (
            f"{dataset_name} trains with --guidance_type=uncond")
    precond, _ = build_ldm_model(dataset_name, model_path,
                                 guidance_type=guidance_type,
                                 guidance_rate=guidance_rate or 1.0,
                                 remat=remat)
    ld = precond.latent_diffusion
    return precond, ld, ld.unet_params


def _make_context_fn(ld, prompts_path, batch, seed):
    """Per-iteration caption context sampler (training_loop.py:168-178)."""
    from ..training.conditioning import make_caption_context_fn

    return make_caption_context_fn(ld, prompts_path, batch, seed)


def _create_student(dataset_name, model_path, use_step_condition, remat):
    """Rebuild the arch (optionally WITH step-condition modules, SFD-v) then
    load the EMA weights non-strictly (training_loop.py:46-110 create_model).
    remat enables block-granular rematerialization for training memory."""
    import jax
    import jax.numpy as jnp

    from ..models.factory import build_edm_model, init_params

    module = build_edm_model(dataset_name, use_step_condition=use_step_condition,
                             sigma_min=0.006, remat=remat)
    params = init_params(module)
    if model_path is not None and model_path.endswith(".npz"):
        # second-stage distillation: student starts from (and the frozen
        # teacher copies) a stage-1 framework snapshot
        # (sfd training_loop.py:47-53)
        from ..utils import checkpoint as _ckpt

        loaded = _ckpt.load_params(model_path)["params"]
    elif model_path not in (None, "random"):
        from ..models.zoo import load_checkpoint_params

        loaded = load_checkpoint_params(model_path)
    else:
        loaded = None

    if loaded is not None:
        def merge(init_tree, loaded_tree):
            out = {}
            for k, v in init_tree.items():
                if k in loaded_tree and isinstance(v, dict):
                    out[k] = merge(v, loaded_tree[k])
                elif k in loaded_tree:
                    out[k] = jnp.asarray(loaded_tree[k])
                else:
                    out[k] = v  # new module (affine_step etc.) keeps init
            return out

        params = merge(params, loaded)
    return module, params, "edm"


if __name__ == "__main__":
    main()
