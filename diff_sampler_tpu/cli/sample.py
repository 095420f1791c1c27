"""Sampling CLI: the TPU-native `sample.py`.

Mirrors the reference flag groups (SOLVER_FLAGS / SCHEDULE_FLAGS /
ADDITIONAL_FLAGS / GUIDANCE_FLAGS / GITS_FLAGS,
`diff-solvers-main/sample.py:125-162`, `gits-main/sample.py:159-166`) plus
the AMED and SFD sampling entry points:

  # plain solvers
  python -m diff_sampler_tpu.cli.sample --dataset_name=cifar10 \\
      --solver=ipndm --num_steps=6 --seeds=0-63 --grid=True --outdir=out/

  # GITS: DP schedule search before sampling (gits sample.py --dp=True)
  ... --dp=True --num_steps_tea=61 --num_warmup=256 --metric=dev --coeff=1.15

  # AMED: trained predictor restores ALL sampling settings from its config
  # sidecar (amed sample.py:149-185)
  ... --predictor=exps/00000-cifar10-... (run dir, predictor.npz, or exp number)

  # SFD: sample a distilled snapshot; settings restore from
  # training_options.json (sfd sample.py:112-135)
  ... --model_path=exps/00000-cifar10-3step-dpmpp1 [--skip_tuning=True]
"""

from __future__ import annotations

import ast
import json
import os

import click
import numpy as np

from ..models.factory import create_model
from ..models.precond import bind
from ..parallel.mesh import get_mesh, print0
from ..sampling import SolverConfig, generate, to_uint8
from ..utils.image import parse_int_list, save_grid, save_images


def _resolve_snapshot(path_or_exp, outdir_base="./exps"):
    """Run dir / snapshot.npz / experiment number -> (npz_path, config_dict)."""
    from ..utils import checkpoint as ckpt

    path = str(path_or_exp)
    if path.isdigit():
        run_dir = ckpt.find_run_dir(outdir_base, int(path))
        if run_dir is None:
            raise click.ClickException(f"no experiment #{path} in {outdir_base}")
        path = run_dir
    if os.path.isdir(path):
        snaps = sorted(f for f in os.listdir(path) if f.startswith("snapshot-")
                       and f.endswith(".npz"))
        npz = os.path.join(path, snaps[-1]) if snaps else os.path.join(
            path, "predictor.npz")
        cfg = {}
        for name in ("training_options.json", "predictor_config.json"):
            p = os.path.join(path, name)
            if os.path.isfile(p):
                cfg = json.load(open(p))
                break
        return npz, cfg
    cfg_path = os.path.join(os.path.dirname(path), "training_options.json")
    cfg = json.load(open(cfg_path)) if os.path.isfile(cfg_path) else {}
    return path, cfg


@click.command()
# General options
@click.option("--dataset_name", type=str, required=True)
@click.option("--model_path", type=str, default=None,
              help="Checkpoint (.pkl/.pt/.ckpt), framework snapshot (.npz), "
                   "run dir, experiment number, or 'random'")
@click.option("--predictor", type=str, default=None,
              help="AMED predictor: run dir, predictor.npz, or exp number")
@click.option("--batch", "max_batch_size", type=int, default=64)
@click.option("--seeds", type=str, default="0-63")
@click.option("--grid", type=bool, default=False)
@click.option("--outdir", type=str, default=None)
@click.option("--subdirs", type=bool, default=True)
@click.option("--bf16", type=bool, default=False, help="bfloat16 inner compute")
@click.option("--tp", type=int, default=1,
              help="Tensor-parallel degree for the latent tiers: shard the "
                   "U-Net weights over a (data, model) mesh (parallel/tp.py)")
@click.option("--sp", type=int, default=1,
              help="Sequence-parallel degree: ring attention over a "
                   "(data, seq) mesh shards each image's attention tokens "
                   "across devices (ops/ring_attention.py); the T=4096 SD "
                   "latent level is the motivating case")
# SOLVER_FLAGS
@click.option("--solver", type=click.Choice(["euler", "heun", "dpm", "ipndm",
                                             "ipndm_v", "dpmpp", "unipc", "deis",
                                             "amed"]),
              default="ipndm")
@click.option("--num_steps", type=int, default=6)
@click.option("--afs", type=bool, default=False)
@click.option("--denoise_to_zero", type=bool, default=False)
@click.option("--return_inters", type=bool, default=False,
              help="Save the whole sampling trajectory (sample.py:140): grid "
                   "mode renders every point, otherwise trajectory.npz")
# SCHEDULE_FLAGS
@click.option("--schedule_type", type=click.Choice(["polynomial", "logsnr",
                                                    "time_uniform", "discrete"]),
              default="polynomial")
@click.option("--schedule_rho", type=float, default=7.0)
@click.option("--sigma_min", type=float, default=None,
              help="Lowest noise level [default: the model's]")
@click.option("--sigma_max", type=float, default=None,
              help="Highest noise level [default: the model's]")
@click.option("--t_steps", type=str, default=None,
              help="Explicit sigma list, e.g. '[80.0, 10.0, 1.0, 0.002]'")
# ADDITIONAL_FLAGS
@click.option("--max_order", type=int, default=None)
@click.option("--predict_x0", type=bool, default=True)
@click.option("--lower_order_final", type=bool, default=True)
@click.option("--variant", type=click.Choice(["bh1", "bh2"]), default="bh2")
@click.option("--deis_mode", type=click.Choice(["tab", "rhoab"]), default="tab")
@click.option("--r", type=float, default=0.5)
@click.option("--skip_tuning", type=bool, default=False,
              help="SFD inference-time skip rescale (sfd networks_edm.py:377)")
# GUIDANCE_FLAGS
@click.option("--guidance_type", type=str, default=None)
@click.option("--guidance_rate", type=float, default=1.0)
@click.option("--prompt", type=str, default=None)
# GITS_FLAGS (gits-main/sample.py:159-166)
@click.option("--dp", type=bool, default=False, help="Run GITS schedule search")
@click.option("--metric", type=click.Choice(["l1", "l2", "dev"]), default="dev")
@click.option("--coeff", type=float, default=1.15)
@click.option("--num_warmup", type=int, default=256)
@click.option("--num_steps_tea", type=int, default=61)
@click.option("--solver_tea", type=str, default="ipndm")
def main(dataset_name, model_path, predictor, max_batch_size, seeds, grid,
         outdir, subdirs, bf16, tp, sp, solver, num_steps, afs, denoise_to_zero,
         return_inters, schedule_type, schedule_rho, sigma_min, sigma_max,
         t_steps, max_order, predict_x0, lower_order_final, variant, deis_mode,
         r, skip_tuning, guidance_type, guidance_rate, prompt, dp, metric,
         coeff, num_warmup, num_steps_tea, solver_tea):
    import jax
    import jax.numpy as jnp

    from ..parallel.mesh import maybe_initialize_distributed

    if tp > 1 and sp > 1:
        raise click.UsageError("--tp and --sp are mutually exclusive "
                               "(one attention sharding at a time)")
    maybe_initialize_distributed()
    seeds = parse_int_list(seeds)
    dtype = jnp.bfloat16 if bf16 else jnp.float32

    # -- model resolution: torch ckpt / framework snapshot / run dir ------
    LATENT = ("ms_coco", "lsun_bedroom_ldm", "ffhq_ldm")
    restored = {}
    if model_path is not None and (model_path.endswith(".npz")
                                   or os.path.isdir(model_path)
                                   or model_path.isdigit()):
        from ..models.factory import build_edm_model, build_ldm_model
        from ..utils import checkpoint as ckpt

        npz, restored = _resolve_snapshot(model_path)
        if dataset_name in LATENT:
            # Trained LATENT student (sfd sample.py:110-135,189-196): rebuild
            # the LDM stack from the ORIGINAL checkpoint (VAE + text towers),
            # then swap in the distilled U-Net weights from the snapshot.
            src_ckpt = restored.get("model_path")
            module, _ = build_ldm_model(
                dataset_name, src_ckpt,
                guidance_type=restored.get("guidance_type") or guidance_type,
                guidance_rate=restored.get("guidance_rate", guidance_rate)
                or 1.0, dtype=dtype)
            params = jax.tree.map(jnp.asarray, ckpt.load_params(npz)["params"])
            module.latent_diffusion.unet_params = params
            guidance_rate = restored.get("guidance_rate", guidance_rate)
            model_source = "sd" if dataset_name == "ms_coco" else "ldm"
        else:
            module = build_edm_model(
                dataset_name,
                use_step_condition=restored.get("use_step_condition", False),
                dtype=dtype)
            params = ckpt.load_params(npz)["params"]
            model_source = "edm"
        # SFD restore: sampling settings come from the training config
        # (sfd sample.py:112-135); --num_steps only honored for SFD-v.
        if restored:
            if not restored.get("use_step_condition", False):
                num_steps = restored.get("num_steps", num_steps)
            solver = "euler"
            schedule_type = restored.get("schedule_type", schedule_type)
            schedule_rho = restored.get("schedule_rho", schedule_rho)
            afs = restored.get("afs", afs)
            print0(f"Restored SFD sampling settings: num_steps={num_steps} "
                   f"schedule={schedule_type}({schedule_rho}) afs={afs}")
    else:
        module, params, model_source = create_model(
            dataset_name, model_path, guidance_type, guidance_rate, dtype=dtype)

    tp_mesh = None
    if tp > 1:
        from ..ops.pallas_attention import set_tp_context
        from ..parallel import tp as tpmod

        tp_mesh = tpmod.get_mesh_2d(tp)
        if model_source in ("ldm", "sd"):
            from ..models.factory import shard_ldm_tensor_parallel

            shard_ldm_tensor_parallel(module, tp_mesh)
            # rebind so the unsharded tree is released, not kept alive by
            # this frame for the whole sampling run (bind() ignores params
            # for dataclass preconds; the model reads ld.unet_params
            # late-bound)
            params = module.latent_diffusion.unet_params
        else:
            # pixel tiers (edm/cm/adm): the 550M imagenet256 ADM is the
            # motivating case -- one 16 GB chip holds it, a TP mesh spreads
            # both weights and attention
            from ..models.factory import shard_pixel_tensor_parallel

            params = shard_pixel_tensor_parallel(module, params, tp_mesh,
                                                 model_source)
        # route flash attention through shard_map over the model axis so
        # TP attention keeps O(T d) memory instead of GSPMD gathering the
        # opaque Pallas call or falling back to einsum [T,T] logits
        set_tp_context(tp_mesh)
        print0(f"Tensor parallel: U-Net weights sharded over "
               f"mesh {dict(tp_mesh.shape)}")
    if sp > 1:
        from ..ops.ring_attention import set_sp_context
        from ..parallel.tp import get_mesh_2d

        sp_mesh = get_mesh_2d(sp, model_axis="seq")
        set_sp_context(sp_mesh, seq_axis="seq", batch_axis="data")
        print0(f"Sequence parallel: ring attention over mesh "
               f"{dict(sp_mesh.shape)}")

    cond = {}
    per_seed_cond = None
    if model_source == "sd" and prompt is None:
        # MS-COCO caption per seed (sample.py:171-180,276-291)
        from .clip_score import load_captions

        ld = module.latent_diffusion
        captions = load_captions()
        texts = [captions[int(s) % len(captions)] for s in seeds]
        per_seed_cond = np.concatenate(
            [np.asarray(ld.get_learned_conditioning(texts[i:i + 64]))
             for i in range(0, len(texts), 64)])
        if guidance_rate not in (None, 1.0):
            cond["unconditional_condition"] = jnp.asarray(
                ld.get_learned_conditioning([""]))
    elif model_source in ("ldm", "sd") and prompt is not None:
        ld = module.latent_diffusion
        cond["condition"] = jnp.asarray(ld.get_learned_conditioning([prompt]))
        if guidance_rate not in (None, 1.0):
            cond["unconditional_condition"] = jnp.asarray(
                ld.get_learned_conditioning([""]))
    if skip_tuning:
        cond["skip_tuning"] = True
    den = bind(module, params, **cond)
    shape = (module.img_resolution, module.img_resolution, module.img_channels)

    # -- AMED path: predictor restores its sampling settings --------------
    if predictor is not None:
        _amed_sample(module, params, den, predictor, seeds, shape,
                     max_batch_size, outdir, grid, subdirs, dataset_name)
        return

    explicit_t = tuple(ast.literal_eval(t_steps)) if t_steps else None
    # LDM/SD: sample in latent space with the model's discrete schedule --
    # resolved BEFORE the GITS search so the dp teacher runs on the same
    # schedule the final sampler uses.
    sched_kw = {}
    if model_source in ("ldm", "sd"):
        sched_kw = dict(sigma_fn=module.sigma, sigma_inv_fn=module.sigma_inv)
        if schedule_type == "polynomial" and t_steps is None:
            schedule_type, schedule_rho = "discrete", 1.0
    # Big-tier jit contract: latent (274-860M) param trees enter every jit
    # as ARGUMENTS (late-bound through LatentDiffusion.unet_params); closing
    # over them embeds >1 GB of HLO constants, which the axon remote
    # compile rejects (BENCH_NOTES round 4). Excluded under --tp: the
    # sharded tree is already committed to the mesh.
    big_kw = {}
    if model_source in ("ldm", "sd") and tp <= 1:
        ld_big = module.latent_diffusion
        big_kw = dict(jit_params=ld_big.unet_params,
                      bind_params=lambda p: setattr(ld_big, "unet_params", p))
    dp_list = None
    if dp:
        import time as _time

        from ..gits.search import GITSConfig, gits_schedule

        gcfg = GITSConfig(num_steps=num_steps, num_steps_tea=num_steps_tea,
                          num_warmup=num_warmup, solver_tea=solver_tea,
                          solver=solver, metric=metric, coeff=coeff,
                          schedule_type=schedule_type, schedule_rho=schedule_rho,
                          afs=afs, batch_size=max_batch_size)
        gits_kw = dict(sched_kw)
        if model_source == "sd" and per_seed_cond is not None:
            # warmup trajectories need caption conditioning too
            # (gits_utils.py:63-110); one caption embedding per warmup seed
            texts_w = [captions[i % len(captions)] for i in range(num_warmup)]
            warm_cond = np.concatenate(
                [np.asarray(ld.get_learned_conditioning(texts_w[i:i + 64]))
                 for i in range(0, len(texts_w), 64)])
            uc = cond.get("unconditional_condition")
            gits_kw.update(
                per_seed_cond=warm_cond,
                denoise_with_cond=lambda x, t, c: module(
                    x, t, condition=c,
                    unconditional_condition=(
                        jnp.broadcast_to(uc, c.shape) if uc is not None
                        else None)))
        t0 = _time.perf_counter()
        dp_list, dp_sigmas = gits_schedule(den, shape, gcfg, **gits_kw,
                                           **big_kw)
        print0(f"GITS search: {_time.perf_counter() - t0:.1f}s "
               f"({gcfg.num_warmup} warmup x {gcfg.num_steps_tea - 1}-step "
               f"{gcfg.solver_tea} teacher, incl. compile)")
        print0(f"GITS dp_list: {dp_list}")
        print0(f"GITS schedule: {np.round(dp_sigmas, 4).tolist()}")
        num_steps = num_steps_tea

    cfg = SolverConfig(solver=solver, num_steps=num_steps,
                       schedule_type=schedule_type, schedule_rho=schedule_rho,
                       afs=afs, denoise_to_zero=denoise_to_zero,
                       max_order=max_order, predict_x0=predict_x0,
                       lower_order_final=lower_order_final, variant=variant,
                       deis_mode=deis_mode, r=r, t_steps=explicit_t,
                       dp_list=tuple(dp_list) if dp_list else None,
                       sigma_min=sigma_min, sigma_max=sigma_max)
    print0(f"Solver: {solver} | NFE: {cfg.nfe()} | "
           f"schedule: {schedule_type}(rho={schedule_rho}) | source: {model_source}")

    mesh = tp_mesh if tp_mesh is not None else get_mesh()
    cond_kw = {}
    if per_seed_cond is not None:
        uc = cond.get("unconditional_condition")
        cond_kw = dict(
            per_seed_cond=per_seed_cond,
            denoise_with_labels=lambda x, t, c: module(
                x, t, condition=c,
                unconditional_condition=(
                    jnp.broadcast_to(uc, c.shape) if uc is not None else None)))
    elif model_source not in ("ldm", "sd") and getattr(module, "label_dim", 0):
        # per-seed random class labels (sample.py:276-281); int labels for
        # the classifier-guided ADM path, one-hot for EDM.  LDM/SD are
        # excluded: their conditioning is the prompt context already bound
        # into `den` (or per_seed_cond above), and CFGPrecond takes
        # condition=, not class_labels= (its label_dim=1 only marks it
        # conditional, networks_edm.py:630-763).
        import flax.linen as fnn

        if isinstance(module, fnn.Module):
            cond_kw = dict(
                label_dim=module.label_dim, label_kind="onehot",
                denoise_with_labels=lambda x, t, lab: module.apply(
                    {"params": params}, x, t, lab))
        else:
            cond_kw = dict(
                label_dim=module.label_dim, label_kind="int",
                denoise_with_labels=lambda x, t, lab: module(
                    x, t, class_labels=lab))
    if return_inters and model_source in ("ldm", "sd"):
        raise click.ClickException(
            "--return_inters is not supported for latent models: the "
            "trajectory lives in latent space and grid/PNG output would "
            "render undecoded latents (use the library API and "
            "decode_first_stage per point instead)")
    out_base = outdir or f"samples/{dataset_name}-{solver}-{num_steps}"
    # Pixel tiers stream PNG writes while the device computes: generate's
    # batch loop is software-pipelined (batch i+1 dispatched before batch i
    # is fetched), so the per-batch callback's host-side encode/write
    # overlaps device compute instead of serializing after it (the
    # reference saves after each synchronous batch, sample.py:294-316).
    # Latent tiers still save after the VAE decode pass below; grid /
    # trajectory modes need the full array anyway.
    stream = (not return_inters and not grid
              and model_source not in ("ldm", "sd"))
    stream_cb = None
    if stream:
        pi, pc = jax.process_index(), jax.process_count()

        def stream_cb(start, chunk):
            # multi-host: every process holds the gathered batch; write the
            # round-robin shard of GLOBAL seed indices (matches _save)
            mine = [i for i in range(len(chunk)) if (start + i) % pc == pi]
            if mine:
                save_images(to_uint8(chunk[np.asarray(mine)]),
                            [seeds[start + i] for i in mine],
                            out_base, subdirs=subdirs)
    images = generate(den, seeds, shape, cfg, mesh=mesh,
                      max_batch_size=max_batch_size,
                      return_inters=return_inters, batch_callback=stream_cb,
                      **cond_kw, **sched_kw, **big_kw)
    if return_inters:
        # trajectory [num_points, N, ...]: grid mode renders every point
        # (the reference's save path over the stacked inters); otherwise
        # dump the raw trajectory
        if grid:
            _save(images.reshape((-1,) + images.shape[2:]),
                  range(images.shape[0] * images.shape[1]), out_base,
                  grid=True, subdirs=False)
        else:
            if jax.process_index() == 0:
                os.makedirs(out_base, exist_ok=True)
                np.savez(os.path.join(out_base, "trajectory.npz"), xs=images)
            print0(f"Saved trajectory {images.shape} to "
                   f"{out_base}/trajectory.npz")
        return
    if model_source in ("ldm", "sd"):
        dec = jax.jit(module.latent_diffusion.decode_first_stage)
        images = np.concatenate(
            [np.asarray(dec(jnp.asarray(images[i:i + 16])), np.float32)
             for i in range(0, len(images), 16)])
    if sp > 1:
        from ..ops.ring_attention import log_sp_dispatch

        log_sp_dispatch(print0)  # which attention shapes actually rang
    if stream:
        print0(f"Saved {len(seeds)} images to {out_base} (streamed)")
        print0("Done.")
    else:
        _save(images, seeds, out_base, grid, subdirs)


def _amed_sample(module, params, den, predictor, seeds, shape, max_batch_size,
                 outdir, grid, subdirs, dataset_name):
    """AMED sampling: restore every solver setting from the predictor's
    config sidecar (amed sample.py:149-185)."""
    import jax
    import jax.numpy as jnp

    from ..ops import get_schedule
    from ..solvers.amed import (AMED_SOLVER_REGISTRY, AMEDPredictor,
                                bind_with_bottleneck, bottleneck_module_name)
    from ..training.amed import AMEDConfig
    from ..utils import checkpoint as ckpt
    from ..utils.rng import stacked_randn

    import flax.linen as fnn

    npz, cfg_dict = _resolve_snapshot(predictor)
    if not npz.endswith("predictor.npz"):
        cand = os.path.join(os.path.dirname(npz), "predictor.npz")
        npz = cand if os.path.isfile(cand) else npz
    cfg = AMEDConfig(**{k: v for k, v in cfg_dict.items()
                        if k in AMEDConfig.__dataclass_fields__})
    pred_params = ckpt.load_params(npz)["params"]
    pred = AMEDPredictor(scale_dir=cfg.scale_dir, scale_time=cfg.scale_time)
    label_dim = getattr(module, "label_dim", 0)
    bneck = bottleneck_module_name(label_dim, module.img_resolution)
    # discrete-time tiers need the model's sigma maps for the schedule
    t_steps = get_schedule(cfg.num_steps, cfg.sigma_min, cfg.sigma_max,
                           cfg.schedule_type, cfg.schedule_rho,
                           sigma_fn=getattr(module, "sigma", None),
                           sigma_inv_fn=getattr(module, "sigma_inv", None))
    sampler = AMED_SOLVER_REGISTRY[cfg.sampler_stu]
    nfe = 2 * (cfg.num_steps - 1) - (1 if cfg.afs else 0)
    print0(f"AMED: student={cfg.sampler_stu} steps={cfg.num_steps} NFE={nfe} "
           f"(restored from predictor config)")

    pred_apply = lambda b, tc, tn: pred.apply({"params": pred_params}, b, tc, tn)
    conditional = label_dim > 0 and not isinstance(module, fnn.Module)
    if conditional:
        # CG/CFG tier: per-seed random class labels, bound per batch
        # (sample.py:276-281 / train-time denoise_factory symmetry)
        fn = jax.jit(lambda lat, labels: sampler(
            bind_with_bottleneck(module, params, bneck, class_labels=labels),
            pred_apply, lat, t_steps, afs=cfg.afs, max_order=cfg.max_order,
            predict_x0=cfg.predict_x0,
            lower_order_final=cfg.lower_order_final).x)
    else:
        den_b = bind_with_bottleneck(module, params, bneck)
        fn = jax.jit(lambda lat: sampler(
            den_b, pred_apply, lat, t_steps, afs=cfg.afs,
            max_order=cfg.max_order, predict_x0=cfg.predict_x0,
            lower_order_final=cfg.lower_order_final).x)
    out = []
    for s in range(0, len(seeds), max_batch_size):
        chunk = seeds[s : s + max_batch_size]
        lat = stacked_randn(jnp.asarray(chunk), shape)
        if conditional:
            from ..utils.rng import stacked_randint

            labels = stacked_randint(jnp.asarray(chunk), (), 0, label_dim)
            out.append(np.asarray(fn(lat, labels), np.float32))
        else:
            out.append(np.asarray(fn(lat), np.float32))
    images = np.concatenate(out)
    _save(images, seeds,
          outdir or f"samples/{dataset_name}-amed-{cfg.sampler_stu}",
          grid, subdirs)


def _save(images, seeds, outdir, grid, subdirs):
    """Write PNGs, sharded by process in multi-host runs (the reference
    writes each rank's seed shard, sample.py:302-312; under SPMD every
    process holds the full gathered batch, so shard by round-robin here)."""
    import jax

    images = to_uint8(images)
    if grid:
        if jax.process_index() == 0:
            save_grid(images, os.path.join(outdir, "grid.png"))
        print0(f"Saved grid to {outdir}/grid.png")
    else:
        pi, pc = jax.process_index(), jax.process_count()
        if pc > 1:
            seeds = list(seeds)
            save_images(images[pi::pc], seeds[pi::pc], outdir, subdirs=subdirs)
        else:
            save_images(images, seeds, outdir, subdirs=subdirs)
        print0(f"Saved {len(seeds)} images to {outdir}")
    print0("Done.")


if __name__ == "__main__":
    main()
