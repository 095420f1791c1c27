"""Sampling CLI: the TPU-native `sample.py`.

Mirrors the reference flag groups (SOLVER_FLAGS / SCHEDULE_FLAGS /
ADDITIONAL_FLAGS / GUIDANCE_FLAGS, `diff-solvers-main/sample.py:125-162`) so
launch.sh commands translate 1:1:

  python -m diff_sampler_tpu.cli.sample --dataset_name=cifar10 \\
      --solver=ipndm --num_steps=6 --seeds=0-63 --grid=True --outdir=out/
"""

from __future__ import annotations

import ast
import os

import click
import numpy as np

from ..models.factory import create_model
from ..models.precond import bind
from ..parallel.mesh import get_mesh, print0
from ..sampling import SolverConfig, generate, to_uint8
from ..utils.image import parse_int_list, save_grid, save_images


@click.command()
# General options
@click.option("--dataset_name", type=str, required=True)
@click.option("--model_path", type=str, default=None,
              help="Checkpoint path ('random' for fresh init)")
@click.option("--batch", "max_batch_size", type=int, default=64)
@click.option("--seeds", type=str, default="0-63")
@click.option("--grid", type=bool, default=False)
@click.option("--outdir", type=str, default=None)
@click.option("--subdirs", type=bool, default=True)
@click.option("--bf16", type=bool, default=False, help="bfloat16 inner compute")
# SOLVER_FLAGS
@click.option("--solver", type=click.Choice(["euler", "heun", "dpm", "ipndm",
                                             "ipndm_v", "dpmpp", "unipc", "deis"]),
              default="ipndm")
@click.option("--num_steps", type=int, default=6)
@click.option("--afs", type=bool, default=False)
@click.option("--denoise_to_zero", type=bool, default=False)
# SCHEDULE_FLAGS
@click.option("--schedule_type", type=click.Choice(["polynomial", "logsnr",
                                                    "time_uniform", "discrete"]),
              default="polynomial")
@click.option("--schedule_rho", type=float, default=7.0)
@click.option("--t_steps", type=str, default=None,
              help="Explicit sigma list, e.g. '[80.0, 10.0, 1.0, 0.002]'")
# ADDITIONAL_FLAGS
@click.option("--max_order", type=int, default=None)
@click.option("--predict_x0", type=bool, default=True)
@click.option("--lower_order_final", type=bool, default=True)
@click.option("--variant", type=click.Choice(["bh1", "bh2"]), default="bh2")
@click.option("--deis_mode", type=click.Choice(["tab", "rhoab"]), default="tab")
@click.option("--r", type=float, default=0.5)
# GUIDANCE_FLAGS
@click.option("--guidance_type", type=str, default=None)
@click.option("--guidance_rate", type=float, default=1.0)
@click.option("--prompt", type=str, default=None)
def main(dataset_name, model_path, max_batch_size, seeds, grid, outdir, subdirs,
         bf16, solver, num_steps, afs, denoise_to_zero, schedule_type,
         schedule_rho, t_steps, max_order, predict_x0, lower_order_final,
         variant, deis_mode, r, guidance_type, guidance_rate, prompt):
    import jax.numpy as jnp

    seeds = parse_int_list(seeds)
    module, params, model_source = create_model(
        dataset_name, model_path, guidance_type, guidance_rate,
        dtype=jnp.bfloat16 if bf16 else jnp.float32)
    cond = {}
    per_seed_cond = None
    if model_source == "sd" and prompt is None:
        # MS-COCO caption per seed (sample.py:171-180,276-291)
        from .clip_score import load_captions

        ld = module.latent_diffusion
        captions = load_captions()
        texts = [captions[int(s) % len(captions)] for s in seeds]
        import numpy as _np

        per_seed_cond = _np.concatenate(
            [_np.asarray(ld.get_learned_conditioning(texts[i:i + 64]))
             for i in range(0, len(texts), 64)])
        if guidance_rate not in (None, 1.0):
            cond["unconditional_condition"] = jnp.asarray(
                ld.get_learned_conditioning([""]))
    elif model_source in ("ldm", "sd") and prompt is not None:
        ld = module.latent_diffusion
        c = ld.get_learned_conditioning([prompt])
        cond["condition"] = jnp.asarray(c)
        if guidance_rate not in (None, 1.0):
            cond["unconditional_condition"] = jnp.asarray(
                ld.get_learned_conditioning([""]))
    den = bind(module, params, **cond)

    explicit_t = tuple(ast.literal_eval(t_steps)) if t_steps else None
    cfg = SolverConfig(solver=solver, num_steps=num_steps,
                       schedule_type=schedule_type, schedule_rho=schedule_rho,
                       afs=afs, denoise_to_zero=denoise_to_zero,
                       max_order=max_order, predict_x0=predict_x0,
                       lower_order_final=lower_order_final, variant=variant,
                       deis_mode=deis_mode, r=r, t_steps=explicit_t)
    print0(f"Solver: {solver} | steps: {num_steps} | NFE: {cfg.nfe()} | "
           f"schedule: {schedule_type}(rho={schedule_rho}) | source: {model_source}")

    shape = (module.img_resolution, module.img_resolution, module.img_channels)
    mesh = get_mesh()
    cond_kw = {}
    if per_seed_cond is not None:
        uc = cond.get("unconditional_condition")
        cond_kw = dict(
            per_seed_cond=per_seed_cond,
            denoise_with_labels=lambda x, t, c: module(
                x, t, condition=c,
                unconditional_condition=(
                    jnp.broadcast_to(uc, c.shape) if uc is not None else None)))
    elif getattr(module, "label_dim", 0):
        # per-seed random class labels (sample.py:276-281); int labels for
        # the classifier-guided ADM path, one-hot for EDM.
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
    # LDM/SD: sample in latent space with the model's discrete schedule.
    sched_kw = {}
    if model_source in ("ldm", "sd"):
        sched_kw = dict(sigma_fn=module.sigma, sigma_inv_fn=module.sigma_inv)
        if schedule_type == "polynomial" and t_steps is None:
            import dataclasses as _dc

            cfg = _dc.replace(cfg, schedule_type="discrete", schedule_rho=1.0)
    images = generate(den, seeds, shape, cfg, mesh=mesh,
                      max_batch_size=max_batch_size, **cond_kw, **sched_kw)
    if model_source in ("ldm", "sd"):
        import jax

        import numpy as _np

        dec = jax.jit(module.latent_diffusion.decode_first_stage)
        images = _np.concatenate(
            [_np.asarray(dec(jnp.asarray(images[i:i + 16])), _np.float32)
             for i in range(0, len(images), 16)])
    images = to_uint8(images)

    outdir = outdir or f"samples/{dataset_name}-{solver}-{num_steps}"
    if grid:
        save_grid(images, os.path.join(outdir, "grid.png"))
        print0(f"Saved grid to {outdir}/grid.png")
    else:
        save_images(images, seeds, outdir, subdirs=subdirs)
        print0(f"Saved {len(seeds)} images to {outdir}")
    print0("Done.")


if __name__ == "__main__":
    main()
