"""Canonical run matrix, mirroring the reference launch.sh scripts
(`diff-solvers-main/launch.sh`, `amed-solver-main/launch.sh`,
`gits-main/launch.sh`, `sfd-main/launch.sh`).

Each entry is a small end-to-end demo; pass --model_path to use real
checkpoints (zoo keys download when networked).

  python scripts/launch_examples.py solvers   # 8-solver grid sweep
  python scripts/launch_examples.py gits      # schedule search + sampling
  python scripts/launch_examples.py amed      # predictor training + sampling
  python scripts/launch_examples.py sfd       # distillation smoke
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import click
import numpy as np

import jax
import jax.numpy as jnp


@click.command()
@click.argument("demo", type=click.Choice(["solvers", "gits", "amed", "sfd"]))
@click.option("--dataset_name", type=str, default="cifar10")
@click.option("--model_path", type=str, default="random")
@click.option("--outdir", type=str, default="launch_out")
def main(demo, dataset_name, model_path, outdir):
    from diff_sampler_tpu.models.factory import create_model
    from diff_sampler_tpu.models.precond import bind
    from diff_sampler_tpu.sampling import SolverConfig, generate, to_uint8
    from diff_sampler_tpu.utils.image import save_grid

    module, params, _src = create_model(dataset_name, model_path)
    den = bind(module, params)
    shape = (module.img_resolution, module.img_resolution, module.img_channels)
    os.makedirs(outdir, exist_ok=True)

    if demo == "solvers":
        # launch.sh grid commands: every solver at NFE~5, 16-seed grids
        for solver, steps in [("euler", 6), ("heun", 4), ("dpm", 4),
                              ("ipndm", 6), ("ipndm_v", 6), ("deis", 6),
                              ("dpmpp", 6), ("unipc", 6)]:
            cfg = SolverConfig(solver=solver, num_steps=steps)
            imgs = generate(den, range(16), shape, cfg, max_batch_size=16)
            save_grid(to_uint8(imgs), f"{outdir}/{solver}-nfe{cfg.nfe()}.png")
            print(f"{solver:8s} NFE={cfg.nfe():2d} -> {outdir}/{solver}-nfe{cfg.nfe()}.png")

    elif demo == "gits":
        from diff_sampler_tpu.gits.search import GITSConfig, gits_schedule

        gcfg = GITSConfig(num_steps=6, num_steps_tea=21, num_warmup=32,
                          batch_size=16)
        dp_list, t_steps = gits_schedule(den, shape, gcfg)
        print(f"GITS dp_list={dp_list}")
        print(f"sigma schedule: {np.round(t_steps, 4).tolist()}")
        cfg = SolverConfig(solver="ipndm", num_steps=gcfg.num_steps_tea,
                           dp_list=tuple(dp_list))
        imgs = generate(den, range(16), shape, cfg, max_batch_size=16)
        save_grid(to_uint8(imgs), f"{outdir}/gits.png")
        print(f"NFE={cfg.nfe()} -> {outdir}/gits.png")

    elif demo == "amed":
        import optax

        from diff_sampler_tpu.solvers.amed import (AMED_SOLVER_REGISTRY,
                                                   bind_with_bottleneck,
                                                   bottleneck_module_name)
        from diff_sampler_tpu.training.amed import (AMEDConfig,
                                                    make_amed_train_step,
                                                    predictor_from_config)

        cfg = AMEDConfig(num_steps=4, M=1)
        den_b = bind_with_bottleneck(
            module, params,
            bottleneck_module_name(module.label_dim, module.img_resolution))
        pred = predictor_from_config(cfg)
        pp = jax.jit(pred.init)(jax.random.key(0), np.zeros((2, 64), np.float32),
                                np.float32(1.0), np.float32(0.5))["params"]
        opt = optax.adam(cfg.lr)
        step = jax.jit(make_amed_train_step(pred, den_b, cfg, opt))
        state = opt.init(pp)
        for i in range(4):
            lat = jax.random.normal(jax.random.key(i), (16,) + shape)
            pp, state, m = step(pp, state, lat)
            print(f"iter {i}: loss {float(m['loss']):.4f}")
        from diff_sampler_tpu.ops import get_schedule

        t = get_schedule(cfg.num_steps, den.sigma_min, den.sigma_max)
        out = AMED_SOLVER_REGISTRY["amed"](
            den_b, lambda b, tc, tn: pred.apply({"params": pp}, b, tc, tn),
            jax.random.normal(jax.random.key(9), (16,) + shape), t)
        save_grid(to_uint8(np.asarray(out.x)), f"{outdir}/amed.png")
        print(f"AMED NFE={2 * (cfg.num_steps - 1)} -> {outdir}/amed.png")

    elif demo == "sfd":
        import optax

        from diff_sampler_tpu.training.sfd import SFDConfig, make_train_step

        cfg = SFDConfig(num_steps=4, M=1)
        opt = optax.adam(5e-5)
        step = jax.jit(make_train_step(module, cfg, opt))
        teacher = jax.tree.map(lambda a: a.copy(), params)
        state = opt.init(params)
        p = params
        for i in range(4):
            lat = jax.random.normal(jax.random.key(i), (8,) + shape)
            p, state, m = step(p, state, teacher, lat)
            print(f"iter {i}: loss {float(m['loss']):.4f}")
        print("SFD smoke complete.")


if __name__ == "__main__":
    main()
