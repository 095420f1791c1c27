"""Trajectory-geometry analysis runner: the script equivalent of the
diff-analyzer notebooks (`main_mp.ipynb` / `main_extend.ipynb`).

Runs a solver with trajectory capture against (a) a pre-trained/random model
and (b) the dataset-posterior 'optimal' denoiser, then dumps geometry
statistics (magnitude, deviation, cosines, curvature/torsion,
deviation-to-optima) as JSON and a plot grid.

  python scripts/analyze_trajectories.py --dataset_name=cifar10 \\
      --model_path=random --solver=ipndm --num_steps=21 --batch=16
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import click
import numpy as np

import jax
import jax.numpy as jnp


@click.command()
@click.option("--dataset_name", type=str, default="cifar10")
@click.option("--model_path", type=str, default="random")
@click.option("--solver", type=str, default="ipndm")
@click.option("--num_steps", type=int, default=21)
@click.option("--batch", type=int, default=16)
@click.option("--data", "data_path", type=str, default=None,
              help="Image dir/zip for the optimal-denoiser comparison")
@click.option("--num_images", type=int, default=None,
              help="Large-scale mode (the main_mp.ipynb 50k-image harness): "
                   "accumulate device-side geometry stats over this many "
                   "images, sharded across the mesh; PCA extras skipped")
@click.option("--outdir", type=str, default="analysis_out")
def main(dataset_name, model_path, solver, num_steps, batch, data_path,
         num_images, outdir):
    from diff_sampler_tpu import analysis
    from diff_sampler_tpu.models.factory import create_model
    from diff_sampler_tpu.models.precond import bind
    from diff_sampler_tpu.ops import get_schedule
    from diff_sampler_tpu.solvers import get_sampler
    from diff_sampler_tpu.utils.rng import stacked_randn

    module, params, _src = create_model(dataset_name, model_path)
    den = bind(module, params)
    t_steps = get_schedule(num_steps, den.sigma_min, den.sigma_max)
    shape = (module.img_resolution, module.img_resolution,
             module.img_channels)

    if num_images is not None:
        # ---- main_mp.ipynb-scale harness: sharded stat accumulation ------
        from diff_sampler_tpu.ops.geometry import (trajectory_curvature,
                                                   trajectory_deviation,
                                                   trajectory_lengths)
        from diff_sampler_tpu.parallel.mesh import (data_sharding, get_mesh,
                                                    pad_to_multiple)

        mesh = get_mesh()
        ndev = len(mesh.devices.ravel())

        @jax.jit
        def batch_stats(lat, w):
            # w: [B] 1/0 mask -- padded rows (ragged final chunk repeated to
            # a device multiple) contribute exactly zero
            out = get_sampler(solver)(den, lat, t_steps, return_inters=True)
            xs, eps = out.xs, out.eps
            deno = analysis.denoised_trajectory(xs, eps, t_steps)

            def wsum(s):  # s: [B, ...] per-sample stats
                return (s * w.reshape((-1,) + (1,) * (s.ndim - 1))).sum(0)

            return {
                "magnitude": wsum(analysis.trajectory_magnitude(xs)),
                "deviation": wsum(trajectory_deviation(xs)),
                "segment_lengths": wsum(trajectory_lengths(xs)),
                "direction_cosine": wsum(analysis.direction_cosines(xs)),
                "curvature": wsum(trajectory_curvature(xs)),
                "denoised_magnitude":
                    wsum(analysis.trajectory_magnitude(deno)),
            }

        acc, total = None, 0
        bsz = max(batch, ndev) // ndev * ndev
        for start in range(0, num_images, bsz):
            seeds = np.arange(start, min(start + bsz, num_images))
            n_real = len(seeds)
            pad = pad_to_multiple(n_real, ndev) - n_real
            seeds = np.concatenate([seeds, np.repeat(seeds[-1:], pad)])
            w = np.concatenate([np.ones(n_real, np.float32),
                                np.zeros(pad, np.float32)])
            lat = stacked_randn(jnp.asarray(seeds), shape)
            sh = data_sharding(mesh, lat.ndim)
            lat = jax.device_put(lat, sh)
            w = jax.device_put(jnp.asarray(w), data_sharding(mesh, 1))
            stats = jax.device_get(batch_stats(lat, w))
            stats = {k: np.asarray(v, np.float64) for k, v in stats.items()}
            acc = (stats if acc is None else
                   {k: acc[k] + stats[k] for k in stats})
            total += n_real
        report = {k: np.asarray(v) / total for k, v in acc.items()}
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "report.json"), "w") as f:
            json.dump({k: v.tolist() for k, v in report.items()}, f, indent=2)
        print(f"Wrote {outdir}/report.json ({total} images, {ndev} devices)")
        return

    lat = stacked_randn(jnp.arange(batch), shape)
    out = jax.jit(lambda l: get_sampler(solver)(den, l, t_steps,
                                                return_inters=True))(lat)

    ref_xs = None
    if data_path:
        from diff_sampler_tpu.eval.dataset import ImageFolderDataset

        ds = ImageFolderDataset(data_path, resolution=module.img_resolution)
        imgs = np.stack([ds[i][0] for i in range(min(len(ds), 5000))])
        opt_den = analysis.optimal_denoiser_from_images(imgs)
        ref_xs = jax.jit(lambda l: get_sampler(solver)(
            opt_den, l, t_steps, return_inters=True).xs)(lat)

    report = analysis.trajectory_report(out.xs, out.eps, t_steps, ref_xs)
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "report.json"), "w") as f:
        json.dump({k: v.tolist() for k, v in report.items()}, f, indent=2)
    print(f"Wrote {outdir}/report.json")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        keys = list(report)
        fig, axes = plt.subplots(2, (len(keys) + 1) // 2,
                                 figsize=(4 * ((len(keys) + 1) // 2), 7))
        for ax, k in zip(axes.ravel(), keys):
            ax.plot(report[k])
            ax.set_title(k)
            ax.set_xlabel("step")
        fig.tight_layout()
        fig.savefig(os.path.join(outdir, "geometry.png"), dpi=110)
        print(f"Wrote {outdir}/geometry.png")
    except Exception as e:  # pragma: no cover
        print(f"(plotting skipped: {e})")


if __name__ == "__main__":
    main()
