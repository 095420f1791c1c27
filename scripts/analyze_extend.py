"""Runnable equivalent of the reference's `diff-analyzer-main/main_extend.ipynb`:

  1. sample trajectories from a diffusion model (or from the approximated-
     Gaussian-score denoisers: full/low-rank Gaussian, full/low-rank MoG),
  2. project each trajectory to its 3D regularity frame (endpoint axis + top-2
     PCs) and plot the raw 3D trajectories,
  3. Procrustes-calibrate the trajectories against a base one and plot,
  4. compute windowed curvature/torsion along arc length and plot.

Emits PNG figures + a JSON stats summary into --outdir.

  python scripts/analyze_extend.py --mode=sampling --model_path=random \\
      --num_steps=201 --batch=16 --outdir=analysis_out
  python scripts/analyze_extend.py --mode=full_rank_gaussian --data=... \\
      --num_steps=201 --batch=16
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np

MODES = ["sampling", "full_rank_gaussian", "low_rank_gaussian",
         "full_rank_mog", "low_rank_mog"]


def build_denoiser(mode, dataset_name, model_path, data_path, rank, resolution):
    """Returns (denoiser, resolution, channels)."""
    from diff_sampler_tpu.models import analytic

    if mode == "sampling":
        from diff_sampler_tpu.models.factory import create_model
        from diff_sampler_tpu.models.precond import bind

        module, params, _src = create_model(dataset_name, model_path)
        return (bind(module, params), module.img_resolution,
                module.img_channels)

    # approximated-score modes need dataset statistics
    if data_path:
        from diff_sampler_tpu.eval.dataset import ImageFolderDataset

        ds = ImageFolderDataset(data_path, resolution=resolution,
                                use_labels="mog" in mode)
        n = min(len(ds), 10000)
        imgs = np.stack([ds[i][0] for i in range(n)])  # uint8 NHWC
        labels = None
        if "mog" in mode and ds.label_dim:
            labels = np.stack([ds.get_label(i) for i in range(n)])
        data = imgs.astype(np.float32) / 127.5 - 1.0
    else:  # synthetic fallback so the script runs without any artifacts
        rng = np.random.default_rng(0)
        centers = rng.normal(size=(10, resolution * resolution * 3)).astype(
            np.float32)
        labels = rng.integers(0, 10, size=512)
        data = (centers[labels]
                + 0.1 * rng.normal(size=(512, centers.shape[1]))).astype(
                    np.float32)
    flat = data.reshape(len(data), -1)
    if labels is None:
        labels = np.zeros(len(flat), np.int64)

    if mode == "full_rank_gaussian":
        den = analytic.IsotropicGaussianDenoiser(flat.mean(0))
    elif mode == "low_rank_gaussian":
        den = analytic.LowRankGaussianDenoiser.from_data(flat, rank)
    elif mode == "full_rank_mog":
        den = analytic.MixtureGaussianDenoiser.from_labeled_data(flat, labels)
    elif mode == "low_rank_mog":
        den = analytic.MixtureGaussianDenoiser.from_labeled_data(
            flat, labels, rank=rank)
    else:
        raise click.ClickException(f"unknown mode {mode}")
    return den, resolution, 3


@click.command()
@click.option("--mode", type=click.Choice(MODES), default="sampling")
@click.option("--dataset_name", type=str, default="cifar10")
@click.option("--model_path", type=str, default="random")
@click.option("--data", "data_path", type=str, default=None,
              help="Image dir/zip for dataset statistics (approx-score modes)")
@click.option("--solver", type=str, default="euler")
@click.option("--num_steps", type=int, default=201,
              help="notebook uses 1001; 201 is a faster default")
@click.option("--batch", type=int, default=16)
@click.option("--rank", type=int, default=64,
              help="PCA rank for the low-rank modes")
@click.option("--resolution", type=int, default=32)
@click.option("--window", type=int, default=101)
@click.option("--keep_ratio", type=float, default=0.8)
@click.option("--outdir", type=str, default="analysis_out")
def main(mode, dataset_name, model_path, data_path, solver, num_steps, batch,
         rank, resolution, window, keep_ratio, outdir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax
    import jax.numpy as jnp

    from diff_sampler_tpu import analysis
    from diff_sampler_tpu.ops import get_schedule
    from diff_sampler_tpu.solvers import get_sampler
    from diff_sampler_tpu.utils.rng import stacked_randn

    os.makedirs(outdir, exist_ok=True)
    den, res, ch = build_denoiser(mode, dataset_name, model_path, data_path,
                                  rank, resolution)
    t_steps = get_schedule(num_steps, den.sigma_min, den.sigma_max,
                           "polynomial", 7.0)
    lat = stacked_randn(jnp.arange(batch), (res, res, ch))
    out = jax.jit(lambda l: get_sampler(solver)(den, l, t_steps,
                                                return_inters=True))(lat)
    traj = np.asarray(out.xs)  # [T, B, H, W, C]

    # -- regularity projection + raw plot ---------------------------------
    xs, ys, zs = analysis.regularity_projection(traj)
    kx, ky, kz = analysis.keep_central(xs, ys, zs, keep_ratio)
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    for b in range(kx.shape[1]):
        ax.plot3D(kx[:, b], ky[:, b], kz[:, b])
    ax.set_xlabel("x_t0 - x_tN")
    ax.set_ylabel("PC1")
    ax.set_zlabel("PC2")
    ax.view_init(elev=8, azim=130)
    fig.savefig(os.path.join(outdir, f"traj_3d_raw_{mode}.png"), dpi=150)
    plt.close(fig)

    # -- calibrated (Procrustes-aligned) plot -----------------------------
    ax_, ay_, az_ = analysis.procrustes_align(kx, ky, kz, base_idx=0,
                                              proj_dim=2)
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    for b in range(ax_.shape[1]):
        ax.plot3D(ax_[:, b], ay_[:, b], az_[:, b])
    ax.set_xlabel("x_t0 - x_tN")
    ax.set_ylabel("PC1 (aligned)")
    ax.set_zlabel("PC2 (aligned)")
    ax.view_init(elev=8, azim=130)
    fig.savefig(os.path.join(outdir, f"traj_3d_calibrated_{mode}.png"), dpi=150)
    plt.close(fig)

    # -- curvature / torsion ----------------------------------------------
    w = min(window, (traj.shape[0] // 2) * 2 - 1)
    curv, tors, s = analysis.windowed_curvature_torsion(kx, ky, kz,
                                                        window_size=w)
    fig, axs = plt.subplots(2, figsize=(6, 4), sharex=True)
    for b in range(curv.shape[1]):
        axs[0].plot(s[:, b], curv[:, b], alpha=0.5)
        axs[1].plot(s[:, b], tors[:, b], alpha=0.5)
    axs[0].set_ylabel("curvature")
    axs[1].set_ylabel("torsion")
    axs[1].set_xlabel("arc length")
    fig.savefig(os.path.join(outdir, f"curv_tors_{mode}.png"), dpi=150)
    plt.close(fig)

    stats = {
        "mode": mode,
        "num_steps": num_steps,
        "batch": batch,
        "mean_curvature": float(np.nanmean(curv)),
        "mean_abs_torsion": float(np.nanmean(np.abs(tors))),
        "mean_final_norm": float(np.linalg.norm(
            traj[-1].reshape(batch, -1), axis=1).mean()),
        "window_size": w,
    }
    with open(os.path.join(outdir, f"stats_{mode}.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
