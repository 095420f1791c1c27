"""FID CLI: `calc` (images vs reference stats) and `ref` (build dataset
stats), mirroring `diff-solvers-main/fid.py:90-165`.

  python -m diff_sampler_tpu.cli.fid calc --images=out/ --ref=cifar10-32x32.npz
  python -m diff_sampler_tpu.cli.fid ref --data=datasets/cifar10.zip --dest=ref.npz
"""

from __future__ import annotations

import click
import numpy as np

from ..eval.dataset import ImageFolderDataset
from ..eval.fid import (calculate_stats, compute_fid, load_stats,
                        make_inception_feature_fn, save_stats)
from ..parallel.mesh import print0


def _feature_fn(inception_params_path, allow_random=False):
    """Build the detector feature fn.

    Returns (feature_fn, is_random).  Without imported Inception weights the
    features are random-init and any resulting 'FID' is MEANINGLESS -- calc
    refuses to print one unless --smoke is passed, and then labels it."""
    import jax

    from ..eval.inception import InceptionV3FID, import_nvidia_inception_pickle
    from ..utils.checkpoint import load_params

    if inception_params_path:
        if inception_params_path.endswith(".pkl"):
            params, _report = import_nvidia_inception_pickle(inception_params_path)
            net = InceptionV3FID(tf_preprocessing=True)
            return jax.jit(lambda im: net.apply({"params": params}, im)), False
        params = load_params(inception_params_path)["params"]
        return make_inception_feature_fn(params), False
    if not allow_random:
        raise click.ClickException(
            "no --inception weights given; refusing to compute a meaningless "
            "FID from a random-init detector. Pass --inception=<imported "
            ".npz or NVIDIA .pkl>, or --smoke to exercise the pipeline only.")
    import jax.numpy as jnp

    net = InceptionV3FID()
    print0("WARNING: random-init detector (--smoke): values are meaningless")
    params = jax.jit(net.init)(jax.random.key(0),
                               jnp.zeros((1, 32, 32, 3), jnp.uint8))["params"]
    return make_inception_feature_fn(params), True


def _stats_for_path(path, num_expected, batch, inception, seed=0,
                    allow_random=False):
    ds = ImageFolderDataset(path, max_size=num_expected, random_seed=seed)
    if num_expected is not None and len(ds) < num_expected:
        raise click.ClickException(
            f"Found {len(ds)} images, expected at least {num_expected}")
    if len(ds) < 2:
        raise click.ClickException("Need at least 2 images")
    feature_fn, is_random = _feature_fn(inception, allow_random)
    stats = calculate_stats(feature_fn, (imgs for imgs, _ in ds.batches(batch)))
    return stats, is_random


@click.group()
def main():
    """Frechet Inception Distance."""


@main.command()
@click.option("--images", "image_path", type=str, required=True)
@click.option("--ref", "ref_path", type=str, required=True)
@click.option("--num", "num_expected", type=int, default=50000)
@click.option("--batch", type=int, default=64)
@click.option("--inception", type=str, default=None,
              help="Imported Inception params (.npz) or NVIDIA detector .pkl")
@click.option("--strict-count/--no-strict-count", default=True,
              help="Require 10k/30k/50k images (fid.py:43)")
@click.option("--smoke", is_flag=True,
              help="Allow a random-init detector (pipeline smoke only; the "
                   "result is labeled and is NOT an FID)")
@click.option("--seed", type=int, default=0,
              help="Random seed for selecting the images (fid.py:118)")
def calc(image_path, ref_path, num_expected, batch, inception, strict_count,
         smoke, seed):
    ds_len = len(ImageFolderDataset(image_path, max_size=num_expected,
                                    random_seed=seed))
    if strict_count and ds_len not in (10000, 30000, 50000):
        raise click.ClickException(
            f"{ds_len} images found; expected 10k/30k/50k (use --no-strict-count)")
    (mu, sigma), is_random = _stats_for_path(
        image_path, num_expected if strict_count else None, batch, inception,
        seed=seed, allow_random=smoke)
    mu_ref, sigma_ref = load_stats(ref_path)
    fid = compute_fid(mu, sigma, mu_ref, sigma_ref)
    if is_random:
        print0(f"SMOKE-ONLY frechet distance (random detector, NOT FID): {fid:g}")
    else:
        print0(f"FID: {fid:g}")


@main.command()
@click.option("--data", "dataset_path", type=str, required=True)
@click.option("--dest", "dest_path", type=str, required=True)
@click.option("--batch", type=int, default=64)
@click.option("--inception", type=str, default=None)
@click.option("--smoke", is_flag=True)
def ref(dataset_path, dest_path, batch, inception, smoke):
    (mu, sigma), is_random = _stats_for_path(dataset_path, None, batch,
                                             inception, allow_random=smoke)
    if is_random:
        print0("WARNING: stats built with a random detector (--smoke)")
    save_stats(dest_path, mu, sigma)
    print0(f"Saved reference stats to {dest_path}")


if __name__ == "__main__":
    main()
