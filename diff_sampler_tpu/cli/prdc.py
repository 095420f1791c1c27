"""PRDC CLI: precision / recall / density / coverage between a generated
image set and a reference image set, mirroring `sfd-main/prdc.py:252-`:
Inception features for both sets, then the k-NN-radius PRDC formulas
(`prdc.py:71-124`).

  python -m diff_sampler_tpu.cli.prdc calc --images=out/ --images_ref=data/ \\
      --inception=<imported .npz or NVIDIA .pkl>
"""

from __future__ import annotations

import json

import click
import numpy as np

from ..eval.dataset import ImageFolderDataset
from ..eval.prdc import compute_prdc
from ..parallel.mesh import print0
from .fid import _feature_fn


def _features_for_path(path, max_size, batch, seed, feature_fn):
    ds = ImageFolderDataset(path, max_size=max_size, random_seed=seed)
    feats = [np.asarray(feature_fn(imgs)) for imgs, _ in ds.batches(batch)]
    return np.concatenate(feats, axis=0)


@click.group()
def main():
    """Precision / recall / density / coverage (sfd-main/prdc.py)."""


@main.command()
@click.option("--images", "image_path", type=str, required=True,
              help="Generated images (dir or zip)")
@click.option("--images_ref", "ref_path", type=str, required=True,
              help="Reference images (dir or zip)")
@click.option("--num", "max_size", type=int, default=5000,
              help="Images per set (the reference asserts 5000, prdc.py:284)")
@click.option("--nearest_k", type=int, default=5)
@click.option("--seed", type=int, default=0)
@click.option("--batch", type=int, default=250)
@click.option("--inception", type=str, default=None,
              help="Imported Inception params (.npz) or NVIDIA detector .pkl")
@click.option("--strict-count/--no-strict-count", default=True)
@click.option("--smoke", is_flag=True,
              help="Allow a random-init detector (pipeline smoke only)")
@click.option("--realism", is_flag=True, help="Also report max realism score")
def calc(image_path, ref_path, max_size, nearest_k, seed, batch, inception,
         strict_count, smoke, realism):
    n_gen = len(ImageFolderDataset(image_path, max_size=max_size))
    if strict_count and n_gen != max_size:
        raise click.ClickException(
            f"{n_gen} generated images found, expected {max_size} "
            "(use --no-strict-count)")
    feature_fn, is_random = _feature_fn(inception, allow_random=smoke)
    print0(f'Computing features for "{image_path}"...')
    fake = _features_for_path(image_path, max_size, batch, seed, feature_fn)
    print0(f'Computing features for "{ref_path}"...')
    real = _features_for_path(ref_path, max_size, batch, seed, feature_fn)
    out = compute_prdc(real, fake, nearest_k=nearest_k, realism=realism)
    if "realism" in out:  # per-fake-sample array -> summary stats
        r = np.asarray(out.pop("realism"))
        out["realism_mean"], out["realism_max"] = r.mean(), r.max()
    out = {k: float(v) for k, v in out.items()}
    if is_random:
        print0("SMOKE-ONLY values (random detector, NOT real PRDC):")
    print0(json.dumps(out))


if __name__ == "__main__":
    main()
