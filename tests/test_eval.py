"""Evaluation stack tests: FID moments/Frechet math vs independent numpy,
PRDC vs the reference formulas (sklearn), Inception architecture shapes,
dataset reader, and CLIP score math."""

import os
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_sampler_tpu.eval import (FIDAccumulator, ImageFolderDataset,
                                   InceptionV3FID, calculate_stats, clip_score,
                                   compute_fid, compute_prdc, load_stats,
                                   save_stats)


def test_fid_moments_match_numpy():
    rng = np.random.RandomState(0)
    feats = rng.randn(500, 16).astype(np.float32)
    acc = FIDAccumulator(16)
    for s in range(0, 500, 64):
        acc.update(jnp.asarray(feats[s:s + 64]))
    mu, sigma = acc.finalize()
    np.testing.assert_allclose(mu, feats.mean(0), atol=1e-5)
    np.testing.assert_allclose(sigma, np.cov(feats, rowvar=False), atol=1e-4)


def test_fid_zero_for_identical_stats():
    rng = np.random.RandomState(1)
    feats = rng.randn(300, 8).astype(np.float64)
    mu, sigma = feats.mean(0), np.cov(feats, rowvar=False)
    assert abs(compute_fid(mu, sigma, mu, sigma)) < 1e-6


def test_fid_analytic_gaussians():
    # For N(m1, I) vs N(m2, I): FID = |m1-m2|^2
    d = 6
    mu1, mu2 = np.zeros(d), np.full(d, 0.5)
    eye = np.eye(d)
    assert abs(compute_fid(mu1, eye, mu2, eye) - d * 0.25) < 1e-8
    # N(0, 4I) vs N(0, I): tr(4I + I - 2*2I) = d
    assert abs(compute_fid(mu1, 4 * eye, mu1, eye) - d) < 1e-8


def test_fid_stats_roundtrip(tmp_path):
    mu, sigma = np.arange(4.0), np.eye(4)
    p = str(tmp_path / "ref.npz")
    save_stats(p, mu, sigma)
    mu2, sigma2 = load_stats(p)
    np.testing.assert_array_equal(mu, mu2)
    np.testing.assert_array_equal(sigma, sigma2)


def test_prdc_vs_reference_formulas():
    """Independent numpy/sklearn formulation (sfd-main/prdc.py:29-124)."""
    import sklearn.metrics

    rng = np.random.RandomState(2)
    real = rng.randn(80, 12).astype(np.float32)
    fake = (rng.randn(80, 12) * 1.2 + 0.3).astype(np.float32)
    k = 5
    ours = compute_prdc(real, fake, k)

    def knn(feats):
        d = sklearn.metrics.pairwise_distances(feats, feats)
        idx = np.argpartition(d, k + 1, axis=-1)[..., : k + 1]
        return np.take_along_axis(d, idx, axis=-1).max(axis=-1)

    rr, fr = knn(real), knn(fake)
    drf = sklearn.metrics.pairwise_distances(real, fake)
    assert abs(ours["precision"] - (drf < rr[:, None]).any(0).mean()) < 1e-6
    assert abs(ours["recall"] - (drf < fr[None, :]).any(1).mean()) < 1e-6
    assert abs(ours["density"] - (1 / k) * (drf < rr[:, None]).sum(0).mean()) < 1e-5
    assert abs(ours["coverage"] - (drf.min(1) < rr).mean()) < 1e-6


def test_prdc_perfect_overlap():
    rng = np.random.RandomState(3)
    feats = rng.randn(60, 8).astype(np.float32)
    out = compute_prdc(feats, feats.copy(), 3)
    assert out["precision"] == 1.0 and out["recall"] == 1.0
    assert out["coverage"] == 1.0


@pytest.mark.slow
def test_inception_shapes_and_pipeline():
    net = InceptionV3FID()
    imgs = (np.random.RandomState(0).rand(2, 32, 32, 3) * 255).astype(np.uint8)
    params = net.init(jax.random.key(0), jnp.asarray(imgs))["params"]
    feats = net.apply({"params": params}, jnp.asarray(imgs))
    assert feats.shape == (2, 2048)
    assert bool(jnp.isfinite(feats).all())

    def feature_fn(batch):
        return net.apply({"params": params}, jnp.asarray(batch))

    mu, sigma = calculate_stats(feature_fn, [imgs, imgs], feature_dim=2048)
    assert mu.shape == (2048,) and sigma.shape == (2048, 2048)


def _write_images(root, n, res=8, labels=None):
    import PIL.Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    names = []
    for i in range(n):
        name = f"img{i:03d}.png"
        PIL.Image.fromarray(
            (rng.rand(res, res, 3) * 255).astype(np.uint8)).save(
            os.path.join(root, name))
        names.append(name)
    if labels is not None:
        import json

        with open(os.path.join(root, "dataset.json"), "w") as f:
            json.dump({"labels": [[n_, l] for n_, l in zip(names, labels)]}, f)


def test_dataset_dir_and_zip(tmp_path):
    root = str(tmp_path / "imgs")
    _write_images(root, 7, labels=[i % 3 for i in range(7)])
    ds = ImageFolderDataset(root, use_labels=True)
    assert len(ds) == 7 and ds.label_dim == 3
    img, label = ds[0]
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    assert label.shape == (3,) and label.sum() == 1.0

    zpath = str(tmp_path / "imgs.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for f in os.listdir(root):
            zf.write(os.path.join(root, f), f)
    dz = ImageFolderDataset(zpath, use_labels=True)
    assert len(dz) == 7
    np.testing.assert_array_equal(dz[3][0], ds[3][0])

    # max_size subset + xflip doubling
    dsub = ImageFolderDataset(root, max_size=4, xflip=True)
    assert len(dsub) == 8
    np.testing.assert_array_equal(dsub[4][0], dsub[0][0][:, ::-1])

    # batching with shards covers every item exactly once
    seen = 0
    for shard in range(2):
        for imgs, _ in ds.batches(3, shard_index=shard, num_shards=2):
            seen += imgs.shape[0]
    assert seen == 7


def test_clip_score_math():
    # orthogonal embeddings -> 0; identical -> 100
    def img_fn(images):
        return np.asarray([[1.0, 0.0], [0.0, 1.0]], np.float32)

    def txt_same(prompts):
        return np.asarray([[2.0, 0.0], [0.0, 3.0]], np.float32)

    def txt_orth(prompts):
        return np.asarray([[0.0, 5.0], [4.0, 0.0]], np.float32)

    imgs = np.zeros((2, 4, 4, 3), np.uint8)
    assert abs(clip_score(img_fn, txt_same, [(imgs, ["a", "b"])]) - 100.0) < 1e-5
    assert abs(clip_score(img_fn, txt_orth, [(imgs, ["a", "b"])])) < 1e-5


@pytest.mark.slow
def test_hf_clip_encoders_if_available():
    """Gated hook for the reference's real OpenCLIP ViT-g-14 scoring path
    (`diff-solvers-main/clip_score.py:59`): runs only when the HF checkpoint
    is cached/downloadable (the offline env cannot fetch it)."""
    from diff_sampler_tpu.eval.clip_score import make_hf_clip_encoders

    try:
        img_fn, txt_fn = make_hf_clip_encoders()
    except RuntimeError as e:
        pytest.skip(f"CLIP checkpoint unavailable: {e}")
    imgs = np.random.RandomState(0).randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    score = clip_score(img_fn, txt_fn, [(imgs, ["a photo", "a drawing"])])
    assert np.isfinite(score)
