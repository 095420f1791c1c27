"""Frechet Inception Distance, TPU-native.

Rebuilds `diff-solvers-main/fid.py`:
  * streaming feature moments: per-batch f32 sums on device (the matmul
    X^T X rides the MXU), accumulated in float64 on host -- numerically
    equivalent to the reference's float64 on-device accumulation
    (fid.py:61-71),
  * cross-device reduction by jit over the data-sharded batch (replaces
    all_reduce, fid.py:74-75),
  * Frechet distance with scipy.linalg.sqrtm on host (fid.py:83-87),
  * reference-stat .npz compatibility (keys mu/sigma).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

__all__ = ["FIDAccumulator", "compute_fid", "calculate_stats",
           "load_stats", "save_stats", "make_inception_feature_fn"]


@dataclasses.dataclass
class FIDAccumulator:
    """Streaming mu/sigma accumulation (float64 host totals)."""

    feature_dim: int = 2048

    def __post_init__(self):
        self.raw_mu = np.zeros(self.feature_dim, np.float64)
        self.raw_sigma = np.zeros((self.feature_dim, self.feature_dim), np.float64)
        self.n = 0

    def update(self, features) -> None:
        """features: [B, D] (device or host array)."""
        f_sum, outer = _batch_moments(jnp.asarray(features))
        self.raw_mu += np.asarray(f_sum, np.float64)
        self.raw_sigma += np.asarray(outer, np.float64)
        self.n += features.shape[0]

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        """(mu, sigma) with the reference's (n-1) normalization (fid.py:76-78)."""
        if self.n < 2:
            raise ValueError("need at least 2 samples for FID statistics")
        mu = self.raw_mu / self.n
        sigma = (self.raw_sigma - np.outer(mu, mu) * self.n) / (self.n - 1)
        return mu, sigma


@jax.jit
def _batch_moments(features):
    f = features.astype(jnp.float32)
    return f.sum(axis=0), f.T @ f


def compute_fid(mu: np.ndarray, sigma: np.ndarray, mu_ref: np.ndarray,
                sigma_ref: np.ndarray) -> float:
    """Frechet distance (fid.py:83-87)."""
    m = np.square(mu - mu_ref).sum()
    s = scipy.linalg.sqrtm(np.dot(sigma, sigma_ref))
    if isinstance(s, tuple):  # older scipy returns (sqrtm, errest)
        s = s[0]
    return float(np.real(m + np.trace(sigma + sigma_ref - s * 2)))


def calculate_stats(feature_fn: Callable, batches: Iterable,
                    feature_dim: int = 2048) -> Tuple[np.ndarray, np.ndarray]:
    """Accumulate (mu, sigma) over an iterable of uint8 NHWC image batches."""
    acc = FIDAccumulator(feature_dim)
    for images in batches:
        if images.shape[0] == 0:
            continue
        if images.shape[-1] == 1:  # grayscale -> RGB (fid.py:65-66)
            images = np.repeat(images, 3, axis=-1)
        acc.update(feature_fn(images))
    return acc.finalize()


def save_stats(path: str, mu: np.ndarray, sigma: np.ndarray) -> None:
    np.savez(path, mu=mu, sigma=sigma)


def load_stats(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with np.load(path) as f:
        return f["mu"], f["sigma"]


def make_inception_feature_fn(params, mesh=None) -> Callable:
    """jitted uint8 NHWC images -> [B, 2048] features (data-sharded when a
    mesh is given)."""
    from .inception import InceptionV3FID

    net = InceptionV3FID()

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P("data", None, None, None))
        fn = jax.jit(lambda imgs: net.apply({"params": params}, imgs),
                     in_shardings=shard)
    else:
        fn = jax.jit(lambda imgs: net.apply({"params": params}, imgs))
    return fn
