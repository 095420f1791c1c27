"""Precision / Recall / Density / Coverage over feature manifolds.

Rebuilds `sfd-main/prdc.py:29-124` with the pairwise-distance and kNN-radius
computation on device (chunked matmul-based distances ride the MXU instead of
sklearn's CPU `pairwise_distances`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pairwise_distances", "knn_radii", "compute_prdc"]


def pairwise_distances(x: np.ndarray, y: np.ndarray = None,
                       chunk: int = 4096) -> np.ndarray:
    """Euclidean distance matrix [N, M], computed in chunks on device."""
    if y is None:
        y = x
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    y_sq = jnp.sum(y**2, axis=1)

    @jax.jit
    def block(xc):
        x_sq = jnp.sum(xc**2, axis=1)
        d2 = x_sq[:, None] - 2.0 * (xc @ y.T) + y_sq[None, :]
        return jnp.sqrt(jnp.maximum(d2, 0.0))

    out = np.empty((x.shape[0], y.shape[0]), np.float32)
    for s in range(0, x.shape[0], chunk):
        out[s : s + chunk] = np.asarray(block(x[s : s + chunk]))
    return out


def _kth_value(unsorted: np.ndarray, k: int) -> np.ndarray:
    indices = np.argpartition(unsorted, k, axis=-1)[..., :k]
    return np.take_along_axis(unsorted, indices, axis=-1).max(axis=-1)


def knn_radii(features: np.ndarray, nearest_k: int) -> np.ndarray:
    """Distance to the k-th nearest neighbour (self included then skipped:
    k+1 smallest, prdc.py:57-67)."""
    return _kth_value(pairwise_distances(features), nearest_k + 1)


def compute_prdc(real_features: np.ndarray, fake_features: np.ndarray,
                 nearest_k: int, realism: bool = False) -> Dict[str, float]:
    """prdc.py:71-124."""
    real_r = knn_radii(real_features, nearest_k)
    fake_r = knn_radii(fake_features, nearest_k)
    d_rf = pairwise_distances(real_features, fake_features)

    precision = float((d_rf < real_r[:, None]).any(axis=0).mean())
    recall = float((d_rf < fake_r[None, :]).any(axis=1).mean())
    density = float((1.0 / nearest_k) * (d_rf < real_r[:, None]).sum(axis=0).mean())
    coverage = float((d_rf.min(axis=1) < real_r).mean())
    out = dict(precision=precision, recall=recall, density=density,
               coverage=coverage)
    if realism:
        mask = real_r < np.median(real_r)
        out["realism"] = (real_r[mask, None] / d_rf[mask]).max(axis=0)
    return out
