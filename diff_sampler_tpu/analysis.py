"""Trajectory-geometry analysis toolbox (the diff-analyzer subproject).

Rebuilds `diff-analyzer-main/` as a library (the reference ships notebooks,
`main_mp.ipynb` / `main_extend.ipynb`; see scripts/analyze_trajectories.py
for the runnable equivalent):

  * implicit denoising trajectory (the analyzer's return_denoised capture,
    `diff-analyzer-main/solvers.py:33-773`): derivable from (xs, eps) as
    denoised_i = x_i - t_i * d_i,
  * optimal sampler: any sampler over `DatasetPosteriorDenoiser`
    (models/analytic.py; `solvers.py:20-31,774-867`),
  * geometry statistics over trajectories: magnitude, deviation from the
    start->end line, segment lengths, direction cosines, deviation-to-optima,
    and curvature/torsion of PCA-projected trajectories
    (`gits_utils.py:237-255`, notebook cells).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.analytic import DatasetPosteriorDenoiser
from .ops.geometry import (trajectory_curvature, trajectory_deviation,
                           trajectory_lengths)

__all__ = [
    "denoised_trajectory",
    "trajectory_magnitude",
    "direction_cosines",
    "deviation_to_reference",
    "pca_project",
    "discrete_curvature_torsion",
    "trajectory_report",
    "optimal_denoiser_from_images",
]


def denoised_trajectory(xs, eps, t_steps):
    """Implicit denoising trajectory: denoised_i = x_i - t_i * d_i.

    xs: [T, B, ...] states (xs[0] initial); eps: [T-1, B, ...] gradients.
    Returns [T-1, B, ...]."""
    t = jnp.asarray(np.asarray(t_steps), xs.dtype)
    t = t[: eps.shape[0]].reshape(-1, *([1] * (xs.ndim - 1)))
    return xs[:-1] - t * eps


def trajectory_magnitude(traj) -> jnp.ndarray:
    """[B, T] L2 norm of each state (the notebook 'magnitude' experiment)."""
    t = jnp.swapaxes(traj, 0, 1)
    return jnp.linalg.norm(t.reshape(t.shape[0], t.shape[1], -1), axis=-1)


def direction_cosines(traj) -> jnp.ndarray:
    """[B, T-2] cosine similarity between consecutive step directions."""
    t = jnp.swapaxes(traj, 0, 1)
    x = t.reshape(t.shape[0], t.shape[1], -1)
    d = x[:, 1:] - x[:, :-1]
    a, b = d[:, :-1], d[:, 1:]
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-12
    return num / den


def deviation_to_reference(traj, ref_traj) -> jnp.ndarray:
    """[B, T] distance between corresponding states of two trajectories
    (e.g. solver trajectory vs the optimal-denoiser trajectory)."""
    a = jnp.swapaxes(traj, 0, 1)
    b = jnp.swapaxes(ref_traj, 0, 1)
    d = (a - b).reshape(a.shape[0], a.shape[1], -1)
    return jnp.linalg.norm(d, axis=-1)


def pca_project(traj, k: int = 3) -> np.ndarray:
    """Project each sample's trajectory into its own top-k PCA subspace.

    traj: [T, B, ...] -> [B, T, k] (the analyzer projects before computing
    curvature/torsion)."""
    t = np.swapaxes(np.asarray(traj), 0, 1)
    x = t.reshape(t.shape[0], t.shape[1], -1).astype(np.float64)
    out = np.empty((x.shape[0], x.shape[1], k))
    for i in range(x.shape[0]):
        c = x[i] - x[i].mean(0)
        _u, _s, vt = np.linalg.svd(c, full_matrices=False)
        out[i] = c @ vt[:k].T
    return out


def discrete_curvature_torsion(traj3d: np.ndarray) -> Dict[str, np.ndarray]:
    """Discrete Frenet curvature and torsion of [B, T, 3] curves."""
    d1 = np.diff(traj3d, axis=1)          # [B, T-1, 3]
    d2 = np.diff(d1, axis=1)              # [B, T-2, 3]
    d3 = np.diff(d2, axis=1)              # [B, T-3, 3]
    cross = np.cross(d1[:, :-1], d2)      # [B, T-2, 3]
    num_k = np.linalg.norm(cross, axis=-1)
    den_k = np.linalg.norm(d1[:, :-1], axis=-1) ** 3 + 1e-12
    curvature = num_k / den_k
    triple = np.einsum("btk,btk->bt", cross[:, :-1], d3)
    torsion = triple / (np.linalg.norm(cross[:, :-1], axis=-1) ** 2 + 1e-12)
    return {"curvature": curvature, "torsion": torsion}


def trajectory_report(xs, eps=None, t_steps=None,
                      ref_xs=None) -> Dict[str, np.ndarray]:
    """Batch-mean geometry statistics of a sampling trajectory (the
    main_mp.ipynb experiment set)."""
    out = {
        "magnitude": np.asarray(trajectory_magnitude(xs).mean(0)),
        "deviation": np.asarray(trajectory_deviation(xs).mean(0)),
        "segment_lengths": np.asarray(trajectory_lengths(xs).mean(0)),
        "direction_cosine": np.asarray(direction_cosines(xs).mean(0)),
        "curvature": np.asarray(trajectory_curvature(xs).mean(0)),
    }
    if eps is not None and t_steps is not None:
        den = denoised_trajectory(xs, eps, t_steps)
        out["denoised_magnitude"] = np.asarray(trajectory_magnitude(den).mean(0))
    if ref_xs is not None:
        out["deviation_to_reference"] = np.asarray(
            deviation_to_reference(xs, ref_xs).mean(0))
    p3 = pca_project(xs, 3)
    ct = discrete_curvature_torsion(p3)
    out["pca_curvature"] = ct["curvature"].mean(0)
    out["pca_torsion"] = ct["torsion"].mean(0)
    return out


def optimal_denoiser_from_images(images_uint8: np.ndarray,
                                 sigma_min=0.002, sigma_max=80.0):
    """Dataset-posterior ('optimal') denoiser from uint8 NHWC images,
    normalized to [-1, 1] like the sampling pipeline."""
    data = np.asarray(images_uint8, np.float32) / 127.5 - 1.0
    return DatasetPosteriorDenoiser(jnp.asarray(data), sigma_min=sigma_min,
                                    sigma_max=sigma_max)
