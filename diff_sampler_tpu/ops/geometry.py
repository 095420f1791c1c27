"""Trajectory geometry utilities (GITS + diff-analyzer).

Reference: `gits-main/gits_utils.py:237-255` (cal_deviation, duplicated at
`diff-analyzer-main/utils.py:251-269`) and the analyzer's curvature/torsion
notebook cells.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["trajectory_deviation", "trajectory_lengths", "trajectory_curvature"]


def _flat(v):
    return v.reshape(v.shape[0], v.shape[1], -1)


def trajectory_deviation(traj: jnp.ndarray) -> jnp.ndarray:
    """Perpendicular distance of intermediate points from the line
    (start -> end).

    traj: [T, B, ...] sampling trajectory.
    Returns [B, T-2]: deviation of each intermediate point per sample.
    """
    t = jnp.swapaxes(traj, 0, 1)  # [B, T, ...]
    b = t.shape[0]
    a = _flat(t[:, 1:-1])               # [B, T-2, D] intermediates
    start = _flat(t[:, :1])             # [B, 1, D]
    end = _flat(t[:, -1:])              # [B, 1, D]
    ac = end - a
    bc = end - start
    bc_unit = bc / jnp.linalg.norm(bc, axis=-1, keepdims=True)
    proj = jnp.sum(ac * bc_unit, axis=-1, keepdims=True) * bc_unit
    perp = ac - proj
    return jnp.linalg.norm(perp, axis=-1)


def trajectory_lengths(traj: jnp.ndarray) -> jnp.ndarray:
    """[B, T-1] Euclidean lengths of each trajectory segment."""
    t = jnp.swapaxes(traj, 0, 1)
    seg = _flat(t[:, 1:]) - _flat(t[:, :-1])
    return jnp.linalg.norm(seg, axis=-1)


def trajectory_curvature(traj: jnp.ndarray) -> jnp.ndarray:
    """[B, T-2] discrete curvature: angle between consecutive segments
    divided by mean segment length (analyzer notebook metric)."""
    t = jnp.swapaxes(traj, 0, 1)
    x = _flat(t)
    d1 = x[:, 1:] - x[:, :-1]
    a, b = d1[:, :-1], d1[:, 1:]
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    cos = jnp.clip(jnp.sum(a * b, axis=-1) / (na * nb + 1e-12), -1.0, 1.0)
    return jnp.arccos(cos) / (0.5 * (na + nb) + 1e-12)
