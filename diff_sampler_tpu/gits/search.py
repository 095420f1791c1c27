"""GITS: DP-based time-schedule search (ICML 2024).

Rebuilds `gits-main/gits_utils.py:42-232` TPU-first:

  * teacher trajectory + eps capture: one scan-based sampler run with
    return_inters (the reference's warmup loop, gits_utils.py:59-110),
  * cost matrix: cost[i,j] = mean error of a single Euler jump i->j vs the
    teacher state at j -- vectorized per source-row on device
    (replaces the O(N^2) Python double loop, gits_utils.py:115-132); batch
    means across data-sharded devices are handled by XLA,
  * DP shortest path + backtracking on host numpy (gits_utils.py:185-232),
  * optional AFS insertion search: try each candidate free step, keep the
    min-L2-to-teacher-terminal schedule (gits_utils.py:157-179).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import get_schedule
from ..ops.geometry import trajectory_deviation
from ..solvers import get_sampler
from ..utils.rng import stacked_randn

__all__ = ["GITSConfig", "compute_cost_matrix", "dp_search", "gits_schedule"]


@dataclasses.dataclass(frozen=True)
class GITSConfig:
    """GITS_FLAGS of the reference CLI (`gits-main/sample.py:159-166`)."""

    num_steps: int = 6  # student schedule length (num_steps-1 jumps)
    num_steps_tea: int = 61
    num_warmup: int = 256
    solver_tea: str = "ipndm"
    solver: str = "ipndm"
    metric: str = "dev"  # l1 | l2 | dev
    coeff: float = 1.15
    schedule_type: str = "polynomial"
    schedule_rho: float = 7.0
    max_order: int = 4
    afs: bool = False
    batch_size: int = 64


def compute_cost_matrix(traj, eps, t_steps, metric: str) -> jnp.ndarray:
    """cost[i, j] (j > i): batch-mean error of the Euler jump i->j.

    traj: [N, B, ...] teacher states (traj[0] = initial x).
    eps:  [N-1, B, ...] teacher gradients d_i at each state.
    """
    n = traj.shape[0]
    t = jnp.asarray(np.asarray(t_steps), traj.dtype)

    if metric == "dev":
        dev_tea = trajectory_deviation(traj).mean(axis=0)  # [N-2]
        dev_tea = jnp.concatenate([dev_tea, jnp.zeros((1,), traj.dtype)])  # [N-1]
        start, end = traj[0], traj[-1]

    def row(i):
        x_cur, d_cur = traj[i], eps[i]
        # x_next[j] = x_cur + (t[j] - t[i]) * d_cur, all j at once
        dt = (t - t[i]).reshape(-1, *([1] * x_cur.ndim))
        x_next = x_cur[None] + dt * d_cur[None]  # [N, B, ...]
        diff = (x_next - traj).reshape(n, traj.shape[1], -1)
        if metric == "l1":
            c = jnp.abs(diff).sum(axis=-1).mean(axis=-1)
        elif metric == "l2":
            c = jnp.linalg.norm(diff, axis=-1).mean(axis=-1)
        elif metric == "dev":
            # deviation of x_next[j] from the line start->end, minus the
            # teacher's deviation at j (gits_utils.py:127-131)
            flat = lambda v: v.reshape(v.shape[0], v.shape[1], -1)
            a = flat(x_next)
            bc = flat(end[None]) - flat(start[None])  # [1, B, D]
            bc_unit = bc / jnp.linalg.norm(bc, axis=-1, keepdims=True)
            ac = flat(end[None]) - a
            proj = jnp.sum(ac * bc_unit, axis=-1, keepdims=True) * bc_unit
            dev_stu = jnp.linalg.norm(ac - proj, axis=-1)  # [N, B]
            # teacher deviation index j-1; gather with clamp (masked below)
            idx = jnp.clip(jnp.arange(n) - 1, 0, n - 2)
            c = (dev_stu - dev_tea[idx][:, None]).mean(axis=-1)
        else:
            raise NotImplementedError(f"Unknown metric: {metric}")
        mask = jnp.arange(n) > i
        return jnp.where(mask, c, 0.0)

    rows = jax.lax.map(row, jnp.arange(n - 1))  # [N-1, N]
    return jnp.concatenate([rows, jnp.zeros((1, n), rows.dtype)], axis=0)


def dp_search(cost_mat: np.ndarray, num_steps: int, num_steps_tea: int,
              coeff: float) -> list:
    """DP shortest path V[j][k] = min_i cost[j][i] + coeff * V[i][k-1] with
    first-match backtracking (gits_utils.py:185-212)."""
    K = num_steps - 1
    V = np.full((num_steps_tea, K + 1), np.inf)
    for i in range(num_steps_tea):
        V[i][1] = cost_mat[i][-1]
    for k in range(2, K + 1):
        for j in range(num_steps_tea - 1):
            for i in range(j + 1, num_steps_tea - 1):
                V[j][k] = min(V[j][k], cost_mat[j][i] + coeff * V[i][k - 1])
    phi, w = [0], 0
    for temp in range(K):
        k = K - temp
        for j in range(w + 1, num_steps_tea):
            if V[w][k] == cost_mat[w][j] + coeff * V[j][k - 1]:
                phi.append(j)
                w = j
                break
    phi.append(num_steps_tea - 1)
    return phi


def dp_search_multi(cost_mat: np.ndarray, num_steps: int, num_steps_tea: int,
                    coeffs: Sequence[float] = (0.8, 0.85, 0.9, 0.95, 1.0, 1.05,
                                               1.10, 1.15, 1.2),
                    dump_path: Optional[str] = None, desc: str = "",
                    t_steps: Optional[np.ndarray] = None) -> dict:
    """Multi-coefficient DP table (the reference's ms_coco `dp_record.txt`
    dump, gits_utils.py:214-231): {(coeff, K): phi}.  With dump_path, appends
    the schedules to a text file in the reference's format."""
    out = {}
    for coeff in coeffs:
        for K_temp in range(2, num_steps):
            out[(coeff, K_temp)] = dp_search(cost_mat, K_temp + 1,
                                             num_steps_tea, coeff)
    if dump_path is not None:
        with open(dump_path, "a") as f:
            for coeff in coeffs:
                f.write(f"{desc}-{coeff}\n")
                for K_temp in range(2, num_steps):
                    phi = out[(coeff, K_temp)]
                    if t_steps is not None:
                        f.write(f"{phi} {[round(float(t_steps[i]), 4) for i in phi]}\n")
                    else:
                        f.write(f"{phi}\n")
    return out


def gits_schedule(denoise, sample_shape: Tuple[int, ...], cfg: GITSConfig,
                  *, seeds: Optional[Sequence[int]] = None,
                  sigma_fn=None, sigma_inv_fn=None,
                  per_seed_cond: Optional[np.ndarray] = None,
                  denoise_with_cond=None,
                  return_cost: bool = False,
                  jit_params=None, bind_params=None):
    """Run the full GITS search; returns (dp_list, t_steps[dp_list]).

    denoise: bound denoiser.  sample_shape: per-sample NHWC shape.

    Conditioned models (SD captions): pass `per_seed_cond` (one conditioning
    row per warmup seed, e.g. caption embeddings) plus
    `denoise_with_cond(x, t, c)` -- the warmup trajectories then run with
    per-sample conditioning like the reference's dp search
    (`gits-main/gits_utils.py:63-110` samples captions per warmup round).

    jit_params/bind_params: route a big frozen param tree as a jit ARGUMENT
    through the warmup-capture jit (same contract as sampling.generate --
    closure constants >1 GB stall the axon remote compile).  The AFS
    insertion search still closes over params; pass afs=False for the
    274M+ latent tiers on the axon backend.
    """
    t_full = get_schedule(cfg.num_steps_tea, denoise.sigma_min, denoise.sigma_max,
                          cfg.schedule_type, cfg.schedule_rho,
                          sigma_fn=sigma_fn, sigma_inv_fn=sigma_inv_fn)
    tea = get_sampler(cfg.solver_tea)
    if seeds is None:
        seeds = range(cfg.num_warmup)
    seeds = np.asarray(list(seeds), dtype=np.int64)
    conditioned = per_seed_cond is not None and denoise_with_cond is not None

    def _den_for(c):
        if c is None:
            return denoise
        from ..models.precond import BoundDenoiser

        return BoundDenoiser(lambda x, t: denoise_with_cond(x, t, c),
                             denoise.sigma_min, denoise.sigma_max)

    @jax.jit
    def capture_and_cost(latents, cond=None, p=None):
        if jit_params is not None:
            bind_params(p)
        out = tea(_den_for(cond), latents, t_full, return_inters=True,
                  max_order=cfg.max_order)
        return compute_cost_matrix(out.xs, out.eps, t_full, cfg.metric), out.xs[-1]

    cost_sum = np.zeros((cfg.num_steps_tea, cfg.num_steps_tea))
    rounds = 0
    terminal_states = []
    latents_last = None
    cond_last = None
    for start in range(0, len(seeds), cfg.batch_size):
        chunk = seeds[start : start + cfg.batch_size]
        latents_last = stacked_randn(jnp.asarray(chunk), sample_shape)
        if conditioned:
            cond_last = jnp.asarray(per_seed_cond[start : start + len(chunk)])
            c, term = capture_and_cost(latents_last, cond_last, jit_params)
        else:
            c, term = capture_and_cost(latents_last, None, jit_params)
        cost_sum += np.asarray(c, dtype=np.float64)
        terminal_states.append(np.asarray(term))
        rounds += 1
    cost_mat = cost_sum / rounds

    phi = dp_search(cost_mat, cfg.num_steps, cfg.num_steps_tea, cfg.coeff)
    dp_list = phi

    if cfg.afs:
        # AFS insertion search on the last warmup batch (gits_utils.py:157-179).
        # All candidates share one compile: for the LMS family the schedule
        # and its host-precomputed coefficient stack enter the jit as traced
        # arguments (candidate shapes are identical).
        from ..ops import multistep
        from ..solvers.samplers import _lms_sample

        lms_coeffs = {
            "euler": lambda t: multistep.euler_coeffs(t),
            "ipndm": lambda t: multistep.ipndm_coeffs(t, cfg.max_order),
            "ipndm_v": lambda t: multistep.ipndm_v_coeffs(t, cfg.max_order),
            "deis": lambda t: multistep.deis_coeffs(t, cfg.max_order),
        }
        teacher_terminal = jnp.asarray(terminal_states[-1])
        best = np.inf
        # candidate runs share the last warmup batch's conditioning
        den_afs = _den_for(cond_last)

        if cfg.solver in lms_coeffs:
            run = jax.jit(lambda lat, t, C: _lms_sample(
                den_afs, lat, t, C, afs=True).x)

            def student_out(t_cand):
                C = np.asarray(lms_coeffs[cfg.solver](t_cand))
                return run(latents_last, jnp.asarray(t_cand), jnp.asarray(C))
        elif cfg.solver in ("dpmpp", "unipc"):
            # same single-compile trick: the coefficient dataclasses are
            # registered pytrees, so the whole stack enters as traced args
            stu = get_sampler(cfg.solver)
            # dpmpp/unipc cap at order 3 (gits sample.py:142 documents the
            # per-family ranges); GITSConfig's default 4 is the LMS convention
            mo = min(cfg.max_order or 3, 3)
            run = jax.jit(lambda lat, t, co: stu(
                den_afs, lat, t, afs=True, max_order=mo, coeffs=co).x)

            def student_out(t_cand):
                co = (multistep.dpm_pp_coeffs(t_cand, mo)
                      if cfg.solver == "dpmpp"
                      else multistep.unipc_coeffs(t_cand, mo))
                co = jax.tree.map(jnp.asarray, co)
                return run(latents_last, jnp.asarray(t_cand), co)
        else:
            stu = get_sampler(cfg.solver)

            def student_out(t_cand):
                return jax.jit(lambda lat, t=t_cand: stu(
                    den_afs, lat, t, afs=True,
                    max_order=cfg.max_order).x)(latents_last)

        for k in range(1, phi[1]):
            cand = phi[:1] + [k] + phi[1:]
            t_cand = t_full[np.asarray(cand)]
            out = student_out(t_cand)
            d = float(jnp.linalg.norm(
                (out - teacher_terminal).reshape(out.shape[0], -1), axis=-1).mean())
            if d < best:
                best = d
                dp_list = cand

    t_steps = t_full[np.asarray(dp_list)]
    if return_cost:
        return dp_list, t_steps, cost_mat
    return dp_list, t_steps
