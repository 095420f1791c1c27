"""Export a trained AMED predictor as static per-step schedules.

The reference ships a diffusers `DPMSolverMultistepScheduler` subclass that
consumes AMED r/scale lists for SD/SDXL
(`amed-solver-main/diffusers_amed_plugin_dpmpp.py:27-439`).  The TPU-native
framework samples with the predictor in-graph (solvers/amed.py), so the
equivalent integration surface is this exporter: it distills the predictor's
outputs into the interleaved timestep list + scale_dirs/scale_times the
reference plugin expects (set_timesteps semantics: odd-indexed entries are
the AMED-inserted midpoints), so diffusers users can consume a TPU-trained
predictor without running JAX.
"""

from __future__ import annotations

import json
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import get_schedule

__all__ = ["export_amed_schedule", "save_amed_schedule"]


def export_amed_schedule(predictor_apply, denoise_b, sample_shape,
                         num_steps: int, sigma_min: float, sigma_max: float,
                         *, schedule_type: str = "polynomial",
                         schedule_rho: float = 7.0,
                         alphas_cumprod: Optional[np.ndarray] = None,
                         seeds: Sequence[int] = range(16)) -> Dict:
    """Run the AMED sampler over a probe batch and average the predictor
    outputs per step.

    Returns {sigmas, r, scale_dir, scale_time, t_mid, timesteps?}: sigmas is
    the base schedule, t_mid the learned midpoints; with alphas_cumprod given
    (a discrete model's table), `timesteps` is the interleaved 2N-1 index
    list for the reference diffusers plugin.
    """
    from ..solvers.amed import _amed_family
    from ..utils.rng import stacked_randn

    t_steps = get_schedule(num_steps, sigma_min, sigma_max, schedule_type,
                           schedule_rho)
    latents = stacked_randn(jnp.asarray(list(seeds)), tuple(sample_shape))

    rs, sds, sts = [], [], []
    x = latents * float(t_steps[0])
    buffers = ([], [])
    for i in range(num_steps - 1):
        seg = t_steps[i : i + 2]
        res, buffers, (r, sd, st) = _amed_family(
            denoise_b, predictor_apply, x / float(seg[0]), seg, mode="amed",
            train=True, step_idx=i, total_num_steps=num_steps)
        x = jax.lax.stop_gradient(res.x)
        rs.append(float(jnp.mean(r)))
        sds.append(float(jnp.mean(sd)))
        sts.append(float(jnp.mean(st)))

    t = np.asarray(t_steps)
    r = np.asarray(rs)
    t_mid = t[1:] ** r * t[:-1] ** (1.0 - r)
    out = dict(sigmas=t.tolist(), r=r.tolist(), scale_dir=sds, scale_time=sts,
               t_mid=t_mid.tolist(), num_steps=num_steps,
               schedule_type=schedule_type, schedule_rho=schedule_rho)

    # Interleaved per-step lists in the plugin's indexing: the scheduler
    # applies scale_dirs[step_index] at EVERY interleaved step and shifts
    # odd-indexed eval times by scale_times (diffusers_amed_plugin_dpmpp.py
    # :54-58, :433).  Even entries (the base-schedule steps) are identity.
    n_inter = 2 * (num_steps - 1) + 1
    sd_inter = np.ones(n_inter)
    st_inter = np.ones(n_inter)
    sd_inter[1::2] = np.asarray(sds)
    st_inter[1::2] = np.asarray(sts)
    out["scale_dirs_interleaved"] = sd_inter.tolist()
    out["scale_times_interleaved"] = st_inter.tolist()

    if alphas_cumprod is not None:
        # interleave (t_i, t_mid_i) and map to nearest discrete indices
        all_sigmas = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)
        inter = np.empty(n_inter)
        inter[0::2] = t
        inter[1::2] = t_mid
        idx = [int(np.abs(all_sigmas - s).argmin()) for s in inter]
        out["timesteps"] = idx
    return out


def save_amed_schedule(path: str, schedule: Dict) -> None:
    with open(path, "w") as f:
        json.dump(schedule, f, indent=2)
