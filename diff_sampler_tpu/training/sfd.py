"""SFD: Simple and Fast Distillation of diffusion models (NeurIPS 2024).

Rebuilds `sfd-main/training/loss.py` + `training/training_loop.py:132-368` as
a single jitted training program:

  * teacher trajectory: the frozen teacher net runs the FULL fine schedule of
    (M+1)*(num_steps-1)+1 points with the default DPM-Solver++(3M) sampler,
    captured with return_inters and sliced at the student knots
    i*(M+1) (loss.py:94-130),
  * student: one Euler step per segment [t_i -> t_{i+1}] on the trainable
    net; loss = |student - teacher| (L1), per-step backprop with the next
    input being the DETACHED student output (training_loop.py:269-283),
  * the whole per-trajectory loop (num_steps-1 sequential optimizer updates)
    is ONE `lax.scan` over steps inside ONE jit -- teacher capture, student
    forward/backward, nan_to_num on grads (training_loop.py:292-294), and the
    AFS step-0 skip (training_loop.py:282,291) included,
  * SFD-v: `num_steps` is randomized in [4,7] per trajectory
    (training_loop.py:239-244) -- each num_steps value is its own jitted
    program (static shapes), selected per iteration on host,
  * data-parallel: params replicated, batch sharded over the 'data' mesh
    axis; XLA inserts the gradient psum (replaces DDP, training_loop.py:214).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.precond import bind
from ..ops import get_schedule
from ..solvers import get_sampler

__all__ = ["SFDConfig", "make_train_step", "teacher_slice_indices"]


@dataclasses.dataclass(frozen=True)
class SFDConfig:
    """Distillation hyperparameters (sfd-main/train.py:15-156 defaults)."""

    num_steps: int = 4
    M: int = 3
    sampler_tea: str = "dpmpp"
    schedule_type: str = "polynomial"
    schedule_rho: float = 7.0
    afs: bool = False
    max_order: int = 3
    predict_x0: bool = True
    lower_order_final: bool = True
    use_step_condition: bool = False  # SFD-v
    is_second_stage: bool = False
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    # Training memory: pass remat=True in the model_kwargs (SongUNet /
    # DhariwalUNet block-granular nn.remat) -- the TPU analogue of the
    # reference's fp16 + small-batch memory management (SURVEY.md 7 #3).


def teacher_slice_indices(num_steps: int, M: int) -> list:
    """Indices of student knots inside the fine teacher trajectory
    (loss.py:96-97)."""
    return [i * (M + 1) for i in range(1, num_steps)]


def make_train_step(precond, cfg: SFDConfig, optimizer: optax.GradientTransformation,
                    lpips_fn=None):
    """Build the jittable per-trajectory training step.

    precond: the EDMPrecond flax module (trainable student AND frozen teacher
    share the architecture; the teacher holds its own frozen params copy,
    training_loop.py:187).
    lpips_fn: optional (a, b) -> [B] perceptual distance, added at the final
    step of second-stage distillation (loss.py:87-88,130-135).

    Returns train_step(params, opt_state, teacher_params, latents, labels, key)
      -> (params, opt_state, metrics)
    where latents ~ N(0, 1) of shape [B, H, W, C] (scaled by sigma_max
    internally, matching training_loop.py:247).
    """
    t_steps = get_schedule(cfg.num_steps, cfg.sigma_min, cfg.sigma_max,
                           cfg.schedule_type, cfg.schedule_rho)
    n_tea = (cfg.M + 1) * (cfg.num_steps - 1) + 1
    tea_t = get_schedule(n_tea, cfg.sigma_min, cfg.sigma_max,
                         cfg.schedule_type, cfg.schedule_rho)
    tea_idx = np.asarray(teacher_slice_indices(cfg.num_steps, cfg.M))
    tea_sampler = get_sampler("euler" if cfg.is_second_stage else cfg.sampler_tea)
    step_cond = float(cfg.num_steps) if cfg.use_step_condition else None

    def student_denoise(params, x, t, labels):
        return precond.apply({"params": params}, x, t, labels,
                             step_condition=step_cond)

    def teacher_traj(teacher_params, latents, labels):
        den = bind(precond, teacher_params, class_labels=labels)
        out = tea_sampler(den, latents, tea_t, return_inters=True,
                          max_order=cfg.max_order, predict_x0=cfg.predict_x0,
                          lower_order_final=cfg.lower_order_final)
        return out.xs[tea_idx]  # [num_steps-1, B, H, W, C]

    n_seg = cfg.num_steps - 1
    t_cur = jnp.asarray(t_steps[:-1], jnp.float32)
    t_next = jnp.asarray(t_steps[1:], jnp.float32)
    afs_flags = jnp.asarray(
        [cfg.afs and i == 0 for i in range(n_seg)])

    def train_step(params, opt_state, teacher_params, latents, labels=None):
        tea = jax.lax.stop_gradient(teacher_traj(teacher_params, latents, labels))
        x0 = latents * jnp.float32(t_steps[0])

        def seg_loss(p, x, tc, tn, afs_flag, tea_i, is_last):
            d = jax.lax.cond(
                afs_flag,
                lambda: x / jnp.sqrt(1.0 + tc**2),
                lambda: (x - student_denoise(p, x, tc, labels)) / tc,
            )
            stu = x + (tn - tc) * d
            # L1, normalized per-batch (training_loop.py:283: sum / batch)
            elem = jnp.abs(stu - tea_i)
            if cfg.is_second_stage and lpips_fn is not None:
                # lpips mean broadcast-added at the final step (loss.py:87-88)
                elem = elem + jnp.where(is_last, lpips_fn(stu, tea_i).mean(), 0.0)
            loss = elem.sum() / x.shape[0]
            return loss, stu

        is_last_flags = jnp.asarray(
            [i == n_seg - 1 for i in range(n_seg)])

        def body(carry, inputs):
            p, o, x = carry
            tc, tn, afs_flag, tea_i, is_last = inputs
            (loss, stu), grads = jax.value_and_grad(seg_loss, has_aux=True)(
                p, x, tc, tn, afs_flag, tea_i, is_last)
            grads = jax.tree.map(
                lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), grads)
            updates, o_new = optimizer.update(grads, o, p)
            p_new = optax.apply_updates(p, updates)
            # AFS step 0 has no gradient path -> skip the update entirely
            # (training_loop.py:282,291).
            skip = afs_flag
            p = jax.tree.map(lambda a, b: jnp.where(skip, a, b), p, p_new)
            o = jax.tree.map(
                lambda a, b: jnp.where(skip, a, b) if a.shape == b.shape else b,
                o, o_new)
            return (p, o, jax.lax.stop_gradient(stu)), loss

        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, x0),
            (t_cur, t_next, afs_flags, tea, is_last_flags))
        return params, opt_state, {"loss_per_step": losses, "loss": losses.mean()}

    return train_step
