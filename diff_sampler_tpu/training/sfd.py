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
  * gradient accumulation: microbatch rounds are a `lax.scan` over the
    leading accumulation axis (replacing the reference's Python rounds with
    ddp_sync off, training_loop.py:273-283; forced to an effective batch of
    128 for Stable Diffusion, training_loop.py:227),
  * SFD-v: `num_steps` is randomized in [4,7] per trajectory
    (training_loop.py:239-244) -- each num_steps value is its own jitted
    program (static shapes), selected per iteration on host,
  * data-parallel: params replicated, batch sharded over the 'data' mesh
    axis; XLA inserts the gradient psum (replaces DDP, training_loop.py:214).

Model tiers:
  * `make_train_step`      - pixel-space EDM student (`precond.apply`),
  * `make_ldm_train_step`  - latent LDM/SD student: the trainable latent
    U-Net wrapped in CFGPrecond math with caption/context conditioning and
    guidance_rate forced to 1.0 during training
    (sfd-main/training/training_loop.py:85-110,168-186,227-260).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.precond import BoundDenoiser, bind
from ..ops import get_schedule
from ..solvers import get_sampler

__all__ = ["SFDConfig", "make_train_step", "make_train_step_general",
           "make_ldm_train_step", "teacher_slice_indices"]


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


def make_train_step_general(student_denoise_fn, teacher_den_factory,
                            cfg: SFDConfig,
                            optimizer: optax.GradientTransformation,
                            lpips_fn=None, *, sigma_fn=None, sigma_inv_fn=None,
                            n_acc: int = 1, model_source: str = "edm"):
    """Build the jittable per-trajectory SFD training step, generic over the
    model tier.

    student_denoise_fn(params, x, t, cond) -> D_x  (grads flow into params)
    teacher_den_factory(teacher_params, cond) -> BoundDenoiser (frozen)
    n_acc: gradient-accumulation rounds; the step reshapes the batch into
      [n_acc, B//n_acc, ...] and scans microbatches, summing grads before the
      single per-segment optimizer update (training_loop.py:269-295; forced
      to 128//batch rounds for Stable Diffusion, :227).
    lpips_fn: optional (a, b) -> [B] perceptual distance, added at the final
      step of second-stage EDM distillation (loss.py:87-88,130-135; the
      reference only applies it for model_source == 'edm').

    Returns train_step(params, opt_state, teacher_params, latents, cond=None)
      -> (params, opt_state, metrics)
    where latents ~ N(0, 1) of shape [B, H, W, C] (scaled by sigma_max
    internally, matching training_loop.py:247) and cond is per-sample
    conditioning (one-hot labels for EDM, text context [B, T, D] for SD).
    """
    t_steps = get_schedule(cfg.num_steps, cfg.sigma_min, cfg.sigma_max,
                           cfg.schedule_type, cfg.schedule_rho,
                           sigma_fn=sigma_fn, sigma_inv_fn=sigma_inv_fn)
    n_tea = (cfg.M + 1) * (cfg.num_steps - 1) + 1
    tea_t = get_schedule(n_tea, cfg.sigma_min, cfg.sigma_max,
                         cfg.schedule_type, cfg.schedule_rho,
                         sigma_fn=sigma_fn, sigma_inv_fn=sigma_inv_fn)
    tea_idx = np.asarray(teacher_slice_indices(cfg.num_steps, cfg.M))
    tea_sampler = get_sampler("euler" if cfg.is_second_stage else cfg.sampler_tea)
    use_lpips = cfg.is_second_stage and model_source == "edm" and lpips_fn is not None

    def teacher_traj(teacher_params, latents, cond):
        den = teacher_den_factory(teacher_params, cond)
        out = tea_sampler(den, latents, tea_t, return_inters=True,
                          max_order=cfg.max_order, predict_x0=cfg.predict_x0,
                          lower_order_final=cfg.lower_order_final)
        return out.xs[tea_idx]  # [num_steps-1, mb, H, W, C]

    n_seg = cfg.num_steps - 1
    t_cur = jnp.asarray(t_steps[:-1], jnp.float32)
    t_next = jnp.asarray(t_steps[1:], jnp.float32)
    afs_flags = jnp.asarray([cfg.afs and i == 0 for i in range(n_seg)])
    is_last_flags = jnp.asarray([i == n_seg - 1 for i in range(n_seg)])

    def train_step(params, opt_state, teacher_params, latents, cond=None):
        batch = latents.shape[0]
        if batch % n_acc:
            raise ValueError(f"batch {batch} not divisible by n_acc {n_acc}")
        mb = batch // n_acc
        lat = latents.reshape((n_acc, mb) + latents.shape[1:])
        cond_r = (None if cond is None
                  else cond.reshape((n_acc, mb) + cond.shape[1:]))

        if cond_r is None:
            tea = jax.lax.map(lambda l: teacher_traj(teacher_params, l, None),
                              lat)
        else:
            tea = jax.lax.map(
                lambda lc: teacher_traj(teacher_params, lc[0], lc[1]),
                (lat, cond_r))
        # [n_acc, n_seg, mb, ...] -> [n_seg, n_acc, mb, ...] for the seg scan
        tea = jax.lax.stop_gradient(jnp.swapaxes(tea, 0, 1))
        x0 = lat * jnp.float32(t_steps[0])

        def seg_loss(p, x, tc, tn, afs_flag, tea_i, is_last, cond_a):
            d = jax.lax.cond(
                afs_flag,
                lambda: x / jnp.sqrt(1.0 + tc**2),
                lambda: (x - student_denoise_fn(p, x, tc, cond_a)) / tc,
            )
            stu = x + (tn - tc) * d
            # L1, normalized per-microbatch (training_loop.py:283:
            # sum / batch_gpu_total combined with the 1/n_acc below)
            elem = jnp.abs(stu - tea_i)
            if use_lpips:
                # lpips mean broadcast-added at the final step (loss.py:87-88)
                elem = elem + jnp.where(is_last, lpips_fn(stu, tea_i).mean(), 0.0)
            loss = elem.sum() / x.shape[0]
            return loss, stu

        def body(carry, inputs):
            p, o, xs = carry  # xs: [n_acc, mb, ...]
            tc, tn, afs_flag, tea_i, is_last = inputs

            def micro(grads_acc, scanned):
                x_a = scanned[0]
                tea_a = scanned[1]
                cond_a = scanned[2] if len(scanned) == 3 else None
                (loss, stu), g = jax.value_and_grad(seg_loss, has_aux=True)(
                    p, x_a, tc, tn, afs_flag, tea_a, is_last, cond_a)
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                return grads_acc, (loss, stu)

            zero_g = jax.tree.map(jnp.zeros_like, p)
            scanned = (xs, tea_i) if cond_r is None else (xs, tea_i, cond_r)
            grads, (losses, stus) = jax.lax.scan(micro, zero_g, scanned)
            grads = jax.tree.map(
                lambda g: jnp.nan_to_num(g / n_acc, nan=0.0, posinf=1e5,
                                         neginf=-1e5), grads)
            updates, o_new = optimizer.update(grads, o, p)
            p_new = optax.apply_updates(p, updates)
            # AFS step 0 has no gradient path -> skip the update entirely
            # (training_loop.py:282,291).
            skip = afs_flag
            p = jax.tree.map(lambda a, b: jnp.where(skip, a, b), p, p_new)
            o = jax.tree.map(
                lambda a, b: jnp.where(skip, a, b) if a.shape == b.shape else b,
                o, o_new)
            return (p, o, jax.lax.stop_gradient(stus)), losses.mean()

        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, x0),
            (t_cur, t_next, afs_flags, tea, is_last_flags))
        return params, opt_state, {"loss_per_step": losses, "loss": losses.mean()}

    return train_step


def make_train_step(precond, cfg: SFDConfig, optimizer: optax.GradientTransformation,
                    lpips_fn=None, n_acc: int = 1):
    """Pixel-space EDM student (the flax EDMPrecond module is both the
    trainable student and, with its own frozen params copy, the teacher,
    training_loop.py:187).

    Returns train_step(params, opt_state, teacher_params, latents, labels)
      -> (params, opt_state, metrics).
    """
    step_cond = float(cfg.num_steps) if cfg.use_step_condition else None

    def student_denoise(params, x, t, labels):
        return precond.apply({"params": params}, x, t, labels,
                             step_condition=step_cond)

    def teacher_factory(teacher_params, labels):
        return bind(precond, teacher_params, class_labels=labels)

    return make_train_step_general(student_denoise, teacher_factory, cfg,
                                   optimizer, lpips_fn, n_acc=n_acc,
                                   model_source="edm")


def make_ldm_train_step(unet_apply, precond_math, cfg: SFDConfig,
                        optimizer: optax.GradientTransformation,
                        n_acc: int = 1):
    """Latent LDM/SD student (sfd training_loop.py:85-110 LDM branch).

    unet_apply(params, x, t, context) -> eps prediction (latent U-Net);
    precond_math: a CFGPrecond carrying the discrete sigma maps + guidance
      config.  Training runs at guidance_rate = 1.0 regardless of the
      sampling rate (training_loop.py:185 `net.guidance_rate = 1.0`), so the
      CFG batch is never doubled and the unconditional context is unused.
    n_acc: forced to 128 // batch rounds for ms_coco (training_loop.py:227).

    Loss lives in LATENT space (the student output is never decoded during
    training); the VAE decode happens only at sampling time.
    Returns train_step(params, opt_state, teacher_params, latents, context)
    with latents [B, res, res, z_channels] and context [B, T, D] or None.
    """
    train_precond = dataclasses.replace(precond_math, guidance_rate=1.0)
    # dataclasses.replace reruns __post_init__ -> fresh sigma tables; restore
    # any externally narrowed range (factory sets sigma_min=0.1 for ms_coco,
    # sfd training_loop.py:105)
    train_precond.sigma_min = precond_math.sigma_min
    train_precond.sigma_max = precond_math.sigma_max
    cfg = dataclasses.replace(cfg, sigma_min=float(train_precond.sigma_min),
                              sigma_max=float(train_precond.sigma_max))

    def student_denoise(params, x, t, context):
        return train_precond.denoise_with(
            lambda xs, ts, cs: unet_apply(params, xs, ts, cs),
            x, t, condition=context)

    def teacher_factory(teacher_params, context):
        def fn(x, t):
            return train_precond.denoise_with(
                lambda xs, ts, cs: unet_apply(teacher_params, xs, ts, cs),
                x, t, condition=context)

        return BoundDenoiser(fn, train_precond.sigma_min,
                             train_precond.sigma_max)

    return make_train_step_general(
        student_denoise, teacher_factory, cfg, optimizer,
        sigma_fn=train_precond.sigma, sigma_inv_fn=train_precond.sigma_inv,
        n_acc=n_acc, model_source="ldm")
