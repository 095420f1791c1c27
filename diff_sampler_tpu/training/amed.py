"""AMED predictor training (amed-solver-main/training/training_loop.py:82-283
+ training/loss.py:29-130), as one jitted program per trajectory:

  * teacher trajectory: base solver with M inserted steps per segment,
    captured with return_inters and sliced at student knots (loss.py:101-130),
  * per-step student: the AMED-family sampler over one segment with
    train=True (gradients flow only into the predictor outputs r/c_n/a_n;
    the frozen U-Net is differentiated THROUGH, not into),
  * per-step Adam update with nan_to_num on grads (training_loop.py:208-210),
  * handoff: single-step students (euler/dpm/amed) restart each step from
    the teacher state; multistep students continue from their own detached
    output (training_loop.py:213-217),
  * loss = (student - teacher)^2, summed / batch.

Data-parallel: params replicated, batch sharded on the 'data' mesh axis
(replaces DDP(predictor), training_loop.py:153).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import get_schedule
from ..solvers import get_sampler
from ..solvers.amed import AMEDPredictor, _amed_family
from .sfd import teacher_slice_indices

__all__ = ["AMEDConfig", "make_amed_train_step", "predictor_from_config"]


@dataclasses.dataclass(frozen=True)
class AMEDConfig:
    """amed-solver-main/train.py:15-160 defaults.  The reference stores all
    of these as predictor attributes for restore-at-sample-time
    (training/networks.py:88-103); we serialize this dataclass as a JSON
    sidecar instead."""

    dataset_name: str = "cifar10"
    num_steps: int = 4
    sampler_stu: str = "amed"  # amed | euler | ipndm | dpm | dpmpp
    sampler_tea: str = "heun"
    M: int = 1
    schedule_type: str = "polynomial"
    schedule_rho: float = 7.0
    afs: bool = False
    scale_dir: float = 0.01
    scale_time: float = 0.0
    max_order: int = 4
    predict_x0: bool = True
    lower_order_final: bool = True
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    guidance_type: Optional[str] = None
    guidance_rate: float = 1.0
    lr: float = 5e-3
    total_kimg: int = 10
    batch: int = 512
    # microbatch size for gradient accumulation (the reference's --batch-gpu,
    # amed train.py:43 + ddp_sync rounds, training_loop.py:197-205); None =
    # no accumulation.  A 16GB v5e fits batch 256 directly; 512 needs 2x.
    batch_gpu: Optional[int] = None
    # rematerialize the frozen-net evals in the student backward
    # (jax.checkpoint per eval): trades ~one extra forward per eval for the
    # trajectory activation memory -- the lever for the CFG-doubled SD tier
    # whose unrecomputed backward measured 11.23 GiB of XLA temp.
    remat_traj: bool = False


def predictor_from_config(cfg: AMEDConfig, bottleneck_dim: int = 64) -> AMEDPredictor:
    return AMEDPredictor(bottleneck_input_dim=bottleneck_dim,
                         scale_dir=cfg.scale_dir, scale_time=cfg.scale_time)


def make_amed_train_step(predictor: AMEDPredictor, denoise_b, cfg: AMEDConfig,
                         optimizer: optax.GradientTransformation,
                         denoise_factory=None, sigma_fn=None,
                         sigma_inv_fn=None):
    """Build the jittable per-trajectory AMED training step.

    denoise_b: BottleneckDenoiser over the FROZEN pre-trained net.
    denoise_factory: optional labels -> BottleneckDenoiser builder for
      conditional tiers (ADM classifier guidance draws random class labels
      per trajectory, amed training_loop.py:176-180); when given, the
      returned step takes a 4th `labels` argument and denoise_b is ignored.
    Returns train_step(pred_params, opt_state, latents[, labels]) ->
      (pred_params, opt_state, metrics); latents ~ N(0, 1).

    sigma_fn/sigma_inv_fn: required for schedule_type='discrete' (LDM tier).
    """
    t_steps = get_schedule(cfg.num_steps, cfg.sigma_min, cfg.sigma_max,
                           cfg.schedule_type, cfg.schedule_rho,
                           sigma_fn=sigma_fn, sigma_inv_fn=sigma_inv_fn)
    n_tea = (cfg.M + 1) * (cfg.num_steps - 1) + 1
    tea_t = get_schedule(n_tea, cfg.sigma_min, cfg.sigma_max,
                         cfg.schedule_type, cfg.schedule_rho,
                         sigma_fn=sigma_fn, sigma_inv_fn=sigma_inv_fn)
    tea_idx = np.asarray(teacher_slice_indices(cfg.num_steps, cfg.M))
    tea_sampler = get_sampler(cfg.sampler_tea)
    single_step_stu = cfg.sampler_stu in ("euler", "dpm", "amed")

    def teacher_traj(den, latents):
        out = tea_sampler(den, latents, tea_t, return_inters=True,
                          max_order=cfg.max_order, predict_x0=cfg.predict_x0,
                          lower_order_final=cfg.lower_order_final)
        return out.xs[tea_idx]

    def train_step(pred_params, opt_state, latents, labels=None):
        batch = latents.shape[0]
        mb = cfg.batch_gpu or batch
        if batch % mb:
            raise ValueError(f"batch {batch} not divisible by batch_gpu {mb}")
        n_acc = batch // mb
        # Accumulation rounds are a lax.scan over the microbatch axis (amed
        # training_loop.py:197-205: grads summed over rounds, ONE Adam step
        # per trajectory segment) -- the graph size stays constant in n_acc,
        # so the SD config's forced 128//batch_gpu rounds compile fine.
        lat = latents.reshape((n_acc, mb) + latents.shape[1:])
        lab = (None if labels is None
               else labels.reshape((n_acc, mb) + labels.shape[1:]))

        def micro_den(cond_a):
            return (denoise_factory(cond_a) if denoise_factory is not None
                    else denoise_b)

        if lab is None:
            teas = jax.lax.map(lambda l: teacher_traj(micro_den(None), l), lat)
        else:
            teas = jax.lax.map(
                lambda lc: teacher_traj(micro_den(lc[1]), lc[0]), (lat, lab))
        # [n_acc, n_seg, mb, ...] -> [n_seg, n_acc, mb, ...]
        teas = jax.lax.stop_gradient(jnp.swapaxes(teas, 0, 1))
        xs = lat * jnp.float32(t_steps[0])  # [n_acc, mb, ...]
        buffers = ([], [])  # stacked multistep history, leaves [n_acc, ...]
        losses = []
        for step_idx in range(cfg.num_steps - 1):
            seg_t = t_steps[step_idx : step_idx + 2]

            def seg_loss(pp, x_in, tea_target, bufs, cond_a):
                def pred_apply(b, tc, tn):
                    return predictor.apply({"params": pp}, b, tc, tn)

                res, bufs_out, _ = _amed_family(
                    micro_den(cond_a), pred_apply,
                    x_in / jnp.float32(seg_t[0]), seg_t,
                    mode=cfg.sampler_stu, afs=cfg.afs, max_order=cfg.max_order,
                    predict_x0=cfg.predict_x0,
                    lower_order_final=cfg.lower_order_final,
                    buffer_in=bufs[0], buffer_t_in=bufs[1], train=True,
                    step_idx=step_idx, total_num_steps=cfg.num_steps,
                    remat=cfg.remat_traj)
                loss = ((res.x - tea_target) ** 2).sum() / x_in.shape[0]
                return loss, (res.x, bufs_out)

            def micro(grads_acc, scanned):
                x_a, tea_a, bufs_a, cond_a = scanned
                (loss, (stu, bufs_out)), g = jax.value_and_grad(
                    seg_loss, has_aux=True)(pred_params, x_a, tea_a, bufs_a,
                                            cond_a)
                return (jax.tree.map(jnp.add, grads_acc, g),
                        (loss, stu, bufs_out))

            zero_g = jax.tree.map(jnp.zeros_like, pred_params)
            grads, (seg_losses, stus, buffers) = jax.lax.scan(
                micro, zero_g, (xs, teas[step_idx], buffers, lab))
            grads = jax.tree.map(
                lambda g: jnp.nan_to_num(g / n_acc, nan=0.0, posinf=1e5,
                                         neginf=-1e5), grads)
            updates, opt_state = optimizer.update(grads, opt_state, pred_params)
            pred_params = optax.apply_updates(pred_params, updates)
            losses.append(seg_losses.mean())
            # handoff: single-step students restart from the teacher state
            # (training_loop.py:213-217); multistep continue detached
            xs = (teas[step_idx] if single_step_stu
                  else jax.lax.stop_gradient(stus))
        losses = jnp.stack(losses)
        return pred_params, opt_state, {"loss_per_step": losses,
                                        "loss": losses.mean()}

    return train_step
