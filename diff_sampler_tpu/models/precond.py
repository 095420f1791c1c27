"""Preconditioner wrappers: the unifying denoiser abstraction of the toolbox.

Every checkpoint source is wrapped into the uniform interface
`D_x = net(x, sigma, ...)` with attributes `img_resolution, img_channels,
label_dim, sigma_min, sigma_max` and (for discrete-time models)
`sigma(t)/sigma_inv(sigma)` maps, mirroring
`diff-solvers-main/models/networks_edm.py:460-763`:

  * EDMPrecond - EDM c_skip/c_out/c_in/c_noise scaling   (networks_edm.py:460-499)
  * CMPrecond  - consistency-models LSUN checkpoints      (:504-552)
  * CGPrecond  - ADM + classifier guidance (grad in-graph) (:557-625)
  * CFGPrecond - LDM/SD, uncond or classifier-free guidance (:630-763)

EDMPrecond is a Flax module (the backbone params live under 'model'); the
other three are thin functional wrappers over a `model_fn` callable so they
compose with any backbone tier.  `bind()` turns any of them into the
`denoise(x, t) -> D_x` callable the scan-based samplers consume.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .unets import DhariwalUNet, SongUNet

__all__ = ["EDMPrecond", "CMPrecond", "CGPrecond", "CFGPrecond", "bind",
           "BoundDenoiser", "extract_captured"]

MODEL_TYPES = {"SongUNet": SongUNet, "DhariwalUNet": DhariwalUNet}


def extract_captured(inter_tree):
    """Pull the single captured activation out of a flax
    capture_intermediates tree (the JAX replacement for the reference's
    forward hooks, `amed-solver-main/solvers_amed.py:7-18`)."""
    node = inter_tree["intermediates"]
    while "__call__" not in node:
        node = node[next(iter(node.keys()))]
    act = node["__call__"][0]
    if isinstance(act, tuple):
        act = act[0]
    return act


def _bcast_sigma(sigma, x):
    sigma = jnp.asarray(sigma, jnp.float32)
    sigma = sigma.reshape(-1)
    return sigma.reshape((-1,) + (1,) * (x.ndim - 1))


class EDMPrecond(nn.Module):
    """EDM preconditioning (networks_edm.py:460-499).  NHWC images.

    `dtype` is the inner-model compute dtype (bfloat16 for TPU speed; the
    reference's use_fp16 analogue); preconditioning math stays float32.
    """

    img_resolution: int
    img_channels: int
    label_dim: int = 0
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    sigma_data: float = 0.5
    model_type: str = "SongUNet"
    model_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, sigma, class_labels=None, *, step_condition=None,
                 skip_tuning: bool = False, deterministic: bool = True,
                 augment_labels=None):
        x = x.astype(jnp.float32)
        sigma = _bcast_sigma(sigma, x)
        if self.label_dim == 0:
            class_labels = None
        elif class_labels is None:
            class_labels = jnp.zeros((1, self.label_dim), jnp.float32)
        else:
            class_labels = class_labels.astype(jnp.float32).reshape(-1, self.label_dim)

        c_skip = self.sigma_data**2 / (sigma**2 + self.sigma_data**2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma**2 + self.sigma_data**2)
        c_in = 1.0 / jnp.sqrt(self.sigma_data**2 + sigma**2)
        c_noise = jnp.log(sigma) / 4.0

        if step_condition is not None:
            step_condition = jnp.asarray(step_condition, jnp.float32).reshape(-1)

        model = MODEL_TYPES[self.model_type](
            img_resolution=self.img_resolution, in_channels=self.img_channels,
            out_channels=self.img_channels, label_dim=self.label_dim,
            name="model", **self.model_kwargs)
        f_x = model((c_in * x).astype(self.dtype), c_noise.reshape(-1),
                    class_labels, augment_labels, step_condition=step_condition,
                    skip_tuning=skip_tuning, deterministic=deterministic)
        return c_skip * x + c_out * f_x.astype(jnp.float32)

    def round_sigma(self, sigma):
        return jnp.asarray(sigma)


@dataclasses.dataclass
class CMPrecond:
    """Consistency-models wrapper (networks_edm.py:504-552).

    model_fn(x_scaled, rescaled_t, class_labels) -> F_x
    """

    model_fn: Callable
    img_resolution: int
    img_channels: int
    label_dim: int = 0
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    sigma_data: float = 0.5
    # optional (F_x, bottleneck_act) variant for AMED training
    # (solvers_amed.py:7-18 hooks model.middle_block for 256-res CM)
    model_fn_bottleneck: Optional[Callable] = None

    def _coeffs(self, x, sigma):
        sigma = _bcast_sigma(sigma, x)
        c_skip = self.sigma_data**2 / (sigma**2 + self.sigma_data**2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma**2 + self.sigma_data**2)
        c_in = 1.0 / jnp.sqrt(self.sigma_data**2 + sigma**2)
        rescaled_t = 1000.0 * jnp.log(sigma.reshape(-1)) / 4.0
        if rescaled_t.shape[0] == 1:
            rescaled_t = jnp.broadcast_to(rescaled_t, (x.shape[0],))
        return c_skip, c_out, c_in, rescaled_t

    def __call__(self, x, sigma, class_labels=None):
        c_skip, c_out, c_in, rescaled_t = self._coeffs(x, sigma)
        f_x = self.model_fn(c_in * x, rescaled_t, class_labels)
        return c_skip * x + c_out * f_x

    def with_bottleneck(self, x, sigma, class_labels=None):
        """(D_x, raw middle-block activation) for AMED."""
        assert self.model_fn_bottleneck is not None, (
            "build the model with bottleneck capture (factory builders)")
        c_skip, c_out, c_in, rescaled_t = self._coeffs(x, sigma)
        f_x, act = self.model_fn_bottleneck(c_in * x, rescaled_t, class_labels)
        return c_skip * x + c_out * f_x, act


@dataclasses.dataclass
class CGPrecond:
    """ADM + classifier guidance (networks_edm.py:557-625): the class-score
    gradient is computed in-graph with jax.grad (the reference uses
    torch.autograd.grad inside forward, :613-620).

    model_fn(x_scaled, c_noise, y) -> eps prediction with 2*C channels
      (eps | learned variance); classifier_fn(x_scaled, c_noise) -> logits.
    """

    model_fn: Callable
    classifier_fn: Callable
    img_resolution: int
    img_channels: int
    label_dim: int
    guidance_rate: float = 1.0
    beta_d: float = 19.9
    beta_min: float = 0.1
    M: int = 1000
    epsilon_t: float = 1e-3
    model_fn_bottleneck: Optional[Callable] = None

    def __post_init__(self):
        self.sigma_min = float(self.sigma(self.epsilon_t))
        self.sigma_max = float(self.sigma(1.0))

    def sigma(self, t):
        t = jnp.asarray(t, jnp.float64) if isinstance(t, float) else jnp.asarray(t)
        return jnp.sqrt(jnp.exp(0.5 * self.beta_d * t**2 + self.beta_min * t) - 1.0)

    def sigma_inv(self, sigma):
        sigma = jnp.asarray(sigma)
        return (
            jnp.sqrt(self.beta_min**2 + 2 * self.beta_d * jnp.log(1 + sigma**2))
            - self.beta_min
        ) / self.beta_d

    def _cond_grad(self, x_in, t, y):
        def selected_logp(xv):
            logits = self.classifier_fn(xv, t)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return jnp.take_along_axis(logp, y.reshape(-1, 1), axis=1).sum()

        return jax.grad(selected_logp)(x_in) * self.guidance_rate

    def __call__(self, x, sigma, class_labels=None):
        d_x, _ = self._denoise(x, sigma, class_labels, self.model_fn)
        return d_x

    def with_bottleneck(self, x, sigma, class_labels=None):
        """(D_x, raw middle-block activation) for AMED (solvers_amed.py:12)."""
        assert self.model_fn_bottleneck is not None, (
            "build the model with bottleneck capture (factory builders)")
        return self._denoise(x, sigma, class_labels, None,
                             model_fn_b=self.model_fn_bottleneck)

    def _denoise(self, x, sigma, class_labels, model_fn, model_fn_b=None):
        assert class_labels is not None, "CGPrecond needs integer class labels"
        sigma = _bcast_sigma(sigma, x)
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = (self.M - 1) * self.sigma_inv(sigma).reshape(-1)
        if c_noise.shape[0] == 1:
            c_noise = jnp.broadcast_to(c_noise, (x.shape[0],))
        x_in = c_in * x
        if model_fn_b is not None:
            eps, act = model_fn_b(x_in, c_noise, class_labels)
        else:
            eps, act = model_fn(x_in, c_noise, class_labels), None
        eps = eps[..., : self.img_channels]  # drop learned-variance channels
        alpha_bar = 1.0 / (1.0 + sigma**2)
        eps = eps - jnp.sqrt(1.0 - alpha_bar) * self._cond_grad(x_in, c_noise, class_labels)
        d_x = x - sigma * eps
        return jnp.clip(d_x, -1.0, 1.0), act


def interpolate_fn(x, xp, yp):
    """Piecewise-linear interpolation with linear extrapolation at the ends
    (CFGPrecond.interpolate_fn, networks_edm.py:720-759), vectorized.

    x: [N]; xp, yp: [K] keypoints with xp ascending."""
    x = jnp.asarray(x).reshape(-1)
    k = xp.shape[0]
    # index of first keypoint >= x, clipped so we always have a segment
    idx = jnp.searchsorted(xp, x)
    lo = jnp.clip(idx - 1, 0, k - 2)
    x0, x1 = xp[lo], xp[lo + 1]
    y0, y1 = yp[lo], yp[lo + 1]
    # Guard zero-width segments: float32 keypoint tables (e.g. a checkpoint's
    # alphas_cumprod) can contain duplicates after rounding; 0/0 would NaN.
    denom = x1 - x0
    frac = jnp.where(denom == 0, 0.0, (x - x0) / jnp.where(denom == 0, 1.0, denom))
    return y0 + frac * (y1 - y0)


@dataclasses.dataclass
class CFGPrecond:
    """LDM / Stable-Diffusion wrapper with (optional) classifier-free guidance
    (networks_edm.py:630-763).  Discrete-time sigma maps are piecewise-linear
    interpolations of the checkpoint's alphas_cumprod table.

    model_fn(x_scaled, t_input, cond) -> eps prediction.
    """

    model_fn: Callable
    alphas_cumprod: np.ndarray
    img_resolution: int = 64
    img_channels: int = 4
    guidance_type: str = "classifier-free"
    guidance_rate: float = 1.0
    epsilon_t: float = 1e-3
    label_dim: int = 1
    model_fn_bottleneck: Optional[Callable] = None

    def __post_init__(self):
        log_alphas = 0.5 * np.log(np.asarray(self.alphas_cumprod, np.float64))
        self.M = len(log_alphas)
        self.t_array = jnp.asarray(np.linspace(0.0, 1.0, self.M + 1)[1:], jnp.float32)
        self.log_alpha_array = jnp.asarray(log_alphas, jnp.float32)
        self.sigma_min = float(np.asarray(self.sigma(self.epsilon_t)).reshape(()))
        self.sigma_max = float(np.asarray(self.sigma(1.0)).reshape(()))

    def marginal_log_mean_coeff(self, t):
        return interpolate_fn(jnp.asarray(t, jnp.float32), self.t_array,
                              self.log_alpha_array)

    def sigma(self, t):
        log_a = self.marginal_log_mean_coeff(t)
        alpha = jnp.exp(log_a)
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_a))
        return std / alpha

    def sigma_inv(self, sigma):
        lamb = -jnp.log(jnp.asarray(sigma, jnp.float32))
        log_alpha = -0.5 * jnp.logaddexp(0.0, -2.0 * lamb)
        # log_alpha_array is descending in t -> flip for ascending interp.
        return interpolate_fn(log_alpha, self.log_alpha_array[::-1], self.t_array[::-1])

    def __call__(self, x, sigma, condition=None, unconditional_condition=None):
        d_x, _ = self._denoise(x, sigma, condition, unconditional_condition,
                               self.model_fn)
        return d_x

    def denoise_with(self, model_fn, x, sigma, condition=None,
                     unconditional_condition=None):
        """Run the same preconditioning math through an EXPLICIT model_fn --
        the functional entry point for trainable latent students (SFD
        distillation differentiates through this into the U-Net params,
        sfd-main/training/training_loop.py:214)."""
        d_x, _ = self._denoise(x, sigma, condition, unconditional_condition,
                               model_fn)
        return d_x

    def with_bottleneck(self, x, sigma, condition=None,
                        unconditional_condition=None):
        """(D_x, raw middle-block activation) for AMED; with doubled-batch
        guidance the activation stays doubled (bind_with_bottleneck slices
        the cond half, mirroring solvers_amed.py:33-39)."""
        assert self.model_fn_bottleneck is not None, (
            "build the model with bottleneck capture (factory builders)")
        return self._denoise(x, sigma, condition, unconditional_condition,
                             None, model_fn_b=self.model_fn_bottleneck)

    def _denoise(self, x, sigma, condition, unconditional_condition, model_fn,
                 model_fn_b=None):
        def call(xs, ts, cs):
            if model_fn_b is not None:
                return model_fn_b(xs, ts, cs)
            return model_fn(xs, ts, cs), None

        sigma_flat = jnp.asarray(sigma, jnp.float32).reshape(-1)
        c_in = (1.0 / jnp.sqrt(sigma_flat**2 + 1.0)).reshape((-1,) + (1,) * (x.ndim - 1))
        c_out = (-sigma_flat).reshape((-1,) + (1,) * (x.ndim - 1))
        c_noise = self.M * self.sigma_inv(sigma_flat) - 1.0
        if c_noise.shape[0] == 1:
            c_noise = jnp.broadcast_to(c_noise, (x.shape[0],))

        def bcast(c):
            # a single bound conditioning row (e.g. one --prompt) serves the
            # whole batch (the reference encodes batch_size copies instead,
            # sample.py:283-291)
            if c is not None and c.shape[0] == 1 and x.shape[0] != 1:
                return jnp.broadcast_to(c, (x.shape[0],) + c.shape[1:])
            return c

        condition = bcast(condition)
        unconditional_condition = bcast(unconditional_condition)

        if self.guidance_type == "uncond":
            f_x, act = call(c_in * x, c_noise, None)
        elif self.guidance_type == "classifier-free":
            if self.guidance_rate == 1.0 or unconditional_condition is None:
                f_x, act = call(c_in * x, c_noise, condition)
            else:
                x_in = jnp.concatenate([c_in * x] * 2)
                t_in = jnp.concatenate([c_noise] * 2)
                cond_in = jnp.concatenate([unconditional_condition, condition])
                out, act = call(x_in, t_in, cond_in)
                noise_uncond, noise = jnp.split(out, 2)
                f_x = noise_uncond + self.guidance_rate * (noise - noise_uncond)
        else:
            raise ValueError(self.guidance_type)
        return x + c_out * f_x, act


@dataclasses.dataclass
class BoundDenoiser:
    """A preconditioner bound to params/conditioning: the `denoise(x, t)`
    callable consumed by the samplers."""

    fn: Callable
    sigma_min: float
    sigma_max: float

    def __call__(self, x, t):
        return self.fn(x, t)


def bind(precond, params=None, **cond) -> BoundDenoiser:
    """Close a preconditioner over params + conditioning.

    EDMPrecond (flax): bind(module, params, class_labels=..., step_condition=...)
    CM/CG/CFG (dataclass): bind(obj, class_labels=... / condition=...)
    """
    if isinstance(precond, nn.Module):
        if params is None:
            raise ValueError("flax preconditioner needs params")

        def fn(x, t):
            return precond.apply({"params": params}, x, t, **cond)

        return BoundDenoiser(fn, precond.sigma_min, precond.sigma_max)

    def fn(x, t):
        return precond(x, t, **cond)

    return BoundDenoiser(fn, precond.sigma_min, precond.sigma_max)
