"""Scan-based ODE samplers for few-NFE diffusion sampling on TPU.

Rebuilds the 8 training-free samplers of the reference
(`diff-solvers-main/solvers.py`) as `jax.lax.scan` programs:

  * the whole NFE loop jit-compiles into ONE XLA program,
  * history buffers are fixed-shape stacked arrays (the reference keeps
    Python lists, `solvers.py:333,363`),
  * every per-step scalar (AB weights, exp-integrator phis, UniPC rhos) is
    precomputed on host in float64 (see `ops/multistep.py`) and enters the
    scan as a stacked constant, so the body is a denoiser call plus an
    O(order) linear combination.

The denoiser is an arbitrary callable `denoise(x, t_scalar) -> D_x`
(the preconditioner wrappers in `models/precond.py` provide it); class
labels / text conditioning are closed over by the caller, mirroring
`solvers.py:9-14` without the hasattr dispatch.

Shared solver conventions replicated from the reference:
  * `x0 = latents * t_steps[0]` (solvers.py:68)
  * AFS analytic first step `d = x / sqrt(1 + t^2)` (solvers.py:75-77)
  * optional `denoise_to_zero` final full denoise (solvers.py:87-90)
  * optional trajectory capture (`return_inters` / `return_eps`); the
    analyzer's `return_denoised` is derivable as `x_i - t_i * d_i`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import multistep, schedules

# Coefficient stacks as jit-traceable pytrees (multistep.py stays jax-free):
# lets the GITS AFS search compile ONE dpmpp/unipc sampler and feed every
# candidate schedule's host-precomputed coefficients as traced arguments.
jax.tree_util.register_dataclass(
    multistep.DpmPpCoeffs, data_fields=["A", "B"], meta_fields=[])
jax.tree_util.register_dataclass(
    multistep.UniPCCoeffs,
    data_fields=["alpha", "t_next", "h_phi_1", "B_h", "inv_rks", "rhos_p",
                 "rhos_c", "rhos_c_last", "use_corrector"],
    meta_fields=["predict_x0"])

Denoiser = Callable[[jax.Array, jax.Array], jax.Array]

__all__ = [
    "SampleResult",
    "dynamic_thresholding",
    "euler_sampler",
    "heun_sampler",
    "dpm_2_sampler",
    "ipndm_sampler",
    "ipndm_v_sampler",
    "deis_sampler",
    "dpm_pp_sampler",
    "unipc_sampler",
    "SOLVER_REGISTRY",
    "get_sampler",
    "count_nfe",
]


class SampleResult(NamedTuple):
    """x: final sample.  xs: [num_steps(+1), B, ...] trajectory including the
    initial state (and the denoise-to-zero output if requested).
    eps: [num_steps-1, B, ...] per-step gradients d_cur.  Entries are None
    unless requested."""

    x: jax.Array
    xs: Optional[jax.Array] = None
    eps: Optional[jax.Array] = None


def dynamic_thresholding(x0: jax.Array, p: float = 0.995) -> jax.Array:
    """Imagen-style dynamic thresholding (solver_utils.py:77-86)."""
    s = jnp.quantile(jnp.abs(x0).reshape(x0.shape[0], -1), p, axis=1)
    s = jnp.maximum(s, 1.0).reshape((-1,) + (1,) * (x0.ndim - 1))
    return jnp.clip(x0, -s, s) / s


def _expand(v, x):
    return jnp.asarray(v, x.dtype)


def _afs_d(x, t):
    return x / jnp.sqrt(1.0 + t**2)


def _eps_from(denoise: Denoiser, x, t, afs_flag):
    """d_cur = (x - D(x, t)) / t, or the analytic first step when afs_flag."""
    return jax.lax.cond(
        afs_flag,
        lambda x, t: _afs_d(x, t),
        lambda x, t: (x - denoise(x, t)) / t,
        x,
        t,
    )


def _prepare(latents, t_steps, dtype):
    # accepts host arrays/lists AND traced jax arrays (the GITS AFS search
    # passes t_steps as a jit argument so all candidates share one compile)
    t = jnp.asarray(t_steps, dtype=dtype)
    x = latents.astype(dtype) * t[0]
    return x, t


def _afs_flags(n, afs):
    f = np.zeros(n, dtype=bool)
    if afs:
        f[0] = True
    return f


def _finalize(denoise, x, t_last, xs, eps, denoise_to_zero, capture):
    if denoise_to_zero:
        x = denoise(x, jnp.asarray(t_last, x.dtype))
        if capture:
            xs = jnp.concatenate([xs, x[None]], axis=0)
    return SampleResult(x=x, xs=xs if capture else None, eps=eps if capture else None)


# ---------------------------------------------------------------------------
# eps-space linear multistep family: euler / ipndm / ipndm_v / deis
# ---------------------------------------------------------------------------


def _lms_sample(
    denoise: Denoiser,
    latents: jax.Array,
    t_steps: np.ndarray,
    C: np.ndarray,
    *,
    afs: bool = False,
    denoise_to_zero: bool = False,
    return_inters: bool = False,
    dtype=jnp.float32,
) -> SampleResult:
    x, t = _prepare(latents, t_steps, dtype)
    n = len(t_steps) - 1
    K = multistep.MAX_LMS_ORDER - 1
    buf = jnp.zeros((K,) + x.shape, dtype)

    xs_in = (
        t[:-1],
        jnp.asarray(C, dtype),
        jnp.asarray(_afs_flags(n, afs)),
    )

    def body(state, inputs):
        x, buf = state
        t_cur, c_row, afs_flag = inputs
        d = _eps_from(denoise, x, t_cur, afs_flag)
        x_new = x + c_row[0] * d + jnp.tensordot(c_row[1:], buf, axes=1)
        buf = jnp.concatenate([d[None], buf[:-1]], axis=0)
        ys = (x_new, d) if return_inters else None
        return (x_new, buf), ys

    (x, _), ys = jax.lax.scan(body, (x, buf), xs_in)
    if return_inters:
        xs = jnp.concatenate([(latents.astype(dtype) * t[0])[None], ys[0]], axis=0)
        eps = ys[1]
    else:
        xs = eps = None
    return _finalize(denoise, x, t_steps[-1], xs, eps, denoise_to_zero, return_inters)


def euler_sampler(denoise, latents, t_steps, *, afs=False, denoise_to_zero=False,
                  return_inters=False, dtype=jnp.float32, **_):
    """Euler / DDIM sampler (solvers.py:19-96)."""
    return _lms_sample(denoise, latents, t_steps, multistep.euler_coeffs(t_steps),
                       afs=afs, denoise_to_zero=denoise_to_zero,
                       return_inters=return_inters, dtype=dtype)


def ipndm_sampler(denoise, latents, t_steps, *, max_order=4, afs=False,
                  denoise_to_zero=False, return_inters=False, dtype=jnp.float32, **_):
    """Improved PNDM, fixed Adams-Bashforth (solvers.py:278-374)."""
    return _lms_sample(denoise, latents, t_steps, multistep.ipndm_coeffs(t_steps, max_order),
                       afs=afs, denoise_to_zero=denoise_to_zero,
                       return_inters=return_inters, dtype=dtype)


def ipndm_v_sampler(denoise, latents, t_steps, *, max_order=4, afs=False,
                    denoise_to_zero=False, return_inters=False, dtype=jnp.float32, **_):
    """Variable-step Adams-Bashforth (solvers.py:379-499)."""
    return _lms_sample(denoise, latents, t_steps, multistep.ipndm_v_coeffs(t_steps, max_order),
                       afs=afs, denoise_to_zero=denoise_to_zero,
                       return_inters=return_inters, dtype=dtype)


def deis_sampler(denoise, latents, t_steps, *, max_order=4, deis_mode="tab", coeffs=None,
                 afs=False, denoise_to_zero=False, return_inters=False,
                 dtype=jnp.float32, **_):
    """DEIS exponential integrator (solvers.py:504-607)."""
    if coeffs is None:
        coeffs = multistep.deis_coeffs(t_steps, max_order, deis_mode=deis_mode)
    return _lms_sample(denoise, latents, t_steps, coeffs,
                       afs=afs, denoise_to_zero=denoise_to_zero,
                       return_inters=return_inters, dtype=dtype)


# ---------------------------------------------------------------------------
# Two-evaluation single-step solvers: heun / dpm_2
# ---------------------------------------------------------------------------


def _two_eval_sample(denoise, latents, t_steps, t_mid_np, w_cur, w_mid,
                     *, afs, denoise_to_zero, return_inters, dtype):
    """Shared scan for Heun and DPM-Solver-2.

    x_e   = x + (t_mid - t_cur) * d_cur
    d_mid = (x_e - D(x_e, t_mid)) / t_mid
    x'    = x + (t_next - t_cur) * (w_cur * d_cur + w_mid * d_mid)
    Heun: t_mid = t_next, w_cur = w_mid = 0.5.
    """
    x, t = _prepare(latents, t_steps, dtype)
    n = len(t_steps) - 1
    xs_in = (
        t[:-1],
        t[1:],
        jnp.asarray(t_mid_np, dtype),
        jnp.asarray(_afs_flags(n, afs)),
    )

    def body(x, inputs):
        t_cur, t_next, t_mid, afs_flag = inputs
        d = _eps_from(denoise, x, t_cur, afs_flag)
        x_e = x + (t_mid - t_cur) * d
        d_mid = (x_e - denoise(x_e, t_mid)) / t_mid
        x_new = x + (t_next - t_cur) * (w_cur * d + w_mid * d_mid)
        ys = (x_new, d) if return_inters else None
        return x_new, ys

    x, ys = jax.lax.scan(body, x, xs_in)
    if return_inters:
        xs = jnp.concatenate([(latents.astype(dtype) * t[0])[None], ys[0]], axis=0)
        eps = ys[1]
    else:
        xs = eps = None
    return _finalize(denoise, x, t_steps[-1], xs, eps, denoise_to_zero, return_inters)


def heun_sampler(denoise, latents, t_steps, *, afs=False, denoise_to_zero=False,
                 return_inters=False, dtype=jnp.float32, **_):
    """EDM Heun 2nd-order sampler (solvers.py:101-183)."""
    t = np.asarray(t_steps, dtype=np.float64)
    return _two_eval_sample(denoise, latents, t_steps, t[1:], 0.5, 0.5,
                            afs=afs, denoise_to_zero=denoise_to_zero,
                            return_inters=return_inters, dtype=dtype)


def dpm_2_sampler(denoise, latents, t_steps, *, r=0.5, afs=False, denoise_to_zero=False,
                  return_inters=False, dtype=jnp.float32, **_):
    """DPM-Solver-2 with geometric midpoint t_mid = t_next^r * t_cur^(1-r)
    (solvers.py:188-273)."""
    t = np.asarray(t_steps, dtype=np.float64)
    t_mid = t[1:] ** r * t[:-1] ** (1.0 - r)
    return _two_eval_sample(denoise, latents, t_steps, t_mid,
                            1.0 - 1.0 / (2.0 * r), 1.0 / (2.0 * r),
                            afs=afs, denoise_to_zero=denoise_to_zero,
                            return_inters=return_inters, dtype=dtype)


# ---------------------------------------------------------------------------
# DPM-Solver++ multistep (solvers.py:613-713)
# ---------------------------------------------------------------------------


def dpm_pp_sampler(denoise, latents, t_steps, *, max_order=3, predict_x0=True,
                   lower_order_final=True, afs=False, denoise_to_zero=False,
                   return_inters=False, dtype=jnp.float32, coeffs=None, **_):
    co = (coeffs if coeffs is not None else
          multistep.dpm_pp_coeffs(t_steps, max_order, predict_x0,
                                  lower_order_final))
    x, t = _prepare(latents, t_steps, dtype)
    n = len(t_steps) - 1
    buf = jnp.zeros((2,) + x.shape, dtype)

    xs_in = (
        t[:-1],
        jnp.asarray(co.A, dtype),
        jnp.asarray(co.B, dtype),
        jnp.asarray(_afs_flags(n, afs)),
    )

    def body(state, inputs):
        x, buf = state
        t_cur, a, b_row, afs_flag = inputs
        d = _eps_from(denoise, x, t_cur, afs_flag)
        denoised = x - t_cur * d
        m0 = dynamic_thresholding(denoised) if predict_x0 else d
        x_new = a * x + b_row[0] * m0 + b_row[1] * buf[0] + b_row[2] * buf[1]
        buf = jnp.stack([m0, buf[0]], axis=0)
        ys = (x_new, d) if return_inters else None
        return (x_new, buf), ys

    (x, _), ys = jax.lax.scan(body, (x, buf), xs_in)
    if return_inters:
        xs = jnp.concatenate([(latents.astype(dtype) * t[0])[None], ys[0]], axis=0)
        eps = ys[1]
    else:
        xs = eps = None
    return _finalize(denoise, x, t_steps[-1], xs, eps, denoise_to_zero, return_inters)


# ---------------------------------------------------------------------------
# UniPC predictor-corrector (solvers.py:718-821, solver_utils.py:174-287)
# ---------------------------------------------------------------------------


def unipc_sampler(denoise, latents, t_steps, *, max_order=3, predict_x0=True,
                  lower_order_final=True, variant="bh2", afs=False,
                  denoise_to_zero=False, return_inters=False, dtype=jnp.float32,
                  coeffs=None, **_):
    co = (coeffs if coeffs is not None else
          multistep.unipc_coeffs(t_steps, max_order, predict_x0,
                                 lower_order_final, variant))
    x, t = _prepare(latents, t_steps, dtype)
    n = len(t_steps) - 1

    def model_from(x_val, t_val, afs_flag):
        d = _eps_from(denoise, x_val, t_val, afs_flag)
        if predict_x0:
            return dynamic_thresholding(x_val - t_val * d)
        return d

    # Seed the buffer with the model output at t_0 (solvers.py:780-787).
    m_init = model_from(x, t[0], jnp.asarray(bool(afs)))
    buf = jnp.concatenate([m_init[None], jnp.zeros((2,) + x.shape, dtype)], axis=0)

    xs_in = (
        jnp.asarray(co.t_next, dtype),
        jnp.asarray(co.alpha, dtype),
        jnp.asarray(co.h_phi_1, dtype),
        jnp.asarray(co.B_h, dtype),
        jnp.asarray(co.inv_rks, dtype),
        jnp.asarray(co.rhos_p, dtype),
        jnp.asarray(co.rhos_c, dtype),
        jnp.asarray(co.rhos_c_last, dtype),
        jnp.asarray(co.use_corrector),
    )

    def body(state, inputs):
        x, buf = state
        t_next, alpha, h_phi_1, b_h, inv_rks, rhos_p, rhos_c, rhos_c_last, use_corr = inputs
        m0 = buf[0]
        # D1s_k = (model_prev_k - model_prev_0) / r_k, zero in unused slots.
        d1s = (buf[1:] - m0) * inv_rks.reshape((2,) + (1,) * m0.ndim)
        scale = 1.0 if predict_x0 else t_next
        x_t_ = alpha * x - scale * h_phi_1 * m0
        pred = jnp.tensordot(rhos_p, d1s, axes=1)
        x_pred = x_t_ - scale * b_h * pred

        def with_corrector(x_t_, d1s, m0):
            if predict_x0:
                model_t = dynamic_thresholding(denoise(x_pred, t_next))
            else:
                model_t = (x_pred - denoise(x_pred, t_next)) / t_next
            corr = jnp.tensordot(rhos_c, d1s, axes=1)
            x_t = x_t_ - scale * b_h * (corr + rhos_c_last * (model_t - m0))
            return x_t, model_t

        def without_corrector(x_t_, d1s, m0):
            return x_pred, m0

        x_new, model_t = jax.lax.cond(use_corr, with_corrector, without_corrector,
                                      x_t_, d1s, m0)
        buf = jnp.concatenate([model_t[None], buf[:-1]], axis=0)
        ys = x_new if return_inters else None
        return (x_new, buf), ys

    (x, _), ys = jax.lax.scan(body, (x, buf), xs_in)
    if return_inters:
        xs = jnp.concatenate([(latents.astype(dtype) * t[0])[None], ys], axis=0)
    else:
        xs = None
    return _finalize(denoise, x, t_steps[-1], xs, None, denoise_to_zero, return_inters)


# ---------------------------------------------------------------------------
# Registry + NFE accounting
# ---------------------------------------------------------------------------

SOLVER_REGISTRY = {
    "euler": euler_sampler,
    "heun": heun_sampler,
    "dpm": dpm_2_sampler,
    "ipndm": ipndm_sampler,
    "ipndm_v": ipndm_v_sampler,
    "deis": deis_sampler,
    "dpmpp": dpm_pp_sampler,
    "unipc": unipc_sampler,
}


def get_sampler(name: str):
    try:
        return SOLVER_REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown solver '{name}'; available: {sorted(SOLVER_REGISTRY)}")


def count_nfe(solver: str, num_steps: int, afs: bool = False,
              denoise_to_zero: bool = False, cfg_doubled: bool = False) -> int:
    """Exact NFE accounting, mirroring `diff-solvers-main/sample.py:210-219`.

    Note: the UniPC corrector's in-update net call is counted as 1 NFE per
    step by the reference convention (same branch as other 1-NFE solvers).
    """
    if solver in ("dpm", "heun"):
        nfe = 2 * (num_steps - 1) - 1 if afs else 2 * (num_steps - 1)
    else:
        nfe = num_steps - 2 if afs else num_steps - 1
    if denoise_to_zero:
        nfe += 1
    return 2 * nfe if cfg_doubled else nfe
