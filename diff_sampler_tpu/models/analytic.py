"""Analytic denoisers: closed-form posterior means for known data distributions.

Two uses:
  1. Test fixtures: a Gaussian data distribution gives an *exact* denoiser and
     an exact probability-flow ODE solution, enabling solver order-of-
     convergence tests (the reference has no tests; see SURVEY.md section 4).
  2. The diff-analyzer 'optimal sampler': posterior mean over a finite
     dataset (`diff-analyzer-main/solvers.py:20-31,774-867`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["GaussianDenoiser", "DatasetPosteriorDenoiser"]


class GaussianDenoiser:
    """Exact denoiser for data ~ N(mu, diag(var)).

    D(x, sigma) = mu + var / (var + sigma^2) * (x - mu)

    The probability-flow ODE dx/dt = (x - D)/t then has the closed-form
    solution  x(t) - mu = (x(T) - mu) * sqrt((var + t^2) / (var + T^2)),
    used as ground truth in solver convergence tests.
    """

    def __init__(self, mu, var, sigma_min=0.002, sigma_max=80.0):
        self.mu = jnp.asarray(mu)
        self.var = jnp.asarray(var)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)

    def __call__(self, x, sigma):
        sigma = jnp.asarray(sigma, x.dtype)
        return self.mu + self.var / (self.var + sigma**2) * (x - self.mu)

    def exact_solution(self, x_T, t_from, t_to):
        scale = jnp.sqrt((self.var + t_to**2) / (self.var + t_from**2))
        return self.mu + (x_T - self.mu) * scale


class DatasetPosteriorDenoiser:
    """Closed-form posterior mean over a finite dataset (the 'optimal'
    denoiser of diff-analyzer, `solvers.py:20-31`):

        D(x, t) = sum_i softmax_i(-||x - y_i||^2 / (2 t^2)) * y_i

    Vectorized over the batch with one matmul-shaped distance computation
    (the reference loops per sample).
    """

    def __init__(self, dataset, sigma_min=0.002, sigma_max=80.0):
        d = jnp.asarray(dataset)
        self.dataset = d.reshape(d.shape[0], -1)  # [M, D]
        self.data_shape = d.shape[1:]
        self.sq_norms = jnp.sum(self.dataset**2, axis=1)  # [M]
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)

    def __call__(self, x, sigma):
        sigma = jnp.asarray(sigma, x.dtype)
        xb = x.reshape(x.shape[0], -1)  # [B, D]
        # ||x - y||^2 = ||x||^2 - 2 x.y + ||y||^2; the x-norm term is constant
        # across the softmax and drops out.
        logits = (xb @ self.dataset.T - 0.5 * self.sq_norms) / (sigma**2)  # [B, M]
        w = jax.nn.softmax(logits, axis=1)
        d = w @ self.dataset  # [B, D]
        return d.reshape(x.shape)
