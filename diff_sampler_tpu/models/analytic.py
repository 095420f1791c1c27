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

__all__ = [
    "GaussianDenoiser",
    "DatasetPosteriorDenoiser",
    "IsotropicGaussianDenoiser",
    "LowRankGaussianDenoiser",
    "MixtureGaussianDenoiser",
]


def _sigma_col(sigma, dtype) -> "jax.Array":
    """sigma (scalar or per-sample [B]) -> column [B or 1, 1] that broadcasts
    against flattened [B, D] data (AMED passes per-sample midpoints)."""
    return jnp.asarray(sigma, dtype).reshape(-1, 1)


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
        s2 = _sigma_col(sigma, x.dtype) ** 2  # [B or 1, 1]
        xb = x.reshape(x.shape[0], -1)  # [B, D]
        # ||x - y||^2 = ||x||^2 - 2 x.y + ||y||^2; the x-norm term is constant
        # across the softmax and drops out.
        logits = (xb @ self.dataset.T - 0.5 * self.sq_norms) / s2  # [B, M]
        w = jax.nn.softmax(logits, axis=1)
        d = w @ self.dataset  # [B, D]
        return d.reshape(x.shape)


class IsotropicGaussianDenoiser:
    """'full_rank_gaussian' score approximation of main_extend.ipynb: data
    ~ N(mu, I), so  D(x, t) = (t^2 mu + x) / (1 + t^2)
    (`diff-analyzer-main/main_extend.ipynb`, customized_sampler cell)."""

    def __init__(self, mu, sigma_min=0.002, sigma_max=80.0):
        self.mu = jnp.asarray(mu).reshape(-1)  # [D]
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)

    def __call__(self, x, sigma):
        t2 = _sigma_col(sigma, jnp.float32) ** 2  # [B or 1, 1]
        xb = x.reshape(x.shape[0], -1)
        d = (self.mu * t2 + xb) / (1.0 + t2)
        return d.reshape(x.shape).astype(x.dtype)


class LowRankGaussianDenoiser:
    """'low_rank_gaussian' score approximation: data ~ N(mu, U diag(lam) U^T)
    with a rank-q eigendecomposition of the empirical covariance, giving

        D(x, t) = mu + U diag(lam / (t^2 + lam)) U^T (x - mu)

    (main_extend.ipynb customized_sampler; the reference computes the
    eigenbasis with torch.pca_lowrank -- `from_data` uses an exact
    eigendecomposition of the covariance instead)."""

    def __init__(self, mu, eigvecs, eigvals, sigma_min=0.002, sigma_max=80.0):
        self.mu = jnp.asarray(mu).reshape(-1)       # [D]
        self.U = jnp.asarray(eigvecs)               # [D, q]
        self.lam = jnp.asarray(eigvals).reshape(-1)  # [q]
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)

    @classmethod
    def from_data(cls, data, rank, **kw):
        import numpy as np

        d = np.asarray(data, np.float64).reshape(len(data), -1)
        mu = d.mean(0)
        c = d - mu
        # top-`rank` eigenpairs of cov = C^T C / (n-1) via SVD of C
        _u, s, vt = np.linalg.svd(c, full_matrices=False)
        lam = (s**2 / (len(d) - 1))[:rank]
        return cls(mu.astype(np.float32), vt[:rank].T.astype(np.float32),
                   lam.astype(np.float32), **kw)

    def __call__(self, x, sigma):
        t2 = _sigma_col(sigma, jnp.float32) ** 2  # [B or 1, 1]
        xb = x.reshape(x.shape[0], -1) - self.mu
        proj = (xb @ self.U) * (self.lam / (t2 + self.lam))
        d = self.mu + proj @ self.U.T
        return d.reshape(x.shape).astype(x.dtype)


class MixtureGaussianDenoiser:
    """'low/full_rank_mog' score approximation: per-class Gaussians
    N(mu_k, Sigma_k) combined with posterior responsibilities

        w_k(x, t) ~ softmax_k log N(x; mu_k, Sigma_k + t^2 I)
        D(x, t)   = sum_k w_k(x, t) D_k(x, t)

    where D_k is the per-component Gaussian denoiser (main_extend.ipynb,
    softmax_k_logN + customized_sampler).  Components are Isotropic- or
    LowRank- GaussianDenoisers."""

    def __init__(self, components, sigma_min=0.002, sigma_max=80.0):
        self.components = list(components)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)

    @classmethod
    def from_labeled_data(cls, data, labels, rank=None, **kw):
        import numpy as np

        data = np.asarray(data, np.float32).reshape(len(data), -1)
        labels = np.asarray(labels)
        if labels.ndim == 2:  # one-hot
            labels = labels.argmax(1)
        comps = []
        for k in sorted(set(labels.tolist())):
            dk = data[labels == k]
            if rank is None:
                comps.append(IsotropicGaussianDenoiser(dk.mean(0), **kw))
            else:
                comps.append(LowRankGaussianDenoiser.from_data(dk, rank, **kw))
        return cls(comps, **kw)

    def _log_prob(self, comp, xb, t2):
        """log N(x; mu, Sigma + t^2 I) up to a shared constant.
        t2: per-sample [B or 1] sigma^2."""
        d = xb.shape[1]
        mu = comp.mu
        if isinstance(comp, IsotropicGaussianDenoiser):
            # Sigma = I  ->  Sigma + t^2 I = (1 + t^2) I
            q = jnp.sum((xb - mu) ** 2, axis=1) / (1.0 + t2)
            logdet = d * jnp.log1p(t2)
        else:
            # Sigma = U diag(lam) U^T (+ 0 off-subspace) + t^2 I
            c = xb - mu
            proj = c @ comp.U  # [B, q]
            # quadratic form: ||c||^2/t^2 - proj^T (1/t^2 - 1/(t^2+lam)) proj
            q = (jnp.sum(c**2, axis=1) / t2
                 - jnp.sum(proj**2 * (1.0 / t2[:, None]
                                      - 1.0 / (t2[:, None] + comp.lam)),
                           axis=1))
            logdet = ((d - comp.lam.shape[0]) * jnp.log(t2)
                      + jnp.sum(jnp.log(t2[:, None] + comp.lam), axis=1))
        return -0.5 * (q + logdet)

    def __call__(self, x, sigma):
        t2 = _sigma_col(sigma, jnp.float32).reshape(-1) ** 2  # [B or 1]
        xb = x.reshape(x.shape[0], -1)
        logps = jnp.stack([self._log_prob(c, xb, t2) for c in self.components],
                          axis=1)  # [B, K]
        w = jax.nn.softmax(logps, axis=1)
        ds = jnp.stack([c(x, sigma).reshape(x.shape[0], -1)
                        for c in self.components], axis=1)  # [B, K, D]
        d = jnp.einsum("bk,bkd->bd", w, ds)
        return d.reshape(x.shape).astype(x.dtype)
