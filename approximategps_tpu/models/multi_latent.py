"""Multi-latent SVGP: likelihoods driven by SEVERAL independent latent GPs.

A genuine extension beyond the reference, which restricts every
approximation to single-latent likelihoods
(``src/LaplaceApproximationModule.jl:167-179`` raises for multi-latent;
GPLikelihoods' multi-output machinery is never consumed).  Covers the two
standard cases:

- heteroscedastic regression: ``y ~ N(f¹, exp(f²))`` with a mean GP and a
  log-variance GP (:class:`HeteroscedasticGaussianLikelihood`),
- multi-class classification: ``y ~ Categorical(softmax(f¹..f^C))``
  (:class:`SoftmaxLikelihood`).

Design: one :class:`~approximategps_tpu.models.svgp.SparseVariationalApproximation`
per latent (independent priors and independent variational posteriors — the
mean-field-across-latents factorization standard for these models); the data
term integrates the joint likelihood over the PRODUCT of the per-latent
marginals with a tensor-product Gauss–Hermite grid (n^L nodes, L small) or
Monte Carlo; the KL term is the sum of per-latent KLs.  Everything is one
jittable graph — the per-latent posterior projections batch over latents via
``vmap`` when the shapes agree.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gp import FiniteGP, LatentFiniteGP
from ..core.pytrees import pytree_dataclass, static_field
from .api import approx_lml, posterior
from .svgp import SparseVariationalApproximation, prior_kl

__all__ = [
    "MultiLatentLikelihood",
    "HeteroscedasticGaussianLikelihood",
    "SoftmaxLikelihood",
    "MultiLatentSVGP",
    "multi_latent_elbo",
]

_LOG2PI = math.log(2.0 * math.pi)


class MultiLatentLikelihood:
    """Base: log p(y | f) with f a vector of L latent values per point."""

    n_latent: int

    def log_prob(self, F: jax.Array, y: jax.Array) -> jax.Array:
        """F: (..., L); y: (...) → log-density (...)."""
        raise NotImplementedError

    def conditional_sample(self, key, F):
        raise NotImplementedError


@pytree_dataclass
class HeteroscedasticGaussianLikelihood(MultiLatentLikelihood):
    """y ~ N(f¹, exp(f²)) — latent mean + latent log-variance (2 latents)."""

    n_latent = 2

    def log_prob(self, F, y):
        mu = F[..., 0]
        log_var = F[..., 1]
        return -0.5 * (_LOG2PI + log_var + (y - mu) ** 2 * jnp.exp(-log_var))

    def conditional_sample(self, key, F):
        mu = F[..., 0]
        sigma = jnp.exp(0.5 * F[..., 1])
        return mu + sigma * jax.random.normal(key, mu.shape, dtype=mu.dtype)


@pytree_dataclass
class SoftmaxLikelihood(MultiLatentLikelihood):
    """y ∈ {0..C−1} ~ Categorical(softmax(f¹..f^C)) — C latents."""

    n_classes: int = static_field()

    @property
    def n_latent(self):
        return self.n_classes

    def log_prob(self, F, y):
        logZ = jax.scipy.special.logsumexp(F, axis=-1)
        fy = jnp.take_along_axis(F, y[..., None].astype(jnp.int32), axis=-1)[..., 0]
        return fy - logZ

    def conditional_sample(self, key, F):
        return jax.random.categorical(key, F, axis=-1)


@pytree_dataclass
class MultiLatentSVGP:
    """A tuple of per-latent SVGPs + a multi-latent likelihood."""

    svas: tuple  # tuple[SparseVariationalApproximation, ...]
    lik: MultiLatentLikelihood


@lru_cache(maxsize=16)
def _gh_grid(n: int, L: int):
    """Tensor-product Gauss–Hermite grid: nodes (n^L, L), weights (n^L,)
    normalized for E over L independent standard normals."""
    xs, ws = np.polynomial.hermite.hermgauss(n)
    xs = xs * math.sqrt(2.0)
    ws = ws / math.sqrt(math.pi)
    grids = np.meshgrid(*([xs] * L), indexing="ij")
    nodes = np.stack([g.ravel() for g in grids], axis=-1)  # (n^L, L)
    weights = np.ones(n**L)
    for g in np.meshgrid(*([ws] * L), indexing="ij"):
        weights = weights * g.ravel()
    return nodes, weights


def expected_loglik_multi(
    lik: MultiLatentLikelihood,
    q_means: jax.Array,
    q_vars: jax.Array,
    y: jax.Array,
    n_points: int = 20,
    mc_key=None,
    n_samples: int = 128,
) -> jax.Array:
    """Per-point E_{∏_l N(μ_l, σ_l²)}[log p(y | f₁..f_L)], shape (N,).

    Tensor-product Gauss–Hermite for small L (n_points^L nodes); pass
    ``mc_key`` to use Monte Carlo instead (needed for large L)."""
    L = q_means.shape[-1]
    sigma = jnp.sqrt(jnp.maximum(q_vars, 0.0))
    if mc_key is not None:
        eps = jax.random.normal(
            mc_key, (n_samples,) + q_means.shape, dtype=q_means.dtype
        )
        F = q_means[None] + sigma[None] * eps  # (S, N, L)
        return jnp.mean(lik.log_prob(F, y[None]), axis=0)
    nodes, weights = _gh_grid(n_points, L)
    nodes = jnp.asarray(nodes, q_means.dtype)  # (Q, L)
    weights = jnp.asarray(weights, q_means.dtype)
    F = q_means[None, :, :] + sigma[None, :, :] * nodes[:, None, :]  # (Q, N, L)
    lls = lik.log_prob(F, y[None])  # (Q, N)
    return jnp.tensordot(weights, lls, axes=1)


def multi_latent_elbo(
    ml: MultiLatentSVGP,
    x: jax.Array,
    y: jax.Array,
    num_data: int | None = None,
    n_gh: int = 20,
    mc_key=None,
) -> jax.Array:
    """ELBO = Σᵢ E_{∏ q(fᵢ^l)}[log p(yᵢ|fᵢ)]·scale − Σ_l KL_l."""
    means, variances = [], []
    for sva in ml.svas:
        post = posterior(sva)
        mu_l, var_l = post.mean_and_var(x)
        means.append(mu_l)
        variances.append(var_l)
    q_means = jnp.stack(means, axis=-1)  # (N, L)
    q_vars = jnp.stack(variances, axis=-1)
    ell = expected_loglik_multi(ml.lik, q_means, q_vars, y, n_points=n_gh, mc_key=mc_key)
    n_batch = y.shape[0]
    scale = 1.0 if num_data is None else num_data / n_batch
    kl = sum(prior_kl(sva) for sva in ml.svas)
    return jnp.sum(ell) * scale - kl


@posterior.register(MultiLatentSVGP)
def _posterior_multi(ml: MultiLatentSVGP, *_, **__):
    """Per-latent posteriors (independent), as a tuple."""
    return tuple(posterior(sva) for sva in ml.svas)


@approx_lml.register(MultiLatentSVGP)
def _approx_lml_multi(ml: MultiLatentSVGP, lfx, ys, **kwargs):
    x = lfx.x if isinstance(lfx, FiniteGP) else lfx.fx.x
    return multi_latent_elbo(ml, x, ys, **kwargs)
