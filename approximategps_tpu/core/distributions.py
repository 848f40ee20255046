"""Gaussian distributions + KL divergences.

The reference imports ``MvNormal``/``AbstractMvNormal``, ``marginals`` and
``kldivergence`` from Distributions.jl / AbstractGPs.jl (SURVEY.md §2.2).
TPU-native version: a pytree Gaussian parameterized by (mean, lower Cholesky
factor) — the factor-first representation avoids refactorizing covariances
(the reference repeatedly re-choleskys via ``_chol_cov``, ``src/utils.jl:17``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import linalg
from .pytrees import pytree_dataclass

__all__ = ["MultivariateNormal", "DiagNormal", "kl_divergence", "mvnormal_from_cov"]

_LOG2PI = math.log(2.0 * math.pi)


@pytree_dataclass
class MultivariateNormal:
    """N(mean, scale_tril @ scale_tril^T)."""

    mean: jax.Array
    scale_tril: jax.Array

    @property
    def dim(self) -> int:
        return self.mean.shape[-1]

    def cov(self) -> jax.Array:
        L = self.scale_tril
        return L @ jnp.swapaxes(L, -1, -2)

    def var(self) -> jax.Array:
        return jnp.sum(self.scale_tril**2, axis=-1)

    def stddev(self) -> jax.Array:
        return jnp.sqrt(self.var())

    def marginals(self) -> tuple[jax.Array, jax.Array]:
        """Per-point (mean, variance) — AbstractGPs.marginals."""
        return self.mean, self.var()

    def sample(self, key: jax.Array, sample_shape: tuple[int, ...] = ()) -> jax.Array:
        eps = jax.random.normal(
            key, sample_shape + self.mean.shape, dtype=self.mean.dtype
        )
        return self.mean + eps @ jnp.swapaxes(self.scale_tril, -1, -2)

    def log_prob(self, x: jax.Array) -> jax.Array:
        d = self.dim
        delta = x - self.mean
        alpha = linalg.solve_lower_triangular(self.scale_tril, delta)
        quad = jnp.sum(alpha * alpha, axis=-1)
        return -0.5 * (d * _LOG2PI + quad) - linalg.tril_logdet(self.scale_tril)

    def logdet_cov(self) -> jax.Array:
        return linalg.chol_logdet(self.scale_tril)


@pytree_dataclass
class DiagNormal:
    """Independent N(mean_i, var_i) — the `marginals` product distribution."""

    mean: jax.Array
    var: jax.Array

    def stddev(self) -> jax.Array:
        return jnp.sqrt(self.var)

    def marginals(self) -> tuple[jax.Array, jax.Array]:
        return self.mean, self.var

    def sample(self, key: jax.Array, sample_shape: tuple[int, ...] = ()) -> jax.Array:
        eps = jax.random.normal(
            key, sample_shape + self.mean.shape, dtype=self.mean.dtype
        )
        return self.mean + eps * jnp.sqrt(self.var)

    def log_prob(self, x: jax.Array) -> jax.Array:
        return jnp.sum(
            -0.5 * (_LOG2PI + jnp.log(self.var) + (x - self.mean) ** 2 / self.var),
            axis=-1,
        )


def mvnormal_from_cov(mean: jax.Array, cov: jax.Array, jitter: float | None = None) -> MultivariateNormal:
    return MultivariateNormal(mean, linalg.safe_cholesky(cov, jitter))


def kl_divergence(q: MultivariateNormal, p: MultivariateNormal) -> jax.Array:
    """KL(q ‖ p) for multivariate Gaussians, closed form.

    Used for the Centered SVGP prior KL
    (``kldivergence(sva.q, sva.fz)`` at
    ``src/SparseVariationalApproximationModule.jl:362``).
    """
    Lq, Lp = q.scale_tril, p.scale_tril
    d = q.dim
    # tr(Σp^{-1} Σq) = ||Lp^{-1} Lq||_F^2
    M = linalg.solve_lower_triangular(Lp, Lq)
    trace_term = jnp.sum(M * M, axis=(-1, -2))
    delta = p.mean - q.mean
    alpha = linalg.solve_lower_triangular(Lp, delta)
    quad = jnp.sum(alpha * alpha, axis=-1)
    logdet_term = linalg.chol_logdet(Lp) - linalg.chol_logdet(Lq)
    return 0.5 * (trace_term + quad - d + logdet_term)
