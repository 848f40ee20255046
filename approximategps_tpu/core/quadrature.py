"""Expectation quadrature (L3 of SURVEY.md §1).

The reference gets ``expected_loglikelihood(quadrature, lik, q_f, y)`` from
GPLikelihoods.jl with Gauss–Hermite nodes from FastGaussQuadrature
(``Project.toml:10``; consumed at
``src/SparseVariationalApproximationModule.jl:25,355``).  TPU version: the
Gauss–Hermite sum is a fixed-node-count broadcasted reduction — node count is
static so the whole ELBO stays a single jittable graph; nodes/weights are
computed by numpy at trace time and baked in as constants.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .pytrees import pytree_dataclass, static_field

__all__ = [
    "GaussHermite",
    "MonteCarlo",
    "Analytic",
    "DefaultExpectationMethod",
    "expected_loglikelihood",
    "gauss_hermite_points",
]


@lru_cache(maxsize=32)
def _hermgauss(n: int) -> tuple[np.ndarray, np.ndarray]:
    xs, ws = np.polynomial.hermite.hermgauss(n)
    return xs, ws


def _safe_sqrt(var: jax.Array) -> jax.Array:
    """sqrt clamped at zero with a finite gradient everywhere.

    Marginal variances come from a cancellation (prior − AᵀA + (BᵀA)ᵀ(BᵀA))
    and can dip slightly negative in f32; a bare sqrt would NaN the ELBO and
    its gradients (ADVICE r1).  The ``where``-both-sides pattern keeps the
    gradient 0 (not inf) on the clamped branch."""
    tiny = jnp.asarray(jnp.finfo(jnp.result_type(var)).tiny, var.dtype)
    return jnp.where(var > 0, jnp.sqrt(jnp.maximum(var, tiny)), 0.0)


def gauss_hermite_points(n: int, mean: jax.Array, var: jax.Array):
    """Gauss–Hermite abscissae/weights for E_{N(mean, var)}[g(f)].

    Returns (f_nodes, weights) with f_nodes shape (n,) + mean.shape and
    weights shape (n,) normalized to sum to 1.
    """
    xs, ws = _hermgauss(n)
    dtype = jnp.result_type(mean)
    xs = jnp.asarray(xs, dtype=dtype)
    ws = jnp.asarray(ws / math.sqrt(math.pi), dtype=dtype)
    sigma = _safe_sqrt(var)
    f_nodes = mean[None, ...] + math.sqrt(2.0) * sigma[None, ...] * xs.reshape(
        (n,) + (1,) * mean.ndim
    )
    return f_nodes, ws


@pytree_dataclass
class GaussHermite:
    """Fixed-order Gauss–Hermite quadrature (GPLikelihoods' GaussHermite)."""

    n_points: int = static_field(default=20)

    def expected_loglik(self, lik, q_mean, q_var, y):
        f_nodes, ws = gauss_hermite_points(self.n_points, q_mean, q_var)
        lls = lik.log_prob(f_nodes, y[None, ...])  # (n_points, N)
        return jnp.tensordot(ws, lls, axes=1)


@pytree_dataclass
class MonteCarlo:
    """Monte-Carlo expectation (GPLikelihoods' MonteCarloExpectation)."""

    n_samples: int = static_field(default=20)
    key: jax.Array = None

    def expected_loglik(self, lik, q_mean, q_var, y):
        if self.key is None:
            raise ValueError(
                "MonteCarlo requires an explicit PRNG key: MonteCarlo(n, key=...)."
                " A fixed default key would silently reuse identical samples"
                " every step."
            )
        eps = jax.random.normal(
            self.key, (self.n_samples,) + q_mean.shape, dtype=q_mean.dtype
        )
        f_samples = q_mean[None, ...] + _safe_sqrt(q_var)[None, ...] * eps
        lls = lik.log_prob(f_samples, y[None, ...])
        return jnp.mean(lls, axis=0)


@pytree_dataclass
class Analytic:
    """Force the closed-form expectation (errors if the likelihood has none)."""

    def expected_loglik(self, lik, q_mean, q_var, y):
        out = lik.expected_log_prob_analytic(q_mean, q_var, y)
        if out is None:
            raise ValueError(
                f"{type(lik).__name__} has no analytic expected log-likelihood"
            )
        return out


@pytree_dataclass
class DefaultExpectationMethod:
    """Analytic when available, else Gauss–Hermite — mirrors GPLikelihoods'
    ``DefaultExpectationMethod`` used at
    ``src/SparseVariationalApproximationModule.jl:345``."""

    n_points: int = static_field(default=20)

    def expected_loglik(self, lik, q_mean, q_var, y):
        out = lik.expected_log_prob_analytic(q_mean, q_var, y)
        if out is not None:
            return out
        return GaussHermite(self.n_points).expected_loglik(lik, q_mean, q_var, y)


def expected_loglikelihood(quadrature, lik, q_mean, q_var, y) -> jax.Array:
    """Per-point E_{q(f_i)}[log p(y_i | f_i)], shape (N,).

    ``q_mean``/``q_var`` are the marginal means/variances of q(f) (the output
    of ``marginals`` in the reference)."""
    return quadrature.expected_loglik(lik, q_mean, q_var, y)
