"""Hyperpriors and MAP objectives.

The reference delegates hyperparameter handling to user-side
ParameterHandling.jl closures (``examples/b-classification/script.jl:84-103``)
and has no hyperprior support; this module provides the standard MAP recipe
as a first-class helper: scalar log-density functions over CONSTRAINED
hyperparameter values, composed with the bijector that produced them (the
log|det Jacobian| of softplus etc. is included automatically so the MAP
objective is a proper density over the unconstrained optimization space).

All functions are pure jnp and jittable.
"""

from __future__ import annotations

import math
from typing import Callable, Mapping

import jax
import jax.numpy as jnp

from .bijectors import softplus

__all__ = [
    "normal_prior",
    "lognormal_prior",
    "gamma_prior",
    "halfnormal_prior",
    "log_prior",
    "map_objective",
]

_LOG2PI = math.log(2.0 * math.pi)


def normal_prior(loc=0.0, scale=1.0) -> Callable:
    """log N(theta; loc, scale²)."""

    def logpdf(theta):
        z = (theta - loc) / scale
        return jnp.sum(-0.5 * (z * z + _LOG2PI) - jnp.log(scale))

    return logpdf


def lognormal_prior(loc=0.0, scale=1.0) -> Callable:
    """log LogNormal(theta; loc, scale²) for theta > 0."""

    def logpdf(theta):
        lt = jnp.log(theta)
        z = (lt - loc) / scale
        return jnp.sum(-0.5 * (z * z + _LOG2PI) - jnp.log(scale) - lt)

    return logpdf


def gamma_prior(concentration=1.0, rate=1.0) -> Callable:
    """log Gamma(theta; α, rate) for theta > 0."""

    def logpdf(theta):
        a = jnp.asarray(concentration, jnp.result_type(theta))
        b = jnp.asarray(rate, jnp.result_type(theta))
        return jnp.sum(
            a * jnp.log(b) - jax.scipy.special.gammaln(a)
            + (a - 1.0) * jnp.log(theta) - b * theta
        )

    return logpdf


def halfnormal_prior(scale=1.0) -> Callable:
    """log HalfNormal(theta; scale) for theta > 0."""

    def logpdf(theta):
        z = theta / scale
        return jnp.sum(-0.5 * (z * z + _LOG2PI) - jnp.log(scale) + math.log(2.0))

    return logpdf


def _softplus_logdet(raw):
    """log|d softplus(raw)/d raw| = log sigmoid(raw)."""
    return jnp.sum(jax.nn.log_sigmoid(raw))


def log_prior(
    raw_params: Mapping[str, jax.Array],
    priors: Mapping[str, Callable],
    transform=softplus,
) -> jax.Array:
    """Σ log p(transform(raw_k)) + log|J_transform| over the keys in
    ``priors`` — the unconstrained-space density for MAP.

    ``transform`` applies to every prior-carrying leaf (default softplus;
    pass ``None`` for priors directly on the raw values)."""
    total = jnp.zeros(())
    for k, prior in priors.items():
        raw = raw_params[k]
        if transform is None:
            total = total + prior(raw)
        else:
            total = total + prior(transform(raw)) + _softplus_logdet(raw)
    return total


def map_objective(
    neg_lml: Callable,
    priors: Mapping[str, Callable],
    transform=softplus,
) -> Callable:
    """Wrap a ``neg_lml(raw_params) -> scalar`` into the MAP objective
    ``neg_lml(raw) − log p(constrained(raw))`` (still a minimisation)."""

    def objective(raw_params, *args, **kwargs):
        return neg_lml(raw_params, *args, **kwargs) - log_prior(
            raw_params, priors, transform
        )

    return objective
