"""Observation likelihoods (L3 of SURVEY.md §1).

The reference reexports GPLikelihoods.jl (``src/ApproximateGPs.jl:6``) and
consumes ``BernoulliLikelihood``, ``PoissonLikelihood``, ``GaussianLikelihood``
and ``expected_loglikelihood``.  Here each likelihood is a pytree with:

- ``log_prob(f, y)``: pointwise log p(y|f) (broadcastable — used inside the
  vmapped Gauss–Hermite sum),
- ``log_prob_d1_d2(f, y)``: (Σll, ∂ll/∂f, ∂²ll/∂f²) with closed forms where
  cheap, autodiff otherwise — feeds the Laplace Newton iteration
  (replacing the nested ForwardDiff at
  ``src/LaplaceApproximationModule.jl:230-241``),
- ``expected_log_prob_analytic``: closed-form variational expectation where
  one exists (Gaussian / exp-link Poisson / exp-link Exponential / Gamma),
- ``conditional_sample(key, f)``: sample y|f (for ``rand(lfx)`` parity).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, log_ndtr, ndtr

from .pytrees import pytree_dataclass, static_field

__all__ = [
    "Likelihood",
    "GaussianLikelihood",
    "BernoulliLikelihood",
    "PoissonLikelihood",
    "ExponentialLikelihood",
    "GammaLikelihood",
    "NegativeBinomialLikelihood",
    "GaussNewtonLikelihood",
    "StudentTLikelihood",
    "FunctionLikelihood",
    "as_likelihood",
]

_LOG2PI = math.log(2.0 * math.pi)


class Likelihood:
    def log_prob(self, f: jax.Array, y: jax.Array) -> jax.Array:
        raise NotImplementedError

    def expected_log_prob_analytic(self, q_mean, q_var, y):
        """Closed-form E_{N(q_mean, q_var)}[log p(y|f)] or None."""
        return None

    def log_prob_d1_d2(self, f: jax.Array, y: jax.Array):
        """(sum of log_prob, dll/df per point, d2ll/df2 per point).

        Default: forward-over-forward autodiff of the scalar log_prob,
        vmapped over points — the JAX analogue of the reference's nested
        ForwardDiff (``src/LaplaceApproximationModule.jl:230-241``).
        """

        def l(_f, _y):
            return self.log_prob(_f, _y)

        dl = jax.grad(l)
        d2l = jax.grad(dl)
        ll = jnp.sum(self.log_prob(f, y))
        d1 = jax.vmap(dl)(f, y)
        d2 = jax.vmap(d2l)(f, y)
        return ll, d1, d2

    def conditional_sample(self, key: jax.Array, f: jax.Array) -> jax.Array:
        raise NotImplementedError

    def fisher_information(self, f: jax.Array, y: jax.Array):
        """Per-point Fisher information E_{y~p(·|f)}[−∂²/∂f² log p(y|f)],
        or None if no closed form is implemented.  Always ≥ 0 — the PSD
        curvature surrogate used by :class:`GaussNewtonLikelihood` for
        non-log-concave likelihoods."""
        return None


@pytree_dataclass
class GaussianLikelihood(Likelihood):
    """y | f ~ N(f, σ²) — GPLikelihoods.GaussianLikelihood(σ²)."""

    obs_variance: jax.Array = 1.0

    def log_prob(self, f, y):
        s2 = jnp.asarray(self.obs_variance)
        return -0.5 * (_LOG2PI + jnp.log(s2) + (y - f) ** 2 / s2)

    def expected_log_prob_analytic(self, q_mean, q_var, y):
        s2 = jnp.asarray(self.obs_variance)
        return -0.5 * (_LOG2PI + jnp.log(s2) + ((y - q_mean) ** 2 + q_var) / s2)

    def log_prob_d1_d2(self, f, y):
        s2 = jnp.asarray(self.obs_variance)
        ll = jnp.sum(self.log_prob(f, y))
        d1 = (y - f) / s2
        d2 = jnp.full_like(f, -1.0 / s2)
        return ll, d1, d2

    def fisher_information(self, f, y):
        return jnp.full_like(f, 1.0 / jnp.asarray(self.obs_variance, f.dtype))

    def conditional_sample(self, key, f):
        s = jnp.sqrt(jnp.asarray(self.obs_variance))
        return f + s * jax.random.normal(key, f.shape, dtype=f.dtype)


@pytree_dataclass
class BernoulliLikelihood(Likelihood):
    """y | f ~ Bernoulli(invlink(f)); default logistic link (GPLikelihoods
    default).  ``link='probit'`` gives the normal-CDF link."""

    link: str = static_field(default="logit")

    def log_prob(self, f, y):
        y = y.astype(f.dtype) if hasattr(y, "astype") else jnp.asarray(y, f.dtype)
        if self.link == "logit":
            # y*f - log(1 + e^f), numerically stable
            return y * f - jnp.logaddexp(0.0, f)
        elif self.link == "probit":
            z = (2.0 * y - 1.0) * f
            return log_ndtr(z)
        raise ValueError(f"unknown Bernoulli link: {self.link}")

    def log_prob_d1_d2(self, f, y):
        y = jnp.asarray(y, f.dtype)
        ll = jnp.sum(self.log_prob(f, y))
        if self.link == "logit":
            p = jax.nn.sigmoid(f)
            d1 = y - p
            d2 = -p * (1.0 - p)
            return ll, d1, d2
        return super().log_prob_d1_d2(f, y)

    def conditional_sample(self, key, f):
        if self.link == "logit":
            p = jax.nn.sigmoid(f)
        else:
            p = ndtr(f)
        return jax.random.bernoulli(key, p).astype(jnp.int32)


@pytree_dataclass
class PoissonLikelihood(Likelihood):
    """y | f ~ Poisson(invlink(f)); default exp link (GPLikelihoods default)."""

    link: str = static_field(default="exp")

    def _log_rate(self, f):
        if self.link == "exp":
            return f
        elif self.link == "softplus":
            return jnp.log(jax.nn.softplus(f))
        raise ValueError(f"unknown Poisson link: {self.link}")

    def log_prob(self, f, y):
        y = jnp.asarray(y, f.dtype)
        log_rate = self._log_rate(f)
        return y * log_rate - jnp.exp(log_rate) - gammaln(y + 1.0)

    def expected_log_prob_analytic(self, q_mean, q_var, y):
        if self.link != "exp":
            return None
        y = jnp.asarray(y, q_mean.dtype)
        # E[y f - e^f - log y!] = y μ - e^{μ + v/2} - log y!
        return y * q_mean - jnp.exp(q_mean + 0.5 * q_var) - gammaln(y + 1.0)

    def log_prob_d1_d2(self, f, y):
        y = jnp.asarray(y, f.dtype)
        ll = jnp.sum(self.log_prob(f, y))
        if self.link == "exp":
            rate = jnp.exp(f)
            return ll, y - rate, -rate
        return super().log_prob_d1_d2(f, y)

    def conditional_sample(self, key, f):
        rate = jnp.exp(self._log_rate(f))
        return jax.random.poisson(key, rate)


@pytree_dataclass
class ExponentialLikelihood(Likelihood):
    """y | f ~ Exponential(scale = invlink(f)); default exp link."""

    link: str = static_field(default="exp")

    def log_prob(self, f, y):
        y = jnp.asarray(y, f.dtype)
        if self.link != "exp":
            raise ValueError("only exp link implemented")
        # scale θ = e^f: ll = -f - y e^{-f}
        return -f - y * jnp.exp(-f)

    def expected_log_prob_analytic(self, q_mean, q_var, y):
        if self.link != "exp":
            return None
        y = jnp.asarray(y, q_mean.dtype)
        return -q_mean - y * jnp.exp(-q_mean + 0.5 * q_var)

    def conditional_sample(self, key, f):
        return jax.random.exponential(key, f.shape, dtype=f.dtype) * jnp.exp(f)


@pytree_dataclass
class GammaLikelihood(Likelihood):
    """y | f ~ Gamma(shape=α, scale=invlink(f)); default exp link."""

    shape_param: jax.Array = 1.0
    link: str = static_field(default="exp")

    def log_prob(self, f, y):
        y = jnp.asarray(y, f.dtype)
        a = jnp.asarray(self.shape_param, f.dtype)
        if self.link != "exp":
            raise ValueError("only exp link implemented")
        return (a - 1.0) * jnp.log(y) - y * jnp.exp(-f) - a * f - gammaln(a)

    def expected_log_prob_analytic(self, q_mean, q_var, y):
        if self.link != "exp":
            return None
        y = jnp.asarray(y, q_mean.dtype)
        a = jnp.asarray(self.shape_param, q_mean.dtype)
        return (
            (a - 1.0) * jnp.log(y)
            - y * jnp.exp(-q_mean + 0.5 * q_var)
            - a * q_mean
            - gammaln(a)
        )

    def conditional_sample(self, key, f):
        a = jnp.asarray(self.shape_param, f.dtype)
        return jax.random.gamma(key, a, f.shape, dtype=f.dtype) * jnp.exp(f)


@pytree_dataclass
class NegativeBinomialLikelihood(Likelihood):
    """y | f ~ NegativeBinomial(r, p) with a logistic link — the
    GPLikelihoods.jl ``NegativeBinomialLikelihood`` the reference reexports
    (``src/ApproximateGPs.jl:6``).

    Two parametrizations (GPLikelihoods ``NBParamSuccess``/``NBParamFailure``):

    - ``param="success"`` (default): ``r`` = number of successes, success
      probability ``p = sigmoid(f)``; y counts failures before the r-th
      success.
    - ``param="failure"``: ``r`` = number of failures, failure probability
      ``sigmoid(f)`` — identical to "success" with ``f → −f``.

    log p(y|f) = log C(y+r−1, y) − r·softplus(−f) − y·softplus(f) is
    log-concave in f (∂²ll = −(r+y)·σ(f)σ(−f) ≤ 0), so plain Laplace Newton
    applies; the Fisher information is r·σ(−f)."""

    successes: jax.Array = 1.0
    param: str = static_field(default="success")

    def _signed_f(self, f):
        if self.param == "success":
            return f
        if self.param == "failure":
            return -f
        raise ValueError(f"unknown NegativeBinomial param: {self.param!r}")

    def log_prob(self, f, y):
        y = jnp.asarray(y, f.dtype)
        r = jnp.asarray(self.successes, f.dtype)
        g = self._signed_f(f)
        # log σ(g) = −softplus(−g), log σ(−g) = −softplus(g)
        return (
            gammaln(y + r)
            - gammaln(r)
            - gammaln(y + 1.0)
            - r * jax.nn.softplus(-g)
            - y * jax.nn.softplus(g)
        )

    def log_prob_d1_d2(self, f, y):
        y = jnp.asarray(y, f.dtype)
        r = jnp.asarray(self.successes, f.dtype)
        sgn = 1.0 if self.param == "success" else -1.0
        g = self._signed_f(f)
        ll = jnp.sum(self.log_prob(f, y))
        p = jax.nn.sigmoid(g)
        q = jax.nn.sigmoid(-g)
        d1 = sgn * (r * q - y * p)
        d2 = -(r + y) * p * q  # sgn² = 1
        return ll, d1, d2

    def fisher_information(self, f, y):
        r = jnp.asarray(self.successes, f.dtype)
        return r * jax.nn.sigmoid(-self._signed_f(f))

    def conditional_sample(self, key, f):
        # Gamma–Poisson mixture: λ ~ Gamma(r, scale=(1−p)/p), y ~ Poisson(λ)
        r = jnp.asarray(self.successes, f.dtype)
        g = self._signed_f(f)
        kg, kp = jax.random.split(key)
        lam = jax.random.gamma(kg, r, f.shape, dtype=f.dtype) * jnp.exp(-g)
        return jax.random.poisson(kp, lam)


@pytree_dataclass
class StudentTLikelihood(Likelihood):
    """y | f ~ StudentT(ν, loc=f, scale=σ)."""

    df: jax.Array = 3.0
    scale: jax.Array = 1.0

    def log_prob(self, f, y):
        y = jnp.asarray(y, f.dtype)
        nu = jnp.asarray(self.df, f.dtype)
        s = jnp.asarray(self.scale, f.dtype)
        z = (y - f) / s
        return (
            gammaln(0.5 * (nu + 1.0))
            - gammaln(0.5 * nu)
            - 0.5 * jnp.log(nu * jnp.pi)
            - jnp.log(s)
            - 0.5 * (nu + 1.0) * jnp.log1p(z * z / nu)
        )

    def conditional_sample(self, key, f):
        return f + jnp.asarray(self.scale, f.dtype) * jax.random.t(
            key, jnp.asarray(self.df, f.dtype), f.shape, dtype=f.dtype
        )

    def fisher_information(self, f, y):
        # E[−∂²/∂f² log p] = (ν+1)/((ν+3)σ²) (location-Fisher of Student-t)
        nu = jnp.asarray(self.df, f.dtype)
        s2 = jnp.asarray(self.scale, f.dtype) ** 2
        return jnp.full_like(f, (nu + 1.0) / ((nu + 3.0) * s2))


@pytree_dataclass
class GaussNewtonLikelihood(Likelihood):
    """PSD-curvature surrogate wrapper for non-log-concave likelihoods.

    The Laplace Newton iteration and its linear algebra require W = −∂²ll ≥ 0
    (``chol(I + √W K √W)``); heavy-tailed likelihoods (e.g.
    :class:`StudentTLikelihood`) have regions of negative W where the plain
    iteration produces NaNs.  This wrapper replaces the reported second
    derivative with a PSD surrogate while leaving ``log_prob`` and the first
    derivative untouched:

    - ``mode="clamp"``: W = max(−∂²ll, floor) — the observed curvature,
      floored (GPML-style),
    - ``mode="fisher"``: W = Fisher information E_y[−∂²ll] (requires the
      inner likelihood's :meth:`~Likelihood.fisher_information`) — the
      Gauss-Newton / Fisher-scoring choice (cf. Vanhatalo et al. 2009 for
      Student-t GPs; Immer et al. 2021 for GGN-Laplace).

    Semantics: the Newton FIXED POINT is unchanged (any PSD W preconditions
    the same stationarity condition f = K·∇ll), so the mode is exact; the
    Laplace lml, posterior covariance and IFT hyperparameter gradients use
    the surrogate curvature consistently (a generalized-Gauss-Newton Laplace
    approximation rather than the exact-Hessian one)."""

    inner: Likelihood
    mode: str = static_field(default="clamp")
    floor: float = static_field(default=1e-6)

    def log_prob(self, f, y):
        return self.inner.log_prob(f, y)

    def expected_log_prob_analytic(self, q_mean, q_var, y):
        return self.inner.expected_log_prob_analytic(q_mean, q_var, y)

    def conditional_sample(self, key, f):
        return self.inner.conditional_sample(key, f)

    def fisher_information(self, f, y):
        return self.inner.fisher_information(f, y)

    def log_prob_d1_d2(self, f, y):
        ll, d1, d2 = self.inner.log_prob_d1_d2(f, y)
        if self.mode == "fisher":
            fi = self.inner.fisher_information(f, y)
            if fi is None:
                raise NotImplementedError(
                    f"{type(self.inner).__name__} has no closed-form "
                    "fisher_information; use mode='clamp'"
                )
            return ll, d1, -fi
        if self.mode != "clamp":
            raise ValueError(f"unknown GaussNewton mode: {self.mode!r}")
        return ll, d1, jnp.minimum(d2, -jnp.asarray(self.floor, d2.dtype))


@pytree_dataclass
class FunctionLikelihood(Likelihood):
    """Wraps a user-supplied scalar ``logpdf(f, y)`` function — the analogue
    of passing an arbitrary ``dist_y_given_f`` closure to the reference
    (e.g. ``f -> Normal(f, noise_scale)`` at ``src/TestUtils.jl:90``)."""

    logpdf: Callable = static_field()
    sampler: Callable | None = static_field(default=None)

    def log_prob(self, f, y):
        return self.logpdf(f, y)

    def conditional_sample(self, key, f):
        if self.sampler is None:
            raise NotImplementedError("FunctionLikelihood has no sampler")
        return self.sampler(key, f)


def as_likelihood(obj) -> Likelihood:
    if isinstance(obj, Likelihood):
        return obj
    if callable(obj):
        return FunctionLikelihood(logpdf=obj)
    raise TypeError(f"cannot interpret {obj!r} as a likelihood")
