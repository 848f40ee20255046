"""GP abstractions (L2 of SURVEY.md §1): GP, FiniteGP, LatentGP, exact posterior.

The reference imports these from AbstractGPs.jl (``GP``, ``FiniteGP = f(x, Σy)``,
``LatentGP``/``LatentFiniteGP``, ``PosteriorGP``, ``ApproxPosteriorGP`` — see
imports at ``src/SparseVariationalApproximationModule.jl:14-24``).  Built here
as pytree dataclasses; the exact-GP path (``posterior(fx, y)``, ``logpdf``) is
the f64 test oracle required by the reference test strategy (SURVEY.md §4.1).

Noise convention for ``FiniteGP`` (mirrors AbstractGPs' ``f(x, Σy)``):
- scalar σ²  → isotropic σ²·I  (the only form the Gaussian SVGP elbo accepts,
  cf. the dispatch restriction at
  ``src/SparseVariationalApproximationModule.jl:307-317``)
- (N,) vector → diagonal
- (N, N) matrix → full
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from . import linalg
from .distributions import DiagNormal, MultivariateNormal
from .kernels import Kernel, as_points
from .likelihoods import Likelihood, as_likelihood
from .means import ZeroMean
from .pytrees import pytree_dataclass, static_field

__all__ = [
    "AbstractGP",
    "GP",
    "FiniteGP",
    "LatentGP",
    "LatentFiniteGP",
    "PosteriorGP",
    "CholeskyRep",
    "posterior",
    "logpdf",
    "predict_in_blocks",
]


class AbstractGP:
    """Internal AbstractGPs-style API: mean/cov/var/mean_and_cov/mean_and_var."""

    def mean(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def cov(self, x: jax.Array, z: jax.Array | None = None) -> jax.Array:
        raise NotImplementedError

    def var(self, x: jax.Array) -> jax.Array:
        return jnp.diagonal(self.cov(x))

    def mean_and_cov(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        return self.mean(x), self.cov(x)

    def mean_and_var(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        return self.mean(x), self.var(x)

    def __call__(self, x: jax.Array, noise: jax.Array | float = 0.0) -> "FiniteGP":
        return FiniteGP(self, jnp.asarray(x), jnp.asarray(noise))


@pytree_dataclass
class GP(AbstractGP):
    """GP prior: f ~ GP(mean_fn, kernel). ``GP(kernel)`` gives zero mean."""

    kernel: Kernel
    mean_fn: Any = None

    def __post_init__(self):
        if self.mean_fn is None:
            object.__setattr__(self, "mean_fn", ZeroMean())

    def mean(self, x):
        return self.mean_fn(as_points(x))

    def cov(self, x, z=None):
        return self.kernel.gram(x, z)

    def var(self, x):
        return self.kernel.diag(x)


def _noise_cov(noise: jax.Array, n: int, dtype) -> jax.Array:
    noise = jnp.asarray(noise, dtype)
    if noise.ndim == 0:
        return noise * jnp.eye(n, dtype=dtype)
    if noise.ndim == 1:
        return jnp.diag(noise)
    return noise


def _noise_diag(noise: jax.Array, n: int, dtype) -> jax.Array:
    noise = jnp.asarray(noise, dtype)
    if noise.ndim == 0:
        return jnp.full((n,), noise, dtype=dtype)
    if noise.ndim == 1:
        return noise
    return jnp.diagonal(noise)


@pytree_dataclass
class FiniteGP:
    """The multivariate-normal restriction of ``f`` to inputs ``x`` with
    observation covariance determined by ``noise`` — AbstractGPs' ``f(x, Σy)``."""

    f: AbstractGP
    x: jax.Array
    noise: jax.Array = 0.0

    def __len__(self) -> int:
        return as_points(self.x).shape[0]

    @property
    def is_isotropic_noise(self) -> bool:
        return jnp.ndim(self.noise) == 0

    def mean(self) -> jax.Array:
        return self.f.mean(self.x)

    def cov(self) -> jax.Array:
        n = len(self)
        K = self.f.cov(self.x)
        return K + _noise_cov(self.noise, n, K.dtype)

    def var(self) -> jax.Array:
        v = self.f.var(self.x)
        return v + _noise_diag(self.noise, v.shape[0], v.dtype)

    def mean_and_cov(self):
        return self.mean(), self.cov()

    def mean_and_var(self):
        return self.mean(), self.var()

    def scale_tril(self) -> jax.Array:
        return linalg.safe_cholesky(self.cov())

    def to_mvn(self) -> MultivariateNormal:
        return MultivariateNormal(self.mean(), self.scale_tril())

    def marginals(self) -> DiagNormal:
        """Per-point Normal(μ_i, σ_i²) — AbstractGPs.marginals."""
        m, v = self.mean_and_var()
        return DiagNormal(m, v)

    def sample(self, key: jax.Array, sample_shape: tuple[int, ...] = ()) -> jax.Array:
        return self.to_mvn().sample(key, sample_shape)

    rand = sample  # AbstractGPs naming

    def logpdf(self, y: jax.Array) -> jax.Array:
        return self.to_mvn().log_prob(y)


@pytree_dataclass
class LatentGP:
    """Prior + likelihood wrapper — AbstractGPs.LatentGP(f, lik, Σy)."""

    f: AbstractGP
    lik: Any
    jitter: jax.Array = 1e-8

    def __call__(self, x: jax.Array) -> "LatentFiniteGP":
        return LatentFiniteGP(self.f(x, self.jitter), as_likelihood(self.lik))


class LatentSample(NamedTuple):
    f: jax.Array
    y: jax.Array


@pytree_dataclass
class LatentFiniteGP:
    """AbstractGPs.LatentFiniteGP: latent FiniteGP + observation likelihood."""

    fx: FiniteGP
    lik: Likelihood

    def __len__(self) -> int:
        return len(self.fx)

    def sample(self, key: jax.Array) -> LatentSample:
        kf, ky = jax.random.split(key)
        f = self.fx.sample(kf)
        y = self.lik.conditional_sample(ky, f)
        return LatentSample(f, y)

    rand = sample

    def logpdf(self, fy: LatentSample | tuple[jax.Array, jax.Array]) -> jax.Array:
        f, y = fy
        return self.fx.logpdf(f) + jnp.sum(self.lik.log_prob(f, y))


# ---------------------------------------------------------------------------
# Exact posterior (the test oracle of SURVEY.md §4.1)
# ---------------------------------------------------------------------------


@pytree_dataclass
class CholeskyRep:
    """Posterior precision representation via the Cholesky factor of the
    observed covariance C = K(x,x) + Σy (exact GP regression)."""

    L: jax.Array

    def whiten(self, X: jax.Array) -> jax.Array:
        """V with V^T V = X^T C^{-1} X (here V = L^{-1} X)."""
        return linalg.solve_lower_triangular(self.L, X)

    def logdet(self) -> jax.Array:
        return linalg.chol_logdet(self.L)


@pytree_dataclass
class PosteriorGP(AbstractGP):
    """Exact-form posterior GP with data cache (α, rep, x, δ) — the JAX
    analogue of AbstractGPs.PosteriorGP.  ``rep`` abstracts the precision
    representation so the Vecchia approximation can masquerade as an exact
    posterior exactly as the reference does with ``InvRoot``
    (``src/NearestNeighborsModule.jl:97-106``)."""

    prior: AbstractGP
    x: jax.Array
    alpha: jax.Array
    rep: Any
    delta: jax.Array | None = None

    def mean(self, xs):
        return self.prior.mean(xs) + self.prior.cov(self.x, xs).T @ self.alpha

    def cov(self, xs, zs=None):
        Kxs = self.prior.cov(self.x, xs)
        Vx = self.rep.whiten(Kxs)
        if zs is None:
            return self.prior.cov(xs) - linalg.At_A(Vx)
        Kzs = self.prior.cov(self.x, zs)
        Vz = self.rep.whiten(Kzs)
        return self.prior.cov(xs, zs) - Vx.T @ Vz

    def var(self, xs):
        Kxs = self.prior.cov(self.x, xs)
        Vx = self.rep.whiten(Kxs)
        # clamp: f32 cancellation AND approximate precisions (Vecchia) can
        # push the diagonal slightly negative; a variance is never negative
        return jnp.maximum(self.prior.var(xs) - linalg.diag_At_A(Vx), 0.0)

    def mean_and_cov(self, xs):
        Kxs = self.prior.cov(self.x, xs)
        mu = self.prior.mean(xs) + Kxs.T @ self.alpha
        Vx = self.rep.whiten(Kxs)
        return mu, self.prior.cov(xs) - linalg.At_A(Vx)

    def mean_and_var(self, xs):
        Kxs = self.prior.cov(self.x, xs)
        mu = self.prior.mean(xs) + Kxs.T @ self.alpha
        Vx = self.rep.whiten(Kxs)
        return mu, jnp.maximum(self.prior.var(xs) - linalg.diag_At_A(Vx), 0.0)


def posterior(fx: FiniteGP, y: jax.Array) -> PosteriorGP:
    """Exact GP regression posterior — AbstractGPs.posterior(fx, y)."""
    L = fx.scale_tril()
    delta = y - fx.mean()
    alpha = linalg.cholesky_solve(L, delta)
    return PosteriorGP(
        prior=fx.f, x=as_points(fx.x), alpha=alpha, rep=CholeskyRep(L), delta=delta
    )


def logpdf(fx: FiniteGP, y: jax.Array) -> jax.Array:
    """Exact log marginal likelihood — AbstractGPs.logpdf(fx, y)."""
    return fx.logpdf(y)


def predict_in_blocks(post: AbstractGP, xs: jax.Array, block_size: int = 8192):
    """(mean, var) of ``post`` at a large test set, computed in blocks with
    ``lax.map`` — bounds peak memory at O(train_size · block_size) for the
    cross-covariance, enabling million-point prediction sweeps on one chip."""
    X = as_points(xs)
    n = X.shape[0]
    bs = min(block_size, n)
    pad = (-n) % bs
    Xp = jnp.concatenate([X, jnp.zeros((pad, X.shape[1]), X.dtype)]) if pad else X
    blocks = Xp.reshape(-1, bs, X.shape[1])

    def one(block):
        return post.mean_and_var(block)

    mu, var = jax.lax.map(one, blocks)
    return mu.reshape(-1)[:n], var.reshape(-1)[:n]
