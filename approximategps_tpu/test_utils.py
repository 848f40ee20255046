"""Shipped test utilities — the analogue of the reference's ``src/TestUtils.jl``
(shipped inside the package so downstream approximations can reuse them).

Includes the exact hardcoded Bernoulli fixture of ``src/TestUtils.jl:13-28``
(kept verbatim as a *shared test vector* so results are comparable with the
Julia reference), the standard latent-GP builder, and the conformance check
``test_approximation_predictions`` asserting (a) the internal GP interface
holds and (b) exact-GPR equivalence under a Gaussian likelihood
(``src/TestUtils.jl:74-109``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .core.gp import GP, LatentGP, posterior as exact_posterior
from .core.kernels import SqExponentialKernel, with_lengthscale
from .core.likelihoods import BernoulliLikelihood, FunctionLikelihood
from .models.api import posterior
from .utils.bijectors import softplus

__all__ = [
    "generate_data",
    "dist_y_given_f",
    "build_latent_gp",
    "check_internal_gp_interface",
    "test_approximation_predictions",
    "test_approx_lml",
]

# Fixed dataset (reference src/TestUtils.jl:13-28): X = range(0, 23.5, 48);
# Y was generated from a seeded Bernoulli(logistic(3 sin(10 + 0.6X) +
# sin(0.1X) − 1)) draw and then hardcoded for RNG stability.
_Y_FIXED = [0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 1, 0, 0, 0,
            0, 0, 0, 0, 1, 0, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]


def generate_data():
    X = np.linspace(0.0, 23.5, 48)
    Y = np.asarray(_Y_FIXED)
    return jnp.asarray(X), jnp.asarray(Y)


dist_y_given_f = BernoulliLikelihood()  # Bernoulli(logistic(f)), reference :30


def build_latent_gp(theta):
    """softplus-constrained SE kernel latent GP (reference :32-37)."""
    variance = softplus(theta[0])
    lengthscale = softplus(theta[1])
    kernel = variance * with_lengthscale(SqExponentialKernel(), lengthscale)
    return LatentGP(GP(kernel), dist_y_given_f, 1e-8)


def check_internal_gp_interface(rng_key, f_post, a, b, atol=1e-9):
    """The JAX analogue of AbstractGPs.TestUtils.test_internal_abstractgps_interface:
    consistency of mean/cov/var/mean_and_cov/mean_and_var, shapes, PSD-ness,
    sampling."""
    N_a = np.shape(a)[0]
    N_b = np.shape(b)[0]

    m = f_post.mean(a)
    assert m.shape == (N_a,)
    C = f_post.cov(a)
    assert C.shape == (N_a, N_a)
    v = f_post.var(a)
    assert v.shape == (N_a,)
    # cov is symmetric PSD (up to jitter)
    np.testing.assert_allclose(C, C.T, atol=1e-8)
    eigs = np.linalg.eigvalsh(np.asarray(C, dtype=np.float64))
    assert eigs.min() > -1e-6, f"cov not PSD: min eig {eigs.min()}"
    # diag(cov) == var
    np.testing.assert_allclose(np.diag(C), v, atol=1e-8)
    # mean_and_cov / mean_and_var consistency
    m2, C2 = f_post.mean_and_cov(a)
    np.testing.assert_allclose(m2, m, atol=atol)
    np.testing.assert_allclose(C2, C, atol=atol)
    m3, v3 = f_post.mean_and_var(a)
    np.testing.assert_allclose(m3, m, atol=atol)
    np.testing.assert_allclose(v3, v, atol=atol)
    # cross-covariance shape + consistency with joint
    Cab = f_post.cov(a, b)
    assert Cab.shape == (N_a, N_b)
    Cba = f_post.cov(b, a)
    np.testing.assert_allclose(Cab, Cba.T, atol=1e-8)
    # FiniteGP round trip: marginals & sampling
    fx = f_post(a, 1e-12)
    mm, vv = fx.marginals().marginals()
    np.testing.assert_allclose(mm, m, atol=1e-8)
    np.testing.assert_allclose(vv, v, atol=1e-6)
    s = fx.sample(rng_key)
    assert s.shape == (N_a,)


def test_approx_lml(approx, noise_scale=0.1, seed=123456, rtol=1e-4, atol=1e-5):
    """Conjugate-case evidence check: ``approx_lml(approx, LatentGP(f,
    GaussianLikelihood(σ²), 0)(x), y)`` approximately equals the exact log
    marginal likelihood ``logpdf(f(x, σ²), y)``.

    The reference declares this utility but leaves it unimplemented
    (``src/TestUtils.jl:39-55``); implemented here.  Holds for approximations
    that don't require variational optimisation (Laplace, NearestNeighbors
    with k=N−1); SVGP needs an optimal q and is checked elsewhere."""
    from .core.kernels import Matern32Kernel
    from .models.api import approx_lml
    from .models.vecchia import NearestNeighbors

    key = jax.random.PRNGKey(seed)
    N = 6
    f = GP(Matern32Kernel())
    x = jnp.linspace(-1.0, 1.0, N)
    fx = f(x, noise_scale**2)
    y = fx.sample(key)
    exact = fx.logpdf(y)

    if isinstance(approx, NearestNeighbors):
        # NearestNeighbors operates on a plain FiniteGP and its precision
        # root ignores observation noise (as in the reference, which tests it
        # with fx = GP(kern)(x, 0.0)) — compare noise-free evidences.
        fx0 = f(x, 0.0)
        # jitted (x concrete in the closure, as the generalized-ordering
        # host preprocessing requires): one cached graph per approx config
        got = jax.jit(lambda y: approx_lml(approx, fx0, y))(y)
        exact = fx0.logpdf(y)
    else:
        lik = FunctionLikelihood(
            logpdf=lambda fv, yv: -0.5 * ((yv - fv) / noise_scale) ** 2
            - jnp.log(noise_scale)
            - 0.5 * jnp.log(2 * jnp.pi),
        )
        lfx = LatentGP(f, lik, 0.0)(x)
        got = jax.jit(lambda y: approx_lml(approx, lfx, y))(y)
    np.testing.assert_allclose(float(got), float(exact), rtol=rtol, atol=atol)


def test_approximation_predictions(approx, noise_scale=0.1, seed=123456):
    """Conformance: interface holds and, for a Gaussian likelihood, the
    approximate posterior equals exact GP regression
    (reference ``src/TestUtils.jl:74-109``)."""
    from .core.kernels import Matern32Kernel

    key = jax.random.PRNGKey(seed)
    N_cond, N_a, N_b = 5, 6, 7

    f = GP(Matern32Kernel())
    x = jnp.linspace(-1.0, 1.0, N_cond)
    fx = f(x, noise_scale**2)
    key, k1, k2, k3 = jax.random.split(key, 4)
    y = fx.sample(k1)

    jitter = 0.0  # not needed in the Gaussian case
    lik = FunctionLikelihood(
        logpdf=lambda fv, yv: -0.5 * ((yv - fv) / noise_scale) ** 2
        - jnp.log(noise_scale)
        - 0.5 * jnp.log(2 * jnp.pi),
        sampler=lambda k, fv: fv + noise_scale * jax.random.normal(k, fv.shape),
    )
    lf = LatentGP(f, lik, jitter)
    # jitted build: the expensive part (e.g. the Newton solve) runs as one
    # cached graph; the returned posterior pytree has concrete leaves
    f_approx_post = jax.jit(lambda y: posterior(approx, lf(x), y))(y)

    a = jnp.linspace(-1.2, 1.2, N_a)
    b = jax.random.normal(k2, (N_b,))
    check_internal_gp_interface(k3, f_approx_post, a, b)

    # exact GPR equivalence for Gaussian likelihood
    f_exact_post = exact_posterior(f(x, noise_scale**2), y)
    xt = jnp.concatenate([x, jax.random.normal(key, (3,))])
    m_approx, c_approx = jax.jit(f_approx_post.mean_and_cov)(xt)
    m_exact, c_exact = jax.jit(f_exact_post.mean_and_cov)(xt)
    np.testing.assert_allclose(m_approx, m_exact, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(c_approx, c_exact, rtol=1e-5, atol=1e-7)
