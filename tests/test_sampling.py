"""Pathwise (decoupled) sampling tests: RFF features approximate the kernel;
sampled posterior functions match the analytic posterior moments."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import approximategps_tpu as agp
from approximategps_tpu.models.sampling import rff_features, sample_svgp_functions
from approximategps_tpu.models.vfe import optimal_variational_posterior


@pytest.mark.parametrize(
    "kern",
    [
        2.0 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.7),
        agp.with_lengthscale(agp.Matern32Kernel(), 1.2),
        0.5 * agp.Matern52Kernel(),
        agp.Matern12Kernel(),
    ],
    ids=["se", "m32", "m52", "m12"],
)
def test_rff_approximates_kernel(kern, key):
    X = jnp.linspace(-1.5, 1.5, 9)[:, None]
    phi = rff_features(key, kern, 1, num_features=200_000)
    P = phi(X)
    K_hat = P @ P.T
    K = kern.gram(X)
    np.testing.assert_allclose(np.asarray(K_hat), np.asarray(K), atol=2e-2)


def test_pathwise_samples_match_posterior_moments(key):
    k1, k2, k3 = jax.random.split(key, 3)
    N, M = 12, 12
    kern = 1.5 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.8)
    f = agp.GP(kern)
    x = jnp.linspace(0, 4, N)
    fx = f(x, 0.05)
    y = fx.sample(k1)
    fz = f(x, 1e-8)  # z == x: posterior == exact GPR
    q = optimal_variational_posterior(fz, fx, y)
    sva = agp.SparseVariationalApproximation(fz, q, agp.Centered())
    post = agp.posterior(sva)

    fs = sample_svgp_functions(k2, post, num_samples=2000, num_features=2048)
    xt = jnp.linspace(-0.5, 4.5, 15)
    samples = fs(xt)  # (S, 15)

    mu, var = post.mean_and_var(xt)
    emp_mu = samples.mean(axis=0)
    emp_var = samples.var(axis=0)
    np.testing.assert_allclose(np.asarray(emp_mu), np.asarray(mu), atol=0.1)
    np.testing.assert_allclose(np.asarray(emp_var), np.asarray(var), atol=0.1)


def test_pathwise_noncentered_matches_centered(key):
    k1, k2 = jax.random.split(key)
    N, M = 10, 5
    kern = agp.with_lengthscale(agp.SqExponentialKernel(), 1.0)
    f = agp.GP(kern)
    x = jnp.linspace(0, 3, N)
    z = x[:M]
    fz = f(z, 1e-6)
    # whitened q
    m_eps = jnp.linspace(-0.2, 0.3, M)
    q_n = agp.MultivariateNormal(m_eps, 0.5 * jnp.eye(M))
    sva_n = agp.SparseVariationalApproximation(fz, q_n, agp.NonCentered())
    post_n = agp.posterior(sva_n)

    fs = sample_svgp_functions(k2, post_n, num_samples=2000, num_features=2048)
    xt = jnp.linspace(0, 3, 7)
    samples = fs(xt)
    mu, var = post_n.mean_and_var(xt)
    np.testing.assert_allclose(samples.mean(axis=0), np.asarray(mu), atol=0.1)
    np.testing.assert_allclose(samples.var(axis=0), np.asarray(var), atol=0.1)


def test_cg_pathwise_samples_match_exact_posterior(key):
    """Matheron CG samples (iterative engine) reproduce the exact posterior
    moments, including with chunked matvecs and a preconditioner."""
    from approximategps_tpu.models.sampling import sample_posterior_functions_cg

    k1, k2 = jax.random.split(key)
    N = 24
    kern = 1.5 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.8)
    f = agp.GP(kern)
    x = jnp.linspace(0, 4, N)
    fx = f(x, 0.05)
    y = fx.sample(k1)
    exact = agp.posterior(fx, y)

    fs = sample_posterior_functions_cg(
        k2, fx, y, num_samples=2000, num_features=2048, tol=1e-10,
        block_size=8, precond_rank=6,
    )
    xt = jnp.linspace(-0.5, 4.5, 13)
    samples = fs(xt)
    mu, var = exact.mean_and_var(xt)
    np.testing.assert_allclose(samples.mean(axis=0), np.asarray(mu), atol=0.1)
    np.testing.assert_allclose(samples.var(axis=0), np.asarray(var), atol=0.1)
