"""Iterative (CG/SLQ) exact-GP tests: CG posterior == Cholesky posterior;
chunked matvec == dense; SLQ logpdf approximates the exact logpdf."""

import jax
import jax.numpy as jnp
import numpy as np

import approximategps_tpu as agp
from approximategps_tpu.models.iterative import (
    cg_solve,
    kernel_matvec,
    logpdf_slq,
    posterior_cg,
)


def _setup(key, N=40):
    k1, k2 = jax.random.split(key)
    kern = 1.5 * agp.with_lengthscale(agp.Matern52Kernel(), 0.8)
    f = agp.GP(kern)
    x = jnp.sort(jax.random.uniform(k1, (N,)) * 8)
    fx = f(x, 0.1)
    y = fx.sample(k2)
    return f, fx, x, y


def test_cg_solve_matches_direct(key):
    k1, k2 = jax.random.split(key)
    n = 30
    A = jax.random.normal(k1, (n, n))
    K = A @ A.T + n * jnp.eye(n)
    B = jax.random.normal(k2, (n, 4))
    X = cg_solve(lambda v: K @ v, B, tol=1e-12, maxiter=200)
    np.testing.assert_allclose(X, np.linalg.solve(np.asarray(K), np.asarray(B)), atol=1e-8)
    # vector form
    xv = cg_solve(lambda v: K @ v, B[:, 0], tol=1e-12, maxiter=200)
    np.testing.assert_allclose(xv, X[:, 0], atol=1e-10)


def test_kernel_matvec_chunked_matches_dense(key):
    f, fx, x, y = _setup(key)
    V = jax.random.normal(jax.random.PRNGKey(3), (len(x), 3))
    dense = (np.asarray(fx.cov())) @ np.asarray(V)
    mv_full = kernel_matvec(f.kernel, x, fx.noise)
    mv_blocked = kernel_matvec(f.kernel, x, fx.noise, block_size=7)
    np.testing.assert_allclose(mv_full(V), dense, atol=1e-10)
    np.testing.assert_allclose(mv_blocked(V), dense, atol=1e-10)


def test_cg_posterior_matches_cholesky(key):
    f, fx, x, y = _setup(key)
    post_chol = agp.posterior(fx, y)
    post_cg = posterior_cg(fx, y, tol=1e-12, block_size=16)
    xt = jnp.linspace(-1, 9, 11)
    np.testing.assert_allclose(post_cg.mean(xt), post_chol.mean(xt), atol=1e-7)
    np.testing.assert_allclose(post_cg.var(xt), post_chol.var(xt), atol=1e-7)
    np.testing.assert_allclose(post_cg.cov(xt), post_chol.cov(xt), atol=1e-7)
    m1, v1 = post_cg.mean_and_var(xt)
    m2, v2 = post_chol.mean_and_var(xt)
    np.testing.assert_allclose(m1, m2, atol=1e-7)
    np.testing.assert_allclose(v1, v2, atol=1e-7)


def test_slq_logpdf_approximates_exact(key):
    f, fx, x, y = _setup(key, N=60)
    exact = float(fx.logpdf(y))
    approx = float(
        logpdf_slq(
            fx, y, jax.random.PRNGKey(0), num_probes=64, lanczos_iters=50,
            block_size=16,
        )
    )
    # SLQ is stochastic in the logdet; with 64 probes expect ~ few % of logdet
    assert abs(approx - exact) / abs(exact) < 0.05, (approx, exact)
