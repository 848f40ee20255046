"""Core tests: linalg primitives, Gaussian distributions + KL, exact GP
objects and regression oracle (logpdf vs scipy), latent GP sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

import approximategps_tpu as agp
from approximategps_tpu.core import linalg


def _rand_psd(key, n, jitter=1e-3):
    A = jax.random.normal(key, (n, n))
    return A @ A.T + jitter * jnp.eye(n)


def test_linalg_primitives(key):
    k1, k2 = jax.random.split(key)
    A = _rand_psd(k1, 6)
    B = jax.random.normal(k2, (6, 4))
    L = linalg.safe_cholesky(A)
    np.testing.assert_allclose(L @ L.T, A, atol=1e-10)
    np.testing.assert_allclose(
        linalg.solve_lower_triangular(L, B), np.linalg.solve(np.asarray(L), B), atol=1e-10
    )
    np.testing.assert_allclose(
        linalg.cholesky_solve(L, B), np.linalg.solve(np.asarray(A), B), atol=1e-8
    )
    np.testing.assert_allclose(
        linalg.chol_logdet(L), np.linalg.slogdet(np.asarray(A))[1], atol=1e-10
    )
    np.testing.assert_allclose(linalg.At_A(B), np.asarray(B).T @ np.asarray(B), atol=1e-12)
    np.testing.assert_allclose(
        linalg.diag_At_A(B), np.diag(np.asarray(B).T @ np.asarray(B)), atol=1e-12
    )
    np.testing.assert_allclose(
        linalg.Xt_invA_X(L, B),
        np.asarray(B).T @ np.linalg.solve(np.asarray(A), np.asarray(B)),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        linalg.diag_Xt_invA_X(L, B),
        np.diag(np.asarray(B).T @ np.linalg.solve(np.asarray(A), np.asarray(B))),
        atol=1e-8,
    )


def test_mvnormal_logprob_vs_scipy(key):
    k1, k2, k3 = jax.random.split(key, 3)
    n = 5
    cov = _rand_psd(k1, n)
    mean = jax.random.normal(k2, (n,))
    x = jax.random.normal(k3, (n,))
    q = agp.mvnormal_from_cov(mean, cov)
    ref = scipy.stats.multivariate_normal(np.asarray(mean), np.asarray(cov)).logpdf(
        np.asarray(x)
    )
    np.testing.assert_allclose(q.log_prob(x), ref, rtol=1e-10)
    np.testing.assert_allclose(q.cov(), cov, atol=1e-10)
    np.testing.assert_allclose(q.var(), np.diag(np.asarray(cov)), atol=1e-10)


def test_kl_divergence_closed_form(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = 4
    q = agp.mvnormal_from_cov(jax.random.normal(k1, (n,)), _rand_psd(k2, n))
    p = agp.mvnormal_from_cov(jax.random.normal(k3, (n,)), _rand_psd(k4, n))
    Sq, Sp = np.asarray(q.cov()), np.asarray(p.cov())
    mq, mp = np.asarray(q.mean), np.asarray(p.mean)
    Spi = np.linalg.inv(Sp)
    kl_ref = 0.5 * (
        np.trace(Spi @ Sq)
        + (mp - mq) @ Spi @ (mp - mq)
        - n
        + np.linalg.slogdet(Sp)[1]
        - np.linalg.slogdet(Sq)[1]
    )
    np.testing.assert_allclose(agp.kl_divergence(q, p), kl_ref, rtol=1e-10)
    # KL(q ‖ q) == 0
    np.testing.assert_allclose(agp.kl_divergence(q, q), 0.0, atol=1e-10)


def test_exact_gp_regression_oracle(key):
    k1, k2 = jax.random.split(key)
    f = agp.GP(agp.Matern52Kernel())
    x = jnp.linspace(-2, 2, 8)
    noise = 0.05
    fx = f(x, noise)
    y = fx.sample(k1)

    post = agp.posterior(fx, y)
    # direct numpy computation
    K = np.asarray(f.cov(x))
    Ky = K + noise * np.eye(8)
    alpha = np.linalg.solve(Ky, np.asarray(y))
    xs = jnp.linspace(-3, 3, 11)
    Ks = np.asarray(f.cov(x, xs))
    Kss = np.asarray(f.cov(xs))
    np.testing.assert_allclose(post.mean(xs), Ks.T @ alpha, atol=1e-10)
    np.testing.assert_allclose(
        post.cov(xs), Kss - Ks.T @ np.linalg.solve(Ky, Ks), atol=1e-8
    )
    np.testing.assert_allclose(post.var(xs), np.diag(np.asarray(post.cov(xs))), atol=1e-10)

    # logpdf vs scipy
    ref = scipy.stats.multivariate_normal(np.zeros(8), Ky).logpdf(np.asarray(y))
    np.testing.assert_allclose(fx.logpdf(y), ref, rtol=1e-10)


def test_finite_gp_noise_forms(key):
    f = agp.GP(agp.SqExponentialKernel())
    x = jnp.linspace(0, 1, 4)
    s2 = 0.3
    iso = f(x, s2)
    diag = f(x, jnp.full(4, s2))
    full = f(x, s2 * jnp.eye(4))
    for fx in (diag, full):
        np.testing.assert_allclose(iso.cov(), fx.cov(), atol=1e-12)
        np.testing.assert_allclose(iso.var(), fx.var(), atol=1e-12)
    assert iso.is_isotropic_noise and not diag.is_isotropic_noise


def test_mean_functions(key):
    x = jnp.linspace(0, 1, 5)
    f_const = agp.GP(agp.SqExponentialKernel(), agp.ConstMean(2.0))
    np.testing.assert_allclose(f_const.mean(x), np.full(5, 2.0))
    f_fn = agp.GP(agp.SqExponentialKernel(), agp.FunctionMean(lambda p: jnp.sin(p[0])))
    np.testing.assert_allclose(f_fn.mean(x), np.sin(np.asarray(x)), atol=1e-12)
    # posterior with a nonzero mean reproduces it far from data
    fx = f_const(x, 1e-3)
    y = jnp.full(5, 2.0)
    post = agp.posterior(fx, y)
    np.testing.assert_allclose(post.mean(jnp.array([100.0])), [2.0], atol=1e-6)


def test_latent_gp_sampling_and_logpdf(key):
    lf = agp.LatentGP(agp.GP(agp.SqExponentialKernel()), agp.BernoulliLikelihood(), 1e-8)
    lfx = lf(jnp.linspace(0, 1, 6))
    s = lfx.sample(key)
    assert s.f.shape == (6,)
    assert s.y.shape == (6,)
    assert set(np.asarray(s.y)).issubset({0, 1})
    lp = lfx.logpdf((s.f, s.y))
    assert np.isfinite(lp)


def test_finite_gp_sample_statistics(key):
    f = agp.GP(agp.SqExponentialKernel())
    x = jnp.linspace(0, 1, 3)
    fx = f(x, 0.01)
    samples = fx.sample(key, (20000,))
    emp_cov = np.cov(np.asarray(samples).T)
    np.testing.assert_allclose(emp_cov, fx.cov(), atol=0.05)
    np.testing.assert_allclose(samples.mean(axis=0), np.zeros(3), atol=0.05)


def test_blocked_cholesky_and_inverse(key):
    from approximategps_tpu.core.linalg import blocked_cholesky, blocked_tril_inv

    # 96 (≤ base² recursion), 300 (uneven split) cover the recursion shapes;
    # a 640 case added 15 s of CPU compile for no new code path
    for n in [96, 300]:
        A = jax.random.normal(jax.random.fold_in(key, n), (n, n))
        K = A @ A.T + n * jnp.eye(n)
        L = jax.jit(lambda K: blocked_cholesky(K, base=64))(K)
        np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(K), rtol=1e-10)
        assert np.allclose(np.asarray(L), np.tril(np.asarray(L)))
        Li = jax.jit(lambda L: blocked_tril_inv(L, base=64))(L)
        np.testing.assert_allclose(np.asarray(Li @ L), np.eye(n), atol=1e-10)
    # gradients agree with jnp.linalg.cholesky (compared through a symmetric
    # parameterization K = A Aᵀ — raw K-cotangent triangle conventions differ)
    n = 96
    A = jax.random.normal(key, (n, n))
    g1 = jax.jit(jax.grad(
        lambda A: jnp.sum(jnp.sin(blocked_cholesky(A @ A.T + n * jnp.eye(n), base=32)))
    ))(A)
    g2 = jax.jit(jax.grad(
        lambda A: jnp.sum(jnp.sin(jnp.linalg.cholesky(A @ A.T + n * jnp.eye(n))))
    ))(A)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-9)


def test_predict_in_blocks(key):
    f = agp.GP(agp.Matern32Kernel())
    x = jnp.linspace(0, 5, 20)
    fx = f(x, 0.05)
    y = fx.sample(key)
    post = agp.posterior(fx, y)
    xt = jnp.linspace(-1, 6, 57)  # non-multiple of block
    mu_b, var_b = jax.jit(
        lambda xt: agp.predict_in_blocks(post, xt, block_size=10)
    )(xt)
    mu, var = jax.jit(post.mean_and_var)(xt)
    np.testing.assert_allclose(mu_b, mu, atol=1e-12)
    np.testing.assert_allclose(var_b, var, atol=1e-12)
    # SVGP posterior too
    fz = f(x[:6], 1e-6)
    q = agp.MultivariateNormal(jnp.zeros(6), jnp.eye(6))
    sp = agp.posterior(agp.SparseVariationalApproximation(fz, q))
    mu_b, var_b = jax.jit(
        lambda xt: agp.predict_in_blocks(sp, xt, block_size=8)
    )(xt)
    mu, var = jax.jit(sp.mean_and_var)(xt)
    np.testing.assert_allclose(mu_b, mu, atol=1e-12)
    np.testing.assert_allclose(var_b, var, atol=1e-12)
