"""LOO cross-validation (models/crossval.py, GPML §5.4.2).

Oracle: brute-force n-fold leave-one-out — delete point i, build the exact
posterior on the rest, predict y_i — must match the single-factorization
closed form to f64 precision."""

import jax
import jax.numpy as jnp
import numpy as np

import approximategps_tpu as agp
from approximategps_tpu.core.gp import posterior
from approximategps_tpu.models.crossval import loo_logpdf, loo_mean_and_var


def _setup(key, n=14, noise=0.2):
    f = agp.GP(agp.with_lengthscale(agp.Matern52Kernel(), 0.7))
    x = jnp.linspace(-2.0, 2.0, n)
    fx = f(x, noise)
    y = fx.sample(key)
    return f, x, y, fx


def _brute_force(f, x, y, noise, i):
    mask = jnp.arange(x.shape[0]) != i
    fx_rest = f(x[mask], noise)
    p = posterior(fx_rest, y[mask])
    mu, var = p.mean_and_var(x[i : i + 1])
    return mu[0], var[0] + jnp.asarray(noise)  # y-space: add obs noise


def test_loo_matches_brute_force(key):
    f, x, y, fx = _setup(key)
    mu, var = loo_mean_and_var(fx, y)
    for i in [0, 3, 7, 13]:
        mu_i, var_i = _brute_force(f, x, y, 0.2, i)
        np.testing.assert_allclose(mu[i], mu_i, rtol=1e-9)
        np.testing.assert_allclose(var[i], var_i, rtol=1e-9)


def test_loo_logpdf_matches_brute_force_sum(key):
    f, x, y, fx = _setup(key, n=10)
    total = 0.0
    for i in range(10):
        mu_i, var_i = _brute_force(f, x, y, 0.2, i)
        total += -0.5 * (
            jnp.log(2 * jnp.pi * var_i) + (y[i] - mu_i) ** 2 / var_i
        )
    np.testing.assert_allclose(loo_logpdf(fx, y), total, rtol=1e-9)


def test_loo_heteroscedastic_noise(key):
    """Per-point noise flows through C = K + diag(σ²)."""
    f = agp.GP(agp.SqExponentialKernel())
    x = jnp.linspace(0.0, 3.0, 9)
    noise = 0.05 + 0.1 * jnp.arange(9.0) / 9.0
    fx = f(x, noise)
    y = fx.sample(key)
    mu, var = loo_mean_and_var(fx, y)
    i = 4
    mask = jnp.arange(9) != i
    p = posterior(f(x[mask], noise[mask]), y[mask])
    m_i, v_i = p.mean_and_var(x[i : i + 1])
    np.testing.assert_allclose(mu[i], m_i[0], rtol=1e-9)
    np.testing.assert_allclose(var[i], v_i[0] + noise[i], rtol=1e-9)


def test_loo_logpdf_gradient_matches_fd(key):
    """GPML eq. 5.13 — here produced by jax.grad through the composite;
    FD-pinned on (log lengthscale, log noise)."""
    f0, x, y, _ = _setup(key, n=12)

    def obj(params):
        ls, ln = params
        f = agp.GP(agp.with_lengthscale(agp.Matern52Kernel(), jnp.exp(ls)))
        return loo_logpdf(f(x, jnp.exp(ln)), y)

    p0 = jnp.array([jnp.log(0.6), jnp.log(0.15)])
    g = jax.grad(obj)(p0)
    h = 1e-6
    for k in range(2):
        e = jnp.zeros(2).at[k].set(h)
        fd = (obj(p0 + e) - obj(p0 - e)) / (2 * h)
        np.testing.assert_allclose(g[k], fd, rtol=1e-5)


def test_loo_prefers_true_lengthscale(key):
    """Sanity: on data drawn from a known GP, the LOO score at the true
    hyperparameters beats badly misspecified ones."""
    f = agp.GP(agp.with_lengthscale(agp.SqExponentialKernel(), 0.5))
    x = jnp.linspace(-3.0, 3.0, 60)
    y = f(x, 0.1).sample(key)

    def score(ls):
        g = agp.GP(agp.with_lengthscale(agp.SqExponentialKernel(), ls))
        return float(loo_logpdf(g(x, 0.1), y))

    assert score(0.5) > score(0.05)
    assert score(0.5) > score(5.0)
