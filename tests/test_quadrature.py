"""Expectation quadrature + likelihood tests: Gauss–Hermite vs analytic vs
Monte Carlo; closed-form Newton derivatives vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import approximategps_tpu as agp
from approximategps_tpu.core.quadrature import (
    Analytic,
    DefaultExpectationMethod,
    GaussHermite,
    MonteCarlo,
    expected_loglikelihood,
)


def _qf(key, n=10):
    k1, k2 = jax.random.split(key)
    mu = jax.random.normal(k1, (n,))
    var = jax.random.uniform(k2, (n,), minval=0.05, maxval=0.5)
    return mu, var


def test_gh_matches_analytic_gaussian(key):
    mu, var = _qf(key)
    y = jax.random.normal(jax.random.PRNGKey(7), (10,))
    lik = agp.GaussianLikelihood(0.3)
    gh = expected_loglikelihood(GaussHermite(50), lik, mu, var, y)
    an = expected_loglikelihood(Analytic(), lik, mu, var, y)
    np.testing.assert_allclose(gh, an, rtol=1e-10)


def test_gh_matches_analytic_poisson(key):
    mu, var = _qf(key)
    y = jnp.arange(10) % 4
    lik = agp.PoissonLikelihood()
    gh = expected_loglikelihood(GaussHermite(60), lik, mu, var, y)
    an = expected_loglikelihood(Analytic(), lik, mu, var, y)
    np.testing.assert_allclose(gh, an, rtol=1e-8)


def test_gh_matches_analytic_exponential_gamma(key):
    mu, var = _qf(key)
    y = jax.random.uniform(jax.random.PRNGKey(3), (10,), minval=0.1, maxval=2.0)
    for lik in [agp.ExponentialLikelihood(), agp.GammaLikelihood(shape_param=1.7)]:
        gh = expected_loglikelihood(GaussHermite(60), lik, mu, var, y)
        an = expected_loglikelihood(Analytic(), lik, mu, var, y)
        np.testing.assert_allclose(gh, an, rtol=1e-8)


def test_default_method_dispatch(key):
    mu, var = _qf(key)
    # Gaussian: default == analytic
    y = jax.random.normal(jax.random.PRNGKey(5), (10,))
    lik = agp.GaussianLikelihood(0.2)
    np.testing.assert_allclose(
        expected_loglikelihood(DefaultExpectationMethod(), lik, mu, var, y),
        expected_loglikelihood(Analytic(), lik, mu, var, y),
    )
    # Bernoulli: no analytic → GH(20)
    yb = (jax.random.uniform(jax.random.PRNGKey(6), (10,)) > 0.5).astype(jnp.int64)
    likb = agp.BernoulliLikelihood()
    np.testing.assert_allclose(
        expected_loglikelihood(DefaultExpectationMethod(), likb, mu, var, yb),
        expected_loglikelihood(GaussHermite(20), likb, mu, var, yb),
    )
    with pytest.raises(ValueError):
        expected_loglikelihood(Analytic(), likb, mu, var, yb)


def test_mc_converges_to_gh(key):
    mu, var = _qf(key)
    yb = (jax.random.uniform(jax.random.PRNGKey(6), (10,)) > 0.5).astype(jnp.int64)
    lik = agp.BernoulliLikelihood()
    gh = expected_loglikelihood(GaussHermite(40), lik, mu, var, yb)
    mc = expected_loglikelihood(
        MonteCarlo(n_samples=200000, key=jax.random.PRNGKey(0)), lik, mu, var, yb
    )
    np.testing.assert_allclose(mc, gh, atol=5e-3)


@pytest.mark.parametrize(
    "lik,y",
    [
        (agp.BernoulliLikelihood(), jnp.array([0, 1, 1, 0, 1])),
        (agp.BernoulliLikelihood(link="probit"), jnp.array([0, 1, 1, 0, 1])),
        (agp.PoissonLikelihood(), jnp.array([0, 1, 3, 2, 5])),
        (agp.GaussianLikelihood(0.4), jnp.array([0.1, -0.5, 1.0, 0.0, 2.0])),
        (agp.ExponentialLikelihood(), jnp.array([0.1, 0.5, 1.0, 0.2, 2.0])),
        (agp.GammaLikelihood(shape_param=2.0), jnp.array([0.1, 0.5, 1.0, 0.2, 2.0])),
        (agp.StudentTLikelihood(df=4.0, scale=0.5), jnp.array([0.1, -0.5, 1.0, 0.0, 2.0])),
        (agp.NegativeBinomialLikelihood(successes=3.5), jnp.array([0, 1, 3, 2, 5])),
        (
            agp.NegativeBinomialLikelihood(successes=2.0, param="failure"),
            jnp.array([0, 1, 3, 2, 5]),
        ),
    ],
    ids=lambda o: getattr(type(o), "__name__", str(o)),
)
def test_closed_form_derivs_match_autodiff(lik, y, key):
    f = jax.random.normal(key, (5,))
    ll, d1, d2 = lik.log_prob_d1_d2(f, y)
    # generic autodiff reference
    base = agp.Likelihood.log_prob_d1_d2
    ll_ref, d1_ref, d2_ref = base(lik, f, y)
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-10)
    np.testing.assert_allclose(d1, d1_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(d2, d2_ref, rtol=1e-9, atol=1e-12)


def test_bernoulli_logprob_values():
    lik = agp.BernoulliLikelihood()
    f = jnp.array([0.0, 2.0, -3.0])
    y = jnp.array([1, 0, 1])
    p = jax.nn.sigmoid(f)
    expected = np.where(np.asarray(y) == 1, np.log(np.asarray(p)), np.log1p(-np.asarray(p)))
    np.testing.assert_allclose(lik.log_prob(f, y), expected, rtol=1e-10)


def test_negative_binomial_against_scipy():
    """log_prob == scipy.stats.nbinom.logpmf (success param: p = σ(f));
    the failure parametrization is the success one at −f."""
    from scipy import stats

    r = 3.0
    f = jnp.array([-1.5, -0.3, 0.0, 0.8, 2.1])
    y = jnp.array([0, 2, 5, 1, 7])
    lik = agp.NegativeBinomialLikelihood(successes=r)
    p = np.asarray(jax.nn.sigmoid(f))
    expected = stats.nbinom.logpmf(np.asarray(y), r, p)
    np.testing.assert_allclose(lik.log_prob(f, y), expected, rtol=1e-9)
    lik_fail = agp.NegativeBinomialLikelihood(successes=r, param="failure")
    np.testing.assert_allclose(
        lik_fail.log_prob(f, y), lik.log_prob(-f, y), rtol=1e-12
    )


def test_negative_binomial_fisher_and_sampling(key):
    """Fisher r·σ(−f) == E_y[−∂²ll] (exact: ∂²ll is linear in y), and the
    Gamma–Poisson sampler matches the NB mean r(1−p)/p."""
    r = 4.0
    lik = agp.NegativeBinomialLikelihood(successes=r)
    f = jnp.array([-1.0, 0.0, 1.2])
    mean = r * np.asarray(jax.nn.sigmoid(-f)) / np.asarray(jax.nn.sigmoid(f))
    # E[−d2] = (r + E[y])·σ(f)σ(−f) must equal fisher_information
    _, _, d2 = lik.log_prob_d1_d2(f, jnp.asarray(mean))
    np.testing.assert_allclose(lik.fisher_information(f, None), -d2, rtol=1e-9)
    fs = jnp.full((4000,), 0.5)
    ys = lik.conditional_sample(key, fs)
    want = r * float(jax.nn.sigmoid(-0.5) / jax.nn.sigmoid(0.5))
    assert abs(float(ys.mean()) - want) < 0.15 * want


def test_likelihood_conditional_samples(key):
    f = jnp.zeros(2000)
    y = agp.BernoulliLikelihood().conditional_sample(key, f)
    assert abs(float(y.mean()) - 0.5) < 0.05
    yp = agp.PoissonLikelihood().conditional_sample(key, f)  # rate = e^0 = 1
    assert abs(float(yp.mean()) - 1.0) < 0.1


def test_montecarlo_requires_key(key):
    mu, var = _qf(key)
    y = jnp.zeros(10)
    with pytest.raises(ValueError, match="explicit PRNG key"):
        expected_loglikelihood(MonteCarlo(10), agp.BernoulliLikelihood(), mu, var, y)


def test_gh_clamps_negative_variance(key):
    """f32 cancellation can make SVGP marginal variances dip slightly
    negative; the quadrature must clamp rather than NaN (ADVICE r1)."""
    mu = jnp.zeros(4)
    var = jnp.array([0.1, -1e-7, 0.0, 0.2])
    y = jnp.ones(4)
    lik = agp.BernoulliLikelihood()
    out = expected_loglikelihood(GaussHermite(20), lik, mu, var, y)
    assert bool(jnp.isfinite(out).all())
    g = jax.grad(lambda v: expected_loglikelihood(GaussHermite(20), lik, mu, v, y).sum())(var)
    assert bool(jnp.isfinite(g).all())
