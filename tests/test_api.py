"""Top-level API dispatch tests (reference src/API.jl + posterior extension
semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import approximategps_tpu as agp


def test_unknown_approximation_raises():
    class Weird:
        pass

    with pytest.raises(NotImplementedError):
        agp.posterior(Weird(), None, None)
    with pytest.raises(NotImplementedError):
        agp.approx_lml(Weird(), None, None)


def test_exact_posterior_via_dispatch(key):
    f = agp.GP(agp.SqExponentialKernel())
    x = jnp.linspace(0, 1, 5)
    fx = f(x, 0.1)
    y = fx.sample(key)
    p1 = agp.posterior(fx, y)
    from approximategps_tpu.core.gp import posterior as exact

    p2 = exact(fx, y)
    np.testing.assert_allclose(p1.mean(x), p2.mean(x))


def test_three_arg_posterior_consistency(key):
    f = agp.GP(agp.SqExponentialKernel())
    x = jnp.linspace(0, 1, 6)
    fx = f(x, 0.1)
    y = fx.sample(key)
    fz = f(x[:3], 1e-6)
    q = agp.MultivariateNormal(jnp.zeros(3), jnp.eye(3))
    sva = agp.SparseVariationalApproximation(fz, q)

    # consistent prior: same GP object → fine
    post = agp.posterior(sva, fx, y)
    assert post.mean(x).shape == (6,)

    # structurally different prior → error (reference :347-351)
    f2 = agp.GP(agp.SqExponentialKernel() + agp.Matern32Kernel())
    with pytest.raises(ValueError):
        agp.elbo(sva, f2(x, 0.1), y)


def test_svgp_deprecated_alias(key):
    f = agp.GP(agp.SqExponentialKernel())
    fz = f(jnp.linspace(0, 1, 3), 1e-6)
    q = agp.MultivariateNormal(jnp.zeros(3), jnp.eye(3))
    with pytest.warns(DeprecationWarning):
        sva = agp.SVGP(fz, q)
    assert isinstance(sva.parametrization, agp.Centered)


def test_latent_gp_elbo_kwargs(key):
    """elbo accepts quadrature selection (reference `quadrature=` kwarg)."""
    f = agp.GP(agp.SqExponentialKernel())
    x = jnp.linspace(0, 1, 8)
    lf = agp.LatentGP(f, agp.BernoulliLikelihood(), 1e-8)
    y = (jax.random.uniform(key, (8,)) > 0.5).astype(jnp.int64)
    fz = f(x[:4], 1e-6)
    q = agp.MultivariateNormal(jnp.zeros(4), jnp.eye(4))
    sva = agp.SparseVariationalApproximation(fz, q)
    e_gh = agp.elbo(sva, lf(x), y, quadrature=agp.GaussHermite(64))
    e_default = agp.elbo(sva, lf(x), y)
    np.testing.assert_allclose(float(e_gh), float(e_default), rtol=1e-6)
    e_mc = agp.elbo(
        sva, lf(x), y, quadrature=agp.MonteCarlo(50000, jax.random.PRNGKey(1))
    )
    np.testing.assert_allclose(float(e_mc), float(e_gh), rtol=2e-2)
