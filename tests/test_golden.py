"""Golden-value regression fixtures (SURVEY.md §4 'golden fixture files').

Values computed once in f64 on CPU with this library at a known-good commit;
any drift indicates a semantic regression.  The fixed Bernoulli dataset is
the reference's shared test vector (``src/TestUtils.jl:19``), so the Laplace
value is also a cross-implementation anchor."""

import jax.numpy as jnp
import numpy as np

import approximategps_tpu as agp
from approximategps_tpu import test_utils as tu


def _svgp_fixture():
    x = jnp.linspace(0.0, 10.0, 20)
    y = jnp.sin(x)
    kern = 1.7 * agp.with_lengthscale(agp.SqExponentialKernel(), 1.3)
    f = agp.GP(kern)
    fx = f(x, 0.1)
    fz = f(x[:5], 1e-6)
    q = agp.MultivariateNormal(jnp.linspace(-0.3, 0.4, 5), jnp.eye(5) * 0.8)
    return f, fx, fz, q, x, y


def test_laplace_lml_golden():
    X, Y = tu.generate_data()
    lf = tu.build_latent_gp(jnp.array([5.0, 1.0]))
    lml = agp.approx_lml(agp.LaplaceApproximation(tol=1e-12), lf(X), Y)
    np.testing.assert_allclose(float(lml), -26.042947141204074, rtol=1e-10)


def test_svgp_elbo_golden():
    f, fx, fz, q, x, y = _svgp_fixture()
    e_c = agp.elbo(agp.SparseVariationalApproximation(fz, q, agp.Centered()), fx, y)
    e_n = agp.elbo(agp.SparseVariationalApproximation(fz, q, agp.NonCentered()), fx, y)
    np.testing.assert_allclose(float(e_c), -8639.56430201219, rtol=1e-10)
    np.testing.assert_allclose(float(e_n), -208.5111130860645, rtol=1e-10)


def test_exact_and_vfe_golden():
    f, fx, fz, q, x, y = _svgp_fixture()
    np.testing.assert_allclose(float(fx.logpdf(y)), -10.519031409321679, rtol=1e-10)
    np.testing.assert_allclose(
        float(agp.vfe_elbo(agp.VFE(fz), fx, y)), -123.224993062717, rtol=1e-9
    )
    post = agp.posterior(fx, y)
    np.testing.assert_allclose(
        post.mean(jnp.array([2.5, 5.5, 9.0])),
        [0.5907405397766117, -0.6895122348476359, 0.381119589977838],
        rtol=1e-9,
    )


def test_vecchia_lml_golden():
    f, fx, fz, q, x, y = _svgp_fixture()
    lml = agp.approx_lml(agp.NearestNeighbors(4), f(x, 0.0), y)
    np.testing.assert_allclose(float(lml), 16.8404204562678, rtol=1e-9)
