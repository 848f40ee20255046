"""Golden-value fixtures, de-circularized (VERDICT r1 item 4).

Each value is asserted two ways:
1. against an INDEPENDENT from-first-principles numpy/scipy f64 oracle
   (``tests/oracles/npgp.py`` — shares no code with the library, uses direct
   scipy factorizations and explicit Vecchia loops), recomputed at runtime;
2. against the hardcoded constant recorded at a known-good commit (drift
   anchor).

Cross-implementation agreement of (1) and (2) to ~1e-11 rules out a shared
systematic error.  The fixed Bernoulli dataset is additionally the
reference's shared test vector (``src/TestUtils.jl:19``)."""

import jax
import jax.numpy as jnp
import numpy as np

import approximategps_tpu as agp
from approximategps_tpu import test_utils as tu
from oracles import npgp


def _softplus(t):
    return float(np.log1p(np.exp(t)))


def _svgp_fixture():
    x = jnp.linspace(0.0, 10.0, 20)
    y = jnp.sin(x)
    kern = 1.7 * agp.with_lengthscale(agp.SqExponentialKernel(), 1.3)
    f = agp.GP(kern)
    fx = f(x, 0.1)
    fz = f(x[:5], 1e-6)
    q = agp.MultivariateNormal(jnp.linspace(-0.3, 0.4, 5), jnp.eye(5) * 0.8)
    return f, fx, fz, q, x, y


def _oracle_args():
    x = np.linspace(0.0, 10.0, 20)
    return dict(
        X=x,
        y=np.sin(x),
        Z=x[:5],
        variance=1.7,
        lengthscale=1.3,
        noise_var=0.1,
        jitter=1e-6,
        m=np.linspace(-0.3, 0.4, 5),
        S=0.64 * np.eye(5),
    )


def test_laplace_lml_golden():
    X, Y = tu.generate_data()
    lf = tu.build_latent_gp(jnp.array([5.0, 1.0]))
    lml = float(agp.approx_lml(agp.LaplaceApproximation(tol=1e-12), lf(X), Y))
    oracle = npgp.laplace_lml_bernoulli(
        np.asarray(X), np.asarray(Y, float), _softplus(5.0), _softplus(1.0), 1e-8
    )
    np.testing.assert_allclose(lml, oracle, rtol=1e-10)
    np.testing.assert_allclose(lml, -26.042947141204074, rtol=1e-10)


def test_laplace_lml_golden_second_theta():
    """Second hyperparameter point — catches errors that cancel at one θ."""
    X, Y = tu.generate_data()
    lf = tu.build_latent_gp(jnp.array([2.0, 3.0]))
    lml = float(agp.approx_lml(agp.LaplaceApproximation(tol=1e-12), lf(X), Y))
    oracle = npgp.laplace_lml_bernoulli(
        np.asarray(X), np.asarray(Y, float), _softplus(2.0), _softplus(3.0), 1e-8
    )
    np.testing.assert_allclose(lml, oracle, rtol=1e-10)


def test_svgp_elbo_golden():
    f, fx, fz, q, x, y = _svgp_fixture()
    e_c = agp.elbo(agp.SparseVariationalApproximation(fz, q, agp.Centered()), fx, y)
    e_n = agp.elbo(agp.SparseVariationalApproximation(fz, q, agp.NonCentered()), fx, y)
    a = _oracle_args()
    np.testing.assert_allclose(
        float(e_c),
        npgp.svgp_elbo_centered(
            a["X"], a["y"], a["Z"], a["variance"], a["lengthscale"],
            a["noise_var"], a["jitter"], a["m"], a["S"],
        ),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        float(e_n),
        npgp.svgp_elbo_noncentered(
            a["X"], a["y"], a["Z"], a["variance"], a["lengthscale"],
            a["noise_var"], a["jitter"], a["m"], a["S"],
        ),
        rtol=1e-10,
    )
    np.testing.assert_allclose(float(e_c), -8639.56430201219, rtol=1e-10)
    np.testing.assert_allclose(float(e_n), -208.5111130860645, rtol=1e-10)


def test_svgp_minibatch_scale_golden():
    """Minibatch scaling num_data/n_batch against the oracle."""
    f, fx, fz, q, x, y = _svgp_fixture()
    e = agp.elbo(
        agp.SparseVariationalApproximation(fz, q, agp.NonCentered()),
        fx, y, num_data=1000,
    )
    a = _oracle_args()
    np.testing.assert_allclose(
        float(e),
        npgp.svgp_elbo_noncentered(
            a["X"], a["y"], a["Z"], a["variance"], a["lengthscale"],
            a["noise_var"], a["jitter"], a["m"], a["S"], num_data=1000,
        ),
        rtol=1e-10,
    )


def test_exact_and_vfe_golden():
    f, fx, fz, q, x, y = _svgp_fixture()
    a = _oracle_args()
    np.testing.assert_allclose(
        float(fx.logpdf(y)),
        npgp.exact_gpr_logpdf(a["X"], a["y"], a["variance"], a["lengthscale"], a["noise_var"]),
        rtol=1e-10,
    )
    np.testing.assert_allclose(float(fx.logpdf(y)), -10.519031409321679, rtol=1e-10)
    np.testing.assert_allclose(
        float(agp.vfe_elbo(agp.VFE(fz), fx, y)),
        npgp.vfe_bound(a["X"], a["y"], a["Z"], a["variance"], a["lengthscale"], a["noise_var"], a["jitter"]),
        rtol=1e-9,
    )
    post = agp.posterior(fx, y)
    xs = np.array([2.5, 5.5, 9.0])
    mu_o, cov_o = npgp.exact_gpr_predict(
        a["X"], a["y"], a["variance"], a["lengthscale"], a["noise_var"], xs
    )
    np.testing.assert_allclose(post.mean(jnp.asarray(xs)), mu_o, rtol=1e-9)
    np.testing.assert_allclose(
        post.cov(jnp.asarray(xs)), cov_o, atol=1e-10
    )
    np.testing.assert_allclose(
        post.mean(jnp.asarray(xs)),
        [0.5907405397766117, -0.6895122348476359, 0.381119589977838],
        rtol=1e-9,
    )


def test_vecchia_lml_golden():
    f, fx, fz, q, x, y = _svgp_fixture()
    a = _oracle_args()
    for k in (1, 4, 19):
        lml = float(
            jax.jit(lambda y, k=k: agp.approx_lml(agp.NearestNeighbors(k), f(x, 0.0), y))(y)
        )
        oracle = npgp.vecchia_lml(a["X"], a["y"], a["variance"], a["lengthscale"], k)
        np.testing.assert_allclose(lml, oracle, rtol=1e-8)
    lml4 = float(
        jax.jit(lambda y: agp.approx_lml(agp.NearestNeighbors(4), f(x, 0.0), y))(y)
    )
    np.testing.assert_allclose(lml4, 16.8404204562678, rtol=1e-9)
