"""Multi-latent SVGP tests (extension beyond the single-latent reference):
quadrature correctness, degenerate-case equivalences, and end-to-end
training on heteroscedastic regression and 3-class softmax classification."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import approximategps_tpu as agp
from approximategps_tpu.models.multi_latent import expected_loglik_multi, multi_latent_elbo


def _sva(key, z, M):
    f = agp.GP(1.0 * agp.with_lengthscale(agp.SqExponentialKernel(), 1.0))
    q = agp.MultivariateNormal(
        0.1 * jax.random.normal(key, (M,)), jnp.eye(M) * 0.7
    )
    return agp.SparseVariationalApproximation(f(z, 1e-6), q)


def test_gh_grid_matches_mc(key):
    """Tensor-product GH == Monte Carlo on the heteroscedastic likelihood."""
    k1, k2, k3 = jax.random.split(key, 3)
    N = 12
    q_means = jax.random.normal(k1, (N, 2))
    q_vars = jax.random.uniform(k2, (N, 2), minval=0.05, maxval=0.4)
    y = jax.random.normal(k3, (N,))
    lik = agp.HeteroscedasticGaussianLikelihood()
    gh = expected_loglik_multi(lik, q_means, q_vars, y, n_points=30)
    mc = expected_loglik_multi(
        lik, q_means, q_vars, y, mc_key=jax.random.PRNGKey(0), n_samples=400_000
    )
    np.testing.assert_allclose(gh, mc, rtol=2e-2, atol=2e-2)


def test_heteroscedastic_reduces_to_gaussian_when_logvar_frozen(key):
    """With the log-variance latent pinned at log(σ²) (zero-variance q), the
    heteroscedastic ELBO data term equals the single-latent Gaussian one."""
    from approximategps_tpu.core.quadrature import GaussHermite, expected_loglikelihood

    k1, k2 = jax.random.split(key)
    N = 15
    mu = jax.random.normal(k1, (N,))
    var = jax.random.uniform(k2, (N,), minval=0.05, maxval=0.3)
    y = jnp.sin(mu)
    sigma2 = 0.17
    lik1 = agp.GaussianLikelihood(sigma2)
    ell1 = expected_loglikelihood(GaussHermite(40), lik1, mu, var, y)

    lik2 = agp.HeteroscedasticGaussianLikelihood()
    q_means = jnp.stack([mu, jnp.full(N, jnp.log(sigma2))], axis=-1)
    q_vars = jnp.stack([var, jnp.zeros(N)], axis=-1)
    ell2 = expected_loglik_multi(lik2, q_means, q_vars, y, n_points=40)
    np.testing.assert_allclose(ell2, ell1, rtol=1e-8)


def test_softmax_two_class_matches_sigmoid_structure(key):
    """Softmax log_prob with C=2 equals the log-sigmoid of the logit gap."""
    lik = agp.SoftmaxLikelihood(2)
    F = jax.random.normal(key, (10, 2))
    y = (jax.random.uniform(jax.random.fold_in(key, 1), (10,)) > 0.5).astype(jnp.int32)
    lp = lik.log_prob(F, y)
    gap = jnp.where(y == 1, F[:, 1] - F[:, 0], F[:, 0] - F[:, 1])
    np.testing.assert_allclose(lp, jax.nn.log_sigmoid(gap), rtol=1e-12)


def test_heteroscedastic_training_recovers_noise_field(key):
    """End-to-end: train mean + log-variance latents on data whose noise
    s.d. ramps from 0.05 to 0.8 across the input range; the learned
    log-variance must increase left→right by ≳ the true log-ratio/2."""
    N, M = 400, 24
    k1, k2 = jax.random.split(key)
    x = jnp.linspace(-3.0, 3.0, N)
    true_mean = jnp.sin(x)
    sd = 0.05 + 0.75 * (x - x.min()) / (x.max() - x.min())
    y = true_mean + sd * jax.random.normal(k1, (N,))
    z = jnp.linspace(-3.0, 3.0, M)

    def build(params):
        svas = []
        for tag in ("m", "v"):
            f = agp.GP(
                jax.nn.softplus(params[f"k_{tag}"][0])
                * agp.with_lengthscale(
                    agp.SqExponentialKernel(), jax.nn.softplus(params[f"k_{tag}"][1])
                )
            )
            q = agp.MultivariateNormal(params[f"m_{tag}"], jnp.tril(params[f"A_{tag}"]))
            svas.append(agp.SparseVariationalApproximation(f(z, 1e-6), q))
        return agp.MultiLatentSVGP(tuple(svas), agp.HeteroscedasticGaussianLikelihood())

    params = {
        "k_m": jnp.array([0.5, 0.5]), "m_m": jnp.zeros(M), "A_m": jnp.eye(M),
        "k_v": jnp.array([0.5, 1.5]), "m_v": jnp.full(M, -1.0), "A_v": jnp.eye(M) * 0.3,
    }

    def loss(p):
        return -multi_latent_elbo(build(p), x, y, n_gh=10)

    opt = optax.adam(3e-2)
    state = opt.init(params)

    def step(carry, _):
        p, s = carry
        val, g = jax.value_and_grad(loss)(p)
        up, s = opt.update(g, s, p)
        return (optax.apply_updates(p, up), s), val

    (params, _), vals = jax.lax.scan(step, (params, state), None, length=800)
    assert np.isfinite(np.asarray(vals)).all()
    assert float(vals[-1]) < float(vals[0])

    post_m, post_v = agp.posterior(build(params))
    xs = jnp.array([-2.5, 2.5])
    logvar = post_v.mean(xs)
    true_gap = 2 * (jnp.log(0.8) - jnp.log(0.05 + 0.75 / 6))
    assert float(logvar[1] - logvar[0]) > 0.5 * float(true_gap), logvar
    # mean latent still tracks sin(x) where noise is low
    mu_left = post_m.mean(jnp.array([-2.0, -1.0]))
    np.testing.assert_allclose(mu_left, jnp.sin(jnp.array([-2.0, -1.0])), atol=0.25)


def test_softmax_classification_learns(key):
    """3-class toy problem: training lifts accuracy well above chance."""
    N, M, C = 300, 16, 3
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (N,)) * 6.0
    y = jnp.clip((x // 2.0).astype(jnp.int32), 0, C - 1)  # three bands
    z = jnp.linspace(0.0, 6.0, M)

    def build(params):
        svas = []
        for c in range(C):
            f = agp.GP(2.0 * agp.with_lengthscale(agp.SqExponentialKernel(), 1.0))
            q = agp.MultivariateNormal(params["m"][c], jnp.tril(params["A"][c]))
            svas.append(agp.SparseVariationalApproximation(f(z, 1e-6), q))
        return agp.MultiLatentSVGP(tuple(svas), agp.SoftmaxLikelihood(C))

    params = {"m": jnp.zeros((C, M)), "A": jnp.stack([jnp.eye(M)] * C)}

    def loss(p):
        return -multi_latent_elbo(build(p), x, y, n_gh=8)

    opt = optax.adam(5e-2)
    state = opt.init(params)

    def step(carry, _):
        p, s = carry
        val, g = jax.value_and_grad(loss)(p)
        up, s = opt.update(g, s, p)
        return (optax.apply_updates(p, up), s), val

    (params, _), vals = jax.lax.scan(step, (params, state), None, length=400)
    posts = agp.posterior(build(params))
    logits = jnp.stack([p.mean(x) for p in posts], axis=-1)
    acc = float(jnp.mean((jnp.argmax(logits, -1) == y)))
    assert acc > 0.9, acc
