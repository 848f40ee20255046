"""Matrix-free Laplace (models/laplace_cg.py): agreement with the dense
Laplace module on small problems where both run, in f64 CPU oracle mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import approximategps_tpu as agp
from approximategps_tpu import test_utils as tu
from approximategps_tpu.models import laplace as L
from approximategps_tpu.models.laplace_cg import (
    LaplaceCG,
    laplace_lml_cg,
    newton_inner_loop_cg,
)
from approximategps_tpu.utils.bijectors import softplus


def _setup(N=48):
    X, Y = tu.generate_data()
    lf = tu.build_latent_gp(jnp.array([1.2, 0.4]))
    return X[:N], Y[:N], lf


@pytest.mark.parametrize("block_size", [None, 16])
def test_mode_matches_dense(block_size):
    X, Y, lf = _setup()
    lfx = lf(X)
    kern = lfx.fx.f.kernel
    K = kern.gram(jnp.atleast_2d(jnp.asarray(X)).T if jnp.ndim(X) == 1 else X)
    f_dense = L.newton_inner_loop(lfx.lik, Y, K + 1e-10 * jnp.eye(len(Y)),
                                  maxiter=100, tol=1e-12)
    f_cg = newton_inner_loop_cg(lfx.lik, Y, kern, X, maxiter=100, tol=1e-12,
                                cg_tol=1e-12, block_size=block_size)
    np.testing.assert_allclose(f_cg, f_dense, atol=1e-7)


def test_posterior_matches_dense():
    X, Y, lf = _setup()
    lfx = lf(X)
    post_dense = agp.posterior(agp.LaplaceApproximation(tol=1e-12), lfx, Y)
    post_cg = agp.posterior(LaplaceCG(tol=1e-12, cg_tol=1e-12), lfx, Y)
    xs = jnp.linspace(0.0, 20.0, 37)
    mu_d, var_d = post_dense.mean_and_var(xs)
    mu_c, var_c = post_cg.mean_and_var(xs)
    np.testing.assert_allclose(mu_c, mu_d, atol=1e-6)
    np.testing.assert_allclose(var_c, var_d, atol=1e-6)
    # full covariance too
    np.testing.assert_allclose(post_cg.cov(xs[:9]), post_dense.cov(xs[:9]),
                               atol=1e-6)


def test_lml_slq_close_to_dense(key):
    X, Y, lf = _setup()
    lfx = lf(X)
    kern = lfx.fx.f.kernel
    lml_dense = float(
        agp.approx_lml(agp.LaplaceApproximation(tol=1e-12), lfx, Y)
    )
    lml_cg = float(
        agp.approx_lml(
            LaplaceCG(tol=1e-12, cg_tol=1e-12, num_probes=256,
                      lanczos_iters=48),
            lfx, Y, key=key,
        )
    )
    # SLQ logdet is stochastic (zero-bias, probe-variance ~0.3 at P=64 on
    # this fixture, ~0.1 at P=256): bound the absolute error accordingly
    assert abs(lml_cg - lml_dense) < 0.25, (lml_cg, lml_dense)


def test_lml_requires_key():
    X, Y, lf = _setup()
    with pytest.raises(ValueError, match="key"):
        agp.approx_lml(LaplaceCG(), lf(X), Y)


def test_ift_gradient_matches_dense():
    """d(sum f̂)/d(kernel hypers): CG-IFT pullback == dense-IFT pullback."""
    X, Y, lf = _setup()

    def via_cg(theta):
        lfx = tu.build_latent_gp(theta)(X)
        f = newton_inner_loop_cg(lfx.lik, Y, lfx.fx.f.kernel, X,
                                 maxiter=100, tol=1e-12, cg_tol=1e-12)
        return jnp.sum(jnp.sin(f))

    def via_dense(theta):
        lfx = tu.build_latent_gp(theta)(X)
        Xp = jnp.atleast_2d(jnp.asarray(X)).T if jnp.ndim(X) == 1 else X
        K = lfx.fx.f.kernel.gram(Xp)
        f = L.newton_inner_loop(lfx.lik, Y, K, maxiter=100, tol=1e-12)
        return jnp.sum(jnp.sin(f))

    theta = jnp.array([1.1, 0.3])
    g_cg = jax.grad(via_cg)(theta)
    g_dense = jax.grad(via_dense)(theta)
    np.testing.assert_allclose(g_cg, g_dense, rtol=1e-6, atol=1e-8)


def test_lml_slq_gradients_match_dense():
    """d(approx_lml)/d(kernel hypers) through the matrix-free path (Newton
    IFT + differentiable cache recompute + stochastic-trace logdet VJP)
    matches the dense laplace_lml gradient to Hutchinson noise."""
    X, Y, _ = _setup()

    def via_cg(theta):
        lfx = tu.build_latent_gp(theta)(X)
        return laplace_lml_cg(
            lfx.lik, Y, lfx.fx.f.kernel, X, jax.random.PRNGKey(11),
            num_probes=1024, lanczos_iters=48, maxiter=100, tol=1e-12,
            cg_tol=1e-12,
        )

    def via_dense(theta):
        lfx = tu.build_latent_gp(theta)(X)
        Xp = jnp.atleast_2d(jnp.asarray(X)).T if jnp.ndim(X) == 1 else X
        K = lfx.fx.f.kernel.gram(Xp)
        return L.laplace_lml(lfx.lik, Y, K, maxiter=100, tol=1e-12)

    theta = jnp.array([1.1, 0.3])
    g_cg = jax.grad(via_cg)(theta)
    g_dense = jax.grad(via_dense)(theta)
    scale = float(jnp.max(jnp.abs(g_dense)))
    np.testing.assert_allclose(g_cg, g_dense, atol=0.05 * scale + 0.02)


def test_no_dense_gram_in_matrix_free_paths(monkeypatch, key):
    """ADVICE r2 (medium): posterior(LaplaceCG, ...) and approx_lml must
    never build the full N×N observed covariance — validation is check-only
    (`_validate_laplace_inputs`), so the O(N·block) memory contract holds in
    eager mode too (previously fx.cov() materialized the Gram and relied on
    XLA DCE under jit)."""
    X, Y, lf = _setup(N=32)
    lfx = lf(X)

    from approximategps_tpu.core.gp import FiniteGP

    def boom(self):
        raise AssertionError("dense fx.cov() called in a matrix-free path")

    monkeypatch.setattr(FiniteGP, "cov", boom)
    la = LaplaceCG(tol=1e-10, cg_tol=1e-10, block_size=8, num_probes=8,
                   lanczos_iters=20)
    post = agp.posterior(la, lfx, Y)
    mu, var = post.mean_and_var(jnp.linspace(0.0, 20.0, 9))
    assert np.all(np.isfinite(mu)) and np.all(np.isfinite(var))
    lml = agp.approx_lml(la, lfx, Y, key=key)
    assert np.isfinite(float(lml))


def test_cg_operator_includes_latent_jitter():
    """ADVICE r2 (low): B = I + √W (K + jitter·I) √W — with a deliberately
    LARGE jitter the CG mode/posterior/lml still match the dense path (which
    always included it via fx.cov())."""
    X, Y, _ = _setup()
    lf = tu.build_latent_gp(jnp.array([1.2, 0.4]))
    lf = agp.LatentGP(lf.f, lf.lik, 1e-2)  # jitter far above f64 noise
    lfx = lf(X)

    xs = jnp.linspace(0.0, 20.0, 17)
    mu_d, var_d = jax.jit(
        lambda Y: agp.posterior(
            agp.LaplaceApproximation(tol=1e-12), lfx, Y
        ).mean_and_var(xs)
    )(Y)
    mu_c, var_c = jax.jit(
        lambda Y: agp.posterior(
            LaplaceCG(tol=1e-12, cg_tol=1e-12), lfx, Y
        ).mean_and_var(xs)
    )(Y)
    np.testing.assert_allclose(mu_c, mu_d, atol=1e-8)
    np.testing.assert_allclose(var_c, var_d, atol=1e-8)

    lml_dense = float(
        agp.approx_lml(agp.LaplaceApproximation(tol=1e-12), lfx, Y)
    )
    lml_cg = float(
        agp.approx_lml(
            LaplaceCG(tol=1e-12, cg_tol=1e-12, num_probes=512,
                      lanczos_iters=48),
            lfx, Y, key=jax.random.PRNGKey(3),
        )
    )
    # the explicit terms are deterministic; a missing 1e-2 jitter shifts the
    # mode/lml well above the SLQ probe noise at P=512
    assert abs(lml_cg - lml_dense) < 0.2, (lml_cg, lml_dense)
