"""Tests for utils (bijectors, training, checkpoint) and Pallas ops
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import approximategps_tpu as agp
from approximategps_tpu import test_utils as tu
from approximategps_tpu.config import config_context
from approximategps_tpu.ops.gram import pallas_stationary_gram
from approximategps_tpu.utils import bijectors as bj
from approximategps_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from approximategps_tpu.utils.training import (
    build_svgp,
    init_svgp_params,
    natgrad_update,
)


def test_softplus_roundtrip():
    y = jnp.array([0.1, 1.0, 5.0, 20.0])
    np.testing.assert_allclose(bj.softplus(bj.invsoftplus(y)), y, rtol=1e-10)


def test_fill_triangular_roundtrip(key):
    n = 5
    flat = jax.random.normal(key, (n * (n + 1) // 2,))
    L = bj.fill_triangular(flat, n)
    assert np.allclose(np.asarray(L), np.tril(np.asarray(L)))
    np.testing.assert_allclose(bj.fill_triangular_inverse(L), flat)


def test_cholesky_parameter_valid(key):
    n = 4
    flat = jax.random.normal(key, (n * (n + 1) // 2,))
    L = bj.cholesky_parameter(flat, n)
    assert (np.diag(np.asarray(L)) > 0).all()
    assert np.allclose(np.asarray(L), np.tril(np.asarray(L)))


def test_checkpoint_roundtrip(tmp_path, key):
    params = {
        "a": jax.random.normal(key, (3, 2)),
        "nested": {"b": jnp.arange(4.0)},
    }
    save_checkpoint(str(tmp_path), params, step=7)
    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored = restore_checkpoint(str(tmp_path), template)
    for k in ("a",):
        np.testing.assert_allclose(restored[k], params[k])
    np.testing.assert_allclose(restored["nested"]["b"], params["nested"]["b"])


def test_async_checkpointer(tmp_path, key):
    """AsyncCheckpointer overlaps writes with 'training': every scheduled
    step lands durably, the latest restores exactly, and continued updates
    to the live params don't corrupt earlier captures (immutability)."""
    from approximategps_tpu.utils.checkpoint import AsyncCheckpointer, latest_step

    params = {"a": jax.random.normal(key, (8,)), "s": jnp.zeros(3)}
    saved = {}
    with AsyncCheckpointer(str(tmp_path), max_pending=2) as ck:
        for step in range(4):
            saved[step] = params
            ck.save(params, step)
            params = jax.tree_util.tree_map(lambda x: x + 1.0, params)
    assert latest_step(str(tmp_path)) == 3
    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    for step in (0, 3):
        restored = restore_checkpoint(str(tmp_path), template, step=step)
        np.testing.assert_allclose(restored["a"], saved[step]["a"])


def test_svgp_params_helpers(key):
    z = jnp.linspace(0, 1, 6)
    params = init_svgp_params(z, variance=2.0, lengthscale=0.5)
    sva, f = build_svgp(params)
    # initial q is standard normal (whitened prior == prior)
    np.testing.assert_allclose(sva.q.mean, np.zeros(6))
    np.testing.assert_allclose(sva.q.cov(), np.eye(6), atol=1e-8)
    np.testing.assert_allclose(f.kernel.variance, 2.0, rtol=1e-8)


def test_natgrad_step_moves_toward_optimum(key):
    """Natural-gradient on a conjugate toy: maximizing E_q[log N(y|f,σ²)] −
    KL(q‖p) in one natgrad step with lr=1 lands exactly on the optimum."""
    n = 4
    k1, k2 = jax.random.split(key)
    y = jax.random.normal(k1, (n,))
    s2 = 0.5
    # prior p = N(0, I); optimum: S* = (I + I/s2)^-1, m* = S* y / s2
    def elbo(m, S_L):
        S = S_L @ S_L.T
        ell = -0.5 * jnp.sum(((y - m) ** 2 + jnp.diag(S)) / s2)
        q = agp.MultivariateNormal(m, S_L)
        p = agp.MultivariateNormal(jnp.zeros(n), jnp.eye(n))
        return ell - agp.kl_divergence(q, p)

    m0, L0 = jnp.zeros(n), jnp.eye(n)

    def elbo_mS(m, S):
        # gradient w.r.t. dense S (treating S as free symmetric input)
        S_L = jnp.linalg.cholesky(S)
        return elbo(m, S_L)

    gm = jax.grad(elbo, argnums=0)(m0, L0)
    gS = jax.grad(elbo_mS, argnums=1)(m0, L0 @ L0.T)
    m1, L1 = natgrad_update(m0, L0, gm, gS, lr=1.0)
    S_opt = np.linalg.inv(np.eye(n) * (1 + 1 / s2))
    m_opt = S_opt @ np.asarray(y) / s2
    np.testing.assert_allclose(np.asarray(m1), m_opt, atol=1e-8)
    np.testing.assert_allclose(np.asarray(L1 @ L1.T), S_opt, atol=1e-8)


def test_natgrad_update_tril_matches_dense_S(key):
    """The scale-tril natgrad (gradients w.r.t. q's Cholesky factor,
    converted L̄ → S̄ via the matmul-only Cholesky pullback) produces the
    SAME update as natgrad_update fed dense-S gradients — on a non-trivial
    point (m, S ≠ I) and lr < 1."""
    from approximategps_tpu.utils.training import natgrad_update_tril

    n = 6
    k1, k2, k3 = jax.random.split(key, 3)
    y = jax.random.normal(k1, (n,))
    s2 = 0.3

    def elbo_mL(m, L):
        ell = -0.5 * jnp.sum(((y - m) ** 2 + jnp.sum(jnp.tril(L) ** 2, 1)) / s2)
        q = agp.MultivariateNormal(m, jnp.tril(L))
        p = agp.MultivariateNormal(jnp.zeros(n), jnp.eye(n))
        return ell - agp.kl_divergence(q, p)

    def elbo_mS(m, S):
        return elbo_mL(m, jnp.linalg.cholesky(S))

    R = 0.3 * jax.random.normal(k2, (n, n))
    S0 = R @ R.T + jnp.eye(n)
    L0 = jnp.linalg.cholesky(S0)
    m0 = jax.random.normal(k3, (n,))

    gm, gS = jax.grad(elbo_mS, argnums=(0, 1))(m0, S0)
    m1a, L1a = natgrad_update(m0, L0, gm, gS, lr=0.7)

    gm2, gL = jax.grad(elbo_mL, argnums=(0, 1))(m0, L0)
    m1b, L1b, Linv1 = natgrad_update_tril(m0, L0, gm2, gL, lr=0.7)

    np.testing.assert_allclose(np.asarray(m1b), np.asarray(m1a), atol=1e-9)
    np.testing.assert_allclose(np.asarray(L1b), np.asarray(L1a), atol=1e-9)
    # the carried inverse really is L1⁻¹
    np.testing.assert_allclose(
        np.asarray(Linv1 @ L1b), np.eye(n), atol=1e-9
    )


def test_hybrid_natgrad_adam_step_conjugate_exact(key):
    """make_natgrad_adam_step: one fused hybrid step (Adam on hypers,
    whitened natgrad with lr=1 on (m, L)) from an arbitrary start lands the
    variational distribution exactly on the optimal q for the OLD
    hyperparameters — the ELBO evaluated at (old hyper, new q) equals the
    collapsed Titsias bound — while Adam moves the hypers."""
    import optax

    from approximategps_tpu.models.vfe import VFE, vfe_elbo
    from approximategps_tpu.utils.bijectors import softplus
    from approximategps_tpu.utils.training import make_natgrad_adam_step

    n, M = 40, 8
    k1, k2 = jax.random.split(key)
    x = jnp.sort(jax.random.uniform(k1, (n,), minval=0.0, maxval=6.0))
    y = jnp.sin(x) + 0.1 * jax.random.normal(k2, (n,))
    noise = 0.1
    z = x[:: n // M][:M]

    def elbo_fn(hyper, m, L, xb, yb):
        kernel = softplus(hyper[0]) * agp.with_lengthscale(
            agp.SqExponentialKernel(), softplus(hyper[1])
        )
        f = agp.GP(kernel)
        fz = f(z, 1e-8)
        q = agp.MultivariateNormal(m, jnp.tril(L))
        sva = agp.SparseVariationalApproximation(fz, q)  # NonCentered
        return agp.elbo(sva, f(xb, noise), yb)

    hyper0 = jnp.array([0.5, 0.5])
    m0 = 0.3 * jnp.ones(M)
    L0 = 1.4 * jnp.eye(M)
    step, init = make_natgrad_adam_step(
        elbo_fn, optax.adam(1e-2), nat_lr=1.0
    )
    carry = init(hyper0, m0, L0)
    (hyper1, _, m1, L1, Linv1), e0 = step(carry, x, y)

    assert np.isfinite(float(e0))
    assert not np.allclose(np.asarray(hyper1), np.asarray(hyper0))
    # q after one lr=1 conjugate natgrad step is optimal for hyper0
    e1 = elbo_fn(hyper0, m1, L1, x, y)
    kernel0 = softplus(hyper0[0]) * agp.with_lengthscale(
        agp.SqExponentialKernel(), softplus(hyper0[1])
    )
    f0 = agp.GP(kernel0)
    bound = vfe_elbo(VFE(f0(z, 1e-8)), f0(x, noise), y)
    np.testing.assert_allclose(float(e1), float(bound), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(Linv1 @ L1), np.eye(M), atol=1e-8
    )


# ---------------------------------------------------------------------------
# Pallas ops (interpret mode on CPU)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(16, 16, 2), (100, 60, 3), (7, 200, 1)])
def test_pallas_gram_matches_jnp(shape, key):
    N, M, D = shape
    k1, k2 = jax.random.split(key)
    X = jax.random.normal(k1, (N, D), dtype=jnp.float32)
    Z = jax.random.normal(k2, (M, D), dtype=jnp.float32)
    kern = agp.SqExponentialKernel()
    K_pallas = pallas_stationary_gram(X, Z, kern.k_of_r2)
    with config_context(gram_mode="broadcast"):
        K_ref = kern.gram(X, Z)
    np.testing.assert_allclose(K_pallas, K_ref, atol=1e-5)


def test_pallas_mode_through_kernel_api(key):
    k1, k2 = jax.random.split(key)
    X = jax.random.normal(k1, (32, 2), dtype=jnp.float32)
    kern = agp.Matern32Kernel()
    with config_context(gram_mode="pallas"):
        K_p = kern.gram(X)
    with config_context(gram_mode="broadcast"):
        K_b = kern.gram(X)
    np.testing.assert_allclose(K_p, K_b, atol=1e-5)


def test_pallas_gram_gradients_match_broadcast(key):
    k1, k2 = jax.random.split(key)
    X = jax.random.normal(k1, (12, 2))
    Z = jax.random.normal(k2, (9, 2))
    kern = agp.Matern32Kernel()

    def make(mode):
        def f(X, Z):
            with config_context(gram_mode=mode):
                return jnp.sum(jnp.sin(kern.gram(X, Z)))

        return f

    gp = jax.jit(jax.grad(make("pallas"), argnums=(0, 1)))(X, Z)
    gr = jax.jit(jax.grad(make("broadcast"), argnums=(0, 1)))(X, Z)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_pallas_falls_back_for_parameterized_kernels(key):
    # RationalQuadratic closes over alpha → must silently use the MXU path
    X = jax.random.normal(key, (8, 2))
    kern = agp.RationalQuadraticKernel(alpha=1.3)
    with config_context(gram_mode="pallas"):
        K_p = kern.gram(X)
    with config_context(gram_mode="broadcast"):
        K_b = kern.gram(X)
    np.testing.assert_allclose(K_p, K_b, atol=1e-8)


def test_minibatch_iterator(key):
    from approximategps_tpu.utils.data import epoch_batches, minibatch_iterator

    x = jnp.arange(20.0)
    y = 2 * x
    batches = list(minibatch_iterator(key, (x, y), batch_size=5, epochs=2))
    assert len(batches) == 8
    for xb, yb in batches:
        assert xb.shape == (5,)
        np.testing.assert_allclose(yb, 2 * xb)
    # each epoch covers all points exactly once
    first_epoch = np.sort(np.concatenate([np.asarray(b[0]) for b in batches[:4]]))
    np.testing.assert_allclose(first_epoch, np.asarray(x))

    eb = epoch_batches(key, 20, 6)
    assert eb.shape == (3, 6)
    assert len(set(np.asarray(eb).ravel())) == 18


def test_lbfgs_fit_on_device(key):
    """On-device optax LBFGS loop minimises a quadratic and an SVGP elbo."""
    from approximategps_tpu.utils.training import lbfgs_fit

    # quadratic sanity
    A = jax.random.normal(key, (4, 4))
    Q = A @ A.T + jnp.eye(4)
    b = jax.random.normal(jax.random.PRNGKey(1), (4,))

    params, loss, n = lbfgs_fit(
        lambda p: 0.5 * p["x"] @ Q @ p["x"] - b @ p["x"], {"x": jnp.zeros(4)}
    )
    np.testing.assert_allclose(params["x"], np.linalg.solve(np.asarray(Q), b), atol=1e-6)
    assert n < 100


# ---------------------------------------------------------------------------
# hyperpriors / MAP objective
# ---------------------------------------------------------------------------


def test_priors_match_scipy():
    from scipy import stats

    from approximategps_tpu.utils import priors as P

    theta = jnp.array([0.3, 1.7, 2.4])
    np.testing.assert_allclose(
        P.normal_prior(0.5, 2.0)(theta), stats.norm.logpdf(theta, 0.5, 2.0).sum(), rtol=1e-12
    )
    np.testing.assert_allclose(
        P.lognormal_prior(0.1, 0.9)(theta),
        stats.lognorm.logpdf(theta, 0.9, scale=np.exp(0.1)).sum(), rtol=1e-12
    )
    np.testing.assert_allclose(
        P.gamma_prior(2.0, 3.0)(theta),
        stats.gamma.logpdf(theta, 2.0, scale=1.0 / 3.0).sum(), rtol=1e-12
    )
    np.testing.assert_allclose(
        P.halfnormal_prior(1.5)(theta), stats.halfnorm.logpdf(theta, scale=1.5).sum(), rtol=1e-12
    )


def test_map_objective_jacobian_correction():
    """The softplus log-Jacobian makes the unconstrained-space density
    integrate correctly: a MAP objective with a sharp prior pulls the
    optimum toward the prior mode."""
    from approximategps_tpu.utils import priors as P
    from approximategps_tpu.utils.bijectors import invsoftplus, softplus

    X, Y = tu.generate_data()
    import approximategps_tpu.models.laplace as L

    obj = L.build_laplace_objective(tu.build_latent_gp, X, Y, newton_tol=1e-10)

    def neg_lml(raw):
        return obj(jnp.stack([raw["var"], raw["ls"]]))

    # tight prior on the lengthscale around 1.0
    map_obj = P.map_objective(neg_lml, {"ls": P.lognormal_prior(0.0, 0.05)})

    import scipy.optimize

    def minimize(fn):
        flat0 = np.array([2.0, 2.0])
        r = scipy.optimize.minimize(
            lambda t: float(fn({"var": jnp.asarray(t[0]), "ls": jnp.asarray(t[1])})),
            flat0, method="Nelder-Mead", options={"maxiter": 150},
        )
        return np.asarray(r.x)

    t_ml = minimize(neg_lml)
    t_map = minimize(map_obj)
    ls_ml, ls_map = float(softplus(t_ml[1])), float(softplus(t_map[1]))
    # the MAP lengthscale must sit much closer to the prior mode exp(0)=1
    assert abs(np.log(ls_map)) < 0.25, ls_map
    assert abs(np.log(ls_map)) < abs(np.log(ls_ml)), (ls_ml, ls_map)


def test_log_prior_gradients_finite():
    from approximategps_tpu.utils import priors as P

    raw = {"var": jnp.asarray(0.3), "ls": jnp.asarray(-0.2)}
    lp = lambda r: P.log_prior(r, {"var": P.gamma_prior(2.0, 1.0), "ls": P.lognormal_prior()})
    g = jax.grad(lp)(raw)
    assert np.isfinite(float(g["var"])) and np.isfinite(float(g["ls"]))


def test_panel_chol_inv_matches_xla():
    """Streamed-panel Pallas (L, L⁻¹) kernel (interpret mode) == XLA
    cholesky + triangular solve, f64, multiple panel widths and sizes."""
    from approximategps_tpu.ops.panel_chol import pallas_chol_inv

    key = jax.random.PRNGKey(7)
    # (384, 128): multi-panel AND a non-power-of-two panel count;
    # (256, 64): narrow panels.  A third (256, 128) case covered nothing new.
    for M, panel in [(384, 128), (256, 64)]:
        R = jax.random.normal(key, (M, M))
        A = R @ R.T + M * jnp.eye(M)
        L, J = jax.jit(
            lambda A, p=panel: pallas_chol_inv(A, panel=p, interpret=True)
        )(A)
        L0 = jnp.linalg.cholesky(A)
        J0 = jax.scipy.linalg.solve_triangular(L0, jnp.eye(M), lower=True)
        np.testing.assert_allclose(L, L0, atol=1e-11)
        np.testing.assert_allclose(J, J0, atol=1e-11)
        # exact zeros above the diagonal (cache contract)
        assert not np.any(np.triu(np.asarray(L), 1))
        assert not np.any(np.triu(np.asarray(J), 1))


def test_gram_panel_chol_matches_reference():
    """Gram-fused panel kernel == chol/inv of the explicitly-built
    σ²·g(r²)+jitter·I, f64 interpret mode (exact broadcast distances inside
    the kernel — the symmetric-Gram PSD policy)."""
    from approximategps_tpu.core.kernels import SqExponentialKernel
    from approximategps_tpu.ops.panel_chol import pallas_gram_chol_inv

    M, D = 384, 5
    key = jax.random.PRNGKey(11)
    Z = 1.3 * jax.random.normal(key, (M, D))
    sig2, jit = 1.7, 1e-6
    L, J = jax.jit(
        lambda Z: pallas_gram_chol_inv(
            Z, sig2, jit, SqExponentialKernel.k_of_r2, interpret=True
        )
    )(Z)
    diff = Z[:, None, :] - Z[None, :, :]
    K = sig2 * jnp.exp(-0.5 * jnp.sum(diff * diff, -1)) + jit * jnp.eye(M)
    L0 = jnp.linalg.cholesky(K)
    J0 = jax.scipy.linalg.solve_triangular(L0, jnp.eye(M), lower=True)
    np.testing.assert_allclose(L, L0, atol=1e-10)
    np.testing.assert_allclose(J, J0, atol=1e-7)  # amplified by cond(K)
    assert not np.any(np.triu(np.asarray(L), 1))
    assert not np.any(np.triu(np.asarray(J), 1))


def test_chol_with_inv_pallas_route_values_and_gradients():
    """chol_mode="pallas" routes chol_with_inv through the panel kernel;
    values AND elbo-style gradients (via the matmul-only custom VJP, which
    only sees (L, J)) must match the XLA route."""
    from approximategps_tpu.config import config_context
    from approximategps_tpu.core.linalg import chol_with_inv

    key = jax.random.PRNGKey(8)
    M = 512  # hardware-eligible shape (M % 512 == 0) so "pallas" engages
    R = jax.random.normal(key, (M, M))

    def loss(R):
        A = R @ R.T + M * jnp.eye(M)
        L, J = chol_with_inv(A)
        return jnp.sum(jnp.sin(L)) + jnp.sum(J * J) * 1e-3

    with config_context(chol_mode="xla"):
        v_x, g_x = jax.value_and_grad(loss)(R)
    with config_context(chol_mode="pallas", pallas_interpret=True):
        v_p, g_p = jax.value_and_grad(loss)(R)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-12)
    np.testing.assert_allclose(g_p, g_x, atol=1e-9)
