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


def test_pivoted_cholesky_approximates_k(key):
    """Rank-r pivoted Cholesky: LLᵀ ≈ K with error below the (r+1)-th
    eigenvalue tail; full rank reproduces K exactly."""
    from approximategps_tpu.models.iterative import pivoted_cholesky

    x = jnp.sort(jax.random.uniform(key, (60,))) * 10
    kern = 1.5 * agp.with_lengthscale(agp.SqExponentialKernel(), 1.2)
    K = kern.gram(x)
    L20 = pivoted_cholesky(kern, x, 20)
    err20 = float(jnp.abs(L20 @ L20.T - K).max())
    evals = np.linalg.eigvalsh(np.asarray(K))[::-1]
    # max-norm error tracks the eigenvalue tail up to a small factor
    assert err20 < 10 * max(float(evals[20:].sum()), 1e-10) + 1e-8, err20
    Lfull = pivoted_cholesky(kern, x, 60)
    np.testing.assert_allclose(Lfull @ Lfull.T, K, atol=1e-8)


def test_preconditioner_cuts_cg_iterations(key):
    """Woodbury/pivoted-Cholesky preconditioning must reduce CG iterations
    substantially on an ill-conditioned smooth-kernel system, with the same
    solution."""
    from approximategps_tpu.models.iterative import (
        cg_solve,
        kernel_matvec,
        pivoted_cholesky,
        woodbury_preconditioner,
    )

    N = 400
    x = jnp.sort(jax.random.uniform(key, (N,))) * 4.0  # dense → ill-conditioned
    kern = 2.0 * agp.with_lengthscale(agp.SqExponentialKernel(), 1.0)
    noise = 1e-3
    mv = kernel_matvec(kern, x, noise)
    b = jnp.sin(x * 3)

    sol_plain, it_plain = cg_solve(mv, b, tol=1e-8, maxiter=2000, return_info=True)
    Lk = pivoted_cholesky(kern, x, 30)
    M_inv = woodbury_preconditioner(Lk, noise)
    sol_pre, it_pre = cg_solve(mv, b, tol=1e-8, maxiter=2000, M_inv=M_inv, return_info=True)

    K = kern.gram(x) + noise * jnp.eye(N)
    truth = jnp.linalg.solve(K, b)
    np.testing.assert_allclose(sol_pre, truth, rtol=1e-4, atol=1e-6)
    assert int(it_pre) < 0.35 * int(it_plain), (int(it_pre), int(it_plain))


def test_posterior_cg_preconditioned_matches_dense(key):
    """posterior_cg(precond_rank=20) == dense exact posterior."""
    from approximategps_tpu.models.iterative import posterior_cg

    x = jnp.sort(jax.random.uniform(key, (150,))) * 8
    f = agp.GP(1.3 * agp.with_lengthscale(agp.Matern52Kernel(), 0.9))
    fx = f(x, 0.01)
    y = jnp.sin(x) + 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (150,))
    dense = agp.posterior(fx, y)
    cg = posterior_cg(fx, y, tol=1e-10, precond_rank=20)
    xs = jnp.linspace(0, 8, 25)
    np.testing.assert_allclose(cg.mean(xs), dense.mean(xs), atol=1e-6)
    np.testing.assert_allclose(cg.var(xs), dense.var(xs), atol=1e-6)


def test_logpdf_slq_gradients_match_dense():
    """The stochastic-trace custom VJP of logpdf_slq: dy is EXACT (−α via
    the quadratic term only) and dθ matches the dense logpdf gradient to
    Hutchinson-estimator noise (P=4096 Rademacher probes)."""
    from approximategps_tpu.core.gp import logpdf
    from approximategps_tpu.utils.bijectors import softplus

    key = jax.random.PRNGKey(0)
    N = 24
    x = jnp.linspace(0, 5, N)[:, None]
    y = jnp.sin(2 * x[:, 0]) + 0.1 * jax.random.normal(key, (N,))

    def build(theta):
        kern = softplus(theta[0]) * agp.with_lengthscale(
            agp.SqExponentialKernel(), softplus(theta[1])
        )
        return agp.GP(kern)(x, softplus(theta[2]))

    def f_slq(theta, y):
        return logpdf_slq(build(theta), y, jax.random.PRNGKey(42),
                          num_probes=4096, lanczos_iters=24, cg_tol=1e-12)

    def f_dense(theta, y):
        return logpdf(build(theta), y)

    theta = jnp.array([0.3, 0.2, -2.0])
    g1t, g1y = jax.grad(f_slq, argnums=(0, 1))(theta, y)
    g2t, g2y = jax.grad(f_dense, argnums=(0, 1))(theta, y)
    np.testing.assert_allclose(g1y, g2y, atol=1e-10)  # exact path
    scale = float(jnp.max(jnp.abs(g2t)))
    np.testing.assert_allclose(g1t, g2t, atol=0.05 * scale + 0.05)


def test_logpdf_slq_training_recovers_noise():
    """A few Adam steps on -logpdf_slq move the noise hyperparameter toward
    the dense-lml optimum (the matrix-free training loop end-to-end)."""
    from approximategps_tpu.core.gp import logpdf
    from approximategps_tpu.utils.bijectors import softplus

    key = jax.random.PRNGKey(3)
    N = 40
    x = jnp.linspace(0, 6, N)[:, None]
    y = jnp.sin(1.5 * x[:, 0]) + 0.3 * jax.random.normal(key, (N,))

    def neg_lml(raw, dense=False):
        kern = 1.0 * agp.with_lengthscale(agp.SqExponentialKernel(), 1.0)
        fx = agp.GP(kern)(x, softplus(raw))
        if dense:
            return -logpdf(fx, y)
        return -logpdf_slq(fx, y, jax.random.PRNGKey(7), num_probes=256,
                           lanczos_iters=30, cg_tol=1e-10)

    raw = jnp.asarray(2.0)  # noise ~ 2.1, far above the true 0.09
    grad_slq = jax.jit(jax.grad(neg_lml))  # hoisted: one trace, not 26
    g0 = float(grad_slq(raw))
    gd = float(jax.grad(lambda r: neg_lml(r, dense=True))(raw))
    # same descent direction, comparable magnitude
    assert np.sign(g0) == np.sign(gd)
    assert abs(g0 - gd) < 0.3 * abs(gd) + 0.05
    for _ in range(25):
        raw = raw - 0.25 * grad_slq(raw)
    assert float(softplus(raw)) < 0.8  # moved decisively toward the optimum
