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
    np.testing.assert_allclose(jax.jit(mv_full)(V), dense, atol=1e-10)
    np.testing.assert_allclose(jax.jit(mv_blocked)(V), dense, atol=1e-10)


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
    xs = jnp.linspace(0, 8, 25)
    mu_d, var_d = jax.jit(lambda y: agp.posterior(fx, y).mean_and_var(xs))(y)
    mu_c, var_c = jax.jit(
        lambda y: posterior_cg(fx, y, tol=1e-10, precond_rank=20).mean_and_var(xs)
    )(y)
    np.testing.assert_allclose(mu_c, mu_d, atol=1e-6)
    np.testing.assert_allclose(var_c, var_d, atol=1e-6)


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


def test_msqrt_matvec_is_accurate_sqrt():
    """Lanczos A^{1/2}b vs dense sqrtm application (full iterations =
    exact in exact arithmetic)."""
    key = jax.random.PRNGKey(5)
    N = 64
    R = jax.random.normal(key, (N, N))
    A = R @ R.T + 0.5 * jnp.eye(N)
    b = jax.random.normal(jax.random.fold_in(key, 1), (N,))
    from approximategps_tpu.models.iterative import msqrt_matvec

    out = msqrt_matvec(lambda v: A @ v, b, num_iters=N)
    evals, evecs = jnp.linalg.eigh(A)
    ref = evecs @ (jnp.sqrt(evals) * (evecs.T @ b))
    np.testing.assert_allclose(out, ref, atol=1e-9)
    # truncated Krylov: error decays with m (≈2e-3 max abs at m=30 on this
    # cond≈500 fixture — quadrature-order truncation, not a bug)
    out30 = msqrt_matvec(lambda v: A @ v, b, num_iters=30)
    np.testing.assert_allclose(out30, ref, atol=5e-3)


def test_sample_prior_msqrt_moments():
    """Empirical covariance of msqrt prior draws → K + σ²I."""
    from approximategps_tpu.models.iterative import sample_prior_msqrt

    N = 48
    x = jnp.linspace(0, 5, N)
    kern = 1.3 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.8)
    K = kern.gram(x[:, None]) + 0.05 * jnp.eye(N)
    S = sample_prior_msqrt(jax.random.PRNGKey(0), kern, x, 0.05, 4000,
                           lanczos_iters=40)
    emp = (S.T @ S) / S.shape[0]
    assert float(jnp.max(jnp.abs(emp - K))) < 0.12


def test_sample_posterior_msqrt_moment_matching():
    """VERDICT r2 item 10: Matheron samples with the Lanczos-msqrt joint
    prior match the dense posterior's mean and covariance (the exact-prior
    counterpart of the RFF pathwise sampler — no feature-truncation bias)."""
    from approximategps_tpu.core.gp import posterior as exact_posterior
    from approximategps_tpu.models.iterative import sample_posterior_msqrt

    key = jax.random.PRNGKey(9)
    N = 40
    kern = 1.5 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.9)
    f = agp.GP(kern)
    x = jnp.linspace(0, 4, N)
    fx = f(x, 0.05)
    y = fx.sample(key)
    xs = jnp.linspace(-0.5, 4.5, 11)

    S = jax.jit(
        lambda k: sample_posterior_msqrt(k, fx, y, xs, num_samples=6000,
                                         lanczos_iters=48, tol=1e-10)
    )(jax.random.fold_in(key, 1))
    post = exact_posterior(fx, y)
    mu, cov = post.mean_and_cov(xs)
    emp_mu = S.mean(axis=0)
    emp_cov = jnp.cov(S.T, bias=True)
    np.testing.assert_allclose(emp_mu, mu, atol=0.08)
    np.testing.assert_allclose(emp_cov, cov, atol=0.08)


def test_slq_logdet_high_condition_envelope():
    """VERDICT r2 item 6: SLQ logdet accuracy at cond ≥ 1e6, N = 4096, f32
    (measured envelope, recorded in BENCH_NOTES):

    - cond ≈ 1.6e6: relative error ≤ 2% for BOTH one-step and fully
      reorthogonalized Lanczos (measured 0.1% / 0.7% at P=32, m=64);
    - beyond cond ≈ 1e7 the estimate degrades CATASTROPHICALLY in f32
      regardless of reorthogonalization: λmin/λmax drops below the f32
      matvec noise floor (~1e-7·‖K‖), so the quadrature integrates noise
      eigenvalues — a dtype resolution limit, not a Lanczos-orthogonality
      failure.  The preconditioned-CG work targets the SOLVE at such
      conditions; logdet there needs f64 islands or shifted formulations.
    """
    N = 4096
    key = jax.random.PRNGKey(2)
    # clustered 1-D points + 1e-3 noise → cond(K + σ²I) ≈ 1.6e6
    x64 = jnp.sort(jax.random.uniform(key, (N,), dtype=jnp.float64) * 3.0)
    noise = 1e-3
    kern = 1.0 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.5)
    K64 = jax.jit(lambda x: kern.gram(x[:, None]) + noise * jnp.eye(N))(x64)
    # Cholesky logdet + power/inverse iteration for the extreme eigenvalues:
    # a full eigvalsh(4096) costs ~15 s of the suite on this 1-CPU box for
    # the same two numbers
    Kn = np.asarray(K64, dtype=np.float64)
    C = np.linalg.cholesky(Kn)
    logdet_true = float(2.0 * np.sum(np.log(np.diag(C))))
    rng = np.random.RandomState(0)
    v = rng.randn(N)
    for _ in range(30):
        v = Kn @ v
        v /= np.linalg.norm(v)
    lmax = float(v @ (Kn @ v))
    w = rng.randn(N)
    import scipy.linalg as sla
    for _ in range(30):
        w = sla.cho_solve((C, True), w)
        w /= np.linalg.norm(w)
    lmin = float(w @ (Kn @ w))
    cond = lmax / lmin
    assert cond > 1e6, cond

    x32 = x64.astype(jnp.float32)
    fx32 = agp.GP(kern)(x32, jnp.float32(noise))
    y32 = jnp.zeros((N,), jnp.float32)

    def slq_logdet(reorth):
        # logpdf = -0.5(yᵀK⁻¹y + logdet + N log 2π); y = 0 isolates logdet
        # 16 probes: measured errors 0.1% / 0.7% at 32 probes vs the 2%
        # gate -- estimator noise scales 1/sqrt(P), margin stays >2x
        lp = jax.jit(
            lambda k: agp.logpdf_slq(fx32, y32, k, num_probes=16,
                                     lanczos_iters=64, cg_tol=1e-6,
                                     cg_maxiter=2000, reorth=reorth)
        )(jax.random.PRNGKey(3))
        return float(-2.0 * lp - N * np.log(2 * np.pi))

    for reorth in (False, True):
        err = abs(slq_logdet(reorth) - logdet_true) / abs(logdet_true)
        assert err < 0.02, (reorth, err)


def test_slq_preconditioned_matches_unpreconditioned(key):
    """logpdf_slq with CG preconditioning (fresh-built or a carried stale
    factor) equals the unpreconditioned value AND gradient to solve
    tolerance — preconditioning is solution-invariant, and the carried
    factor gets a zero cotangent."""
    from approximategps_tpu.models.iterative import pivoted_cholesky

    f, fx, x, y = _setup(key, N=60)
    kw = dict(num_probes=16, lanczos_iters=40, cg_tol=1e-10)
    k0 = jax.random.PRNGKey(0)

    def lml(theta, **pkw):
        kern = jax.nn.softplus(theta[0]) * agp.with_lengthscale(
            agp.Matern52Kernel(), jax.nn.softplus(theta[1])
        )
        return logpdf_slq(agp.GP(kern)(x, 0.1), y, k0, **kw, **pkw)

    theta = jnp.array([1.2, 0.7])
    v0, g0 = jax.value_and_grad(lml)(theta)
    # precond_logdet=False isolates the SOLVE preconditioning, which is
    # solution-invariant — value and gradient match exactly
    v1, g1 = jax.value_and_grad(
        lambda t: lml(t, precond_rank=20, precond_logdet=False)
    )(theta)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-6)

    # carried STALE factor (built under different hypers): still exact
    kern_stale = 0.7 * agp.with_lengthscale(agp.Matern52Kernel(), 1.5)
    Lk = pivoted_cholesky(kern_stale, x, 20)
    v2, g2 = jax.value_and_grad(
        lambda t: lml(t, precond_Lk=Lk, precond_logdet=False)
    )(theta)
    np.testing.assert_allclose(float(v2), float(v0), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g0), rtol=1e-6)

    # the default (preconditioned logdet quadrature): a DIFFERENT estimator
    # of the same logdet — both sit within probe noise of the dense exact
    # value, and the gradient (estimator independent of the forward
    # quadrature path) matches exactly
    from approximategps_tpu.core.gp import logpdf

    def exact(theta):
        kern = jax.nn.softplus(theta[0]) * agp.with_lengthscale(
            agp.Matern52Kernel(), jax.nn.softplus(theta[1])
        )
        return logpdf(agp.GP(kern)(x, 0.1), y)

    v_exact = float(exact(theta))
    v3, g3 = jax.value_and_grad(lambda t: lml(t, precond_rank=20))(theta)
    assert abs(float(v3) - v_exact) < 0.05 * abs(v_exact), (float(v3), v_exact)
    assert abs(float(v0) - v_exact) < 0.05 * abs(v_exact), (float(v0), v_exact)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g0), rtol=1e-6)


def test_slq_stale_precond_logdet_unbiased(key):
    """ADVICE r4 (medium): with a CARRIED stale factor and precond_logdet
    (the default), C = P^{-1/2} K̂ P^{-1/2} is NOT provably ⪰ I — its sub-1
    eigenvalues are real, so the Ritz floor must drop below 1 for carried
    factors or the value is one-sidedly clamp-biased.

    Adversarial staleness: the stale factor's kernel has LARGER variance
    than the current one, pushing much of C's spectrum strictly below 1.
    The fresh-factor path (floor = 1, provable) must stay accurate too."""
    from approximategps_tpu.core.gp import logpdf
    from approximategps_tpu.models.iterative import pivoted_cholesky

    f, fx, x, y = _setup(key, N=80)
    kw = dict(num_probes=24, lanczos_iters=50, cg_tol=1e-10)
    k0 = jax.random.PRNGKey(0)
    v_exact = float(logpdf(fx, y))

    # stale factor from a 4x-variance kernel: C ≺ I over the top of the
    # spectrum, eigenvalues ~0.25-class — the old floor=1.0 clamps them all
    kern_stale = 6.0 * agp.with_lengthscale(agp.Matern52Kernel(), 0.8)
    Lk = pivoted_cholesky(kern_stale, x, 40)
    v_stale = float(logpdf_slq(fx, y, k0, precond_Lk=Lk, **kw))
    assert abs(v_stale - v_exact) < 0.02 * abs(v_exact), (v_stale, v_exact)

    # fresh path unchanged: provable floor, matches exact
    v_fresh = float(logpdf_slq(fx, y, k0, precond_rank=40, **kw))
    assert abs(v_fresh - v_exact) < 0.02 * abs(v_exact), (v_fresh, v_exact)


def test_make_slq_hyperopt_step_refresh_schedule(key):
    """The carried preconditioner refreshes ONLY on schedule (every
    refresh_every steps), the loss decreases over a short run, and the
    factor actually changes at a refresh once the hypers have moved."""
    from approximategps_tpu.utils.training import make_slq_hyperopt_step

    f, fx, x, y = _setup(key, N=50)

    def build_fx(theta):
        kern = jax.nn.softplus(theta[0]) * agp.with_lengthscale(
            agp.Matern52Kernel(), jax.nn.softplus(theta[1])
        )
        return agp.GP(kern)(x, 0.1)

    step, init = make_slq_hyperopt_step(
        build_fx, y, jax.random.PRNGKey(1), learning_rate=0.1,
        precond_rank=12, refresh_every=2,
        num_probes=8, lanczos_iters=30, cg_tol=1e-10,
    )
    carry = init(jnp.array([0.2, 0.2]))
    Lks, losses = [], []
    for _ in range(4):
        Lks.append(np.asarray(carry[2]))
        carry, loss = step(carry)
        losses.append(float(loss))
    # Lks[i] = carried factor AFTER i steps.  Step 1 (t=0) SKIPS the
    # refresh (init already built it from these hypers); step 2 (t=1)
    # carries; step 3 (t=2) refreshes with MOVED hypers → changed.
    np.testing.assert_array_equal(Lks[1], Lks[0])
    np.testing.assert_array_equal(Lks[2], Lks[1])
    assert np.abs(Lks[3] - Lks[2]).max() > 0
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_slq_logdet_cond1e8_preconditioned():
    """VERDICT r3 item 4: the preconditioned-SLQ logdet split
    (logdet K̂ = logdet P + tr log(P^{−1/2}K̂P^{−1/2}), exact closed-form
    logdet P) holds f32 accuracy ≤ 5% at cond ≈ 1e8 — past the measured
    cond ≈ 1e7 dtype floor where the RAW quadrature integrates matvec-noise
    eigenvalues (`test_slq_logdet_high_condition_envelope`).  P absorbs the
    top of the spectrum, so the quadrature only ever sees
    cond(C) ≈ λ_{r+1}(K)/σ²."""
    N = 4096
    key = jax.random.PRNGKey(2)
    x64 = jnp.sort(jax.random.uniform(key, (N,), dtype=jnp.float64) * 3.0)
    noise = 1e-5  # cond(K + σ²I) ≈ 1.6e8 on this clustered design
    kern = 1.0 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.5)
    K64 = jax.jit(lambda x: kern.gram(x[:, None]) + noise * jnp.eye(N))(x64)
    Kn = np.asarray(K64, dtype=np.float64)
    C = np.linalg.cholesky(Kn)
    logdet_true = float(2.0 * np.sum(np.log(np.diag(C))))

    x32 = x64.astype(jnp.float32)
    fx32 = agp.GP(kern)(x32, jnp.float32(noise))
    y32 = jnp.zeros((N,), jnp.float32)

    def slq_logdet(**kw):
        lp = jax.jit(
            lambda k: agp.logpdf_slq(fx32, y32, k, num_probes=16,
                                     lanczos_iters=64, cg_tol=1e-6,
                                     cg_maxiter=2000, **kw)
        )(jax.random.PRNGKey(3))
        return float(-2.0 * lp - N * np.log(2 * np.pi))

    est = slq_logdet(precond_rank=128)
    err = abs(est - logdet_true) / abs(logdet_true)
    assert err < 0.05, (est, logdet_true, err)

    # History of the raw-quadrature contrast: with the vmapped per-probe
    # recurrence the raw estimate measured ~95-100% error here (CPU f32 —
    # the quadrature integrated matvec-noise eigenvalues) and this test
    # asserted err < raw_err.  The r5 column-blocked recurrence
    # (`_lanczos_block`) lowers the probe matvecs as one (n, P) GEMM whose
    # CPU-f32 accumulation is measurably more accurate than the vmapped
    # per-probe GEMV, and the raw error at this fixture dropped to a
    # consistent ~2-3.5% across probe keys — so the contrast is no longer
    # demonstrable at cond 1.6e8 on CPU.  The raw envelope remains
    # UNGUARANTEED (dtype-floor-dependent, backend-dependent); the
    # preconditioned ≤5% gate above is the contract.  Keep the raw run as
    # a smoke check that it stays finite.
    raw = slq_logdet(precond_rank=0)
    assert np.isfinite(raw), raw


def test_lanczos_block_matches_per_probe(key):
    """Column-blocked Lanczos (`_lanczos_block`) is probe-for-probe identical
    to the vmapped single-vector recurrence — the blocked form exists so the
    matvec sees a real (n, R) block (fused Pallas tier / shared gram) rather
    than a batch tracer, and must not change the math."""
    from approximategps_tpu.models.iterative import (
        _lanczos,
        _lanczos_block,
        _slq_quadrature,
    )

    n, R, m = 48, 7, 12
    k1, k2 = jax.random.split(key)
    B = jax.random.normal(k1, (n, n))
    A = B @ B.T + n * jnp.eye(n)
    V0 = jnp.sign(jax.random.normal(k2, (n, R)))

    a_blk, b_blk = _lanczos_block(lambda v: A @ v, V0, m)
    a_ref, b_ref = jax.vmap(
        lambda v: _lanczos(lambda u: A @ u, v, m), in_axes=1, out_axes=1
    )(V0)
    np.testing.assert_allclose(np.asarray(a_blk), np.asarray(a_ref),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(b_blk), np.asarray(b_ref),
                               rtol=1e-9, atol=1e-10)

    # quadrature over the blocked outputs == mean of per-probe quadratures
    got = float(_slq_quadrature(a_blk, b_blk, n, 1e-30))
    sign, true_logdet = np.linalg.slogdet(np.asarray(A))
    assert sign > 0
    assert abs(got - true_logdet) / abs(true_logdet) < 0.2, (
        got, true_logdet)
