"""Streaming/online SVGP (models/svgp_online.py, arXiv:1705.07131).

Beyond-reference capability — no reference counterpart, so the oracles are
mathematical: exact telescoping to the full-batch Titsias optimum for the
Gaussian conjugate case, stationarity of the bound at the closed-form
optimum, reduction to the batch ELBO when the carried state is the prior,
and FD-checked hyperparameter gradients through the correction term.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import approximategps_tpu as agp
from approximategps_tpu.models.svgp_online import centered_q

LS = 0.6
NOISE = 0.1


def _prior():
    return agp.GP(agp.with_lengthscale(agp.SqExponentialKernel(), LS))


def _data(key, n=60):
    f = _prior()
    x = jnp.linspace(-2.0, 2.0, n)
    fx = f(x, NOISE)
    y = fx.sample(key)
    return f, x, y


def _prior_state(fz):
    return agp.OnlineSVGPState(fz, fz.to_mvn())


def test_correction_vanishes_for_prior_state(key):
    """q_old == p_old (same sites/hypers) ⇒ online bound == batch ELBO."""
    f, x, y = _data(key, 24)
    z = x[::4]
    fz = f(z, 1e-8)
    q = agp.MultivariateNormal(
        jnp.sin(jnp.arange(6.0)), jnp.eye(6) + 0.1 * jnp.tril(jnp.ones((6, 6)), -1)
    )
    sva = agp.SparseVariationalApproximation(fz, q, agp.Centered())
    batch = agp.elbo(sva, f(x, NOISE), y)
    online = agp.online_elbo(sva, _prior_state(fz), f(x, NOISE), y)
    np.testing.assert_allclose(online, batch, rtol=1e-10)


def test_gaussian_streaming_equals_batch(key):
    """Fixed z and hypers: sequential closed-form online updates telescope to
    the full-batch optimal variational posterior (Bui et al. §3.1)."""
    f, x, y = _data(key, 60)
    z = jnp.linspace(-1.9, 1.9, 9)
    fz = f(z, 1e-10)

    state = _prior_state(fz)
    for i in range(3):
        xb, yb = x[i * 20 : (i + 1) * 20], y[i * 20 : (i + 1) * 20]
        q_new = agp.online_optimal_q(state, fz, f(xb, NOISE), yb)
        state = agp.OnlineSVGPState(fz, q_new)

    q_batch = agp.optimal_variational_posterior(fz, f(x, NOISE), y)
    np.testing.assert_allclose(state.q.mean, q_batch.mean, atol=1e-8)
    np.testing.assert_allclose(state.q.cov(), q_batch.cov(), atol=1e-8)

    # and the resulting posteriors predict identically
    xs = jnp.linspace(-2.5, 2.5, 17)
    p_on = agp.posterior(
        agp.SparseVariationalApproximation(fz, state.q, agp.Centered())
    )
    p_ba = agp.posterior(
        agp.SparseVariationalApproximation(fz, q_batch, agp.Centered())
    )
    np.testing.assert_allclose(p_on.mean(xs), p_ba.mean(xs), atol=1e-8)
    np.testing.assert_allclose(p_on.var(xs), p_ba.var(xs), atol=1e-8)


def test_first_round_matches_batch_optimum(key):
    """From a prior state, one online update == the batch Titsias optimum on
    that batch alone (the correction contributes nothing)."""
    f, x, y = _data(key, 20)
    z = x[::3]
    fz = f(z, 1e-10)
    q1 = agp.online_optimal_q(_prior_state(fz), fz, f(x, NOISE), y)
    q_batch = agp.optimal_variational_posterior(fz, f(x, NOISE), y)
    np.testing.assert_allclose(q1.mean, q_batch.mean, atol=1e-9)
    np.testing.assert_allclose(q1.cov(), q_batch.cov(), atol=1e-9)


def test_online_elbo_stationary_at_closed_form_optimum(key):
    """∂(online bound)/∂(m, L) = 0 at online_optimal_q — pins the bound and
    the natural-parameter update to the same objective."""
    f, x, y = _data(key, 40)
    z = jnp.linspace(-1.8, 1.8, 7)
    fz = f(z, 1e-10)
    x1, y1, x2, y2 = x[:20], y[:20], x[20:], y[20:]

    q1 = agp.online_optimal_q(_prior_state(fz), fz, f(x1, NOISE), y1)
    state = agp.OnlineSVGPState(fz, q1)
    q2 = agp.online_optimal_q(state, fz, f(x2, NOISE), y2)

    def bound(m, L):
        sva = agp.SparseVariationalApproximation(
            fz, agp.MultivariateNormal(m, L), agp.Centered()
        )
        return agp.online_elbo(sva, state, f(x2, NOISE), y2)

    gm, gL = jax.grad(bound, argnums=(0, 1))(q2.mean, q2.scale_tril)
    val = bound(q2.mean, q2.scale_tril)
    assert jnp.isfinite(val)
    np.testing.assert_allclose(gm, jnp.zeros_like(gm), atol=1e-7)
    np.testing.assert_allclose(
        jnp.tril(gL), jnp.zeros_like(gL), atol=1e-7
    )

    # and the optimum is a maximum: random perturbations lower the bound
    for i in range(3):
        dk = jax.random.normal(jax.random.fold_in(key, i), q2.mean.shape)
        assert bound(q2.mean + 0.05 * dk, q2.scale_tril) < val


def test_online_hyper_gradient_matches_fd(key):
    """d(online bound)/d(log lengthscale) flows through the projected
    marginal + correction; check against central finite differences."""
    f, x, y = _data(key, 30)
    z = jnp.linspace(-1.5, 1.5, 6)
    fz_old = f(z, 1e-8)
    q1 = agp.online_optimal_q(_prior_state(fz_old), fz_old, f(x[:15], NOISE), y[:15])
    state = agp.OnlineSVGPState(fz_old, q1)
    q = agp.MultivariateNormal(0.3 * jnp.ones(6), 0.8 * jnp.eye(6))

    def bound(log_ls):
        fnew = agp.GP(agp.with_lengthscale(agp.SqExponentialKernel(), jnp.exp(log_ls)))
        sva = agp.SparseVariationalApproximation(fnew(z, 1e-8), q, agp.Centered())
        return agp.online_elbo(sva, state, fnew(x[15:], NOISE), y[15:])

    t0 = jnp.log(jnp.asarray(0.5))
    g = jax.grad(bound)(t0)
    h = 1e-5
    fd = (bound(t0 + h) - bound(t0 - h)) / (2 * h)
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_noncentered_state_and_bound_match_centered(key):
    """centered_q maps the whitened parametrization to f-space; the online
    bound must agree across parametrizations of the same distribution."""
    f, x, y = _data(key, 24)
    z = x[::4]
    fz = f(z, 1e-8)
    Lk = fz.scale_tril()

    m_eps = jnp.cos(jnp.arange(6.0))
    L_eps = jnp.eye(6) * 0.7 + 0.05 * jnp.tril(jnp.ones((6, 6)), -1)
    sva_nc = agp.SparseVariationalApproximation(
        fz, agp.MultivariateNormal(m_eps, L_eps), agp.NonCentered()
    )
    q_c = centered_q(sva_nc)
    np.testing.assert_allclose(q_c.mean, fz.mean() + Lk @ m_eps, atol=1e-12)
    np.testing.assert_allclose(q_c.cov(), Lk @ L_eps @ L_eps.T @ Lk.T, atol=1e-12)

    sva_c = agp.SparseVariationalApproximation(fz, q_c, agp.Centered())
    state = agp.online_state(sva_nc)  # exercises the NonCentered snapshot
    np.testing.assert_allclose(state.q.mean, q_c.mean, atol=1e-12)

    prior_state = _prior_state(f(z + 0.05, 1e-8))
    b_nc = agp.online_elbo(sva_nc, prior_state, f(x, NOISE), y)
    b_c = agp.online_elbo(sva_c, prior_state, f(x, NOISE), y)
    np.testing.assert_allclose(b_nc, b_c, rtol=1e-9)


def test_streaming_with_moving_sites_and_hypers(key):
    """The general form: new inducing sites AND new hyperparameters between
    rounds.  The update is no longer exact, but with site budgets covering
    the data it stays accuracy-class-close to the batch optimum, and the
    bound stays finite/differentiable."""
    f, x, y = _data(key, 60)
    z1 = jnp.linspace(-1.9, 0.5, 10)
    z2 = jnp.linspace(-1.9, 1.9, 14)

    f2 = agp.GP(agp.with_lengthscale(agp.SqExponentialKernel(), 0.55))
    fz1, fz2 = f(z1, 1e-10), f2(z2, 1e-10)

    q1 = agp.online_optimal_q(_prior_state(fz1), fz1, f(x[:30], NOISE), y[:30])
    state = agp.OnlineSVGPState(fz1, q1)
    q2 = agp.online_optimal_q(state, fz2, f2(x[30:], NOISE), y[30:])

    # reference: batch optimum under the round-2 prior on ALL data
    q_batch = agp.optimal_variational_posterior(fz2, f2(x, NOISE), y)
    xs = jnp.linspace(-1.8, 1.8, 25)
    p_on = agp.posterior(agp.SparseVariationalApproximation(fz2, q2, agp.Centered()))
    p_ba = agp.posterior(
        agp.SparseVariationalApproximation(fz2, q_batch, agp.Centered())
    )
    err = float(jnp.max(jnp.abs(p_on.mean(xs) - p_ba.mean(xs))))
    scale = float(jnp.max(jnp.abs(p_ba.mean(xs))))
    assert err < 0.1 * scale, (err, scale)

    val = agp.online_elbo(
        agp.SparseVariationalApproximation(fz2, q2, agp.Centered()),
        state,
        f2(x[30:], NOISE),
        y[30:],
    )
    assert jnp.isfinite(val)


def test_online_elbo_latent_gaussian_matches_finitegp_path(key):
    """LatentFiniteGP(GaussianLikelihood) through quadrature == the FiniteGP
    analytic path, with the correction term identical."""
    f, x, y = _data(key, 20)
    z = x[::4]
    fz = f(z, 1e-8)
    q = agp.MultivariateNormal(jnp.ones(5) * 0.2, 0.9 * jnp.eye(5))
    sva = agp.SparseVariationalApproximation(fz, q, agp.Centered())
    state = _prior_state(f(z - 0.1, 1e-8))

    lf = agp.LatentGP(f, agp.GaussianLikelihood(NOISE), 0.0)
    b1 = agp.online_elbo(sva, state, f(x, NOISE), y)
    b2 = agp.online_elbo(sva, state, lf(x), y)
    np.testing.assert_allclose(b1, b2, rtol=1e-9)


def test_online_bernoulli_improves_with_second_batch(key):
    """Non-conjugate streaming: a short Adam fit of the online bound on a
    second Bernoulli batch must beat carrying the round-1 posterior
    unchanged, measured by the round-2 online bound itself, and move
    predictions toward the full-batch fit."""
    import optax

    f = agp.GP(agp.with_lengthscale(agp.SqExponentialKernel(), 0.8))
    x = jnp.linspace(-2.0, 2.0, 40)
    key_f, key_y = jax.random.split(jax.random.PRNGKey(7))
    lf = agp.LatentGP(f, agp.BernoulliLikelihood(), 1e-8)
    ftrue = f(x, 1e-8).sample(key_f) * 2.0
    y = (jax.random.uniform(key_y, (40,)) < jax.nn.sigmoid(ftrue)).astype(x.dtype)

    z = jnp.linspace(-1.9, 1.9, 8)
    fz = f(z, 1e-8)

    def fit(loss_fn, q0, steps=400):
        params = (q0.mean, q0.scale_tril)
        opt = optax.adam(5e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def wrap(p):
                m, L = p
                L = jnp.tril(L)
                return -loss_fn(agp.MultivariateNormal(m, L))

            val, g = jax.value_and_grad(wrap)(params)
            updates, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, val

        for _ in range(steps):
            params, opt_state, _ = step(params, opt_state)
        m, L = params
        return agp.MultivariateNormal(m, jnp.tril(L))

    # round 1 on the first half
    def round1_loss(q):
        sva = agp.SparseVariationalApproximation(fz, q, agp.Centered())
        return agp.elbo(sva, lf(x[:20]), y[:20])

    q1 = fit(round1_loss, fz.to_mvn())
    state = agp.OnlineSVGPState(fz, q1)

    # round 2 on the second half via the online bound
    def round2_loss(q):
        sva = agp.SparseVariationalApproximation(fz, q, agp.Centered())
        return agp.online_elbo(sva, state, lf(x[20:]), y[20:])

    q2 = fit(round2_loss, q1)
    assert float(round2_loss(q2)) > float(round2_loss(q1)) + 0.1

    # the streamed posterior should sit closer to the full-batch fit than
    # the round-1 posterior does
    def full_loss(q):
        sva = agp.SparseVariationalApproximation(fz, q, agp.Centered())
        return agp.elbo(sva, lf(x), y)

    q_full = fit(full_loss, fz.to_mvn(), steps=600)
    d_stream = float(jnp.linalg.norm(q2.mean - q_full.mean))
    d_stale = float(jnp.linalg.norm(q1.mean - q_full.mean))
    assert d_stream < d_stale


def test_site_state_telescopes_to_batch_optimum(key):
    """Fixed-site accumulator: after absorbing all chunks, site_posterior_q
    == the full-batch Titsias optimum, independent of chunk order."""
    f, x, y = _data(key, 60)
    z = jnp.linspace(-1.9, 1.9, 9)
    fz = f(z, 1e-10)

    st = agp.site_state(fz)
    for i in [2, 0, 1]:  # order-independence
        xb, yb = x[i * 20 : (i + 1) * 20], y[i * 20 : (i + 1) * 20]
        st = agp.site_update(st, f(xb, NOISE), yb)
    q = agp.site_posterior_q(st)

    q_batch = agp.optimal_variational_posterior(fz, f(x, NOISE), y)
    np.testing.assert_allclose(q.mean, q_batch.mean, atol=1e-9)
    np.testing.assert_allclose(q.cov(), q_batch.cov(), atol=1e-9)


def test_site_state_matches_general_online_chain(key):
    """The fixed-site fast path and the general online_optimal_q chain are
    the same math when sites/hypers are fixed (f64)."""
    f, x, y = _data(key, 40)
    z = jnp.linspace(-1.8, 1.8, 7)
    fz = f(z, 1e-10)

    st = agp.site_state(fz)
    state = _prior_state(fz)
    for i in range(2):
        xb, yb = x[i * 20 : (i + 1) * 20], y[i * 20 : (i + 1) * 20]
        st = agp.site_update(st, f(xb, NOISE), yb)
        state = agp.OnlineSVGPState(
            fz, agp.online_optimal_q(state, fz, f(xb, NOISE), yb)
        )
    q_fast = agp.site_posterior_q(st)
    np.testing.assert_allclose(q_fast.mean, state.q.mean, atol=1e-9)
    np.testing.assert_allclose(q_fast.cov(), state.q.cov(), atol=1e-9)


def test_site_state_validates_inputs():
    f = _prior()
    z = jnp.linspace(0, 1, 4)
    st = agp.site_state(f(z, 1e-10))
    with pytest.raises(ValueError):
        agp.site_update(st, f(z, jnp.ones(4)), jnp.ones(4))  # non-isotropic
