"""Unified AD-rule conformance harness (VERDICT r2 item 7).

One `jax.test_util.check_grads`-style sweep over EVERY custom-AD rule in the
library — the JAX analogue of the reference's
`ChainRulesTestUtils.test_frule/test_rrule` through PSD-preserving wrappers
(`/root/reference/test/LaplaceApproximationModule.jl:78-145`).  Each case
wraps the op so that finite-difference perturbations stay in the op's valid
domain (PSD inputs stay PSD, triangular stay triangular), then checks the
custom VJP against central finite differences in f64.

Also the negative test the reference pins (`:56-76`): the RAW Newton
while_loop must reject reverse-mode AD — only the IFT custom_vjp wrapper is
differentiable.  (A refactor of the loop to `scan` would silently make it
unrollable and reintroduce the exploding-gradient path the reference's
`_newton_inner_loop` rrule guards against.)

Stochastic-trace VJPs (the SLQ logdet surrogates) cannot match FD of their
own primal exactly at finite Lanczos order — they are checked against the
DENSE analytic gradient with probe-noise tolerances instead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

import approximategps_tpu as agp
from approximategps_tpu.config import config_context
from approximategps_tpu.core import linalg
from approximategps_tpu.core.kernels import SqExponentialKernel

KEY = jax.random.PRNGKey(20260817)


def _r(key, *shape):
    return jax.random.normal(key, shape)


def _psd(R, eps=0.5):
    return R @ R.T + eps * jnp.eye(R.shape[-1], dtype=R.dtype)


def _tril_pos(A):
    """Lower-triangular with a bounded-away-from-zero diagonal (valid
    Cholesky factor under FD perturbation)."""
    L = jnp.tril(A)
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    return L * (1.0 - eye) + (1.5 + 0.1 * L) * eye


CHECK = dict(order=1, modes=["rev"], atol=1e-6, rtol=1e-6)


# ---------------------------------------------------------------------------
# core/linalg custom VJPs
# ---------------------------------------------------------------------------


def test_diag_quad_sym():
    k1, k2 = jax.random.split(KEY)
    P, Kf = _r(k1, 6, 6), _r(k2, 6, 9)
    check_grads(lambda P, Kf: linalg.diag_quad_sym(P + P.T, Kf), (P, Kf),
                **CHECK)


def test_blocked_tril_inv():
    A = _r(KEY, 8, 8)
    check_grads(lambda A: linalg.blocked_tril_inv(_tril_pos(A), 2), (A,),
                **CHECK)


def test_blocked_cholesky():
    R = _r(KEY, 8, 8)
    check_grads(lambda R: linalg.blocked_cholesky(_psd(R), 2), (R,), **CHECK)


def test_chol_with_inv():
    R = _r(KEY, 8, 8)
    check_grads(lambda R: linalg.chol_with_inv(_psd(R), 2), (R,), **CHECK)


# ---------------------------------------------------------------------------
# models/svgp fused whitened-cache composite
# ---------------------------------------------------------------------------


def test_whitened_cache_fused():
    from approximategps_tpu.models.svgp import _whitened_cache_fused

    k1, k2, k3 = jax.random.split(KEY, 3)
    R, A, m = _r(k1, 6, 6), _r(k2, 6, 6), _r(k3, 6)
    check_grads(
        lambda R, A, m: _whitened_cache_fused(_psd(R), _tril_pos(A), m),
        (R, A, m), **CHECK,
    )


@pytest.mark.parametrize("transpose_t", [False, True])
def test_tri_project(transpose_t):
    """tri_project (triangular-aware large-M projection): forward equals
    the dense (tril T) matmul and the tril-only hand pullback passes FD.
    The tril wrapper mirrors the library contract — T's strictly-upper
    entries are dead upstream (chol factors / scale_tril)."""
    from approximategps_tpu.core.linalg import tri_project

    # M=2048 → _tri_blocks picks nb=2: the blocked (non-dense-fallback)
    # path is what's under test
    M, B = 2048, 16
    k1, k2 = jax.random.split(KEY)
    T = _r(k1, M, M) * 0.05
    X = _r(k2, M, B)
    Y = tri_project(jnp.tril(T), X, transpose_t)
    Y0 = (jnp.tril(T).T if transpose_t else jnp.tril(T)) @ X
    np.testing.assert_allclose(np.asarray(Y), np.asarray(Y0), atol=1e-12)
    check_grads(
        lambda T, X: tri_project(jnp.tril(T), X, transpose_t), (T, X),
        **CHECK,
    )


def test_whitened_cache_fused_gram():
    """The gram-generating composite (`_whitened_cache_fused_gram`): the
    Kuu Gram is built inside the panel kernel, so the pullback chains
    K̄uu → (Z̄s, σ̄², jitter̄) through a Gram recompute — FD-check every
    input (interpret-mode kernel on CPU, f64)."""
    from approximategps_tpu.models.svgp import _whitened_cache_fused_gram

    M = 256  # kernel needs M % panel == 0, M >= 2 panels (interpret mode)
    k1, k2, k3 = jax.random.split(KEY, 3)
    Zs = 1.5 * _r(k1, M, 2)
    A, m = _r(k2, M, M) * 0.02, _r(k3, M)
    v2, jit = jnp.asarray(1.3), jnp.asarray(0.5)
    with config_context(pallas_interpret=True, use_pallas=True):
        check_grads(
            lambda Zs, v2, jit, A, m: _whitened_cache_fused_gram(
                Zs, v2, jit, _tril_pos(A), m,
                SqExponentialKernel.k_of_r2,
            ),
            (Zs, v2, jit, A, m), **CHECK,
        )


# ---------------------------------------------------------------------------
# Pallas ops (interpret mode on CPU)
# ---------------------------------------------------------------------------


def test_pallas_stationary_gram():
    from approximategps_tpu.ops.gram import pallas_stationary_gram

    k1, k2 = jax.random.split(KEY)
    X, Z = _r(k1, 5, 2), _r(k2, 4, 2)
    with config_context(pallas_interpret=True, use_pallas=True):
        check_grads(
            lambda X, Z: pallas_stationary_gram(
                X, Z, SqExponentialKernel.k_of_r2, 8, 8
            ),
            (X, Z), **CHECK,
        )


def test_svgp_data_epilogue():
    from approximategps_tpu.ops.svgp_epilogue import svgp_data_epilogue

    k1, k2, k3, k4 = jax.random.split(KEY, 4)
    Xs, Zs, P, ae = _r(k1, 6, 2), _r(k2, 5, 2), _r(k3, 5, 5), _r(k4, 5)
    with config_context(pallas_interpret=True, use_pallas=True):
        check_grads(
            lambda Xs, Zs, P, ae: svgp_data_epilogue(
                Xs, Zs, P + P.T, ae, SqExponentialKernel.k_of_r2, 128, 128
            ),
            (Xs, Zs, P, ae), **CHECK,
        )


def _band_inputs(B=5, k=3, D=2):
    """Valid Vecchia window systems from a real kernel geometry: F (the
    conditional variance, a Schur complement of a jittered PSD Gram) stays
    comfortably positive under FD perturbation — arbitrary synthetic
    (Kw, kni, kdiag) triples can have F < 0, which is outside the op's
    domain (F^{-1/2} is taken)."""
    kern = agp.SqExponentialKernel()
    k1, k2 = jax.random.split(KEY)
    pts = 1.5 * _r(k1, B, k, D)
    xi = 1.5 * _r(k2, B, 1, D)
    Kw = jax.vmap(lambda P: kern.gram(P) + 1e-4 * jnp.eye(k))(pts)
    kni = jax.vmap(lambda P, q: kern.gram(P, q)[:, 0])(pts, xi)
    kdiag = jnp.full((B,), 1.0 + 1e-4)
    return Kw, kni, kdiag


def test_batched_chol_solve_band():
    from approximategps_tpu.ops.batched_chol import batched_chol_solve_band

    Kw, kni, kdiag = _band_inputs()
    with config_context(pallas_interpret=True, use_pallas=True):
        check_grads(
            lambda Kw, kni, kdiag: batched_chol_solve_band(
                0.5 * (Kw + Kw.swapaxes(-1, -2)), kni, kdiag, 8, False
            ),
            (Kw, kni, kdiag), order=1, modes=["rev"], atol=1e-4, rtol=1e-4,
        )


def test_batched_chol_solve_band_unrolled():
    from approximategps_tpu.ops.batched_chol import (
        batched_chol_solve_band_unrolled,
    )

    Kw, kni, kdiag = _band_inputs()
    check_grads(
        lambda Kw, kni, kdiag: batched_chol_solve_band_unrolled(
            0.5 * (Kw + Kw.swapaxes(-1, -2)), kni, kdiag
        ),
        (Kw, kni, kdiag), order=1, modes=["rev"], atol=1e-4, rtol=1e-4,
    )


def _window_inputs(N=6, k=3, D=2):
    X = _r(KEY, N, D)
    idx = jnp.arange(N)[:, None] - k + jnp.arange(k)[None, :]
    valid = (idx >= 0).astype(X.dtype)
    idxc = jnp.clip(idx, 0, N - 1)
    xw = jnp.concatenate([X[idxc], X[:, None, :]], axis=1).swapaxes(1, 2)
    return xw, valid


@pytest.mark.parametrize("which", ["windowed", "lanes"])
def test_pallas_vecchia_band(which):
    from approximategps_tpu.ops import batched_chol as bc

    xw, valid = _window_inputs()
    if which == "windowed":
        f = lambda xw: bc.pallas_vecchia_band(
            xw, valid, SqExponentialKernel.k_of_r2, 8, False, 64
        )
    else:
        f = lambda xw: bc.pallas_vecchia_band_lanes(
            xw, valid, SqExponentialKernel.k_of_r2, 8, 1
        )
    with config_context(pallas_interpret=True, use_pallas=True):
        check_grads(f, (xw,), **CHECK)


# ---------------------------------------------------------------------------
# Newton IFT rules (dense + CG) — through PSD-preserving wrappers, including
# the beyond-reference likelihood-parameter and ys cotangents
# ---------------------------------------------------------------------------


def _newton_fixture(N=12):
    x = jnp.linspace(0.0, 6.0, N)
    key = jax.random.fold_in(KEY, 1)
    ys = jnp.sin(x) + 0.1 * _r(key, N)
    return x, ys


def test_newton_inner_loop_rev_all_cotangents():
    from approximategps_tpu.models.laplace import newton_inner_loop

    x, ys = _newton_fixture()
    N = len(ys)
    L0 = jnp.linalg.cholesky(
        agp.SqExponentialKernel().gram(x) + 1e-6 * jnp.eye(N)
    )

    def f(Lraw, raw_noise, ys_):
        K = _psd(jnp.tril(Lraw), 1e-8)
        lik = agp.GaussianLikelihood(jax.nn.softplus(raw_noise))
        f_opt = newton_inner_loop(lik, ys_, K, maxiter=100, tol=1e-13)
        return jnp.sum(jnp.sin(f_opt))

    check_grads(f, (L0, jnp.asarray(0.2), ys), order=1, modes=["rev"],
                atol=1e-5, rtol=1e-5)


def test_newton_inner_loop_cg_rev():
    from approximategps_tpu.models.laplace_cg import newton_inner_loop_cg

    x, ys = _newton_fixture()
    lik = agp.BernoulliLikelihood()
    ys_b = (ys > 0).astype(x.dtype)

    def f(theta):
        kern = jax.nn.softplus(theta[0]) * agp.with_lengthscale(
            agp.SqExponentialKernel(), jax.nn.softplus(theta[1])
        )
        fhat = newton_inner_loop_cg(lik, ys_b, kern, x, maxiter=100,
                                    tol=1e-13, cg_tol=1e-13, noise=1e-8)
        return jnp.sum(jnp.sin(fhat))

    check_grads(f, (jnp.array([0.8, 0.3]),), order=1, modes=["rev"],
                atol=1e-5, rtol=1e-5)


def test_newton_inner_loop_jvp_matches_fd():
    """Forward-mode IFT rule (reference frule `:309-328`)."""
    from approximategps_tpu.models.laplace import (
        newton_inner_loop,
        newton_inner_loop_jvp,
    )

    x, ys = _newton_fixture()
    N = len(ys)
    K = agp.SqExponentialKernel().gram(x) + 1e-6 * jnp.eye(N)
    dR = _r(jax.random.fold_in(KEY, 2), N, N)
    dK = dR + dR.T
    lik = agp.BernoulliLikelihood()
    ys_b = (ys > 0).astype(x.dtype)
    _, df = newton_inner_loop_jvp(lik, ys_b, K, dK, maxiter=100, tol=1e-13)
    h = 1e-6
    fp = newton_inner_loop(lik, ys_b, K + h * dK, maxiter=100, tol=1e-13)
    fm = newton_inner_loop(lik, ys_b, K - h * dK, maxiter=100, tol=1e-13)
    np.testing.assert_allclose(df, (fp - fm) / (2 * h), atol=1e-6)


def test_raw_newton_while_loop_rejects_reverse_mode():
    """Negative test (reference `:56-76`): the raw loop must NOT be
    reverse-differentiable — gradients are only correct through the IFT
    custom_vjp with the recomputed fixed-point cache."""
    from approximategps_tpu.models.laplace import _newton_inner_loop

    x, ys = _newton_fixture()
    N = len(ys)
    lik = agp.BernoulliLikelihood()
    ys_b = (ys > 0).astype(x.dtype)

    def f(K):
        f_opt, _ = _newton_inner_loop(lik, ys_b, K, jnp.zeros_like(ys_b),
                                      20, 1e-8)
        return jnp.sum(f_opt)

    K = agp.SqExponentialKernel().gram(x) + 1e-6 * jnp.eye(N)
    with pytest.raises(Exception, match="while_loop|Reverse-mode"):
        jax.grad(f)(K)


# ---------------------------------------------------------------------------
# Stochastic-trace logdet VJPs: against the DENSE analytic gradient
# ---------------------------------------------------------------------------


def test_logdet_B_slq_grad_conformance():
    """Two-part check of the stochastic-trace logdet VJP:

    (a) EXACT: the custom bwd equals its intended estimator — the vjp of
        ``mean_p (B⁻¹z_p)ᵀ B(W) z_p`` with the SAME probes but dense solves
        (agreement to CG/solve tolerance, not probe noise);
    (b) STATISTICAL: aggregated over elements (gradient wrt a scalar W
        multiplier) the Hutchinson noise contracts, so it must match the
        dense analytic gradient to a few percent at P=512.

    Per-ELEMENT Wsqrt gradients carry O(1) probe variance by construction
    (unbiased for traces, not per-coordinate) — that is a property of the
    estimator, not a rule bug, so (a) is the conformance gate."""
    from approximategps_tpu.models.laplace_cg import _logdet_B_slq

    N = 24
    x = jnp.linspace(0.0, 5.0, N)
    kern = 1.3 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.7)
    Wsqrt = 0.5 + 0.3 * jnp.abs(_r(jax.random.fold_in(KEY, 3), N))
    probes = jnp.sign(
        jax.random.normal(jax.random.fold_in(KEY, 4), (512, N))
    )
    xp = x[:, None]
    K = kern.gram(xp)

    def slq(w):
        return _logdet_B_slq(N, 1e-12, 2000, None, 0, "auto", w, kern, xp,
                             jnp.asarray(0.0), probes)

    # (a) exact estimator conformance
    g_slq = jax.grad(slq)(Wsqrt)

    def hutch(w):
        B = jnp.eye(N) + w[:, None] * K * w[None, :]
        Binv_z = jnp.linalg.solve(jax.lax.stop_gradient(B), probes.T)
        Bz = probes.T + w[:, None] * (K @ (w[:, None] * probes.T))
        return jnp.mean(jnp.sum(Binv_z * Bz, axis=0))

    g_hutch = jax.grad(hutch)(Wsqrt)
    np.testing.assert_allclose(g_slq, g_hutch, atol=1e-8)

    # (b) aggregated (scalar-hyperparameter-style) gradient vs dense
    g_scalar = jax.grad(lambda s: slq(s * Wsqrt))(1.0)

    def dense(s):
        w = s * Wsqrt
        B = jnp.eye(N) + w[:, None] * K * w[None, :]
        return jnp.linalg.slogdet(B)[1]

    g_scalar_dense = jax.grad(dense)(1.0)
    np.testing.assert_allclose(float(g_scalar), float(g_scalar_dense),
                               rtol=0.05)


def test_logpdf_slq_grad_vs_dense():
    from approximategps_tpu.models.iterative import logpdf_slq

    N = 24
    x = jnp.linspace(0.0, 5.0, N)
    ys = jnp.sin(x) + 0.1 * _r(jax.random.fold_in(KEY, 5), N)

    def build(theta):
        kern = jax.nn.softplus(theta[0]) * agp.with_lengthscale(
            agp.SqExponentialKernel(), jax.nn.softplus(theta[1])
        )
        return agp.GP(kern)(x, 0.1)

    theta = jnp.array([0.9, 0.4])
    g_slq = jax.grad(
        lambda t: logpdf_slq(build(t), ys, jax.random.PRNGKey(6),
                             num_probes=512, lanczos_iters=N,
                             cg_tol=1e-12, cg_maxiter=2000)
    )(theta)
    g_dense = jax.grad(lambda t: build(t).logpdf(ys))(theta)
    scale = float(jnp.max(jnp.abs(g_dense)))
    np.testing.assert_allclose(g_slq, g_dense, atol=0.05 * scale + 1e-3)


def test_tri_matmul_pullback_matches_dense():
    """The triangular-aware Φ-sandwich (narrowing block matmuls, engaged at
    M ≥ tri_matmul_min_m) is the SAME math as the dense pullback — block
    summation order only.  Forced on at small M via the config threshold and
    compared against the dense path, plus the three helpers vs plain @."""
    from approximategps_tpu.config import config_context
    from approximategps_tpu.core import linalg

    key = jax.random.PRNGKey(11)
    M = 64
    R = jax.random.normal(key, (M, M))
    A = R @ R.T + M * jnp.eye(M)
    L = jnp.linalg.cholesky(A)
    J = jax.scipy.linalg.solve_triangular(L, jnp.eye(M), lower=True)
    Lb = jax.random.normal(jax.random.fold_in(key, 1), (M, M))
    Jb = jax.random.normal(jax.random.fold_in(key, 2), (M, M))

    with config_context(tri_matmul_min_m=1 << 40):
        dense = linalg._inv_chol_bwd_fused(L, J, Lb, Jb)
    with config_context(tri_matmul_min_m=16):
        tri = linalg._inv_chol_bwd_fused(L, J, Lb, Jb)
        # each cotangent alone too (symbolic-zero branches)
        tri_l = linalg._inv_chol_bwd_fused(L, J, Lb, None)
        tri_j = linalg._inv_chol_bwd_fused(L, J, None, Jb)
    with config_context(tri_matmul_min_m=1 << 40):
        dense_l = linalg._inv_chol_bwd_fused(L, J, Lb, None)
        dense_j = linalg._inv_chol_bwd_fused(L, J, None, Jb)
    np.testing.assert_allclose(np.asarray(tri), np.asarray(dense), atol=1e-12)
    np.testing.assert_allclose(np.asarray(tri_l), np.asarray(dense_l), atol=1e-12)
    np.testing.assert_allclose(np.asarray(tri_j), np.asarray(dense_j), atol=1e-12)

    X = jax.random.normal(jax.random.fold_in(key, 3), (M, M))
    P = jnp.tril(jax.random.normal(jax.random.fold_in(key, 4), (M, M)))
    nb = 4
    hp = "highest"
    np.testing.assert_allclose(
        linalg.matmul_right_lower(X, P, hp, nb=nb), X @ P, atol=1e-12)
    np.testing.assert_allclose(
        linalg.matmul_right_upper(X, P.T, hp, nb=nb), X @ P.T, atol=1e-12)
    np.testing.assert_allclose(
        linalg.matmul_left_upper(P.T, X, hp, nb=nb), P.T @ X, atol=1e-12)
