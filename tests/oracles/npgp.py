"""Independent f64 oracle: a from-first-principles numpy/scipy implementation
of exact GPR, the SVGP ELBO (both parametrizations), the collapsed VFE bound,
the Bernoulli Laplace LML and the Vecchia approximate LML.

Deliberately shares NO code with ``approximategps_tpu`` (pure numpy/scipy,
different algorithms where possible: direct `scipy.linalg` factorizations,
explicit loops for Vecchia) so that agreement with the library is a genuine
cross-implementation check, not a tautology (VERDICT r1, "de-circularize the
golden fixtures").  Formulas from the public literature:

- exact GPR + Laplace: Rasmussen & Williams (2006), eqs. 2.23-2.30, alg. 3.1
  and 3.32/5.20.
- SVGP ELBO: Hensman et al. (2015); whitened parametrization: standard
  u = m0 + Lk eps change of variables.
- collapsed VFE bound: Titsias (2009), eq. 9.
- Vecchia / nearest-neighbor factorization: Datta (2022), eqs. 9-10.
"""

from __future__ import annotations

import numpy as np
from scipy import linalg as sla

LOG2PI = np.log(2.0 * np.pi)


def _as2d(X):
    X = np.asarray(X, dtype=np.float64)
    return X[:, None] if X.ndim == 1 else X


def rbf(variance, lengthscale, X, Z=None):
    """k(x,z) = variance * exp(-|x-z|^2 / (2 lengthscale^2))."""
    X = _as2d(X)
    Z = X if Z is None else _as2d(Z)
    d2 = ((X[:, None, :] - Z[None, :, :]) ** 2).sum(-1)
    return variance * np.exp(-0.5 * d2 / lengthscale**2)


def _mvn_logpdf(y, mean, cov):
    y = np.asarray(y, dtype=np.float64)
    n = y.shape[0]
    L = sla.cholesky(cov, lower=True)
    w = sla.solve_triangular(L, y - mean, lower=True)
    return -0.5 * (n * LOG2PI + w @ w) - np.log(np.diag(L)).sum()


def exact_gpr_logpdf(X, y, variance, lengthscale, noise_var):
    K = rbf(variance, lengthscale, X)
    return _mvn_logpdf(y, np.zeros(len(y)), K + noise_var * np.eye(len(y)))


def exact_gpr_predict(X, y, variance, lengthscale, noise_var, Xs):
    """Posterior mean and covariance at Xs (RW 2.23-2.24), zero prior mean."""
    K = rbf(variance, lengthscale, X) + noise_var * np.eye(len(np.asarray(X)))
    Ks = rbf(variance, lengthscale, X, Xs)
    Kss = rbf(variance, lengthscale, Xs)
    cf = sla.cho_factor(K, lower=True)
    mean = Ks.T @ sla.cho_solve(cf, np.asarray(y, dtype=np.float64))
    cov = Kss - Ks.T @ sla.cho_solve(cf, Ks)
    return mean, cov


def _gaussian_expected_ll(y, mu, var, noise_var):
    """E_{N(f; mu, var)}[log N(y; f, noise_var)] per point (analytic)."""
    return (
        -0.5 * LOG2PI
        - 0.5 * np.log(noise_var)
        - 0.5 * ((y - mu) ** 2 + var) / noise_var
    )


def _svgp_marginals_centered(Kuu, Kuf, kff_diag, m, S):
    """q(f_i) under q(u)=N(m, S): mu = Kfu Kuu^-1 m,
    var_i = kff_i - a_i' Kuu a_i ... with a_i = Kuu^-1 kuf_i."""
    A = sla.solve(Kuu, Kuf, assume_a="pos")  # (M, N), = Kuu^-1 Kuf
    mu = A.T @ m
    var = kff_diag - np.einsum("mn,mn->n", Kuf, A) + np.einsum(
        "mn,mk,kn->n", A, S, A
    )
    return mu, var


def svgp_elbo_centered(X, y, Z, variance, lengthscale, noise_var, jitter, m, S,
                       num_data=None):
    """Hensman et al. (2015) ELBO, unwhitened q(u) = N(m, S)."""
    X, Z = _as2d(X), _as2d(Z)
    M = Z.shape[0]
    Kuu = rbf(variance, lengthscale, Z) + jitter * np.eye(M)
    Kuf = rbf(variance, lengthscale, Z, X)
    kff = np.full(X.shape[0], variance)
    mu, var = _svgp_marginals_centered(Kuu, Kuf, kff, m, S)
    ell = _gaussian_expected_ll(np.asarray(y, dtype=np.float64), mu, var, noise_var)
    # KL(N(m,S) || N(0,Kuu))
    cf = sla.cho_factor(Kuu, lower=True)
    Kinv_S = sla.cho_solve(cf, S)
    mahal = m @ sla.cho_solve(cf, m)
    logdet_Kuu = 2.0 * np.log(np.diag(cf[0])).sum()
    logdet_S = np.linalg.slogdet(S)[1]
    kl = 0.5 * (np.trace(Kinv_S) + mahal - M + logdet_Kuu - logdet_S)
    scale = 1.0 if num_data is None else num_data / len(np.asarray(y))
    return ell.sum() * scale - kl


def svgp_elbo_noncentered(X, y, Z, variance, lengthscale, noise_var, jitter, m, S,
                          num_data=None):
    """Whitened parametrization: u = Lk eps, q(eps) = N(m, S)."""
    X, Z = _as2d(X), _as2d(Z)
    M = Z.shape[0]
    Kuu = rbf(variance, lengthscale, Z) + jitter * np.eye(M)
    Kuf = rbf(variance, lengthscale, Z, X)
    kff = np.full(X.shape[0], variance)
    Lk = sla.cholesky(Kuu, lower=True)
    Aw = sla.solve_triangular(Lk, Kuf, lower=True)  # (M, N) = Lk^-1 Kuf
    mu = Aw.T @ m
    var = kff - np.einsum("mn,mn->n", Aw, Aw) + np.einsum("mn,mk,kn->n", Aw, S, Aw)
    ell = _gaussian_expected_ll(np.asarray(y, dtype=np.float64), mu, var, noise_var)
    # KL(N(m,S) || N(0,I))
    kl = 0.5 * (np.trace(S) + m @ m - M - np.linalg.slogdet(S)[1])
    scale = 1.0 if num_data is None else num_data / len(np.asarray(y))
    return ell.sum() * scale - kl


def vfe_bound(X, y, Z, variance, lengthscale, noise_var, jitter):
    """Titsias (2009) collapsed bound:
    log N(y; 0, Qff + noise I) - tr(Kff - Qff) / (2 noise)."""
    X, Z = _as2d(X), _as2d(Z)
    M = Z.shape[0]
    N = X.shape[0]
    Kuu = rbf(variance, lengthscale, Z) + jitter * np.eye(M)
    Kuf = rbf(variance, lengthscale, Z, X)
    Lk = sla.cholesky(Kuu, lower=True)
    Aw = sla.solve_triangular(Lk, Kuf, lower=True)
    Qff = Aw.T @ Aw
    bound = _mvn_logpdf(y, np.zeros(N), Qff + noise_var * np.eye(N))
    trace_term = (N * variance - np.trace(Qff)) / (2.0 * noise_var)
    return bound - trace_term


def laplace_lml_bernoulli(X, y, variance, lengthscale, jitter, maxiter=100,
                          tol=1e-12):
    """RW (2006) Algorithm 3.1 + eq. 3.32: Laplace LML for Bernoulli-logistic
    observations y in {0, 1}, zero prior mean, via scipy factorizations."""
    X = _as2d(X)
    y = np.asarray(y, dtype=np.float64)
    N = X.shape[0]
    K = rbf(variance, lengthscale, X) + jitter * np.eye(N)

    def d_loglik(f):
        pi = 1.0 / (1.0 + np.exp(-f))
        return y - pi, pi * (1.0 - pi)  # grad, W = -hess

    f = np.zeros(N)
    for _ in range(maxiter):
        g, W = d_loglik(f)
        sW = np.sqrt(W)
        B = np.eye(N) + sW[:, None] * K * sW[None, :]
        cf = sla.cho_factor(B, lower=True)
        b = W * f + g
        a = b - sW * sla.cho_solve(cf, sW * (K @ b))
        fnew = K @ a
        if np.max(np.abs(fnew - f)) < tol:
            f = fnew
            break
        f = fnew
    g, W = d_loglik(f)
    sW = np.sqrt(W)
    B = np.eye(N) + sW[:, None] * K * sW[None, :]
    L = sla.cholesky(B, lower=True)
    a = sla.cho_solve(sla.cho_factor(K, lower=True), f)
    loglik = (y * f - np.log1p(np.exp(f))).sum()
    return -0.5 * (a @ f) + loglik - np.log(np.diag(L)).sum()


def vecchia_lml(X, y, variance, lengthscale, k):
    """Datta (2022) eqs. 9-10 with previous-k-in-order conditioning sets,
    computed with explicit per-point numpy solves and a DENSE precision
    matrix (no banded representation — structurally different from the
    library's (N, k+1) band path on purpose)."""
    X = _as2d(X)
    y = np.asarray(y, dtype=np.float64)
    N = X.shape[0]
    B = np.zeros((N, N))
    F = np.zeros(N)
    for i in range(N):
        ns = list(range(max(0, i - k), i))
        kii = rbf(variance, lengthscale, X[i : i + 1])[0, 0]
        if not ns:
            F[i] = kii
            continue
        Kns = rbf(variance, lengthscale, X[ns])
        kni = rbf(variance, lengthscale, X[ns], X[i : i + 1])[:, 0]
        coeff = sla.solve(Kns, kni, assume_a="pos")
        B[i, ns] = coeff
        F[i] = kii - kni @ coeff
    U = (np.eye(N) - B).T @ np.diag(1.0 / np.sqrt(F))
    alpha = U @ (U.T @ y)
    logdet_C = -2.0 * np.log(np.diag(U)).sum()
    return -0.5 * (logdet_C + N * LOG2PI + alpha @ y)
