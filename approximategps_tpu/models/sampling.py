"""Pathwise (decoupled) posterior function sampling.

Beyond the reference's capability set: draws *whole functions* from GP
posteriors following Wilson et al. (2020), "Efficiently Sampling Functions
from Gaussian Process Posteriors" (ICML):

    f_post(·) = f_prior(·) + K(·,Z) Kuu⁻¹ (u − f_prior(Z)),   u ~ q(u)

with the prior path approximated by random Fourier features (Rahimi &
Recht):  f_prior(x) ≈ Σᵢ wᵢ φᵢ(x),  φᵢ(x) = √(2σ²/F) cos(ωᵢᵀx̃ + bᵢ),
ω drawn from the kernel's spectral density, x̃ the lengthscale-scaled input.

Evaluating a sample at any new x costs O(F + M) — no N×N covariances — which
is what makes Thompson sampling / Bayesian optimisation loops practical on
accelerators.  Supported base kernels: SE and Matérn-1/2, 3/2, 5/2 (Student-t
spectral densities), optionally wrapped in variance/lengthscale transforms.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..core import linalg
from ..core.kernels import (
    InputScaledKernel,
    Kernel,
    Matern12Kernel,
    Matern32Kernel,
    Matern52Kernel,
    ScaledKernel,
    SqExponentialKernel,
    as_points,
)
from .svgp import Centered, SVGPPosterior

__all__ = ["unwrap_stationary", "rff_features", "sample_svgp_functions", "sample_posterior_functions_cg"]

_MATERN_DF = {Matern12Kernel: 1.0, Matern32Kernel: 3.0, Matern52Kernel: 5.0}


def unwrap_stationary(kernel: Kernel):
    """Decompose variance/lengthscale wrappers around a stationary base.

    Returns (base_kernel, variance, inv_lengthscale-scale)."""
    variance = jnp.asarray(1.0)
    scale = jnp.asarray(1.0)
    k = kernel
    while True:
        if isinstance(k, ScaledKernel):
            variance = variance * jnp.asarray(k.variance)
            k = k.inner
        elif isinstance(k, InputScaledKernel):
            scale = scale * jnp.asarray(k.scale)
            k = k.inner
        else:
            break
    if type(k) not in (SqExponentialKernel, *_MATERN_DF):
        raise NotImplementedError(
            f"RFF sampling implemented for SE/Matérn bases, got {type(k).__name__}"
        )
    return k, variance, scale


def rff_features(
    key: jax.Array, kernel: Kernel, D: int, num_features: int
) -> Callable[[jax.Array], jax.Array]:
    """Random Fourier feature map φ for a (wrapped) stationary kernel.

    Returns ``phi(x) -> (N, num_features)`` with E[φφᵀ] ≈ K."""
    base, variance, scale = unwrap_stationary(kernel)
    k_omega, k_b = jax.random.split(key)
    if isinstance(base, SqExponentialKernel):
        omega = jax.random.normal(k_omega, (num_features, D))
    else:
        df = _MATERN_DF[type(base)]
        # multivariate-t spectral density: z / sqrt(g/df), g ~ χ²_df
        kz, kg = jax.random.split(k_omega)
        z = jax.random.normal(kz, (num_features, D))
        g = 2.0 * jax.random.gamma(kg, df / 2.0, (num_features, 1))
        omega = z * jnp.sqrt(df / g)
    b = jax.random.uniform(k_b, (num_features,), maxval=2.0 * math.pi)

    def phi(x: jax.Array) -> jax.Array:
        X = as_points(x)
        Xs = X * scale  # lengthscale transform
        proj = Xs @ omega.T + b[None, :]
        return jnp.sqrt(2.0 * variance / num_features) * jnp.cos(proj)

    return phi


def sample_svgp_functions(
    key: jax.Array,
    post: SVGPPosterior,
    num_samples: int,
    num_features: int = 1024,
) -> Callable[[jax.Array], jax.Array]:
    """Draw ``num_samples`` posterior functions from an SVGP posterior.

    Returns ``fs(x) -> (num_samples, N)`` evaluable at arbitrary inputs with
    O(F + M) cost per point (Wilson et al. 2020, eq. 13: prior RFF path plus
    the Matheron pathwise update through the inducing points)."""
    sva = post.approx
    fz = sva.fz
    prior = fz.f
    Z = as_points(fz.x)
    M, D = Z.shape
    k_phi, k_w, k_u = jax.random.split(key, 3)

    phi = rff_features(k_phi, prior.kernel, D, num_features)
    w = jax.random.normal(k_w, (num_samples, num_features), dtype=Z.dtype)

    # u ~ q(u) in the ORIGINAL (unwhitened) space
    eps = jax.random.normal(k_u, (num_samples, M), dtype=Z.dtype)
    Kuu_L = post.cache.Kuu_L
    if isinstance(sva.parametrization, Centered):
        u = sva.q.mean[None, :] + eps @ sva.q.scale_tril.T
    else:
        # u = mean(fz) + Lk (m_ε + L_ε ε)
        v = sva.q.mean[None, :] + eps @ sva.q.scale_tril.T
        u = fz.mean()[None, :] + v @ Kuu_L.T

    f_prior_Z = w @ phi(Z).T  # (S, M)
    # residual weights: Kuu⁻¹ (u − mean(fz) − (f_prior(Z) − mean-prior at Z))
    # RFF prior paths are zero-mean; the GP prior mean enters additively below.
    resid = u - fz.mean()[None, :] - f_prior_Z  # (S, M)
    alpha = linalg.cholesky_solve(Kuu_L, resid.T).T  # (S, M)

    def fs(x: jax.Array) -> jax.Array:
        X = as_points(x)
        prior_path = w @ phi(X).T  # (S, N)
        Kxz = prior.cov(X, Z)  # (N, M)
        update = alpha @ Kxz.T  # (S, N)
        return prior.mean(X)[None, :] + prior_path + update

    return fs


def sample_posterior_functions_cg(
    key: jax.Array,
    fx,
    y: jax.Array,
    num_samples: int,
    num_features: int = 1024,
    tol: float = 1e-6,
    maxiter: int = 1000,
    block_size: int | None = None,
    precond_rank: int = 0,
) -> Callable[[jax.Array], jax.Array]:
    """Matheron-rule pathwise samples from an EXACT GP posterior, with the
    data-update solve done by (preconditioned) conjugate gradients — the
    iterative-engine counterpart of :func:`sample_svgp_functions`
    (Wilson et al. 2020, eq. 7):

        f_post(·) = f_prior(·) + K(·,X)(K + σ²I)⁻¹(y − f_prior(X) − ε)

    with f_prior an RFF path and ε ~ N(0, σ²I).  K is only accessed through
    chunked matvecs (O(N·block) memory), all ``num_samples`` right-hand
    sides iterate in one block-CG solve, and evaluating a sample costs
    O(F + N·block-matmul) per query block — no N×N factorization anywhere.

    Returns ``fs(x) -> (num_samples, N_x)``.
    """
    from .iterative import (
        cg_solve,
        kernel_matvec,
        pivoted_cholesky,
        woodbury_preconditioner,
    )

    prior = fx.f
    X = as_points(fx.x)
    N, D = X.shape
    noise = jnp.asarray(fx.noise)
    if noise.ndim > 0:
        raise ValueError("sample_posterior_functions_cg requires isotropic noise")
    k_phi, k_w, k_eps = jax.random.split(key, 3)

    phi = rff_features(k_phi, prior.kernel, D, num_features)
    w = jax.random.normal(k_w, (num_samples, num_features), dtype=X.dtype)
    eps = jnp.sqrt(noise) * jax.random.normal(
        k_eps, (num_samples, N), dtype=X.dtype
    )

    matvec = kernel_matvec(prior.kernel, X, noise, block_size)
    M_inv = None
    if precond_rank > 0:
        Lk = pivoted_cholesky(prior.kernel, X, precond_rank)
        M_inv = woodbury_preconditioner(Lk, noise)

    f_prior_X = w @ phi(X).T  # (S, N)
    resid = y[None, :] - fx.mean()[None, :] - f_prior_X - eps  # (S, N)
    V = cg_solve(matvec, resid.T, tol=tol, maxiter=maxiter, M_inv=M_inv)  # (N, S)

    def fs(x: jax.Array) -> jax.Array:
        Xq = as_points(x)
        prior_path = w @ phi(Xq).T  # (S, N_x)
        Kxq = prior.cov(X, Xq)  # (N, N_x)
        # highest precision: V ~ resid/σ² is large and rough, and the update
        # term cancels the prior path almost exactly — bf16 product rounding
        # on TPU left O(prior-scale) noise in the samples (measured: sample
        # std 1.11 vs true posterior std ~0.01 at N=2·10⁴)
        update = jnp.matmul(V.T, Kxq, precision="highest")
        return prior.mean(Xq)[None, :] + prior_path + update

    return fs
