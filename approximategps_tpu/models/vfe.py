"""VFE / Titsias sparse posterior and collapsed ELBO.

The reference consumes ``VFE(fz)`` from AbstractGPs as a test oracle
(``test/SparseVariationalApproximationModule.jl:122-133``) and its test
utilities compute the closed-form optimal variational posterior
(``test/test_utils.jl:7-17``).  Both are first-class here: the optimal
``q(u)`` feeds a Centered SVGP posterior (Titsias 2009), and the collapsed
bound is evaluated via Woodbury so the large-N work is MXU matmuls.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core import linalg
from ..core.distributions import MultivariateNormal
from ..core.gp import FiniteGP
from ..core.means import ZeroMean
from ..core.pytrees import pytree_dataclass
from .api import approx_lml, posterior
from .svgp import Centered, SparseVariationalApproximation, SVGPPosterior

__all__ = ["VFE", "optimal_variational_posterior", "vfe_elbo"]

_LOG2PI = math.log(2.0 * math.pi)


@pytree_dataclass
class VFE:
    """Titsias (2009) variationally-optimal sparse approximation, anchored at
    inducing prior ``fz = f(z, jitter)`` — AbstractGPs.VFE."""

    fz: FiniteGP


def optimal_variational_posterior(
    fu: FiniteGP, fx: FiniteGP, y: jax.Array
) -> MultivariateNormal:
    """Closed-form optimal q(u) for Gaussian likelihood (reference
    ``test/test_utils.jl:7-17``): with Σ = Kuu + σ⁻² Kuf Kufᵀ,
    m = σ⁻² Kuu Σ⁻¹ Kuf y and S = Kuu Σ⁻¹ Kuu.  Requires a zero-mean prior."""
    mean_fn = getattr(fu.f, "mean_fn", None)
    if mean_fn is not None and not isinstance(mean_fn, ZeroMean):
        raise ValueError("The exact posterior requires a GP with ZeroMean.")
    if not fx.is_isotropic_noise:
        raise ValueError("optimal_variational_posterior requires isotropic noise")
    s2 = jnp.asarray(fx.noise)
    Kuf = fu.f.cov(fu.x, fx.x)
    # Whitened evaluation: with V = Lk⁻¹Kuf and C = I + V Vᵀ/σ²,
    #   Σ = Lk C Lkᵀ,  m = Lk C⁻¹ V y / σ²,  S = Lk C⁻¹ Lkᵀ.
    # The textbook unwhitened form (Σ = Kuu + KufKufᵀ/σ², S = Kuu Σ⁻¹ Kuu)
    # is identical in exact arithmetic but NUMERICALLY BROKEN in f32: Σ
    # inherits cond(Kuu)·(1 + N·k̄/σ²) and the S sandwich loses PSD-ness —
    # measured NaN on CPU f32 / 2.4e-2 posterior-mean error on TPU at
    # N=3000, M=32, σ²=0.05, while this form stays within 7e-6 of the f64
    # truth (the same conditioning fix as svgp_online.site_posterior_q).
    Lk = fu.scale_tril()  # includes fz jitter
    V = linalg.solve_lower_triangular(Lk, Kuf)
    Ma = Lk.shape[0]
    C = jnp.eye(Ma, dtype=Lk.dtype) + (V @ V.T) / s2
    C = 0.5 * (C + C.T)
    C_L = linalg.safe_cholesky(C)
    m = Lk @ linalg.cholesky_solve(C_L, V @ y) / s2
    W = linalg.solve_lower_triangular(C_L, Lk.T).T  # S = W Wᵀ
    return MultivariateNormal(m, linalg.safe_cholesky(W @ W.T))


@posterior.register(VFE)
def _posterior_vfe(vfe: VFE, fx: FiniteGP, y: jax.Array, **_) -> SVGPPosterior:
    """posterior(VFE(fz), fx, y): Centered SVGP posterior at the optimal q(u)."""
    q_opt = optimal_variational_posterior(vfe.fz, fx, y)
    sva = SparseVariationalApproximation(vfe.fz, q_opt, Centered())
    return posterior(sva)


def vfe_elbo(vfe: VFE, fx: FiniteGP, y: jax.Array) -> jax.Array:
    """Titsias collapsed bound:
    log N(y | m, Qff + σ²I) − tr(Kff − Qff)/(2σ²), with Qff = Kfu Kuu⁻¹ Kuf,
    evaluated via Woodbury so cost is O(M²N + M³)."""
    if not fx.is_isotropic_noise:
        raise ValueError("vfe_elbo requires isotropic noise")
    s2 = jnp.asarray(fx.noise)
    fz = vfe.fz
    n = y.shape[0]
    Kuu_L = fz.scale_tril()
    Kuf = fz.f.cov(fz.x, fx.x)
    V = linalg.solve_lower_triangular(Kuu_L, Kuf)  # Qff = VᵀV
    A = V / jnp.sqrt(s2)
    M = A.shape[0]
    B = jnp.eye(M, dtype=A.dtype) + A @ A.T
    B_L = linalg.safe_cholesky(B)
    delta = y - fx.f.mean(fx.x)
    c = linalg.solve_lower_triangular(B_L, A @ delta)
    quad = (delta @ delta - c @ c) / s2
    logdet = n * jnp.log(s2) + linalg.chol_logdet(B_L)
    lognorm = -0.5 * (n * _LOG2PI + logdet + quad)
    trace_term = (jnp.sum(fx.f.var(fx.x)) - jnp.sum(V * V)) / (2.0 * s2)
    return lognorm - trace_term


@approx_lml.register(VFE)
def _approx_lml_vfe(vfe: VFE, fx: FiniteGP, y: jax.Array, **_):
    return vfe_elbo(vfe, fx, y)
