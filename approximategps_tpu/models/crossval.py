"""Leave-one-out cross-validation for exact GP regression (Rasmussen &
Williams, GPML §5.4.2, eqs. 5.10–5.12).

Beyond-reference capability: a model-selection objective complementary to
the log marginal likelihood.  All N leave-one-out predictive distributions
come from ONE factorization of C = K + Σy:

    μ_i  = y_i − α_i / [C⁻¹]_ii          (LOO predictive mean of y_i)
    σ²_i = 1 / [C⁻¹]_ii                   (LOO predictive variance, y-space)
    LOO-lpd = Σᵢ log N(y_i; μ_i, σ²_i)

with α = C⁻¹ (y − m).  diag(C⁻¹) is the squared column norms of L⁻¹, so the
whole computation is the posterior's existing Cholesky plus one triangular
inversion — on TPU that rides the blocked `blocked_tril_inv` (matmul-only
custom-VJP) path rather than a lax triangular solve.  Heteroscedastic noise
(per-point Σy diagonal) is supported since C is formed by ``fx.cov()``.

GPML eq. 5.13 gives the hyperparameter gradient in closed form; here the
whole expression is a composition of ops with custom VJPs, so ``jax.grad``
through ``loo_logpdf`` reproduces it automatically (FD-pinned in
``tests/test_crossval.py``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core import linalg
from ..core.gp import FiniteGP

__all__ = ["loo_mean_and_var", "loo_logpdf"]

_LOG2PI = math.log(2.0 * math.pi)


def _loo_parts(fx: FiniteGP, y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(α, diag(C⁻¹)) from one Cholesky of C = K + Σy."""
    L = fx.scale_tril()
    delta = y - fx.mean()
    alpha = linalg.cholesky_solve(L, delta)
    Linv = linalg.blocked_tril_inv(L)
    cinv_diag = jnp.sum(Linv * Linv, axis=0)
    return alpha, cinv_diag


def loo_mean_and_var(fx: FiniteGP, y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-point leave-one-out predictive (mean, variance) of y_i given all
    other observations — GPML eqs. 5.12.  Both are y-space (they include the
    observation noise, matching the density the LOO score evaluates)."""
    alpha, cinv_diag = _loo_parts(fx, y)
    var = 1.0 / cinv_diag
    mu = y - alpha * var
    return mu, var


def loo_logpdf(fx: FiniteGP, y: jax.Array) -> jax.Array:
    """The LOO log predictive probability Σᵢ log p(y_i | y_{−i}, θ) — GPML
    eq. 5.11/5.12 — a robust alternative objective to ``logpdf`` for
    hyperparameter selection (differentiable through ``jax.grad``)."""
    alpha, cinv_diag = _loo_parts(fx, y)
    # log N(y_i; μ_i, σ²_i) = −½log2π + ½log c_ii − α_i²/(2 c_ii)
    per_point = -0.5 * _LOG2PI + 0.5 * jnp.log(cinv_diag) - alpha**2 / (2.0 * cinv_diag)
    return jnp.sum(per_point)
