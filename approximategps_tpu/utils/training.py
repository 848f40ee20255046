"""Training/optimisation glue (L7 of SURVEY.md §1).

The reference leaves this to user-side Flux/Optim/ParameterHandling
(``examples/a-regression/script.jl:170-194``); here the optax equivalents are
shipped: an Adam loop over a generic loss, an SVGP parameter pack with
constrained reparameterization, and natural-gradient updates for the
variational (m, S) — the standard large-scale SVGP recipe."""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..core.distributions import MultivariateNormal
from ..core.gp import GP, FiniteGP
from ..core.kernels import SqExponentialKernel, with_lengthscale
from ..models.svgp import NonCentered, SparseVariationalApproximation
from .bijectors import cholesky_parameter, flat_from_tril, invsoftplus, softplus

__all__ = [
    "SVGPParams",
    "init_svgp_params",
    "build_svgp",
    "adam_fit",
    "lbfgs_fit",
    "natgrad_update",
]


class SVGPParams(NamedTuple):
    """Trainable parameter pack for an SVGP model: unconstrained kernel
    hyperparameters, inducing inputs, variational mean and Cholesky."""

    raw_variance: jax.Array
    raw_lengthscale: jax.Array
    z: jax.Array
    m: jax.Array
    L_flat: jax.Array


def init_svgp_params(z: jax.Array, variance=1.0, lengthscale=1.0) -> SVGPParams:
    z = jnp.asarray(z)
    M = z.shape[0]
    eye_flat = flat_from_tril(jnp.eye(M, dtype=z.dtype))
    # softplus-diag parameterization: invsoftplus(1) on the diagonal entries
    diag_idx = jnp.cumsum(jnp.arange(1, M + 1)) - 1
    eye_flat = eye_flat.at[diag_idx].set(invsoftplus(jnp.asarray(1.0, z.dtype)))
    return SVGPParams(
        raw_variance=invsoftplus(jnp.asarray(variance, z.dtype)),
        raw_lengthscale=invsoftplus(jnp.asarray(lengthscale, z.dtype)),
        z=z,
        m=jnp.zeros(M, dtype=z.dtype),
        L_flat=eye_flat,
    )


def build_svgp(
    params: SVGPParams,
    jitter: float = 1e-6,
    kernel_cls=SqExponentialKernel,
    parametrization=None,
):
    """Constrained SVGP model from the unconstrained parameter pack."""
    kernel = softplus(params.raw_variance) * with_lengthscale(
        kernel_cls(), softplus(params.raw_lengthscale)
    )
    f = GP(kernel)
    fz = f(params.z, jitter)
    M = params.m.shape[0]
    q = MultivariateNormal(params.m, cholesky_parameter(params.L_flat, M))
    parametrization = parametrization if parametrization is not None else NonCentered()
    return SparseVariationalApproximation(fz, q, parametrization), f


def adam_fit(
    loss_fn: Callable,
    params: Any,
    data_iter,
    learning_rate: float = 1e-2,
    num_steps: int | None = None,
    optimizer=None,
):
    """Generic jitted Adam loop: ``loss_fn(params, *batch)`` minimised over
    batches from ``data_iter`` (an iterable of tuples)."""
    opt = optimizer if optimizer is not None else optax.adam(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, *batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    losses = []
    for i, batch in enumerate(data_iter):
        if num_steps is not None and i >= num_steps:
            break
        params, opt_state, loss = step(params, opt_state, *batch)
        losses.append(loss)
    return params, losses


def natgrad_update(m, S_L, grad_m, grad_S, lr: float = 0.1):
    """One natural-gradient step on the variational (m, S) of a Centered
    SVGP, in expectation-parameter space.

    With natural params θ₁ = S⁻¹m, θ₂ = −½S⁻¹ and expectation params
    η₁ = m, η₂ = S + mmᵀ, the natural gradient of the ELBO w.r.t. θ is the
    plain gradient w.r.t. η.  Using dL/dη₁ = dL/dm − 2 (dL/dS) m and
    dL/dη₂ = dL/dS:
        θ₂ ← θ₂ + lr·(dL/dS)        ⇒ S⁻¹ ← S⁻¹ − 2·lr·(dL/dS)
        θ₁ ← θ₁ + lr·(dL/dη₁)
    Returns updated (m, S_L).  ``grad_m``/``grad_S`` are ascent gradients of
    the ELBO w.r.t. m and S (dense symmetric)."""
    S = S_L @ S_L.T
    Sinv = jax.scipy.linalg.cho_solve((S_L, True), jnp.eye(S.shape[0], dtype=S.dtype))
    theta1 = Sinv @ m
    theta2 = -0.5 * Sinv
    dL_deta1 = grad_m - 2.0 * grad_S @ m
    dL_deta2 = grad_S
    theta1 = theta1 + lr * dL_deta1
    theta2 = theta2 + lr * dL_deta2
    Sinv_new = -2.0 * theta2
    Sinv_new = 0.5 * (Sinv_new + Sinv_new.T)
    Sinv_L = jnp.linalg.cholesky(Sinv_new)
    S_new = jax.scipy.linalg.cho_solve(
        (Sinv_L, True), jnp.eye(S.shape[0], dtype=S.dtype)
    )
    S_new = 0.5 * (S_new + S_new.T)
    m_new = S_new @ theta1
    return m_new, jnp.linalg.cholesky(S_new)


def lbfgs_fit(
    loss_fn: Callable,
    params: Any,
    max_iters: int = 200,
    tol: float = 1e-8,
    optimizer=None,
):
    """On-device L-BFGS minimisation of ``loss_fn(params)`` (the optax
    equivalent of the reference's Optim.jl LBFGS usage,
    ``examples/b-classification/script.jl:132-142``).

    Runs the whole optimisation as one jitted ``lax.while_loop`` using
    ``optax.value_and_grad_from_state`` (shares line-search evaluations).
    Returns (params, final_loss, n_iters)."""
    import jax.flatten_util

    opt = optimizer if optimizer is not None else optax.lbfgs()
    flat0, unravel = jax.flatten_util.ravel_pytree(params)

    def flat_loss(flat):
        return loss_fn(unravel(flat))

    value_and_grad = optax.value_and_grad_from_state(flat_loss)

    @jax.jit
    def run(flat0):
        opt_state = opt.init(flat0)

        def cond(carry):
            flat, opt_state, i, gnorm = carry
            return jnp.logical_and(i < max_iters, gnorm > tol)

        def body(carry):
            flat, opt_state, i, _ = carry
            value, grad = value_and_grad(flat, state=opt_state)
            updates, opt_state = opt.update(
                grad, opt_state, flat, value=value, grad=grad, value_fn=flat_loss
            )
            flat = optax.apply_updates(flat, updates)
            return flat, opt_state, i + 1, jnp.linalg.norm(grad)

        flat, opt_state, i, gnorm = jax.lax.while_loop(
            cond, body, (flat0, opt_state, jnp.int32(0), jnp.asarray(jnp.inf, flat0.dtype))
        )
        return flat, flat_loss(flat), i

    flat, final_loss, n = run(flat0)
    return unravel(flat), final_loss, int(n)
