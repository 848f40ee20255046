#!/usr/bin/env python
"""Binary classification with the Laplace approximation.

Port of the reference's examples/c-comparisons/script.jl: a Bernoulli-logit
latent GP; Laplace approximation q(f) at fixed hyperparameters, then
hyperparameter optimisation of the Laplace evidence with L-BFGS using the
warm-started objective (`build_laplace_objective`), and finally the
approximate posterior rebuilt at the optimum warm-started from the cached
Newton mode (`f_init=objective.cache.f`)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

import approximategps_tpu as agp
from approximategps_tpu.utils.bijectors import invsoftplus, softplus


def build_latent_gp(theta):
    variance = softplus(theta[0])
    lengthscale = softplus(theta[1])
    kernel = variance * agp.with_lengthscale(agp.SqExponentialKernel(), lengthscale)
    return agp.LatentGP(agp.GP(kernel), agp.BernoulliLikelihood(), 1e-8)


def main(N=100, seed=1):
    # data generated host-side in float64 (f32 Cholesky of a dense RBF Gram
    # with tiny jitter is not PSD-safe on accelerators)
    rng = np.random.default_rng(seed)
    x_np = np.sort(rng.uniform(0, 6, N))
    var_true, ls_true = 3.0, 0.5
    K = var_true * np.exp(-0.5 * ((x_np[:, None] - x_np[None, :]) / ls_true) ** 2)
    f_np = np.linalg.cholesky(K + 1e-10 * np.eye(N)) @ rng.standard_normal(N)
    y_np = rng.binomial(1, 1.0 / (1.0 + np.exp(-f_np)))
    x, y = jnp.asarray(x_np, jnp.float32), jnp.asarray(y_np, jnp.int32)
    print(f"data: N={N}, positives={int(y.sum())}")
    assert 10 < int(y.sum()) < N - 10, "labels should be reasonably balanced"

    # Laplace posterior at initial hyperparameters
    theta0 = jnp.array([invsoftplus(1.0), invsoftplus(1.0)])
    lf0 = build_latent_gp(theta0)
    post0 = agp.posterior(agp.LaplaceApproximation(), lf0(x), y)
    lml0 = agp.approx_lml(agp.LaplaceApproximation(), lf0(x), y)
    print(f"initial approx_lml: {float(lml0):.3f}")

    # optimise hyperparameters against the Laplace evidence (warm-started)
    objective = agp.build_laplace_objective(build_latent_gp, x, y)

    def fun(theta):
        v, g = objective.value_and_grad(jnp.asarray(theta))
        return float(v), np.asarray(g)

    res = scipy.optimize.minimize(
        fun, np.asarray(theta0), jac=True, method="L-BFGS-B", options={"maxiter": 500}
    )
    print(
        f"optimised theta: {res.x}, -lml: {res.fun:.3f}, "
        f"total Newton steps: {objective.newton_steps}"
    )
    assert -res.fun > float(lml0), "optimisation should improve the evidence"

    # rebuild the posterior at the optimum, warm-starting Newton from the
    # cached mode (reference examples/c-comparisons/script.jl:130-134)
    lf_opt = build_latent_gp(jnp.asarray(res.x))
    post = agp.posterior(
        agp.LaplaceApproximation(f_init=objective.cache.f), lf_opt(x), y
    )

    # sample latent functions from the approximate posterior
    xt = jnp.linspace(0, 6, 120)
    fxt = post(xt, 1e-9)
    samples = fxt.sample(jax.random.PRNGKey(7), (8,))
    p_mean = jax.nn.sigmoid(samples).mean(axis=0)
    acc = float(
        ((jax.nn.sigmoid(post.mean(x)) > 0.5).astype(y.dtype) == y).mean()
    )
    print(f"train accuracy at optimum: {acc:.3f}")
    assert acc > 0.7
    return post, p_mean


if __name__ == "__main__":
    main()
