#!/usr/bin/env python
"""Classification: sparse variational approximation for non-conjugate
likelihoods, optimised with L-BFGS.

Port of the reference's examples/b-classification/script.jl: a Bernoulli
latent GP, all parameters (kernel hyperparameters, inducing inputs,
variational mean + Cholesky) optimised jointly with scipy L-BFGS over a
jitted value-and-grad of the negative ELBO."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

import approximategps_tpu as agp
from approximategps_tpu.utils.bijectors import (
    cholesky_parameter,
    flat_from_tril,
    invsoftplus,
    softplus,
)


def make_kernel(k_params):
    return softplus(k_params[0]) * agp.with_lengthscale(
        agp.SqExponentialKernel(), softplus(k_params[1])
    )


def main(N=100, M=15, seed=1234):
    # generative model sampled host-side in float64: latent GP through
    # logistic, then Bernoulli labels
    rng = np.random.default_rng(seed)
    x_np = np.sort(rng.uniform(0, 10, N))
    var_true, ls_true = 2.0, 1.0
    K = var_true * np.exp(-0.5 * ((x_np[:, None] - x_np[None, :]) / ls_true) ** 2)
    f_np = np.linalg.cholesky(K + 1e-10 * np.eye(N)) @ rng.standard_normal(N)
    y_np = rng.binomial(1, 1.0 / (1.0 + np.exp(-f_np)))
    x = jnp.asarray(x_np, jnp.float32)
    y = jnp.asarray(y_np, jnp.float32)
    assert 10 < int(y.sum()) < N - 10, "labels should be reasonably balanced"

    M_z = jnp.linspace(x.min(), x.max(), M)
    init = {
        "k": jnp.array([invsoftplus(1.0), invsoftplus(1.0)]),
        "z": M_z,
        "m": jnp.zeros(M),
        "A_flat": flat_from_tril(jnp.eye(M)),
    }
    flat0, unravel = jax.flatten_util.ravel_pytree(init)

    jitter = 1e-6

    def build_svgp(params):
        f = agp.GP(make_kernel(params["k"]))
        fz = f(params["z"], jitter)
        q = agp.MultivariateNormal(params["m"], cholesky_parameter(params["A_flat"], M))
        return agp.SparseVariationalApproximation(fz, q), f

    def loss_flat(flat):
        params = unravel(flat)
        sva, f = build_svgp(params)
        lf = agp.LatentGP(f, agp.BernoulliLikelihood(), jitter)
        return -agp.elbo(sva, lf(x), y)

    vg = jax.jit(jax.value_and_grad(loss_flat))

    def fun(flat):
        v, g = vg(jnp.asarray(flat))
        return float(v), np.asarray(g, dtype=np.float64)

    res = scipy.optimize.minimize(
        fun, np.asarray(flat0), jac=True, method="L-BFGS-B", options={"maxiter": 150}
    )
    print(f"optimised -elbo: {res.fun:.3f}  ({res.nit} L-BFGS iterations)")

    params = unravel(jnp.asarray(res.x))
    sva, f = build_svgp(params)
    post = agp.posterior(sva)
    mu, var = post.mean_and_var(x)
    p_pred = jax.nn.sigmoid(mu / jnp.sqrt(1 + jnp.pi * var / 8))  # probit-ish squash
    acc = float(((p_pred > 0.5).astype(y.dtype) == y).mean())
    print(f"training accuracy of posterior mean: {acc:.3f}")
    assert acc > 0.7
    return params, post


if __name__ == "__main__":
    main()
