#!/usr/bin/env python
"""Classification: sparse variational approximation for non-conjugate
likelihoods, optimised with L-BFGS.

Port of the reference's examples/b-classification/script.jl: a Bernoulli
latent GP, all parameters (kernel hyperparameters, inducing inputs,
variational mean + Cholesky) optimised jointly with scipy L-BFGS over a
jitted value-and-grad of the negative ELBO."""

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
    key = jax.random.PRNGKey(seed)
    kx, kf = jax.random.split(key)
    x = jnp.sort(jax.random.uniform(kx, (N,)) * 10)

    # generative model: sample latent GP, push through logistic, sample labels
    k_true = jnp.array([invsoftplus(1.0), invsoftplus(0.3)])
    lf_true = agp.LatentGP(agp.GP(make_kernel(k_true)), agp.BernoulliLikelihood(), 1e-8)
    f_true, y = lf_true(x).sample(kf)

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
        fun, np.asarray(flat0), jac=True, method="L-BFGS-B", options={"maxiter": 300}
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
