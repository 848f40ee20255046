#!/usr/bin/env python
"""Regression: stochastic variational GP (SVGP) on N=10,000 points.

Port of the reference's examples/a-regression/script.jl (minibatch Adam
training of kernel hyperparameters, inducing inputs, and the variational
distribution), re-expressed as one jitted optax training step scanned over
minibatches.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import approximategps_tpu as agp
from approximategps_tpu.utils.bijectors import invsoftplus, softplus


def g(x):
    return jnp.sin(3 * jnp.pi * x) + 0.3 * jnp.cos(9 * jnp.pi * x) + 0.5 * jnp.sin(7 * jnp.pi * x)


def make_kernel(k_params):
    return softplus(k_params[0]) * agp.with_lengthscale(
        agp.SqExponentialKernel(), softplus(k_params[1])
    )


def main(N=10_000, M=20, batch_size=100, epochs=30, lik_noise=0.3, seed=1234):
    key = jax.random.PRNGKey(seed)
    kx, kn, kshuf = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (N,), minval=-1.0, maxval=1.0)
    y = g(x) + 0.3 * jax.random.normal(kn, (N,))

    params = {
        "k": jnp.array([invsoftplus(1.3), invsoftplus(0.3)]),
        "z": x[:M],
        "m": jnp.zeros(M),
        "A": jnp.eye(M),
    }

    jitter = 1e-5

    def make_approx(params, xb):
        f = agp.GP(make_kernel(params["k"]))
        fx = f(xb, lik_noise)
        fz = f(params["z"], jitter)
        q = agp.MultivariateNormal(params["m"], jnp.tril(params["A"]))
        return agp.SparseVariationalApproximation(fz, q, agp.Centered()), fx

    def loss(params, xb, yb):
        sva, fx = make_approx(params, xb)
        return -agp.elbo(sva, fx, yb, num_data=N)

    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    @jax.jit
    def epoch(carry, perm):
        def step(carry, idx):
            params, opt_state = carry
            xb, yb = x[idx], y[idx]
            val, grads = jax.value_and_grad(loss)(params, xb, yb)
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), val

        return jax.lax.scan(step, carry, perm.reshape(-1, batch_size))

    carry = (params, opt_state)
    for e in range(epochs):
        kshuf, ke = jax.random.split(kshuf)
        perm = jax.random.permutation(ke, N)
        carry, vals = epoch(carry, perm)
        if e % 5 == 0 or e == epochs - 1:
            print(f"epoch {e:3d}  -elbo per batch: {float(vals.mean()):.2f}")

    params = carry[0]
    sva, _ = make_approx(params, x)
    post = agp.posterior(sva)
    xt = jnp.linspace(-1, 1, 200)
    mu, var = post.mean_and_var(xt)
    rmse = float(jnp.sqrt(jnp.mean((mu - g(xt)) ** 2)))
    print(f"posterior-mean RMSE vs true function: {rmse:.4f}")
    assert rmse < 0.2
    return params, post


if __name__ == "__main__":
    main()
