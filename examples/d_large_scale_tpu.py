#!/usr/bin/env python
"""Large-scale TPU training: Poisson SVGP on N=100,000 points.

Beyond the reference's examples (its largest is N=10,000 on CPU): a
non-conjugate count-regression model trained with minibatch Adam entirely
on-device — the BASELINE.json config-#3 workload as a runnable script.
Demonstrates the TPU-first pieces end to end: MXU gram/projection paths,
the blocked Cholesky, on-device epoch scan, and blocked prediction.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import approximategps_tpu as agp
from approximategps_tpu.config import set_config
from approximategps_tpu.utils.bijectors import invsoftplus, softplus
from approximategps_tpu.utils.data import epoch_batches


def rate_fn(x):
    return jnp.exp(jnp.sin(0.4 * x) + 0.5 * jnp.cos(1.3 * x))


def main(N=100_000, M=256, batch=8192, epochs=24, seed=0):
    set_config(gram_mode="mxu", matmul_precision="default", solve_mode="inv_matmul")
    key = jax.random.PRNGKey(seed)
    kx, ky, kshuf = jax.random.split(key, 3)
    x = jnp.sort(jax.random.uniform(kx, (N,), dtype=jnp.float32)) * 60.0
    y = jax.random.poisson(ky, rate_fn(x)).astype(jnp.int32)
    print(f"N={N} Poisson counts, mean rate {float(y.mean()):.2f}")

    params = {
        "k": jnp.array([invsoftplus(1.0), invsoftplus(2.0)], jnp.float32),
        "z": jnp.linspace(0.0, 60.0, M, dtype=jnp.float32),
        "m": jnp.zeros(M, dtype=jnp.float32),
        "A": jnp.eye(M, dtype=jnp.float32),
    }

    def build(params):
        kern = softplus(params["k"][0]) * agp.with_lengthscale(
            agp.SqExponentialKernel(), softplus(params["k"][1])
        )
        f = agp.GP(kern)
        fz = f(params["z"], 1e-3)  # f32-appropriate jitter at M inducing pts
        q = agp.MultivariateNormal(params["m"], jnp.tril(params["A"]))
        return agp.SparseVariationalApproximation(fz, q), f

    def loss(params, xb, yb):
        sva, f = build(params)
        lf = agp.LatentGP(f, agp.PoissonLikelihood(), 1e-3)
        return -agp.elbo(sva, lf(xb), yb, num_data=N)

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def epoch(carry, perm):
        def step(carry, idx):
            params, opt_state = carry
            val, grads = jax.value_and_grad(loss)(params, x[idx], y[idx])
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), val

        return jax.lax.scan(step, carry, perm)

    carry = (params, opt_state)
    t0 = time.time()
    for e in range(epochs):
        kshuf, ke = jax.random.split(kshuf)
        carry, vals = epoch(carry, epoch_batches(ke, N, batch))
        if e % 6 == 0 or e == epochs - 1:
            print(f"epoch {e}: -elbo/batch {float(vals.mean()):.1f}")
    steps = epochs * (N // batch)
    print(f"{steps} steps in {time.time()-t0:.1f}s (incl. compile)")

    params = carry[0]
    sva, f = build(params)
    post = agp.posterior(sva)
    xt = jnp.linspace(0.0, 60.0, 50_000)
    mu, var = agp.predict_in_blocks(post, xt, block_size=8192)
    pred_rate = jnp.exp(mu + var / 2.0)
    rel_err = float(jnp.mean(jnp.abs(pred_rate - rate_fn(xt)) / rate_fn(xt)))
    print(f"mean relative rate error on 50k test points: {rel_err:.3f}")
    assert rel_err < 0.3
    return params


if __name__ == "__main__":
    main()
