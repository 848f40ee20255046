#!/usr/bin/env python
"""Headline benchmark: SVGP ELBO+gradient minibatch training step at the
BASELINE.json north-star scale (dataset N=1e6, M=2048 inducing points,
batch 8192, D=8 features) on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": ms_per_step, "unit": "ms", "vs_baseline": 50/ms}
(vs_baseline > 1 means faster than the 50 ms/step target from BASELINE.md.)

Run `python bench.py --full` for the secondary metrics (streaming full-batch
ELBO over all N=1e6 points, Vecchia banded construction at N=1e6).
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _now():
    return time.perf_counter()


def _timeit(fn, *args, warmup=3, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = _now()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (_now() - t0) / iters


def headline(M=2048, batch=8192, D=8, num_data=1_000_000):
    import approximategps_tpu as agp
    from approximategps_tpu.config import set_config
    from approximategps_tpu.utils.bijectors import softplus

    # TPU perf policy: MXU gram path, bf16-accumulate-f32 matmuls,
    # matmul-only triangular application.
    set_config(gram_mode="mxu", matmul_precision="default", solve_mode="inv_matmul")

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    kx, kz, ky = jax.random.split(key, 3)
    x = jax.random.normal(kx, (batch, D), dtype=dtype)
    y = jnp.sin(x[:, 0]) + 0.1 * jax.random.normal(ky, (batch,), dtype=dtype)
    z = jax.random.normal(kz, (M, D), dtype=dtype)

    params = {
        "k": jnp.array([0.5, 0.5], dtype=dtype),
        "z": z,
        "m": jnp.zeros(M, dtype=dtype),
        "A": jnp.eye(M, dtype=dtype),
    }

    def loss(params, xb, yb):
        kernel = softplus(params["k"][0]) * agp.with_lengthscale(
            agp.SqExponentialKernel(), softplus(params["k"][1])
        )
        f = agp.GP(kernel)
        fx = f(xb, 0.1)
        fz = f(params["z"], 1e-6)
        q = agp.MultivariateNormal(params["m"], jnp.tril(params["A"]))
        sva = agp.SparseVariationalApproximation(fz, q)  # NonCentered
        return -agp.elbo(sva, fx, yb, num_data=num_data)

    step = jax.jit(jax.value_and_grad(loss))
    sec = _timeit(lambda p: step(p, x, y)[0], params)
    return sec * 1e3


def full_streaming(M=2048, N=1_000_000, D=8, block=16384):
    import approximategps_tpu as agp
    from approximategps_tpu.config import set_config
    from approximategps_tpu.models.svgp_streaming import streaming_elbo
    from approximategps_tpu.utils.bijectors import softplus

    set_config(gram_mode="mxu", matmul_precision="default", solve_mode="inv_matmul")
    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    kx, kz = jax.random.split(key)
    x = jax.random.normal(kx, (N, D), dtype=dtype)
    y = jnp.sin(x[:, 0])
    z = jax.random.normal(kz, (M, D), dtype=dtype)

    def loss(params):
        kernel = softplus(params["k"][0]) * agp.with_lengthscale(
            agp.SqExponentialKernel(), softplus(params["k"][1])
        )
        f = agp.GP(kernel)
        fz = f(params["z"], 1e-6)
        q = agp.MultivariateNormal(params["m"], jnp.tril(params["A"]))
        sva = agp.SparseVariationalApproximation(fz, q)
        lik = agp.GaussianLikelihood(jnp.asarray(0.1, dtype))
        return -streaming_elbo(sva, lik, x, y, block_size=block)

    params = {
        "k": jnp.array([0.5, 0.5], dtype=dtype),
        "z": z,
        "m": jnp.zeros(M, dtype=dtype),
        "A": jnp.eye(M, dtype=dtype),
    }
    step = jax.jit(jax.value_and_grad(loss))
    sec = _timeit(lambda p: step(p)[0], params, warmup=1, iters=3)
    return sec * 1e3


def vecchia_build(N=1_000_000, k=32, block=8192):
    import approximategps_tpu as agp
    from approximategps_tpu.models.vecchia import approx_root_prec_band

    dtype = jnp.float32
    x = jnp.linspace(0.0, 1000.0, N, dtype=dtype)
    kern = agp.Matern32Kernel()
    fn = jax.jit(lambda xs: approx_root_prec_band(xs, k, kern, block_size=block))
    sec = _timeit(fn, x, warmup=1, iters=3)
    return sec * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="also run secondary benches")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--M", type=int, default=2048)
    args = ap.parse_args()

    ms = headline(M=args.M, batch=args.batch)
    result = {
        "metric": f"svgp_elbo_grad_step_ms(N=1e6,M={args.M},B={args.batch},D=8)",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(50.0 / ms, 3),
    }
    print(json.dumps(result))

    if args.full:
        fs = full_streaming(M=args.M)
        print(
            json.dumps(
                {
                    "metric": "svgp_streaming_fullbatch_elbo_grad_ms(N=1e6,M=2048)",
                    "value": round(fs, 1),
                    "unit": "ms",
                },
            ),
            file=sys.stderr,
        )
        vb = vecchia_build()
        print(
            json.dumps(
                {
                    "metric": "vecchia_band_build_ms(N=1e6,k=32)",
                    "value": round(vb, 1),
                    "unit": "ms",
                },
            ),
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
