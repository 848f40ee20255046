#!/usr/bin/env python
"""Serving a trained SVGP at scale: blocked single-chip prediction sweeps
and mesh-sharded scale-out serving.

No reference counterpart (ApproximateGPs.jl predicts via dense (N_train,
N_test) cross-covariances in one shot, `SparseVariationalApproximationModule
.jl:246-264`); here the posterior cache (M-sized) is built once and a large
test set streams through:

1. `SVGPPosterior.predict_blocks` — a `lax.scan` over test blocks; on TPU
   each block runs the fused Pallas data-term epilogue, so the (M, B)
   cross-covariance never hits HBM (measured v5e: 64.4 ms per 1e6 points
   at M=2048, 66% MXU).
2. `parallel.dp_predict_blocks` — the same sweep sharded over a device
   mesh: cache replicated, test points split along the data axis, no
   collectives in the sweep.  Off-TPU this example provisions an 8-device
   virtual CPU mesh to demonstrate the sharding.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

import approximategps_tpu as agp
from approximategps_tpu.parallel import data_mesh, dp_predict_blocks
from approximategps_tpu.utils.training import build_svgp, init_svgp_params


def main(N=50_000, M=256, Ntest=200_000, seed=0, batch=4096):
    # provision a virtual CPU mesh BEFORE the first backend query (no-op on
    # TPU or if a backend already initialized — the sweep then just runs on
    # however many devices exist)
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
    print(f"backend: {jax.default_backend()}, devices: {jax.device_count()}")
    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64

    # ---- train a small SVGP (Adam on ELBO, minibatched) ------------------
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 20, N)).astype(np.float64)
    y = np.sin(x) + 0.3 * np.cos(4 * x) + 0.1 * rng.standard_normal(N)
    xj = jnp.asarray(x, dtype)
    yj = jnp.asarray(y, dtype)

    z0 = jnp.linspace(0.0, 20.0, M, dtype=dtype)
    params = init_svgp_params(z0, variance=1.0, lengthscale=0.5)

    import optax

    def loss(p, xb, yb):
        sva, f = build_svgp(p, jitter=1e-3)  # f32: densely-spaced z (the Poisson-bench recipe)
        return -agp.elbo(sva, f(xb, 0.1), yb, num_data=N)

    opt = optax.adam(3e-2)
    state = opt.init(params)
    B = min(batch, N)

    @jax.jit
    def epoch(carry, perm):
        def step(c, idx):
            p, s = c
            val, g = jax.value_and_grad(loss)(p, xj[idx], yj[idx])
            up, s = opt.update(g, s, p)
            return (optax.apply_updates(p, up), s), val

        return jax.lax.scan(step, carry, perm)

    steps = N // B
    t0 = time.time()
    key = jax.random.PRNGKey(seed)
    for e in range(30):
        perm = jax.random.permutation(jax.random.fold_in(key, e), N)[
            : steps * B
        ].reshape(steps, B)
        (params, state), vals = epoch((params, state), perm)
    print(f"[train]   30 epochs in {time.time()-t0:.1f}s, "
          f"final -elbo/N = {float(vals[-1])/N:.4f}")

    sva, f = build_svgp(params, jitter=1e-3)
    post = agp.posterior(sva)

    # ---- 1. single-chip blocked sweep ------------------------------------
    xs = jnp.linspace(-1.0, 21.0, Ntest, dtype=dtype)
    t0 = time.time()
    mu, var = post.predict_blocks(xs, block_size=16384)
    jax.block_until_ready((mu, var))
    t1 = time.time() - t0
    rmse = float(jnp.sqrt(jnp.mean((mu[1000:-1000] - jnp.sin(xs[1000:-1000])
                                    - 0.3 * jnp.cos(4 * xs[1000:-1000])) ** 2)))
    print(f"[serve-1] predict_blocks: {Ntest} points in {t1:.2f}s "
          f"(interior rmse {rmse:.3f})")
    assert rmse < 0.2, rmse

    # ---- 2. mesh-sharded sweep -------------------------------------------
    mesh = data_mesh()
    t0 = time.time()
    mu_dp, var_dp = dp_predict_blocks(post, xs, mesh, block_size=16384)
    jax.block_until_ready((mu_dp, var_dp))
    t2 = time.time() - t0
    print(f"[serve-N] dp_predict_blocks over {mesh.devices.size} device(s): "
          f"{Ntest} points in {t2:.2f}s")
    # tolerance keyed off the ACTUAL dtype: without jax_enable_x64 a
    # requested f64 silently computes in f32
    atol = 1e-5 if mu.dtype == jnp.float32 else 1e-12
    np.testing.assert_allclose(np.asarray(mu_dp), np.asarray(mu), atol=atol)
    np.testing.assert_allclose(np.asarray(var_dp), np.asarray(var), atol=atol)
    print("[serve-N] sharded sweep matches the single-device sweep")


if __name__ == "__main__":
    main()
