#!/usr/bin/env python
"""Matrix-free inference: CG exact regression, Matheron pathwise sampling,
and CG-Newton Laplace classification at sizes where dense O(N²) memory /
O(N³) factorizations stop being an option.

No reference counterpart (ApproximateGPs.jl only runs dense); this tier is
the BBMM composition (Gardner et al. 2018) + pathwise sampling (Wilson et
al. 2020) on top of the same kernel/GP objects.  Everything below accesses
the N×N kernel matrix only through chunked matvecs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import approximategps_tpu as agp
from approximategps_tpu.models.iterative import logpdf_slq, posterior_cg
from approximategps_tpu.models.laplace_cg import LaplaceCG
from approximategps_tpu.models.sampling import sample_posterior_functions_cg
from approximategps_tpu.utils.training import make_slq_hyperopt_step


def main(N=20_000, Nh=5_000, Nc=10_000, block=4096, hyperopt_steps=10):
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64

    # ---- 1. exact regression via preconditioned CG, N = 20,000 ----------
    x = jnp.asarray(np.sort(rng.uniform(0, 10, N)), dtype)[:, None]
    f_true = lambda t: np.sin(2 * t) + 0.5 * np.cos(5 * t)
    y = jnp.asarray(f_true(np.asarray(x[:, 0])) + 0.1 * rng.standard_normal(N), dtype)

    kern = 1.0 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.5)
    f = agp.GP(kern)
    fx = f(x, 0.01)

    t0 = time.time()
    post = posterior_cg(fx, y, tol=1e-6, block_size=block, precond_rank=32)
    xs = jnp.linspace(0, 10, 200, dtype=dtype)[:, None]
    mu, var = post.mean_and_var(xs)
    mu.block_until_ready()
    err = float(jnp.max(jnp.abs(mu - jnp.asarray(f_true(np.asarray(xs[:, 0])), dtype))))
    print(f"[cg-regression]  N={N}: max |mu - f_true| = {err:.3f} "
          f"({time.time()-t0:.1f}s, rank-32 preconditioner, block {block})")
    assert err < 0.15

    # SLQ log evidence (stochastic value)
    lml = float(logpdf_slq(fx, y, jax.random.PRNGKey(0), num_probes=8,
                           lanczos_iters=25, block_size=block))
    print(f"[slq-logpdf]     log p(y) ~= {lml:.1f}")

    # ---- 1b. SLQ hyperopt with the carried/refresh-schedule --------------
    # preconditioner: Adam on -logpdf_slq, pivoted-Cholesky factor rebuilt
    # every 5 steps (stale factors are solution-invariant — they only cost
    # CG iterations)
    xh, yh = x[:Nh], y[:Nh]

    def build_fx(theta):
        k = jax.nn.softplus(theta[0]) * agp.with_lengthscale(
            agp.SqExponentialKernel(), jax.nn.softplus(theta[1])
        )
        return agp.GP(k)(xh, 0.01)

    step, init_c = make_slq_hyperopt_step(
        build_fx, yh, jax.random.PRNGKey(3), learning_rate=0.1,
        precond_rank=32, refresh_every=5,
        num_probes=8, lanczos_iters=25, cg_tol=1e-6, block_size=block,
    )
    t0 = time.time()
    carry = init_c(jnp.array([0.0, 0.0], dtype))
    first = last = None
    for _ in range(hyperopt_steps):
        carry, nll = step(carry)
        first = float(nll) if first is None else first
        last = float(nll)
    theta_fit = jax.nn.softplus(carry[0])
    print(f"[slq-hyperopt]   {hyperopt_steps} Adam steps on -logpdf_slq: nll {first:.1f} "
          f"-> {last:.1f}, (var, ls) = ({float(theta_fit[0]):.2f}, "
          f"{float(theta_fit[1]):.2f}) ({time.time()-t0:.1f}s, "
          f"rank-32 refreshed every 5)")
    assert last < first

    # ---- 2. pathwise posterior function samples (Matheron + CG) ---------
    t0 = time.time()
    fs = sample_posterior_functions_cg(
        jax.random.PRNGKey(1), fx, y, num_samples=16, num_features=2048,
        tol=1e-6, block_size=block, precond_rank=32,
    )
    samples = fs(xs)  # (16, 200)
    spread = jnp.mean(samples.std(axis=0))
    print(f"[pathwise]       16 posterior functions, mean pointwise std "
          f"{float(spread):.4f} ({time.time()-t0:.1f}s)")
    assert jnp.all(jnp.isfinite(samples))

    # ---- 3. CG-Newton Laplace classification, N = 10,000 ----------------
    xc = jnp.asarray(rng.uniform(0, 10, (Nc, 1)), dtype)
    p_true = jax.nn.sigmoid(3.0 * jnp.sin(2.0 * xc[:, 0]))
    yc = jnp.asarray(rng.uniform(size=Nc) < np.asarray(p_true), dtype).astype(jnp.int32)

    lfx = agp.LatentGP(agp.GP(2.0 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.8)),
                       agp.BernoulliLikelihood(), 1e-6)(xc)
    t0 = time.time()
    la = LaplaceCG(maxiter=20, tol=1e-6, cg_tol=1e-6, block_size=block)
    post_c = agp.posterior(la, lfx, yc)
    mu_c = post_c.mean(xs)
    mu_c.block_until_ready()
    # mode recovers the latent probabilities
    p_hat = jax.nn.sigmoid(mu_c)
    p_ref = jax.nn.sigmoid(3.0 * jnp.sin(2.0 * xs[:, 0]))
    acc = float(jnp.mean((p_hat > 0.5) == (p_ref > 0.5)))
    print(f"[laplace-cg]     N={Nc} Bernoulli: sign agreement with the "
          f"true latent = {acc:.2%} ({time.time()-t0:.1f}s)")
    assert acc > 0.9

    print("matrix-free example OK")


if __name__ == "__main__":
    main()
