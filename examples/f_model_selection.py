#!/usr/bin/env python
"""Model selection and robust regression — two workflows beyond the
reference's examples:

1. MAP hyperparameter selection: the reference optimizes the raw Laplace
   lml (``examples/b-classification/script.jl:132-142``); here we compare
   maximum-likelihood against MAP with lognormal hyperpriors
   (``utils/priors.py``) on the reference's fixed Bernoulli dataset.  With
   N=48 points the ML optimum runs to an implausibly large variance; the
   hyperprior regularizes it.

2. Robust regression with a Student-t likelihood (non-log-concave): Laplace
   via the GaussNewton/Fisher curvature surrogate
   (``GaussNewtonLikelihood``), compared against a Gaussian likelihood on
   outlier-contaminated data.

Runs on TPU (f32) or CPU (f64).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import approximategps_tpu as agp
from approximategps_tpu import test_utils as tu
from approximategps_tpu.models import laplace as L
from approximategps_tpu.utils.priors import lognormal_prior, map_objective
from approximategps_tpu.utils.training import lbfgs_fit

def main(N=120, n_outliers=12, lbfgs_iters=150, seed=3):
    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    print(f"backend: {jax.default_backend()}, dtype: {dtype.__name__}")

    # -----------------------------------------------------------------------
    # 1. ML vs MAP hyperparameter selection (Laplace-Bernoulli, ref. data)
    # -----------------------------------------------------------------------
    X, Y = tu.generate_data()
    X = jnp.asarray(X, dtype)
    Y = jnp.asarray(Y)

    def neg_lml(raw):
        theta = jnp.stack([raw["variance"], raw["lengthscale"]])
        lf = tu.build_latent_gp(theta)  # softplus-constrains both
        return -agp.approx_lml(agp.LaplaceApproximation(), lf(X), Y)

    raw0 = {
        "variance": jnp.asarray(0.0, dtype),
        "lengthscale": jnp.asarray(0.5, dtype),
    }

    ml_raw, ml_loss, ml_n = lbfgs_fit(neg_lml, raw0, max_iters=lbfgs_iters)
    sp = jax.nn.softplus
    print("\nML  optimum: variance %.4f  lengthscale %.4f  (-lml %.5f, %d iters)"
          % (sp(ml_raw["variance"]), sp(ml_raw["lengthscale"]), ml_loss, ml_n))

    priors = {
        "variance": lognormal_prior(0.0, 1.0),
        "lengthscale": lognormal_prior(0.0, 1.0),
    }
    map_raw, map_loss, map_n = lbfgs_fit(
        map_objective(neg_lml, priors), raw0, max_iters=lbfgs_iters
    )
    print("MAP optimum: variance %.4f  lengthscale %.4f  (-map %.5f, %d iters)"
          % (sp(map_raw["variance"]), sp(map_raw["lengthscale"]), map_loss, map_n))
    print("(the reference's LBFGS run on this dataset lands at variance 7.709, "
          "lengthscale 1.518 — test/LaplaceApproximationModule.jl:159; the lml "
          "surface is near-flat in lengthscale at that point, so different "
          "starts settle at slightly different lengthscales)")
    # the hyperprior must actually regularize: MAP variance < ML variance
    assert float(sp(map_raw["variance"])) < float(sp(ml_raw["variance"]))

    # -----------------------------------------------------------------------
    # 2. Robust Student-t regression on outlier-contaminated data
    # -----------------------------------------------------------------------
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 6.0, N))
    f_true = np.sin(x) + 0.5 * np.cos(2.0 * x)
    y = f_true + 0.1 * rng.standard_normal(N)
    out_idx = rng.choice(N, n_outliers, replace=False)
    y[out_idx] += rng.choice([-1.0, 1.0], n_outliers) * rng.uniform(
        2.0, 4.0, n_outliers
    )

    xj = jnp.asarray(x, dtype)
    yj = jnp.asarray(y, dtype)
    kern = 1.0 * agp.with_lengthscale(agp.Matern52Kernel(), 0.7)
    f = agp.GP(kern)
    jitter = 1e-4 if dtype == jnp.float32 else 1e-10

    models = {
        "gaussian": agp.GaussianLikelihood(jnp.asarray(0.1**2, dtype)),
        "student-t (GGN fisher)": agp.GaussNewtonLikelihood(
            agp.StudentTLikelihood(jnp.asarray(3.0, dtype), jnp.asarray(0.1, dtype)),
            mode="fisher",
        ),
    }
    print(f"\nRobust regression: N={N}, {n_outliers} gross outliers")
    rmses = {}
    for name, lik in models.items():
        lfx = agp.LatentGP(f, lik, jitter)(xj)
        post = agp.posterior(agp.LaplaceApproximation(maxiter=300), lfx, yj)
        mu = np.asarray(post.mean(xj))
        rmse = float(np.sqrt(np.mean((mu - f_true) ** 2)))
        rmses[name] = rmse
        lml = float(agp.approx_lml(agp.LaplaceApproximation(maxiter=300), lfx, yj))
        print(f"  {name:24s} posterior-mean RMSE vs truth: {rmse:.4f}   lml: {lml:9.2f}")

    print("\nThe Student-t posterior mean shrugs off the outliers; the Gaussian "
          "one is dragged toward them.")
    assert rmses["student-t (GGN fisher)"] < 0.5 * rmses["gaussian"], rmses
    return rmses


if __name__ == "__main__":
    main()
