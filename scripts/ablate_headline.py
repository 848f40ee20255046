#!/usr/bin/env python
"""Ablate the headline SVGP step: time each stage's forward+backward in
isolation (chained-scan methodology) to locate the non-FLOP overhead.

Stages (all at M=2048, B=8192, D=8, f32, TPU production config):
  data_term   — mu/var projection + expected-loglik + sum, grad wrt (S, alpha,
                Xs-side kernel inputs); S/alpha passed as direct arguments so
                no posterior construction is included.
  post_build  — posterior construction only: gram(Z) + chol_with_inv +
                B/alpha/S_corr products + KL, grad wrt params.
  gram_only   — Kuf gram forward+backward alone.
  matmul_ref  — one (M,M)x(M,B) matmul fwd+bwd as the MXU reference rate.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import chained_step_ms  # noqa: E402

import approximategps_tpu as agp  # noqa: E402
from approximategps_tpu.config import set_config  # noqa: E402
from approximategps_tpu.core import linalg  # noqa: E402
from approximategps_tpu.core.likelihoods import GaussianLikelihood  # noqa: E402
from approximategps_tpu.core.quadrature import (  # noqa: E402
    DefaultExpectationMethod,
    expected_loglikelihood,
)
from approximategps_tpu.utils.bijectors import softplus  # noqa: E402

set_config(gram_mode="mxu", matmul_precision="default", solve_mode="inv_matmul")

import os
M = int(os.environ.get("ABLATE_M", "2048"))
B = int(os.environ.get("ABLATE_B", "8192"))
D = int(os.environ.get("ABLATE_D", "8"))
key = jax.random.PRNGKey(0)
dtype = jnp.float32
Z = jax.random.normal(key, (M, D), dtype)
X = jax.random.normal(jax.random.fold_in(key, 1), (B, D), dtype)
y = jnp.sin(X[:, 0])
S0 = jax.random.normal(jax.random.fold_in(key, 2), (M, M), dtype) / M
S0 = 0.5 * (S0 + S0.T)
alpha0 = jax.random.normal(jax.random.fold_in(key, 3), (M,), dtype)
lik = GaussianLikelihood(jnp.asarray(0.1, dtype))
quad = DefaultExpectationMethod()


def kernel_of(kp):
    return softplus(kp[0]) * agp.with_lengthscale(
        agp.SqExponentialKernel(), softplus(kp[1])
    )


def bench_stage(name, loss, params, iters=30, repeats=3, extra=()):
    g = jax.grad(loss)

    def step(p, i):
        gr = g(p, *extra)
        # chain: p <- p - 1e-9 * grad keeps a data dependency
        return jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, gr), 0.0

    def make_run(n):
        @jax.jit
        def run():
            p, _ = jax.lax.scan(step, params, jnp.arange(n))
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(p))

        return run

    ms, stats = chained_step_ms(make_run, iters=iters, repeats=repeats)
    try:
        c = jax.jit(lambda p: loss(p, *extra)).lower(params).compile()
        a = c.cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0]
        fw_gflops = a["flops"] / 1e9
    except Exception:
        fw_gflops = float("nan")
    print(
        f"{name:12s} {ms:8.3f} ms  (min {stats['min_ms']:.3f})  fwd-only "
        f"{fw_gflops:7.1f} G",
        flush=True,
    )
    return ms


# --- data term: S, alpha given; grads wrt S, alpha, kernel params ---------
def data_loss(p):
    kern = kernel_of(p["k"])
    Kuf = kern.gram(Z, p["X"])
    mu = jnp.matmul(
        Kuf.T, p["alpha"], preferred_element_type=jnp.float32
    )
    kdiag = kern.diag(p["X"])
    var = kdiag + linalg.diag_quad_sym(p["S"], Kuf)
    ell = expected_loglikelihood(quad, lik, mu, var, y)
    return jnp.sum(ell)


# --- posterior construction + KL ------------------------------------------
def build_loss(p):
    kern = kernel_of(p["k"])
    f = agp.GP(kern)
    fz = f(p["z"], 1e-6)
    q = agp.MultivariateNormal(p["m"], jnp.tril(p["A"]))
    sva = agp.SparseVariationalApproximation(fz, q)
    from approximategps_tpu.models.svgp import _posterior_svgp, prior_kl

    post = _posterior_svgp(sva)
    c = post.cache
    s_corr_term = jnp.sum(c.S_corr) if c.S_corr is not None else jnp.sum(c.B)
    out = (
        s_corr_term
        + jnp.sum(c.alpha)
        + prior_kl(sva)
    )
    return out


# --- gram only -------------------------------------------------------------
def gram_loss(p):
    kern = kernel_of(p["k"])
    return jnp.sum(kern.gram(Z, p["X"]))


# --- matmul reference ------------------------------------------------------
def matmul_loss(p):
    # sum((S·K)²), NOT sum(S·K): plain sum-of-product factorizes into two
    # vector reductions + a dot (Σᵢⱼ(SK)ᵢⱼ = Σₖ(Σᵢ Sᵢₖ)(Σⱼ Kₖⱼ)) and XLA
    # rewrites the M²B matmul away — measured 0.000 ms before the square
    return jnp.sum(jnp.square(jnp.matmul(p["S"], p["K"], precision="default")))


if __name__ == "__main__":
    only = sys.argv[1:] or None
    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.time()
    if only is None or "data_term" in only:
        bench_stage(
        "data_term",
        data_loss,
        {"k": jnp.array([0.5, 0.5], dtype), "X": X, "S": S0, "alpha": alpha0},
    )
    if only is None or "post_build" in only:
        bench_stage(
        "post_build",
        build_loss,
        {
            "k": jnp.array([0.5, 0.5], dtype),
            "z": Z,
            "m": jnp.zeros(M, dtype),
            "A": jnp.eye(M, dtype=dtype),
        },
    )
    if only is None or "gram_only" in only:
        bench_stage(
        "gram_only", gram_loss, {"k": jnp.array([0.5, 0.5], dtype), "X": X}
    )
    if only is None or "matmul_ref" in only:
        bench_stage(
        "matmul_ref",
        matmul_loss,
        {"S": S0, "K": jax.random.normal(key, (M, B), dtype)},
    )
    print(f"total wall {time.time()-t0:.0f}s")
