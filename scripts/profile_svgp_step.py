#!/usr/bin/env python
"""Decompose the headline SVGP step cost on TPU (chained-scan timing)."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

import approximategps_tpu as agp
from approximategps_tpu.config import set_config
from approximategps_tpu.core import linalg
from approximategps_tpu.utils.bijectors import softplus

set_config(gram_mode="mxu", matmul_precision="default", solve_mode="inv_matmul")

M, B, D = 2048, 8192, 8
key = jax.random.PRNGKey(0)
z = jax.random.normal(key, (M, D), dtype=jnp.float32)
x = jax.random.normal(jax.random.fold_in(key, 1), (B, D), dtype=jnp.float32)
y = jnp.sin(x[:, 0])


def timed(name, step_fn, carry0, iters=30):
    @partial(jax.jit, static_argnums=1)
    def run(carry, n):
        def body(c, _):
            return step_fn(c), None

        c, _ = jax.lax.scan(body, carry, None, length=n)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b) * 0.0, c, jnp.zeros(())
        ) + _first_scalar(c)

    def _first_scalar(c):
        leaf = jax.tree_util.tree_leaves(c)[0]
        return jnp.sum(leaf) * 0.0

    float(run(carry0, 1))
    float(run(carry0, 1 + iters))
    t0 = time.perf_counter(); float(run(carry0, 1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(carry0, 1 + iters)); tk = time.perf_counter() - t0
    ms = max(tk - t1, 0) / iters * 1e3
    print(f"{name:45s} {ms:8.3f} ms", flush=True)
    return ms


def kernel_of(kp):
    return softplus(kp[0]) * agp.with_lengthscale(agp.SqExponentialKernel(), softplus(kp[1]))


kp0 = jnp.array([0.5, 0.5], jnp.float32)

# 1. Kuu gram + chol
def step_kuu(kp):
    kern = kernel_of(kp)
    Kuu = kern.gram(z) + 1e-6 * jnp.eye(M)
    L = jnp.linalg.cholesky(Kuu)
    return kp + jnp.sum(L) * 1e-30


# 2. + Lk_inv
def step_inv(kp):
    kern = kernel_of(kp)
    Kuu = kern.gram(z) + 1e-6 * jnp.eye(M)
    L = jnp.linalg.cholesky(Kuu)
    Linv = linalg.solve_lower_triangular(L, jnp.eye(M, dtype=L.dtype))
    return kp + jnp.sum(Linv) * 1e-30

timed("  + Lk_inv (trsm vs I)", step_inv, kp0)

# 3. + Kuf gram
def step_kuf(kp):
    kern = kernel_of(kp)
    Kuu = kern.gram(z) + 1e-6 * jnp.eye(M)
    L = jnp.linalg.cholesky(Kuu)
    Linv = linalg.solve_lower_triangular(L, jnp.eye(M, dtype=L.dtype))
    Kuf = kern.gram(z, x)
    return kp + (jnp.sum(Linv) + jnp.sum(Kuf)) * 1e-30


# 4. + projections and diag corrections (forward data term)
def step_fwd(kp):
    kern = kernel_of(kp)
    Kuu = kern.gram(z) + 1e-6 * jnp.eye(M)
    L = jnp.linalg.cholesky(Kuu)
    Linv = linalg.solve_lower_triangular(L, jnp.eye(M, dtype=L.dtype))
    Kuf = kern.gram(z, x)
    A = jnp.matmul(Linv, Kuf, precision="default")
    BA = jnp.matmul(jnp.eye(M, dtype=L.dtype), A, precision="default")
    var = kern.diag(x) - jnp.sum(A * A, 0) + jnp.sum(BA * BA, 0)
    mu = Kuf.T @ jnp.zeros(M)
    ell = -0.5 * jnp.sum((y - mu) ** 2 / 0.1 + var / 0.1)
    return kp + ell * 1e-30

timed("  + A, BtA, diag, ell (full forward)", step_fwd, kp0)

# 5. forward via library elbo
params0 = {
    "k": kp0,
    "z": z,
    "m": jnp.zeros(M, dtype=jnp.float32),
    "A": jnp.eye(M, dtype=jnp.float32),
}

def lib_loss(params):
    kern = kernel_of(params["k"])
    f = agp.GP(kern)
    fx = f(x, 0.1)
    fz = f(params["z"], 1e-6)
    q = agp.MultivariateNormal(params["m"], jnp.tril(params["A"]))
    sva = agp.SparseVariationalApproximation(fz, q)
    return -agp.elbo(sva, fx, y, num_data=1_000_000)

def step_lib_fwd(params):
    v = lib_loss(params)
    return jax.tree_util.tree_map(lambda p: p + v * 1e-30, params)

timed("library elbo forward", step_lib_fwd, params0)

# 6. forward+backward
def step_lib_grad(params):
    v, g = jax.value_and_grad(lib_loss)(params)
    return jax.tree_util.tree_map(lambda p, gg: p - 1e-9 * gg, params, g)

timed("library elbo value_and_grad", step_lib_grad, params0)
