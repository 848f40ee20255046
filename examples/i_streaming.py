#!/usr/bin/env python
"""Streaming sparse GPs: online variational updates without revisiting data
(Bui, Nguyen & Turner 2017, arXiv:1705.07131).

No reference counterpart — ApproximateGPs.jl's SVGP is batch-only.  Here a
data stream arrives in chunks; each round carries only an
`OnlineSVGPState` (old inducing prior + old q) forward:

1. Gaussian stream, fixed sites: the closed-form natural-parameter update
   `online_optimal_q` telescopes EXACTLY to the full-batch Titsias optimum
   — verified against a full refit at the end.
2. Drifting coverage: inducing sites move with the data (z grows with the
   observed domain); the update is approximate but tracks the batch refit.
3. Non-conjugate (Bernoulli) stream: each round runs a short Adam fit of
   `online_elbo` — the old posterior's analytic correction term replaces
   all past data.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import approximategps_tpu as agp


def main(N=3000, M=32, rounds=6, seed=0):
    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    # resolve to the EFFECTIVE dtype: on CPU without jax_enable_x64 a
    # requested f64 silently computes in f32, and the jitter below must key
    # off what actually runs (f32 at jitter 1e-10 trips the 1e-3 assert)
    dtype = jnp.empty((), dtype).dtype
    noise = 0.05

    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 12.0, N))
    y = np.sin(x) + 0.25 * np.cos(3 * x) + np.sqrt(noise) * rng.standard_normal(N)
    xj, yj = jnp.asarray(x, dtype), jnp.asarray(y, dtype)
    chunk = N // rounds

    f = agp.GP(agp.with_lengthscale(agp.SqExponentialKernel(), 0.7))
    # f32 needs a healthy inducing jitter: the streaming update recovers the
    # old site precision from (S_old, K_old), so per-round roundoff scales
    # with cond(K_zz) — 1e-3 keeps it ≈1e3 (gap vs full refit ~3e-3; at
    # jitter 1e-4 the accumulated gap over 6 rounds is ~3e-2)
    jit_z = 1e-3 if dtype == jnp.float32 else 1e-10

    # ---- 1. fixed sites: exact streaming regression -----------------------
    # With fixed z and hypers, accumulate the whitened natural-parameter
    # sites directly (site_state/site_update) — pure addition, so the stream
    # telescopes to the full-batch optimum even in f32.  (The general
    # moving-site update online_optimal_q must RECOVER old sites by a
    # subtraction whose f32 roundoff grows as the posterior tightens —
    # measured ~1e-1 mean drift on this stream; the accumulator stays ~1e-5.)
    z = jnp.linspace(0.0, 12.0, M, dtype=dtype)
    fz = f(z, jit_z)
    st = agp.site_state(fz)
    absorb = jax.jit(lambda st, xb, yb: agp.site_update(st, f(xb, noise), yb))
    for r in range(rounds):
        sl = slice(r * chunk, (r + 1) * chunk)
        st = absorb(st, xj[sl], yj[sl])
        print(f"round {r}: streamed {(r + 1) * chunk} points")
    q_stream = agp.site_posterior_q(st)

    q_batch = agp.optimal_variational_posterior(fz, f(xj, noise), yj)
    xs = jnp.linspace(0.0, 12.0, 400, dtype=dtype)
    p_stream = agp.posterior(agp.SparseVariationalApproximation(fz, q_stream, agp.Centered()))
    p_batch = agp.posterior(agp.SparseVariationalApproximation(fz, q_batch, agp.Centered()))
    mu_s = p_stream.mean(xs)
    gap = float(jnp.max(jnp.abs(mu_s - p_batch.mean(xs))))
    print(f"fixed sites: max |stream − full refit| mean gap = {gap:.2e}")
    # tolerance keyed off the ACTUAL dtype (CPU without jax_enable_x64
    # silently computes in f32)
    assert gap < (1e-3 if mu_s.dtype == jnp.float32 else 1e-7), gap

    # ---- 2. sites that grow with the observed domain ----------------------
    state = None
    for r in range(rounds):
        sl = slice(r * chunk, (r + 1) * chunk)
        hi = float(x[sl.stop - 1])
        z_r = jnp.linspace(0.0, max(hi, 0.5), M, dtype=dtype)
        fz_r = f(z_r, jit_z)
        if state is None:
            state = agp.OnlineSVGPState(fz_r, fz_r.to_mvn())
        q = agp.online_optimal_q(state, fz_r, f(xj[sl], noise), yj[sl])
        state = agp.OnlineSVGPState(fz_r, q)
    p_stream = agp.posterior(
        agp.SparseVariationalApproximation(state.fz, state.q, agp.Centered())
    )
    rmse = float(jnp.sqrt(jnp.mean((p_stream.mean(xs) - jnp.sin(xs) - 0.25 * jnp.cos(3 * xs)) ** 2)))
    print(f"moving sites: rmse vs true function = {rmse:.3f}")
    assert rmse < 0.1, rmse

    # ---- 3. non-conjugate stream (Bernoulli, Adam on online_elbo) ---------
    lf = agp.LatentGP(f, agp.BernoulliLikelihood(), jit_z)
    ytrue = np.sin(x) * 2.0
    yb_all = jnp.asarray(
        (rng.uniform(size=N) < 1.0 / (1.0 + np.exp(-ytrue))).astype(np.float64), dtype
    )
    z = jnp.linspace(0.0, 12.0, M, dtype=dtype)
    fz = f(z, jit_z)
    state = agp.OnlineSVGPState(fz, fz.to_mvn())

    def fit_round(state, xb, yb, steps=150):
        params = (state.q.mean, state.q.scale_tril)
        opt = optax.adam(5e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def nloss(p):
                q = agp.MultivariateNormal(p[0], jnp.tril(p[1]))
                sva = agp.SparseVariationalApproximation(fz, q, agp.Centered())
                return -agp.online_elbo(sva, state, lf(xb), yb)

            val, g = jax.value_and_grad(nloss)(params)
            upd, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(params, upd), opt_state, val

        for _ in range(steps):
            params, opt_state, val = step(params, opt_state)
        q = agp.MultivariateNormal(params[0], jnp.tril(params[1]))
        return agp.OnlineSVGPState(fz, q), float(val)

    for r in range(rounds):
        sl = slice(r * chunk, (r + 1) * chunk)
        state, nll = fit_round(state, xj[sl], yb_all[sl])
        print(f"bernoulli round {r}: -online_elbo = {nll:.1f}")

    p = agp.posterior(agp.SparseVariationalApproximation(fz, state.q, agp.Centered()))
    acc = float(
        jnp.mean((jax.nn.sigmoid(p.mean(xj)) > 0.5) == (yb_all > 0.5))
    )
    print(f"bernoulli stream: train accuracy = {acc:.3f}")
    assert acc > 0.75, acc
    print("streaming example ok")


if __name__ == "__main__":
    main()
