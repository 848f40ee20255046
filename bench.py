#!/usr/bin/env python
"""Headline benchmark: SVGP ELBO+gradient minibatch training step at the
BASELINE.json north-star scale (dataset N=1e6, M=2048 inducing points,
batch 8192, D=8 features) on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": ms_per_step, "unit": "ms", "vs_baseline": 50/ms}
(vs_baseline > 1 means faster than the 50 ms/step target from BASELINE.md.)

Timing methodology: the step is iterated inside a `lax.scan` with a real
parameter data-dependency (an optax Adam chain), the result is reduced to a
scalar on device and fetched to host; per-step time is the difference
between an n=1+k and an n=1 run divided by k.  This is robust to async
dispatch (plain `block_until_ready` does not synchronise through remote
TPU tunnels) and excludes compile time and output-transfer time.

Run `python bench.py --full` for secondary metrics (streaming full-batch
ELBO over all N=1e6 points, Vecchia banded construction at N=1e6,
Laplace Newton+lml at N=5k) on stderr.
"""

import argparse
import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache (mirrors tests/conftest.py): without it every
# driver run pays cold remote TPU compiles (20-40 s each, occasionally
# minutes — BENCH_NOTES), and a driver timeout leaves a blank tail
# (VERDICT r4 weak #2).  Must be configured before backend init.
_cache_dir = os.path.abspath(
    os.path.join(os.path.dirname(__file__), ".jax_cache")
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _hb(msg: str) -> None:
    """One-line stderr heartbeat so a timed-out run has a diagnostic tail."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def chained_step_ms(make_run, iters=50, repeats=1, label=""):
    """make_run(n) -> jitted fn returning a scalar after n chained steps.

    With ``repeats > 1`` returns (median_ms, stats_dict) over that many
    independent (t_{1+k} − t_1)/k measurements — the per-run spread
    quantifies tunnel/queue variance (VERDICT r1 weak #2)."""
    run1 = make_run(1)
    runk = make_run(1 + iters)
    _hb(f"{label}: compiling n=1 ...")
    float(run1())  # compile + warm
    _hb(f"{label}: compiling n={1 + iters} ...")
    float(runk())
    _hb(f"{label}: timing ({repeats} repeat(s)) ...")
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        t1_val = float(run1())
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        tk_val = float(runk())
        tk = time.perf_counter() - t0
        assert np.isfinite(t1_val) and np.isfinite(tk_val)
        samples.append(max(tk - t1, 1e-9) / iters * 1e3)
    if repeats == 1:
        return samples[0]
    arr = np.asarray(samples)
    stats = {
        "median_ms": float(np.median(arr)),
        "min_ms": float(arr.min()),
        "max_ms": float(arr.max()),
        "std_ms": float(arr.std()),
        "n_repeats": repeats,
    }
    return float(np.median(arr)), stats


# MXU peak dense-matmul throughput (TFLOP/s) per TPU generation, bf16
# accumulate-f32 (the precision the headline step's matmuls run at).
_PEAK_TFLOPS = {
    "v5 lite": 197.0,  # device_kind "TPU v5 lite"
    "v5e": 197.0,
    "v5litepod": 197.0,
    "v5p": 459.0,
    "v5": 459.0,  # after the lite variants
    "v4": 275.0,
    "v6e": 918.0,
    "v6 lite": 918.0,
}


def _peak_tflops() -> float | None:
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for k, v in _PEAK_TFLOPS.items():
        if k in kind:
            return v
    return None


def _step_flops(step_fn, *args) -> float | None:
    """XLA's own flop count for one compiled step (model FLOPs)."""
    try:
        compiled = jax.jit(step_fn).lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis["flops"])
    except Exception:
        return None


def _svgp_loss_fn(num_data):
    import approximategps_tpu as agp
    from approximategps_tpu.utils.bijectors import softplus

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

    return loss


def _svgp_params(M, D, key, dtype=jnp.float32):
    kz = jax.random.fold_in(key, 1)
    return {
        "k": jnp.array([0.5, 0.5], dtype=dtype),
        "z": jax.random.normal(kz, (M, D), dtype=dtype),
        "m": jnp.zeros(M, dtype=dtype),
        "A": jnp.eye(M, dtype=dtype),
    }


def headline(M=2048, batch=8192, D=8, num_data=1_000_000, iters=30, repeats=5):
    """Headline: one full SVGP Adam training step — per-step random minibatch
    GATHER from the device-resident N=1e6 dataset included (a real training
    loop pays it; VERDICT r1 weak #7), ELBO + grad + optimizer update.

    Returns (median_ms, info) with run-to-run spread and an achieved-TFLOP/s
    / MXU-roofline-fraction counter (VERDICT r1 weak #3)."""
    import optax

    # TPU perf policy (MXU gram path, bf16-accumulate-f32 matmuls,
    # matmul-only triangular application) now engages automatically:
    # config defaults are "auto" and resolve to the fast path on TPU f32.

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    # full dataset resident on HBM: (1e6, 8) f32 = 32 MB
    x_full = jax.random.normal(key, (num_data, D), dtype=dtype)
    y_full = jnp.sin(x_full[:, 0]) + 0.1 * jax.random.normal(
        jax.random.fold_in(key, 2), (num_data,), dtype=dtype
    )

    loss = _svgp_loss_fn(num_data)
    params = _svgp_params(M, D, key, dtype)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def train_step(carry, i, x_full, y_full):
        p, s = carry
        idx = jax.random.randint(
            jax.random.fold_in(key, i), (batch,), 0, num_data
        )
        xb = x_full[idx]
        yb = y_full[idx]
        val, grads = jax.value_and_grad(loss)(p, xb, yb)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), val

    def make_run(n):
        # params/opt_state AND the dataset as jit ARGUMENTS.  Baked-in
        # device constants are fetched device->host during lowering
        # (_array_mlir_constant_handler -> array._value): at M=8192 the
        # (M, M) factor overflows the remote compile helper's payload limit
        # (HTTP 413), and the 36 MB dataset fetch HANGS on a degraded
        # tunnel — BENCH_r04 rc=124 (VERDICT r4 weak #1).
        @jax.jit
        def run(params, opt_state, x_full, y_full):
            (p, _), vals = jax.lax.scan(
                partial(train_step, x_full=x_full, y_full=y_full),
                (params, opt_state),
                jnp.arange(n),
            )
            return vals[-1] + jnp.sum(p["m"]) * 0.0

        return partial(run, params, opt_state, x_full, y_full)

    ms, stats = chained_step_ms(
        make_run, iters=iters, repeats=repeats, label="headline"
    )

    # flop lowering must ALSO take the dataset as arguments (lower() walks
    # the same constant handler as compile)
    flops = _step_flops(
        lambda c, x, y: train_step(c, jnp.int32(0), x, y)[0],
        (params, opt_state),
        x_full,
        y_full,
    )
    info = dict(stats)
    peak = _peak_tflops()
    if flops is not None:
        tflops = flops / (ms * 1e9)
        info["step_gflops"] = round(flops / 1e9, 2)
        info["achieved_tflops"] = round(tflops, 1)
        if peak is not None:
            info["mxu_peak_tflops"] = peak
            info["mxu_fraction"] = round(tflops / peak, 4)
    return ms, info


def full_streaming(M=2048, N=1 << 20, D=8, block=16384, iters=3):
    import approximategps_tpu as agp
    from approximategps_tpu.models.svgp_streaming import streaming_elbo
    from approximategps_tpu.utils.bijectors import softplus

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D), dtype=dtype)
    y = jnp.sin(x[:, 0])
    params = _svgp_params(M, D, key, dtype)

    def loss(params, x, y):
        kernel = softplus(params["k"][0]) * agp.with_lengthscale(
            agp.SqExponentialKernel(), softplus(params["k"][1])
        )
        f = agp.GP(kernel)
        fz = f(params["z"], 1e-6)
        q = agp.MultivariateNormal(params["m"], jnp.tril(params["A"]))
        sva = agp.SparseVariationalApproximation(fz, q)
        lik = agp.GaussianLikelihood(jnp.asarray(0.1, dtype))
        return -streaming_elbo(sva, lik, x, y, block_size=block)

    def make_run(n):
        # data passed as jit ARGUMENTS: baking a 320 MB (N=1e7) constant
        # into the graph overflows the remote compile helper's payload limit
        @jax.jit
        def run(x, y):
            def body(p, _):
                val, grads = jax.value_and_grad(loss)(p, x, y)
                p = jax.tree_util.tree_map(lambda a, g: a - 1e-9 * g, p, grads)
                return p, val

            p, vals = jax.lax.scan(body, params, None, length=n)
            return vals[-1] + jnp.sum(p["m"]) * 0.0

        return lambda: run(x, y)

    return chained_step_ms(make_run, iters=iters, label="full_streaming")


def vecchia_build(N=1_000_000, k=32, block=8192, iters=3):
    import approximategps_tpu as agp
    from approximategps_tpu.models.vecchia import approx_root_prec_band

    dtype = jnp.float32
    # unit spacing ≈ one lengthscale: keeps conditional variances F_i well
    # away from the f32 cancellation floor (spacing ≪ lengthscale makes the
    # Vecchia conditionals numerically singular in any precision)
    x0 = jnp.linspace(0.0, float(N), N, dtype=dtype)
    kern = agp.Matern32Kernel()

    def make_run(n):
        @jax.jit
        def run(x0):
            def body(x, _):
                Uband = approx_root_prec_band(x, k, kern, block_size=block)
                return x + 0.0 * Uband[0, 0], jnp.sum(Uband[:, -1])

            x, vals = jax.lax.scan(body, x0, None, length=n)
            return vals[-1]

        return partial(run, x0)

    return chained_step_ms(make_run, iters=iters, label="vecchia_build")


def vecchia_predict_knn_sweep(N=1_000_000, Ntest=1_000_000, k=32, iters=1):
    """Vecchia serving: 1e6-train/1e6-test mean+var through predict_knn —
    device-side k-NN search + batched local-kriging band solves.
    No (N, N*) cross-covariance ever exists (the PosteriorGP masquerade
    path would need 4 TB for it).

    The search rides the bucketed-grid spatial tier (2-D inputs, auto
    mode): 2.5 µs/test point vs the blocked scan's 73, which also made the
    full 1e6-test single program fit the tunneled worker's watchdog (the
    scan tier ran >2 min and crashed it — that row was capped at 2e5)."""
    import approximategps_tpu as agp

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    kx, ks, ky = jax.random.split(key, 3)
    X = jax.random.uniform(kx, (N, 2), dtype) * 1000.0
    Xs = jax.random.uniform(ks, (Ntest, 2), dtype) * 1000.0
    y = jax.random.normal(ky, (N,), dtype)
    f = agp.GP(agp.with_lengthscale(agp.Matern32Kernel(), 5.0))

    def make_run(n):
        # X enters through the FiniteGP built INSIDE the jit so the 8 MB
        # train-inputs array rides as an argument, not a baked constant
        @jax.jit
        def run(X, y, Xs):
            fx = f(X, 0.1)

            def body(c, _):
                # tile sizes: the live (test_block, train_block) distance
                # tile is 1 GB f32; 8192×131072 (4 GB) plus top_k's sort
                # intermediates OOMs the 16 GB v5e worker
                mu, var = agp.predict_knn(
                    fx, y + c * 0, Xs, k=k,
                    test_block=4096, train_block=65536,
                )
                return c + 0.0 * mu[0], jnp.sum(mu) + jnp.sum(var)

            _, vals = jax.lax.scan(body, jnp.zeros((), dtype), None, length=n)
            return vals[-1]

        return lambda: run(X, y, Xs)

    return chained_step_ms(make_run, iters=iters, label="predict_knn")


def vecchia_lml_grad(N=1_000_000, k=32, block=8192, iters=2):
    """The BASELINE config-#4 TRAINING step: one jitted value_and_grad of
    the banded-Vecchia lml w.r.t. kernel hyperparameters (variance +
    lengthscale) at N=1e6/k=32.  The forward runs the fused batch-on-lanes
    Pallas band kernel; the backward is the chunked XLA recompute pullback
    (``_vecchia_band_bwd``) chained with the closed-form band pullback."""
    import approximategps_tpu as agp

    dtype = jnp.float32
    x0 = jnp.linspace(0.0, float(N), N, dtype=dtype)
    y = jnp.sin(x0 / 3.0)

    def lml(theta, x, y):
        kern = jax.nn.softplus(theta[0]) * agp.with_lengthscale(
            agp.Matern32Kernel(), jax.nn.softplus(theta[1])
        )
        nn = agp.NearestNeighbors(k, block_size=block)
        return agp.approx_lml(nn, agp.GP(kern)(x, 0.0), y)

    theta0 = jnp.array([0.55, 0.55], dtype)

    def make_run(n):
        @jax.jit
        def run(x, y):
            def body(t, _):
                v, g = jax.value_and_grad(lml)(t, x, y)
                return t + 1e-30 * (v + jnp.sum(g)), None

            t, _ = jax.lax.scan(body, theta0, None, length=n)
            return jnp.sum(t)

        return partial(run, x0, y)

    return chained_step_ms(make_run, iters=iters, label="vecchia_lml_grad")


def vecchia_nugget_lml_grad(N=1_000_000, k=32, block=8192, iters=2):
    """The NOISY-data Vecchia training step: lml+grad of a
    ``σ²·Matern32(ℓ) + τ²·White`` kernel wrt all three hyperparameters —
    the nugget rides the fused Pallas tier as a traced Gram diagonal shift
    (``unwrap_stationary_nugget``), with its cotangent emitted by the
    fused backward kernel.  The generic windowed fallback this replaced
    measured 4.1 s at N=2e5 (≈20 s-class at 1e6)."""
    import approximategps_tpu as agp

    dtype = jnp.float32
    x0 = jnp.linspace(0.0, float(N), N, dtype=dtype)
    y = jnp.sin(x0 / 3.0)

    def lml(theta, x, y):
        kern = jax.nn.softplus(theta[0]) * agp.with_lengthscale(
            agp.Matern32Kernel(), jax.nn.softplus(theta[1])
        ) + jax.nn.softplus(theta[2]) * agp.WhiteKernel()
        nn = agp.NearestNeighbors(k, block_size=block)
        return agp.approx_lml(nn, agp.GP(kern)(x, 0.0), y)

    theta0 = jnp.array([0.55, 0.55, 0.02], dtype)

    def make_run(n):
        @jax.jit
        def run(x, y):
            def body(t, _):
                v, g = jax.value_and_grad(lml)(t, x, y)
                return t + 1e-30 * (v + jnp.sum(g)), None

            t, _ = jax.lax.scan(body, theta0, None, length=n)
            return jnp.sum(t)

        return partial(run, x0, y)

    return chained_step_ms(make_run, iters=iters, label="vecchia_nugget")


def block_vecchia_lml_grad(N=1_000_000, b=64, k=64, iters=2):
    """Block-Vecchia training step: lml + hyperparameter gradient at
    N=1e6 (the lml-only row measures the forward; training pays the
    pullback through the batched block factorizations too)."""
    import approximategps_tpu as agp

    dtype = jnp.float32
    x = jnp.linspace(0.0, float(N), N, dtype=dtype)[:, None]
    y = jnp.sin(x[:, 0] / 3.0)

    def lml(theta, x, y):
        kern = jax.nn.softplus(theta[0]) * agp.with_lengthscale(
            agp.Matern32Kernel(), jax.nn.softplus(theta[1])
        )
        nn = agp.BlockNearestNeighbors(block_size=b, k=k)
        return agp.approx_lml(nn, agp.GP(kern)(x, 0.0), y)

    theta0 = jnp.array([0.55, 0.55], dtype)

    def make_run(n):
        @jax.jit
        def run(x, y):
            def body(t, _):
                v, g = jax.value_and_grad(lml)(t, x, y)
                return t + 1e-30 * (v + jnp.sum(g)), None

            t, _ = jax.lax.scan(body, theta0, None, length=n)
            return jnp.sum(t)

        return partial(run, x, y)

    return chained_step_ms(make_run, iters=iters, label="block_vecchia_grad")


def vecchia_sparse_build(N=1_000_000, k=32, iters=3):
    """Generalized-neighbor (gather-indexed) construction on the fused
    Pallas lanes tier — the maximin/nearest/scaled configurations' device
    path (VERDICT r3 item 1).  Predecessor sets here are synthetic random
    predecessors (worst-case gather locality: maximin/scaled sets are
    spatially clustered, so this upper-bounds their HBM cost); the host
    ordering/search runs once outside any training loop and is not what
    this row measures."""
    import numpy as np

    import approximategps_tpu as agp
    from approximategps_tpu.models.vecchia import approx_root_prec_sparse

    dtype = jnp.float32
    x0 = jnp.linspace(0.0, float(N), N, dtype=dtype)
    kern = agp.Matern32Kernel()
    rng = np.random.default_rng(0)
    # k random distinct predecessors per point (−1 pad for the first k)
    offs = np.sort(rng.integers(1, 1 << 30, size=(N, k)) % np.maximum(
        np.arange(N)[:, None], 1), axis=1)
    nbr_np = np.arange(N)[:, None] - 1 - offs
    nbr_np = np.where(np.arange(N)[:, None] > np.arange(k)[None, :],
                      np.maximum(nbr_np, 0), -1)
    nbr = jnp.asarray(nbr_np, jnp.int32)

    def make_run(n):
        # nbr is 128 MB (N x k int32) — MUST be a jit argument, not a baked
        # constant (remote-compile payload limit / lowering fetch hazard)
        @jax.jit
        def run(x, nbr):
            def body(c, _):
                rep = approx_root_prec_sparse(x + c * 0, nbr, kern)
                return c + 0.0 * rep.diag[0], jnp.sum(rep.diag)

            _, vals = jax.lax.scan(body, jnp.zeros((), dtype), None, length=n)
            return vals[-1]

        return partial(run, x0, nbr)

    return chained_step_ms(make_run, iters=iters, label="vecchia_sparse")


def laplace_cg_mode(N=20000, iters=2):
    """Matrix-free Laplace mode-finding at a size where the dense path needs
    a 1.6 GB gram + an O(N^3) Cholesky per Newton step.  Round-3 fast-solve
    defaults engage: rank-128 Woodbury preconditioning of the inner B-solve,
    HBM-resident Gram (N <= config.cg_dense_threshold), CG warm-starting
    across Newton steps, and the f32 stall detector (stops when the step
    size hits the evaluation-noise floor)."""
    import approximategps_tpu as agp
    from approximategps_tpu.models.laplace_cg import newton_inner_loop_cg

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N, 2), dtype=dtype) * 10
    y = (jax.random.uniform(jax.random.fold_in(key, 1), (N,)) > 0.5).astype(
        jnp.int32
    )
    lik = agp.BernoulliLikelihood()
    kern = 1.5 * agp.with_lengthscale(agp.SqExponentialKernel(), 1.2)
    # big-N config: chunked matvecs + stronger preconditioner
    big = N > 24576
    kw = dict(precond_rank=512, block_size=8192) if big else {}

    def make_run(n):
        @jax.jit
        def run(x):
            def body(c, _):
                f = newton_inner_loop_cg(
                    lik, y, kern, x + c * 0, maxiter=60, tol=1e-4,
                    cg_tol=1e-6, cg_maxiter=400, **kw,
                )
                return jnp.sum(f) * 1e-20, 0.0

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c

        return partial(run, x)

    return chained_step_ms(make_run, iters=iters, label="laplace_cg")


def laplace_cg_lml(N=100_000, iters=1):
    """Full matrix-free Laplace approx-lml (Newton mode + SLQ logdet B) at a
    scale the dense path cannot reach.  Exercises the probe-blocked Lanczos
    recurrence (iterative._lanczos_block): each of the 30 Lanczos iterations
    presents one (N, 16) probe block to the fused gram-matvec tier instead of
    16 vmapped single-vector recurrences."""
    import approximategps_tpu as agp
    from approximategps_tpu.models.laplace_cg import laplace_lml_cg

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N, 2), dtype=dtype) * 10
    y = (jax.random.uniform(jax.random.fold_in(key, 1), (N,)) > 0.5).astype(
        jnp.int32
    )
    lik = agp.BernoulliLikelihood()
    kern = 1.5 * agp.with_lengthscale(agp.SqExponentialKernel(), 1.2)

    def make_run(n):
        @jax.jit
        def run(x):
            def body(c, _):
                lml = laplace_lml_cg(
                    lik, y, kern, x + c * 0, jax.random.PRNGKey(7),
                    num_probes=16, lanczos_iters=30, maxiter=60, tol=1e-4,
                    cg_tol=1e-6, cg_maxiter=400, precond_rank=512,
                    block_size=8192,
                )
                return lml * 1e-20, 0.0

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c

        return partial(run, x)

    return chained_step_ms(make_run, iters=iters, label="laplace_cg_lml")


def svgp_predict_sweep(M=2048, Ntest=1_000_000, D=8, block=16384, iters=5):
    """Serving path (VERDICT r2 item 4): posterior (mean, var) sweep over
    1e6 test points through ``SVGPPosterior.predict_blocks`` — a lax.scan
    over 16k-point blocks, each through the fused Pallas data-term epilogue
    so the (M, B) cross-covariance and S·K intermediates never touch HBM.
    Reports ms per full sweep and effective GB/s over the unavoidable HBM
    traffic (test inputs in + mean/var out)."""
    import approximategps_tpu as agp
    from approximategps_tpu.utils.bijectors import softplus

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (Ntest, D), dtype=dtype)
    params = _svgp_params(M, D, key, dtype)

    def build_posterior(params):
        kernel = softplus(params["k"][0]) * agp.with_lengthscale(
            agp.SqExponentialKernel(), softplus(params["k"][1])
        )
        f = agp.GP(kernel)
        fz = f(params["z"], 1e-6)
        q = agp.MultivariateNormal(params["m"], jnp.tril(params["A"]))
        return agp.posterior(agp.SparseVariationalApproximation(fz, q))

    def make_run(n):
        @jax.jit
        def run(params, xs):
            post = build_posterior(params)

            def body(c, _):
                mu, var = post.predict_blocks(xs + c * 0, block_size=block)
                return jnp.sum(mu) * 1e-30 + jnp.sum(var) * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c

        return partial(run, params, xs)

    ms = chained_step_ms(make_run, iters=iters, label="predict_sweep")
    gb = Ntest * (D + 2) * 4 / 1e9
    # analytic model FLOPs: per test point, gram (2·M·D) + S_corr
    # projection (2·M², dominant) + O(M) epilogue reductions
    tflops = Ntest * (2 * M * D + 2 * M * M + 4 * M) / (ms * 1e9)
    peak = _peak_tflops()
    print(
        json.dumps(
            {
                "metric": f"svgp_predict_sweep_io(Ntest=1e6,M={M})",
                "io_gb": round(gb, 3),
                "io_gbps": round(gb / (ms / 1e3), 1),
                "achieved_tflops": round(tflops, 1),
                **(
                    {"mxu_fraction": round(tflops / peak, 3)}
                    if peak
                    else {}
                ),
            }
        ),
        file=sys.stderr,
    )
    return ms


def natgrad_hybrid(M=2048, batch=8192, D=8, num_data=1_000_000, iters=10):
    """VERDICT r2 item 9: one fused hybrid step at headline scale — Adam on
    the kernel hypers + inducing points, WHITENED natural-gradient update on
    the variational (m, S) — per-step minibatch gather included, everything
    in one jitted scan body.  The natgrad's O(M³) work is two fused
    streamed-panel (L, L⁻¹) factorizations plus MXU matmuls (no triangular
    solves); the carried L⁻¹ feeds the L̄ → S̄ Cholesky pullback."""
    import optax

    import approximategps_tpu as agp
    from approximategps_tpu.utils.bijectors import softplus
    from approximategps_tpu.utils.training import make_natgrad_adam_step

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    x_full = jax.random.normal(key, (num_data, D), dtype=dtype)
    y_full = jnp.sin(x_full[:, 0]) + 0.1 * jax.random.normal(
        jax.random.fold_in(key, 2), (num_data,), dtype=dtype
    )

    def elbo_fn(hyper, m, L, xb, yb):
        kernel = softplus(hyper["k"][0]) * agp.with_lengthscale(
            agp.SqExponentialKernel(), softplus(hyper["k"][1])
        )
        f = agp.GP(kernel)
        fz = f(hyper["z"], 1e-6)
        q = agp.MultivariateNormal(m, jnp.tril(L))
        sva = agp.SparseVariationalApproximation(fz, q)  # NonCentered
        return agp.elbo(sva, f(xb, 0.1), yb, num_data=num_data)

    p = _svgp_params(M, D, key, dtype)
    hyper0 = {"k": p["k"], "z": p["z"]}
    step, init = make_natgrad_adam_step(elbo_fn, optax.adam(1e-3), nat_lr=0.1)
    carry0 = jax.jit(init)(hyper0, p["m"], p["A"])

    def body(carry, i, x_full, y_full):
        idx = jax.random.randint(
            jax.random.fold_in(key, i), (batch,), 0, num_data
        )
        carry, e = step(carry, x_full[idx], y_full[idx])
        return carry, e

    def make_run(n):
        # dataset as jit ARGUMENTS (constant-embedding hazard, see headline)
        @jax.jit
        def run(carry, x_full, y_full):
            (hyper, _, m, L, _), es = jax.lax.scan(
                partial(body, x_full=x_full, y_full=y_full),
                carry,
                jnp.arange(n),
            )
            return es[-1] + jnp.sum(m) * 0.0 + jnp.sum(hyper["k"]) * 0.0

        return partial(run, carry0, x_full, y_full)

    return chained_step_ms(make_run, iters=iters, label="natgrad_hybrid")


def poisson_svgp(M=1024, batch=8192, num_data=100_000, iters=10):
    """BASELINE.json config #3: non-conjugate SVGP, Poisson likelihood,
    analytic expected-LL (exp link), minibatch Adam step."""
    import optax

    import approximategps_tpu as agp
    from approximategps_tpu.utils.bijectors import softplus

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    x = jnp.sort(jax.random.uniform(key, (batch,), dtype=dtype)) * 100
    y = jax.random.poisson(jax.random.fold_in(key, 1), jnp.exp(jnp.sin(x))).astype(
        jnp.int32
    )
    params = _svgp_params(M, 1, key, dtype)
    # 1-D inducing inputs must span the data (standard-normal draws at
    # M=1024 in 1-D are near-duplicates → singular Kuu in f32)
    params["z"] = jnp.linspace(0.0, 100.0, M, dtype=dtype)[:, None]

    def loss(params, xb, yb):
        kernel = softplus(params["k"][0]) * agp.with_lengthscale(
            agp.SqExponentialKernel(), softplus(params["k"][1])
        )
        f = agp.GP(kernel)
        lf = agp.LatentGP(f, agp.PoissonLikelihood(), 1e-6)
        # f32 jitter: M=1024 densely-spaced 1-D inducing points give
        # cond(Kuu) ~ var/jitter beyond 1/eps(f32) at 1e-6 — Cholesky is
        # infeasible in f32 at that conditioning in ANY implementation
        fz = f(params["z"], 1e-3)
        q = agp.MultivariateNormal(params["m"], jnp.tril(params["A"]))
        sva = agp.SparseVariationalApproximation(fz, q)
        return -agp.elbo(sva, lf(xb), yb, num_data=num_data)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def make_run(n):
        @jax.jit
        def run():
            def body(carry, _):
                p, s = carry
                val, grads = jax.value_and_grad(loss)(p, x, y)
                updates, s = opt.update(grads, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), val

            (p, _), vals = jax.lax.scan(body, (params, opt_state), None, length=n)
            return vals[-1] + jnp.sum(p["m"]) * 0.0

        return run

    return chained_step_ms(make_run, iters=iters, label="poisson_svgp")


def block_vecchia_lml(N=1_000_000, b=64, k=64, iters=3):
    """Block-Vecchia (arXiv 2410.04477) full lml at the BASELINE Vecchia
    scale: N/b MXU-sized factorizations instead of N tiny ones — measured
    6-7x faster than the scalar path with a RICHER conditioning set."""
    import approximategps_tpu as agp

    dtype = jnp.float32
    x = jnp.linspace(0.0, float(N), N, dtype=dtype)[:, None]
    f = agp.GP(agp.Matern32Kernel())
    y = jnp.sin(x[:, 0] / 3.0)
    nn = agp.BlockNearestNeighbors(block_size=b, k=k)

    def make_run(n):
        @jax.jit
        def run(x, y):
            def body(c, _):
                # x + c*0 gives the body a data dependency on the carry —
                # without it XLA hoists the loop-invariant lml out of the
                # scan and n=1 vs n=1+k differ by k scalar adds (measured
                # 0.0 ms; f32 c*0 cannot be folded since c could be inf/nan)
                return c + agp.approx_lml(nn, f(x + c * 0, 0.0), y) * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c

        return partial(run, x, y)

    return chained_step_ms(make_run, iters=iters, label="block_vecchia_lml")


def laplace_n5k(N=5000, iters=3):
    import approximategps_tpu as agp
    from approximategps_tpu.models import laplace as L

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    x = jnp.sort(jax.random.uniform(key, (N,), dtype=dtype)) * 10
    y = (jax.random.uniform(jax.random.fold_in(key, 1), (N,)) > 0.5).astype(jnp.int32)
    lik = agp.BernoulliLikelihood()

    def neg_lml(theta):
        kern = jax.nn.softplus(theta[0]) * agp.with_lengthscale(
            agp.SqExponentialKernel(), jax.nn.softplus(theta[1])
        )
        K = agp.GP(kern)(x, 1e-6).cov()
        return -L.laplace_lml(lik, y, K, maxiter=20)

    theta0 = jnp.array([1.0, 1.0], dtype=dtype)

    def make_run(n):
        @jax.jit
        def run():
            def body(t, _):
                v, g = jax.value_and_grad(neg_lml)(t)
                return t - 1e-6 * g, v

            t, vals = jax.lax.scan(body, theta0, None, length=n)
            return vals[-1]

        return run

    return chained_step_ms(make_run, iters=iters, label="laplace_n5k")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="also run secondary benches")
    ap.add_argument(
        "--all-json",
        action="store_true",
        dest="all_json",
        help="run secondary benches and emit them as JSON lines on STDOUT "
        "(headline line first, unchanged)",
    )
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--M", type=int, default=2048)
    args = ap.parse_args()

    ms, info = headline(M=args.M, batch=args.batch)
    result = {
        "metric": f"svgp_elbo_grad_step_ms(N=1e6,M={args.M},B={args.batch},D=8)",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(50.0 / ms, 3),
        **info,
    }
    print(json.dumps(result), flush=True)

    if args.full or args.all_json:
        # --all-json: secondary metrics as JSON lines on STDOUT after the
        # headline, so the driver/CI can archive them (VERDICT r4 item 6);
        # --full keeps the legacy stderr stream.
        out = sys.stdout if args.all_json else sys.stderr
        def headline_bf16():
            from approximategps_tpu.config import set_config

            set_config(compute_dtype="bfloat16")
            try:
                ms, info = headline(M=args.M, batch=args.batch, repeats=3)
            finally:
                set_config(compute_dtype="auto")
            return ms

        for name, fn in [
            ("svgp_elbo_grad_step_ms_bf16(N=1e6,M=2048,B=8192)", headline_bf16),
            ("svgp_streaming_fullbatch_elbo_grad_ms(N=2^20,M=2048)", full_streaming),
            (
                "svgp_streaming_fullbatch_elbo_grad_ms(N=1e7,M=2048)",
                partial(full_streaming, N=10_000_000, iters=2),
            ),
            ("svgp_predict_mean_var_sweep_ms(Ntest=1e6,M=2048)", svgp_predict_sweep),
            ("natgrad_adam_hybrid_step_ms(N=1e6,M=2048,B=8192)", natgrad_hybrid),
            ("vecchia_band_build_ms(N=1e6,k=32)", vecchia_build),
            ("vecchia_lml_grad_step_ms(N=1e6,k=32)", vecchia_lml_grad),
            (
                "vecchia_nugget_lml_grad_step_ms(N=1e6,k=32,var/ls/tau)",
                vecchia_nugget_lml_grad,
            ),
            (
                "vecchia_sparse_build_ms(N=1e6,k=32,random-predecessors)",
                vecchia_sparse_build,
            ),
            (
                "vecchia_predict_knn_sweep_ms(N=1e6,Ntest=1e6,k=32)",
                vecchia_predict_knn_sweep,
            ),
            ("block_vecchia_lml_ms(N=1e6,b=64,k=64)", block_vecchia_lml),
            (
                "block_vecchia_lml_grad_step_ms(N=1e6,b=64,k=64)",
                block_vecchia_lml_grad,
            ),
            ("laplace_newton_lml_grad_ms(N=5000)", laplace_n5k),
            ("laplace_cg_newton_mode_ms(N=2e4,K-resident+precond)", laplace_cg_mode),
            (
                "laplace_cg_newton_mode_ms(N=1e5,chunked+precond512)",
                partial(laplace_cg_mode, N=100_000, iters=1),
            ),
            (
                "laplace_cg_lml_ms(N=1e5,16probes,30lanczos)",
                laplace_cg_lml,
            ),
            ("poisson_svgp_elbo_grad_step_ms(N=1e5,M=1024,B=8192)", poisson_svgp),
        ]:
            try:
                v = fn()
                print(
                    json.dumps(
                        {"metric": name, "value": round(v, 1), "unit": "ms"}
                    ),
                    file=out,
                    flush=True,
                )
            except Exception as e:  # keep the headline robust
                print(
                    json.dumps({"metric": name, "error": str(e)[:200]}),
                    file=out,
                    flush=True,
                )


if __name__ == "__main__":
    main()
