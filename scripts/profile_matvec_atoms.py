"""Decompose the chunked kernel-matvec's 107 ms/matvec (N=1e5, block 8192)
into atoms, to size the fused gram-matvec Pallas kernel's headroom.

Each atom is timed on ONE (8192, 1e5) block (the matvec runs 13 of them):
  gram_xla     — kern.gram(xb, X) as kernel_matvec uses it today
  gram_pallas  — ops.gram.pallas_stationary_gram (fused distance+map)
  exp_only     — jnp.exp on an (8192, 1e5) array (VPU transcendental rate)
  gemv         — K @ v on a resident (8192, 1e5) f32 (HBM read rate)
  dist_hi      — (8192,128)@(128,1e5) at HIGHEST (the padded distance dot)
  dist_hi3     — same at HIGH (3-pass)

Run: python scripts/profile_matvec_atoms.py          # single-RHS atoms
     python scripts/profile_matvec_atoms.py rsweep   # fused-vs-XLA R sweep
The rsweep phase sizes config.matvec_fused_max_rhs: fused cost ≈
(r²+map tile) + R·(one lane-reduction); XLA is gram-build-bound and ~flat
in R (the distance matmul already pays 128 padded lanes).
"""
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, ".")
import approximategps_tpu as agp  # noqa: E402
from approximategps_tpu.ops.gram import pallas_stationary_gram  # noqa: E402

N, B, D = 100_000, 8192, 2
dtype = jnp.float32
key = jax.random.PRNGKey(0)
X = jax.random.uniform(key, (N, D), dtype=dtype) * 10
Xb = X[:B]
kern = 1.5 * agp.with_lengthscale(agp.SqExponentialKernel(), 1.2)
K_big = jax.random.normal(jax.random.fold_in(key, 3), (B, N), dtype)
v = jnp.ones((N,), dtype)
Xpad = jnp.zeros((B, 128), dtype).at[:, :D].set(Xb)
Zpad = jnp.zeros((N, 128), dtype).at[:, :D].set(X)


def chain(fn, arg, n):
    def body(c, _):
        out = fn(arg, c)
        return jnp.float32(jnp.sum(out) * 1e-30), 0.0

    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
    return c


def timeit(fn, arg, label, iters=6):
    f1 = jax.jit(partial(chain, fn), static_argnums=1)
    float(f1(arg, 1))
    float(f1(arg, 1 + iters))
    t0 = time.perf_counter(); float(f1(arg, 1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f1(arg, 1 + iters)); tk = time.perf_counter() - t0
    print(f"{label}: {(tk - t1) / iters * 1e3:.1f} ms", flush=True)


if sys.argv[1:] == ["rsweep"]:
    from approximategps_tpu.config import config_context
    from approximategps_tpu.models.iterative import kernel_matvec

    for R in (1, 4, 8, 16, 32, 64):
        V = jax.random.normal(jax.random.fold_in(key, 10 + R), (N, R), dtype)
        with config_context(matvec_mode="fused", matvec_fused_max_rhs=128):
            mv_f = kernel_matvec(kern, X, 0.0, 8192)
            timeit(lambda a, c: mv_f(a + c), V, f"fused matvec R={R}", iters=3)
        with config_context(matvec_mode="xla"):
            mv_x = kernel_matvec(kern, X, 0.0, 8192)
            timeit(lambda a, c: mv_x(a + c), V, f"xla   matvec R={R}", iters=3)
    sys.exit(0)

timeit(lambda a, c: kern.gram(Xb + c, a), X, "gram_xla (8192,1e5)")
sfn = agp.SqExponentialKernel.k_of_r2
timeit(lambda a, c: pallas_stationary_gram(Xb + c, a, sfn),
       X, "gram_pallas (8192,1e5)")
timeit(lambda a, c: jnp.exp(a + c), K_big, "exp_only (8192,1e5)")
timeit(lambda a, c: jnp.matmul(a + c, v, precision="highest"), K_big,
       "gemv (8192,1e5)@v")
timeit(lambda a, c: jnp.matmul(Xpad + c, a.T, precision="highest"), Zpad,
       "dist_hi (8192,128)@(128,1e5) HIGHEST")
timeit(lambda a, c: jnp.matmul(Xpad + c, a.T, precision="high"), Zpad,
       "dist_hi3 same HIGH")
timeit(lambda a, c: jnp.matmul(Xpad + c, a.T), Zpad, "dist_1p same DEFAULT")
