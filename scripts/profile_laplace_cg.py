"""Profile the matrix-free Laplace (LaplaceCG) Newton solve at N=1e5 on TPU.

VERDICT r4 item 4: the 3.2 s row was labeled "CG-iteration-bound" with no
receipts.  This breaks the solve into cost atoms and iteration counts so the
preconditioner-rank / tolerance sweep has data.

Usage: python scripts/profile_laplace_cg.py PHASE [N]
  PHASE: matvec | pc | newton-<rank>[-ladder] | prod
Phases run as separate processes so no single XLA program risks the
tunneled-worker watchdog (>2 min device-side) and compiles stay bounded.
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
from approximategps_tpu.models import iterative  # noqa: E402
from approximategps_tpu.models.laplace_cg import (  # noqa: E402
    _b_matvec,
    _b_minv,
    _b_precond,
    _k_matvec,
    newton_inner_loop_cg,
)

PHASE = sys.argv[1] if len(sys.argv) > 1 else "prod"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
BLOCK = 8192

dtype = jnp.float32
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (N, 2), dtype=dtype) * 10
y = (jax.random.uniform(jax.random.fold_in(key, 1), (N,)) > 0.5).astype(
    jnp.int32
)
lik = agp.BernoulliLikelihood()
kern = 1.5 * agp.with_lengthscale(agp.SqExponentialKernel(), 1.2)


def timed(fn, *args, warm=1, reps=2, label=""):
    for _ in range(warm):
        out = fn(*args)
        jax.block_until_ready(out)
        jax.tree_util.tree_map(
            lambda a: float(jnp.sum(jnp.asarray(a, jnp.float32))), out
        )
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda a: float(jnp.sum(jnp.asarray(a, jnp.float32))), out
        )
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1e3:.1f} ms (min of {reps})", flush=True)
    return out, min(ts)


def phase_matvec():
    @partial(jax.jit, static_argnums=(2,))
    def matvec_n(x, v, n):
        kmv = _k_matvec(kern, x, BLOCK, 0.0, "chunked")

        def body(c, _):
            return kmv(c), 0.0

        out, _ = jax.lax.scan(body, v, None, length=n)
        return jnp.sum(out)

    v0 = jnp.ones((N,), dtype)
    _, t1 = timed(matvec_n, x, v0, 1, label="matvec x1")
    _, t9 = timed(matvec_n, x, v0, 9, label="matvec x9")
    print(f"ATOM matvec (chunked, block {BLOCK}): {(t9-t1)/8*1e3:.1f} ms",
          flush=True)


def phase_pc():
    pc = jax.jit(iterative.pivoted_cholesky, static_argnums=(2,))
    for rank in (128, 512, 1024):
        timed(pc, kern, x, rank, label=f"pivoted_cholesky rank={rank}")


def newton_instrumented(precond_rank, cg_tol, max_newton=14, tol=1e-4,
                        cg_maxiter=400, ladder=None):
    @jax.jit
    def run(x, y):
        kmv = _k_matvec(kern, x, BLOCK, 0.0, "chunked")
        Lr = _b_precond(kern, x, precond_rank)

        def step(carry, i):
            f, s0, done = carry
            _ll, d_ll, d2_ll = lik.log_prob_d1_d2(f, y)
            W = -d2_ll
            Wsqrt = jnp.sqrt(W)
            b = W * f + d_ll
            Kb = kmv(b)
            bmv = _b_matvec(kmv, Wsqrt)
            tol_i = cg_tol if ladder is None else ladder(i)
            s, n_cg = iterative.cg_solve(
                bmv, Wsqrt * Kb, tol=tol_i, maxiter=cg_maxiter,
                M_inv=_b_minv(Lr, Wsqrt), x0=s0, return_info=True)
            a = b - Wsqrt * s
            fnew = kmv(a)
            nf = jnp.linalg.norm(f - fnew)
            den = jnp.maximum(jnp.linalg.norm(fnew), 1e-30)
            rel = nf / den
            newdone = jnp.logical_or(done, rel <= tol)
            fkeep = jnp.where(done, f, fnew)
            n_cg = jnp.where(done, 0, n_cg)
            return (fkeep, s, newdone), (n_cg, rel)

        (f, _, _), (cg_iters, rels) = jax.lax.scan(
            step, (jnp.zeros_like(y, dtype=x.dtype),
                   jnp.zeros_like(y, dtype=x.dtype),
                   jnp.array(False)), jnp.arange(max_newton))
        return f, cg_iters, rels

    return run


def phase_newton(rank, use_ladder):
    ladder = None
    if use_ladder:
        ladder = lambda i: jnp.where(i < 2, 1e-2,
                                     jnp.where(i < 4, 1e-4, 1e-6))
    run = newton_instrumented(rank, 1e-6, ladder=ladder)
    tag = f"rank={rank}{'+ladder' if use_ladder else ''}"
    (f, cg_iters, rels), t = timed(run, x, y, warm=1, reps=1,
                                   label=f"newton({tag})")
    ci = [int(c) for c in cg_iters if int(c) > 0]
    print(f"  {tag}: newton_steps={len(ci)} cg_iters={ci} "
          f"total_cg={sum(ci)} rels="
          f"{[f'{float(r):.1e}' for r in rels[:len(ci)]]}", flush=True)


def phase_prod():
    @jax.jit
    def prod(x, y):
        f, it = newton_inner_loop_cg(
            lik, y, kern, x, maxiter=60, tol=1e-4, cg_tol=1e-6,
            cg_maxiter=400, precond_rank=512, block_size=BLOCK,
            return_niter=True)
        return jnp.sum(f), it

    (s, it), t = timed(prod, x, y, warm=1, reps=2, label="production newton")
    print(f"production: {t*1e3:.0f} ms, newton iters={int(it)}", flush=True)


if PHASE == "matvec":
    phase_matvec()
elif PHASE == "pc":
    phase_pc()
elif PHASE.startswith("newton-"):
    parts = PHASE.split("-")
    phase_newton(int(parts[1]), len(parts) > 2 and parts[2] == "ladder")
elif PHASE == "prod":
    phase_prod()
else:
    raise SystemExit(f"unknown phase {PHASE}")
