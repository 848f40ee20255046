"""A/B: batching the independent whitened-cache pullback matmuls
(VERDICT r4 item 8 — re-baseline on the current kernel mix).

The collapsed training-path pullback (`svgp._cache_chol_cotangents`, the
6-matmul form) has exactly one independent M×M pair once `Q = J dSs Jᵀ`
exists: `L̄q = Q Lq` and `inner = −C0 Q`.  Everything else is a chain
(P → Q → {pair} → Φ → sandwich).  This stacks the pair into one (2, M, M)
batched matmul and A/Bs both the isolated pullback and the FULL headline
step (monkeypatched), to settle whether two back-to-back M=2048 matmuls
leave MXU idle time that batching recovers.

Run on the TPU chip: python scripts/ab_cache_batched.py [isolated|step]
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import chained_step_ms, headline  # noqa: E402

import approximategps_tpu as agp  # noqa: E402
from approximategps_tpu.models import svgp as svgp_mod  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "isolated"
M = 2048


def isolated():
    key = jax.random.PRNGKey(0)
    dt = jnp.float32
    J = jnp.tril(jax.random.normal(key, (M, M), dt)) / M**0.5
    Lq = jnp.tril(jax.random.normal(jax.random.fold_in(key, 1), (M, M), dt))
    C0 = jax.random.normal(jax.random.fold_in(key, 2), (M, M), dt)
    C0 = 0.5 * (C0 + C0.T)
    dS = jax.random.normal(jax.random.fold_in(key, 3), (M, M), dt) / M

    def seq(J, dS, Lq, C0):
        dSs = dS + dS.T
        P = jnp.matmul(J, dSs, precision="high")
        Q = jnp.matmul(P, J.T, precision="high")
        Lq_bar = jnp.matmul(Q, Lq, precision="high")
        inner = -jnp.matmul(C0, Q, precision="high")
        return Lq_bar, inner

    def bat(J, dS, Lq, C0):
        dSs = dS + dS.T
        P = jnp.matmul(J, dSs, precision="high")
        Q = jnp.matmul(P, J.T, precision="high")
        A = jnp.stack([Q, C0])
        B = jnp.stack([Lq, Q])
        out = jnp.matmul(A, B, precision="high")
        return out[0], -out[1]

    for name, fn in (("sequential", seq), ("batched", bat)):
        def make_run(n, fn=fn):
            @jax.jit
            def run(J, dS, Lq, C0):
                def body(c, _):
                    a, b = fn(J, dS + c * 1e-30, Lq, C0)
                    return jnp.float32(jnp.sum(a) + jnp.sum(b)) * 1e-30, 0.0
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return c
            return partial(run, J, dS, Lq, C0)

        ms = chained_step_ms(make_run, iters=8, label=f"pair:{name}")
        print(f"pair {name}: {ms:.3f} ms", flush=True)


def step():
    orig = svgp_mod._cache_chol_cotangents

    def patched(Lk, J, C0, Lq, m, cts):
        from jax.custom_derivatives import SymbolicZero

        from approximategps_tpu.config import resolve_matmul_precision
        from approximategps_tpu.core.linalg import (
            _bwd_precision, _phi, matmul_left_upper, matmul_right_lower,
            symmetrize,
        )

        dLk, dJ, dalpha, dS = cts
        if not (
            isinstance(dLk, SymbolicZero)
            and isinstance(dJ, SymbolicZero)
            and not isinstance(dS, SymbolicZero)
        ):
            return orig(Lk, J, C0, Lq, m, cts)
        prec = resolve_matmul_precision(Lq.dtype)
        bprec = _bwd_precision()
        dSs = dS + dS.T
        P = jnp.matmul(J, dSs, precision=prec)
        Q = jnp.matmul(P, J.T, precision=prec)
        out = jnp.matmul(
            jnp.stack([Q, C0]), jnp.stack([Lq, Q]), precision=bprec
        )
        Lq_bar, inner = out[0], -out[1]
        if not isinstance(dalpha, SymbolicZero):
            m_bar = jnp.matmul(J, dalpha, precision=prec)
            inner = inner - m[:, None] * m_bar[None, :]
        else:
            m_bar = jnp.zeros_like(m)
        Ph = _phi(inner)
        Kuu_bar = symmetrize(
            jnp.matmul(J.T, jnp.matmul(Ph, J, precision=bprec),
                       precision=bprec)
        )
        return Kuu_bar, Lq_bar, m_bar

    ms0, _ = headline(repeats=3)
    print(f"headline sequential: {ms0:.3f} ms", flush=True)
    svgp_mod._cache_chol_cotangents = patched
    try:
        ms1, _ = headline(repeats=3)
    finally:
        svgp_mod._cache_chol_cotangents = orig
    print(f"headline batched-pair: {ms1:.3f} ms", flush=True)


if MODE == "isolated":
    isolated()
else:
    step()
