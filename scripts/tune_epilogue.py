#!/usr/bin/env python
"""Per-TPU-generation tile sweep for the fused data-term epilogue.

The epilogue's (block_b, block_m) defaults were tuned on v5e; other
generations have different VMEM/MXU/HBM balances.  This sweeps the
feasible grid on the attached chip, timing one fused forward+backward per
configuration on the headline shapes (M=2048, B=8192, D=8, f32), and
prints the measured table plus the best setting to export:

    AGP_EPILOGUE_BLOCK_B=<b> AGP_EPILOGUE_BLOCK_M=<m>

Run directly on the target chip: `python scripts/tune_epilogue.py`.
"""

import sys
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import chained_step_ms  # noqa: E402

import approximategps_tpu as agp  # noqa: E402
from approximategps_tpu.ops.svgp_epilogue import (  # noqa: E402
    epilogue_supported,
    svgp_data_epilogue,
)


def main(M=2048, B=8192, D=8):
    print(f"backend: {jax.default_backend()}  shapes: M={M} B={B} D={D}")
    key = jax.random.PRNGKey(0)
    dtype = jnp.float32
    Xs = jax.random.normal(key, (B, D), dtype)
    Zs = jax.random.normal(jax.random.fold_in(key, 1), (M, D), dtype)
    S0 = jax.random.normal(jax.random.fold_in(key, 2), (M, M), dtype) / M
    Se = 0.5 * (S0 + S0.T)
    ae = jax.random.normal(jax.random.fold_in(key, 3), (M,), dtype)
    k_of_r2 = agp.SqExponentialKernel.k_of_r2

    def fwd_bwd(bb, bm):
        def loss(Xs, Zs, Se, ae):
            mu, var = svgp_data_epilogue(Xs, Zs, Se, ae, k_of_r2, bb, bm)
            return jnp.sum(mu) + jnp.sum(var)

        g = jax.grad(loss, argnums=(0, 1, 2, 3))

        def make_run(n):
            @jax.jit
            def run(Xs, Zs, Se, ae):
                def body(c, _):
                    X_, Z_, S_, a_ = c
                    gx, gz, gs, ga = g(X_, Z_, S_, a_)
                    return (X_ + 1e-20 * gx, Z_ + 1e-20 * gz,
                            S_ + 1e-20 * gs, a_ + 1e-20 * ga), 0.0
                c, _ = jax.lax.scan(body, (Xs, Zs, Se, ae), jnp.arange(n))
                return jnp.sum(c[3])
            return partial(run, Xs, Zs, Se, ae)

        return chained_step_ms(make_run, iters=20, repeats=2)

    results = []
    for bb in (512, 1024, 2048):
        for bm in (128, 256, 512):
            if not epilogue_supported(M, B, dtype, bb, bm):
                print(f"block_b={bb:5d} block_m={bm:4d}  -- VMEM-infeasible")
                continue
            try:
                ms, st = fwd_bwd(bb, bm)
            except Exception as e:  # Mosaic VMEM OOM etc.: skip, keep sweeping
                print(f"block_b={bb:5d} block_m={bm:4d}  -- compile failed "
                      f"({type(e).__name__})")
                continue
            results.append((ms, bb, bm))
            print(f"block_b={bb:5d} block_m={bm:4d}  {ms:7.3f} ms "
                  f"(min {st['min_ms']:.3f})")
    if results:
        ms, bb, bm = min(results)
        print(f"\nbest: AGP_EPILOGUE_BLOCK_B={bb} AGP_EPILOGUE_BLOCK_M={bm} "
              f"({ms:.3f} ms fwd+bwd per block)")


if __name__ == "__main__":
    main()
