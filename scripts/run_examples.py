#!/usr/bin/env python
"""CI example runner: executes ALL TEN examples headless on CPU at reduced
sizes, with each example's own asserts live — the analogue of the
reference's docs pipeline, which executes every example on every build
(``/root/reference/docs/make.jl:10``, ``JuliaGPsDocs.generate_examples``).

Sizes are chosen so the whole sweep stays a few CPU-minutes while keeping
every example past its own accuracy asserts (reduced N shrinks data, not
the optimization budget where the assert needs it).

Usage: python scripts/run_examples.py [a b c ...]   (default: all)
"""

import importlib
import os
import sys
import time

import jax

# CPU for CI: instant compiles, f64 available; the TPU surface is covered
# by tpu_check.  (JAX_PLATFORMS env is ignored on this stack — set the
# config before backend init, see CLAUDE.md.)
jax.config.update("jax_platforms", "cpu")

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "examples"))

# (module, kwargs) — reduced sizes; comments note the anchor for each choice
RUNS = {
    # step count (epochs*N/batch) stays near the full run's 3000 Adam steps
    # — fewer undertrains past the example's rmse<0.2 assert
    "a": ("a_regression", dict(N=2000, M=20, batch_size=100, epochs=150)),
    "b": ("b_classification", dict()),
    "c": ("c_comparisons", dict()),
    # epochs*N/batch ≈ the full run's 288 Adam steps — fewer undertrains
    # past the example's 0.3 rate-error gate
    "d": ("d_large_scale_tpu", dict(N=20_000, M=64, batch=2048, epochs=32)),
    # shorter Adam run still separates the learned noise-sd slope
    "e": ("e_heteroscedastic", dict(N=800, M=24, steps=500)),
    "f": ("f_model_selection", dict(lbfgs_iters=80)),
    "g": ("g_matrixfree", dict(N=4000, Nh=1500, Nc=2000, block=2048,
                               hyperopt_steps=5)),
    # batch 1024 keeps ~210 Adam steps at N=8000 (the full run's 360-step
    # class) — batch 4096 would mean 30 steps and miss the rmse gate
    "h": ("h_serving", dict(N=8000, M=64, Ntest=20_000, batch=1024)),
    "i": ("i_streaming", dict(N=1200, M=24, rounds=3)),
    # 80 Adam steps separate the noise sd from its 3x-off init (measured:
    # recovers 0.101 vs true 0.1); smaller side keeps the point density in
    # the local-kriging regime at reduced N
    "j": ("j_vecchia", dict(N=4000, Ntest=2000, k=16, steps=80,
                            N_small=200, side=6.0)),
}


def main(selected=None):
    import dataclasses

    from approximategps_tpu.config import config

    snapshot = dataclasses.asdict(config)
    names = selected or list(RUNS)
    for name in names:
        mod_name, kwargs = RUNS[name]
        t0 = time.time()
        mod = importlib.import_module(mod_name)
        try:
            mod.main(**kwargs)
        finally:
            # examples may set_config() globally (e.g. d's MXU gram mode)
            # — isolate them from each other
            for k, v in snapshot.items():
                setattr(config, k, v)
        print(f"--- example {name} ({mod_name}) ok in {time.time()-t0:.1f}s ---",
              flush=True)
    print(f"examples {'/'.join(names)} ok")


if __name__ == "__main__":
    main(sys.argv[1:] or None)
