"""Global configuration for approximategps_tpu.

The reference has no config system (SURVEY.md §5) — everything is keyword
arguments.  We keep that spirit: this module only holds *numerics policy*
switches that must be consistent across a whole computation (gram-matrix
implementation, Pallas kernel usage, solve strategy), not model options.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
from typing import Iterator


@dataclasses.dataclass
class _Config:
    # Pairwise-distance implementation for Gram matrices:
    #   "broadcast": exact (x - z)**2 broadcasting — best accuracy, O(N*M*D) mem
    #   "mxu":       |x|^2 + |z|^2 - 2 x z^T via matmul — MXU-friendly, fastest
    #   "pallas":    fused Pallas tile kernel (TPU only; falls back to mxu
    #                semantics in interpret mode on CPU)
    #   "auto":      broadcast for small problems, mxu/pallas for large
    gram_mode: str = os.environ.get("AGP_GRAM_MODE", "auto")
    # Problem-size threshold (N*M*D elements) above which "auto" switches from
    # broadcast to the MXU path.
    gram_auto_threshold: int = 1 << 22
    # Whether Pallas kernels may be used at all (auto-disabled off-TPU unless
    # interpret mode is forced).
    use_pallas: bool = os.environ.get("AGP_USE_PALLAS", "1") == "1"
    # Force Pallas interpret mode (useful on CPU for tests).
    pallas_interpret: bool = os.environ.get("AGP_PALLAS_INTERPRET", "0") == "1"
    # Triangular-solve strategy for the SVGP projection A = L^{-1} Kuf:
    #   "triangular": lax triangular solve (exact, used for parity tests)
    #   "inv_matmul": precompute L^{-1} once (O(M^3)), then a pure matmul —
    #                 rides the MXU for the O(M^2 N) application; also
    #                 enables the S-correction cache and the fused Pallas
    #                 data-term epilogue.
    #   "auto":       inv_matmul on TPU for f32/bf16 at M >= 512 (the
    #                 benched fast path; MXU-bound sizes), triangular
    #                 otherwise — small M is latency-trivial for triangular
    #                 AND is where casually-jittered/near-coincident
    #                 inducing points push cond(Kuu) past what an explicit
    #                 f32 inverse tolerates (example a: M=20, jitter 1e-5,
    #                 z drawn from the data — inv_matmul destroys training
    #                 while triangular degrades gracefully).
    solve_mode: str = os.environ.get("AGP_SOLVE_MODE", "auto")
    # Matmul precision for the big projection matmuls ("default", "float32",
    # "bfloat16_3x", "highest", or "auto" = "default" on TPU f32/bf16 —
    # single-pass bf16 MXU accumulate — and "highest" elsewhere).  Gram
    # distance matmuls and CG-adjacent matvecs are ALWAYS "highest"
    # regardless (PSD-ness / solver-convergence policy, see BENCH_NOTES).
    matmul_precision: str = os.environ.get("AGP_MATMUL_PRECISION", "auto")
    # SVGP data-term implementation (mu/var projection in elbo/streaming):
    #   "auto":   fused Pallas epilogue on TPU for decomposable stationary
    #             kernels with the S-correction cache; XLA otherwise
    #   "pallas": force the fused epilogue (interpret mode off-TPU)
    #   "xla":    always the XLA gram + diag_quad_sym path
    data_term_mode: str = os.environ.get("AGP_DATA_TERM_MODE", "auto")
    # (L, L⁻¹) factorization implementation for the SVGP posterior build:
    #   "auto":   fused streamed-panel Pallas kernel on TPU (f32/bf16,
    #             supported M); XLA cholesky + level-batched inverse else
    #   "pallas": force the Pallas kernel (interpret mode off-TPU)
    #   "xla":    always the XLA path
    chol_mode: str = os.environ.get("AGP_CHOL_MODE", "auto")
    # Precision of the K·V matvecs INSIDE CG iterations (iterative.py /
    # laplace_cg.py).  Measured (v5e): SINGLE-RHS matvecs are
    # precision-INSENSITIVE on TPU (GEMV takes no bf16 passes — "high" and
    # "highest" compile to bit-identical programs), so the Newton B-solve
    # is unaffected; the knob matters only for BLOCK solves (batched-CG
    # predictions, SLQ probe blocks), where the original failure was
    # measured: single-pass bf16 ("default") stalls the per-column
    # residual at ~1e-3.  "highest" (6-pass) stays the default; "high"
    # (3-pass, f32-class products) is the cheaper block-path option.
    # One-shot solve-PRODUCT applications (posterior means/covs from a
    # solved V) stay pinned at "highest" regardless: their noise lands
    # directly in the output, not in a residual the iteration re-corrects.
    cg_matvec_precision: str = os.environ.get(
        "AGP_CG_MATVEC_PRECISION", "highest")
    # Gram-fused posterior build: generate the Kuu panels INSIDE the
    # streamed-panel (L, L⁻¹) kernel (ops/panel_chol.pallas_gram_chol_inv)
    # instead of materializing Kuu in HBM first.  "auto" follows chol_mode's
    # gates; "off" keeps the separate gram + factorization.
    gram_chol: str = os.environ.get("AGP_GRAM_CHOL", "auto")
    # Glue-matmul precision for the 2×2 split (L, L⁻¹) recursion that takes
    # over beyond the Pallas panel kernel's VMEM budget (M ≥ 4096):
    # "highest" (6-pass, 1e-7-class factors), "high" (3-pass, 4e-6 — the
    # measured speed/accuracy Pareto point, default), "default" (bf16,
    # 1e-3 — can break PSD-ness for sharp grams).  See
    # linalg._chol_inv_split for the measured triple.
    chol_split_precision: str = os.environ.get("AGP_CHOL_SPLIT_PRECISION",
                                               "high")
    # Storage dtype for the large O(M·B) projection intermediates (Kuf, A,
    # BᵀA) in the SVGP data-term path:
    #   "auto":     bf16 storage on TPU for f32 inputs at
    #               M >= tri_matmul_min_m (where the projections' HBM
    #               traffic floors the step: M=8192 80.0 → 74.9 ms; a wash
    #               at M=2048 — measured A/B), f32 otherwise (default)
    #   "float32":  full-width storage everywhere
    #   "bfloat16": bf16 storage with f32 MXU accumulation at ANY size —
    #               halves the HBM traffic of the step's biggest tensors;
    #               master params, factorizations, KL and all reductions
    #               stay f32.  Accuracy class 1e-3 relative
    #               (test_bf16_compute_dtype_accuracy).
    compute_dtype: str = os.environ.get("AGP_COMPUTE_DTYPE", "auto")
    # Smallest M at which the chol/inv pullback switches its Φ-sandwich to
    # triangular-aware narrowing block matmuls (core/linalg.py
    # matmul_left_upper & co — skip ~44% of the flops at nb=8).  At small M
    # the extra launches/concats wash the saving out.
    tri_matmul_min_m: int = int(os.environ.get("AGP_TRI_MATMUL_MIN_M", "4096"))
    # Smallest M at which compute_dtype="auto" downgrades the O(M·B)
    # projection-intermediate STORAGE to bf16 on TPU f32 (1e-3 relative
    # accuracy class — a production-numerics switch, so it gets its own
    # knob rather than riding tri_matmul_min_m, the triangular-matmul FLOP
    # gate; the two defaults coincide because the measured crossovers do:
    # M=8192 wins 80.0 → 74.9 ms, M=2048 is a wash — ADVICE r4).
    bf16_storage_min_m: int = int(
        os.environ.get("AGP_BF16_STORAGE_MIN_M", "4096"))
    # Fused data-term epilogue tile sizes (ops/svgp_epilogue.py).  Tuned on
    # v5e (see scripts/tune_epilogue.py for the per-generation sweep); the
    # VMEM working set scales with both, so epilogue_supported() gates on
    # the chosen values.
    epilogue_block_b: int = int(os.environ.get("AGP_EPILOGUE_BLOCK_B", "1024"))
    epilogue_block_m: int = int(os.environ.get("AGP_EPILOGUE_BLOCK_M", "256"))
    # Largest M for which the posterior build forms the S-correction matrix
    # S = Lk⁻ᵀ(BBᵀ−I)Lk⁻¹ (and with it the fused whitened-cache composite
    # and the Pallas data-term epilogue).  S_corr trades a one-time
    # 6M³-flop build (plus a ~9-matmul M³ pullback) for one fewer (M, B)
    # projection per variance evaluation — a win while M ≲ 0.4·B (measured
    # crossover at B=8192: M=2048 step 3.9 ms with vs 5.1 without; M=8192
    # step 146.8 ms with vs 130.8 without — the M³ terms dominate there).
    # Raise it (or set very large) for streaming/serving workloads that
    # amortize one posterior over many blocks, where S_corr always wins.
    s_corr_max_m: int = int(os.environ.get("AGP_S_CORR_MAX_M", "4096"))
    # Default jitter added to Kuu/Kff diagonals when the user passes none.
    default_jitter: float = 1e-8
    # Matrix-free tier storage policy: N at or below this materializes the
    # N×N Gram ONCE per solve and reuses it across all CG iterations (the
    # BBMM "K-resident" tier — at N=24576 that is 2.4 GB f32 in HBM, and
    # each matvec stops re-evaluating N² kernel entries); above it, chunked
    # matvecs keep memory O(N·block).
    cg_dense_threshold: int = int(os.environ.get("AGP_CG_DENSE_N", "24576"))
    # Single-RHS kernel-matvec tier (ops/gram_matvec.py): "auto" fuses
    # gram + map + reduce in one Pallas pass on TPU f32/bf16 when the
    # kernel unwraps to a scaled parameter-free stationary map with D ≤ 8
    # (the chunked XLA path's per-block cost is dominated by the 128-padded
    # HIGHEST distance matmul — 64× wasted MXU work at D=2); "fused" forces
    # it (interpret mode off-TPU — test use), "xla" disables.
    matvec_mode: str = os.environ.get("AGP_MATVEC_MODE", "auto")
    # Widest multi-RHS block the fused gram matvec accepts before falling
    # back to the XLA block path.  The fused kernel's per-RHS increment is
    # one VPU lane-reduction over the shared r²/transcendental tile
    # (~1.6 ms per RHS at N=1e5/D=2) while the XLA path is gram-build
    # bound and ~flat in R — measured crossover ≈ R 32-48; probe-blocked
    # SLQ (R=16) and block-CG probes sit well inside it.
    matvec_fused_max_rhs: int = int(os.environ.get("AGP_MATVEC_MAX_RHS", "32"))


config = _Config()


def _is_fast_dtype(dtype) -> bool:
    """True for the production dtypes (f32/bf16) where the TPU fast path is
    both safe and benched; f64 oracle mode keeps the exact paths."""
    import jax.numpy as jnp

    return dtype is None or jnp.dtype(dtype) in (
        jnp.dtype(jnp.float32),
        jnp.dtype(jnp.bfloat16),
    )


def resolve_solve_mode(dtype=None, size=None) -> str:
    """The effective solve_mode: "auto" becomes "inv_matmul" on TPU for
    f32/bf16 at MXU-bound sizes (``size`` = M, the inducing-point count;
    S-correction cache + fused epilogue + matmul-only projection — the
    benched headline configuration) and "triangular" otherwise, so `elbo`
    users get the fast path without touching the config (VERDICT r2 item 3).

    The M >= 512 gate is a robustness/perf Pareto point, not a perf
    crossover alone: below it triangular solves are latency-trivial, and
    small-M problems are exactly where near-coincident inducing points
    (e.g. z initialized from the data) push cond(Kuu) past what an
    explicit f32 triangular inverse tolerates — measured on example a
    (M=20, jitter 1e-5): inv_matmul training diverges (ELBO oscillates at
    1e6 scale, final RMSE 0.45/0.25 on TPU/CPU f32) while triangular
    converges to RMSE 0.097."""
    mode = config.solve_mode
    if mode != "auto":
        return mode
    import jax

    if (
        jax.default_backend() == "tpu"
        and _is_fast_dtype(dtype)
        and (size is None or size >= 512)
    ):
        return "inv_matmul"
    return "triangular"


def resolve_matmul_precision(dtype=None) -> str:
    """The effective projection-matmul precision: "auto" becomes "default"
    (single-pass bf16 accumulate, ~88% of MXU peak) on TPU for f32/bf16 and
    "highest" otherwise."""
    prec = config.matmul_precision
    if prec != "auto":
        return prec
    import jax

    if jax.default_backend() == "tpu" and _is_fast_dtype(dtype):
        return "default"
    return "highest"


def set_config(**kwargs) -> None:
    for k, v in kwargs.items():
        if not hasattr(config, k):
            raise AttributeError(f"unknown config key: {k}")
        setattr(config, k, v)


@contextlib.contextmanager
def config_context(**kwargs) -> Iterator[None]:
    old = {k: getattr(config, k) for k in kwargs}
    set_config(**kwargs)
    try:
        yield
    finally:
        set_config(**old)
