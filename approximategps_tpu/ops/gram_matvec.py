"""Fused Pallas gram·v matvec for stationary kernels: ``out = K(Xq, Zk) @ v``
with ``K_ij = g(||x_i − z_j||²)`` computed tile-by-tile in VMEM and reduced
against ``v`` in-register — K never touches HBM.

Why this beats the chunked XLA matvec (``kernel_matvec``'s per-block
``gram → @ v``): profiling at N=1e5, D=2 (scripts/profile_matvec_atoms.py)
shows the XLA block cost (8.2 ms per (8192, 1e5) block) is dominated by the
PAD-TO-128 HIGHEST-precision distance matmul (7.4 ms) — for spatial D the
MXU does 128/D × wasted work, and the elementwise exp is only 4.4 ms.  Here
the squared distance is a static unrolled VPU broadcast over the D
coordinates ((tm,1) − (1,tn), exact subtraction — no |x|² cancellation, no
centering needed), so the whole tile costs ~the transcendental map, and the
(N, M) intermediate never round-trips HBM.

Small-R multi-RHS is fused too (R ≤ ``config.matvec_fused_max_rhs``): the
XLA block path's cost is gram-build-dominated and roughly FLAT in R (the
distance matmul already pays 128 padded lanes), while the fused kernel's
per-RHS increment is one lane-reduction (~1.6 ms per RHS at N=1e5) on top
of the shared r²/transcendental tile — measured crossover ≈ R 32-48 at
D=2.  Probe-blocked SLQ Lanczos recurrences (R=16) and block-CG solves
land squarely in the fused regime; wide solves (Matheron path samples,
batched predictions) stay on the XLA path where one gram serves all
columns.  This is the TPU-native replacement for the matvec layer under
GPyTorch-style BBMM solves (SURVEY.md §2.2 iterative tier; reference
scope is dense-only — this tier is beyond-reference).

Differentiable via a custom VJP built from the same fused primitive:
``v̄`` is the transposed fused matvec, and the input cotangents use the
rank-1 structure of ``W = ō vᵀ ∘ g'(r²)``:

    X̄q = 2 ō ∘ (P_{g'}(Xq,Zk,v) ∘ Xq − P_{g'}(Xq,Zk, v∘Zk)),

i.e. one fused multi-RHS pass with the derivative map g' and (1+D) RHS —
still no (N, M) materialization on the backward.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config

__all__ = ["pallas_gram_matvec", "fused_stationary_matvec"]

_MAX_D = 8  # coordinates ride sublanes of an (8, M) transposed layout


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@lru_cache(maxsize=None)
def _grad_map(fn: Callable) -> Callable:
    """Elementwise derivative map g'(r²) of a static kernel map, itself a
    static function (lru-cached on the map's identity so jit caches stay
    warm across calls)."""

    def dfn(r2):
        return jax.jvp(fn, (r2,), (jnp.ones_like(r2),))[1]

    dfn.__name__ = "d_" + getattr(fn, "__name__", "k_of_r2")
    return dfn


def _gmv_kernel(x_ref, zt_ref, vt_ref, o_ref, acc_ref, *, k_map, D, R):
    """One (tile_m, tile_n) tile: r² by unrolled VPU broadcast over the D
    coordinates, the kernel map in-register, then R lane-reductions against
    v's rows, accumulated across the j grid axis in VMEM scratch."""
    j = pl.program_id(1)
    acc_t = acc_ref.dtype

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tm = x_ref.shape[0]
    tn = zt_ref.shape[1]
    r2 = jnp.zeros((tm, tn), acc_t)
    for d in range(D):
        xd = x_ref[:, d : d + 1].astype(acc_t)  # (tm, 1)
        zd = zt_ref[d : d + 1, :].astype(acc_t)  # (1, tn)
        diff = xd - zd
        r2 = r2 + diff * diff
    k = k_map(r2)

    lanes = o_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    upd = jnp.zeros((tm, lanes), acc_t)
    for r in range(R):
        vr = vt_ref[r : r + 1, :].astype(acc_t)  # (1, tn)
        pr = jnp.sum(k * vr, axis=1, keepdims=True)  # (tm, 1)
        upd = upd + jnp.where(lane == r, pr, jnp.zeros_like(pr))
    acc_ref[:] += upd

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _forward_multi(Xq, Zk, V, k_map, tile_m, tile_n):
    """out[i, r] = Σ_j g(||x_i − z_j||²) V[j, r]; V (M,) or (M, R ≤ 128).

    Padded Zk rows are harmless without masking: stationary maps are finite
    at any r² and the padded V entries are exact zeros."""
    N, D = Xq.shape
    M = Zk.shape[0]
    if D > _MAX_D:
        raise ValueError(f"fused gram-matvec supports D <= {_MAX_D}, got {D}")
    vec = V.ndim == 1
    V2 = V[:, None] if vec else V
    R = V2.shape[1]
    if R > 128:
        raise ValueError(f"fused gram-matvec supports R <= 128, got {R}")

    acc = jnp.promote_types(Xq.dtype, jnp.float32)
    tile_m = min(tile_m, _round_up(N, 8))
    tile_n = min(tile_n, _round_up(M, 128))
    Np = _round_up(N, tile_m)
    Mp = _round_up(M, tile_n)
    Rs = _round_up(R, 8)

    Xp = jnp.zeros((Np, 128), Xq.dtype).at[:N, :D].set(Xq)
    Zt = jnp.zeros((_MAX_D, Mp), Zk.dtype).at[:D, :M].set(Zk.T)
    Vt = jnp.zeros((Rs, Mp), Xq.dtype).at[:R, :M].set(V2.T.astype(Xq.dtype))

    interpret = config.pallas_interpret or jax.default_backend() != "tpu"
    out = pl.pallas_call(
        partial(_gmv_kernel, k_map=k_map, D=D, R=R),
        grid=(Np // tile_m, Mp // tile_n),
        in_specs=[
            pl.BlockSpec((tile_m, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((_MAX_D, tile_n), lambda i, j: (0, j)),
            pl.BlockSpec((Rs, tile_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tile_m, 128), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, 128), Xq.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, 128), acc)],
        interpret=interpret,
    )(Xp, Zt, Vt)
    out = out[:N, :R]
    return out[:, 0] if vec else out


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def pallas_gram_matvec(
    Xq: jax.Array,
    Zk: jax.Array,
    v: jax.Array,
    k_of_r2: Callable,
    tile_m: int = 512,
    tile_n: int = 2048,
) -> jax.Array:
    """``out_i = Σ_j g(||x_i − z_j||²) v_j`` without materializing K.

    Xq (N, D ≤ 8), Zk (M, D), v (M,) or (M, R ≤ 128) → (N,) / (N, R).
    ``k_of_r2`` must be a static parameter-free map (staticmethod — see
    ``unwrap_stationary``); fold lengthscales into the inputs and variance
    onto the output.  Reverse-mode differentiable w.r.t. Xq, Zk, v (fused
    backward — see module docstring); forward-mode (jvp) is not supported,
    use the XLA path for that."""
    return _forward_multi(Xq, Zk, v, k_of_r2, tile_m, tile_n)


def _gmv_fwd(Xq, Zk, v, k_of_r2, tile_m, tile_n):
    return _forward_multi(Xq, Zk, v, k_of_r2, tile_m, tile_n), (Xq, Zk, v)


def _coord_cotangent(Q, Zk, V2, O2, dfn, tile_m, tile_n):
    """Q̄ for out = K(Q, Zk) V through the rank-R structure of
    W = (Σ_r ō_r v_rᵀ) ∘ g'(r²):

        Q̄_i = 2 (s_i ∘ q_i − U_i),   s_i = Σ_j W_ij,   U_id = Σ_j W_ij z_jd,

    both reduced through fused g' passes with RHS blocks [V_c, V_c∘z_d]
    ((1+D)·c columns per chunk, chunked so each pallas call stays ≤ 128
    RHS), then contracted against ō columnwise — no (N, M) intermediate at
    any R."""
    D = Q.shape[1]
    R = V2.shape[1]
    acc = jnp.promote_types(Q.dtype, jnp.float32)
    rc = max(1, 128 // (1 + D))
    s = jnp.zeros((Q.shape[0],), acc)
    U = jnp.zeros(Q.shape, acc)
    for r0 in range(0, R, rc):
        Vc = V2[:, r0 : r0 + rc]
        Oc = O2[:, r0 : r0 + rc].astype(acc)
        c = Vc.shape[1]
        cols = jnp.concatenate(
            [Vc] + [Vc * Zk[:, d : d + 1] for d in range(D)], axis=1
        )
        SU = _forward_multi(Q, Zk, cols, dfn, tile_m, tile_n).astype(acc)
        s = s + jnp.sum(Oc * SU[:, :c], axis=1)
        U = U + jnp.stack(
            [
                jnp.sum(Oc * SU[:, (1 + d) * c : (2 + d) * c], axis=1)
                for d in range(D)
            ],
            axis=1,
        )
    return (2.0 * (s[:, None] * Q.astype(acc) - U)).astype(Q.dtype)


def _gmv_bwd(k_of_r2, tile_m, tile_n, res, obar):
    Xq, Zk, v = res
    dfn = _grad_map(k_of_r2)
    vec = v.ndim == 1
    V2 = v[:, None] if vec else v
    O2 = obar[:, None] if vec else obar
    # v̄ = Kᵀ ō: the transposed fused matvec (g is symmetric in its args)
    vbar = _forward_multi(Zk, Xq, O2, k_of_r2, tile_m, tile_n)
    Xqbar = _coord_cotangent(Xq, Zk, V2, O2, dfn, tile_m, tile_n)
    # Z̄k: the same contraction with query/key roles (and V ↔ ō) swapped
    Zkbar = _coord_cotangent(Zk, Xq, O2, V2, dfn, tile_m, tile_n)
    return Xqbar, Zkbar, (vbar[:, 0] if vec else vbar)


pallas_gram_matvec.defvjp(_gmv_fwd, _gmv_bwd)


def _any_batch_tracer(*vals) -> bool:
    from jax._src.interpreters.batching import BatchTracer

    leaves = jax.tree_util.tree_leaves(vals)
    return any(isinstance(l, BatchTracer) for l in leaves)


def fused_stationary_matvec(kernel, X: jax.Array):
    """Dispatch helper for :func:`~approximategps_tpu.models.iterative.kernel_matvec`:
    returns ``fused(v) -> K(X,X) @ v  |  None`` or None if the kernel/config
    does not qualify.

    Qualifies when ``config.matvec_mode`` is "fused", or "auto" on a TPU
    backend with f32/bf16 inputs (off-TPU Pallas would run in interpret
    mode — tests opt in with ``matvec_mode="fused", pallas_interpret=True``),
    AND the kernel unwraps to a scaled parameter-free stationary map with
    D ≤ 8 input dims.  The returned closure accepts (N,) vectors and
    (N, R) blocks up to ``config.matvec_fused_max_rhs`` columns (wider
    blocks return None → XLA, where one gram amortizes across all
    columns).  It also returns None for a batched (vmap-traced) ``v`` or
    kernel: under vmap the XLA block path shares one gram across the
    batch (efficient), while Pallas batching would recompute it per batch
    element."""
    mode = getattr(config, "matvec_mode", "auto")
    if mode == "xla" or not config.use_pallas:
        return None
    if X.ndim != 2 or X.shape[1] > _MAX_D:
        return None
    if mode == "auto" and not (
        jax.default_backend() == "tpu"
        and X.dtype in (jnp.float32, jnp.bfloat16)
    ):
        return None
    from ..core.kernels import unwrap_stationary

    uw = unwrap_stationary(kernel)
    if uw is None:
        return None
    fn, scale, variance = uw
    if _any_batch_tracer(kernel, X):
        return None
    Xs = X if scale is None else X * scale

    max_rhs = int(getattr(config, "matvec_fused_max_rhs", 32))

    def fused(v):
        if v.ndim not in (1, 2) or _any_batch_tracer(v):
            return None
        if v.ndim == 2 and v.shape[1] > max_rhs:
            return None
        out = pallas_gram_matvec(Xs, Xs, v, fn)
        return out if variance is None else variance * out

    return fused
