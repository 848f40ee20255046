"""Batched small-Cholesky + solve Pallas kernel (the Vecchia hot op).

Computes, for a batch of B independent k×k PSD systems (k ≤ ~64):

    L_b = chol(Kw_b);  w = L⁻¹ kni;  b_row = L⁻ᵀ w;
    F   = kdiag − kni·b_row;  uband_b = [−b_row·F^{−1/2}, F^{−1/2}]

fused in one VMEM pass — the factorization, both triangular solves and the
band-row assembly never round-trip to HBM (XLA's batched cholesky + two
batched triangular_solves are three separate HBM-bound kernels).

Data layout: inside the kernel the batch lives on the *lane* dimension
(arrays shaped (k, k, Bt) / (k, Bt)), so each of the k unrolled column steps
is a fully lane-parallel VPU op; k is static and small, so the unrolled
masked-column Cholesky is ~k vector ops per column.

This is the "batched-small-Cholesky design" called out in BASELINE.json
config #4 (Vecchia N=1e6, k=32) and SURVEY.md §2.2 (sparse-banded row).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config

__all__ = [
    "batched_chol_solve_band",
    "batched_chol_solve_band_unrolled",
    "masked_chol_solve_band_math",
    "masked_chol_solve_band_math_lane",
    "pallas_vecchia_band",
    "pallas_vecchia_band_lanes",
    "pallas_vecchia_band_lanes_t",
]


def masked_chol_solve_band_math(A, c, kdiag, unroll: bool = True):
    """Masked-column batched Cholesky + solves + band assembly.

    A: (Bt, k, k), c: (Bt, k), kdiag: (Bt,) → (Bt, k+1) band rows.

    Batch-leading layout throughout: every step is a lane reduction or a
    broadcast over the trailing k axis — no transposes, gathers, scatters or
    dynamic slices.  Shared by the Pallas kernel (``unroll=True``: straight
    Python loops) and the plain-XLA path (``unroll=False``: ``lax.fori_loop``
    over columns, keeping the graph small enough to compile fast inside
    vmap/map/scan nests).  Either way it vastly outperforms XLA's
    dynamic-slice cholesky expander for small k."""
    k = A.shape[-1]
    t_row = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)  # (1, k) lane ids

    def onehot(j):  # (1, k) float one-hot on the lane axis
        return (t_row == j).astype(A.dtype)

    def loop(lo, hi, body, init, reverse=False):
        if unroll:
            rng = range(lo, hi)
            if reverse:
                rng = reversed(rng)
            out = init
            for j in rng:
                out = body(j, out)
            return out
        if reverse:
            return jax.lax.fori_loop(
                lo, hi, lambda j, o: body(hi - 1 - (j - lo), o), init
            )
        return jax.lax.fori_loop(lo, hi, body, init)

    # --- Cholesky (masked-column) ---
    def chol_step(j, carry):
        L, defl = carry
        lj = jnp.sum(L * onehot(j)[:, :, None], axis=1)  # (Bt, k_t): L[:, j, :]
        mask_t = (t_row < j).astype(A.dtype)  # (1, k)
        # s_i = Σ_{t<j} L[i,t]·L[j,t]
        s = jnp.sum(L * (lj * mask_t)[:, None, :], axis=2)  # (Bt, k_i)
        # d = A[j,j] − s[j], extracted with one-hot lane reductions
        Aj = jnp.sum(A * onehot(j)[:, :, None], axis=1)  # (Bt, k): A[:, j, :]
        Ajj = jnp.sum(Aj * onehot(j), axis=1)
        d_raw = Ajj - jnp.sum(s * onehot(j), axis=1)
        # pivot floor: near-singular neighbor Grams (densely-spaced points)
        # cancel below working precision — clamp relative to the diagonal
        fl = 8.0 * jnp.finfo(A.dtype).eps * jnp.abs(Ajj)
        d = jnp.maximum(d_raw, fl)
        # modified-Cholesky deflation: a floored pivot means the column is
        # numerically dependent on its predecessors — zero its off-diagonal
        # entries, otherwise rsqrt(floor)-scaled columns compound through the
        # later steps and overflow f32 (Inf − Inf → NaN)
        notc = (d_raw >= fl).astype(A.dtype)
        inv_ljj = jax.lax.rsqrt(d)
        Acol = jnp.sum(A * onehot(j)[:, None, :], axis=2)  # (Bt, k_i): A[:, :, j]
        col = (Acol - s) * (inv_ljj * notc)[:, None]  # (Bt, k_i)
        i_gt_j = (t_row > j).astype(A.dtype)  # (1, k) over i
        new_col = col * i_gt_j + onehot(j) * (1.0 / inv_ljj)[:, None]
        L = L + new_col[:, :, None] * onehot(j)[:, None, :]
        defl = defl + onehot(j) * (1.0 - notc)[:, None]
        return L, defl

    L, defl = loop(0, k, chol_step, (jnp.zeros_like(A), jnp.zeros_like(c)))
    live = 1.0 - defl  # (Bt, k): 0 on deflated (dependent) coordinates
    Ldiag = jnp.sum(L * jnp.eye(k, dtype=A.dtype)[None, :, :], axis=2)  # (Bt, k)

    # deflated coordinates carry no information: their w/b entries are
    # forced to 0 instead of dividing by the floored pivot
    # --- forward solve w = L⁻¹ c ---
    def fwd_step(i, w):
        mask_t = (t_row < i).astype(A.dtype)
        Li = jnp.sum(L * onehot(i)[:, :, None], axis=1)  # (Bt, k): L[:, i, :]
        s = jnp.sum(Li * w * mask_t, axis=1)  # (Bt,)
        ci = jnp.sum(c * onehot(i), axis=1)
        di = jnp.sum(Ldiag * onehot(i), axis=1)
        li = jnp.sum(live * onehot(i), axis=1)
        return w + onehot(i) * (li * (ci - s) / di)[:, None]

    w = loop(0, k, fwd_step, jnp.zeros_like(c))

    # --- backward solve b = L⁻ᵀ w ---  (L[t, i] = column i of L)
    def bwd_step(i, b):
        mask_t = (t_row > i).astype(A.dtype)
        Lcol_i = jnp.sum(L * onehot(i)[:, None, :], axis=2)  # (Bt, k_t): L[:, t, i]
        s = jnp.sum(Lcol_i * b * mask_t, axis=1)  # (Bt,)
        wi = jnp.sum(w * onehot(i), axis=1)
        di = jnp.sum(Ldiag * onehot(i), axis=1)
        li = jnp.sum(live * onehot(i), axis=1)
        return b + onehot(i) * (li * (wi - s) / di)[:, None]

    b = loop(0, k, bwd_step, jnp.zeros_like(c), reverse=True)

    # --- conditional variance + band row ---
    F = kdiag - jnp.sum(c * b, axis=1)  # (Bt,)
    # relative floor: the exact F can sit below the cancellation noise of the
    # working precision for densely-spaced points (F/kdiag < ~8·eps), which
    # would turn rsqrt into NaN; the floor is ~1.8e-15·kdiag in f64 (inert
    # for the oracle tests) and ~1e-6·kdiag in f32
    eps = jnp.finfo(A.dtype).eps
    F = jnp.maximum(F, 8.0 * eps * kdiag)
    inv_sqrt_F = jax.lax.rsqrt(F)
    row = -b * inv_sqrt_F[:, None]  # (Bt, k)
    return jnp.concatenate([row, inv_sqrt_F[:, None]], axis=1)  # (Bt, k+1)


def masked_chol_solve_band_math_lane(A, c, kdiag):
    """Mosaic-safe variant of :func:`masked_chol_solve_band_math`: every
    matrix extraction is a LANE (last-axis) reduction — Mosaic cannot lower
    rank-3 reductions over the middle axis, so row accesses go through a
    transposed copy ``LT`` maintained alongside ``L`` (A itself is symmetric,
    so its rows come from its columns).  Column loops are ``fori_loop``s,
    keeping compile time flat in k."""
    k = A.shape[-1]
    t_row = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)  # (1, k) lane ids

    def onehot(j):
        return (t_row == j).astype(A.dtype)

    def chol_step(j, carry):
        L, LT, defl = carry
        oh = onehot(j)
        # row j of L = column j of LT  (lane reduction)
        lj = jnp.sum(LT * oh[:, None, :], axis=2)  # (Bt, k)
        mask_t = (t_row < j).astype(A.dtype)
        s = jnp.sum(L * (lj * mask_t)[:, None, :], axis=2)  # (Bt, k_i)
        # A is symmetric: row j == column j
        Aj = jnp.sum(A * oh[:, None, :], axis=2)  # (Bt, k)
        Ajj = jnp.sum(Aj * oh, axis=1)
        d_raw = Ajj - jnp.sum(s * oh, axis=1)
        fl = 8.0 * jnp.finfo(A.dtype).eps * jnp.abs(Ajj)
        d = jnp.maximum(d_raw, fl)
        notc = (d_raw >= fl).astype(A.dtype)  # deflate floored pivots
        inv_ljj = jax.lax.rsqrt(d)
        col = (Aj - s) * (inv_ljj * notc)[:, None]
        i_gt_j = (t_row > j).astype(A.dtype)
        new_col = col * i_gt_j + oh * (1.0 / inv_ljj)[:, None]  # (Bt, k_i)
        L = L + new_col[:, :, None] * oh[:, None, :]
        LT = LT + oh[:, :, None] * new_col[:, None, :]
        defl = defl + oh * (1.0 - notc)[:, None]
        return L, LT, defl

    L, LT, defl = jax.lax.fori_loop(
        0, k, chol_step,
        (jnp.zeros_like(A), jnp.zeros_like(A), jnp.zeros_like(c)),
    )
    live = 1.0 - defl
    Ldiag = jnp.sum(L * jnp.eye(k, dtype=A.dtype)[None, :, :], axis=2)

    def fwd_step(i, w):
        oh = onehot(i)
        mask_t = (t_row < i).astype(A.dtype)
        Li = jnp.sum(LT * oh[:, None, :], axis=2)  # row i of L
        s = jnp.sum(Li * w * mask_t, axis=1)
        ci = jnp.sum(c * oh, axis=1)
        di = jnp.sum(Ldiag * oh, axis=1)
        li = jnp.sum(live * oh, axis=1)
        return w + oh * (li * (ci - s) / di)[:, None]

    w = jax.lax.fori_loop(0, k, fwd_step, jnp.zeros_like(c))

    def bwd_step(jj, b):
        i = k - 1 - jj
        oh = onehot(i)
        mask_t = (t_row > i).astype(A.dtype)
        Lcol_i = jnp.sum(L * oh[:, None, :], axis=2)  # column i of L
        s = jnp.sum(Lcol_i * b * mask_t, axis=1)
        wi = jnp.sum(w * oh, axis=1)
        di = jnp.sum(Ldiag * oh, axis=1)
        li = jnp.sum(live * oh, axis=1)
        return b + oh * (li * (wi - s) / di)[:, None]

    b = jax.lax.fori_loop(0, k, bwd_step, jnp.zeros_like(c))

    F = kdiag - jnp.sum(c * b, axis=1)
    eps = jnp.finfo(A.dtype).eps
    F = jnp.maximum(F, 8.0 * eps * kdiag)
    inv_sqrt_F = jax.lax.rsqrt(F)
    row = -b * inv_sqrt_F[:, None]
    return jnp.concatenate([row, inv_sqrt_F[:, None]], axis=1)


def _masked_chol_factor(A, unroll: bool = True):
    """The masked-column Cholesky of :func:`masked_chol_solve_band_math`
    alone: A (Bt, k, k) → (L, Ldiag, live) with the same relative pivot
    floors and modified-Cholesky deflation.  Batch-leading layout, unrolled
    (or fori_loop) column steps — the fast path on TPU where XLA's
    dynamic-slice batched-cholesky expander is orders of magnitude slower."""
    k = A.shape[-1]
    t_row = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def onehot(j):
        return (t_row == j).astype(A.dtype)

    def chol_step(j, carry):
        L, defl = carry
        lj = jnp.sum(L * onehot(j)[:, :, None], axis=1)
        mask_t = (t_row < j).astype(A.dtype)
        s = jnp.sum(L * (lj * mask_t)[:, None, :], axis=2)
        Aj = jnp.sum(A * onehot(j)[:, :, None], axis=1)
        Ajj = jnp.sum(Aj * onehot(j), axis=1)
        d_raw = Ajj - jnp.sum(s * onehot(j), axis=1)
        fl = 8.0 * jnp.finfo(A.dtype).eps * jnp.abs(Ajj)
        d = jnp.maximum(d_raw, fl)
        notc = (d_raw >= fl).astype(A.dtype)
        inv_ljj = jax.lax.rsqrt(d)
        Acol = jnp.sum(A * onehot(j)[:, None, :], axis=2)
        col = (Acol - s) * (inv_ljj * notc)[:, None]
        i_gt_j = (t_row > j).astype(A.dtype)
        new_col = col * i_gt_j + onehot(j) * (1.0 / inv_ljj)[:, None]
        L = L + new_col[:, :, None] * onehot(j)[:, None, :]
        defl = defl + onehot(j) * (1.0 - notc)[:, None]
        return L, defl

    zeros_c = jnp.zeros(A.shape[:2], A.dtype)
    if unroll:
        carry = (jnp.zeros_like(A), zeros_c)
        for j in range(k):
            carry = chol_step(j, carry)
        L, defl = carry
    else:
        L, defl = jax.lax.fori_loop(
            0, k, chol_step, (jnp.zeros_like(A), zeros_c)
        )
    live = 1.0 - defl
    Ldiag = jnp.sum(L * jnp.eye(k, dtype=A.dtype)[None, :, :], axis=2)
    return L, Ldiag, live


def _masked_spd_solve(factor, c):
    """A⁻¹ c from a :func:`_masked_chol_factor` result, c (Bt, k) — the
    forward+backward substitutions of :func:`masked_chol_solve_band_math`
    (deflated coordinates forced to zero), unrolled."""
    L, Ldiag, live = factor
    k = L.shape[-1]
    t_row = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def onehot(j):
        return (t_row == j).astype(L.dtype)

    w = jnp.zeros_like(c)
    for i in range(k):
        mask_t = (t_row < i).astype(L.dtype)
        Li = jnp.sum(L * onehot(i)[:, :, None], axis=1)
        s = jnp.sum(Li * w * mask_t, axis=1)
        ci = jnp.sum(c * onehot(i), axis=1)
        di = jnp.sum(Ldiag * onehot(i), axis=1)
        li = jnp.sum(live * onehot(i), axis=1)
        w = w + onehot(i) * (li * (ci - s) / di)[:, None]

    b = jnp.zeros_like(c)
    for i in reversed(range(k)):
        mask_t = (t_row > i).astype(L.dtype)
        Lcol_i = jnp.sum(L * onehot(i)[:, None, :], axis=2)
        s = jnp.sum(Lcol_i * b * mask_t, axis=1)
        wi = jnp.sum(w * onehot(i), axis=1)
        di = jnp.sum(Ldiag * onehot(i), axis=1)
        li = jnp.sum(live * onehot(i), axis=1)
        b = b + onehot(i) * (li * (wi - s) / di)[:, None]
    return b


def _kernel(kw_ref, kni_ref, kdiag_ref, out_ref, *, k: int, unroll: bool):
    # kw_ref: (Bt, k, k); kni_ref: (Bt, k); kdiag_ref: (Bt, 1); out: (Bt, k+1)
    # compute in the input dtype, promoted to at least f32 (bf16 inputs
    # accumulate in f32 on the VPU; f64 inputs — CPU interpret/oracle mode —
    # keep full precision instead of silently dropping to f32)
    cdt = jnp.promote_types(kw_ref.dtype, jnp.float32)
    args = (
        kw_ref[:].astype(cdt),
        kni_ref[:].astype(cdt),
        kdiag_ref[:, 0].astype(cdt),
    )
    if unroll:
        out = masked_chol_solve_band_math(*args, unroll=True)
    else:
        out = masked_chol_solve_band_math_lane(*args)
    out_ref[:] = out.astype(out_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def batched_chol_solve_band(
    Kw: jax.Array, kni: jax.Array, kdiag: jax.Array, block: int = 256,
    unroll: bool = False,
) -> jax.Array:
    """Fused batched (chol, solve, F, band-row) for the Vecchia construction.

    Kw: (B, k, k) masked neighbor Grams; kni: (B, k); kdiag: (B,).
    Returns Uband rows (B, k+1): [−(Kw⁻¹kni)·F^{−1/2}, F^{−1/2}].

    ``unroll=False`` (default) runs the three column loops as in-kernel
    ``fori_loop``s — Mosaic compiles this in seconds at any k, fixing the
    round-1 blocker where the fully unrolled k=32 body took impractically
    long to compile.  ``unroll=True`` restores the straight-line body.

    Differentiable via closed-form pullbacks (batched solves on the backward
    pass — see ``_band_bwd``)."""
    return _band_forward(Kw, kni, kdiag, block, unroll)


def _band_forward(Kw, kni, kdiag, block, unroll=False):
    B, k, _ = Kw.shape
    out_dtype = Kw.dtype
    block = min(block, B)
    pad = (-B) % block
    if pad:
        # identity systems in the padding keep the math defined
        eye = jnp.broadcast_to(jnp.eye(k, dtype=Kw.dtype), (pad, k, k))
        Kw = jnp.concatenate([Kw, eye], axis=0)
        kni = jnp.concatenate([kni, jnp.zeros((pad, k), kni.dtype)], axis=0)
        kdiag = jnp.concatenate([kdiag, jnp.ones((pad,), kdiag.dtype)], axis=0)
    Bp = B + pad

    interpret = config.pallas_interpret or jax.default_backend() != "tpu"

    out = pl.pallas_call(
        partial(_kernel, k=k, unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((Bp, k + 1), out_dtype),
        grid=(Bp // block,),
        in_specs=[
            pl.BlockSpec((block, k, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, k), lambda i: (i, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block, k + 1), lambda i: (i, 0)),
        interpret=interpret,
    )(Kw, kni, kdiag[:, None])
    return out[:B]


def _band_fwd(Kw, kni, kdiag, block, unroll):
    out = _band_forward(Kw, kni, kdiag, block, unroll)
    return out, (Kw, kni, kdiag)


def _band_bwd(block, unroll, residuals, gbar):
    """Closed-form pullbacks.  With S = Kw⁻¹, b = S·kni, F = kdiag − kni·b,
    u₀ = F^{−1/2}, out = [−b·u₀, u₀]:

        ū₀ = ḡ_d − ḡ_r·b          F̄ = −½ u₀³ ū₀
        b̄  = −u₀ ḡ_r − kni F̄      kdiag‾ = F̄
        kni‾ = S b̄ − b F̄          Kw‾ = −(S b̄) bᵀ   (b̄ = S-solve, batched)
    """
    Kw, kni, kdiag = residuals
    gr = gbar[:, :-1]  # (B, k)
    gd = gbar[:, -1]  # (B,)

    # ONE masked-column factorization shared by both solves — the same
    # unrolled batch-leading math as the forward (XLA's dynamic-slice
    # batched cholesky/cho_solve here dominated the whole training step at
    # N=1e5/k=32: the lml+grad step measured 599 ms vs 29 ms forward;
    # 294 ms after this change).  Pivot floors and deflation match the
    # forward exactly.
    factor = _masked_chol_factor(Kw, unroll=True)
    b = _masked_spd_solve(factor, kni)
    F = kdiag - jnp.einsum("bk,bk->b", kni, b)
    F = jnp.maximum(F, 8.0 * jnp.finfo(Kw.dtype).eps * kdiag)
    u0 = jax.lax.rsqrt(F)

    u0_bar = gd - jnp.einsum("bk,bk->b", gr, b)
    F_bar = -0.5 * u0**3 * u0_bar
    b_bar = -u0[:, None] * gr - kni * F_bar[:, None]
    Sb_bar = _masked_spd_solve(factor, b_bar)
    kni_bar = Sb_bar - b * F_bar[:, None]
    Kw_bar = -jnp.einsum("bi,bj->bij", Sb_bar, b)
    kdiag_bar = F_bar
    return Kw_bar, kni_bar, kdiag_bar


batched_chol_solve_band.defvjp(_band_fwd, _band_bwd)


@partial(jax.custom_vjp, nondiff_argnums=())
def batched_chol_solve_band_unrolled(Kw, kni, kdiag):
    """Plain-XLA variant of :func:`batched_chol_solve_band` — same
    masked-column math vectorized over the batch, fully unrolled over the k
    columns (measured on v5e at N=131k/k=32: 143 ms vs 791 ms for the
    fori_loop variant vs 4.0 s/1e6 for XLA's dynamic-slice cholesky
    expansion).  XLA fuses the unrolled column steps into large fused VPU
    kernels; compile time stays modest (~15 s cold)."""
    return masked_chol_solve_band_math(Kw, kni, kdiag, unroll=True)


def _unrolled_fwd(Kw, kni, kdiag):
    return masked_chol_solve_band_math(Kw, kni, kdiag, unroll=True), (Kw, kni, kdiag)


def _unrolled_bwd(residuals, gbar):
    return _band_bwd(None, None, residuals, gbar)


batched_chol_solve_band_unrolled.defvjp(_unrolled_fwd, _unrolled_bwd)


# ---------------------------------------------------------------------------
# Fully fused Vecchia band construction: window → Gram → factor → band row
# in one VMEM pass.  The (N, k, k) neighbor-Gram tensor never exists in HBM
# (the XLA path materializes ~N·k²·4 bytes of it per chunk — at N=1e6, k=32
# that's ~4 GB of HBM traffic; here traffic is just the (N, k+1, D) windows
# in and the (N, k+1) band out).
# ---------------------------------------------------------------------------


def _window_gram_inputs(w, valid, k_of_r2):
    """(Bt, D, k+1) windows + (Bt, k) validity → masked (Kw, kni, kdiag).

    Window slot t < k is neighbor t (older first), slot k is the point
    itself.  Invalid neighbor slots become identity rows/zero couplings, so
    the factorization stays defined for the first k points.

    Layout: D on the sublane axis, window slots on lanes, and the feature
    loop static — a trailing D axis would pad to 128 lanes in Mosaic (D=1
    would cost 128x the VMEM)."""
    k = valid.shape[-1]
    D = w.shape[1]
    r2 = None
    for d in range(D):
        wd = w[:, d, :]  # (Bt, k+1), static slice
        dd = wd[:, :, None] - wd[:, None, :]
        r2 = dd * dd if r2 is None else r2 + dd * dd
    G = k_of_r2(r2)
    pm = valid[:, :, None] * valid[:, None, :]  # (Bt, k, k)
    eyek = jnp.eye(k, dtype=w.dtype)
    Kw = G[:, :k, :k] * pm + (1.0 - pm) * eyek[None]
    kni = G[:, :k, k] * valid
    kdiag = G[:, k, k]
    return Kw, kni, kdiag


def _vecchia_band_kernel(xw_ref, valid_ref, out_ref, *, k_of_r2, unroll: bool):
    cdt = jnp.promote_types(xw_ref.dtype, jnp.float32)
    w = xw_ref[:].astype(cdt)  # (Bt, D, k+1)
    valid = valid_ref[:].astype(cdt)  # (Bt, k)
    Kw, kni, kdiag = _window_gram_inputs(w, valid, k_of_r2)
    if unroll:
        out = masked_chol_solve_band_math(Kw, kni, kdiag, unroll=True)
    else:
        out = masked_chol_solve_band_math_lane(Kw, kni, kdiag)
    out_ref[:] = out.astype(out_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def pallas_vecchia_band(
    xw: jax.Array,
    valid: jax.Array,
    k_of_r2,
    block: int = 64,
    unroll: bool = False,
    bwd_chunk: int = 16384,
) -> jax.Array:
    # block=64: the kernel's rank-3 (block, k, k) arrays lane-pad k to 128,
    # so VMEM is roughly block*k*128*4B per live array (~8 live incl. fori
    # double-buffering); 64 keeps the body within the 16 MB scoped-vmem
    # limit at k=32 (128 measured 16.63M, just over).
    """Fused Vecchia precision-band rows from point windows.

    xw: (N, D, k+1) — xw[i, :, t] = x[i−k+t] (clipped), xw[i, :, k] = x[i];
    valid: (N, k) float 0/1 mask of real neighbors;
    k_of_r2: static parameter-free stationary map (see
    ``StationaryKernel._static_k_of_r2``; lengthscales are folded into the
    inputs, variances post-scale the band as U(σ²k) = U(k)/σ).

    Returns (N, k+1) band rows [−b·F^{−1/2}, F^{−1/2}].

    Differentiable w.r.t. ``xw``: the pullback recomputes the chunk's Gram
    inputs with plain XLA ops inside a ``lax.map`` (bounded memory) and
    chains the closed-form band pullback with the Gram/window pullbacks.
    """
    return _vecchia_band_forward(xw, valid, k_of_r2, block, unroll)


def _vecchia_band_forward(xw, valid, k_of_r2, block, unroll):
    N, D, kp1 = xw.shape
    k = kp1 - 1
    out_dtype = xw.dtype
    block = min(block, N)
    pad = (-N) % block
    if pad:
        xw = jnp.concatenate([xw, jnp.broadcast_to(xw[:1], (pad, D, kp1))], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad, k), valid.dtype)], axis=0)
    Np = N + pad

    interpret = config.pallas_interpret or jax.default_backend() != "tpu"

    out = pl.pallas_call(
        partial(_vecchia_band_kernel, k_of_r2=k_of_r2, unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((Np, k + 1), out_dtype),
        grid=(Np // block,),
        in_specs=[
            pl.BlockSpec((block, D, kp1), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, k), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block, k + 1), lambda i: (i, 0)),
        interpret=interpret,
    )(xw, valid)
    return out[:N]


def _vecchia_band_fwd(xw, valid, k_of_r2, block, unroll, bwd_chunk):
    return _vecchia_band_forward(xw, valid, k_of_r2, block, unroll), (xw, valid)


def _vecchia_band_bwd(k_of_r2, block, unroll, bwd_chunk, residuals, gbar):
    xw, valid = residuals
    N, D, kp1 = xw.shape
    k = kp1 - 1
    cdt = jnp.promote_types(xw.dtype, jnp.float32)

    chunk = min(bwd_chunk, N)
    pad = (-N) % chunk
    if pad:
        xw_p = jnp.concatenate([xw, jnp.broadcast_to(xw[:1], (pad, D, kp1))], axis=0)
        valid_p = jnp.concatenate([valid, jnp.zeros((pad, k), valid.dtype)], axis=0)
        gbar_p = jnp.concatenate([gbar, jnp.zeros((pad, k + 1), gbar.dtype)], axis=0)
    else:
        xw_p, valid_p, gbar_p = xw, valid, gbar
    nc = (N + pad) // chunk

    def chunk_bwd(args):
        xw_c, valid_c, gbar_c = args
        prim, vjp = jax.vjp(
            lambda w: _window_gram_inputs(w.astype(cdt), valid_c.astype(cdt), k_of_r2),
            xw_c,
        )
        bars = _band_bwd(None, None, prim, gbar_c.astype(cdt))
        (xw_bar,) = vjp(bars)
        return xw_bar

    xw_bar = jax.lax.map(
        chunk_bwd,
        (
            xw_p.reshape(nc, chunk, D, kp1),
            valid_p.reshape(nc, chunk, k),
            gbar_p.reshape(nc, chunk, k + 1),
        ),
    ).reshape(-1, D, kp1)[:N]
    return xw_bar.astype(xw.dtype), jnp.zeros_like(valid)


pallas_vecchia_band.defvjp(_vecchia_band_fwd, _vecchia_band_bwd)


# ---------------------------------------------------------------------------
# Batch-on-lanes layout (v2): the batch rides the minormost 128-lane axis at
# 100% occupancy; k lives on sublanes.  The first-generation kernel above
# keeps k on lanes, so k=32 uses a quarter of every vector op and its rank-3
# temporaries lane-pad k→128 (4× VMEM + 4× VPU waste) — measured 6.3 s vs
# 0.87 s XLA at N=1e6/k=32.  Here every rank-1 Schur update is a full-width
# rank-3 elementwise broadcast, every extraction is a leading-axis dynamic
# slice or a sublane one-hot reduction, and the conditional variance falls
# out of the last pivot of a single bordered (k+1)-Cholesky (no separate
# forward solve).
# ---------------------------------------------------------------------------


def _vecchia_band_kernel_lanes(
    xw_ref, validp_ref, *refs, k_of_r2, kp1: int, panel: int,
    nugget: bool = False, nugget_self: bool = True
):
    """Fused window → Gram → bordered-Cholesky → band, batch on lanes.

    ``nugget=True`` threads one extra SMEM scalar input (the τ²/σ² ratio of
    a ``σ²·k + τ²·White`` kernel after variance normalization): the window
    Gram gains ``ratio·I`` on its valid INDEX diagonal — iid observation
    noise per window slot, matching the XLA path's one-argument
    ``WhiteKernel.gram`` — keeping noisy-data Vecchia training on the
    fused tier (see ``core.kernels.unwrap_stationary_nugget`` for the
    duplicated-site caveat).  ``nugget_self=False`` excludes slot k (the
    conditioned point) from the shift — the SERVING window shape, where
    slot k is a noise-free TEST point conditioning on noisy neighbors
    (``predict_knn``).

    Refs: xw (D, kpp, Bt) windows (slot k = kp1−1 is the conditioned point,
    slots ≥ kp1 are panel padding), validp (kpp, Bt) 0/1 neighbor mask
    (slot k always 1, pads 0), out (kp1, Bt); scratch: ares/lst
    (kpp, kpp, Bt) VMEM working factors, kpp = panel-padded kp1.

    Math: chol([[Kw, kni], [kniᵀ, kdiag]]) has last row [wᵀ, √F] with
    w = L⁻¹kni — the final right-looking pivot IS the conditional variance
    F = kdiag − kniᵀKw⁻¹kni, and the band's b = Kw⁻¹kni comes from one
    back-substitution b = L⁻ᵀw.  Pivot floors match
    :func:`masked_chol_solve_band_math` (8·eps relative to the original
    diagonal, with modified-Cholesky deflation of floored pivots), so the
    two paths agree to roundoff.  Padding slots factor as identity columns
    after slot k and never touch F or b.

    Layout: the batch rides the 128-lane axis; row/column extraction is
    dynamic leading-axis ref indexing (``pl.ds`` — Mosaic cannot
    dynamic-slice register values, hence the scratch refs); scalars-per-
    instance live as (1, Bt) rows.  The factorization is blocked into
    ``panel``-column right-looking panels: the full-matrix Schur update —
    the VMEM-bandwidth-dominant op — runs once per panel as a rank-P update
    instead of once per column, cutting scratch traffic by P."""
    if nugget:
        nug_ref, out_ref, ares_ref, lst_ref = refs
    else:
        nug_ref = None
        out_ref, ares_ref, lst_ref = refs
    cdt = ares_ref.dtype
    w = xw_ref[:].astype(cdt)  # (D, kpp, Bt)
    validp = validp_ref[:].astype(cdt)  # (kpp, Bt)
    D, kpp, _ = w.shape
    k = kp1 - 1
    eps = jnp.finfo(cdt).eps
    riota = jax.lax.broadcasted_iota(jnp.int32, (kpp, 1), 0)  # sublane ids

    def onehot(j):  # (kpp, 1) float one-hot on the sublane axis
        return (riota == j).astype(cdt)

    r2 = None
    for d in range(D):  # static feature loop (D is small)
        wd = w[d]  # (kpp, Bt)
        dd = wd[:, None, :] - wd[None, :, :]
        r2 = dd * dd if r2 is None else r2 + dd * dd
    G = k_of_r2(r2)

    # invalid neighbors / pad slots → identity rows / zero couplings (keeps
    # the factorization defined for the first k points and the pads inert)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (kpp, kpp, 1), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (kpp, kpp, 1), 1)
    ).astype(cdt)
    pm = validp[:, None, :] * validp[None, :, :]  # (kpp, kpp, Bt)
    Gm = G * pm + (1.0 - pm) * eye
    if nug_ref is not None:
        # valid-diagonal nugget (slot k's validp is always 1, pads stay
        # identity): Gm[j, j] += ratio for real window slots
        nugmask = eye * pm
        if not nugget_self:  # serving: slot k is a noise-free test point
            nugmask = nugmask * (riota < k).astype(cdt)[:, :, None]
        Gm = Gm + nug_ref[0, 0].astype(cdt) * nugmask

    diag0 = jnp.sum(Gm * eye, axis=0)  # (kpp, Bt) original diagonal
    floors = 8.0 * eps * jnp.abs(diag0)

    ares_ref[:] = Gm

    def panel_step(pidx, _):
        jbase = pidx * panel
        slab = ares_ref[pl.ds(jbase, panel)]  # (P, kpp, Bt) panel columns
        cols = []
        for c in range(panel):  # static inner loop over the panel
            j = jbase + c
            cj = slab[c]  # (kpp, Bt) residual column j (== row j: symmetric)
            ohj = onehot(j)
            d_raw = jnp.sum(cj * ohj, axis=0, keepdims=True)  # (1, Bt) pivot
            fl = jnp.sum(floors * ohj, axis=0, keepdims=True)
            d = jnp.maximum(d_raw, fl)
            inv = jax.lax.rsqrt(d)
            # modified-Cholesky deflation: a floored pivot (numerically
            # dependent column) zeroes its off-diagonal entries — otherwise
            # rsqrt(floor)-scaled columns compound through later Schur
            # updates and overflow f32; the diagonal is √d explicitly
            notc = (d_raw >= fl).astype(cdt)
            Lcol = cj * (inv * notc) * (riota > j).astype(cdt) + ohj * (d * inv)
            cols.append(Lcol)
            if c + 1 < panel:
                # panel-internal rank-1 update; entries for columns ≤ c are
                # never read again, so their garbage is harmless
                coef = jnp.concatenate(
                    [
                        jnp.sum(Lcol * onehot(jbase + t), axis=0, keepdims=True)
                        for t in range(panel)
                    ],
                    axis=0,
                )  # (P, Bt): Lcol at the panel's own row positions
                slab = slab - coef[:, None, :] * Lcol[None, :, :]
        lst_ref[pl.ds(jbase, panel)] = jnp.stack(cols, axis=0)
        # trailing rank-P Schur update: ONE read-modify-write pass of the
        # full residual per panel (the bandwidth-dominant op)
        upd = cols[0][:, None, :] * cols[0][None, :, :]
        for c in range(1, panel):
            upd = upd + cols[c][:, None, :] * cols[c][None, :, :]
        ares_ref[:] = ares_ref[:] - upd
        return 0

    jax.lax.fori_loop(0, kpp // panel, panel_step, 0)
    # lst[j, r] = L[r, j] (column j of L over rows r)

    ohk = onehot(k)
    # L[k, k] = √F from the last pivot
    u0 = jnp.sum(lst_ref[pl.ds(k, 1)][0] * ohk, axis=0, keepdims=True)
    inv_sqrt_F = 1.0 / u0  # (1, Bt)
    Ldiag = jnp.sum(lst_ref[:] * eye, axis=0)  # (kpp, Bt): Ldiag[r] = L[r, r]

    # back-substitution b = L_k⁻ᵀ w over the leading k×k block; slots ≥ k of
    # b stay 0 so the t ≥ k terms of each reduction vanish
    def bwd_step(jj, b):
        i = k - 1 - jj
        Li = lst_ref[pl.ds(i, 1)][0]  # (kpp, Bt): Li[t] = L[t, i]
        ohi = onehot(i)
        s = jnp.sum(Li * b * (riota > i).astype(cdt), axis=0, keepdims=True)
        wi = jnp.sum(Li * ohk, axis=0, keepdims=True)  # w_i = L[k, i]
        di = jnp.sum(Ldiag * ohi, axis=0, keepdims=True)
        return b + ohi * ((wi - s) / di)

    b = jax.lax.fori_loop(0, k, bwd_step, jnp.zeros_like(validp))

    maskk = (riota < k).astype(cdt)
    band = -b * inv_sqrt_F * maskk + ohk * inv_sqrt_F
    out_ref[:] = band[:kp1].astype(out_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 6))
def pallas_vecchia_band_lanes(
    xw: jax.Array, valid: jax.Array, k_of_r2, block: int = 256,
    panel: int = 1, nugget: jax.Array | None = None,
    nugget_self: bool = True,
) -> jax.Array:
    """Fused Vecchia band rows from point windows, batch-on-lanes layout.

    Same contract as :func:`pallas_vecchia_band` — xw: (N, D, k+1) windows
    (slot k is the point itself), valid: (N, k) float neighbor mask,
    k_of_r2 a static parameter-free stationary map — but the kernel runs
    with the batch on the 128-lane axis (see
    :func:`_vecchia_band_kernel_lanes`), which is what makes the fused
    path faster than the XLA batched pipeline rather than 7× slower.

    The (N, k, k) neighbor-Gram tensor never exists in HBM: traffic is the
    (D, k+1, N) windows in and the (k+1, N) band out.

    ``panel`` blocks the right-looking factorization into rank-P Schur
    updates; the bordered matrix is padded with inert identity slots to a
    multiple of P.  Measured on v5e at k=32: no win (Mosaic streams each
    rank-3 term through VMEM anyway, so the rank-P sum costs the same
    traffic and the padding adds (kpp/kp1)² overhead: 331/357/389 ms at
    P=2/4/8 vs 334 ms at P=1) — default 1, kept as a tuning knob for
    other k/hardware.

    ``nugget``: optional traced scalar — the window Gram becomes
    ``g(r²) + nugget·I`` on the valid diagonal (the variance-normalized
    τ²/σ² of a ``σ²·k + τ²·White`` kernel), keeping noisy-data training on
    the fused tier.  Differentiable: coordinate cotangents are unchanged
    (the shift is flat in r² a.e.) and the nugget cotangent
    ``Σ diag(Ḡ) = F̄ − Σⱼ (Kw⁻¹b̄)ⱼ bⱼ`` falls out of quantities the
    fused pullback already carries.  ``nugget_self=False`` (static)
    excludes slot k from the shift — the serving window shape, where the
    conditioned slot is a noise-free test point (``predict_knn``).

    Differentiable w.r.t. ``xw`` (and ``nugget``) via the fused Pallas
    pullback."""
    return _vecchia_band_lanes_forward(xw, valid, k_of_r2, block, panel,
                                       nugget, nugget_self)


def _vecchia_band_lanes_forward(xw, valid, k_of_r2, block, panel,
                                nugget=None, nugget_self=True):
    N, D, kp1 = xw.shape
    k = kp1 - 1
    out_dtype = xw.dtype
    block = min(block, N)
    pad = (-N) % block
    if pad:
        xw = jnp.concatenate([xw, jnp.broadcast_to(xw[:1], (pad, D, kp1))], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad, k), valid.dtype)], axis=0)
    Np = N + pad

    kpp = kp1 + ((-kp1) % panel)  # panel-padded bordered size
    xwT = jnp.transpose(xw, (1, 2, 0))  # (D, kp1, Np)
    if kpp > kp1:
        # pad window slots with copies of slot 0 — masked to identity
        # columns in-kernel via the zero validp rows below
        xwT = jnp.concatenate(
            [xwT, jnp.broadcast_to(xwT[:, :1], (D, kpp - kp1, Np))], axis=1
        )
    validpT = jnp.concatenate(
        [
            valid.swapaxes(0, 1),
            jnp.ones((1, Np), valid.dtype),
            jnp.zeros((kpp - kp1, Np), valid.dtype),
        ],
        axis=0,
    )  # (kpp, Np)

    interpret = config.pallas_interpret or jax.default_backend() != "tpu"
    cdt = jnp.promote_types(out_dtype, jnp.float32)

    args = [xwT, validpT]
    in_specs = [
        pl.BlockSpec((D, kpp, block), lambda i: (0, 0, i)),
        pl.BlockSpec((kpp, block), lambda i: (0, i)),
    ]
    if nugget is not None:
        args.append(jnp.asarray(nugget, cdt).reshape(1, 1))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    out = pl.pallas_call(
        partial(_vecchia_band_kernel_lanes, k_of_r2=k_of_r2, kp1=kp1,
                panel=panel, nugget=nugget is not None,
                nugget_self=nugget_self),
        out_shape=jax.ShapeDtypeStruct((kp1, Np), out_dtype),
        grid=(Np // block,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((kp1, block), lambda i: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((kpp, kpp, block), cdt),
            pltpu.VMEM((kpp, kpp, block), cdt),
        ],
        interpret=interpret,
    )(*args)
    return out.swapaxes(0, 1)[:N]


def _vecchia_band_bwd_kernel_lanes(
    xw_ref, validp_ref, gbar_ref, *refs, k_of_r2, kp1: int,
    nugget: bool = False, nugget_self: bool = True
):
    """Fused Vecchia-band PULLBACK, batch on lanes: window → Gram →
    bordered factor → closed-form band cotangent chain → Gram/window
    pullback, all in one VMEM pass.  The XLA chunked recompute ran the
    masked-column math in the batch-leading layout (k on lanes — 4× lane
    waste, rank-3 temporaries lane-padded k→128): the whole N=1e6/k=32
    lml+grad step measured 3037 ms of which ~2.7 s was this backward.

    Math (matches ``_band_bwd``): with b = Kw⁻¹kni, F = kdiag − kni·b,
    u₀ = F^{−1/2}, ḡ = [ḡ_r, ḡ_d]:

        ū₀ = ḡ_d − ḡ_r·b          F̄ = −½ u₀³ ū₀
        b̄  = −u₀ ḡ_r − kni F̄      K̄w = −(Kw⁻¹b̄) bᵀ,  kn̄i = Kw⁻¹b̄ − b F̄

    then (exploiting that only r2 = Σ_d (w_i−w_j)² reaches the kernel map,
    so only sym(Ḡ) matters — built WITHOUT transposes from outer products)

        Ḡ_sym = −½(Sb̄⊗b + b⊗Sb̄)·pm + ½(kn̄i⊗e_k + e_k⊗kn̄i)·valid + F̄·e_k⊗e_k
        r̄2    = k'(r2)·Ḡ_sym        (elementwise vjp of the static map)
        x̄w[d] = −4 Σ_i (r̄2 · dd_d)[i, :]   (leading-axis reduction: r̄2 is
                 symmetric and dd antisymmetric, so the j-sum equals minus
                 the i-sum — Mosaic cannot reduce the middle axis)

    The factorization is the forward kernel's bordered masked Cholesky
    (panel=1) with the same pivot floors and deflation; deflated/invalid
    coordinates carry zero solves, matching ``_masked_spd_solve``.

    ``nugget=True``: one extra SMEM scalar input (the τ²/σ² Gram diagonal
    shift, recomputed into Gm so the factor matches the forward) and one
    extra (1, Bt) output — the per-window nugget cotangent
    ``Σⱼ Ḡ_sym[j, j]·validⱼ = F̄ − Σⱼ Sb̄ⱼ·bⱼ·validⱼ`` (the r²-pullback is
    UNCHANGED: the indicator shift is flat in r² a.e.)."""
    if nugget:
        nug_ref, xwbar_ref, nbar_ref, ares_ref, lst_ref = refs
    else:
        nug_ref = None
        xwbar_ref, ares_ref, lst_ref = refs
    cdt = ares_ref.dtype
    w = xw_ref[:].astype(cdt)  # (D, kpp, Bt)
    validp = validp_ref[:].astype(cdt)  # (kpp, Bt)
    gbar = gbar_ref[:].astype(cdt)  # (kp1, Bt)
    D, kpp, _ = w.shape
    k = kp1 - 1
    eps = jnp.finfo(cdt).eps
    riota = jax.lax.broadcasted_iota(jnp.int32, (kpp, 1), 0)

    def onehot(j):
        return (riota == j).astype(cdt)

    r2 = None
    dds = []
    for d in range(D):
        wd = w[d]
        dd = wd[:, None, :] - wd[None, :, :]
        dds.append(dd)
        r2 = dd * dd if r2 is None else r2 + dd * dd
    G, fn_vjp = jax.vjp(k_of_r2, r2)

    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (kpp, kpp, 1), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (kpp, kpp, 1), 1)
    ).astype(cdt)
    pm = validp[:, None, :] * validp[None, :, :]
    Gm = G * pm + (1.0 - pm) * eye
    if nug_ref is not None:
        nugmask = eye * pm
        if not nugget_self:
            nugmask = nugmask * (riota < k).astype(cdt)[:, :, None]
        Gm = Gm + nug_ref[0, 0].astype(cdt) * nugmask
    diag0 = jnp.sum(Gm * eye, axis=0)
    floors = 8.0 * eps * jnp.abs(diag0)
    ares_ref[:] = Gm

    # --- bordered masked Cholesky (forward kernel, panel=1) + live mask ---
    def chol_step(j, live):
        cj = ares_ref[pl.ds(j, 1)][0]  # residual column j
        ohj = onehot(j)
        d_raw = jnp.sum(cj * ohj, axis=0, keepdims=True)
        fl = jnp.sum(floors * ohj, axis=0, keepdims=True)
        dpv = jnp.maximum(d_raw, fl)
        inv = jax.lax.rsqrt(dpv)
        notc = (d_raw >= fl).astype(cdt)
        Lcol = cj * (inv * notc) * (riota > j).astype(cdt) + ohj * (dpv * inv)
        lst_ref[pl.ds(j, 1)] = Lcol[None]
        ares_ref[:] = ares_ref[:] - Lcol[:, None, :] * Lcol[None, :, :]
        return live + ohj * notc

    live = jax.lax.fori_loop(0, kpp, chol_step, jnp.zeros_like(validp))
    Ldiag = jnp.sum(lst_ref[:] * eye, axis=0)  # (kpp, Bt)

    ohk = onehot(k)
    maskk = (riota < k).astype(cdt)
    u0 = jnp.sum(lst_ref[pl.ds(k, 1)][0] * ohk, axis=0, keepdims=True)
    inv_sqrt_F = 1.0 / u0  # (1, Bt)

    # b = L_k⁻ᵀ w over the leading k×k block (forward kernel's bwd_step)
    def bsub_step(jj, b):
        i = k - 1 - jj
        Li = lst_ref[pl.ds(i, 1)][0]
        ohi = onehot(i)
        s = jnp.sum(Li * b * (riota > i).astype(cdt), axis=0, keepdims=True)
        wi = jnp.sum(Li * ohk, axis=0, keepdims=True)
        di = jnp.sum(Ldiag * ohi, axis=0, keepdims=True)
        li = jnp.sum(live * ohi, axis=0, keepdims=True)
        return b + ohi * (li * (wi - s) / di)

    b = jax.lax.fori_loop(0, k, bsub_step, jnp.zeros_like(validp))

    kni = jnp.sum(Gm * ohk[None, :, :], axis=1) * maskk  # (kpp, Bt): Gm[:, k]
    kdiag = jnp.sum(jnp.sum(Gm * ohk[None, :, :], axis=1) * ohk, axis=0,
                    keepdims=True)
    gr = gbar[:k]  # (k, Bt)
    gr = jnp.concatenate([gr, jnp.zeros((kpp - k, gr.shape[1]), cdt)], axis=0)
    gd = gbar[k:kp1]  # (1, Bt)

    F = kdiag - jnp.sum(kni * b, axis=0, keepdims=True)
    F = jnp.maximum(F, 8.0 * eps * kdiag)
    u0v = jax.lax.rsqrt(F)  # = inv_sqrt_F up to the floor path
    del inv_sqrt_F

    u0_bar = gd - jnp.sum(gr * b, axis=0, keepdims=True)
    F_bar = -0.5 * u0v * u0v * u0v * u0_bar  # (1, Bt)
    b_bar = -u0v * gr - kni * F_bar  # (kpp, Bt), zero past slot k

    # Sb̄ = Kw⁻¹ b̄ = L_k⁻ᵀ (L_k⁻¹ b̄): right-looking forward substitution
    # (only column reads) then the back-substitution above
    def fsub_step(i, carry):
        y, c_work = carry
        ohi = onehot(i)
        ci = jnp.sum(c_work * ohi, axis=0, keepdims=True)
        di = jnp.sum(Ldiag * ohi, axis=0, keepdims=True)
        li = jnp.sum(live * ohi, axis=0, keepdims=True)
        yi = li * ci / di  # (1, Bt)
        Lcol_i = lst_ref[pl.ds(i, 1)][0]
        c_work = c_work - yi * Lcol_i * (riota > i).astype(cdt)
        return y + ohi * yi, c_work

    y, _ = jax.lax.fori_loop(
        0, k, fsub_step, (jnp.zeros_like(validp), b_bar * maskk)
    )

    def bsub2_step(jj, sb):
        i = k - 1 - jj
        Li = lst_ref[pl.ds(i, 1)][0]
        ohi = onehot(i)
        s = jnp.sum(Li * sb * (riota > i).astype(cdt), axis=0, keepdims=True)
        yi = jnp.sum(y * ohi, axis=0, keepdims=True)
        di = jnp.sum(Ldiag * ohi, axis=0, keepdims=True)
        li = jnp.sum(live * ohi, axis=0, keepdims=True)
        return sb + ohi * (li * (yi - s) / di)

    Sb_bar = jax.lax.fori_loop(0, k, bsub2_step, jnp.zeros_like(validp))

    if nug_ref is not None:
        # nugget cotangent: Σⱼ Ḡ_sym[j,j]·validⱼ — the neighbor-diagonal
        # term −Sb̄ⱼbⱼ (K̄w = −(Kw⁻¹b̄)bᵀ) plus, when the shift includes
        # slot k, the kdiag term F̄
        nbar = -jnp.sum(Sb_bar * b * validp * maskk, axis=0, keepdims=True)
        if nugget_self:
            nbar = nbar + F_bar
        nbar_ref[:] = nbar.astype(nbar_ref.dtype)

    kni_bar = (Sb_bar - b * F_bar) * maskk * validp  # (kpp, Bt)
    # Ḡ_sym: outer products of (kpp, Bt) pieces — no transposes
    G_bar = (
        -0.5 * (Sb_bar[:, None, :] * b[None, :, :]
                + b[:, None, :] * Sb_bar[None, :, :]) * pm
        + 0.5 * (kni_bar[:, None, :] * ohk[None, :, :]
                 + ohk[:, None, :] * kni_bar[None, :, :])
        + F_bar * (ohk[:, None, :] * ohk[None, :, :])
    )
    (r2_bar,) = fn_vjp(G_bar)

    out = []
    for d in range(D):
        # Σ_j r̄2[t, j]·dd[t, j] = −Σ_i (r̄2·dd)[i, t]  (r̄2 sym, dd antisym)
        out.append(-4.0 * jnp.sum(r2_bar * dds[d], axis=0))
    xwbar_ref[:] = jnp.stack(out, axis=0).astype(xwbar_ref.dtype)


def _vecchia_band_lanes_bwd_pallas_t(xwT, validpT, gbarT, k_of_r2, block,
                                     nugget=None, nugget_self=True):
    """Fused Pallas pullback over the batch grid, TRANSPOSED layout in and
    out: xwT (D, kp1, N), validpT (kp1, N) incl. the always-1 slot-k row,
    gbarT (kp1, N) → xwT_bar (D, kp1, N) [+ the scalar nugget cotangent
    when ``nugget`` is given]."""
    D, kp1, N = xwT.shape
    block = min(block, N)
    pad = (-N) % block
    if pad:
        xwT = jnp.concatenate(
            [xwT, jnp.broadcast_to(xwT[:, :, :1], (D, kp1, pad))], axis=2
        )
        validpT = jnp.concatenate(
            [validpT, jnp.zeros((kp1, pad), validpT.dtype)], axis=1
        )
        gbarT = jnp.concatenate(
            [gbarT, jnp.zeros((kp1, pad), gbarT.dtype)], axis=1
        )
    Np = N + pad

    interpret = config.pallas_interpret or jax.default_backend() != "tpu"
    cdt = jnp.promote_types(xwT.dtype, jnp.float32)

    args = [xwT, validpT, gbarT]
    in_specs = [
        pl.BlockSpec((D, kp1, block), lambda i: (0, 0, i)),
        pl.BlockSpec((kp1, block), lambda i: (0, i)),
        pl.BlockSpec((kp1, block), lambda i: (0, i)),
    ]
    out_shape = [jax.ShapeDtypeStruct((D, kp1, Np), xwT.dtype)]
    out_specs = [pl.BlockSpec((D, kp1, block), lambda i: (0, 0, i))]
    if nugget is not None:
        args.append(jnp.asarray(nugget, cdt).reshape(1, 1))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, Np), cdt))
        out_specs.append(pl.BlockSpec((1, block), lambda i: (0, i)))

    out = pl.pallas_call(
        partial(_vecchia_band_bwd_kernel_lanes, k_of_r2=k_of_r2, kp1=kp1,
                nugget=nugget is not None, nugget_self=nugget_self),
        out_shape=out_shape,
        grid=(Np // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((kp1, kp1, block), cdt),
            pltpu.VMEM((kp1, kp1, block), cdt),
        ],
        interpret=interpret,
    )(*args)
    if nugget is None:
        return out[0][:, :, :N]
    xwbar, nbar = out
    # padded columns carry zero gbar → zero nbar; sum is over real windows
    nug_bar = jnp.sum(nbar[0, :N]).astype(jnp.asarray(nugget).dtype)
    return xwbar[:, :, :N], nug_bar


def _vecchia_band_lanes_bwd_pallas(xw, valid, k_of_r2, gbar, block,
                                   nugget=None, nugget_self=True):
    """Untransposed-layout wrapper of the fused Pallas pullback."""
    N, D, kp1 = xw.shape
    xwT = jnp.transpose(xw, (1, 2, 0))
    validpT = jnp.concatenate(
        [valid.swapaxes(0, 1), jnp.ones((1, N), valid.dtype)], axis=0
    )
    res = _vecchia_band_lanes_bwd_pallas_t(
        xwT, validpT, gbar.swapaxes(0, 1), k_of_r2, block, nugget,
        nugget_self
    )
    if nugget is None:
        return jnp.transpose(res, (2, 0, 1))  # (N, D, kp1)
    xwbarT, nug_bar = res
    return jnp.transpose(xwbarT, (2, 0, 1)), nug_bar


def _vecchia_band_lanes_fwd(xw, valid, k_of_r2, block, panel, nugget=None,
                            nugget_self=True):
    return (
        _vecchia_band_lanes_forward(xw, valid, k_of_r2, block, panel, nugget,
                                    nugget_self),
        (xw, valid, nugget),
    )


def _vecchia_band_lanes_bwd(k_of_r2, block, panel, nugget_self, residuals,
                            gbar):
    xw, valid, nugget = residuals
    # block 128: the backward keeps ~6 rank-3 (kp1, kp1, Bt) arrays live
    # (r2, dds, Ḡ, vjp residual + the two scratch factors) — half the
    # forward's batch tile keeps the working set inside scoped VMEM
    if nugget is None:
        xw_bar = _vecchia_band_lanes_bwd_pallas(xw, valid, k_of_r2, gbar, 128)
        return xw_bar, jnp.zeros_like(valid), None
    xw_bar, nug_bar = _vecchia_band_lanes_bwd_pallas(
        xw, valid, k_of_r2, gbar, 128, nugget, nugget_self
    )
    return xw_bar, jnp.zeros_like(valid), nug_bar


pallas_vecchia_band_lanes.defvjp(_vecchia_band_lanes_fwd, _vecchia_band_lanes_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def pallas_vecchia_band_lanes_t(
    xwT: jax.Array, validT: jax.Array, k_of_r2, block: int = 256,
    panel: int = 1, nugget: jax.Array | None = None,
) -> jax.Array:
    """Transposed-layout twin of :func:`pallas_vecchia_band_lanes`:
    ``xwT`` (D, k+1, N) windows (slot k = the point), ``validT`` (k, N)
    neighbor mask; returns the (N, k+1) band.

    This is the layout the kernel runs in anyway — taking it directly lets
    callers BUILD the windows N-minor.  That matters for sliding (previous-
    k) windows from 1-D inputs: the (N, D, k+1) layout forces (N, 1)-shaped
    slice intermediates, which the TPU (8, 128) tiling pads 128× (measured
    488 MB copies at N=1e6 — an OOM, not just waste).

    ``nugget``: optional traced Gram diagonal shift, differentiable — see
    :func:`pallas_vecchia_band_lanes`."""
    return _vecchia_band_lanes_forward_t(xwT, validT, k_of_r2, block, panel,
                                         nugget)


def _vecchia_band_lanes_forward_t(xwT, validT, k_of_r2, block, panel,
                                  nugget=None):
    D, kp1, N = xwT.shape
    k = kp1 - 1
    out_dtype = xwT.dtype
    block = min(block, N)
    pad = (-N) % block
    if pad:
        xwT = jnp.concatenate(
            [xwT, jnp.broadcast_to(xwT[:, :, :1], (D, kp1, pad))], axis=2
        )
        validT = jnp.concatenate(
            [validT, jnp.zeros((k, pad), validT.dtype)], axis=1
        )
    Np = N + pad

    kpp = kp1 + ((-kp1) % panel)
    if kpp > kp1:
        xwT = jnp.concatenate(
            [xwT, jnp.broadcast_to(xwT[:, :1], (D, kpp - kp1, Np))], axis=1
        )
    validpT = jnp.concatenate(
        [
            validT,
            jnp.ones((1, Np), validT.dtype),
            jnp.zeros((kpp - kp1, Np), validT.dtype),
        ],
        axis=0,
    )

    interpret = config.pallas_interpret or jax.default_backend() != "tpu"
    cdt = jnp.promote_types(out_dtype, jnp.float32)

    args = [xwT, validpT]
    in_specs = [
        pl.BlockSpec((D, kpp, block), lambda i: (0, 0, i)),
        pl.BlockSpec((kpp, block), lambda i: (0, i)),
    ]
    if nugget is not None:
        args.append(jnp.asarray(nugget, cdt).reshape(1, 1))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    out = pl.pallas_call(
        partial(_vecchia_band_kernel_lanes, k_of_r2=k_of_r2, kp1=kp1,
                panel=panel, nugget=nugget is not None),
        out_shape=jax.ShapeDtypeStruct((kp1, Np), out_dtype),
        grid=(Np // block,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((kp1, block), lambda i: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((kpp, kpp, block), cdt),
            pltpu.VMEM((kpp, kpp, block), cdt),
        ],
        interpret=interpret,
    )(*args)
    return out.swapaxes(0, 1)[:N]


def _vecchia_band_lanes_t_fwd(xwT, validT, k_of_r2, block, panel,
                              nugget=None):
    return (
        _vecchia_band_lanes_forward_t(xwT, validT, k_of_r2, block, panel,
                                      nugget),
        (xwT, validT, nugget),
    )


def _vecchia_band_lanes_t_bwd(k_of_r2, block, panel, residuals, gbar):
    xwT, validT, nugget = residuals
    N = xwT.shape[2]
    validpT = jnp.concatenate(
        [validT, jnp.ones((1, N), validT.dtype)], axis=0
    )
    res = _vecchia_band_lanes_bwd_pallas_t(
        xwT, validpT, gbar.swapaxes(0, 1), k_of_r2, 128, nugget
    )
    if nugget is None:
        return res, jnp.zeros_like(validT), None
    xwT_bar, nug_bar = res
    return xwT_bar, jnp.zeros_like(validT), nug_bar


pallas_vecchia_band_lanes_t.defvjp(_vecchia_band_lanes_t_fwd,
                                   _vecchia_band_lanes_t_bwd)
