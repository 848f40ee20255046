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

from ..config import config

__all__ = ["batched_chol_solve_band", "batched_chol_solve_band_unrolled", "masked_chol_solve_band_math"]


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
    def chol_step(j, L):
        lj = jnp.sum(L * onehot(j)[:, :, None], axis=1)  # (Bt, k_t): L[:, j, :]
        mask_t = (t_row < j).astype(A.dtype)  # (1, k)
        # s_i = Σ_{t<j} L[i,t]·L[j,t]
        s = jnp.sum(L * (lj * mask_t)[:, None, :], axis=2)  # (Bt, k_i)
        # d = A[j,j] − s[j], extracted with one-hot lane reductions
        Aj = jnp.sum(A * onehot(j)[:, :, None], axis=1)  # (Bt, k): A[:, j, :]
        Ajj = jnp.sum(Aj * onehot(j), axis=1)
        d = Ajj - jnp.sum(s * onehot(j), axis=1)
        # pivot floor: near-singular neighbor Grams (densely-spaced points)
        # cancel below working precision — clamp relative to the diagonal
        d = jnp.maximum(d, 8.0 * jnp.finfo(A.dtype).eps * jnp.abs(Ajj))
        inv_ljj = jax.lax.rsqrt(d)
        Acol = jnp.sum(A * onehot(j)[:, None, :], axis=2)  # (Bt, k_i): A[:, :, j]
        col = (Acol - s) * inv_ljj[:, None]  # (Bt, k_i)
        i_gt_j = (t_row > j).astype(A.dtype)  # (1, k) over i
        new_col = col * i_gt_j + onehot(j) * (1.0 / inv_ljj)[:, None]
        return L + new_col[:, :, None] * onehot(j)[:, None, :]

    L = loop(0, k, chol_step, jnp.zeros_like(A))
    Ldiag = jnp.sum(L * jnp.eye(k, dtype=A.dtype)[None, :, :], axis=2)  # (Bt, k)

    # --- forward solve w = L⁻¹ c ---
    def fwd_step(i, w):
        mask_t = (t_row < i).astype(A.dtype)
        Li = jnp.sum(L * onehot(i)[:, :, None], axis=1)  # (Bt, k): L[:, i, :]
        s = jnp.sum(Li * w * mask_t, axis=1)  # (Bt,)
        ci = jnp.sum(c * onehot(i), axis=1)
        di = jnp.sum(Ldiag * onehot(i), axis=1)
        return w + onehot(i) * ((ci - s) / di)[:, None]

    w = loop(0, k, fwd_step, jnp.zeros_like(c))

    # --- backward solve b = L⁻ᵀ w ---  (L[t, i] = column i of L)
    def bwd_step(i, b):
        mask_t = (t_row > i).astype(A.dtype)
        Lcol_i = jnp.sum(L * onehot(i)[:, None, :], axis=2)  # (Bt, k_t): L[:, t, i]
        s = jnp.sum(Lcol_i * b * mask_t, axis=1)  # (Bt,)
        wi = jnp.sum(w * onehot(i), axis=1)
        di = jnp.sum(Ldiag * onehot(i), axis=1)
        return b + onehot(i) * ((wi - s) / di)[:, None]

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


def _kernel(kw_ref, kni_ref, kdiag_ref, out_ref, *, k: int):
    # kw_ref: (Bt, k, k); kni_ref: (Bt, k); kdiag_ref: (Bt, 1); out: (Bt, k+1)
    # compute in the input dtype, promoted to at least f32 (bf16 inputs
    # accumulate in f32 on the VPU; f64 inputs — CPU interpret/oracle mode —
    # keep full precision instead of silently dropping to f32)
    cdt = jnp.promote_types(kw_ref.dtype, jnp.float32)
    out = masked_chol_solve_band_math(
        kw_ref[:].astype(cdt),
        kni_ref[:].astype(cdt),
        kdiag_ref[:, 0].astype(cdt),
    )
    out_ref[:] = out.astype(out_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def batched_chol_solve_band(
    Kw: jax.Array, kni: jax.Array, kdiag: jax.Array, block: int = 256
) -> jax.Array:
    """Fused batched (chol, solve, F, band-row) for the Vecchia construction.

    Kw: (B, k, k) masked neighbor Grams; kni: (B, k); kdiag: (B,).
    Returns Uband rows (B, k+1): [−(Kw⁻¹kni)·F^{−1/2}, F^{−1/2}].

    Differentiable via closed-form pullbacks (batched solves on the backward
    pass — see ``_band_bwd``)."""
    return _band_forward(Kw, kni, kdiag, block)


def _band_forward(Kw, kni, kdiag, block):
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
        partial(_kernel, k=k),
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


def _band_fwd(Kw, kni, kdiag, block):
    out = _band_forward(Kw, kni, kdiag, block)
    return out, (Kw, kni, kdiag)


def _band_bwd(block, residuals, gbar):
    """Closed-form pullbacks.  With S = Kw⁻¹, b = S·kni, F = kdiag − kni·b,
    u₀ = F^{−1/2}, out = [−b·u₀, u₀]:

        ū₀ = ḡ_d − ḡ_r·b          F̄ = −½ u₀³ ū₀
        b̄  = −u₀ ḡ_r − kni F̄      kdiag‾ = F̄
        kni‾ = S b̄ − b F̄          Kw‾ = −(S b̄) bᵀ   (b̄ = S-solve, batched)
    """
    Kw, kni, kdiag = residuals
    gr = gbar[:, :-1]  # (B, k)
    gd = gbar[:, -1]  # (B,)

    # relative jitter mirrors the forward pivot floor (f32 robustness)
    k = Kw.shape[-1]
    diag_scale = jnp.einsum("bii->b", Kw) / k
    L = jnp.linalg.cholesky(
        Kw + (8.0 * jnp.finfo(Kw.dtype).eps * diag_scale)[:, None, None]
        * jnp.eye(k, dtype=Kw.dtype)
    )
    b = jax.scipy.linalg.cho_solve((L, True), kni[..., None])[..., 0]
    F = kdiag - jnp.einsum("bk,bk->b", kni, b)
    F = jnp.maximum(F, 8.0 * jnp.finfo(Kw.dtype).eps * kdiag)
    u0 = jax.lax.rsqrt(F)

    u0_bar = gd - jnp.einsum("bk,bk->b", gr, b)
    F_bar = -0.5 * u0**3 * u0_bar
    b_bar = -u0[:, None] * gr - kni * F_bar[:, None]
    Sb_bar = jax.scipy.linalg.cho_solve((L, True), b_bar[..., None])[..., 0]
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
    return _band_bwd(None, residuals, gbar)


batched_chol_solve_band_unrolled.defvjp(_unrolled_fwd, _unrolled_bwd)
