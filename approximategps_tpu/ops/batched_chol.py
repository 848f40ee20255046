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

__all__ = ["batched_chol_solve_band"]


def _kernel(kw_ref, kni_ref, kdiag_ref, out_ref, *, k: int):
    # kw_ref: (Bt, k, k); kni_ref: (Bt, k); kdiag_ref: (Bt, 1); out: (Bt, k+1)
    # Batch-leading layout throughout: every step is a lane reduction or a
    # broadcast over the trailing k axis — no transposes, gathers or scatters
    # (Mosaic-friendly).
    A = kw_ref[:].astype(jnp.float32)  # (Bt, k_i, k_t)
    c = kni_ref[:].astype(jnp.float32)  # (Bt, k)

    t_row = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)  # (1, k) lane ids

    def onehot(j):  # (1, k) float one-hot on the lane axis — static j
        return (t_row == j).astype(jnp.float32)

    # --- Cholesky (masked-column, unrolled over k) ---
    L = jnp.zeros_like(A)
    for j in range(k):
        lj = L[:, j, :]  # (Bt, k_t)
        mask_t = (t_row < j).astype(jnp.float32)  # (1, k)
        # s_i = Σ_{t<j} L[i,t]·L[j,t]
        s = jnp.sum(L * (lj * mask_t)[:, None, :], axis=2)  # (Bt, k_i)
        # d = A[j,j] − s[j], extracted with one-hot lane reductions
        d = jnp.sum(A[:, j, :] * onehot(j), axis=1) - jnp.sum(
            s * onehot(j), axis=1
        )  # (Bt,)
        inv_ljj = jax.lax.rsqrt(d)
        Acol = jnp.sum(A * onehot(j)[:, None, :], axis=2)  # (Bt, k_i): A[:, :, j]
        col = (Acol - s) * inv_ljj[:, None]  # (Bt, k_i)
        i_gt_j = (t_row > j).astype(jnp.float32)  # (1, k) over i
        new_col = col * i_gt_j + onehot(j) * (1.0 / inv_ljj)[:, None]
        L = L + new_col[:, :, None] * onehot(j)[:, None, :]

    # --- forward solve w = L⁻¹ c ---
    w = jnp.zeros_like(c)
    Ldiag = jnp.sum(L * jnp.eye(k, dtype=jnp.float32)[None, :, :], axis=2)  # (Bt, k)
    for i in range(k):
        mask_t = (t_row < i).astype(jnp.float32)
        s = jnp.sum(L[:, i, :] * w * mask_t, axis=1)  # (Bt,)
        ci = jnp.sum(c * onehot(i), axis=1)
        di = jnp.sum(Ldiag * onehot(i), axis=1)
        w = w + onehot(i) * ((ci - s) / di)[:, None]

    # --- backward solve b = L⁻ᵀ w ---  (L[t, i] = column i of L)
    b = jnp.zeros_like(c)
    for i in reversed(range(k)):
        mask_t = (t_row > i).astype(jnp.float32)
        Lcol_i = jnp.sum(L * onehot(i)[:, None, :], axis=2)  # (Bt, k_t): L[:, t, i]
        s = jnp.sum(Lcol_i * b * mask_t, axis=1)  # (Bt,)
        wi = jnp.sum(w * onehot(i), axis=1)
        di = jnp.sum(Ldiag * onehot(i), axis=1)
        b = b + onehot(i) * ((wi - s) / di)[:, None]

    # --- conditional variance + band row ---
    F = kdiag_ref[:, 0].astype(jnp.float32) - jnp.sum(c * b, axis=1)  # (Bt,)
    inv_sqrt_F = jax.lax.rsqrt(F)
    row = -b * inv_sqrt_F[:, None]  # (Bt, k)
    out = jnp.concatenate([row, inv_sqrt_F[:, None]], axis=1)  # (Bt, k+1)
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

    L = jnp.linalg.cholesky(Kw)
    b = jax.scipy.linalg.cho_solve((L, True), kni[..., None])[..., 0]
    F = kdiag - jnp.einsum("bk,bk->b", kni, b)
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
