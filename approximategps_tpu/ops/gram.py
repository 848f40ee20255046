"""Fused Pallas Gram-matrix kernel for stationary kernels.

Computes ``K[i, j] = g(||x_i - z_j||²)`` in one VMEM pass per output tile:
the squared-distance tile rides the MXU (``-2·X Zᵀ`` dot plus rank-1 norm
corrections) and the elementwise kernel map ``g`` is fused in-register — no
HBM round-trip for the r² intermediate.  This is the TPU replacement for
KernelFunctions.jl's ``kernelmatrix`` (SURVEY.md §2.2, row 1).

Differentiable: a custom VJP supplies the exact pullbacks
``X̄ = 2(rowsum(W)∘X − W Z)``, ``Z̄ = 2(colsum(W)∘Z − Wᵀ X)`` with
``W = ḡ ∘ g'(r²)`` — three more MXU matmuls, no pallas needed on the
backward path.

``g`` must be a *static, parameter-free* function (the stationary kernel
classes expose their maps as staticmethods) so the jit cache stays warm
across reconstructions of kernel pytrees.

Falls back to interpret mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..config import config, resolve_matmul_precision

__all__ = ["pallas_stationary_gram"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gram_kernel(x_ref, z_ref, o_ref, *, k_of_r2: Callable):
    x = x_ref[:]  # (TM, D)
    z = z_ref[:]  # (TN, D)
    # accumulate at >= f32 but never BELOW the input dtype: f64 oracle mode
    # (CPU interpret) must stay f64-accurate or FD gradient checks see an
    # f32-noise-floored primal (caught by tests/test_ad_rules.py)
    acc = jnp.promote_types(x_ref.dtype, jnp.float32)
    xz = jnp.dot(
        x, z.T, preferred_element_type=acc, precision=jax.lax.Precision.HIGHEST
    )
    x2 = jnp.sum(x.astype(acc) ** 2, axis=-1, keepdims=True)
    z2 = jnp.sum(z.astype(acc) ** 2, axis=-1, keepdims=True)
    r2 = jnp.maximum(x2 + z2.T - 2.0 * xz, 0.0)
    o_ref[:] = k_of_r2(r2).astype(o_ref.dtype)


def _forward(X, Z, k_of_r2, tile_m, tile_n):
    N, D = X.shape
    M = Z.shape[0]
    out_dtype = X.dtype

    # Center inputs (exact for stationary kernels): uncentered f32 distances
    # lose ~eps·max|x|² absolute accuracy for data on large ranges — same fix
    # as pairwise_sq_dist's MXU path.
    c = 0.5 * (jnp.mean(X, axis=0) + jnp.mean(Z, axis=0))
    X = X - c
    Z = Z - c

    tile_m = min(tile_m, _round_up(N, 8))
    tile_n = min(tile_n, _round_up(M, 128))
    Np = _round_up(N, tile_m)
    Mp = _round_up(M, tile_n)
    Dp = _round_up(D, 128) if D > 1 else D

    Xp = jnp.zeros((Np, Dp), dtype=X.dtype).at[:N, :D].set(X)
    Zp = jnp.zeros((Mp, Dp), dtype=Z.dtype).at[:M, :D].set(Z)

    interpret = config.pallas_interpret or jax.default_backend() != "tpu"

    grid = (Np // tile_m, Mp // tile_n)
    out = pl.pallas_call(
        partial(_gram_kernel, k_of_r2=k_of_r2),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, Dp), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_n, Dp), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j)),
        interpret=interpret,
    )(Xp, Zp)
    return out[:N, :M]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def pallas_stationary_gram(
    X: jax.Array,
    Z: jax.Array,
    k_of_r2: Callable,
    tile_m: int = 256,
    tile_n: int = 256,
) -> jax.Array:
    """K = g(pairwise_sq_dist(X, Z)) with distance + map fused on-chip.

    X: (N, D), Z: (M, D); output (N, M) in X's dtype (accumulation f32).
    ``k_of_r2`` must be hashable and parameter-free (staticmethod)."""
    return _forward(X, Z, k_of_r2, tile_m, tile_n)


def _fwd(X, Z, k_of_r2, tile_m, tile_n):
    return _forward(X, Z, k_of_r2, tile_m, tile_n), (X, Z)


def _bwd(k_of_r2, tile_m, tile_n, residuals, gbar):
    X, Z = residuals
    prec = resolve_matmul_precision(X.dtype)
    # recompute r² with the MXU identity (cheap relative to the matmuls
    # below; full precision + centering — see pairwise_sq_dist)
    c = 0.5 * (jnp.mean(X, axis=0) + jnp.mean(Z, axis=0))
    Xc, Zc = X - c, Z - c
    xz = jnp.matmul(Xc, Zc.T, precision="highest")
    r2 = jnp.maximum(
        jnp.sum(Xc * Xc, -1)[:, None] + jnp.sum(Zc * Zc, -1)[None, :] - 2.0 * xz, 0.0
    )
    _, pullback = jax.vjp(k_of_r2, r2)
    (W,) = pullback(gbar)  # W = ḡ ∘ g'(r²)
    Xbar = 2.0 * (
        jnp.sum(W, axis=1)[:, None] * X - jnp.matmul(W, Z, precision=prec)
    )
    Zbar = 2.0 * (
        jnp.sum(W, axis=0)[:, None] * Z - jnp.matmul(W.T, X, precision=prec)
    )
    return Xbar, Zbar


pallas_stationary_gram.defvjp(_fwd, _bwd)
