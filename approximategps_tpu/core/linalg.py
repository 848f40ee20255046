"""Dense linear-algebra primitives (L0 of SURVEY.md §1).

The reference delegates this layer to Julia ``LinearAlgebra``/``PDMats`` with
thin shims in ``src/utils.jl:6-20`` (``_chol_lower``, ``_chol_cov``) and the
AbstractGPs helpers ``At_A``/``diag_At_A``/``Xt_invA_X``/``diag_Xt_invA_X``
(used at ``src/SparseVariationalApproximationModule.jl:14-24`` and
``src/NearestNeighborsModule.jl:84-88``).  Here they are jnp/lax primitives
with a jittered-PSD guard; everything is dtype-polymorphic so the same code
runs f64 on CPU for oracle tests and f32/bf16 on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "add_jitter",
    "safe_cholesky",
    "solve_lower_triangular",
    "solve_upper_triangular",
    "cholesky_solve",
    "tril_logdet",
    "chol_logdet",
    "At_A",
    "diag_At_A",
    "Xt_invA_X",
    "diag_Xt_invA_X",
    "symmetrize",
    "blocked_tril_inv",
    "blocked_cholesky",
]


def symmetrize(A: jax.Array) -> jax.Array:
    return 0.5 * (A + jnp.swapaxes(A, -1, -2))


def add_jitter(A: jax.Array, jitter: float | jax.Array) -> jax.Array:
    n = A.shape[-1]
    return A + jitter * jnp.eye(n, dtype=A.dtype)


def safe_cholesky(A: jax.Array, jitter: float | jax.Array | None = None) -> jax.Array:
    """Lower Cholesky factor of a symmetric PSD matrix, with optional jitter.

    Mirrors ``_chol_cov(fx) = cholesky(Symmetric(cov(fx)))`` in the reference
    (``src/utils.jl:17``); the jitter there lives in the FiniteGP noise, so
    callers here usually pass ``jitter=None`` and add noise beforehand.

    Large factorizations route through :func:`blocked_cholesky`: its Schur
    updates run at explicit full precision, whereas XLA's TPU cholesky
    internals follow the *global* matmul-precision default (bf16 passes),
    which loses PSD-ness for ill-conditioned f32 Grams.
    """
    A = symmetrize(A)
    if jitter is not None:
        A = add_jitter(A, jitter)
    if A.ndim == 2 and A.shape[-1] > 256:
        return blocked_cholesky(A, base=256)
    return jnp.linalg.cholesky(A)


def solve_lower_triangular(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve L X = B for lower-triangular L (i.e. ``L \\ B``)."""
    b_vec = B.ndim == L.ndim - 1
    if b_vec:
        B = B[..., None]
    X = lax.linalg.triangular_solve(
        L, B, left_side=True, lower=True, transpose_a=False
    )
    return X[..., 0] if b_vec else X


def solve_upper_triangular(U: jax.Array, B: jax.Array) -> jax.Array:
    """Solve U X = B for upper-triangular U (i.e. ``U \\ B``)."""
    b_vec = B.ndim == U.ndim - 1
    if b_vec:
        B = B[..., None]
    X = lax.linalg.triangular_solve(
        U, B, left_side=True, lower=False, transpose_a=False
    )
    return X[..., 0] if b_vec else X


def cholesky_solve(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve (L L^T) X = B given the lower Cholesky factor L."""
    return solve_upper_triangular(jnp.swapaxes(L, -1, -2), solve_lower_triangular(L, B))


def tril_logdet(L: jax.Array) -> jax.Array:
    """log|det L| for a triangular factor L."""
    return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(L, axis1=-2, axis2=-1))), axis=-1)


def chol_logdet(L: jax.Array) -> jax.Array:
    """logdet of A = L L^T given its Cholesky factor."""
    return 2.0 * tril_logdet(L)


def At_A(A: jax.Array) -> jax.Array:
    """A^T A (AbstractGPs.At_A)."""
    return jnp.swapaxes(A, -1, -2) @ A


def diag_At_A(A: jax.Array) -> jax.Array:
    """diag(A^T A) without forming the product (AbstractGPs.diag_At_A)."""
    return jnp.sum(A * A, axis=-2)


def Xt_invA_X(L: jax.Array, X: jax.Array) -> jax.Array:
    """X^T A^{-1} X given A's lower Cholesky factor L."""
    V = solve_lower_triangular(L, X)
    return At_A(V)


def diag_Xt_invA_X(L: jax.Array, X: jax.Array) -> jax.Array:
    """diag(X^T A^{-1} X) given A's lower Cholesky factor L."""
    V = solve_lower_triangular(L, X)
    return diag_At_A(V)


def blocked_tril_inv(L: jax.Array, base: int = 128) -> jax.Array:
    """Inverse of a lower-triangular matrix by recursive 2×2 blocking:

        [[A, 0], [B, C]]⁻¹ = [[A⁻¹, 0], [−C⁻¹ B A⁻¹, C⁻¹]]

    All the O(n³) work lands in matmuls (MXU-friendly, fast to
    differentiate); only ``base``-sized diagonal blocks use the LAPACK-style
    triangular solve.  On TPU this substantially outperforms a full-size
    ``triangular_solve`` against the identity, which is latency-bound.
    """
    n = L.shape[-1]
    if n <= base:
        return lax.linalg.triangular_solve(
            L, jnp.eye(n, dtype=L.dtype), left_side=True, lower=True
        )
    half = n // 2
    # round the split to a multiple of the base tile when possible
    if half % base:
        half = max(base, (half // base) * base)
    A = L[..., :half, :half]
    B = L[..., half:, :half]
    C = L[..., half:, half:]
    Ai = blocked_tril_inv(A, base)
    Ci = blocked_tril_inv(C, base)
    # full precision: inverse accuracy feeds every downstream projection
    BAi = jnp.matmul(B, Ai, precision="highest")
    lower_left = -jnp.matmul(Ci, BAi, precision="highest")
    top = jnp.concatenate([Ai, jnp.zeros_like(L[..., :half, half:])], axis=-1)
    bottom = jnp.concatenate([lower_left, Ci], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def blocked_cholesky(A: jax.Array, base: int = 256) -> jax.Array:
    """Lower Cholesky factor by recursive 2×2 blocking (right-looking):

        A = [[A11, ·], [A21, A22]] →
        L11 = chol(A11);  L21 = A21 L11⁻ᵀ;  L22 = chol(A22 − L21 L21ᵀ)

    The panel solve uses :func:`blocked_tril_inv` so all O(n³) work is MXU
    matmuls; only ``base``-sized diagonal blocks call the XLA cholesky.
    The SURVEY.md §7 "blocked MXU Cholesky" building block.
    """
    n = A.shape[-1]
    if n <= base:
        return jnp.linalg.cholesky(A)
    half = n // 2
    if half % base:
        half = max(base, (half // base) * base)
    A11 = A[..., :half, :half]
    A21 = A[..., half:, :half]
    A22 = A[..., half:, half:]
    L11 = blocked_cholesky(A11, base)
    L11_inv = blocked_tril_inv(L11, base)
    L21 = jnp.matmul(A21, jnp.swapaxes(L11_inv, -1, -2), precision="highest")
    S = A22 - jnp.matmul(L21, jnp.swapaxes(L21, -1, -2), precision="highest")
    L22 = blocked_cholesky(S, base)
    top = jnp.concatenate([L11, jnp.zeros_like(A[..., :half, half:])], axis=-1)
    bottom = jnp.concatenate([L21, L22], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
