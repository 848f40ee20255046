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

from functools import partial

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
    "diag_quad_sym",
    "Xt_invA_X",
    "diag_Xt_invA_X",
    "symmetrize",
    "blocked_tril_inv",
    "blocked_cholesky",
    "chol_with_inv",
    "tri_project",
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

    Uses XLA's native cholesky: measured on this stack (jax 0.9 / v5e) it is
    f32-accurate bit-for-bit with the explicit full-precision-Schur
    :func:`blocked_cholesky` even at cond ~1e8, and ~2× faster at M=2048
    (the round-1 bf16-internals concern no longer reproduces).  Its native
    VJP is the efficient solve-based pullback."""
    A = symmetrize(A)
    if jitter is not None:
        A = add_jitter(A, jitter)
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
    """diag(A^T A) without forming the product (AbstractGPs.diag_At_A).

    Accumulates in at least f32 (bf16 inputs would otherwise lose
    ~sqrt(M)·eps_bf16 per entry) and returns the accumulation dtype."""
    acc = jnp.promote_types(A.dtype, jnp.float32)
    return jnp.einsum("...ij,...ij->...j", A, A, preferred_element_type=acc)


@jax.custom_vjp
def diag_quad_sym(S: jax.Array, K: jax.Array) -> jax.Array:
    """diag(Kᵀ S K) for SYMMETRIC S — one (M, M)·(M, B) matmul + a fused
    elementwise reduce (f32 accumulation).

    Matmul precision follows the production policy (``_bwd_precision``).
    The custom VJP exists for performance, not math: XLA's autodiff of the
    naive ``sum(K * (S @ K), axis=0)`` inside remat+scan nests materializes
    pathological intermediates (measured 1410 ms vs 273 ms for the whole
    streaming ELBO grad at N=2²⁰ on v5e).  Closed-form pullbacks, using
    symmetry of S:

        K̄ = 2 S (K ∘ w) = 2 (S K) ∘ w,   S̄ = (K ∘ w) Kᵀ.

    ``diag(w)`` acts on the RIGHT of K, so ``K̄`` reuses the forward's
    ``S K`` product — the backward pays ONE matmul (``S̄``), not two.

    S and K must share a dtype (the ``S̄`` cotangent is emitted at K's
    dtype without the residual carrying S).
    """
    acc = jnp.promote_types(K.dtype, jnp.float32)
    SK = _diag_quad_sym_SK(S, K)
    return jnp.einsum("ij,ij->j", K, SK, preferred_element_type=acc)


def _diag_quad_sym_SK(S, K):
    if S.dtype != K.dtype:
        raise ValueError(
            f"diag_quad_sym requires S.dtype == K.dtype, got {S.dtype} vs "
            f"{K.dtype}; cast them together at the call site"
        )
    return jnp.matmul(S, K, precision=_bwd_precision(),
                      preferred_element_type=K.dtype)


def _diag_quad_sym_fwd(S, K):
    acc = jnp.promote_types(K.dtype, jnp.float32)
    SK = _diag_quad_sym_SK(S, K)
    out = jnp.einsum("ij,ij->j", K, SK, preferred_element_type=acc)
    return out, (K, SK)


def _diag_quad_sym_bwd(res, w):
    K, SK = res
    wK = w[None, :].astype(K.dtype)
    Kw = K * wK
    S_bar = jnp.matmul(Kw, K.T, precision=_bwd_precision(),
                       preferred_element_type=K.dtype)
    K_bar = 2.0 * SK * wK
    return symmetrize(S_bar).astype(K.dtype), K_bar.astype(K.dtype)


diag_quad_sym.defvjp(_diag_quad_sym_fwd, _diag_quad_sym_bwd)


def Xt_invA_X(L: jax.Array, X: jax.Array) -> jax.Array:
    """X^T A^{-1} X given A's lower Cholesky factor L."""
    V = solve_lower_triangular(L, X)
    return At_A(V)


def diag_Xt_invA_X(L: jax.Array, X: jax.Array) -> jax.Array:
    """diag(X^T A^{-1} X) given A's lower Cholesky factor L."""
    V = solve_lower_triangular(L, X)
    return diag_At_A(V)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def blocked_tril_inv(L: jax.Array, base: int = 128) -> jax.Array:
    """Inverse of a lower-triangular matrix by recursive 2×2 blocking:

        [[A, 0], [B, C]]⁻¹ = [[A⁻¹, 0], [−C⁻¹ B A⁻¹, C⁻¹]]

    All the O(n³) work lands in matmuls (MXU-friendly); only ``base``-sized
    diagonal blocks use the LAPACK-style triangular solve.  On TPU this
    substantially outperforms a full-size ``triangular_solve`` against the
    identity, which is latency-bound.

    Custom VJP: ``L̄ = tril(−X⁻ᵀ X̄ X⁻ᵀ)`` with ``X = L⁻¹`` reused from the
    forward — two matmuls instead of differentiating the recursion (the
    round-1 backward-pass hot spot)."""
    return _blocked_tril_inv_impl(L, base)


def _blocked_tril_inv_impl(L: jax.Array, base: int = 128) -> jax.Array:
    n = L.shape[-1]
    if n <= base or L.ndim != 2 or n % base:
        return _blocked_tril_inv_recursive(L, base)
    nb = n // base
    if nb & (nb - 1):  # not a power-of-two block count
        return _blocked_tril_inv_recursive(L, base)

    # Level-batched: ONE batched triangular solve inverts every diagonal
    # base-block at once, then each doubling level combines all sibling
    # pairs with two batched matmuls:
    #     [[A, 0], [B, C]]⁻¹ = [[A⁻¹, 0], [−C⁻¹ B A⁻¹, C⁻¹]]
    # log2(n/base) levels → ~2·log2 kernel launches instead of O(n/base)
    # sequential small ops (TPU executes ops one at a time; the recursive
    # form was launch-latency-bound).
    Lr = L.reshape(nb, base, nb, base)
    diag = Lr[jnp.arange(nb), :, jnp.arange(nb), :]  # (nb, base, base)
    V = lax.linalg.triangular_solve(
        diag,
        jnp.broadcast_to(jnp.eye(base, dtype=L.dtype), (nb, base, base)),
        left_side=True,
        lower=True,
    )
    b = base
    while b < n:
        npairs = n // (2 * b)
        Lp = L.reshape(npairs, 2, b, npairs, 2, b)
        j = jnp.arange(npairs)
        B = Lp[j, 1, :, j, 0, :]  # (npairs, b, b) — sub-diagonal blocks
        Ai = V[0::2]
        Ci = V[1::2]
        BAi = jnp.matmul(B, Ai, precision="highest")
        lower_left = -jnp.matmul(Ci, BAi, precision="highest")
        top = jnp.concatenate(
            [Ai, jnp.zeros((npairs, b, b), dtype=L.dtype)], axis=-1
        )
        bottom = jnp.concatenate([lower_left, Ci], axis=-1)
        V = jnp.concatenate([top, bottom], axis=-2)  # (npairs, 2b, 2b)
        b *= 2
    return V[0]


def _blocked_tril_inv_recursive(L: jax.Array, base: int) -> jax.Array:
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
    Ai = _blocked_tril_inv_recursive(A, base)
    Ci = _blocked_tril_inv_recursive(C, base)
    # full precision: inverse accuracy feeds every downstream projection
    BAi = jnp.matmul(B, Ai, precision="highest")
    lower_left = -jnp.matmul(Ci, BAi, precision="highest")
    top = jnp.concatenate([Ai, jnp.zeros_like(L[..., :half, half:])], axis=-1)
    bottom = jnp.concatenate([lower_left, Ci], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def _bwd_precision():
    # Pullback matmuls follow the production matmul policy (bf16-accumulate
    # on TPU): cotangent accuracy is a training-noise question, not a
    # PSD-correctness question like the forward factorizations.
    from ..config import resolve_matmul_precision

    return resolve_matmul_precision()


def _tril_inv_bwd_math(Linv: jax.Array, Linv_bar: jax.Array) -> jax.Array:
    """L̄ = tril(−L⁻ᵀ L̄ᵢₙᵥ L⁻ᵀ) — the triangular-inverse pullback."""
    prec = _bwd_precision()
    LiT = jnp.swapaxes(Linv, -1, -2)
    Lbar = -jnp.matmul(LiT, jnp.matmul(Linv_bar, LiT, precision=prec),
                       precision=prec)
    return jnp.tril(Lbar)


def _blocked_tril_inv_fwd(L, base):
    Linv = _blocked_tril_inv_impl(L, base)
    return Linv, Linv


def _blocked_tril_inv_bwd(base, Linv, Linv_bar):
    return (_tril_inv_bwd_math(Linv, Linv_bar),)


blocked_tril_inv.defvjp(_blocked_tril_inv_fwd, _blocked_tril_inv_bwd)


def _phi(X: jax.Array) -> jax.Array:
    """tril with halved diagonal — the Cholesky-differential projector."""
    return jnp.tril(X) - 0.5 * jnp.tril(jnp.triu(X))


# -- triangular-aware matmuls ------------------------------------------------
# XLA's dot kernels cannot exploit a triangular factor; partitioning the
# triangular side into column (row) blocks turns C = A·L into narrowing
# dense matmuls that SKIP the structurally-zero half: flop factor
# (nb+1)/(2nb) → 0.56 at nb = 8.  Used by the chol/inv pullbacks at large M
# where the Φ-sandwich matmuls are the MXU-bound slice of the step (the
# M=8192 stretch bench).  Exact same math as the dense product — only the
# block-summation order differs (f32 noise class ~1e-7 relative).


def _tri_blocks(M: int, target: int = 1024) -> int:
    """Largest block count ≤ M/target that divides M (power-of-two probe);
    1 disables the blocking (dense fallback)."""
    nb = 1
    while (
        M % (2 * nb) == 0 and M // (2 * nb) >= target and 2 * nb <= 16
    ):
        nb *= 2
    return nb


def matmul_right_lower(A, L, precision, nb=None):
    """A @ L with L lower-triangular, skipping L's zero upper half."""
    M = L.shape[-1]
    nb = _tri_blocks(M) if nb is None else nb
    if nb == 1:
        return jnp.matmul(A, L, precision=precision)
    b = M // nb
    cols = [
        jnp.matmul(A[..., :, j * b:], L[j * b:, j * b:(j + 1) * b],
                   precision=precision)
        for j in range(nb)
    ]
    return jnp.concatenate(cols, axis=-1)


def matmul_right_upper(A, U, precision, nb=None):
    """A @ U with U upper-triangular, skipping U's zero lower half."""
    M = U.shape[-1]
    nb = _tri_blocks(M) if nb is None else nb
    if nb == 1:
        return jnp.matmul(A, U, precision=precision)
    b = M // nb
    cols = [
        jnp.matmul(A[..., :, :(j + 1) * b], U[:(j + 1) * b, j * b:(j + 1) * b],
                   precision=precision)
        for j in range(nb)
    ]
    return jnp.concatenate(cols, axis=-1)


def matmul_left_upper(U, A, precision, nb=None):
    """U @ A with U upper-triangular, skipping U's zero lower half."""
    M = U.shape[-2]
    nb = _tri_blocks(M) if nb is None else nb
    if nb == 1:
        return jnp.matmul(U, A, precision=precision)
    b = M // nb
    rows = [
        jnp.matmul(U[i * b:(i + 1) * b, i * b:], A[i * b:, ...],
                   precision=precision)
        for i in range(nb)
    ]
    return jnp.concatenate(rows, axis=-2)


def matmul_left_lower(L, A, precision, nb=None):
    """L @ A with L lower-triangular, skipping L's zero upper half."""
    M = L.shape[-2]
    nb = _tri_blocks(M) if nb is None else nb
    if nb == 1:
        return jnp.matmul(L, A, precision=precision)
    b = M // nb
    rows = [
        jnp.matmul(L[i * b:(i + 1) * b, :(i + 1) * b], A[:(i + 1) * b, ...],
                   precision=precision)
        for i in range(nb)
    ]
    return jnp.concatenate(rows, axis=-2)


def matmul_tril_out(A, B, precision, nb=None):
    """tril(A @ B) for a square (M, M) product, computing ONLY the lower
    block triangle: output row-block i contracts against B's first
    (i+1)·b columns; strictly-upper blocks are emitted as zeros without
    ever running on the MXU.  Same ~44% flop cut as the other
    triangular-aware matmuls at nb=8; the diagonal block is masked
    exactly."""
    M = A.shape[-2]
    nb = _tri_blocks(M) if nb is None else nb
    if nb == 1:
        return jnp.tril(jnp.matmul(A, B, precision=precision))
    b = M // nb
    rows = []
    for i in range(nb):
        blk = jnp.matmul(A[i * b:(i + 1) * b, :], B[..., :, :(i + 1) * b],
                         precision=precision)
        # global tril == local tril on the diagonal block
        blk = blk.at[:, i * b:].set(jnp.tril(blk[:, i * b:]))
        if (i + 1) * b < M:
            blk = jnp.concatenate(
                [blk, jnp.zeros((b, M - (i + 1) * b), blk.dtype)], axis=-1
            )
        rows.append(blk)
    return jnp.concatenate(rows, axis=-2)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def tri_project(T, X, transpose_t: bool = False):
    """Y = T @ X (or Tᵀ @ X with ``transpose_t``) for a LOWER-triangular
    (M, M) factor T and an (M, B) right operand — the SVGP projection
    matmuls A = Lk⁻¹·Kuf and BᵀA (reference
    ``SparseVariationalApproximationModule.jl:215-224``), with the
    triangular structure exploited in BOTH directions:

    - forward: narrowing block matmuls skip T's zero half (~44% of the
      flops at nb=8),
    - backward (hand VJP): the T cotangent is only ever consumed as a
      lower-triangular factor (it chains into the (L, L⁻¹) Φ-sandwich or
      the scale_tril projection), so ``T̄ = tril(Ȳ·Xᵀ)`` runs through
      :func:`matmul_tril_out` — the strictly-upper blocks are never
      computed — and ``X̄`` reuses the left-upper/lower forms.

    Exact (block-skipping, not approximation).  Callers gate on
    ``config.tri_matmul_min_m``: at M=2048 the skipped flops hide under
    HBM-bound neighbors (measured, BENCH_NOTES), at M=8192 they are the
    MXU-bound slice of the step."""
    from ..config import resolve_matmul_precision

    prec = resolve_matmul_precision(X.dtype)
    if transpose_t:
        return matmul_left_upper(jnp.swapaxes(T, -1, -2), X, prec)
    return matmul_left_lower(T, X, prec)


def _tri_project_fwd(T, X, transpose_t):
    return tri_project(T, X, transpose_t), (T, X)


def _tri_project_bwd(transpose_t, res, Ybar):
    T, X = res
    from ..config import resolve_matmul_precision

    prec = resolve_matmul_precision(X.dtype)
    if transpose_t:
        # Y = Tᵀ X:  T̄ = tril(X Ȳᵀ),  X̄ = T Ȳ
        T_bar = matmul_tril_out(X, jnp.swapaxes(Ybar, -1, -2), prec)
        X_bar = matmul_left_lower(T, Ybar, prec)
    else:
        # Y = T X:  T̄ = tril(Ȳ Xᵀ),  X̄ = Tᵀ Ȳ
        T_bar = matmul_tril_out(Ybar, jnp.swapaxes(X, -1, -2), prec)
        X_bar = matmul_left_upper(jnp.swapaxes(T, -1, -2), Ybar, prec)
    return T_bar, X_bar


tri_project.defvjp(_tri_project_fwd, _tri_project_bwd)


def _chol_bwd_from_inv(L, Linv, L_bar):
    """Ā from L̄ using L⁻¹ (Murray 2016, eq. 8 rearranged):
    Ā = sym(L⁻ᵀ Φ(Lᵀ L̄) L⁻¹) — three matmuls, no triangular solves."""
    prec = _bwd_precision()
    Lt_Lbar = jnp.matmul(jnp.swapaxes(L, -1, -2), jnp.tril(L_bar),
                         precision=prec)
    P = _phi(Lt_Lbar)
    LiT = jnp.swapaxes(Linv, -1, -2)
    Abar = jnp.matmul(LiT, jnp.matmul(P, Linv, precision=prec),
                      precision=prec)
    return symmetrize(Abar)


def _inv_chol_bwd_fused(L, J, L_bar, Linv_bar):
    """Ā for the pair (L, J=L⁻¹) = chol_with_inv(A), minimal matmuls.

    Chaining the triangular-inverse pullback into the Cholesky pullback
    (the round-2 form) costs 5 matmuls; the chain COLLAPSES: from the
    forward differential dJ = −Φ(J dA Jᵀ) J, the adjoint of the whole pair
    is one Φ-sandwich,

        Ā = sym(Jᵀ Φ(Lᵀ tril(L̄) − J̄ Jᵀ) J)

    — 3 matmuls when only J̄ is present (the whitened SVGP path; at
    M=8192 the two saved (M,M)² matmuls are 12.6 ms of the step), 4 with
    both cotangents.  Verified exact vs the chained form and vs autodiff
    of a reference implementation (machine precision, f64).  Pass None
    for an absent cotangent."""
    prec = _bwd_precision()
    M = L.shape[-1]
    # triangular-aware blocking: every factor here is triangular (Lᵀ/Jᵀ
    # upper, J lower, P = Φ(·) lower), so the narrowing block matmuls skip
    # ~44% of the flops at nb=8.  Worth it only where the sandwich is the
    # MXU-bound slice (large M); gated by config.tri_matmul_min_m.
    from ..config import config

    tri = L.ndim == 2 and M >= getattr(config, "tri_matmul_min_m", 4096)
    inner = None
    if L_bar is not None:
        Lt = jnp.swapaxes(L, -1, -2)
        tl = jnp.tril(L_bar)
        inner = (matmul_left_upper(Lt, tl, prec) if tri
                 else jnp.matmul(Lt, tl, precision=prec))
    if Linv_bar is not None:
        Jt = jnp.swapaxes(J, -1, -2)
        t = (matmul_right_upper(Linv_bar, Jt, prec) if tri
             else jnp.matmul(Linv_bar, Jt, precision=prec))
        inner = -t if inner is None else inner - t
    if inner is None:
        return jnp.zeros_like(L)
    P = _phi(inner)
    JT = jnp.swapaxes(J, -1, -2)
    if tri:
        return symmetrize(matmul_left_upper(JT, matmul_right_lower(P, J, prec), prec))
    return symmetrize(
        jnp.matmul(JT, jnp.matmul(P, J, precision=prec), precision=prec)
    )


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def blocked_cholesky(A: jax.Array, base: int = 256) -> jax.Array:
    """Lower Cholesky factor by recursive 2×2 blocking (right-looking):

        A = [[A11, ·], [A21, A22]] →
        L11 = chol(A11);  L21 = A21 L11⁻ᵀ;  L22 = chol(A22 − L21 L21ᵀ)

    The panel solve uses :func:`blocked_tril_inv` so all O(n³) work is MXU
    matmuls; only ``base``-sized diagonal blocks call the XLA cholesky.
    The SURVEY.md §7 "blocked MXU Cholesky" building block.

    Custom VJP: the standard Cholesky pullback computed with two triangular
    solves — O(n³) like XLA's, but crucially NOT a differentiation of the
    recursion above (which was the round-1 backward hot spot).  When the
    inverse is needed anyway, use :func:`chol_with_inv` for a matmul-only
    pullback."""
    return _blocked_cholesky_impl(A, base)


def _blocked_cholesky_impl(A: jax.Array, base: int = 256) -> jax.Array:
    n = A.shape[-1]
    if n <= base:
        return jnp.linalg.cholesky(A)
    half = n // 2
    if half % base:
        half = max(base, (half // base) * base)
    A11 = A[..., :half, :half]
    A21 = A[..., half:, :half]
    A22 = A[..., half:, half:]
    L11 = _blocked_cholesky_impl(A11, base)
    L11_inv = _blocked_tril_inv_impl(L11, base)
    L21 = jnp.matmul(A21, jnp.swapaxes(L11_inv, -1, -2), precision="highest")
    S = A22 - jnp.matmul(L21, jnp.swapaxes(L21, -1, -2), precision="highest")
    L22 = _blocked_cholesky_impl(S, base)
    top = jnp.concatenate([L11, jnp.zeros_like(A[..., :half, half:])], axis=-1)
    bottom = jnp.concatenate([L21, L22], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def _blocked_cholesky_fwd(A, base):
    L = _blocked_cholesky_impl(A, base)
    return L, L


def _blocked_cholesky_bwd(base, L, L_bar):
    # Ā = sym(L⁻ᵀ Φ(Lᵀ L̄) L⁻¹) via two triangular solves (no inverse stored)
    P = _phi(jnp.matmul(jnp.swapaxes(L, -1, -2), jnp.tril(L_bar),
                        precision="highest"))
    # X = L⁻ᵀ P  (solve Lᵀ X = P)
    X = lax.linalg.triangular_solve(L, P, left_side=True, lower=True,
                                    transpose_a=True)
    # Ā = X L⁻¹  (solve Ā L = X from the right)
    Abar = lax.linalg.triangular_solve(L, X, left_side=False, lower=True,
                                       transpose_a=False)
    return (symmetrize(Abar),)


blocked_cholesky.defvjp(_blocked_cholesky_fwd, _blocked_cholesky_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def chol_with_inv(A: jax.Array, base: int = 256) -> tuple[jax.Array, jax.Array]:
    """Fused ``(L, L⁻¹) = (chol(sym(A)), tril_inv(L))`` with a matmul-only
    custom VJP.  Add any jitter to ``A`` BEFORE calling (keeps it
    differentiable).

    This is the SVGP hot-path factorization (``solve_mode="inv_matmul"``):
    the forward already pays for L⁻¹, so the Cholesky pullback
    ``Ā = sym(L⁻ᵀ Φ(Lᵀ L̄) L⁻¹)`` and the inverse pullback
    ``L̄ += tril(−L⁻ᵀ L̄ᵢₙᵥ L⁻ᵀ)`` are five MXU matmuls total — no
    triangular solves and no recursion in the backward graph."""
    return _chol_with_inv_impl(A, base)


def _pallas_chol_gates(A) -> bool:
    """Config/backend/dtype gates shared by the direct Pallas dispatch and
    the split recursion: TPU (or forced interpret), f32/bf16, Pallas
    allowed."""
    from ..config import config

    if A.ndim != 2 or not config.use_pallas:
        return False
    mode = getattr(config, "chol_mode", "auto")
    if mode == "xla":
        return False
    if mode == "auto":
        # auto engages only on the real TPU for the fast dtypes; explicit
        # "pallas" skips these gates (interpret mode handles f64/CPU — the
        # oracle-suite route for exercising the kernel math)
        import jax as _jax

        if _jax.default_backend() != "tpu":
            return False
        if jnp.dtype(A.dtype) not in (jnp.dtype(jnp.float32),
                                      jnp.dtype(jnp.bfloat16)):
            return False
    return True


def _panel_chol_eligible(A):
    """Static dispatch for the fused streamed-panel Pallas (L, L⁻¹) kernel:
    gates above + supported shape.  Returns the panel width to use, or
    None."""
    if not _pallas_chol_gates(A):
        return None
    from ..ops.panel_chol import chol_inv_supported

    M = A.shape[-1]
    # panel must itself be lane-aligned (128); 64-wide panels compile only
    # in interpret mode (Mosaic rejects 64-wide lane slices on hardware)
    if chol_inv_supported(M, A.dtype, 128):
        return 128
    return None


def _split_reaches_pallas(A) -> bool:
    """True when recursively halving A's dimension reaches a Pallas-eligible
    size — the dispatch test for :func:`_chol_inv_split`.  (M=8192 halves
    to 4096 — still over the kernel's VMEM budget — then to 2048, which is
    eligible; odd or sub-256 sizes stop the recursion.)"""
    if not _pallas_chol_gates(A):
        return False
    from ..ops.panel_chol import chol_inv_supported

    m = A.shape[-1]
    while m % 2 == 0 and m >= 2 * 256:
        m //= 2
        if chol_inv_supported(m, A.dtype, 128):
            return True
    return False


def _chol_inv_split(A, base):
    """(L, L⁻¹) by one 2×2 blocked step (right-looking), recursing until the
    fused streamed-panel Pallas kernel takes over (VERDICT r2: the M=8192
    factorization gate).  All glue is MXU matmuls:

        A = [[A11, ·], [A21, A22]]
        (L11, J11) = rec(A11);  L21 = A21 J11ᵀ;  S = A22 − L21 L21ᵀ
        (L22, J22) = rec(S);    J21 = −J22 (L21 J11)

    The glue precision is ``config.chol_split_precision`` — the measured
    v5e f32 Pareto for (L, L⁻¹)(8192), vs 39.1 ms for the XLA
    chol + level-batched-inverse route (f64-oracle relative errors):

        "highest" (6-pass)  26.6 ms   ‖L−L₆₄‖/‖L₆₄‖ ≈ 1.0e-7
        "high"    (3-pass)  16.3 ms                 ≈ 4.4e-6   ← default
        "default" (bf16)     8.7 ms                 ≈ 7.9e-4

    "high" keeps near-native-f32 factors (a jitter-1e-6 gram already sits
    at the 1e-5 noise class after √cond amplification) at 2.4× the XLA
    speed; "default" is available when the factor only feeds
    bf16-precision projections anyway, but its ~1e-3 Schur-complement
    noise can break PSD-ness for sharply-conditioned grams (the natgrad
    failure class) — not worth it as a default."""
    from ..config import config

    hp = {
        "highest": lax.Precision.HIGHEST,
        "high": lax.Precision.HIGH,
        "default": lax.Precision.DEFAULT,
    }[getattr(config, "chol_split_precision", "high")]
    M = A.shape[-1]
    half = M // 2
    A11 = A[:half, :half]
    A21 = A[half:, :half]
    A22 = A[half:, half:]
    L11, J11 = _chol_with_inv_impl(A11, base)
    L21 = jnp.matmul(A21, J11.T, precision=hp)
    S = symmetrize(A22 - jnp.matmul(L21, L21.T, precision=hp))
    L22, J22 = _chol_with_inv_impl(S, base)
    J21 = -jnp.matmul(J22, jnp.matmul(L21, J11, precision=hp), precision=hp)
    zero = jnp.zeros((half, M - half), A.dtype)
    L = jnp.block([[L11, zero], [L21, L22]])
    J = jnp.block([[J11, zero], [J21, J22]])
    return L, J


def _chol_with_inv_impl(A, base):
    A = symmetrize(A)
    panel = _panel_chol_eligible(A)
    # Measured dead end (r3): preferring a 2×2 split with 1024-leaves at
    # M=2048 wins in ISOLATION (0.47 vs 0.65 ms) but ZERO in the step (the
    # factorization hides under HBM-bound neighbors), and the deeper
    # recursion it induces at M=8192 (leaves 2048 → 1024) REGRESSES the
    # stretch step 111.8 → 131.8 ms (extra HIGH-glue levels).  Direct
    # kernel stays preferred whenever eligible.
    if panel is not None:
        # fused streamed-panel Pallas kernel: one pass produces BOTH L and
        # L⁻¹ (measured v5e M=2048 f32: 0.61 ms vs 1.12 ms for XLA chol +
        # level-batched tril-inv in the same chained harness)
        from ..ops.panel_chol import pallas_chol_inv

        return pallas_chol_inv(A, panel=panel)
    if _split_reaches_pallas(A):
        return _chol_inv_split(A, base)
    L = jnp.linalg.cholesky(A)  # f32-accurate on this stack; see safe_cholesky
    if A.ndim == 2 and A.shape[-1] > base:
        Linv = _blocked_tril_inv_impl(L, min(base, 128))
    else:
        Linv = lax.linalg.triangular_solve(
            L, jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape),
            left_side=True, lower=True,
        )
    return L, Linv


def _chol_with_inv_fwd(A, base):
    L, Linv = _chol_with_inv_impl(A.value, base)
    return (L, Linv), (L, Linv)


def _chol_with_inv_bwd(base, res, cts):
    from jax.custom_derivatives import SymbolicZero

    L, Linv = res
    L_bar, Linv_bar = cts
    # symbolic zeros: in the whitened SVGP path only L⁻¹ carries a cotangent
    # (Kuu_L is cached but unused), so the L̄ branch vanishes entirely.
    Lb = None if isinstance(L_bar, SymbolicZero) else L_bar
    Jb = None if isinstance(Linv_bar, SymbolicZero) else Linv_bar
    return (_inv_chol_bwd_fused(L, Linv, Lb, Jb),)


chol_with_inv.defvjp(_chol_with_inv_fwd, _chol_with_inv_bwd, symbolic_zeros=True)
