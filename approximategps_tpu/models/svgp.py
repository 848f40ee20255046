"""Sparse variational GP approximation (SVGP).

TPU-native re-design of the reference's
``src/SparseVariationalApproximationModule.jl`` (375 LoC): Hensman et al.
(2015) SVGP with the two parametrizations ``Centered`` (unwhitened,
reference ``:41``) and ``NonCentered`` (whitened, reference ``:57``, the
default ``:93-95``).

Semantics carried over exactly (posterior cache ``(Kuu_chol, B, α)``,
predictive formulas via the projection ``A = Lk⁻¹ Kuf``, minibatch-scaled
ELBO, closed-form whitened KL); mechanisms are TPU-first: everything is one
jittable graph, Gram matrices ride the MXU, and the O(M²·B) projection can
run as a pure matmul (precomputed ``Lk⁻¹``) so XLA tiles it onto the
systolic array.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config, resolve_matmul_precision, resolve_solve_mode
from ..core import linalg
from ..core.distributions import MultivariateNormal, kl_divergence
from ..core.gp import AbstractGP, FiniteGP, LatentFiniteGP
from ..core.kernels import as_points
from ..core.likelihoods import GaussianLikelihood
from ..core.pytrees import pytree_dataclass, static_field
from ..core.quadrature import DefaultExpectationMethod, expected_loglikelihood
from .api import approx_lml, posterior

__all__ = [
    "Centered",
    "NonCentered",
    "SparseVariationalApproximation",
    "SVGPPosterior",
    "elbo",
    "prior_kl",
    "inducing_points",
    "SVGP",
]


class _Parametrization:
    def __eq__(self, other):
        return type(self) is type(other)

    def __hash__(self):
        return hash(type(self))

    def __repr__(self):
        return f"{type(self).__name__}()"


class Centered(_Parametrization):
    """Unwhitened parametrization: ``q`` is the approximate posterior over the
    pseudo-points directly (reference ``:28-41``)."""


class NonCentered(_Parametrization):
    """Whitened parametrization: ``q`` is over
    ``cholesky(cov(u)).L \\ (u - mean(u))`` (reference ``:43-57``)."""


@pytree_dataclass
class SparseVariationalApproximation:
    """Packages the inducing-point prior ``fz = f(z, jitter)`` and the
    variational distribution ``q`` (reference struct at ``:59-62``).

    ``SparseVariationalApproximation(fz, q)`` defaults to NonCentered
    (reference ``:93-95``)."""

    fz: FiniteGP
    q: MultivariateNormal
    parametrization: _Parametrization = static_field(default_factory=NonCentered)


def SVGP(fz: FiniteGP, q: MultivariateNormal) -> SparseVariationalApproximation:
    """Deprecated alias (reference ``src/deprecations.jl:1``): Centered SVGP."""
    import warnings

    warnings.warn(
        "SVGP(fz, q) is deprecated; use "
        "SparseVariationalApproximation(fz, q, Centered())",
        DeprecationWarning,
        stacklevel=2,
    )
    return SparseVariationalApproximation(fz, q, Centered())


@pytree_dataclass
class _SVGPCache:
    """Posterior data cache — reference ``data = (Kuu=..., B=..., α=...)`` at
    ``:134`` / ``:185``.  ``Lk_inv`` is the optional precomputed inverse
    Cholesky factor enabling the matmul-only projection path on TPU."""

    Kuu_L: jax.Array
    B: jax.Array
    alpha: jax.Array
    Lk_inv: jax.Array | None = None
    # S = Lk⁻ᵀ(BBᵀ−I)Lk⁻¹ — the posterior-covariance correction formed at
    # M×M scale, so marginal variances need ONE (M, B) projection matmul
    # (diag(KufᵀS Kuf)) instead of two (A = Lk⁻¹Kuf and BᵀA); the backward
    # pass saves two more.  Algebraically identical to −AᵀA + (BᵀA)ᵀ(BᵀA).
    S_corr: jax.Array | None = None


def _storage_dtype(dtype, M=None):
    """bf16 storage dtype for the big projection intermediates, or None.

    ``config.compute_dtype``:
    - "auto" (default): bf16 storage on TPU for f32 inputs at
      M >= ``bf16_storage_min_m`` — where the (M, B) projections' HBM traffic
      is the step's floor it wins (M=8192 step 80.0 → 74.9 ms measured),
      while at M=2048 it is a wash (3.42 vs 3.50 ms A/B, re-measured r4
      after the pullback collapse) so f32 stays;
    - "bfloat16": force bf16 storage for f32 inputs at any size;
    - "float32": full-width storage everywhere.

    f64 oracle mode is never downcast.  Accuracy class under bf16 storage
    is 1e-3 relative (pinned by ``test_bf16_compute_dtype_accuracy``);
    master params, factorizations, KL and all reductions stay f32."""
    mode = config.compute_dtype
    if dtype != jnp.float32:
        return None
    if mode == "bfloat16":
        return jnp.bfloat16
    if mode == "auto":
        import jax

        if (
            jax.default_backend() == "tpu"
            and M is not None
            and M >= getattr(config, "bf16_storage_min_m", 4096)
        ):
            return jnp.bfloat16
    return None


def _matvec_f32(a, b):
    """a @ b with accumulation in (at least) f32 even for bf16 storage."""
    acc = jnp.promote_types(jnp.promote_types(a.dtype, b.dtype), jnp.float32)
    return jnp.matmul(a, b, preferred_element_type=acc).astype(acc)


def _tri_proj(M: int) -> bool:
    """Gate for the triangular-aware projection matmuls (`linalg.
    tri_project`): only where the (M, B) projections are MXU-bound (large
    M).  Forced on at M=2048 the skipped flops hide under HBM-bound
    neighbors (measured — same crossover as the Φ-sandwich blocking,
    BENCH_NOTES); both share ``config.tri_matmul_min_m``.  (Sizes where
    ``_tri_blocks`` picks nb=1 still run through the custom VJP — dense
    forward, tril-only pullback.)"""
    return M >= getattr(config, "tri_matmul_min_m", 4096)


@pytree_dataclass
class SVGPPosterior(AbstractGP):
    """ApproxPosteriorGP{SparseVariationalApproximation} with the prediction
    methods of reference ``:208-264``."""

    approx: SparseVariationalApproximation
    cache: _SVGPCache

    @property
    def prior(self) -> AbstractGP:
        return self.approx.fz.f

    def inducing_points(self) -> jax.Array:
        return self.approx.fz.x

    # A = Lk⁻¹ Ku* — the projection matrix (reference `_A_and_Kuf`, :215-219)
    def _A_and_Kuf(self, x):
        Kuf = self.prior.cov(self.inducing_points(), x)
        if self.cache.Lk_inv is not None:
            dt = _storage_dtype(Kuf.dtype, Kuf.shape[0])
            if dt is not None:
                # bf16 storage: the cast fuses into the Gram producer, so the
                # (M, B) intermediates hit HBM at half width; the MXU still
                # accumulates f32 internally
                Kuf = Kuf.astype(dt)
                if _tri_proj(Kuf.shape[0]):
                    A = linalg.tri_project(self.cache.Lk_inv.astype(dt), Kuf)
                else:
                    A = jnp.matmul(
                        self.cache.Lk_inv.astype(dt), Kuf,
                        preferred_element_type=dt,
                    )
            elif _tri_proj(Kuf.shape[0]):
                # large-M MXU-bound projection: triangular-aware blocked
                # matmul + tril-only hand pullback (~44% flop cut each way)
                A = linalg.tri_project(self.cache.Lk_inv, Kuf)
            else:
                A = jnp.matmul(
                    self.cache.Lk_inv, Kuf,
                    precision=resolve_matmul_precision(Kuf.dtype),
                )
        else:
            A = linalg.solve_lower_triangular(self.cache.Kuu_L, Kuf)
        return A, Kuf

    def mean(self, x):
        Kuf = self.prior.cov(self.inducing_points(), x)
        return self.prior.mean(x) + _matvec_f32(Kuf.T, self.cache.alpha)

    def _BtA(self, A):
        dt = _storage_dtype(self.cache.B.dtype, self.cache.B.shape[0])
        if _tri_proj(A.shape[0]):
            # cache.B is exactly lower-triangular: _posterior_svgp trils
            # scale_tril once at build time (NonCentered), and the Centered
            # B = Lk⁻¹·tril(Lq) is a product of lower factors
            B = self.cache.B
            if dt is not None and A.dtype == dt:
                B = B.astype(dt)
            return linalg.tri_project(B, A, True)
        if dt is not None and A.dtype == dt:
            return jnp.matmul(self.cache.B.T.astype(dt), A, preferred_element_type=dt)
        return jnp.matmul(self.cache.B.T, A,
                          precision=resolve_matmul_precision(A.dtype))

    def cov(self, x, z=None):
        Ax, _ = self._A_and_Kuf(x)
        if z is None:
            return (
                self.prior.cov(x)
                - linalg.At_A(Ax)
                + linalg.At_A(self._BtA(Ax))
            )
        Az, _ = self._A_and_Kuf(z)
        return (
            self.prior.cov(x, z)
            - Ax.T @ Az
            + self._BtA(Ax).T @ self._BtA(Az)
        )

    def _var_via_S(self, x, Kuf=None):
        """prior.var + diag(Kufᵀ S Kuf) — the single-projection variance,
        through the closed-form-pullback :func:`linalg.diag_quad_sym` (S is
        symmetric by construction; XLA autodiff of the naive form
        materializes pathological intermediates in remat/scan nests)."""
        if Kuf is None:
            Kuf = self.prior.cov(self.inducing_points(), x)
        S = self.cache.S_corr
        dt = _storage_dtype(Kuf.dtype, Kuf.shape[0])
        if dt is not None:
            corr = linalg.diag_quad_sym(S.astype(dt), Kuf.astype(dt))
        else:
            corr = linalg.diag_quad_sym(S, Kuf)
        return (self.prior.var(x) + corr).astype(Kuf.dtype), Kuf

    def var(self, x):
        if self.cache.S_corr is not None:
            return self._var_via_S(x)[0]
        A, _ = self._A_and_Kuf(x)
        return (
            self.prior.var(x)
            - linalg.diag_At_A(A)
            + linalg.diag_At_A(self._BtA(A))
        )

    def mean_and_cov(self, x):
        A, Kuf = self._A_and_Kuf(x)
        mu = self.prior.mean(x) + _matvec_f32(Kuf.T, self.cache.alpha)
        S = self.prior.cov(x) - linalg.At_A(A) + linalg.At_A(self._BtA(A))
        return mu, S

    def mean_and_var(self, x):
        if self.cache.S_corr is not None:
            v, Kuf = self._var_via_S(x)
            mu = self.prior.mean(x) + _matvec_f32(Kuf.T, self.cache.alpha)
            return mu, v
        A, Kuf = self._A_and_Kuf(x)
        mu = self.prior.mean(x) + _matvec_f32(Kuf.T, self.cache.alpha)
        v = (
            self.prior.var(x)
            - linalg.diag_At_A(A)
            + linalg.diag_At_A(self._BtA(A))
        )
        return mu, v

    def predict_blocks(self, xs, block_size: int = 16384):
        """(mean, var) sweep over a LARGE test set (the serving path,
        VERDICT r2 item 4): a ``lax.scan`` over test blocks, each block
        through the fused Pallas data-term epilogue when available — the
        (M, B) cross-covariance and S·K intermediates then live only in
        VMEM, so HBM traffic is O(N*·(D+2)) (inputs + mean/var out)
        instead of the XLA path's O(N*·M) per-block projection
        intermediates.  Falls back to :meth:`mean_and_var` per block
        off-TPU / for non-decomposable kernels."""
        from ..core.kernels import as_points as _pts

        X = _pts(xs)
        n = X.shape[0]
        bs = min(block_size, n)
        pad = (-n) % bs
        Xp = (
            jnp.concatenate([X, jnp.broadcast_to(X[:1], (pad, X.shape[1]))])
            if pad else X
        )
        blocks = Xp.reshape(-1, bs, X.shape[1])
        z = self.inducing_points()
        alpha, S_corr = self.cache.alpha, self.cache.S_corr
        use_fused = (
            _epilogue_ready(self.prior, S_corr, prefer=True) is not None
        )

        def one(_, block):
            if use_fused:
                mu, var = _epilogue_mu_var(
                    self.prior, z, block, alpha, S_corr, prefer=True
                )
            else:
                mu, var = self.mean_and_var(block)
            return _, (mu, var)

        _, (mu, var) = jax.lax.scan(one, 0, blocks)
        return mu.reshape(-1)[:n], var.reshape(-1)[:n]


def inducing_points(f_post: SVGPPosterior) -> jax.Array:
    """Reference ``inducing_points`` accessor (``:270``)."""
    return f_post.inducing_points()


def _cache_tail(J, Lq, m):
    """(α, C0, S) from J = Lk⁻¹ — the tail of the whitened-cache build,
    shared by the plain and gram-fused composites (primal AND fwd)."""
    prec = resolve_matmul_precision(m.dtype)
    alpha = J.T @ m
    C0 = jnp.matmul(Lq, Lq.T, precision=prec) - jnp.eye(
        Lq.shape[-1], dtype=Lq.dtype
    )
    S = jnp.matmul(J.T, jnp.matmul(C0, J, precision=prec), precision=prec)
    return alpha, C0, S


def _cache_chol_cotangents(Lk, J, C0, Lq, m, cts):
    """(K̄uu-or-None, L̄q, m̄) for the whitened-cache composites — the
    cache-tail cotangent assembly chained into the (L, J) → K̄uu
    Φ-sandwich.

    Fast path (the training step: only ``dalpha``/``dS`` live, ``dLk``/
    ``dJ`` symbolic zeros): the J̄ chain COLLAPSES by associativity —
    ``inner = −J̄ Jᵀ = −(C0 P + m⊗dα) Jᵀ = −C0 Q − m⊗m̄`` with
    ``Q = P Jᵀ`` already needed for L̄q — so J̄ is never materialized and
    the whole pullback is 6 M³ matmuls instead of 7 (P, Q, L̄q, C0 Q,
    Φ-sandwich ×2).  General cotangents fall back to the 7-matmul
    assembly + :func:`linalg._inv_chol_bwd_fused`."""
    from jax.custom_derivatives import SymbolicZero

    from ..core.linalg import (
        _bwd_precision,
        _inv_chol_bwd_fused,
        _phi,
        matmul_left_upper,
        matmul_right_lower,
        symmetrize,
    )

    dLk, dJ, dalpha, dS = cts
    if (
        isinstance(dLk, SymbolicZero)
        and isinstance(dJ, SymbolicZero)
        and not isinstance(dS, SymbolicZero)
    ):
        prec = resolve_matmul_precision(Lq.dtype)
        bprec = _bwd_precision()
        M = Lq.shape[-1]
        tri = Lq.ndim == 2 and M >= getattr(config, "tri_matmul_min_m", 4096)
        dSs = dS + dS.T
        P = jnp.matmul(J, dSs, precision=prec)
        Q = jnp.matmul(P, J.T, precision=prec)  # = J dSs Jᵀ, symmetric
        Lq_bar = jnp.matmul(Q, Lq, precision=prec)
        inner = -jnp.matmul(C0, Q, precision=bprec)
        if not isinstance(dalpha, SymbolicZero):
            m_bar = jnp.matmul(J, dalpha, precision=prec)
            inner = inner - m[:, None] * m_bar[None, :]
        else:
            m_bar = jnp.zeros_like(m)
        Ph = _phi(inner)
        if tri:
            Kuu_bar = symmetrize(
                matmul_left_upper(J.T, matmul_right_lower(Ph, J, bprec), bprec)
            )
        else:
            Kuu_bar = symmetrize(
                jnp.matmul(
                    J.T, jnp.matmul(Ph, J, precision=bprec), precision=bprec
                )
            )
        return Kuu_bar, Lq_bar, m_bar
    Lk_bar, J_bar, Lq_bar, m_bar = _cache_tail_cotangents(J, C0, Lq, m, cts)
    if Lk_bar is None and J_bar is None:
        return None, Lq_bar, m_bar
    return _inv_chol_bwd_fused(Lk, J, Lk_bar, J_bar), Lq_bar, m_bar


def _cache_tail_cotangents(J, C0, Lq, m, cts):
    """Shared cotangent assembly for the whitened-cache composites: from
    the output cotangents ``(dLk, dJ, dalpha, dS)`` build
    ``(Lk̄-or-None, J̄-or-None, L̄q, m̄)``, reusing ``P = J·dSs`` across the
    C0-, Lq- and J-cotangents (the minimal 5-matmul assembly)."""
    from jax.custom_derivatives import SymbolicZero

    dLk, dJ, dalpha, dS = cts
    prec = resolve_matmul_precision(Lq.dtype)
    J_bar = None
    Lq_bar = jnp.zeros_like(Lq)
    m_bar = jnp.zeros_like(m)
    if not isinstance(dS, SymbolicZero):
        dSs = dS + dS.T
        P = jnp.matmul(J, dSs, precision=prec)
        Q = jnp.matmul(P, J.T, precision=prec)  # = C0̄ + C0̄ᵀ
        Lq_bar = jnp.matmul(Q, Lq, precision=prec)
        J_bar = jnp.matmul(C0, P, precision=prec)
    if not isinstance(dalpha, SymbolicZero):
        r1 = m[:, None] * dalpha[None, :]
        J_bar = r1 if J_bar is None else J_bar + r1
        m_bar = jnp.matmul(J, dalpha, precision=prec)
    if not isinstance(dJ, SymbolicZero):
        J_bar = dJ if J_bar is None else J_bar + dJ
    Lk_bar = None if isinstance(dLk, SymbolicZero) else dLk
    return Lk_bar, J_bar, Lq_bar, m_bar


@jax.custom_vjp
def _whitened_cache_fused(Kuu, Lq, m):
    """NonCentered posterior cache ``(Lk, J=Lk⁻¹, α=Jᵀm, S=Jᵀ(LqLqᵀ−I)J)``
    in one composite with a hand-derived minimal pullback.

    XLA autodiff of the three-matmul S build plus the chol/inv rules costs
    ~11 M×M backward matmuls; this pullback does it in 7, reusing
    ``P = J·dS_sym`` across the C0-, Lq- and J-cotangents and collapsing
    the (L̄k, J̄) → K̄uu chain into one Φ-sandwich:

        dSs = dS + dSᵀ;  P = J dSs;  L̄q = (P Jᵀ) Lq;
        J̄  = C0 P + m⊗dα + dJ;      m̄ = J dα;
        K̄uu = sym(Jᵀ Φ(Lkᵀ tril(dLk) − J̄ Jᵀ) J).

    Ablation-driven (round 2): the posterior build was 2.5 ms of the 4.6 ms
    headline step at only ~72 TF/s effective; the data term already runs at
    MXU peak.  Forward is identical to the unfused path (same op sequence),
    so numerics don't change."""
    from ..core.linalg import _chol_with_inv_impl

    Lk, J = _chol_with_inv_impl(Kuu, 256)
    alpha, _, S = _cache_tail(J, Lq, m)
    return Lk, J, alpha, S


def _whitened_cache_fwd(Kuu, Lq, m):
    from ..core.linalg import _chol_with_inv_impl

    Lk, J = _chol_with_inv_impl(Kuu.value, 256)
    alpha, C0, S = _cache_tail(J, Lq.value, m.value)
    return (Lk, J, alpha, S), (Lk, J, C0, Lq.value, m.value)


def _whitened_cache_bwd(res, cts):
    Lk, J, C0, Lq, m = res
    # (L̄k, J̄) → K̄uu in one fused Φ-sandwich; on the training-step path
    # (only dα/dS live) the collapsed 6-matmul form never builds J̄
    Kuu_bar, Lq_bar, m_bar = _cache_chol_cotangents(Lk, J, C0, Lq, m, cts)
    if Kuu_bar is None:
        Kuu_bar = jnp.zeros_like(C0)
    return Kuu_bar, Lq_bar, m_bar


_whitened_cache_fused.defvjp(
    _whitened_cache_fwd, _whitened_cache_bwd, symbolic_zeros=True
)


# -- gram-fused variant: Kuu never materialized in HBM ----------------------


def _gram_chol_parts(fz, dtype):
    """Static dispatch test for the gram-fused posterior build: the prior
    kernel unwraps to ``σ²·g(r²(s·z))``, the jitter is isotropic, and the
    fused gram→(L, L⁻¹) panel kernel supports (M, D, dtype).  Returns
    ``((k_of_r2, scale, variance), z_points)`` or None.  Mirrors
    ``linalg._pallas_chol_gates`` (chol_mode 'auto' engages only on real
    TPU f32/bf16; 'pallas' forces interpret mode for the oracle suite)."""
    if not config.use_pallas or getattr(config, "gram_chol", "auto") == "off":
        return None
    mode = getattr(config, "chol_mode", "auto")
    if mode == "xla":
        return None
    if mode == "auto":
        if jax.default_backend() != "tpu":
            return None
        if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                    jnp.dtype(jnp.bfloat16)):
            return None
    if jnp.ndim(fz.noise) != 0:
        return None
    from ..core.kernels import unwrap_stationary

    parts = unwrap_stationary(fz.f.kernel)
    if parts is None:
        return None
    from ..ops.panel_chol import gram_chol_inv_supported

    zp = as_points(fz.x)
    if not gram_chol_inv_supported(zp.shape[0], zp.shape[1], dtype, 128):
        return None
    return parts, zp


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _whitened_cache_fused_gram(Zs, v2, jitter, Lq, m, k_of_r2):
    """`_whitened_cache_fused` with the Kuu Gram GENERATED inside the
    streamed-panel factorization kernel (``ops.panel_chol
    .pallas_gram_chol_inv``): the separate gram build, its σ²/jitter
    elementwise passes, and the M×M HBM write+read disappear from the
    forward.  The backward pays one extra Gram recompute (exact broadcast
    r², ``dk_from_k`` shortcut when the kernel map provides it) to chain
    ``K̄uu → (Z̄s, σ̄², jitter̄)`` — the same recompute class the fused
    data-term epilogue uses."""
    from ..ops.panel_chol import pallas_gram_chol_inv

    Lk, J = pallas_gram_chol_inv(Zs, v2, jitter, k_of_r2)
    alpha, _, S = _cache_tail(J, Lq, m)
    return Lk, J, alpha, S


def _whitened_cache_gram_fwd(Zs, v2, jitter, Lq, m, k_of_r2):
    from ..ops.panel_chol import pallas_gram_chol_inv

    Lk, J = pallas_gram_chol_inv(Zs.value, v2.value, jitter.value, k_of_r2)
    alpha, C0, S = _cache_tail(J, Lq.value, m.value)
    return (Lk, J, alpha, S), (
        Lk, J, C0, Lq.value, m.value, Zs.value, v2.value
    )


def _whitened_cache_gram_bwd(k_of_r2, res, cts):
    Lk, J, C0, Lq, m, Zs, v2 = res
    prec = resolve_matmul_precision(Lq.dtype)
    Kuu_bar, Lq_bar, m_bar = _cache_chol_cotangents(Lk, J, C0, Lq, m, cts)
    zero_scalar = jnp.zeros((), Zs.dtype)
    if Kuu_bar is None:
        return jnp.zeros_like(Zs), zero_scalar, zero_scalar, Lq_bar, m_bar

    # Gram pullback: K̄uu → (Z̄s, σ̄², jitter̄).  The r² recompute uses the
    # MXU identity: the PSD policy (exact broadcast distances) applies to
    # FACTORIZATION inputs — this r² only feeds the pullback weights W,
    # where the identity's eps·max|z−c|² noise is ordinary gradient noise,
    # and the broadcast form's (M, M, D) intermediate is real HBM traffic
    # when XLA declines to fuse it inside the step graph (measured: the
    # full headline step regressed 0.2 ms with the broadcast recompute).
    # Symmetric-input rule: both the i- and j-slots carry Zs, so
    # Z̄s = 2[(rowsum(Ws))∘Zs − Ws·Zs] with Ws = W + Wᵀ.
    from ..core.kernels import dk_from_k_for, pairwise_sq_dist

    r2 = pairwise_sq_dist(Zs, Zs, mode="mxu")
    dk = dk_from_k_for(k_of_r2)
    K0 = k_of_r2(r2)
    if dk is not None:
        gprime = dk(K0)
    else:
        _, pull = jax.vjp(k_of_r2, r2)
        (gprime,) = pull(jnp.ones_like(r2))
    W = Kuu_bar * (v2 * gprime)
    Ws = W + W.T
    Zs_bar = 2.0 * (
        jnp.sum(Ws, axis=1)[:, None] * Zs - jnp.matmul(Ws, Zs, precision=prec)
    )
    v2_bar = jnp.sum(Kuu_bar * K0).astype(Zs.dtype)
    jitter_bar = jnp.trace(Kuu_bar).astype(Zs.dtype)
    return Zs_bar, v2_bar, jitter_bar, Lq_bar, m_bar


_whitened_cache_fused_gram.defvjp(
    _whitened_cache_gram_fwd, _whitened_cache_gram_bwd, symbolic_zeros=True
)


@posterior.register(SparseVariationalApproximation)
def _posterior_svgp(
    sva: SparseVariationalApproximation, lfx=None, ys=None, **_
) -> SVGPPosterior:
    """posterior(sva[, lfx, ys]) — reference ``:115-136`` (Centered) and
    ``:160-187`` (NonCentered).  The 3-arg form only asserts prior
    consistency then delegates (reference ``:189-201``)."""
    if lfx is not None:
        _check_consistent_prior(sva, lfx)
    q, fz = sva.q, sva.fz
    m = q.mean
    M = m.shape[-1]
    # The posterior consumes ONLY the lower triangle of scale_tril —
    # enforced once here so every downstream path (dense matmuls,
    # triangular solves, the tri_project blocked forms, their pullbacks)
    # agrees bit-for-bit and gradients w.r.t. the dead strictly-upper
    # entries are uniformly zero.  A no-op (one fused elementwise mask)
    # when the factor honors its name.
    qL = jnp.tril(q.scale_tril)
    solve_mode = resolve_solve_mode(jnp.result_type(m), size=M)
    # S-correction only while its one-time 6M³ build (+M³-scale pullback)
    # beats one extra (M, B) projection per variance evaluation — see
    # config.s_corr_max_m for the measured crossover
    use_s_corr = M <= config.s_corr_max_m
    if (
        solve_mode == "inv_matmul"
        and use_s_corr
        and not isinstance(sva.parametrization, Centered)
    ):
        dt = jnp.result_type(m)
        gparts = _gram_chol_parts(fz, dt)
        if gparts is not None:
            # NonCentered hottest path: the Kuu Gram is generated INSIDE the
            # streamed-panel (L, L⁻¹) kernel — never written to HBM
            (k_of_r2, scale, variance), zp = gparts
            Zs = (zp if scale is None else zp * scale).astype(dt)
            v2 = jnp.asarray(1.0 if variance is None else variance, dt)
            jit_ = jnp.asarray(fz.noise, dt)
            Kuu_L, Lk_inv, alpha, S_corr = _whitened_cache_fused_gram(
                Zs, v2, jit_, qL, m, k_of_r2
            )
        else:
            # NonCentered hot path: fused composite, minimal pullback
            Kuu_L, Lk_inv, alpha, S_corr = _whitened_cache_fused(
                fz.cov(), qL, m
            )
        cache = _SVGPCache(
            Kuu_L=Kuu_L, B=qL, alpha=alpha, Lk_inv=Lk_inv,
            S_corr=S_corr,
        )
        return SVGPPosterior(approx=sva, cache=cache)
    if solve_mode == "inv_matmul":
        # fused chol + tril-inv with a matmul-only custom VJP (no recursion
        # or triangular solves in the backward graph)
        Kuu_L, Lk_inv = linalg.chol_with_inv(fz.cov())
    else:
        Kuu_L = fz.scale_tril()  # chol(Kuu + jitter I): M×M Gram + O(M³) chol
        Lk_inv = None
    if isinstance(sva.parametrization, Centered):
        # B = Lk⁻¹ Lq ; α = Kuu⁻¹ (m − mean(fz))
        if Lk_inv is not None:
            # matmul-only path (single-RHS triangular solves are
            # latency-bound on TPU; the inverse is already paid for)
            B = jnp.matmul(Lk_inv, qL,
                           precision=resolve_matmul_precision(m.dtype))
            alpha = Lk_inv.T @ (Lk_inv @ (m - fz.mean()))
        else:
            B = linalg.solve_lower_triangular(Kuu_L, qL)
            alpha = linalg.cholesky_solve(Kuu_L, m - fz.mean())
    else:
        # NonCentered: α = Lk⁻ᵀ m ; B = Lq
        if Lk_inv is not None:
            alpha = Lk_inv.T @ m
        else:
            alpha = linalg.solve_upper_triangular(Kuu_L.T, m)
        B = qL
    S_corr = None
    if Lk_inv is not None and use_s_corr:
        # three M×M matmuls, paid once per posterior (vs one extra (M, B)
        # projection per variance evaluation — the ELBO hot path)
        prec = resolve_matmul_precision(B.dtype)
        BBt = jnp.matmul(B, B.T, precision=prec)
        C0 = BBt - jnp.eye(B.shape[-1], dtype=B.dtype)
        S_corr = jnp.matmul(
            Lk_inv.T,
            jnp.matmul(C0, Lk_inv, precision=prec),
            precision=prec,
        )
    cache = _SVGPCache(
        Kuu_L=Kuu_L, B=B, alpha=alpha, Lk_inv=Lk_inv, S_corr=S_corr
    )
    return SVGPPosterior(approx=sva, cache=cache)


def _check_consistent_prior(sva, lfx):
    fx = lfx.fx if isinstance(lfx, LatentFiniteGP) else lfx
    prior = fx.f
    if prior is sva.fz.f:
        return
    # Structural equality of the two prior pytrees is required always
    # (reference `===` check, :347-351) ...
    if jax.tree_util.tree_structure(prior) != jax.tree_util.tree_structure(sva.fz.f):
        raise ValueError(
            "(Latent)FiniteGP prior is not consistent with "
            "SparseVariationalApproximation's"
        )
    # ... and when the hyperparameter leaves are concrete (outside tracing)
    # we additionally compare values, so two same-shaped priors with
    # different hyperparameters are rejected like the reference's `===`.
    leaves_a = jax.tree_util.tree_leaves(prior)
    leaves_b = jax.tree_util.tree_leaves(sva.fz.f)
    for a, b in zip(leaves_a, leaves_b):
        if isinstance(a, jax.core.Tracer) or isinstance(b, jax.core.Tracer):
            return  # values unknowable under trace; structure already checked
        # numpy comparison: inside a jit trace even concrete-array jnp ops
        # get staged, so compare host-side
        an, bn = np.asarray(a), np.asarray(b)
        if an.shape != bn.shape or not bool(np.all(an == bn)):
            raise ValueError(
                "(Latent)FiniteGP prior is not consistent with "
                "SparseVariationalApproximation's (hyperparameter values differ)"
            )


def _epilogue_ready(prior, S_corr, prefer=False):
    """Static dispatch test for the fused data-term epilogue: the
    ``unwrap_stationary`` parts if it will be used, else None.  All
    conditions are trace-static, so callers may branch in Python on it
    (e.g. to skip remat when the fused path is active)."""
    mode = config.data_term_mode
    if mode == "xla" or S_corr is None or not config.use_pallas:
        return None
    if mode == "auto" and (
        not prefer
        or jax.default_backend() != "tpu"
        or jnp.dtype(S_corr.dtype) not in (jnp.dtype(jnp.float32),
                                           jnp.dtype(jnp.bfloat16))
    ):
        return None
    from ..ops.svgp_epilogue import epilogue_supported

    M = S_corr.shape[-1]
    if not epilogue_supported(
        M, 1 << 30, S_corr.dtype,
        block_b=config.epilogue_block_b, block_m=config.epilogue_block_m,
    ):
        # the (M, block_b) VMEM working set exceeds Mosaic's scoped limit
        # (measured: M=8192 wants ~29 MB of the 16 MB budget)
        if mode == "pallas":
            raise ValueError(
                f"data_term_mode='pallas' requested but the fused epilogue's "
                f"VMEM working set does not fit at M={M} (scoped limit "
                f"16 MB); use 'auto'/'xla' or fewer inducing points"
            )
        return None
    from ..core.kernels import unwrap_stationary

    return unwrap_stationary(prior.kernel)


def _epilogue_mu_var(prior, z, x, alpha, S_corr, prefer=False):
    """(mu, var) through the fused Pallas data-term epilogue, or None.

    Applicable when the S-correction cache exists, the prior kernel
    decomposes as ``v²·g(r²(s·x, s·z))`` (``unwrap_stationary``) and the
    config/backend allow Pallas.  With ``K = v·K0``:
    ``mu = m(x) + v·K0ᵀα`` and ``var = prior.var + v²·diag(K0ᵀ S K0)``, so
    the kernel takes ``ae = v·α``, ``Se = v²·S`` and scaled inputs — all
    hyperparameter gradients flow through the four array arguments.

    ``prefer`` is set by STREAMING contexts (the scan over blocks), where
    the alternative is remat — the backward recomputes the (M, B) Gram and
    S·K regardless, and the in-VMEM rebuild wins.  Without remat, XLA's
    save-residuals data term is FLOP-optimal (measured: 1.20 vs 2.8 ms
    fwd+bwd per B=8192 block for the first fused attempt), so
    ``data_term_mode="auto"`` declines unless ``prefer`` is set —
    ``"pallas"`` forces the fused path everywhere."""
    parts = _epilogue_ready(prior, S_corr, prefer)
    if parts is None:
        return None
    from ..core.kernels import as_points
    from ..ops.svgp_epilogue import svgp_data_epilogue

    k_of_r2, scale, variance = parts
    xp = as_points(x)
    zp = as_points(z)
    Xs = xp if scale is None else xp * scale
    Zs = zp if scale is None else zp * scale
    if variance is None:
        Se, ae = S_corr, alpha
    else:
        v = jnp.asarray(variance, S_corr.dtype)
        Se = S_corr * (v * v)
        ae = alpha * v
    mu_corr, var_corr = svgp_data_epilogue(
        Xs, Zs, Se, ae, k_of_r2,
        block_b=config.epilogue_block_b, block_m=config.epilogue_block_m,
    )
    mu = prior.mean(x) + mu_corr
    var = prior.var(x) + var_corr
    return mu, var


def prior_kl(sva: SparseVariationalApproximation) -> jax.Array:
    """KL(q(u) ‖ p(u)) — reference ``_prior_kl`` (``:362-373``)."""
    if isinstance(sva.parametrization, Centered):
        return kl_divergence(sva.q, sva.fz.to_mvn())
    # NonCentered closed-form whitened KL (reference :364-373):
    # (tr(Cε) + mᵀm − len − logdet Cε) / 2
    m = sva.q.mean
    L = sva.q.scale_tril
    trace_term = jnp.sum(L * L)
    logdet = linalg.chol_logdet(L)
    return 0.5 * (trace_term + m @ m - m.shape[-1] - logdet)


def elbo(
    sva: SparseVariationalApproximation,
    lfx: LatentFiniteGP | FiniteGP,
    y: jax.Array,
    num_data: int | None = None,
    quadrature=None,
) -> jax.Array:
    """Evidence lower bound (reference ``:307-360``).

    Accepts a ``FiniteGP`` with *isotropic* Gaussian noise (wrapped into a
    GaussianLikelihood exactly as the reference dispatch does, ``:307-317``)
    or a ``LatentFiniteGP`` with any likelihood.  ``num_data`` enables
    minibatch scaling ``num_data / n_batch`` (reference ``:357-359``)."""
    if quadrature is None:
        quadrature = DefaultExpectationMethod()
    if isinstance(lfx, FiniteGP):
        if not lfx.is_isotropic_noise:
            raise ValueError(
                "The observation noise fx.Σy must be homoscedastic.\n"
                "To avoid this error, construct fx using: f = GP(kernel); "
                "fx = f(x, σ²), where σ² is a positive Real."
            )
        lik = GaussianLikelihood(jnp.asarray(lfx.noise))
        lfx = LatentFiniteGP(lfx, lik)

    _check_consistent_prior(sva, lfx)

    f_post = _posterior_svgp(sva)
    fused = _epilogue_mu_var(
        f_post.prior, f_post.inducing_points(), lfx.fx.x,
        f_post.cache.alpha, f_post.cache.S_corr,
    )
    if fused is not None:
        q_mean, q_var = fused
    else:
        q_mean, q_var = f_post.mean_and_var(lfx.fx.x)
    variational_exp = expected_loglikelihood(quadrature, lfx.lik, q_mean, q_var, y)

    n_batch = y.shape[0]
    scale = 1.0 if num_data is None else num_data / n_batch
    return jnp.sum(variational_exp) * scale - prior_kl(sva)


@approx_lml.register(SparseVariationalApproximation)
def _approx_lml_svgp(sva, lfx, ys, **kwargs):
    """approx_lml = elbo for SVGP (reference ``:276-280``)."""
    return elbo(sva, lfx, ys, **kwargs)
