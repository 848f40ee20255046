"""Iterative (matrix-free) exact GP inference: CG solves + stochastic Lanczos
quadrature log-determinants.

Beyond the reference's capability set, following the BBMM approach of
Gardner et al. (2018), "GPyTorch: Blackbox Matrix-Matrix Gaussian Process
Inference with GPU Acceleration" (PAPERS.md): exact GP regression whose only
access to K is blocked matrix products — O(t·N²) instead of O(N³), MXU-native
and never materializing K when ``block_size < N``:

- :func:`cg_solve` — batched conjugate gradients as a ``lax.while_loop``
- :func:`kernel_matvec` — chunked (K + Σ) @ V without forming K
- :func:`posterior_cg` — exact posterior (mean via CG; variance via batched
  CG against the test cross-covariance columns)
- :func:`logpdf_slq` — log marginal likelihood with the quad term from CG and
  logdet from stochastic Lanczos quadrature (Ubaru et al. 2017)
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..config import config
from ..core.gp import FiniteGP
from ..core.kernels import as_points

__all__ = ["cg_solve", "kernel_matvec", "posterior_cg", "logpdf_slq", "CGPosterior", "pivoted_cholesky", "woodbury_preconditioner", "msqrt_matvec", "sample_prior_msqrt", "sample_posterior_msqrt"]


def cg_solve(
    matvec: Callable[[jax.Array], jax.Array],
    B: jax.Array,
    tol: float = 1e-6,
    maxiter: int = 1000,
    M_inv: Callable[[jax.Array], jax.Array] | None = None,
    return_info: bool = False,
    x0: jax.Array | None = None,
) -> jax.Array:
    """Solve A X = B for SPD A given only ``matvec(V) = A @ V``.

    B: (N,) or (N, R) — all right-hand sides iterate together (block-CG style
    scheduling: one fused matmul per iteration).  ``M_inv`` is an optional
    preconditioner application; ``x0`` an optional warm start (the Newton
    inner loop passes the previous step's solve — the mode barely moves
    near convergence, so late Newton steps start close)."""
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    if M_inv is None:
        M_inv = lambda r: r

    if x0 is None:
        X0 = jnp.zeros_like(B)
        R0 = B
    else:
        X0 = x0[:, None] if (vec and x0.ndim == 1) else x0
        R0 = B - matvec(X0)
    Z0 = M_inv(R0)
    P0 = Z0
    rz0 = jnp.sum(R0 * Z0, axis=0)
    b_norm = jnp.maximum(jnp.linalg.norm(B, axis=0), 1e-30)

    def cond(state):
        X, R, P, rz, i = state
        res = jnp.linalg.norm(R, axis=0) / b_norm
        return jnp.logical_and(i < maxiter, jnp.max(res) > tol)

    def body(state):
        X, R, P, rz, i = state
        # Freeze columns that have converged: with a shared trip count,
        # a finished column's rz/denom is rounding noise over rounding
        # noise — in f32 the resulting alpha garbage made the whole block
        # DIVERGE (measured relres 8e5 at N=2e4 with 16 RHS while the
        # single-RHS solve converged in 12 iterations).
        res = jnp.linalg.norm(R, axis=0) / b_norm
        active = (res > tol).astype(R.dtype)
        AP = matvec(P)
        denom = jnp.sum(P * AP, axis=0)
        # denom ≤ 0 only via rounding on a frozen/stagnated column
        alpha = active * rz / jnp.where(denom <= 0, 1.0, denom)
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * AP
        Z = M_inv(R)
        rz_new = jnp.sum(R * Z, axis=0)
        beta = active * rz_new / jnp.where(rz == 0, 1.0, rz)
        P = jnp.where(active[None, :] > 0, Z + beta[None, :] * P, P)
        rz = jnp.where(active > 0, rz_new, rz)
        return X, R, P, rz, i + 1

    X, R, P, rz, i = jax.lax.while_loop(cond, body, (X0, R0, P0, rz0, jnp.int32(0)))
    if return_info:
        return (X[:, 0] if vec else X), i
    return X[:, 0] if vec else X


def pivoted_cholesky(kernel, x: jax.Array, rank: int) -> jax.Array:
    """Rank-``rank`` pivoted (partial) Cholesky of K(x, x): returns L with
    L Lᵀ ≈ K, pivoting greedily on the largest residual diagonal (Harbrecht
    et al. 2012; the GPyTorch preconditioner construction, PAPERS.md
    Gardner et al. 2018 §3.2).  Only ``rank`` kernel ROWS are evaluated —
    O(rank·N) time/memory, K never materialized."""
    X = as_points(x)
    N = X.shape[0]
    d0 = kernel.diag(X)
    dtype = d0.dtype
    # RELATIVE pivot floor: once the residual diagonal reaches dtype-noise
    # level, the computed residual row is pure cancellation error and
    # dividing by √(tiny) injects O(1/√eps)-scale garbage columns — in f32
    # at N~2·10⁴ this made the Woodbury-preconditioned CG DIVERGE (resid
    # growing 10⁵×).  Columns below the floor are truncated to zero (the
    # preconditioner just loses rank, staying SPD via the σ²I term).
    pivot_floor = max(float(N), 100.0) * float(jnp.finfo(dtype).eps) * float(
        1.0
    )
    dmax0 = jnp.max(d0)

    def body(j, carry):
        L, d = carry
        i = jnp.argmax(d)
        di = d[i]
        valid = di > pivot_floor * dmax0
        safe = jnp.maximum(di, jnp.finfo(dtype).tiny)
        xi = jax.lax.dynamic_slice_in_dim(X, i, 1, axis=0)  # (1, D)
        row = kernel.gram(X, xi)[:, 0]  # K[:, i]
        # full precision: f32 residual cancellation otherwise degrades the
        # factor enough to stall preconditioned CG (skinny matmul — cheap)
        corr = jnp.matmul(L, L[i], precision="highest")
        col = jnp.where(valid, (row - corr) / jnp.sqrt(safe), 0.0)
        L = L.at[:, j].set(col)
        d = jnp.maximum(d - col * col, 0.0)
        d = d.at[i].set(0.0)
        return L, d

    L0 = jnp.zeros((N, rank), dtype=dtype)
    L, _ = jax.lax.fori_loop(0, rank, body, (L0, d0))
    return L


def woodbury_preconditioner(Lk: jax.Array, noise) -> Callable:
    """P⁻¹ application for P = Lk Lkᵀ + σ²I via Woodbury:
    P⁻¹ = σ⁻²(I − Lk (σ²I_r + LkᵀLk)⁻¹ Lkᵀ) — an O(N·r) matmul pair per
    apply after one r×r factorization."""
    noise = jnp.asarray(noise)
    sigma2 = noise if noise.ndim == 0 else None
    if sigma2 is None:
        raise ValueError("woodbury_preconditioner requires isotropic noise")
    r = Lk.shape[1]
    cap = sigma2 * jnp.eye(r, dtype=Lk.dtype) + jnp.matmul(
        Lk.T, Lk, precision="highest"
    )
    cap_L = jnp.linalg.cholesky(cap)

    def apply(Rv):
        # full precision: bf16 passes here break PCG search-direction
        # conjugacy in f32 (measured: stagnation at N=20k); the (N, r)
        # matmuls are cheap relative to the N x N matvec
        t = jnp.matmul(Lk.T, Rv, precision="highest")  # (r, R)
        s = jax.scipy.linalg.cho_solve((cap_L, True), t)
        return (Rv - jnp.matmul(Lk, s, precision="highest")) / sigma2

    return apply


def kernel_matvec(kernel, x: jax.Array, noise, block_size: int | None = None,
                  mesh=None, axis_name: str = "data"):
    """Returns ``matvec(V) = (K(x,x) + Σ) @ V`` evaluated in row blocks of
    ``block_size`` (never materializing K when block_size < N).

    ``mesh``: an optional :class:`jax.sharding.Mesh` — the matvec's row
    blocks are then sharded over ``axis_name`` (each device computes its
    band ``K[rows_i, :] @ V`` against a replicated ``V``; the kernel matvec
    is the purest data-parallel op in the matrix-free tier, SURVEY.md
    §2.4).  Implemented with sharding constraints under GSPMD, so CG /
    Lanczos reductions downstream become psums over ICI automatically and
    gradients flow unchanged.  ``mesh=None`` (default) is the single-chip
    path, byte-identical to before."""
    X = as_points(x)
    N = X.shape[0]

    def noise_apply(V):
        noise_arr = jnp.asarray(noise)
        if noise_arr.ndim == 0:
            return noise_arr * V
        if noise_arr.ndim == 1:
            return noise_arr[:, None] * V
        return noise_arr @ V

    if mesh is not None:
        return _dp_kernel_matvec(
            kernel, X, noise_apply, block_size, mesh, axis_name
        )

    # K·V at ELEVATED precision ALWAYS: on TPU the default matmul runs
    # single-pass bf16, and CG amplifies matvec noise — measured on v5e at
    # N=2·10⁴: the per-column residual stalls at ~1e-3 (above tol) and the
    # block solve then diverges, while the identical math converges on CPU
    # f32.  config.cg_matvec_precision picks the pass count: "highest"
    # (6-pass, conservative default) or the measured-safe "high" (3-pass,
    # f32-class products — converged with identical iteration counts on
    # the Bernoulli Newton fixtures, see BENCH_NOTES).
    mv_prec = getattr(config, "cg_matvec_precision", "highest")
    # Fused Pallas tier for SINGLE-RHS applications (CG/Lanczos/Newton
    # recurrences — exactly where the XLA path pays a full gram per vector):
    # K tiles live only in VMEM, distances ride the VPU instead of the
    # 128-padded HIGHEST matmul.  Multi-RHS and vmapped calls fall through
    # to the XLA block path, which amortizes one gram across columns.
    from ..ops.gram_matvec import fused_stationary_matvec

    fused = fused_stationary_matvec(kernel, X)

    def try_fused(V):
        """Route 1-D vectors AND narrow (N, R) column blocks through the
        fused kernel.  cg_solve iterates single-RHS solves in (N, 1) column
        layout, and that shape previously fell off this path onto the ~5x
        slower XLA block gram — every CG-internal matvec of a LaplaceCG
        Newton solve paid it (measured 90 vs 19.5 ms at N=1e5/D=2).  Narrow
        blocks (probe-blocked SLQ Lanczos, block-CG probe solves) stay
        fused up to config.matvec_fused_max_rhs; wider blocks return None
        and take the XLA path where one gram amortizes across columns."""
        if fused is None or V.ndim > 2:
            return None
        out = fused(V)
        if out is None:
            return None
        # noise_apply expects column layout (1-D noise would broadcast
        # (N,)·(N,) to (N, N) otherwise)
        if V.ndim == 1:
            return out + noise_apply(V[:, None])[:, 0]
        return out + noise_apply(V)

    if block_size is None or block_size >= N:
        def matvec(V):
            out = try_fused(V)
            if out is not None:
                return out
            vec = V.ndim == 1
            if vec:
                V = V[:, None]
            out = jnp.matmul(kernel.gram(X), V, precision=mv_prec)
            out = out + noise_apply(V)
            return out[:, 0] if vec else out

        return matvec

    bs = block_size
    pad = (-N) % bs
    Xp = jnp.concatenate([X, jnp.zeros((pad, X.shape[1]), X.dtype)]) if pad else X
    n_blocks = (N + pad) // bs
    Xb = Xp.reshape(n_blocks, bs, X.shape[1])

    def matvec(V):
        out = try_fused(V)
        if out is not None:
            return out
        vec = V.ndim == 1
        if vec:
            V = V[:, None]

        def block(xb):
            return jnp.matmul(kernel.gram(xb, X), V, precision=mv_prec)

        out = jax.lax.map(block, Xb).reshape(n_blocks * bs, V.shape[1])[:N]
        out = out + noise_apply(V)
        return out[:, 0] if vec else out

    return matvec


def _dp_kernel_matvec(kernel, X, noise_apply, block_size, mesh, axis_name):
    """Row-band data-parallel (K + Σ) @ V over ``mesh``.

    Layout: X's rows are padded and reshaped to (n_dev, rows_per_dev, d)
    with the leading axis sharded over ``axis_name``; a vmap over that axis
    computes each device's band ``K(X_band, X) @ V`` (V replicated — it is
    O(N·R), the bands' gram blocks are the O(N²) object).  ``block_size``
    sub-chunks each band with a serial ``lax.map`` so per-device live
    memory stays O(block·N) exactly as in the single-chip path.  Padded
    rows only ever appear on the ROW side (columns use the original X), so
    their garbage outputs are sliced away."""
    from jax.sharding import NamedSharding, PartitionSpec

    mv_prec = getattr(config, "cg_matvec_precision", "highest")
    N, d = X.shape
    n_dev = mesh.shape[axis_name]
    rpd = -(-N // n_dev)  # rows per device
    pad = n_dev * rpd - N
    Xp = jnp.concatenate([X, jnp.zeros((pad, d), X.dtype)]) if pad else X
    Xsh = Xp.reshape(n_dev, rpd, d)
    band_sharding = NamedSharding(mesh, PartitionSpec(axis_name, None, None))

    def band(xb, V):  # (rpd, d), (N, R) -> (rpd, R)
        if block_size is None or block_size >= rpd:
            return jnp.matmul(kernel.gram(xb, X), V, precision=mv_prec)
        bs = block_size
        bpad = (-rpd) % bs
        xbp = (
            jnp.concatenate([xb, jnp.zeros((bpad, d), xb.dtype)])
            if bpad
            else xb
        )
        chunks = xbp.reshape(-1, bs, d)
        out = jax.lax.map(
            lambda xc: jnp.matmul(kernel.gram(xc, X), V, precision=mv_prec),
            chunks,
        )
        return out.reshape(-1, V.shape[1])[:rpd]

    def matvec(V):
        vec = V.ndim == 1
        if vec:
            V = V[:, None]
        Xc = jax.lax.with_sharding_constraint(Xsh, band_sharding)
        out = jax.vmap(band, in_axes=(0, None))(Xc, V)
        out = jax.lax.with_sharding_constraint(out, band_sharding)
        out = out.reshape(n_dev * rpd, V.shape[1])[:N]
        out = out + noise_apply(V)
        return out[:, 0] if vec else out

    return matvec


class CGPosterior:
    """Exact posterior with CG solves (mean exact to tol; variance via
    batched CG against K(x, x*) columns)."""

    def __init__(self, fx: FiniteGP, y, tol=1e-6, maxiter=1000, block_size=None,
                 precond_rank: int = 0, mesh=None, axis_name: str = "data"):
        self.fx = fx
        self.prior = fx.f
        self.x = as_points(fx.x)
        self._matvec = kernel_matvec(fx.f.kernel, fx.x, fx.noise, block_size,
                                     mesh=mesh, axis_name=axis_name)
        self._tol = tol
        self._maxiter = maxiter
        # pivoted-Cholesky/Woodbury preconditioner (GPyTorch-style);
        # precond_rank=0 disables
        if precond_rank > 0:
            Lk = pivoted_cholesky(fx.f.kernel, fx.x, precond_rank)
            self._M_inv = woodbury_preconditioner(Lk, fx.noise)
        else:
            self._M_inv = None
        delta = y - fx.mean()
        self.alpha = cg_solve(self._matvec, delta, tol, maxiter, M_inv=self._M_inv)
        self.delta = delta

    # NOTE all train-cross products below run precision="highest": alpha/V
    # carry a 1/σ² amplification of rough components and the products
    # cancel heavily — TPU bf16 passes leave O(1) noise otherwise.
    def mean(self, xs):
        Kxs = self.prior.cov(self.x, xs)
        return self.prior.mean(xs) + jnp.matmul(Kxs.T, self.alpha,
                                                precision="highest")

    def _solved_cross(self, xs):
        Kxs = self.prior.cov(self.x, xs)  # (N, N*)
        V = cg_solve(self._matvec, Kxs, self._tol, self._maxiter, M_inv=self._M_inv)
        return Kxs, V

    def cov(self, xs, zs=None):
        if zs is None:
            Kxs, V = self._solved_cross(xs)
            return self.prior.cov(xs) - jnp.matmul(Kxs.T, V, precision="highest")
        Kxs, V = self._solved_cross(xs)
        Kzs = self.prior.cov(self.x, zs)
        return self.prior.cov(xs, zs) - jnp.matmul(V.T, Kzs, precision="highest")

    def var(self, xs):
        Kxs, V = self._solved_cross(xs)
        return self.prior.var(xs) - jnp.sum(Kxs * V, axis=0)

    def mean_and_var(self, xs):
        Kxs, V = self._solved_cross(xs)
        mu = self.prior.mean(xs) + jnp.matmul(Kxs.T, self.alpha,
                                              precision="highest")
        return mu, self.prior.var(xs) - jnp.sum(Kxs * V, axis=0)

    def mean_and_cov(self, xs):
        Kxs, V = self._solved_cross(xs)
        mu = self.prior.mean(xs) + jnp.matmul(Kxs.T, self.alpha,
                                              precision="highest")
        return mu, self.prior.cov(xs) - jnp.matmul(Kxs.T, V, precision="highest")


def posterior_cg(fx: FiniteGP, y, tol=1e-8, maxiter=1000, block_size=None,
                 precond_rank: int = 0, mesh=None, axis_name: str = "data"):
    """Exact GP regression posterior via conjugate gradients.

    ``precond_rank > 0`` enables the pivoted-Cholesky/Woodbury
    preconditioner (Gardner et al. 2018 §3.2) — cuts CG iterations
    substantially for ill-conditioned K at O(rank·N) setup cost.

    ``mesh`` shards every K-matvec's row bands over the device mesh (see
    :func:`kernel_matvec`) — the solves' O(N²) work splits across chips."""
    return CGPosterior(fx, y, tol=tol, maxiter=maxiter, block_size=block_size,
                       precond_rank=precond_rank, mesh=mesh,
                       axis_name=axis_name)


def _lanczos(matvec, v0, num_iters, reorth: bool = False):
    """Lanczos tridiagonalization of A started at v0 (normalized) — returns
    the (num_iters, num_iters) tridiagonal T as (diag, offdiag).

    ``reorth=True`` runs FULL reorthogonalization (each new vector is
    orthogonalized against the whole stored basis — O(n·m) extra memory and
    an (n, m) matmul pair per step): at high condition (≥1e6) in f32 the
    one-step recurrence loses orthogonality and SLQ's Ritz weights smear,
    biasing the logdet (accuracy envelope measured in
    tests/test_iterative.py::test_slq_logdet_high_condition and
    BENCH_NOTES)."""
    if reorth:
        Q, alphas, betas = _lanczos_basis(matvec, v0, num_iters)
        return alphas, betas
    n = v0.shape[0]
    v0 = v0 / jnp.linalg.norm(v0)

    def step(carry, _):
        v_prev, v, beta_prev = carry
        w = matvec(v) - beta_prev * v_prev
        alpha = jnp.dot(w, v)
        w = w - alpha * v
        # one-step orthogonalization: enough for quadrature at modest
        # iteration counts / moderate condition (reorth=True otherwise)
        beta = jnp.linalg.norm(w)
        v_next = w / jnp.where(beta == 0, 1.0, beta)
        return (v, v_next, beta), (alpha, beta)

    _, (alphas, betas) = jax.lax.scan(
        step, (jnp.zeros_like(v0), v0, jnp.asarray(0.0, v0.dtype)), None,
        length=num_iters,
    )
    return alphas, betas[:-1]


def _lanczos_block(matvec, V0, num_iters):
    """R independent one-step Lanczos recurrences run column-blocked:
    V0 (n, R) → (alphas (m, R), betas (m−1, R)).

    Mathematically identical to ``vmap(_lanczos)`` over probes (each
    column's recurrence is self-contained — per-column norms/dots, no
    cross-column coupling), but the matvec sees a real (n, R) block
    instead of a batch tracer, so probe sweeps ride the fused Pallas
    gram-matvec tier (a vmapped call declines it by design) and multi-RHS
    XLA paths amortize one gram across all probes per ITERATION rather
    than per probe."""
    norms = jnp.linalg.norm(V0, axis=0)
    V = V0 / jnp.where(norms == 0, 1.0, norms)
    R = V0.shape[1]
    zero_r = jnp.zeros((R,), V0.dtype)

    def step(carry, _):
        V_prev, V, beta_prev = carry
        W = matvec(V) - beta_prev[None, :] * V_prev
        alpha = jnp.sum(W * V, axis=0)
        W = W - alpha[None, :] * V
        beta = jnp.linalg.norm(W, axis=0)
        V_next = W / jnp.where(beta == 0, 1.0, beta)[None, :]
        return (V, V_next, beta), (alpha, beta)

    _, (alphas, betas) = jax.lax.scan(
        step, (jnp.zeros_like(V), V, zero_r), None, length=num_iters
    )
    return alphas, betas[:-1]


def _slq_quadrature(alphas, betas, n, ritz_floor):
    """Mean Gauss quadrature Σ τ log λ over probe columns: alphas (m, R),
    betas (m−1, R) → scalar mean of the per-probe n·e₁ᵀ log(T) e₁."""

    def col(a, b):
        T = jnp.diag(a) + jnp.diag(b, 1) + jnp.diag(b, -1)
        evals, evecs = jnp.linalg.eigh(T)
        evals = jnp.maximum(evals, ritz_floor)
        tau = evecs[0, :] ** 2
        return jnp.sum(tau * jnp.log(evals)) * n

    return jnp.mean(jax.vmap(col, in_axes=(1, 1))(alphas, betas))


def _lanczos_basis(matvec, v0, num_iters):
    """Fully-reorthogonalized Lanczos keeping the basis: returns
    (Q (n, m), alphas (m,), betas (m−1,)) with QᵀAQ = T, Q[:, 0] = v0/‖v0‖.

    The stored-basis Gram-Schmidt pass (w −= Q(Qᵀw), applied twice for
    f32 robustness) keeps Q orthonormal to working precision — required for
    matrix-function application f(A)b = ‖b‖·Q f(T) e₁ (the msqrt sampler)
    and for high-condition SLQ."""
    n = v0.shape[0]
    m = num_iters
    v = v0 / jnp.linalg.norm(v0)
    Q0 = jnp.zeros((n, m), v0.dtype).at[:, 0].set(v)

    def step(carry, i):
        Q, v, beta_prev, v_prev = carry
        w = matvec(v) - beta_prev * v_prev
        alpha = jnp.dot(w, v)
        w = w - alpha * v
        # two-pass full reorthogonalization against the stored basis
        # (columns ≥ i+1 are zero, so the masked matmul is harmless)
        w = w - Q @ (Q.T @ w)
        w = w - Q @ (Q.T @ w)
        beta = jnp.linalg.norm(w)
        v_next = w / jnp.where(beta == 0, 1.0, beta)
        Q = jax.lax.cond(
            i + 1 < m,
            lambda Q: Q.at[:, i + 1].set(v_next),
            lambda Q: Q,
            Q,
        )
        return (Q, v_next, beta, v), (alpha, beta)

    (Q, _, _, _), (alphas, betas) = jax.lax.scan(
        step, (Q0, v, jnp.asarray(0.0, v0.dtype), jnp.zeros_like(v0)),
        jnp.arange(m),
    )
    return Q, alphas, betas[:-1]


def msqrt_matvec(matvec, b, num_iters: int = 30):
    """A^{1/2} b by Lanczos matrix-function approximation (Pleiss et al.
    2020, arXiv 2006.11267 §4.2-adjacent; the Krylov f(A)b recipe):

        A^{1/2} b ≈ ‖b‖ · Q V Λ^{1/2} Vᵀ e₁,   T = VΛVᵀ = QᵀAQ.

    O(m) matvecs, no factorization — the sampling-grade square root for
    N(0, A) draws at matrix-free scale."""
    Q, alphas, betas = _lanczos_basis(matvec, b, num_iters)
    T = jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1)
    evals, evecs = jnp.linalg.eigh(T)
    evals = jnp.maximum(evals, 0.0)
    w = evecs @ (jnp.sqrt(evals) * evecs[0, :])
    return jnp.linalg.norm(b) * (Q @ w)


def sample_prior_msqrt(key, kernel, x, noise, num_samples: int,
                       lanczos_iters: int = 30,
                       block_size: int | None = None):
    """``num_samples`` draws from N(0, K(x,x) + Σ) via the Lanczos matrix
    square root — exact-prior covariance structure (unlike RFF paths, no
    feature-truncation bias), O(m) matvecs per sample, K never factorized.

    Returns (num_samples, N)."""
    X = as_points(x)
    N = X.shape[0]
    mv = kernel_matvec(kernel, X, noise, block_size)
    Z = jax.random.normal(key, (num_samples, N), dtype=X.dtype)
    return jax.vmap(lambda z: msqrt_matvec(mv, z, lanczos_iters))(Z)


def sample_posterior_msqrt(
    key,
    fx: FiniteGP,
    y: jax.Array,
    xs: jax.Array,
    num_samples: int,
    lanczos_iters: int = 30,
    tol: float = 1e-8,
    maxiter: int = 1000,
    block_size: int | None = None,
    precond_rank: int = 0,
):
    """Matheron-rule posterior samples at test points ``xs`` with the prior
    path drawn JOINTLY over [train; test] by the Lanczos matrix square root
    (arXiv 2006.11267 §4.2's sampling application) — the exact-prior
    counterpart of :func:`~approximategps_tpu.models.sampling.sample_posterior_functions_cg`
    (whose RFF prior path carries feature-truncation bias):

        f* = f_prior(x*) + K(x*,X)(K + σ²I)⁻¹(y − f_prior(X) − ε),
        [f_prior(X); f_prior(x*)] ~ N(0, K_joint),  ε ~ N(0, σ²I).

    All ``num_samples`` data-update solves run as ONE preconditioned
    block-CG.  Returns (num_samples, N*)."""
    prior = fx.f
    X = as_points(fx.x)
    Xs = as_points(xs)
    N = X.shape[0]
    noise = jnp.asarray(fx.noise)
    if noise.ndim > 0:
        raise ValueError("sample_posterior_msqrt requires isotropic noise")
    k_prior, k_eps = jax.random.split(key)

    # joint prior sample over train+test points (tiny jitter for PSD-ness)
    XJ = jnp.concatenate([X, Xs], axis=0)
    eps_j = 1e-6 if X.dtype == jnp.float32 else 1e-12
    joint = sample_prior_msqrt(k_prior, prior.kernel, XJ, eps_j, num_samples,
                               lanczos_iters, block_size)
    fX = joint[:, :N]  # (S, N)
    fS = joint[:, N:]  # (S, N*)

    eps = jnp.sqrt(noise) * jax.random.normal(k_eps, fX.shape, dtype=X.dtype)
    resid = y[None, :] - fX - eps  # (S, N)

    mv = kernel_matvec(prior.kernel, X, noise, block_size)
    M_inv = None
    if precond_rank > 0:
        Lk = pivoted_cholesky(prior.kernel, X, precond_rank)
        M_inv = woodbury_preconditioner(Lk, noise)
    V = cg_solve(mv, resid.T, tol=tol, maxiter=maxiter, M_inv=M_inv)  # (N, S)
    Ksx = prior.cov(X, Xs)  # (N, N*)
    return fS + jnp.matmul(V.T, Ksx, precision="highest")


def _precond_sqrt_ops(Lk: jax.Array, sigma2):
    """Closed-form ``P^{±1/2}`` applications and exact ``logdet P`` for the
    Woodbury preconditioner P = σ²I + Lk Lkᵀ (Lk an (N, r) pivoted-Cholesky
    factor, possibly with zero columns from the relative pivot floor).

    Thin spectral form via the r×r Gram: LkᵀLk = V D Vᵀ gives orthonormal
    U = Lk V D^{−1/2} with P = σ²I + U D Uᵀ, so

        P^{±1/2} = σ^{±1} I + U diag((σ² + D)^{±1/2} − σ^{±1}) Uᵀ
        logdet P = N log σ² + Σ_live log1p(D_i / σ²)

    — one (N, r) matmul pair per apply, everything else r×r.  Numerically
    dead columns (D at eps-level) are masked to exact identity directions."""
    N, r = Lk.shape
    G = jnp.matmul(Lk.T, Lk, precision="highest")
    D, V = jnp.linalg.eigh(G)
    D = jnp.maximum(D, 0.0)
    live = D > (r * jnp.finfo(Lk.dtype).eps * jnp.maximum(jnp.max(D), 1.0))
    Dsafe = jnp.where(live, D, 1.0)
    U = jnp.matmul(Lk, V, precision="highest") / jnp.sqrt(Dsafe)
    U = U * live[None, :].astype(Lk.dtype)
    s2 = jnp.asarray(sigma2, Lk.dtype)
    lam = s2 + jnp.where(live, D, 0.0)  # eigenvalues of P on span(U)

    def apply_half(v, sign):
        scale = lam ** (0.5 * sign) - s2 ** (0.5 * sign)
        w = jnp.matmul(U.T, v, precision="highest")
        return s2 ** (0.5 * sign) * v + jnp.matmul(
            U, scale * w if v.ndim == 1 else scale[:, None] * w,
            precision="highest",
        )

    logdetP = N * jnp.log(s2) + jnp.sum(
        jnp.where(live, jnp.log1p(D / s2), 0.0)
    )
    return apply_half, logdetP


def logpdf_slq(
    fx: FiniteGP,
    y: jax.Array,
    key: jax.Array,
    num_probes: int = 16,
    lanczos_iters: int = 30,
    cg_tol: float = 1e-8,
    cg_maxiter: int = 1000,
    block_size: int | None = None,
    reorth: bool = False,
    precond_rank: int = 0,
    precond_Lk: jax.Array | None = None,
    precond_logdet: bool = True,
    mesh=None,
    axis_name: str = "data",
) -> jax.Array:
    """Exact log marginal likelihood with the logdet estimated by stochastic
    Lanczos quadrature: logdet(A) ≈ (N/P) Σ_p eᵀ₁ f(T_p) e₁ with f = log on
    the Lanczos tridiagonal of each Rademacher probe.

    DIFFERENTIABLE w.r.t. kernel hyperparameters, inputs, noise and targets
    through a stochastic-trace custom VJP (the GPyTorch training estimator,
    Gardner et al. 2018 §2.2):

        ∂ logdet K̂ / ∂θ = tr(K̂⁻¹ ∂K̂) ≈ (1/P) Σ_p w_pᵀ (∂K̂) z_p,
        w_p = K̂⁻¹ z_p (one extra block-CG solve, paid only in the backward)

    using the SAME probes as the value, so a fixed key gives a consistent
    deterministic objective for the optimiser.  This is what makes exact-GP
    hyperparameter training run at matrix-free scale.

    ``precond_rank > 0`` preconditions the CG solves (the α solve and the
    backward's P-probe block solve) with the pivoted-Cholesky/Woodbury
    form, AND (``precond_logdet=True``, the default) the logdet itself via
    the exact split

        logdet K̂ = logdet P + tr log(P^{−1/2} K̂ P^{−1/2}),

    with logdet P in closed form (:func:`_precond_sqrt_ops`) and SLQ run on
    the preconditioned operator C = P^{−1/2} K̂ P^{−1/2}.  The identity is
    exact for ANY SPD P; a good P absorbs the top of the spectrum so
    cond(C) ≈ λ_{r+1}(K)/σ² — this is what rescues f32 past cond ≈ 1e7,
    where raw SLQ integrates matvec-noise eigenvalues (the measured dtype
    floor, BENCH_NOTES; envelope pinned by
    ``test_slq_logdet_high_condition_envelope``).  Set
    ``precond_logdet=False`` for the raw-operator quadrature.

    ``precond_Lk`` passes a CARRIED factor instead (e.g. one refreshed on a
    schedule during hyperopt —
    :func:`~approximategps_tpu.utils.training.make_slq_hyperopt_step`): a
    stale preconditioner is solution-invariant for the SOLVES (it changes
    CG iteration counts, never the converged result), and the logdet
    split identity itself holds for any SPD P — but the C ⪰ I Ritz floor
    does NOT: it needs the residual K − LLᵀ of the CURRENT kernel to be
    PSD, which only a fresh factor guarantees.  A carried factor therefore
    gets an eps-scale floor instead (true sub-1 eigenvalues of C are kept,
    at the cost of less f32-noise rejection), so between refreshes the lml
    VALUE carries the quadrature's usual noise-floor error rather than a
    one-sided clamp bias.  Gradients are unaffected either way (the
    backward is the stochastic-trace estimator, not the quadrature), and
    the factor is treated as a constant (zero cotangent)."""
    n = len(fx)
    dtype = jnp.result_type(y, jnp.float32)
    probes = (
        jax.random.rademacher(key, (num_probes, n), dtype=dtype)
        if hasattr(jax.random, "rademacher")
        else jnp.sign(jax.random.normal(key, (num_probes, n), dtype=dtype))
    )
    Lk = precond_Lk
    # a factor built HERE is fresh w.r.t. the current kernel, so the
    # C ⪰ I Ritz floor is provable; a user-carried factor may be stale
    precond_fresh = precond_Lk is None
    if Lk is None and precond_rank > 0:
        Lk = pivoted_cholesky(fx.f.kernel, as_points(fx.x), precond_rank)
    if Lk is not None:
        Lk = jax.lax.stop_gradient(Lk)
    return _logpdf_slq_core(
        lanczos_iters, cg_tol, cg_maxiter, block_size, bool(reorth),
        bool(precond_logdet), precond_fresh, mesh, axis_name,
        fx, y, probes, Lk
    )


def _slq_minv(Lk, noise):
    """Woodbury preconditioner application from a (possibly stale) carried
    pivoted-Cholesky factor, or None."""
    if Lk is None:
        return None
    return woodbury_preconditioner(Lk, noise)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8))
def _logpdf_slq_core(lanczos_iters, cg_tol, cg_maxiter, block_size, reorth,
                     precond_logdet, precond_fresh, mesh, axis_name, fx, y,
                     probes, Lk=None):
    n = len(fx)
    matvec = kernel_matvec(fx.f.kernel, fx.x, fx.noise, block_size,
                           mesh=mesh, axis_name=axis_name)
    delta = y - fx.mean()
    alpha = cg_solve(matvec, delta, cg_tol, cg_maxiter,
                     M_inv=_slq_minv(Lk, fx.noise))
    quad = delta @ alpha

    # preconditioned quadrature: SLQ runs on C = P^{−1/2} K̂ P^{−1/2}
    # (well-conditioned) and the exact logdet P is added back
    logdet0 = jnp.asarray(0.0, probes.dtype)
    quad_mv = matvec
    # raw operator: Ritz values are only garbage below hard zero
    ritz_floor = 1e-30
    if precond_logdet and Lk is not None:
        apply_half, logdetP = _precond_sqrt_ops(Lk, jnp.asarray(fx.noise))
        quad_mv = lambda v: apply_half(matvec(apply_half(v, -1)), -1)
        logdet0 = logdetP
        if precond_fresh:
            # C ⪰ I EXACTLY for a FRESH factor (the pivoted-Cholesky
            # residual K − LLᵀ is PSD, so K̂ ⪰ P): any Ritz value below 1
            # is f32 recurrence/matvec noise, and log-clamping it at 1e-30
            # would inject −69·τ·n-scale garbage (measured: −78k vs the
            # true tr log C ≈ +29 at cond 1e8) — clamp at the provable
            # spectral floor instead
            ritz_floor = 1.0
        else:
            # carried (possibly stale) factor: K_new − L_old L_oldᵀ can be
            # indefinite, so sub-1 eigenvalues of C are REAL — clamping
            # them to 1 one-sidedly biases the value (ADVICE r4).  C is
            # still SPD, so only sub-eps Ritz values are noise.
            ritz_floor = float(jnp.finfo(probes.dtype).eps)

    if reorth:
        # the stored-basis recurrence keeps an (n, m) basis per probe —
        # blocked it would be (n, m, R); keep the vmapped form there
        def probe_logdet(v):
            alphas, betas = _lanczos(quad_mv, v, lanczos_iters, reorth=True)
            T = jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1)
            evals, evecs = jnp.linalg.eigh(T)
            evals = jnp.maximum(evals, ritz_floor)
            tau = evecs[0, :] ** 2
            return jnp.sum(tau * jnp.log(evals)) * n

        logdet_quad = jnp.mean(jax.vmap(probe_logdet)(probes))
    else:
        # column-blocked probes: the matvec sees a real (n, P) block per
        # Lanczos iteration (fused Pallas tier / one shared gram) instead
        # of P vmapped single-vector recurrences
        alphas, betas = _lanczos_block(quad_mv, probes.T, lanczos_iters)
        logdet_quad = _slq_quadrature(alphas, betas, n, ritz_floor)

    logdet = logdet0 + logdet_quad
    return -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))


def _logpdf_slq_fwd(lanczos_iters, cg_tol, cg_maxiter, block_size, reorth,
                    precond_logdet, precond_fresh, mesh, axis_name, fx, y,
                    probes, Lk=None):
    val = _logpdf_slq_core(lanczos_iters, cg_tol, cg_maxiter, block_size,
                           reorth, precond_logdet, precond_fresh, mesh,
                           axis_name, fx, y, probes, Lk)
    # alpha is recomputed in the backward (one CG) so the forward stores
    # only the inputs — keeps remat/scan memory flat
    return val, (fx, y, probes, Lk)


def _logpdf_slq_bwd(lanczos_iters, cg_tol, cg_maxiter, block_size, reorth,
                    precond_logdet, precond_fresh, mesh, axis_name, res, ct):
    fx, y, probes, Lk = res
    matvec = kernel_matvec(fx.f.kernel, fx.x, fx.noise, block_size,
                           mesh=mesh, axis_name=axis_name)
    M_inv = _slq_minv(Lk, fx.noise)
    delta = jax.lax.stop_gradient(y - fx.mean())
    alpha = jax.lax.stop_gradient(
        cg_solve(matvec, delta, cg_tol, cg_maxiter, M_inv=M_inv)
    )
    W = jax.lax.stop_gradient(
        cg_solve(matvec, probes.T, cg_tol, cg_maxiter, M_inv=M_inv)
    )  # (n, P): w_p = K̂⁻¹ z_p

    def surrogate(fx_, y_, probes_):
        # value == logpdf at the evaluation point; gradient == the
        # stochastic-trace estimator with (alpha, W) frozen:
        #   quad_sur  = 2 αᵀδ(θ) − αᵀ K̂(θ) α      (d = 2αᵀ∂δ − αᵀ∂K̂ α)
        #   trace_sur = (1/P) Σ_p w_pᵀ K̂(θ) z_p    (d = Hutchinson ∂logdet)
        mv = kernel_matvec(fx_.f.kernel, fx_.x, fx_.noise, block_size,
                           mesh=mesh, axis_name=axis_name)
        delta_ = y_ - fx_.mean()
        quad_sur = 2.0 * (alpha @ delta_) - alpha @ mv(alpha)
        trace_sur = jnp.mean(jnp.sum(W * mv(probes_.T), axis=0))
        n = delta_.shape[0]
        return -0.5 * (quad_sur + trace_sur + n * jnp.log(2.0 * jnp.pi))

    _, vjp = jax.vjp(surrogate, fx, y, probes)
    dfx, dy, dprobes = vjp(ct)
    # the preconditioner factor is solution-invariant (it changes CG
    # iteration counts, never the converged solve) → zero cotangent
    dLk = None if Lk is None else jnp.zeros_like(Lk)
    return dfx, dy, dprobes, dLk


_logpdf_slq_core.defvjp(_logpdf_slq_fwd, _logpdf_slq_bwd)
