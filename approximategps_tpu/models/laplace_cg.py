"""Matrix-free Laplace approximation: CG Newton solves + SLQ log-determinant.

Scales the Laplace approximation (reference
``src/LaplaceApproximationModule.jl``, RW Alg. 3.1/3.2) past the dense
O(N²)-memory / O(N³)-per-step regime by composing it with the iterative
engine (:mod:`~approximategps_tpu.models.iterative`): every access to the
N×N kernel matrix is a chunked matvec, so memory is O(N·block) and each
Newton step costs one CG solve of ``B = I + √W K √W`` (SPD whenever the
likelihood is log-concave — wrap others in
:class:`~approximategps_tpu.core.likelihoods.GaussNewtonLikelihood`).

Capability extension beyond the reference (which only ever runs dense
Laplace); the BBMM composition follows Gardner et al. (2018) (PAPERS.md).

Scope: mode finding (IFT-differentiable — the same fixed-point custom VJP
as the dense module, with CG in the pullback), predictions (RW 3.21/3.29
via batched CG), and a fully DIFFERENTIABLE ``approx_lml``: the logdet term
is stochastic Lanczos quadrature with a stochastic-trace custom VJP
(Hutchinson ∂logdet, one extra block-CG in the backward), the explicit and
implicit (RW 5.23) terms compose through the differentiable fixed-point
cache recompute exactly as in the dense module — so Laplace hyperparameter
training runs at matrix-free scale too.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import config
from ..core import linalg
from ..core.gp import AbstractGP, LatentFiniteGP
from ..core.kernels import as_points
from ..core.pytrees import pytree_dataclass, static_field
from .api import approx_lml, posterior
from .iterative import (
    _lanczos_block,
    _slq_quadrature,
    cg_solve,
    kernel_matvec,
    pivoted_cholesky,
    woodbury_preconditioner,
)
from .laplace import _default_tol, _isapprox, _validate_laplace_inputs

__all__ = [
    "LaplaceCG",
    "newton_inner_loop_cg",
    "laplace_lml_cg",
    "LaplaceCGPosterior",
]


def _k_matvec(kern, x, block_size, noise=0.0, storage="auto", mesh=None,
               axis_name: str = "data"):
    """matvec for the prior gram K(x, x) (+ the LatentGP jitter when given,
    so B = I + √W (K + jitter·I) √W matches the dense operator — the dense
    path's K = fx.cov() includes the jitter).

    ``storage="auto"`` materializes the Gram ONCE and reuses it across all
    CG iterations when N ≤ config.cg_dense_threshold (the BBMM K-resident
    tier: a Newton solve runs hundreds of matvecs, and re-evaluating N²
    kernel entries per matvec was the dominant cost — the exp alone is
    O(N²) VPU transcendentals each time); "chunked" forces O(N·block)
    memory, "dense" forces residency."""
    N = as_points(x).shape[0]
    if storage == "dense" or (storage == "auto"
                              and N <= config.cg_dense_threshold):
        K = kern.gram(as_points(x))
        if mesh is not None:
            # shard the RESIDENT Gram's rows over the mesh: each chip holds
            # and multiplies an (N/n_dev, N) band — K-residency gains n_dev x
            # memory headroom and the matvec splits its O(N^2) flops
            from jax.sharding import NamedSharding, PartitionSpec

            K = jax.lax.with_sharding_constraint(
                K, NamedSharding(mesh, PartitionSpec(axis_name, None))
            )
        noise_arr = jnp.asarray(noise, K.dtype)

        mv_prec = getattr(config, "cg_matvec_precision", "highest")

        def mv(v):
            vec = v.ndim == 1
            V = v[:, None] if vec else v
            out = jnp.matmul(K, V, precision=mv_prec) + noise_arr * V
            return out[:, 0] if vec else out

        return mv
    return kernel_matvec(kern, x, noise, block_size, mesh=mesh,
                         axis_name=axis_name)


def _b_precond(kern, x, rank):
    """Rank-``rank`` pivoted-Cholesky factor of K for preconditioning the
    Newton inner solve: with K ≈ L_r L_rᵀ,
    ``B = I + √W K √W ≈ I + (√W∘L_r)(√W∘L_r)ᵀ`` — a σ²=1 Woodbury form
    whose r×r capacitance refresh per Newton step is O(N·r²).  Returns the
    W-independent L_r (computed once per solve)."""
    if rank <= 0:
        return None
    N = as_points(x).shape[0]
    return pivoted_cholesky(kern, x, min(rank, N))


def _b_minv(Lr, Wsqrt):
    """Preconditioner application for the current W, or None."""
    if Lr is None:
        return None
    return woodbury_preconditioner(Wsqrt[:, None] * Lr, 1.0)


def _b_matvec(kmv, Wsqrt):
    """matvec for B = I + √W K √W (vector or multi-RHS)."""

    def mv(v):
        w = Wsqrt[:, None] if v.ndim == 2 else Wsqrt
        return v + w * kmv(w * v)

    return mv


class _CGNewtonState(NamedTuple):
    f: jax.Array
    fnew: jax.Array
    s: jax.Array  # previous inner CG solution — warm start for the next
    rel: jax.Array  # relative step size ‖f−fnew‖/max(‖f‖,‖fnew‖)
    rel_prev: jax.Array
    it: jax.Array


def _newton_body_cg(lik, ys, kmv, f, cg_tol, cg_maxiter, damping, Lr=None,
                    s0=None):
    """One matrix-free Newton step: a = b − √W B⁻¹ √W (K b), fnew = K a.
    The inner solve is Woodbury-preconditioned when ``Lr`` is given and
    warm-started from the previous Newton step's solution ``s0``."""
    _ll, d_ll, d2_ll = lik.log_prob_d1_d2(f, ys)
    W = -d2_ll
    Wsqrt = jnp.sqrt(W)
    b = W * f + d_ll
    Kb = kmv(b)
    bmv = _b_matvec(kmv, Wsqrt)
    s = cg_solve(bmv, Wsqrt * Kb, tol=cg_tol, maxiter=cg_maxiter,
                 M_inv=_b_minv(Lr, Wsqrt), x0=s0)
    a = b - Wsqrt * s
    fnew = kmv(a)
    if damping != 1.0:
        fnew = f + damping * (fnew - f)
    return fnew, a, s


def _newton_loop_cg(lik, ys, kmv, f_init, maxiter, tol, cg_tol, cg_maxiter,
                    damping, Lr=None):
    def cond(st):
        done = jnp.logical_and(st.it > 0, st.rel <= tol)
        # Stall detector: at large N in f32 the step size hits an
        # evaluation-noise floor (matvec summation noise amplified by
        # λmax(K) through fnew = K a — measured ~2e-4 flat from iteration
        # 3 at N=1e5) that a tighter tol can never cross; once the step
        # stops SHRINKING the mode is found to working precision and
        # further iterations only burn matvecs.  Undamped Newton contracts
        # at least geometrically while making real progress, and damped
        # steps contract by ≥ (1−damping) < 0.9, so a 0.9 ratio after 4
        # iterations only fires at the floor.
        stalled = jnp.logical_and(st.it >= 4, st.rel > 0.9 * st.rel_prev)
        keep = jnp.logical_and(st.it < maxiter, jnp.logical_not(done))
        return jnp.logical_and(keep, jnp.logical_not(stalled))

    def body(st):
        fnew, _a, s = _newton_body_cg(lik, ys, kmv, st.fnew, cg_tol,
                                      cg_maxiter, damping, Lr=Lr, s0=st.s)
        nf = jnp.linalg.norm(st.fnew - fnew)
        denom = jnp.maximum(
            jnp.maximum(jnp.linalg.norm(st.fnew), jnp.linalg.norm(fnew)),
            jnp.finfo(fnew.dtype).tiny,
        )
        return _CGNewtonState(f=st.fnew, fnew=fnew, s=s, rel=nf / denom,
                              rel_prev=st.rel, it=st.it + 1)

    inf = jnp.asarray(jnp.inf, f_init.dtype)
    st = jax.lax.while_loop(
        cond, body,
        _CGNewtonState(f=f_init, fnew=f_init, s=jnp.zeros_like(f_init),
                       rel=inf, rel_prev=inf, it=jnp.int32(0)),
    )
    return st.fnew, st.it


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10))
def _newton_solve_cg(lik_def, maxiter, tol, cg_tol, cg_maxiter, damping,
                     block_size, precond_rank, storage, mesh, axis_name,
                     lik_leaves, ys, kern, x, noise, f_init):
    lik = jax.tree_util.tree_unflatten(lik_def, lik_leaves)
    kmv = _k_matvec(kern, x, block_size, noise, storage, mesh, axis_name)
    Lr = _b_precond(kern, x, precond_rank)
    return _newton_loop_cg(lik, ys, kmv, f_init, maxiter, tol, cg_tol,
                           cg_maxiter, damping, Lr=Lr)


def _newton_solve_cg_fwd(lik_def, maxiter, tol, cg_tol, cg_maxiter, damping,
                         block_size, precond_rank, storage, mesh, axis_name,
                         lik_leaves, ys, kern, x, noise, f_init):
    lik = jax.tree_util.tree_unflatten(lik_def, lik_leaves)
    kmv = _k_matvec(kern, x, block_size, noise, storage, mesh, axis_name)
    Lr = _b_precond(kern, x, precond_rank)
    f_opt, n_iter = _newton_loop_cg(lik, ys, kmv, f_init, maxiter, tol,
                                    cg_tol, cg_maxiter, damping, Lr=Lr)
    return (f_opt, n_iter), (lik_leaves, ys, kern, x, noise, f_opt)


def _newton_solve_cg_bwd(lik_def, maxiter, tol, cg_tol, cg_maxiter, damping,
                         block_size, precond_rank, storage, mesh, axis_name,
                         residuals, cts):
    """IFT pullback, matrix-free (the dense module's `_newton_solve_bwd`
    with the B⁻¹ application replaced by (preconditioned) CG and the rank-1
    K̄ = λ∇llᵀ cotangent pushed through the chunked matvec instead of
    materialized):

        λ = √W B⁻¹ √W⁻¹ Δf           (one CG solve)
        θ̄, x̄, ȳ = vjp of (θ, x, y) ↦ λᵀ K(θ, x) ∇ll(f̂; θ, y)
    """
    ct_f, _ct_niter = cts
    lik_leaves, ys, kern, x, noise, f_opt = residuals
    lik = jax.tree_util.tree_unflatten(lik_def, lik_leaves)
    kmv = _k_matvec(kern, x, block_size, noise, storage, mesh, axis_name)
    Lr = _b_precond(kern, x, precond_rank)
    _ll, d_ll, d2_ll = lik.log_prob_d1_d2(f_opt, ys)
    Wsqrt = jnp.sqrt(-d2_ll)
    bmv = _b_matvec(kmv, Wsqrt)
    lam = Wsqrt * cg_solve(bmv, ct_f / Wsqrt, tol=cg_tol, maxiter=cg_maxiter,
                           M_inv=_b_minv(Lr, Wsqrt))
    lam = jax.lax.stop_gradient(lam)
    f_fix = jax.lax.stop_gradient(f_opt)

    def s(leaves, kern_, x_, noise_, ys_):
        lik_ = jax.tree_util.tree_unflatten(lik_def, leaves)
        _, d1, _ = lik_.log_prob_d1_d2(f_fix, ys_)
        mv = _k_matvec(kern_, x_, block_size, noise_, storage, mesh,
                       axis_name)
        return lam @ mv(d1)

    val, vjp_s = jax.vjp(s, lik_leaves, kern, x, noise, ys)
    d_leaves, d_kern, d_x, d_noise, d_ys = vjp_s(jnp.ones_like(val))
    d_f_init = jnp.zeros_like(f_opt)
    return (d_leaves, d_ys, d_kern, d_x, d_noise, d_f_init)


_newton_solve_cg.defvjp(_newton_solve_cg_fwd, _newton_solve_cg_bwd)


def newton_inner_loop_cg(
    lik,
    ys,
    kern,
    x,
    f_init=None,
    maxiter: int = 100,
    tol=None,
    cg_tol: float = 1e-6,
    cg_maxiter: int = 1000,
    damping: float = 1.0,
    block_size: int | None = None,
    noise=0.0,
    precond_rank: int = 128,
    storage: str = "auto",
    mesh=None,
    axis_name: str = "data",
    return_niter: bool = False,
):
    """Matrix-free Newton mode finding: f̂ with K(x,x) accessed only through
    matvecs.  IFT-differentiable w.r.t. the likelihood parameters, kernel
    hyperparameters, inputs and targets — the pullback runs one extra CG
    solve.  ``noise`` is the LatentGP jitter (the dense path's K includes
    it).

    Fast-solve knobs (all solution-invariant — they change iteration
    counts, not the answer):
    - ``precond_rank``: Woodbury preconditioner from a rank-r pivoted
      Cholesky of K (0 disables);
    - ``storage``: "auto" keeps the Gram HBM-resident for
      N ≤ config.cg_dense_threshold, "chunked" forces O(N·block) memory;
    - each Newton step's CG warm-starts from the previous step's solution.
    """
    x = as_points(x)
    ys = jnp.asarray(ys)
    if f_init is None:
        f_init = jnp.zeros_like(ys, dtype=x.dtype)
    if tol is None:
        tol = _default_tol(f_init.dtype)
    lik_leaves, lik_def = jax.tree_util.tree_flatten(lik)
    f_opt, n_iter = _newton_solve_cg(
        lik_def, maxiter, float(tol), cg_tol, cg_maxiter, damping,
        block_size, int(precond_rank), storage, mesh, axis_name,
        lik_leaves, ys, kern, x, jnp.asarray(noise, x.dtype),
        f_init,
    )
    return (f_opt, n_iter) if return_niter else f_opt


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _logdet_B_slq(lanczos_iters, cg_tol, cg_maxiter, block_size,
                  precond_rank, storage, mesh, axis_name,
                  Wsqrt, kern, x, noise, probes):
    """logdet(I + √W K √W) by stochastic Lanczos quadrature, with the same
    stochastic-trace custom VJP as :func:`iterative.logpdf_slq`:

        ∂ logdet B = tr(B⁻¹ ∂B) ≈ (1/P) Σ_p (B⁻¹z_p)ᵀ (∂B) z_p,

    the per-probe solves done by one block-CG in the backward only.
    Differentiable w.r.t. ``Wsqrt`` (→ f̂ via the Newton IFT), the kernel
    hyperparameters and the inputs."""
    kmv = _k_matvec(kern, x, block_size, noise, storage, mesh, axis_name)
    bmv = _b_matvec(kmv, Wsqrt)
    n = Wsqrt.shape[0]
    # column-blocked probes (iterative._lanczos_block): each Lanczos
    # iteration presents one (n, P) block to the matvec — fused Pallas
    # gram tier / one shared gram — instead of P vmapped recurrences
    alphas, betas = _lanczos_block(bmv, probes.T, lanczos_iters)
    return _slq_quadrature(alphas, betas, n, 1e-30)


def _logdet_B_slq_fwd(lanczos_iters, cg_tol, cg_maxiter, block_size,
                      precond_rank, storage, mesh, axis_name,
                      Wsqrt, kern, x, noise, probes):
    val = _logdet_B_slq(lanczos_iters, cg_tol, cg_maxiter, block_size,
                        precond_rank, storage, mesh, axis_name,
                        Wsqrt, kern, x, noise, probes)
    return val, (Wsqrt, kern, x, noise, probes)


def _logdet_B_slq_bwd(lanczos_iters, cg_tol, cg_maxiter, block_size,
                      precond_rank, storage, mesh, axis_name, res, ct):
    Wsqrt, kern, x, noise, probes = res
    kmv = _k_matvec(kern, x, block_size, noise, storage, mesh, axis_name)
    bmv = _b_matvec(kmv, Wsqrt)
    Lr = _b_precond(kern, x, precond_rank)
    W_solves = jax.lax.stop_gradient(
        cg_solve(bmv, probes.T, tol=cg_tol, maxiter=cg_maxiter,
                 M_inv=_b_minv(Lr, Wsqrt))
    )  # (n, P)

    def surrogate(Wsqrt_, kern_, x_, noise_, probes_):
        mv = _k_matvec(kern_, x_, block_size, noise_, storage, mesh,
                       axis_name)
        bz = probes_.T + Wsqrt_[:, None] * mv(Wsqrt_[:, None] * probes_.T)
        return jnp.mean(jnp.sum(W_solves * bz, axis=0))

    _, vjp = jax.vjp(surrogate, Wsqrt, kern, x, noise, probes)
    dW, dk, dx, dn, dp = vjp(ct)
    return dW, dk, dx, dn, dp


_logdet_B_slq.defvjp(_logdet_B_slq_fwd, _logdet_B_slq_bwd)


def laplace_lml_cg(
    lik,
    ys,
    kern,
    x,
    key,
    f_opt=None,
    num_probes: int = 16,
    lanczos_iters: int = 30,
    block_size: int | None = None,
    cg_tol: float = 1e-6,
    cg_maxiter: int = 1000,
    noise=0.0,
    precond_rank: int = 128,
    storage: str = "auto",
    mesh=None,
    axis_name: str = "data",
    **newton_kwargs,
):
    """Laplace approx-lml with the ½·logdet(B) term from stochastic Lanczos
    quadrature on ``B = I + √W K √W`` (Ubaru et al. 2017) — no N×N matrix,
    no Cholesky.

    DIFFERENTIABLE: the mode flows through the Newton IFT custom VJP, the
    explicit terms through the differentiable cache recompute at the fixed
    point (capturing the RW 5.23 implicit corrections automatically, just
    like the dense module), and the logdet through the stochastic-trace VJP
    of :func:`_logdet_B_slq` — one extra block-CG in the backward.  A fixed
    ``key`` gives a consistent deterministic objective for the optimiser."""
    x = as_points(x)
    noise = jnp.asarray(noise, x.dtype)
    if f_opt is None:
        f_opt = newton_inner_loop_cg(lik, ys, kern, x,
                                     block_size=block_size,
                                     cg_tol=cg_tol, cg_maxiter=cg_maxiter,
                                     noise=noise, precond_rank=precond_rank,
                                     storage=storage, mesh=mesh,
                                     axis_name=axis_name, **newton_kwargs)
    ll, d_ll, d2_ll = lik.log_prob_d1_d2(f_opt, ys)
    Wsqrt = jnp.sqrt(-d2_ll)
    # a = K⁻¹f̂ = ∇ll at the fixed point (f̂ = K ∇ll)
    a = d_ll
    n = ys.shape[0]
    probes = jnp.sign(
        jax.random.normal(key, (num_probes, n), dtype=f_opt.dtype)
    )
    logdet_B = _logdet_B_slq(
        lanczos_iters, cg_tol, cg_maxiter, block_size, int(precond_rank),
        storage, mesh, axis_name, Wsqrt, kern, x, noise, probes
    )
    return -0.5 * (a @ f_opt) + jnp.sum(ll) - 0.5 * logdet_B


@pytree_dataclass
class LaplaceCG:
    """Matrix-free Laplace approximation config (the iterative-engine
    counterpart of :class:`~approximategps_tpu.models.laplace.LaplaceApproximation`).

    ``approx_lml`` requires ``key`` (SLQ probes); a fixed key gives a
    consistent, differentiable stochastic objective.  ``posterior`` is
    deterministic given CG tolerances."""

    f_init: jax.Array | None = None
    maxiter: int = static_field(default=100)
    tol: float | None = static_field(default=None)
    cg_tol: float = static_field(default=1e-6)
    cg_maxiter: int = static_field(default=1000)
    damping: float = static_field(default=1.0)
    block_size: int | None = static_field(default=None)
    num_probes: int = static_field(default=16)
    lanczos_iters: int = static_field(default=30)
    # fast-solve knobs (solution-invariant): Woodbury preconditioning of
    # the inner B-solves from a rank-r pivoted Cholesky of K, and
    # HBM-resident Gram storage below config.cg_dense_threshold
    precond_rank: int = static_field(default=128)
    storage: str = static_field(default="auto")
    # optional jax.sharding.Mesh: shards every K-matvec's row bands (and
    # the K-resident tier's Gram rows) over the mesh — see kernel_matvec
    mesh: object = static_field(default=None)
    axis_name: str = static_field(default="data")


@pytree_dataclass
class LaplaceCGPosterior(AbstractGP):
    """Laplace posterior with matrix-free predictions (RW 3.21/3.29):

        μ* = m(x*) + K*fᵀ a
        Σ* = K** − K*fᵀ √W B⁻¹ √W K*f   (batched CG per test block)

    ``a`` is the Newton-SOLVED representer weight from one extra step at
    the mode (K a = f̂ to CG tolerance) rather than ∇ll recomputed at f̂ —
    the recomputed gradient amplifies the Newton stopping error by
    λmax(K)·max W, which corrupted f32 means for sharp likelihoods (see
    the dense module's LaplacePosterior for the measurement).
    """

    lfx: LatentFiniteGP
    f_opt: jax.Array
    a: jax.Array
    Wsqrt: jax.Array
    approx: LaplaceCG = static_field(default_factory=LaplaceCG)

    @property
    def _noise(self):
        # the LatentGP jitter: the training-side B operator includes it
        # (matching dense K = fx.cov()); test-side cross-covs do not
        return self.lfx.fx.noise

    @property
    def prior(self):
        return self.lfx.fx.f

    def _train_x(self):
        return as_points(self.lfx.fx.x)

    def _solved(self, x):
        xt = self._train_x()
        Kxs = self.prior.cov(xt, x)  # (N, N*)
        kmv = _k_matvec(self.prior.kernel, xt, self.approx.block_size,
                        self._noise, self.approx.storage,
                        self.approx.mesh, self.approx.axis_name)
        bmv = _b_matvec(kmv, self.Wsqrt)
        Lr = _b_precond(self.prior.kernel, xt, self.approx.precond_rank)
        V = cg_solve(bmv, self.Wsqrt[:, None] * Kxs,
                     tol=self.approx.cg_tol, maxiter=self.approx.cg_maxiter,
                     M_inv=_b_minv(Lr, self.Wsqrt))
        return Kxs, self.Wsqrt[:, None] * V  # second = √W B⁻¹ √W K*f

    def mean(self, x):
        xt = self._train_x()
        Kxs = self.prior.cov(xt, x)
        return self.prior.mean(x) + jnp.matmul(Kxs.T, self.a,
                                               precision="highest")

    def cov(self, x, z=None):
        Kxs, U = self._solved(x)
        if z is None:
            return self.prior.cov(x) - Kxs.T @ U
        Kzs = self.prior.cov(self._train_x(), z)
        return self.prior.cov(x, z) - U.T @ Kzs

    def var(self, x):
        Kxs, U = self._solved(x)
        return self.prior.var(x) - jnp.sum(Kxs * U, axis=0)

    def mean_and_var(self, x):
        Kxs, U = self._solved(x)
        mu = self.prior.mean(x) + jnp.matmul(Kxs.T, self.a,
                                             precision="highest")
        return mu, self.prior.var(x) - jnp.sum(Kxs * U, axis=0)

    def mean_and_cov(self, x):
        Kxs, U = self._solved(x)
        mu = self.prior.mean(x) + jnp.matmul(Kxs.T, self.a,
                                             precision="highest")
        return mu, self.prior.cov(x) - jnp.matmul(Kxs.T, U,
                                                  precision="highest")


@posterior.register(LaplaceCG)
def _posterior_laplace_cg(la: LaplaceCG, lfx: LatentFiniteGP, ys, **_):
    lik = _validate_laplace_inputs(lfx, ys)  # check-only: NO N×N Gram here
    kern = lfx.fx.f.kernel
    x = lfx.fx.x
    noise = lfx.fx.noise
    f_opt = newton_inner_loop_cg(
        lik, ys, kern, x, f_init=la.f_init, maxiter=la.maxiter,
        tol=la.tol, cg_tol=la.cg_tol, cg_maxiter=la.cg_maxiter,
        damping=la.damping, block_size=la.block_size, noise=noise,
        precond_rank=la.precond_rank, storage=la.storage, mesh=la.mesh,
        axis_name=la.axis_name,
    )
    # one extra Newton step at the mode for the SOLVED representer weight
    kmv = _k_matvec(kern, as_points(x), la.block_size, noise, la.storage,
                    la.mesh, la.axis_name)
    Lr = _b_precond(kern, as_points(x), la.precond_rank)
    _fnew, a, _s = _newton_body_cg(lik, ys, kmv, f_opt, la.cg_tol,
                                   la.cg_maxiter, 1.0, Lr=Lr)
    _ll, _d_ll, d2_ll = lik.log_prob_d1_d2(f_opt, ys)
    return LaplaceCGPosterior(
        lfx=lfx, f_opt=f_opt, a=a, Wsqrt=jnp.sqrt(-d2_ll),
        approx=la,
    )


@approx_lml.register(LaplaceCG)
def _approx_lml_laplace_cg(la: LaplaceCG, lfx: LatentFiniteGP, ys, *,
                           key=None, **_):
    if key is None:
        raise ValueError(
            "approx_lml(LaplaceCG(...), lfx, ys, key=...) requires an "
            "explicit PRNG key for the SLQ logdet probes"
        )
    lik = _validate_laplace_inputs(lfx, ys)  # check-only: NO N×N Gram here
    return laplace_lml_cg(
        lik, ys, lfx.fx.f.kernel, lfx.fx.x, key,
        num_probes=la.num_probes, lanczos_iters=la.lanczos_iters,
        block_size=la.block_size, f_init=la.f_init, maxiter=la.maxiter,
        tol=la.tol, cg_tol=la.cg_tol, cg_maxiter=la.cg_maxiter,
        damping=la.damping, noise=lfx.fx.noise,
        precond_rank=la.precond_rank, storage=la.storage, mesh=la.mesh,
        axis_name=la.axis_name,
    )
