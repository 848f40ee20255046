"""Nearest-neighbor (Vecchia) GP approximation.

TPU-native re-design of the reference's ``src/NearestNeighborsModule.jl``
(115 LoC): the joint factorises as ``∏ p(f_i | f_{i−k:i−1})`` over the *k
previous points in the given ordering* (Datta 2022 eq. 9-10; reference
``:63-72``), giving a sparse precision root ``U = (I−B)ᵀ F^{−1/2}``.

TPU re-design decisions (SURVEY.md §7.7):
- TPUs have no sparse support, and under the previous-k ordering ``B`` is
  *banded* with bandwidth k — so ``U`` is stored densely as an (N, k+1) band
  and all products become gather-window einsums (regular memory access,
  vmappable, shardable over N),
- each point's row of B and its conditional variance F_i come from ONE
  batched k×k Cholesky factorization (the reference recomputes the same
  k×k solve twice, ``make_B``/``make_F`` at ``:28`` and ``:56``),
- the N independent k×k factorizations are one big batched
  ``jnp.linalg.cholesky`` (optionally chunked with ``lax.map`` to bound
  memory at N=1e6).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import linalg
from ..core.gp import FiniteGP, PosteriorGP
from ..core.kernels import Kernel, as_points
from ..core.pytrees import pytree_dataclass, static_field
from .api import approx_lml, posterior

__all__ = [
    "NearestNeighbors",
    "BandInvRoot",
    "SparseInvRoot",
    "approx_root_prec_band",
    "approx_root_prec_sparse",
    "resolve_ordering",
    "band_Ut_matmul",
    "band_U_matvec",
    "predict_knn",
]

_LOG2PI = math.log(2.0 * math.pi)


@pytree_dataclass
class NearestNeighbors:
    """k-nearest-neighbor (Vecchia) approximation (reference struct ``:73-75``).

    ``block_size`` chunks the batched small-Cholesky construction to bound
    peak memory for very large N (the (N, k, k) neighbor-Gram tensor);
    ``use_pallas``: None (auto, default) runs the fused batch-on-lanes
    Pallas band kernel on TPU for f32/bf16 stationary kernels (2.6× the XLA
    batched path at N=1e6/k=32) and the XLA path otherwise; True/False
    force a path.

    Beyond the reference (which fixes conditioning sets to the *previous k
    in the given order*, ``NearestNeighborsModule.jl:63-72``):

    - ``ordering``: "natural" (as given, reference behavior), "random", or
      "maximin" (greedy farthest-point, Guinness 2018 — the standard
      accuracy upgrade for spatial data);
    - ``neighbors``: "previous" (last k in the ordering — banded, fastest),
      "nearest" (k nearest among all predecessors — general gather
      indices, host-side exact search in ``native/vecchia_order.cpp``), or
      "scaled" (KL-minimized sparsity pattern of Schäfer et al.,
      arXiv 2004.14455: predecessors within distance ``rho``·ℓᵢ of point i,
      where ℓᵢ is i's distance to the ordered set — the maximin distance
      under ``ordering="maximin"``, the intended pairing.  Sets are capped
      at the k nearest and −1-padded so device shapes stay static; the
      resulting factor is the KL-optimal sparse inverse Cholesky on that
      pattern, see ``test_vecchia_factor_is_kl_optimal``);
    - ``rho``: ball-radius multiplier for ``neighbors="scaled"`` (paper
      recipe: accuracy ε with ρ ≍ log(N/ε); ρ in 2-4 is the practical
      sweet spot, larger = denser = more accurate).

    Non-default choices need concrete (non-traced) inputs at posterior
    construction: the ordering/neighbor search is host-side preprocessing;
    everything downstream is jittable."""

    k: int = static_field()
    block_size: int | None = static_field(default=None)
    use_pallas: bool | None = static_field(default=None)
    ordering: str = static_field(default="natural")
    neighbors: str = static_field(default="previous")
    rho: float = static_field(default=3.0)


def band_Ut_matmul(Uband: jax.Array, X: jax.Array) -> jax.Array:
    """Uᵀ X for the banded upper-triangular U, X of shape (N,) or (N, P).

    (Uᵀ X)[i] = Σ_{t=0..k} Uband[i, t] · X[i−k+t], evaluated as k+1 STATIC
    SHIFTS of X (slices + zero pads) instead of a clipped gather — on TPU
    the gather (and especially its scatter-add transpose in the backward)
    costs an order of magnitude more HBM time than contiguous copies.

    BAND CONTRACT: out-of-range slots (row i, t with i−k+t < 0 — the first
    k rows' leading columns) must hold EXACTLY 0.  Every in-library
    constructor (``approx_root_prec_band``, the Pallas lanes kernels)
    writes zeros there; unlike the earlier ``jnp.where``-masked
    implementation, these shift products do NOT re-mask, so a
    caller-supplied band with NaN/Inf garbage in those slots propagates
    (0·NaN = NaN).  User-built bands must zero the masked slots
    (ADVICE r4)."""
    kp1 = Uband.shape[1]
    k = kp1 - 1
    if X.ndim == 1:
        # rank-1 path: (N, 1)-shaped intermediates would be 128×-padded by
        # the TPU tiling (measured 488 MB copies at N=1e6 → OOM)
        out = Uband[:, k] * X
        for t in range(k):
            sh = k - t
            Xsh = jnp.concatenate([jnp.zeros((sh,), X.dtype), X[:-sh]])
            out = out + Uband[:, t] * Xsh
        return out
    P = X.shape[1]
    out = Uband[:, k:kp1] * X  # t = k term: the point itself
    for t in range(k):
        sh = k - t
        Xsh = jnp.concatenate(
            [jnp.zeros((sh, P), X.dtype), X[:-sh]], axis=0
        )
        out = out + Uband[:, t : t + 1] * Xsh
    return out


def band_U_matvec(Uband: jax.Array, w: jax.Array) -> jax.Array:
    """U w for the banded upper-triangular U.

    (U w)[j] = Σ_{s=0..k} U[j, j+s] w[j+s], with U[j, j+s] = Uband[j+s, k−s]
    — evaluated as k+1 static shifts (see :func:`band_Ut_matmul`)."""
    N, kp1 = Uband.shape
    k = kp1 - 1
    out = Uband[:, k] * w
    for s in range(1, kp1):
        out = out + jnp.concatenate(
            [Uband[s:, k - s] * w[s:], jnp.zeros((s,), w.dtype)], axis=0
        )
    return out


@pytree_dataclass
class BandInvRoot:
    """Lazy representation of ``inv(U Uᵀ)`` via the band of U — the JAX
    analogue of the reference's ``InvRoot`` (``:77-88``), pluggable into
    :class:`~approximategps_tpu.core.gp.PosteriorGP` so all exact-posterior
    prediction code paths are reused, exactly as the reference reuses
    AbstractGPs' ``PosteriorGP``.

    ``Uband`` must satisfy the band contract of :func:`band_Ut_matmul`:
    out-of-range slots in the first k rows hold exactly 0 (library
    constructors guarantee this; user-built bands must too)."""

    Uband: jax.Array  # (N, k+1); [:, -1] is the diagonal of U

    def whiten(self, X: jax.Array) -> jax.Array:
        """V = Uᵀ X, so VᵀV = Xᵀ (U Uᵀ) X = Xᵀ inv(A) X."""
        return band_Ut_matmul(self.Uband, X)

    def logdet(self) -> jax.Array:
        """logdet(inv(UUᵀ)) = −2 logdet U (reference ``:82``)."""
        return -2.0 * jnp.sum(jnp.log(self.Uband[:, -1]))


def _resolve_use_pallas(use_pallas, dtype=None):
    # Auto (None): the fused batch-on-lanes Pallas band kernel
    # (window → Gram → bordered factor → band in one VMEM pass, batch on the
    # 128-lane axis) measures 335 ms vs 872 ms for the unrolled-XLA path at
    # N=1e6/k=32 on v5e — it is the DEFAULT on TPU for f32/bf16 inputs.
    # Off-TPU (CPU oracle/f64 test mode) Pallas would run in interpret mode,
    # so auto resolves to the XLA path there.
    if use_pallas is not None:
        return use_pallas
    return jax.default_backend() == "tpu" and dtype in (
        jnp.float32,
        jnp.bfloat16,
    )


def _fused_band(Xp: jax.Array, k: int, kern: Kernel, nbr=None):
    """Fully fused Pallas path: returns the (N, k+1) band or None if the
    kernel is not an (input-/output-)scaled parameter-free stationary
    kernel, optionally plus a white-noise NUGGET term (``σ²·k + τ²·White``
    — the noisy-data training model; the nugget becomes a traced shift
    τ²/σ² on the window Gram's index diagonal — iid observation noise, see
    ``unwrap_stationary_nugget`` for the duplicated-site caveat).
    Lengthscales fold into the inputs; the variance post-scales the band
    exactly (U(σ²k) = U(k)/σ).

    ``nbr=None`` conditions on the previous k points in the ordering (the
    banded reference scheme); an explicit (N, k) ``nbr`` index matrix (−1
    padded) gathers ARBITRARY predecessor sets — the maximin/nearest/scaled
    orderings ride the same kernel, which consumes gathered windows either
    way.

    Runs the batch-on-lanes kernel
    (:func:`~approximategps_tpu.ops.batched_chol.pallas_vecchia_band_lanes`)
    — the batch rides the 128-lane axis at full occupancy."""
    from ..core.kernels import unwrap_stationary_nugget
    from ..ops.batched_chol import (
        pallas_vecchia_band_lanes,
        pallas_vecchia_band_lanes_t,
    )

    unwrapped = unwrap_stationary_nugget(kern)
    if unwrapped is None:
        return None
    fn, scale, variance, white = unwrapped
    ratio = None
    if white is not None:
        # the ratio stays a full-precision scalar: computing it in a bf16
        # input dtype would round τ²/σ² to 8 mantissa bits before the
        # kernel's own f32 upcast
        rdt = jnp.promote_types(Xp.dtype, jnp.float32)
        ratio = jnp.asarray(white, rdt)
        if variance is not None:
            ratio = ratio / jnp.asarray(variance, rdt)
    Xs = Xp if scale is None else Xp * jnp.asarray(scale, Xp.dtype)
    N, D = Xs.shape
    if nbr is None:
        # previous-k windows are SLIDING: build them N-minor as k static
        # shifts of rank-1 feature rows (slices + front pads), feeding the
        # transposed kernel entry.  A clipped gather here costs ~280 ms at
        # N=1e6 forward and ~560 ms fwd+bwd (the scatter-add transpose)
        # where the whole fused kernel fwd+bwd is 183 ms; and the (N, D,
        # k+1) layout's (N, 1) slice intermediates are 128×-padded by the
        # TPU tiling (488 MB copies at N=1e6, D=1 — an OOM)
        rows = []
        for d in range(D):
            Xd = Xs[:, d]
            for t in range(k):
                sh = k - t
                rows.append(
                    jnp.concatenate(
                        [jnp.full((sh,), Xd[0], Xs.dtype), Xd[:-sh]]
                    )
                )
            rows.append(Xd)
        xwT = jnp.stack(rows, axis=0).reshape(D, k + 1, N)
        iota = jnp.arange(N)
        validT = jnp.stack(
            [(iota >= k - t).astype(Xs.dtype) for t in range(k)], axis=0
        )  # (k, N)
        Uband = pallas_vecchia_band_lanes_t(xwT, validT, fn, nugget=ratio)
    else:
        idx = nbr
        valid = (idx >= 0).astype(Xs.dtype)
        idxc = jnp.clip(idx, 0, N - 1)
        # (N, D, k+1): window slot k is the point itself
        xw = jnp.concatenate([Xs[idxc], Xs[:, None, :]], axis=1).swapaxes(1, 2)
        Uband = pallas_vecchia_band_lanes(xw, valid, fn, nugget=ratio)
    if variance is not None:
        Uband = Uband / jnp.sqrt(jnp.asarray(variance, Uband.dtype))
    return Uband


def approx_root_prec_band(
    x: jax.Array, k: int, kern: Kernel, block_size=None, use_pallas=None
):
    """Banded upper-triangular root of the approximate precision,
    U = (I−B)ᵀ F^{−1/2} (reference ``approx_root_prec`` ``:91-95``),
    returned as an (N, k+1) band: ``Uband[i, t] = U[i−k+t, i]``.

    One batched k×k Cholesky per point yields both the B-row and F-diag
    (merging the duplicated solves at reference ``:28`` and ``:56``).  On TPU
    (f32/bf16, stationary kernel) the whole window → Gram → factor → band
    construction runs as the fused batch-on-lanes Pallas kernel
    (:func:`~approximategps_tpu.ops.batched_chol.pallas_vecchia_band_lanes`);
    set ``use_pallas=False`` to force the XLA batched path."""
    Xp = as_points(x)
    N = Xp.shape[0]
    dtype = Xp.dtype
    auto = use_pallas is None
    use_pallas = _resolve_use_pallas(use_pallas, dtype)

    if use_pallas:
        fused = _fused_band(Xp, k, kern)
        if fused is not None:
            return fused
        # non-unwrappable kernel: fall through to the windowed paths below —
        # in auto mode to the measured-best XLA batched path (the windowed
        # first-generation Pallas kernel stays explicit-opt-in)
        if auto:
            use_pallas = False

    kern_diag = kern.diag(Xp)  # (N,)

    def window(i):
        """Masked neighbor Gram, cross-covariances and prior variance for
        point i (neighbors = previous k in the ordering)."""
        t = jnp.arange(k)
        idx = i - k + t
        mask = idx >= 0
        idxc = jnp.clip(idx, 0, N - 1)
        Xw = Xp[idxc]  # (k, D)
        xi = Xp[i][None, :]  # (1, D)
        Kw = kern.gram(Xw)
        pair_mask = mask[:, None] & mask[None, :]
        Kw = jnp.where(pair_mask, Kw, jnp.eye(k, dtype=dtype))
        kni = jnp.where(mask, kern.gram(Xw, xi)[:, 0], 0.0)
        return Kw, kni, kern_diag[i]

    def rows(idx_block):
        Kw, kni, kdiag = jax.vmap(window)(idx_block)
        if use_pallas:
            from ..ops.batched_chol import batched_chol_solve_band

            return batched_chol_solve_band(Kw, kni, kdiag)
        # unrolled masked-column batched solve: orders of magnitude faster on
        # TPU than XLA's dynamic-slice cholesky expander for small k
        from ..ops.batched_chol import batched_chol_solve_band_unrolled

        return batched_chol_solve_band_unrolled(Kw, kni, kdiag)

    indices = jnp.arange(N)
    if block_size is None or block_size >= N:
        Uband = rows(indices)
    else:
        bs = block_size
        pad = (-N) % bs
        idx_pad = jnp.concatenate([indices, jnp.zeros(pad, dtype=indices.dtype)])
        blocks = idx_pad.reshape(-1, bs)
        Uband = jax.lax.map(rows, blocks).reshape(-1, k + 1)[:N]
    return Uband


@posterior.register(NearestNeighbors)
def _posterior_nn(nn: NearestNeighbors, fx: FiniteGP, y: jax.Array, **_):
    """Reference ``:97-106``: returns a PosteriorGP masquerading as exact,
    with data (α = U Uᵀ δ, C = InvRoot(U), x, δ)."""
    if nn.ordering != "natural" or nn.neighbors != "previous":
        return _posterior_nn_general(nn, fx, y)
    kern = fx.f.kernel
    Uband = approx_root_prec_band(
        fx.x, nn.k, kern, nn.block_size, use_pallas=nn.use_pallas
    )
    delta = y - fx.mean()
    alpha = band_U_matvec(Uband, band_Ut_matmul(Uband, delta))
    return PosteriorGP(
        prior=fx.f,
        x=as_points(fx.x),
        alpha=alpha,
        rep=BandInvRoot(Uband),
        delta=delta,
    )


@approx_lml.register(NearestNeighbors)
def _approx_lml_nn(nn: NearestNeighbors, fx: FiniteGP, y: jax.Array, **_):
    """Reference ``:108-113``: −(logdet C + N log2π + αᵀδ)/2."""
    post = _posterior_nn(nn, fx, y)
    quadform = post.alpha @ post.delta
    ld = post.rep.logdet()
    n = y.shape[0]
    return -(ld + n * _LOG2PI + quadform) / 2.0


# ---------------------------------------------------------------------------
# General (non-contiguous) neighbor sets: orderings + gather-indexed root
# ---------------------------------------------------------------------------


@pytree_dataclass
class SparseInvRoot:
    """Lazy ``inv(U Uᵀ)`` for a general sparse upper-triangular root given by
    per-point predecessor indices — the gather/scatter generalization of
    :class:`BandInvRoot` for non-contiguous conditioning sets.

    ``nbr``: (N, k) ordering positions of each point's neighbors (−1 pad);
    ``coeff``: (N, k) off-diagonal entries U[nbr[i,t], i];
    ``diag``: (N,) diagonal U[i, i]."""

    nbr: jax.Array
    coeff: jax.Array
    diag: jax.Array

    def whiten(self, X: jax.Array) -> jax.Array:
        """V = Uᵀ X: V[i] = diag[i]·X[i] + Σ_t coeff[i,t]·X[nbr[i,t]]."""
        vec = X.ndim == 1
        Xm = X[:, None] if vec else X
        idxc = jnp.clip(self.nbr, 0, Xm.shape[0] - 1)
        gathered = Xm[idxc]  # (N, k, P)
        out = self.diag[:, None] * Xm + jnp.einsum(
            "nt,ntp->np", self.coeff, gathered
        )
        return out[:, 0] if vec else out

    def u_matvec(self, w: jax.Array) -> jax.Array:
        """U w: (Uw)[j] = diag[j]·w[j] + Σ_{i,t: nbr[i,t]=j} coeff[i,t]·w[i]."""
        N = w.shape[0]
        idxc = jnp.clip(self.nbr, 0, N - 1)
        contrib = self.coeff * w[:, None]  # (N, k); zero where padded
        out = self.diag * w
        return out.at[idxc.reshape(-1)].add(contrib.reshape(-1))

    def logdet(self) -> jax.Array:
        return -2.0 * jnp.sum(jnp.log(self.diag))


def _require_concrete(x, what: str):
    if isinstance(x, jax.core.Tracer):
        raise ValueError(
            f"{what} requires concrete (non-traced) inputs: the ordering / "
            "neighbor search is host-side preprocessing. Compute the "
            "posterior outside jit (downstream prediction/lml are jittable)."
        )
    return np.asarray(x)


def resolve_ordering(x, ordering: str, key=None) -> np.ndarray:
    """Host-side ordering resolution → an (N,) permutation (numpy)."""
    Xp = as_points(x)
    if ordering == "natural":
        return np.arange(Xp.shape[0])
    Xc = _require_concrete(Xp, f"ordering='{ordering}'")
    if ordering == "maximin":
        from ..native import maximin_ordering

        return maximin_ordering(Xc)
    if ordering == "random":
        rng = np.random.default_rng(0 if key is None else int(key))
        return rng.permutation(Xc.shape[0])
    raise ValueError(f"unknown ordering: {ordering!r}")


def approx_root_prec_sparse(
    x: jax.Array, nbr, kern: Kernel, block_size=None, use_pallas=None
) -> SparseInvRoot:
    """Sparse precision root for ARBITRARY predecessor sets ``nbr`` (N, k)
    (−1 padded): same one-factorization-per-point batched math as the banded
    path, with gathers instead of contiguous windows.

    Dispatch mirrors :func:`approx_root_prec_band`: on TPU (f32/bf16,
    unwrappable stationary kernel) the default is the fused batch-on-lanes
    Pallas band kernel fed with nbr-gathered windows — the accuracy-best
    maximin/nearest/scaled configurations run the same fast tier as the
    banded path instead of the 2.6×-slower XLA pipeline.  Off-TPU/f64 (or
    ``use_pallas=False``) runs the unrolled masked-column XLA path."""
    Xp = as_points(x)
    N = Xp.shape[0]
    dtype = Xp.dtype
    nbr = jnp.asarray(nbr)
    k = nbr.shape[1]
    auto = use_pallas is None
    use_pallas = _resolve_use_pallas(use_pallas, dtype)

    if use_pallas:
        fused = _fused_band(Xp, k, kern, nbr=nbr)
        if fused is not None:
            return SparseInvRoot(nbr=nbr, coeff=fused[:, :k], diag=fused[:, k])
        # non-unwrappable kernel: auto mode falls to the measured-best XLA
        # batched path; explicit use_pallas=True keeps the first-generation
        # windowed kernel via batched_chol_solve_band below
        if auto:
            use_pallas = False

    kern_diag = kern.diag(Xp)

    def window(i):
        idx = nbr[i]
        mask = idx >= 0
        idxc = jnp.clip(idx, 0, N - 1)
        Xw = Xp[idxc]
        xi = Xp[i][None, :]
        Kw = kern.gram(Xw)
        pair_mask = mask[:, None] & mask[None, :]
        Kw = jnp.where(pair_mask, Kw, jnp.eye(k, dtype=dtype))
        kni = jnp.where(mask, kern.gram(Xw, xi)[:, 0], 0.0)
        return Kw, kni, kern_diag[i]

    def rows(idx_block):
        Kw, kni, kdiag = jax.vmap(window)(idx_block)
        if use_pallas:
            from ..ops.batched_chol import batched_chol_solve_band

            return batched_chol_solve_band(Kw, kni, kdiag)
        from ..ops.batched_chol import batched_chol_solve_band_unrolled

        return batched_chol_solve_band_unrolled(Kw, kni, kdiag)

    indices = jnp.arange(N)
    if block_size is None or block_size >= N:
        band = rows(indices)
    else:
        bs = block_size
        pad = (-N) % bs
        idx_pad = jnp.concatenate([indices, jnp.zeros(pad, dtype=indices.dtype)])
        band = jax.lax.map(rows, idx_pad.reshape(-1, bs)).reshape(-1, k + 1)[:N]
    return SparseInvRoot(nbr=nbr, coeff=band[:, :k], diag=band[:, k])


def predict_knn(
    fx: FiniteGP,
    y: jax.Array,
    xs: jax.Array,
    k: int = 32,
    test_block: int = 4096,
    train_block: int = 65536,
    knn_mode: str = "auto",
    use_pallas: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Vecchia serving: independent-conditioning (local-kriging) prediction —
    each test point conditions ONLY on its k nearest noisy observations
    (Katzfuss & Guinness 2021, prediction conditioning sets).

    O(N*·(search + k²)) time and O(test_block · train_block) peak memory —
    no (N, N*) cross-covariance ever exists, unlike the
    posterior-masquerade path (reference ``NearestNeighborsModule.jl:97-106``
    and :class:`BandInvRoot`, whose ``mean``/``var`` build dense cross-covs).
    For spatial inputs (D ≤ 3, the Vecchia regime) the search rides the
    bucketed-grid tier of :func:`~approximategps_tpu.ops.knn.knn_search`
    (``knn_mode="auto"``): O(3^D·cell-occupancy) gathered candidates per
    test point instead of the O(N) blocked sweep, exactness certified on
    device with per-tile fallback.
    Observation noise enters HERE via ``fx.noise`` (added to the window
    Grams): pass the SIGNAL kernel plus the learned noise as ``fx``'s noise
    — do NOT also fold a ``τ²·White`` nugget into ``fx.f.kernel`` (the
    training-side recipe, where the precision root ignores FiniteGP noise),
    or the test-point prior variance double-counts it.
    Fully jittable, static shapes: the device-side blocked k-NN search
    (:func:`~approximategps_tpu.ops.knn.knn_search`) feeds the SAME batched
    masked-Cholesky band op as training — the band row [−b·F^{−1/2}, F^{−1/2}]
    IS the kriging weight vector b = Kw⁻¹kni and conditional variance
    F = k** − kniᵀKw⁻¹kni in disguise.

    Returns per-point (mean, var) of the LATENT f at ``xs`` (noise-free
    predictive; add ``fx.noise`` marginals for y-space prediction).

    On TPU (f32/bf16, scalar noise, stationary kernel) the batched
    local-kriging solves ride the SAME fused Pallas lanes kernel as
    training, with the noise as a ``nugget_self=False`` Gram diagonal
    shift (neighbors are noisy observations, slot k is the noise-free
    test point); ``use_pallas=False`` forces the XLA batched path.
    """
    from ..ops.batched_chol import (
        batched_chol_solve_band,
        batched_chol_solve_band_unrolled,
        pallas_vecchia_band_lanes,
    )
    from ..ops.knn import knn_search

    Xp = as_points(fx.x)
    Xs = as_points(xs)
    N = Xp.shape[0]
    kern = fx.f.kernel
    k = min(k, N)
    idx, _ = knn_search(Xp, Xs, k, train_block, test_block, knn_mode)  # (N*, k)

    delta = y - fx.mean()  # (N,)
    noise = jnp.asarray(fx.noise)
    if noise.ndim == 0:
        noise_d = jnp.full((N,), noise, Xp.dtype)
    elif noise.ndim == 1:
        noise_d = noise
    else:
        noise_d = jnp.diagonal(noise)

    mean_s = fx.f.mean(Xs)
    kdiag_s = kern.diag(Xs)

    from ..core.kernels import unwrap_stationary

    fused = None
    if noise.ndim == 0 and _resolve_use_pallas(use_pallas, Xp.dtype):
        fused = unwrap_stationary(kern)

    if fused is not None:
        # fused serving solves: bordered window → Gram(+noise on the
        # neighbor diagonal only) → factor → band in one VMEM pass.  The
        # kriging weights b = −band[:k]/band[k] are VARIANCE-INVARIANT
        # (U(σ²A) = U(A)/σ scales num/denom alike), so the unit-variance
        # band serves directly; F = σ²·F_unit from the last band entry.
        fn, scale, variance = fused
        rdt = jnp.promote_types(Xp.dtype, jnp.float32)
        var_s = (jnp.ones((), rdt) if variance is None
                 else jnp.asarray(variance, rdt))
        ratio = jnp.asarray(noise, rdt) / var_s
        Xps = Xp if scale is None else Xp * jnp.asarray(scale, Xp.dtype)
        Xss = Xs if scale is None else Xs * jnp.asarray(scale, Xs.dtype)

        def rows(i_block):
            w = idx[i_block]  # (bs, k)
            xw = jnp.concatenate(
                [Xps[w], Xss[i_block][:, None, :]], axis=1
            ).swapaxes(1, 2)  # (bs, D, k+1)
            valid = jnp.ones((i_block.shape[0], k), Xp.dtype)
            band = pallas_vecchia_band_lanes(
                xw, valid, fn, nugget=ratio, nugget_self=False
            )
            b = -band[:, :k] / band[:, k:]  # kriging weights Kw⁻¹kni
            mu = mean_s[i_block] + jnp.einsum("nt,nt->n", b, delta[w])
            var = var_s.astype(band.dtype) / jnp.square(band[:, k])
            return mu, jnp.maximum(var, 0.0)

    else:

        def window(i):
            w = idx[i]
            Xw = Xp[w]
            Kw = kern.gram(Xw) + jnp.diag(noise_d[w])
            kni = kern.gram(Xw, Xs[i][None, :])[:, 0]
            return Kw, kni, delta[w]

        def rows(i_block):
            Kw, kni, dw = jax.vmap(window)(i_block)
            # unrolled columns are the measured-fast path at serving k
            # (≤ ~48); past that the unrolled XLA graph explodes compile
            # time, so fall back to the fori_loop variant (compiles in
            # seconds at any k)
            if k <= 48:
                band = batched_chol_solve_band_unrolled(
                    Kw, kni, kdiag_s[i_block]
                )
            else:
                band = batched_chol_solve_band(Kw, kni, kdiag_s[i_block])
            b = -band[:, :k] / band[:, k:]  # kriging weights Kw⁻¹kni
            mu = mean_s[i_block] + jnp.einsum("nt,nt->n", b, dw)
            var = jnp.maximum(1.0 / jnp.square(band[:, k]), 0.0)
            return mu, var

    m = Xs.shape[0]
    indices = jnp.arange(m)
    bs = min(test_block, m)
    pad = (-m) % bs
    idx_pad = jnp.concatenate([indices, jnp.zeros(pad, dtype=indices.dtype)])
    mu, var = jax.lax.map(rows, idx_pad.reshape(-1, bs))
    return mu.reshape(-1)[:m], var.reshape(-1)[:m]


def _posterior_nn_general(nn: NearestNeighbors, fx: FiniteGP, y: jax.Array):
    """Ordering/neighbor-generalized posterior: reorder the data host-side,
    build the gather-indexed root, return a PosteriorGP over the REORDERED
    conditioning set (predictions are ordering-invariant)."""
    from ..native import nearest_predecessor_neighbors, scaled_ball_predecessors

    Xp = as_points(fx.x)
    order = resolve_ordering(Xp, nn.ordering)
    order_j = jnp.asarray(order)
    Xo = Xp[order_j]
    yo = y[order_j]

    if nn.neighbors == "nearest":
        Xc = _require_concrete(Xp, "neighbors='nearest'")
        nbr = jnp.asarray(nearest_predecessor_neighbors(Xc, order, nn.k))
    elif nn.neighbors == "scaled":
        Xc = _require_concrete(Xp, "neighbors='scaled'")
        nbr = jnp.asarray(scaled_ball_predecessors(Xc, order, nn.rho, nn.k))
    elif nn.neighbors == "previous":
        idx = jnp.arange(Xo.shape[0])[:, None] - nn.k + jnp.arange(nn.k)[None, :]
        nbr = jnp.where(idx >= 0, idx, -1)
    else:
        raise ValueError(f"unknown neighbors: {nn.neighbors!r}")

    kern = fx.f.kernel
    rep = approx_root_prec_sparse(
        Xo, nbr, kern, nn.block_size, use_pallas=nn.use_pallas
    )
    mean_o = fx.f.mean(Xo)
    delta = yo - mean_o
    alpha = rep.u_matvec(rep.whiten(delta))
    return PosteriorGP(prior=fx.f, x=Xo, alpha=alpha, rep=rep, delta=delta)
