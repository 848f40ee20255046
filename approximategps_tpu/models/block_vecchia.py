"""Block-Vecchia GP approximation (Pan et al., arXiv 2410.04477; PAPERS.md).

Scalar Vecchia factorizes p(f) = ∏ᵢ p(fᵢ | nbr(i)) with one k×k solve per
POINT — N tiny factorizations, VPU-bound on TPU.  Block-Vecchia groups the
ordered points into blocks of size b and factorizes

    p(f) = ∏_B p(f_B | f_{nbr(B)}),

one (k×k Cholesky + k×b solve + b×b Cholesky) per BLOCK: N/b factorizations
of MXU-sized operands instead of N of k×k — the TPU-friendly regime the
scalar scheme can't reach.  b = k = 1 recovers scalar Vecchia exactly; a
single block with full conditioning recovers the exact GP.

Per block B with neighbor index set nb(B) (previous-k contiguous by default,
or host-side nearest-predecessor search of the block centroid):

    C_B = (K_nb⁻¹ K_{nb,B})ᵀ                 (b × k regression weights)
    S_B = K_BB − K_{B,nb} K_nb⁻¹ K_{nb,B}    (b × b conditional covariance)

giving the joint ∏_B N(f_B; C_B f_nb, S_B), i.e. a block-sparse precision
root U = (I − C)ᵀ blockdiag(L_{S_B})⁻ᵀ used for lml, posterior and
whitening — the same ``PosteriorGP`` plumbing as the banded/sparse scalar
paths."""

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
from .vecchia import _require_concrete, resolve_ordering

__all__ = ["BlockNearestNeighbors", "BlockInvRoot", "block_vecchia_factors"]

_LOG2PI = math.log(2.0 * math.pi)


@pytree_dataclass
class BlockNearestNeighbors:
    """Block-Vecchia approximation: blocks of ``block_size`` points, each
    conditioning on ``k`` predecessor points.

    ``neighbors="previous"``: the k points immediately before the block in
    the ordering (contiguous — gather-free).  ``neighbors="nearest"``: the k
    predecessors closest to the block centroid (host-side exact search).
    ``ordering`` as in :class:`~approximategps_tpu.models.vecchia.NearestNeighbors`."""

    block_size: int = static_field()
    k: int = static_field()
    ordering: str = static_field(default="natural")
    neighbors: str = static_field(default="previous")


@pytree_dataclass
class BlockInvRoot:
    """Lazy ``inv(U Uᵀ)`` for the block-sparse root.

    ``nbr``: (NB, k) global point indices of each block's neighbors (−1 pad);
    ``C``: (NB, b, k) regression weights; ``Ls_inv``: (NB, b, b) inverse
    Cholesky factors of the conditional covariances.  Block B owns rows
    [B·b, (B+1)·b)."""

    nbr: jax.Array
    C: jax.Array
    Ls_inv: jax.Array

    def whiten(self, X: jax.Array) -> jax.Array:
        """V = Uᵀ X: V_B = L_{S_B}⁻¹ (X_B − C_B X_{nb(B)})."""
        vec = X.ndim == 1
        Xm = X[:, None] if vec else X
        NB, b, k = self.C.shape
        N = NB * b
        Xb = Xm[:N].reshape(NB, b, -1)
        idxc = jnp.clip(self.nbr, 0, N - 1)
        Xnb = Xm[idxc]  # (NB, k, P)
        resid = Xb - jnp.matmul(self.C, Xnb)
        out = jnp.matmul(self.Ls_inv, resid).reshape(N, -1)
        return out[:, 0] if vec else out

    def u_matvec(self, w: jax.Array) -> jax.Array:
        """U w: block-diagonal part L_{S_B}⁻ᵀ w_B scattered minus the
        neighbor coupling C_Bᵀ L_{S_B}⁻ᵀ w_B into rows nb(B)."""
        NB, b, k = self.C.shape
        N = NB * b
        wb = w[:N].reshape(NB, b)
        t = jnp.einsum("nij,ni->nj", self.Ls_inv, wb)  # L⁻ᵀ w_B  (NB, b)
        out = t.reshape(N)
        contrib = -jnp.einsum("nbk,nb->nk", self.C, t)  # (NB, k)
        idxc = jnp.clip(self.nbr, 0, N - 1)
        mask = (self.nbr >= 0).astype(w.dtype)
        return out.at[idxc.reshape(-1)].add((contrib * mask).reshape(-1))

    def logdet(self) -> jax.Array:
        """logdet(inv(UUᵀ)) = −2 logdet U = −2 Σ log diag(L_{S_B}⁻¹)
        (equivalently +2 Σ log diag(L_{S_B}))."""
        diag = jnp.diagonal(self.Ls_inv, axis1=-2, axis2=-1)
        return -2.0 * jnp.sum(jnp.log(diag))

    def quad(self, delta: jax.Array) -> jax.Array:
        """δᵀ U Uᵀ δ via the whitened residuals."""
        v = self.whiten(delta)
        return jnp.sum(v * v)


def _block_neighbor_indices(N, b, k, ordering, neighbors, X_ordered):
    """(NB, k) global indices (−1 padded) of each block's conditioning set."""
    NB = N // b
    if neighbors == "previous":
        starts = jnp.arange(NB) * b
        idx = starts[:, None] - k + jnp.arange(k)[None, :]
        return jnp.where(idx >= 0, idx, -1)
    if neighbors != "nearest":
        raise ValueError(f"unknown neighbors: {neighbors!r}")
    Xc = _require_concrete(X_ordered, "neighbors='nearest'")
    nbr = np.full((NB, k), -1, dtype=np.int64)
    for B in range(1, NB):
        lo = B * b
        centroid = Xc[lo : lo + b].mean(axis=0)
        d = ((Xc[:lo] - centroid) ** 2).sum(-1)
        m = min(k, lo)
        nbr[B, :m] = np.sort(np.argpartition(d, m - 1)[:m]) if m < lo else np.arange(lo)[:m]
    return jnp.asarray(nbr)


def block_vecchia_factors(x, nbr, b: int, kern: Kernel, jitter: float = 0.0):
    """Per-block (C, Ls_inv) from one vmapped factorization pass."""
    Xp = as_points(x)
    N, D = Xp.shape
    NB = N // b
    k = nbr.shape[1]
    Xb = Xp[: NB * b].reshape(NB, b, D)
    dtype = Xp.dtype
    eps = jnp.finfo(dtype).eps

    def one_block(xB, idx):
        mask = idx >= 0
        idxc = jnp.clip(idx, 0, N - 1)
        Xnb = Xp[idxc]  # (k, D)
        K_nb = kern.gram(Xnb)
        pair = mask[:, None] & mask[None, :]
        K_nb = jnp.where(pair, K_nb, jnp.eye(k, dtype=dtype))
        K_nbB = jnp.where(mask[:, None], kern.gram(Xnb, xB), 0.0)  # (k, b)
        K_BB = kern.gram(xB) + jitter * jnp.eye(b, dtype=dtype)
        L_nb = jnp.linalg.cholesky(K_nb + 8.0 * eps * jnp.eye(k, dtype=dtype))
        W = jax.scipy.linalg.cho_solve((L_nb, True), K_nbB)  # K_nb⁻¹ K_{nb,B}
        C = W.T  # (b, k)
        S = K_BB - K_nbB.T @ W
        S = linalg.symmetrize(S) + 8.0 * eps * jnp.trace(K_BB) / b * jnp.eye(
            b, dtype=dtype
        )
        L_S = jnp.linalg.cholesky(S)
        Ls_inv = jax.scipy.linalg.solve_triangular(
            L_S, jnp.eye(b, dtype=dtype), lower=True
        )
        return C, Ls_inv

    C, Ls_inv = jax.vmap(one_block)(Xb, nbr)
    return C, Ls_inv


def _build_block_root(nn: BlockNearestNeighbors, fx: FiniteGP):
    Xp = as_points(fx.x)
    N = Xp.shape[0]
    b = nn.block_size
    if N % b:
        raise ValueError(
            f"block_size={b} must divide N={N} (pad the data or change b)"
        )
    order = resolve_ordering(Xp, nn.ordering)
    order_j = jnp.asarray(order)
    Xo = Xp[order_j]
    nbr = _block_neighbor_indices(N, b, nn.k, nn.ordering, nn.neighbors, Xo)
    C, Ls_inv = block_vecchia_factors(Xo, nbr, b, fx.f.kernel)
    return order_j, Xo, BlockInvRoot(nbr=nbr, C=C, Ls_inv=Ls_inv)


@posterior.register(BlockNearestNeighbors)
def _posterior_block(nn: BlockNearestNeighbors, fx: FiniteGP, y: jax.Array, **_):
    order_j, Xo, rep = _build_block_root(nn, fx)
    yo = y[order_j]
    delta = yo - fx.f.mean(Xo)
    alpha = rep.u_matvec(rep.whiten(delta))
    return PosteriorGP(prior=fx.f, x=Xo, alpha=alpha, rep=rep, delta=delta)


@approx_lml.register(BlockNearestNeighbors)
def _approx_lml_block(nn: BlockNearestNeighbors, fx: FiniteGP, y: jax.Array, **_):
    order_j, Xo, rep = _build_block_root(nn, fx)
    yo = y[order_j]
    delta = yo - fx.f.mean(Xo)
    n = yo.shape[0]
    return -(rep.logdet() + n * _LOG2PI + rep.quad(delta)) / 2.0