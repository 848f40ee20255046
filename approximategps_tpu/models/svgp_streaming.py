"""Streaming (chunked) SVGP ELBO for datasets that don't fit a single
Kuf Gram matrix in HBM.

The reference never needs this (its largest example is N=10,000,
``examples/a-regression/script.jl:33``); at the BASELINE.json north-star
scale (N=1e6, M=2048) the (M, N) projection matrix alone is 16 GB, so the
data term is accumulated block-by-block with ``lax.scan`` + ``jax.checkpoint``
(rematerialisation trades FLOPs for HBM — each block's Kuf/A are recomputed
in the backward pass instead of stored).

The per-block math is identical to
``src/SparseVariationalApproximationModule.jl:208-264``:
``A = Lk⁻¹ Kuf`` (here a pure MXU matmul against a precomputed ``Lk⁻¹``),
``μ = Kufᵀ α``, ``σ² = kdiag − colsum(A²) + colsum((Bᵀ A)²)``.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..config import config
from ..core import linalg
from ..core.gp import LatentFiniteGP
from ..core.quadrature import DefaultExpectationMethod, expected_loglikelihood
from .svgp import Centered, SparseVariationalApproximation, prior_kl

__all__ = ["streaming_elbo"]


def streaming_elbo(
    sva: SparseVariationalApproximation,
    lik,
    x: jax.Array,
    y: jax.Array,
    block_size: int = 8192,
    num_data: int | None = None,
    quadrature=None,
    remat: bool = True,
) -> jax.Array:
    """ELBO over the full dataset, accumulated in blocks of ``block_size``.

    Mathematically identical to ``elbo(sva, lfx, y, num_data=...)`` — verified
    against it in tests — but with O(M·block) peak memory instead of O(M·N).
    N must be a multiple of block_size (pad + mask upstream otherwise).
    """
    if quadrature is None:
        quadrature = DefaultExpectationMethod()
    fz = sva.fz
    prior = fz.f
    m = sva.q.mean
    Kuu_L = fz.scale_tril()
    eye = jnp.eye(Kuu_L.shape[-1], dtype=Kuu_L.dtype)
    Lk_inv = linalg.solve_lower_triangular(Kuu_L, eye)
    if isinstance(sva.parametrization, Centered):
        B = Lk_inv @ sva.q.scale_tril
        alpha = linalg.cholesky_solve(Kuu_L, m - fz.mean())
    else:
        alpha = linalg.solve_upper_triangular(Kuu_L.T, m)
        B = sva.q.scale_tril

    n = y.shape[0]
    assert n % block_size == 0, "pad the data to a multiple of block_size"
    n_blocks = n // block_size
    xb = x.reshape((n_blocks, block_size) + x.shape[1:])
    yb = y.reshape((n_blocks, block_size) + y.shape[1:])
    z = fz.x

    def block_ell(xi, yi):
        Kuf = prior.cov(z, xi)  # (M, B) Gram — HOT
        A = jnp.matmul(Lk_inv, Kuf, precision=config.matmul_precision)
        mu = prior.mean(xi) + Kuf.T @ alpha
        var = (
            prior.var(xi)
            - linalg.diag_At_A(A)
            + linalg.diag_At_A(
                jnp.matmul(B.T, A, precision=config.matmul_precision)
            )
        )
        ell = expected_loglikelihood(quadrature, lik, mu, var, yi)
        return jnp.sum(ell)

    if remat:
        block_ell = jax.checkpoint(block_ell)

    def scan_body(acc, xy):
        xi, yi = xy
        return acc + block_ell(xi, yi), None

    total_ell, _ = jax.lax.scan(scan_body, jnp.zeros((), dtype=m.dtype), (xb, yb))

    scale = 1.0 if num_data is None else num_data / n
    return total_ell * scale - prior_kl(sva)
