"""Streaming (chunked) SVGP ELBO for datasets that don't fit a single
Kuf Gram matrix in HBM.

The reference never needs this (its largest example is N=10,000,
``examples/a-regression/script.jl:33``); at the BASELINE.json north-star
scale (N=1e6, M=2048) the (M, N) projection matrix alone is 16 GB, so the
data term is accumulated block-by-block with ``lax.scan`` + ``jax.checkpoint``
(rematerialisation trades FLOPs for HBM — each block's Kuf/A are recomputed
in the backward pass instead of stored).

The per-block math is identical to
``src/SparseVariationalApproximationModule.jl:208-264`` in the S-correction
form: ``μ = Kufᵀ α``, ``σ² = kdiag + diag(Kufᵀ S Kuf)`` with
``S = Lk⁻ᵀ(BBᵀ−I)Lk⁻¹`` formed once outside the block scan — one (M, B)
MXU matmul per block instead of two, with closed-form pullbacks
(:func:`~approximategps_tpu.core.linalg.diag_quad_sym`).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..config import config, resolve_matmul_precision
from ..core import linalg
from ..core.gp import LatentFiniteGP
from ..core.quadrature import DefaultExpectationMethod, expected_loglikelihood
from .svgp import (
    Centered,
    SparseVariationalApproximation,
    _epilogue_mu_var,
    _epilogue_ready,
    _matvec_f32,
    _storage_dtype,
    prior_kl,
)

__all__ = ["streaming_elbo", "streaming_data_term", "dp_streaming_elbo"]


def _pad_leading(a: jax.Array, pad: int) -> jax.Array:
    """Pad the leading axis with copies of the first row (numerically safe
    kernel inputs; padded rows are masked out of every reduction)."""
    if pad == 0:
        return a
    return jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])


def streaming_data_term(
    sva: SparseVariationalApproximation,
    lik,
    x: jax.Array,
    y: jax.Array,
    block_size: int = 8192,
    quadrature=None,
    remat: bool = True,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Σᵢ E_{q(fᵢ)}[log p(yᵢ|fᵢ)] accumulated in blocks of ``block_size``.

    The data term alone (no num_data scale, no KL) so it can be psum-reduced
    across a device mesh by :func:`dp_streaming_elbo`.

    N need NOT be a multiple of ``block_size``: the tail block is padded with
    copies of the first point and masked out of the reduction.  ``mask``
    (optional, shape (N,), 0/1 or bool) additionally down-weights points —
    used by :func:`dp_streaming_elbo` for uneven shards.
    """
    if quadrature is None:
        quadrature = DefaultExpectationMethod()
    fz = sva.fz
    prior = fz.f
    m = sva.q.mean
    Kuu_L, Lk_inv = linalg.chol_with_inv(fz.cov())
    if isinstance(sva.parametrization, Centered):
        B = Lk_inv @ sva.q.scale_tril
        alpha = Lk_inv.T @ (Lk_inv @ (m - fz.mean()))
    else:
        alpha = Lk_inv.T @ m
        B = sva.q.scale_tril

    n = y.shape[0]
    block_size = min(block_size, n)
    pad = (-n) % block_size
    w = jnp.ones((n,), dtype=m.dtype) if mask is None else jnp.asarray(mask, m.dtype)
    if pad:
        x = _pad_leading(x, pad)
        y = _pad_leading(y, pad)
        w = jnp.concatenate([w, jnp.zeros((pad,), dtype=w.dtype)])
    n_blocks = (n + pad) // block_size
    xb = x.reshape((n_blocks, block_size) + x.shape[1:])
    yb = y.reshape((n_blocks, block_size) + y.shape[1:])
    wb = w.reshape((n_blocks, block_size))
    z = fz.x

    # S-correction: variances per block need ONE (M, B) projection matmul
    # (diag(KufᵀS Kuf)) instead of two — S formed once outside the scan
    # (see models/svgp.py _SVGPCache.S_corr)
    prec = resolve_matmul_precision(B.dtype)
    BBt = jnp.matmul(B, B.T, precision=prec)
    S_corr = jnp.matmul(
        Lk_inv.T,
        jnp.matmul(
            BBt - jnp.eye(B.shape[-1], dtype=B.dtype),
            Lk_inv,
            precision=prec,
        ),
        precision=prec,
    )
    # shard_map varying-axis typing: tie S_corr to the (data-varying) shard
    # so the scan-transpose's S̄ cotangent carry starts with matching varying
    # axes (same workaround as acc0 below; zero-valued, fused away)
    S_corr = S_corr + jnp.asarray(xb.ravel()[0] * 0, dtype=S_corr.dtype)

    # Static dispatch: when the fused Pallas epilogue applies (prefer=remat:
    # remat is exactly the context where its recompute-in-VMEM backward
    # wins), the (M, B) Gram and S·K never exist outside VMEM and the
    # custom-VJP residuals are tiny — so remat is SKIPPED for the block
    # (wrapping the fused op in jax.checkpoint would re-run its forward
    # kernel in the backward for nothing).
    use_fused = _epilogue_ready(prior, S_corr, prefer=remat) is not None

    def block_ell(xi, yi, wi):
        if use_fused:
            mu, var = _epilogue_mu_var(prior, z, xi, alpha, S_corr,
                                       prefer=remat)
            var = var.astype(xi.dtype)
        else:
            Kuf = prior.cov(z, xi)  # (M, B) Gram — HOT
            dt = _storage_dtype(Kuf.dtype, Kuf.shape[0])
            if dt is not None:
                # bf16 storage for the block intermediates; f32 accumulation
                corr = linalg.diag_quad_sym(S_corr.astype(dt), Kuf.astype(dt))
            else:
                corr = linalg.diag_quad_sym(S_corr, Kuf)
            mu = prior.mean(xi) + _matvec_f32(Kuf.T, alpha)
            var = (prior.var(xi) + corr).astype(Kuf.dtype)
        ell = expected_loglikelihood(quadrature, lik, mu, var, yi)
        return jnp.sum(ell * wi)

    if remat and not use_fused:
        block_ell = jax.checkpoint(block_ell)

    def scan_body(acc, xyw):
        xi, yi, wi = xyw
        return acc + block_ell(xi, yi, wi), None

    # initial carry derived from the data so its shard_map varying-axis type
    # matches the block outputs (a plain zero is 'unvarying' and rejected)
    acc0 = jnp.zeros((), dtype=m.dtype) + jnp.asarray(xb.ravel()[0] * 0, dtype=m.dtype)
    total_ell, _ = jax.lax.scan(scan_body, acc0, (xb, yb, wb))
    return total_ell


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
    Any N works: a non-multiple tail block is padded and masked internally.
    """
    total_ell = streaming_data_term(
        sva, lik, x, y, block_size=block_size, quadrature=quadrature, remat=remat
    )
    n = y.shape[0]
    scale = 1.0 if num_data is None else num_data / n
    return total_ell * scale - prior_kl(sva)


def dp_streaming_elbo(
    sva: SparseVariationalApproximation,
    lik,
    x: jax.Array,
    y: jax.Array,
    mesh,
    axis_name: str = "data",
    block_size: int = 8192,
    num_data: int | None = None,
    quadrature=None,
    remat: bool = True,
) -> jax.Array:
    """Data-parallel full-dataset ELBO over a device mesh (the v5e-16 stretch
    config of BASELINE.md): each chip scans its local shard of (x, y), the
    per-point expectations are ``psum``-reduced over ICI, and the (replicated)
    KL is subtracted once.  Differentiable; gradients of the replicated
    parameters are automatically psum-reduced by shard_map's transpose.

    N need not divide the mesh size: inputs are padded to a device multiple
    and the padded points are masked out of the reduction."""
    from jax.sharding import PartitionSpec as P

    n = y.shape[0]
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    w = jnp.ones((n,), dtype=sva.q.mean.dtype)
    if pad:
        x = _pad_leading(x, pad)
        y = _pad_leading(y, pad)
        w = jnp.concatenate([w, jnp.zeros((pad,), dtype=w.dtype)])

    def local(sva_, lik_, x_loc, y_loc, w_loc):
        ell = streaming_data_term(
            sva_, lik_, x_loc, y_loc,
            block_size=min(block_size, y_loc.shape[0]),
            quadrature=quadrature, remat=remat, mask=w_loc,
        )
        return jax.lax.psum(ell, axis_name)

    total_ell = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
    )(sva, lik, x, y, w)

    scale = 1.0 if num_data is None else num_data / n
    return total_ell * scale - prior_kl(sva)
