"""Streamed-panel Pallas Cholesky with fused triangular inverse.

The SVGP posterior build needs ``L = chol(Kuu)`` AND ``J = L⁻¹`` (the
whitened cache / matmul-only projection path).  XLA computes them as two
latency-bound kernels (measured v5e, M=2048 f32: cholesky 0.45 ms +
level-batched tril-inv 0.27 ms — BENCH_NOTES "headline remaining floor").
This kernel fuses both into ONE sequential-grid pallas_call:

- grid = (K,) panels of width P; TPU grids execute sequentially, so panel k
  may read the L/J panels written by panels j < k straight from the output
  buffers (``memory_space=ANY`` + explicit DMA).
- Left-looking update: the A-panel is loaded once, and each previous L
  panel streams through VMEM in quarter-height chunks that are SKIPPED
  when they lie entirely above the diagonal — O(M²·K/4) HBM traffic,
  every flop an MXU matmul except the diagonal factor.
- The P×P diagonal block is factored AND inverted in one value-carried
  masked loop: writing column c of L is an elementary transform E_c, and
  applying E_c⁻¹ (a second rank-1 update) to an identity accumulator in
  the same step yields L_kk⁻¹ when the loop ends — no second substitution
  pass, no per-step MXU dots, no VMEM ref round-trips (measured: the
  two-pass ref-based variant cost 0.62 ms of the kernel's 1.26 ms at
  M=2048).  Strictly 2-D (P,1)/(1,P) one-hot reductions throughout —
  Mosaic rejects the replicated-lane relayouts squeezed 1-D vectors need
  (same discipline as ``ops/batched_chol``).  The column's transpose for
  the rank-1 update is read as ROW c of the still-symmetric trailing
  block (the update is masked to (row>c)∧(col>c) precisely to preserve
  that symmetry).
- The J = L⁻¹ row-panel follows in the same grid step:
  ``J[k] = [−L_kk⁻¹ · (L[k,:kP] @ J[:kP,:]), L_kk⁻¹, 0]`` — the row strip
  ``L[k,:kP]`` is already in VMEM, and previous J row-panels stream
  through in quarter-width chunks skipped beyond column kP (previous J
  rows are exactly zero there).

Scope: full-height panels (each (M, P) buffer lives wholly in VMEM), so
M ≤ 4096 at P = 128 within the ~16 MB budget.  Beyond that (M = 8192) the
dispatcher keeps XLA cholesky + level-batched inverse: the J row-panel
accumulation's HBM traffic grows as O(M²·K) and loses to the log-depth
level-batched inverse at large K.

No AD rules here: callers (``linalg.chol_with_inv``, the fused SVGP
whitened-cache composite) wrap this op in custom VJPs whose pullbacks are
matmul-only expressions of (L, J) — how the pair was produced is invisible
to the backward graph.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config

__all__ = [
    "pallas_chol_inv",
    "chol_inv_supported",
    "pallas_gram_chol_inv",
    "gram_chol_inv_supported",
]

_NCH = 4  # static row/col chunks per streamed panel (skip above/right of diag)


def _fused_factor_inv(dblk, iblk, P, acc_dtype):
    """dblk (P, P): symmetric PSD block → lower-Cholesky factor in place;
    iblk (P, P) ← L_kk⁻¹.  One value-carried masked loop (see module
    docstring): per column c, the factor's rank-1 trailing update and the
    inverse's elementary-transform update E_c⁻¹ happen together.
    (A merged [D | X] (P, 2P) single-rank-1 variant measured SLOWER —
    0.651 vs 0.624 ms at M=2048 — and tripled Mosaic compile time; the
    two-array form is kept.)"""
    lane = lax.broadcasted_iota(jnp.int32, (1, P), 1)
    subl = lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    eye = (lane == subl).astype(acc_dtype)

    def step(c, carry):
        D, X = carry
        colhot = (lane == c).astype(acc_dtype)  # (1, P)
        rowhot = (subl == c).astype(acc_dtype)  # (P, 1)
        dc = jnp.sum(D * colhot, axis=1, keepdims=True)  # (P, 1): D[:, c]
        drow = jnp.sum(D * rowhot, axis=0, keepdims=True)  # (1, P): D[c, :]
        piv = jnp.sum(dc * rowhot, axis=0, keepdims=True)  # (1, 1)
        inv_sqrt = lax.rsqrt(piv)
        lcol = jnp.where(subl >= c, dc * inv_sqrt, 0.0)  # (P, 1)
        lrow = jnp.where(lane >= c, drow * inv_sqrt, 0.0)  # (1, P) = lcolᵀ
        trail = jnp.logical_and(lane > c, subl > c)
        D = D - jnp.where(trail, lcol * lrow, 0.0)
        D = D * (1.0 - colhot) + lcol * colhot  # write column c of L
        # inverse: X ← E_c⁻¹ X  (scale row c, eliminate rows below)
        xc = jnp.sum(X * rowhot, axis=0, keepdims=True) * inv_sqrt  # (1, P)
        X = X - jnp.where(subl > c, lcol * xc, 0.0)
        X = X * (1.0 - rowhot) + xc * rowhot  # write row c
        return D, X

    D, X = lax.fori_loop(0, P, step, (dblk[:], eye), unroll=P)
    dblk[:] = D
    iblk[:] = X


def _chol_inv_kernel(a_ref, l_ref, j_ref, ldiag, cpan, buf, tacc, jbuf,
                     dblk, iblk, sems, lsem, jsem, *, P: int, M: int, K: int,
                     skip_diag: bool = False):
    k = pl.program_id(0)

    # ---- phase 0: row strip L[kP:kP+P, :] (cols ≥ kP unwritten → unread) --
    cp = pltpu.make_async_copy(l_ref.at[pl.ds(k * P, P), :], ldiag,
                               sems.at[0])
    cp.start()
    cpA = pltpu.make_async_copy(a_ref.at[:, pl.ds(k * P, P)], cpan,
                                sems.at[1])
    cpA.start()
    cp.wait()
    cpA.wait()

    _chol_inv_rest(l_ref, j_ref, ldiag, cpan, buf, tacc, jbuf, dblk, iblk,
                   sems, lsem, jsem, P=P, M=M, K=K, skip_diag=skip_diag)


def _gram_panel(z_ref, sig_ref, jit_ref, cpan, k, *, k_of_r2, D, P, M, acc):
    """cpan ← σ²·g(r²(Z, Z[kP:kP+P])) + jitter·I — the A column panel
    computed in VMEM instead of DMA'd from HBM.

    Distances are EXACT broadcast differences (the symmetric-Gram PSD
    policy of ``core.kernels.StationaryKernel.gram``: the |x|²-identity
    loses eps·max|x−c|² absolute accuracy, which breaks Cholesky PSD-ness
    for data spans ≫ √jitter) accumulated per input dimension with
    one-hot lane reductions — Mosaic cannot lane-slice at sub-128
    granularity, and (a−b)² = (b−a)² bitwise with a fixed d-order keeps
    the panel EXACTLY symmetric, which the diagonal-block factor's
    read-row-as-column-transpose trick requires."""
    zpan = z_ref[pl.ds(k * P, P), :]  # (P, Dp)
    lane = lax.broadcasted_iota(jnp.int32, (1, zpan.shape[1]), 1)
    sig2 = sig_ref[0, 0].astype(acc)
    jit = jit_ref[0, 0].astype(acc)
    # panel rows per dimension, extracted once (one-hot lane reductions)
    zps = []
    for d in range(D):
        hot = (lane == d).astype(acc)
        zps.append(jnp.sum(zpan.astype(acc) * hot, axis=1, keepdims=True).T)

    # row-chunk loop mirrors phase 1's diagonal skip: chunks entirely above
    # the diagonal are never read by the factorization (phase 1 skips them,
    # `scaled` masks them) — ~38% less gram work at K/_NCH = 4
    R = M // _NCH
    for r in range(_NCH):
        @pl.when((r + 1) * R > k * P)
        def _(r=r):
            zc = z_ref[pl.ds(r * R, R), :]  # (R, Dp)
            r2 = jnp.zeros((R, P), acc)
            for d in range(D):  # static real-D loop (pad lanes untouched)
                hot = (lane == d).astype(acc)
                zcd = jnp.sum(zc.astype(acc) * hot, axis=1, keepdims=True)
                diff = zcd - zps[d]
                r2 = r2 + diff * diff
            g = k_of_r2(r2)
            rowR = lax.broadcasted_iota(jnp.int32, (R, P), 0) + r * R
            colP = lax.broadcasted_iota(jnp.int32, (R, P), 1)
            kblk = sig2 * g + jnp.where(rowR == k * P + colP, jit, 0.0)
            cpan[pl.ds(r * R, R), :] = kblk.astype(cpan.dtype)


def _gram_chol_inv_kernel(z_ref, sig_ref, jit_ref, l_ref, j_ref, ldiag, cpan,
                          buf, tacc, jbuf, dblk, iblk, sems, lsem, jsem, *,
                          k_of_r2, D: int, P: int, M: int, K: int,
                          skip_diag: bool = False):
    """Fused gram→(L, L⁻¹): phase 0 COMPUTES the A panel from Z (overlapping
    the L-row-strip DMA) — Kuu never exists in HBM."""
    k = pl.program_id(0)
    acc = jnp.dtype(ldiag.dtype)

    cp = pltpu.make_async_copy(l_ref.at[pl.ds(k * P, P), :], ldiag,
                               sems.at[0])
    cp.start()
    _gram_panel(z_ref, sig_ref, jit_ref, cpan, k,
                k_of_r2=k_of_r2, D=D, P=P, M=M, acc=acc)
    cp.wait()

    _chol_inv_rest(l_ref, j_ref, ldiag, cpan, buf, tacc, jbuf, dblk, iblk,
                   sems, lsem, jsem, P=P, M=M, K=K, skip_diag=skip_diag)


def _chol_inv_rest(l_ref, j_ref, ldiag, cpan, buf, tacc, jbuf,
                   dblk, iblk, sems, lsem, jsem, *, P: int, M: int, K: int,
                   skip_diag: bool):
    k = pl.program_id(0)
    acc = jnp.dtype(ldiag.dtype)
    HIGH = lax.Precision.HIGHEST
    R = M // _NCH  # row-chunk height (phase 1) == col-chunk width (phase 2)

    # ---- phase 1: left-looking panel update (row-chunk-skipped stream, ----
    # 2-slot double buffering: panel j+1's chunks are in flight while panel
    # j's matmuls run — the serial start→wait→dot chain was DMA-latency
    # bound (measured 0.37 ms of the 0.70 ms kernel at M=2048)
    def _dma_L(j, slot, r):
        # same-shaped descriptor for start and wait (wait decrements the
        # semaphore by the copy's byte count, so shapes must match)
        return pltpu.make_async_copy(
            l_ref.at[pl.ds(r * R, R), pl.ds(j * P, P)],
            buf.at[slot, pl.ds(r * R, R), :], lsem.at[slot, r],
        )

    def start_L(j, slot):
        for r in range(_NCH):  # static chunk loop; skip chunks above diag
            @pl.when((r + 1) * R > k * P)
            def _():
                _dma_L(j, slot, r).start()

    def wait_L(slot):
        for r in range(_NCH):
            @pl.when((r + 1) * R > k * P)
            def _():
                _dma_L(0, slot, r).wait()

    @pl.when(k > 0)
    def _():
        start_L(0, 0)

    def c_update(j, _):
        slot = jax.lax.rem(j, jnp.asarray(2, j.dtype))

        @pl.when(j + 1 < k)
        def _():
            start_L(j + 1, 1 - slot)

        wait_L(slot)
        ld_j = ldiag[:, pl.ds(j * P, P)]  # L[kP:kP+P, jP:(j+1)P]
        for r in range(_NCH):
            @pl.when((r + 1) * R > k * P)
            def _():
                cpan[pl.ds(r * R, R), :] = cpan[pl.ds(r * R, R), :] - jnp.dot(
                    buf[slot, pl.ds(r * R, R), :], ld_j.T,
                    preferred_element_type=acc, precision=HIGH,
                )
        return 0

    lax.fori_loop(0, k, c_update, 0, unroll=False)

    # ---- diagonal block: factor + invert ----------------------------------
    dblk[:] = cpan[pl.ds(k * P, P), :]
    if skip_diag:  # timing-ablation mode: garbage math, same dataflow
        iblk[:] = (
            lax.broadcasted_iota(jnp.int32, (P, P), 0)
            == lax.broadcasted_iota(jnp.int32, (P, P), 1)
        ).astype(acc)
    else:
        _fused_factor_inv(dblk, iblk, P, acc)

    # ---- finish the L panel: subdiagonal trsm via iblk, zero the top ------
    scaled = jnp.dot(cpan[:], iblk[:].T, preferred_element_type=acc,
                     precision=HIGH)
    rowM = lax.broadcasted_iota(jnp.int32, (M, P), 0)
    cpan[:] = jnp.where(rowM < (k + 1) * P, 0.0, scaled)
    cpan[pl.ds(k * P, P), :] = dblk[:]
    cpL_out = pltpu.make_async_copy(cpan, l_ref.at[:, pl.ds(k * P, P)],
                                    sems.at[1])
    cpL_out.start()

    # ---- phase 2: J row panel (col-chunk-skipped stream) ------------------
    # T = L[k, :kP] @ J[:kP, :]; previous J row strips have zero cols ≥ kP.
    tacc[:] = jnp.zeros((P, M), acc)

    # 2-slot double buffering, chunk cc of row strip j needed iff its
    # column range intersects the strip's nonzero cols [0, (j+1)P)
    def _dma_J(j, slot, cc):
        return pltpu.make_async_copy(
            j_ref.at[pl.ds(j * P, P), pl.ds(cc * R, R)],
            jbuf.at[slot, :, pl.ds(cc * R, R)], jsem.at[slot, cc],
        )

    def start_J(j, slot):
        for cc in range(_NCH):
            @pl.when((j + 1) * P > cc * R)
            def _():
                _dma_J(j, slot, cc).start()

    def wait_J(j, slot):
        for cc in range(_NCH):
            @pl.when((j + 1) * P > cc * R)
            def _():
                _dma_J(j, slot, cc).wait()

    @pl.when(k > 0)
    def _():
        start_J(0, 0)

    def t_update(j, _):
        slot = jax.lax.rem(j, jnp.asarray(2, j.dtype))

        @pl.when(j + 1 < k)
        def _():
            start_J(j + 1, 1 - slot)

        wait_J(j, slot)
        ld_j = ldiag[:, pl.ds(j * P, P)]
        for cc in range(_NCH):
            @pl.when((j + 1) * P > cc * R)
            def _():
                tacc[:, pl.ds(cc * R, R)] = tacc[:, pl.ds(cc * R, R)] + (
                    jnp.dot(ld_j, jbuf[slot, :, pl.ds(cc * R, R)],
                            preferred_element_type=acc, precision=HIGH)
                )
        return 0

    lax.fori_loop(0, k, t_update, 0, unroll=False)

    res = -jnp.dot(iblk[:], tacc[:], preferred_element_type=acc,
                   precision=HIGH)
    colM = lax.broadcasted_iota(jnp.int32, (P, M), 1)
    tacc[:] = jnp.where(colM < k * P, res, 0.0)
    tacc[:, pl.ds(k * P, P)] = iblk[:]
    cpL_out.wait()  # cpan free; also orders the L write before grid step ends
    cpJ_out = pltpu.make_async_copy(tacc, j_ref.at[pl.ds(k * P, P), :],
                                    sems.at[2])
    cpJ_out.start()
    cpJ_out.wait()


def chol_inv_supported(M: int, dtype, panel: int = 128) -> bool:
    """Static dispatch test: full-height panels need (M, P) / (P, M) working
    buffers in the ~16 MB VMEM budget; Mosaic requires every lane-axis
    (last-dim) slice to be 128-aligned, which constrains BOTH the panel
    width (``ldiag[:, j·P : (j+1)·P]``) and the stream-chunk width
    R = M/_NCH (``j_ref[..., cc·R : (cc+1)·R]``) — M=256 (R=64) compiled
    in interpret mode but failed Mosaic on the real chip (example d)."""
    if panel % 128 or M % panel or M < 2 * panel or M % (_NCH * 128):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    # ldiag + cpan + tacc + 2×buf + 2×jbuf = 7 full panels
    vmem = 7 * M * panel * itemsize + 3 * panel * panel * itemsize
    return vmem <= 12 * 1024 * 1024  # headroom under the 16 MB scoped limit


@partial(jax.jit, static_argnames=("panel", "interpret", "_skip_diag"))
def pallas_chol_inv(A: jax.Array, panel: int = 128,
                    interpret: bool | None = None,
                    _skip_diag: bool = False):
    """(L, J) = (chol(A), L⁻¹) in one streamed-panel kernel.

    A must be symmetric PSD (add jitter BEFORE calling) with
    ``chol_inv_supported(A.shape[-1], A.dtype, panel)`` true.  Returns
    dense (M, M) lower-triangular L and J with exact zeros above the
    diagonal."""
    M = A.shape[-1]
    P = panel
    K = M // P
    R = M // _NCH
    if interpret is None:
        interpret = config.pallas_interpret or jax.default_backend() != "tpu"

    kernel = partial(_chol_inv_kernel, P=P, M=M, K=K, skip_diag=_skip_diag)
    L, J = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, M), A.dtype),
            jax.ShapeDtypeStruct((M, M), A.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, M), A.dtype),  # ldiag: L row strip
            pltpu.VMEM((M, P), A.dtype),  # cpan: working panel
            pltpu.VMEM((2, M, P), A.dtype),  # buf: L stream, 2 slots
            pltpu.VMEM((P, M), A.dtype),  # tacc: T accumulator / J row out
            pltpu.VMEM((2, P, M), A.dtype),  # jbuf: J stream, 2 slots
            pltpu.VMEM((P, P), A.dtype),  # dblk: diagonal factor
            pltpu.VMEM((P, P), A.dtype),  # iblk: diagonal inverse
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2, _NCH)),  # lsem: per-slot/chunk
            pltpu.SemaphoreType.DMA((2, _NCH)),  # jsem: per-slot/chunk
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(A)
    return L, J


def gram_chol_inv_supported(M: int, D: int, dtype, panel: int = 128) -> bool:
    """Static dispatch test for the fused gram→(L, L⁻¹) kernel: the plain
    kernel's constraints plus the (M, 128) Z block (double-buffered by the
    Pallas pipeline) in the VMEM budget, and D within one lane register."""
    if not chol_inv_supported(M, dtype, panel):
        return False
    if not 1 <= D <= 128:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    vmem = (
        7 * M * panel * itemsize
        + 3 * panel * panel * itemsize
        + 2 * M * 128 * itemsize  # Z block, 2 pipeline slots
    )
    return vmem <= 12 * 1024 * 1024


@partial(jax.jit, static_argnames=("k_of_r2", "panel", "interpret"))
def pallas_gram_chol_inv(Zs: jax.Array, sig2, jitter, k_of_r2,
                         panel: int = 128, interpret: bool | None = None):
    """(L, J) = (chol(σ²·g(r²(Zs, Zs)) + jitter·I), L⁻¹) with the Gram
    panels computed IN the factorization kernel — Kuu never hits HBM.

    Replaces the gram kernel + σ²/jitter elementwise passes + the 16 MB
    write/read round trip of ``chol(fz.cov())`` on the SVGP posterior-build
    hot path (reference semantics: ``_chol_cov(fz)`` at
    ``src/SparseVariationalApproximationModule.jl:160-187`` with
    ``cov(fz) = kernelmatrix(kernel, z) + jitter·I``).

    Zs: (M, D) inputs with any lengthscale scaling already applied;
    ``k_of_r2`` a static parameter-free elementwise map; ``sig2``/``jitter``
    traced scalars.  Requires ``gram_chol_inv_supported(M, D, dtype)``."""
    M, D = Zs.shape
    P = panel
    K = M // P
    if interpret is None:
        interpret = config.pallas_interpret or jax.default_backend() != "tpu"
    Dp = 128
    Zp = jnp.zeros((M, Dp), Zs.dtype).at[:, :D].set(Zs)
    sig2 = jnp.asarray(sig2, Zs.dtype).reshape(1, 1)
    jitter = jnp.asarray(jitter, Zs.dtype).reshape(1, 1)

    kernel = partial(_gram_chol_inv_kernel, k_of_r2=k_of_r2, D=D, P=P, M=M,
                     K=K)
    L, J = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((M, Dp), lambda k: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, M), Zs.dtype),
            jax.ShapeDtypeStruct((M, M), Zs.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, M), Zs.dtype),  # ldiag: L row strip
            pltpu.VMEM((M, P), Zs.dtype),  # cpan: working panel
            pltpu.VMEM((2, M, P), Zs.dtype),  # buf: L stream, 2 slots
            pltpu.VMEM((P, M), Zs.dtype),  # tacc: T accumulator / J row out
            pltpu.VMEM((2, P, M), Zs.dtype),  # jbuf: J stream, 2 slots
            pltpu.VMEM((P, P), Zs.dtype),  # dblk: diagonal factor
            pltpu.VMEM((P, P), Zs.dtype),  # iblk: diagonal inverse
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2, _NCH)),  # lsem
            pltpu.SemaphoreType.DMA((2, _NCH)),  # jsem
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(Zp, sig2, jitter)
    return L, J
