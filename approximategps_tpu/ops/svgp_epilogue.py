"""Fused Pallas SVGP data-term epilogue.

Computes, for a stationary kernel ``K0 = g(r²(Zs, Xs))`` ((M, B) orientation)
and the S-correction cache of ``models/svgp.py``:

    mu_corr  = K0ᵀ ae                       (B,)
    var_corr = diag(K0ᵀ Se K0)              (B,)

without EVER materializing the (M, B) Gram (or the S·K product) in HBM —
the round-2 ablation showed the XLA data term is HBM-bound on exactly these
intermediates (~450 MB traffic per B=8192 block).  The caller folds kernel
scaling in: ``Xs = s·X``, ``Zs = s·Z`` (lengthscale), ``ae = σ²·α``,
``Se = σ⁴·S`` (variance), so gradients for all hyperparameters flow through
the four array inputs.

Two kernels:

- forward  (grid (nJ, nA), ia fastest): at ``ia == 0`` the full (M, Bb)
  K-block is built tile-by-tile into VMEM scratch (distance via one MXU dot
  per tile + fused elementwise ``g``) and ``mu`` is one (1, M)·(M, Bb) dot;
  each ``ia`` then computes ``T_tile = Se[ia]·K`` on the MXU and accumulates
  ``var += colsum(K[ia] ∘ T_tile)`` into the revisited output block.
- backward (grid (nJ, nA), ia fastest): rebuilds K in VMEM once per batch
  block, then per row-tile emits ALL cotangents: the ``Se_bar``/``ae_bar``
  per-block partials (written once each, tree-summed outside), and the
  K_bar chain ``W = (2(Se·K) ∘ dvar + ae ⊗ dmu) ∘ g'(r²)`` with distance
  pullbacks ``Xs_bar = 2(xs ∘ colsum(W) − Wᵀ Zs)``,
  ``Zs_bar = 2(zs ∘ rowsum(W) − W Xs)``.

Design history: a first split-backward variant rebuilt K per Se_bar row-tile
(8× the Gram/transcendental work) and measured 2.3× SLOWER than the XLA
path; the merged single-sweep backward exists because of that measurement.
Note the economics: with residuals available (no remat), XLA's
save-(K, S·K) data term is FLOP-optimal and this kernel cannot beat it —
the fused path pays recompute by construction.  It wins where remat forces
recompute anyway (the streaming/scan full-dataset ELBO), which is why
``data_term_mode="auto"`` engages it only there.

Storage dtype for K/Se inside the kernels is bf16 when
``config.matmul_precision == "default"`` (identical rounding to what XLA
applies inside its f32 matmuls at that precision) and the io dtype
otherwise; all accumulation is f32+.

Reference semantics: the (M, B) projection of
``src/SparseVariationalApproximationModule.jl:208-264`` in the S-correction
form (see models/svgp.py `_SVGPCache.S_corr`).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config, resolve_matmul_precision

__all__ = ["svgp_data_epilogue"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _acc_dtype(dtype):
    return jnp.promote_types(dtype, jnp.float32)


def _g_and_gprime(k_of_r2, r2, wbar):
    """(g(r²), ḡ∘g'(r²)) — traced inside the kernel (elementwise only)."""
    g, pull = jax.vjp(k_of_r2, r2)
    (w,) = pull(wbar)
    return g, w


def _k_tile(zs_tile, xs, k_of_r2, acc):
    """One (Ma, Bb) kernel tile: MXU distance identity + fused map, f32."""
    zz = jnp.sum(zs_tile.astype(acc) ** 2, axis=-1, keepdims=True)
    xx = jnp.sum(xs.astype(acc) ** 2, axis=-1, keepdims=True)
    zx = jnp.dot(
        zs_tile,
        xs.T,
        preferred_element_type=acc,
        precision=jax.lax.Precision.HIGHEST,
    )
    r2 = jnp.maximum(zz + xx.T - 2.0 * zx, 0.0)
    return k_of_r2(r2), r2


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(
    xs_ref, zs_ref, se_ref, ae_ref, mu_ref, var_ref, k_scr, *,
    k_of_r2, block_m, n_a, store,
):
    ia = pl.program_id(1)
    acc = _acc_dtype(xs_ref.dtype)

    @pl.when(ia == 0)
    def _build():
        xs = xs_ref[:]

        def body(t, _):
            k, _r2 = _k_tile(zs_ref[pl.ds(t * block_m, block_m), :], xs,
                             k_of_r2, acc)
            k_scr[pl.ds(t * block_m, block_m), :] = k.astype(store)
            return _

        jax.lax.fori_loop(0, n_a, body, 0, unroll=False)
        mu_ref[:] = jnp.dot(
            ae_ref[:].astype(store), k_scr[:], preferred_element_type=acc
        ).astype(mu_ref.dtype)

    t_tile = jnp.dot(se_ref[:], k_scr[:], preferred_element_type=acc)
    k_rows = k_scr[pl.ds(ia * block_m, block_m), :].astype(acc)
    partial_corr = jnp.sum(k_rows * t_tile, axis=0, keepdims=True)

    @pl.when(ia == 0)
    def _init():
        var_ref[:] = partial_corr.astype(var_ref.dtype)

    @pl.when(ia > 0)
    def _accum():
        var_ref[:] = var_ref[:] + partial_corr.astype(var_ref.dtype)


def _pad_inputs(Xs, Zs, Se, ae, block_b, block_m):
    B, D = Xs.shape
    M = Zs.shape[0]
    block_b = min(block_b, _round_up(B, 128))
    block_m = min(block_m, _round_up(M, 8))
    Bp = _round_up(B, block_b)
    Mp = _round_up(M, block_m)
    Dp = _round_up(D, 128)
    # joint centering: exact for stationary kernels, recovers the f32
    # accuracy the |x|²-identity loses on large-range data (see ops/gram.py)
    c = 0.5 * (jnp.mean(Xs, axis=0) + jnp.mean(Zs, axis=0))
    Xs = Xs - c
    Zs = Zs - c
    Xp = jnp.zeros((Bp, Dp), Xs.dtype).at[:B, :D].set(Xs)
    if B < Bp:  # padded rows: copies of row 0 → finite distances
        Xp = Xp.at[B:, :D].set(Xs[:1])
    Zp = jnp.zeros((Mp, Dp), Zs.dtype).at[:M, :D].set(Zs)
    if M < Mp:
        Zp = Zp.at[M:, :D].set(Zs[:1])
    Sp = jnp.zeros((Mp, Mp), Se.dtype).at[:M, :M].set(Se)
    ap = jnp.zeros((1, Mp), ae.dtype).at[0, :M].set(ae)
    return Xp, Zp, Sp, ap, block_b, block_m


def _store_dtype(dtype, interpret):
    if (
        not interpret
        and dtype == jnp.float32
        and resolve_matmul_precision(dtype) == "default"
    ):
        return jnp.bfloat16
    return dtype


def epilogue_supported(
    M: int, B: int, dtype, block_b: int = 1024, block_m: int = 256
) -> bool:
    """Static VMEM-feasibility test for the fused kernels.

    The forward's working set is dominated by the (Mp, block_b) K scratch
    plus the (block_m, Mp) Se row-block (both in the storage dtype) and a
    few f32 (block_m, block_b) tiles; the backward is the same scale plus
    the Se_bar partial.  Mosaic's per-kernel scoped-VMEM limit is 16 MB —
    at M = 8192 the forward wants ~29 MB and compilation fails, so the
    dispatcher must decline statically (measured r3; an M-tiled redesign
    with accumulator spilling would be needed to go bigger)."""
    if _interpret():
        return True  # CPU emulation has no scoped-VMEM limit
    block_b = min(block_b, _round_up(B, 128))
    block_m = min(block_m, _round_up(M, 8))
    Mp = _round_up(M, block_m)
    store = jnp.dtype(_store_dtype(jnp.dtype(dtype), False)).itemsize
    est = (
        Mp * block_b * store          # K scratch
        + block_m * Mp * store        # Se row-block
        + 4 * block_m * block_b * 4   # k/T/r2/W f32 tiles
        + block_m * Mp * 4            # bwd: Se_bar partial (f32)
    )
    # 12 MB budget: the estimate undercounts the backward's pipelined
    # BlockSpec buffers by ~15% (measured: bb=2048/bm=128 estimated 14.1 MB,
    # Mosaic allocated 16.07 MB and OOMed the 16 MB scoped limit)
    return est <= 12 * 1024 * 1024


def _interpret():
    return config.pallas_interpret or jax.default_backend() != "tpu"


def _epilogue_fwd_impl(Xs, Zs, Se, ae, k_of_r2, block_b, block_m):
    B = Xs.shape[0]
    M = Zs.shape[0]
    interpret = _interpret()
    Xp, Zp, Sp, ap, block_b, block_m = _pad_inputs(
        Xs, Zs, Se, ae, block_b, block_m
    )
    Bp, Dp = Xp.shape
    Mp = Zp.shape[0]
    store = _store_dtype(Xs.dtype, interpret)
    Sp = Sp.astype(store)
    acc = _acc_dtype(Xs.dtype)
    n_j = Bp // block_b
    n_a = Mp // block_m

    mu, var = pl.pallas_call(
        partial(
            _fwd_kernel,
            k_of_r2=k_of_r2,
            block_m=block_m,
            n_a=n_a,
            store=store,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Bp), acc),
            jax.ShapeDtypeStruct((1, Bp), acc),
        ),
        grid=(n_j, n_a),
        in_specs=[
            pl.BlockSpec((block_b, Dp), lambda j, a: (j, 0)),
            pl.BlockSpec((Mp, Dp), lambda j, a: (0, 0)),
            pl.BlockSpec((block_m, Mp), lambda j, a: (a, 0)),
            pl.BlockSpec((1, Mp), lambda j, a: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b), lambda j, a: (0, j)),
            pl.BlockSpec((1, block_b), lambda j, a: (0, j)),
        ),
        scratch_shapes=[pltpu.VMEM((Mp, block_b), store)],
        interpret=interpret,
    )(Xp, Zp, Sp, ap)
    out_dtype = Xs.dtype
    return mu[0, :B].astype(out_dtype), var[0, :B].astype(out_dtype)


# --------------------------------------------------------------------------
# backward: one fused kernel (Se_bar per-block partials, summed outside)
# --------------------------------------------------------------------------


def _dot_nt(a, b, acc):
    """a @ bᵀ contracting both last axes — MXU-friendly, no transpose op."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=acc
    )


def _r2_tile(zs_tile, xs, acc):
    """(Ma, Bb) squared-distance tile via the MXU identity (no kernel map)."""
    zz = jnp.sum(zs_tile.astype(acc) ** 2, axis=-1, keepdims=True)
    xx = jnp.sum(xs.astype(acc) ** 2, axis=-1, keepdims=True)
    zx = jnp.dot(
        zs_tile,
        xs.T,
        preferred_element_type=acc,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(zz + xx.T - 2.0 * zx, 0.0)


def _bwd_fused(Xp, Zp, Sp, ap, dvar_p, dmu_p, k_of_r2, block_b, block_m,
               io_dtype, interpret, dk_from_k=None):
    """All four cotangents in ONE grid sweep (nJ outer, nA fastest).

    K is built in VMEM once per batch block (the first design rebuilt it
    per Se_bar row-tile — 8× the transcendental work — and measured 2.3×
    slower than XLA).  Se_bar cannot accumulate across the outer axis in
    VMEM (16 MB f32 ≡ the whole VMEM), so each (jb, ia) step writes its
    (Ma, Mp) partial once to a (nJ, Mp, Mp) output in the storage dtype and
    a single XLA tree-sum reduces over nJ outside — partials are complete
    per-block sums, so the bf16 rounding matches the matmul-precision
    policy, and every output block is written exactly once (no revisit
    rules violated)."""
    Bp, Dp = Xp.shape
    Mp = Zp.shape[0]
    store = _store_dtype(io_dtype, interpret)
    acc = _acc_dtype(io_dtype)
    n_j = Bp // block_b
    n_a = Mp // block_m

    def kernel(xs_ref, zs_ref, se_ref, ae_ref, dvar_ref, dmu_ref,
               xsbar_ref, zsbar_ref, sebar_ref, aebar_ref,
               k_scr, cw_scr, wz_scr):
        jb = pl.program_id(0)
        ia = pl.program_id(1)
        xs = xs_ref[:]

        @pl.when(jnp.logical_and(jb == 0, ia == 0))
        def _init_zsbar():
            zsbar_ref[:] = jnp.zeros_like(zsbar_ref)

        @pl.when(ia == 0)
        def _build():
            def body(t, carry):
                k, _r2 = _k_tile(zs_ref[pl.ds(t * block_m, block_m), :], xs,
                                 k_of_r2, acc)
                k_scr[pl.ds(t * block_m, block_m), :] = k.astype(store)
                return carry

            jax.lax.fori_loop(0, n_a, body, 0, unroll=False)
            cw_scr[:] = jnp.zeros_like(cw_scr)
            wz_scr[:] = jnp.zeros_like(wz_scr)

        zs_tile = zs_ref[pl.ds(ia * block_m, block_m), :]
        dvar = dvar_ref[:].astype(acc)
        dmu = dmu_ref[:].astype(acc)
        k_rows = k_scr[pl.ds(ia * block_m, block_m), :].astype(acc)

        # ---- Se_bar partial + ae_bar partial (reuse the VMEM K) ----------
        kw = k_rows * dvar
        sebar_ref[0] = _dot_nt(kw.astype(store), k_scr[:], acc).astype(
            sebar_ref.dtype
        )
        aebar_ref[0] = jnp.dot(
            k_rows, dmu.T, preferred_element_type=acc
        ).astype(aebar_ref.dtype)

        # ---- K_bar chain: W = (2(Se·K)∘dvar + ae⊗dmu) ∘ g'(r²) ----------
        t_tile = jnp.dot(se_ref[:], k_scr[:], preferred_element_type=acc)
        ae_tile = ae_ref[pl.ds(ia * block_m, block_m), :].astype(acc)
        k_bar = 2.0 * t_tile * dvar + ae_tile * dmu
        if dk_from_k is not None:
            # g' through the stored K tile: no r² rebuild, no transcendental
            w = k_bar * dk_from_k(k_rows)
        else:
            r2 = _r2_tile(zs_tile, xs, acc)
            _g, w = _g_and_gprime(k_of_r2, r2, k_bar)

        cw_scr[:] = cw_scr[:] + jnp.sum(w, axis=0, keepdims=True)
        # Wᵀ·Zs tile: contract the block_m axis of both (TN matmul)
        wz_scr[:] = wz_scr[:] + jax.lax.dot_general(
            w.astype(store), zs_tile, (((0,), (0,)), ((), ())),
            preferred_element_type=acc,
        )
        zsb = 2.0 * (
            zs_tile.astype(acc) * jnp.sum(w, axis=1, keepdims=True)
            - jnp.dot(w.astype(store), xs, preferred_element_type=acc)
        )
        zsbar_ref[pl.ds(ia * block_m, block_m), :] = (
            zsbar_ref[pl.ds(ia * block_m, block_m), :]
            + zsb.astype(zsbar_ref.dtype)
        )

        @pl.when(ia == n_a - 1)
        def _emit_xsbar():
            xsbar_ref[:] = (
                2.0 * (xs.astype(acc) * cw_scr[:].T - wz_scr[:])
            ).astype(xsbar_ref.dtype)

    xsbar, zsbar, sebar_parts, aebar_parts = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Dp), acc),
            jax.ShapeDtypeStruct((Mp, Dp), acc),
            jax.ShapeDtypeStruct((n_j, Mp, Mp), store),
            jax.ShapeDtypeStruct((n_j, Mp, 1), acc),
        ),
        grid=(n_j, n_a),
        in_specs=[
            pl.BlockSpec((block_b, Dp), lambda j, a: (j, 0)),
            pl.BlockSpec((Mp, Dp), lambda j, a: (0, 0)),
            pl.BlockSpec((block_m, Mp), lambda j, a: (a, 0)),
            pl.BlockSpec((Mp, 1), lambda j, a: (0, 0)),
            pl.BlockSpec((1, block_b), lambda j, a: (0, j)),
            pl.BlockSpec((1, block_b), lambda j, a: (0, j)),
        ],
        out_specs=(
            pl.BlockSpec((block_b, Dp), lambda j, a: (j, 0)),
            pl.BlockSpec((Mp, Dp), lambda j, a: (0, 0)),
            pl.BlockSpec((1, block_m, Mp), lambda j, a: (j, a, 0)),
            pl.BlockSpec((1, block_m, 1), lambda j, a: (j, a, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((Mp, block_b), store),
            pltpu.VMEM((1, block_b), acc),
            pltpu.VMEM((block_b, Dp), acc),
        ],
        interpret=interpret,
    )(Xp, Zp, Sp, ap.T, dvar_p, dmu_p)
    sebar = jnp.sum(sebar_parts.astype(acc), axis=0)
    aebar = jnp.sum(aebar_parts, axis=0)
    return xsbar, zsbar, sebar, aebar


# --------------------------------------------------------------------------
# public custom-vjp op
# --------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def svgp_data_epilogue(
    Xs: jax.Array,
    Zs: jax.Array,
    Se: jax.Array,
    ae: jax.Array,
    k_of_r2: Callable,
    block_b: int = 1024,
    block_m: int = 256,
) -> tuple[jax.Array, jax.Array]:
    """(mu_corr, var_corr) = (K0ᵀ ae, diag(K0ᵀ Se K0)), K0 = g(r²(Zs, Xs)).

    Xs: (B, D) scaled minibatch inputs; Zs: (M, D) scaled inducing inputs;
    Se: (M, M) symmetric; ae: (M,).  ``k_of_r2`` must be a static,
    parameter-free elementwise map (see ``unwrap_stationary``).  The (M, B)
    Gram never hits HBM; the backward rebuilds it in VMEM.
    """
    return _epilogue_fwd_impl(Xs, Zs, Se, ae, k_of_r2, block_b, block_m)


def _epilogue_fwd(Xs, Zs, Se, ae, k_of_r2, block_b, block_m):
    out = _epilogue_fwd_impl(Xs, Zs, Se, ae, k_of_r2, block_b, block_m)
    return out, (Xs, Zs, Se, ae)


def _epilogue_bwd(k_of_r2, block_b, block_m, res, cts):
    Xs, Zs, Se, ae = res
    dmu, dvar = cts
    dmu = jnp.asarray(dmu, Xs.dtype)
    dvar = jnp.asarray(dvar, Xs.dtype)
    B, D = Xs.shape
    M = Zs.shape[0]
    interpret = _interpret()
    Xp, Zp, Sp, ap, bb, bm = _pad_inputs(Xs, Zs, Se, ae, block_b, block_m)
    Bp = Xp.shape[0]
    Mp = Zp.shape[0]
    store = _store_dtype(Xs.dtype, interpret)
    Sp = Sp.astype(store)
    dvar_p = jnp.zeros((1, Bp), Xs.dtype).at[0, :B].set(dvar)
    dmu_p = jnp.zeros((1, Bp), Xs.dtype).at[0, :B].set(dmu)

    from ..core.kernels import dk_from_k_for

    xsbar, zsbar, sebar, aebar = _bwd_fused(
        Xp, Zp, Sp, ap, dvar_p, dmu_p, k_of_r2, bb, bm, Xs.dtype, interpret,
        dk_from_k=dk_from_k_for(k_of_r2),
    )
    # centering shift: r² is invariant to the joint shift c, and c depends
    # on mean(Xs)/mean(Zs) — but Σ_j Xs_bar_j + Σ_a Zs_bar_a = 0 exactly
    # (W-sum telescopes), so the c-pullback vanishes and the sliced
    # cotangents are already correct.
    Xs_bar = xsbar[:B, :D].astype(Xs.dtype)
    Zs_bar = zsbar[:M, :D].astype(Zs.dtype)
    Se_bar = sebar[:M, :M].astype(Se.dtype)
    ae_bar = aebar[:M, 0].astype(ae.dtype)
    return Xs_bar, Zs_bar, Se_bar, ae_bar


svgp_data_epilogue.defvjp(_epilogue_fwd, _epilogue_bwd)
